"""Key / hash / id normalizers — exact reference semantics.

Sources (all in /root/reference):
  normalize_repository_url  src/deduplication.py:164-172
  normalize_name            src/deduplication.py:174-187
  content_hash_md5          src/deduplication.py:189-200
  extract_repository_id     src/id_standardization.py:72-108
  normalize_id              src/id_standardization.py:110-136
  content_hash_sha256       src/id_standardization.py:138-155
  global-id candidate tiers src/id_standardization.py:22-70

These are scalar functions applied per row inside map_batches; none
needs a shuffle. They build the key columns the dedup / global-id
shuffles partition on.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urlparse

_NON_ALNUM = re.compile(r"[^a-z0-9\s]")
_WS = re.compile(r"\s+")
_MCP_PREFIX = re.compile(r"^(mcp[-_\s]*)?")
_MCP_SUFFIX = re.compile(r"[-_\s]*(server|mcp)$")
_PROTO = re.compile(r"^https?://")
_WWW = re.compile(r"^www\.")
_GIT_SUFFIX = re.compile(r"\.git$")
_ID_SEP = re.compile(r"[_\s]+")
_ID_BAD = re.compile(r"[^a-z0-9\-\/]")
_ID_DASHES = re.compile(r"-+")


def normalize_repository_url(url: str | None) -> str | None:
    """deduplication.py:164-172 — lowercase, strip '/' + '.git', netloc+path."""
    if not url:
        return None
    u = url.lower().rstrip("/")
    u = u.removesuffix(".git")
    try:
        parsed = urlparse(u)
    except ValueError:
        # malformed URL (e.g. unbalanced IPv6 bracket) — crawl data is
        # adversarial; fall back to the scheme-stripped string as key
        return _PROTO.sub("", u)
    return f"{parsed.netloc}{parsed.path}"


def normalize_name(name: str | None) -> str:
    """deduplication.py:174-187."""
    if not name:
        return ""
    n = _NON_ALNUM.sub("", name.lower())
    n = _WS.sub(" ", n).strip()
    n = _MCP_PREFIX.sub("", n, count=1)
    n = _MCP_SUFFIX.sub("", n, count=1)
    return n


def name_author_key(name: str | None, author: str | None) -> str | None:
    """deduplication.py:127 — None when either side missing."""
    if name and author:
        return f"{normalize_name(name)}|{normalize_name(author)}"
    return None


def content_hash_md5(name, author, description, categories, operations) -> str:
    """deduplication.py:189-200 — md5 over normalized identity fields.

    ``str(sorted(...))`` reproduces the reference's Python-list-repr
    serialization of the category/operation sets.
    """
    parts = [
        normalize_name(name),
        normalize_name(author or ""),
        (description or "").lower()[:200],
        str(sorted(categories or [])),
        str(sorted(operations or [])),
    ]
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def extract_repository_id(repository_url: str | None) -> str | None:
    """id_standardization.py:72-108 — URL → 'owner/repo'."""
    if not repository_url:
        return None
    url = str(repository_url).lower()
    url = _PROTO.sub("", url)
    url = _WWW.sub("", url)
    for domain in ("github.com", "gitlab.com", "bitbucket.org", "codeberg.org"):
        if domain in url:
            parts = url.split("/")
            if len(parts) >= 3:
                owner, repo = parts[1], _GIT_SUFFIX.sub("", parts[2])
                return f"{owner}/{repo}"
    return None


def normalize_id(raw_id: str | None) -> str:
    """id_standardization.py:110-136."""
    if not raw_id:
        return ""
    n = raw_id.lower()
    n = _ID_SEP.sub("-", n)
    n = _ID_BAD.sub("", n)
    n = _ID_DASHES.sub("-", n)
    n = n.strip("-")
    if len(n) > 100:
        tail = hashlib.md5(n[80:].encode()).hexdigest()[:8]
        n = n[:80] + "-" + tail
    return n


def content_hash_sha256(name, author, description, repository, tool_names) -> str:
    """id_standardization.py:138-155."""
    parts = [
        str(name or "").lower(),
        str(author or "").lower(),
        str(description or "")[:100].lower(),
        str(repository or "").lower(),
    ]
    if tool_names:
        parts.append("|".join(sorted(str(t) for t in tool_names)))
    return hashlib.sha256("|".join(parts).encode()).hexdigest()


def global_id_candidate(name, author, repository, description, tool_names) -> tuple[int, str]:
    """First applicable global-id tier (id_standardization.py:22-70).

    Returns (tier, candidate):
      1 repo-based 'owner/repo'; 2 'author/name'; 3 name; 4 hash fallback.
    The reference consults a process-global ``used_ids`` set between
    tiers; the distributed engine resolves collisions instead with a
    groupby(candidate).map_groups suffix pass (stages/ids.py) in
    canonical order — set-level parity, SURVEY.md §2.2 M19.
    """
    repo_id = extract_repository_id(repository)
    if repo_id:
        nid = normalize_id(repo_id)
        if nid:
            return 1, nid
    if name and author:
        nid = normalize_id(f"{author}/{name}")
        if nid:
            return 2, nid
    if name:
        nid = normalize_id(name)
        if nid:
            return 3, nid
    h = content_hash_sha256(name, author, description, repository, tool_names)
    return 4, f"server-{h[:12]}"
