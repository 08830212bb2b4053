"""Record-merge + similarity semantics of the reference deduplicator.

Pure dict-level functions reproducing /root/reference/src/deduplication.py:
  merge_phase1        _merge_server_metadata   (264-321)
  merge_phase2        _merge_server_into_base  (457-494)
  servers_are_similar _servers_are_similar     (223-262)
  similarity_score    _calculate_similarity_score (384-426)
  completeness_score  _calculate_completeness_score (440-455)
  merge_multiple      _merge_multiple_servers  (428-438)

Deviation (documented, SURVEY.md §2.5): the reference's list(set(...))
unions have process-randomized order; we sort unioned lists so the
distributed engine and the oracle are deterministic. Parity is
set-level.

Records are plain dicts with the nodes-table columns (see
stages/extract.py). The ``warc_ts`` column plays the reference's ``last_updated`` role
(latest-wins on merge, deduplication.py:318-321).
"""

from __future__ import annotations

from difflib import SequenceMatcher
from functools import lru_cache
from urllib.parse import urlparse

from .normalize import normalize_name

_norm_cached = lru_cache(maxsize=1 << 16)(normalize_name)


@lru_cache(maxsize=1 << 16)
def _sm_ratio(a: str, b: str) -> float:
    """SequenceMatcher.ratio with an identical-string cheap-out and a
    bounded memo: the verify predicates compare the same author /
    description / name strings for every pair in a duplicate cluster, so
    the distinct-ARGUMENT space is tiny relative to the pair space.
    Pure-function cache — results are bit-identical to direct calls.
    The C replica (_fastratio, property-tested bit-identical below 200
    code points where autojunk can never fire) serves the hot path —
    stdlib difflib was ~30% of the verify reduce tasks' CPU (round-4
    profile); difflib remains the fallback for long strings / no
    compiler."""
    if a == b:
        return 1.0
    from ._fastratio import ratio_gated

    r = ratio_gated(a, b, 0.0)   # exact: quick_ratio ≤ 0 ⇒ ratio == 0
    if r is not None:
        return r
    return SequenceMatcher(None, a, b).ratio()


@lru_cache(maxsize=1 << 16)
def _repo_netloc(u: str) -> str | None:
    """Cached netloc; None = malformed URL (no domain credit, matching
    the reference's ValueError-swallow)."""
    try:
        return urlparse(u).netloc
    except ValueError:
        return None

_FILL_EMPTY_P1 = ("description", "version", "license", "homepage")
_FILL_EMPTY_P2 = ("description", "version", "license", "homepage",
                  "implementation_language")


def _union_sorted(a, b) -> list:
    return sorted(set(a or []) | set(b or []))


def _max_truthy(a, b):
    """Reference truthiness semantics: 'if dup.x and (not base.x or dup.x > base.x)'."""
    if b and (not a or b > a):
        return b
    return a


def merge_phase1(base: dict, dup: dict) -> dict:
    """deduplication.py:264-321 — merge dup into first-seen record."""
    out = dict(base)
    for f in _FILL_EMPTY_P1:
        if not out.get(f) and dup.get(f):
            out[f] = dup[f]
    out["categories"] = _union_sorted(base.get("categories"), dup.get("categories"))
    out["operations"] = _union_sorted(base.get("operations"), dup.get("operations"))
    out["data_types"] = _union_sorted(base.get("data_types"), dup.get("data_types"))
    # union tools by name, base first (301-307) — applied to the plain
    # name list AND the capability structs (MCPTool union, base's struct
    # wins on a name collision, mirroring "existing_tool_names" gating)
    tools = list(base.get("tool_names") or [])
    seen = set(tools)
    for t in dup.get("tool_names") or []:
        if t not in seen:
            tools.append(t)
            seen.add(t)
    out["tool_names"] = tools
    structs = list(base.get("tools") or [])
    seen_s = {t["name"] for t in structs if t}
    for t in dup.get("tools") or []:
        if t and t.get("name") not in seen_s:
            structs.append(t)
            seen_s.add(t.get("name"))
    out["tools"] = structs
    # resources/prompts: same union-by-key rule, base's struct wins on a
    # collision ("Merge tools, resources, prompts" — the reference's
    # declared intent at deduplication.py:300; its code unions only
    # tools, and its scrapers never fill resources/prompts, so this is
    # a superset that is identical on every reference-reachable input)
    for field, key in (("resources", "uri"), ("prompts", "name")):
        items = list(base.get(field) or [])
        seen_k = {i[key] for i in items if i}
        for i in dup.get(field) or []:
            if i and i.get(key) not in seen_k:
                items.append(i)
                seen_k.add(i.get(key))
        out[field] = items
    # raw_metadata: keep base's, fill from dup when base has none
    if not out.get("raw_metadata_json") and dup.get("raw_metadata_json"):
        out["raw_metadata_json"] = dup["raw_metadata_json"]
    out["popularity_score"] = _max_truthy(base.get("popularity_score"), dup.get("popularity_score"))
    out["download_count"] = _max_truthy(base.get("download_count"), dup.get("download_count"))
    lu_b, lu_d = base.get("warc_ts"), dup.get("warc_ts")
    if lu_d and (not lu_b or lu_d > lu_b):
        out["warc_ts"] = lu_d
    return out


def merge_phase2(base: dict, other: dict) -> dict:
    """deduplication.py:457-494 — phase-2 merge (no tools union)."""
    out = dict(base)
    for f in _FILL_EMPTY_P2:
        if not out.get(f) and other.get(f):
            out[f] = other[f]
    out["categories"] = _union_sorted(base.get("categories"), other.get("categories"))
    out["operations"] = _union_sorted(base.get("operations"), other.get("operations"))
    if other.get("data_types"):
        out["data_types"] = _union_sorted(base.get("data_types"), other.get("data_types"))
    out["popularity_score"] = _max_truthy(base.get("popularity_score"), other.get("popularity_score"))
    out["download_count"] = _max_truthy(base.get("download_count"), other.get("download_count"))
    lu_b, lu_o = base.get("warc_ts"), other.get("warc_ts")
    if lu_o and (not lu_b or lu_o > lu_b):
        out["warc_ts"] = lu_o
    return out


def servers_are_similar(s1: dict, s2: dict) -> bool:
    """deduplication.py:223-262 — weighted multi-signal similarity > 0.7."""
    score = 0.0
    if s1.get("author") and s2.get("author"):
        score += _sm_ratio(_norm_cached(s1["author"]),
                           _norm_cached(s2["author"])) * 0.3
    if s1.get("description") and s2.get("description"):
        score += _sm_ratio(s1["description"].lower()[:100],
                           s2["description"].lower()[:100]) * 0.2
    c1, c2 = s1.get("categories") or [], s2.get("categories") or []
    common = set(c1) & set(c2)
    if c1 and c2:
        score += (len(common) / max(len(c1), len(c2))) * 0.2
    if (s1.get("implementation_language") and s2.get("implementation_language")
            and s1["implementation_language"] == s2["implementation_language"]):
        score += 0.1
    r1, r2 = s1.get("repository"), s2.get("repository")
    if r1 and r2:
        p1, p2 = str(r1).split("/"), str(r2).split("/")
        if len(p1) >= 4 and len(p2) >= 4 and p1[3] == p2[3]:  # same org
            score += 0.2
    return score > 0.7


def similarity_score(s1: dict, s2: dict) -> float:
    """deduplication.py:384-426."""
    score = 0.0
    if s1.get("name") and s2.get("name"):
        score += _sm_ratio(_norm_cached(s1["name"]),
                           _norm_cached(s2["name"])) * 0.4
    if s1.get("author") and s2.get("author"):
        score += _sm_ratio(_norm_cached(s1["author"]),
                           _norm_cached(s2["author"])) * 0.2
    r1, r2 = s1.get("repository"), s2.get("repository")
    if r1 and r2:
        n1, n2 = _repo_netloc(str(r1)), _repo_netloc(str(r2))
        if n1 is not None and n1 == n2:
            score += 0.2

    if s1.get("description") and s2.get("description"):
        score += _sm_ratio(s1["description"].lower(),
                           s2["description"].lower()) * 0.1
    c1, c2 = set(s1.get("categories") or []), set(s2.get("categories") or [])
    if c1 and c2:
        total = c1 | c2
        if total:
            score += (len(c1 & c2) / len(total)) * 0.1
    return score


def are_highly_similar(s1: dict, s2: dict) -> bool:
    """deduplication.py:375-382 — cross-registry only, both thresholds."""
    if s1.get("registry_source") == s2.get("registry_source"):
        return False
    return servers_are_similar(s1, s2) and similarity_score(s1, s2) > 0.9


def completeness_score(s: dict) -> int:
    """deduplication.py:440-455."""
    score = 0
    if s.get("description"):
        score += 2
    if s.get("author"):
        score += 1
    if s.get("repository"):
        score += 2
    if s.get("version"):
        score += 1
    if s.get("license"):
        score += 1
    if s.get("homepage"):
        score += 1
    if s.get("tool_names"):
        score += len(s["tool_names"])
    if s.get("categories"):
        score += len(s["categories"])
    if s.get("popularity_score"):
        score += 1
    return score


def merge_multiple(servers: list[dict]) -> dict:
    """deduplication.py:428-438 — completeness-max base, merge rest in.

    Ties on completeness break by list position, matching Python max();
    callers pass the group in canonical order so ties are deterministic.
    """
    base = max(servers, key=completeness_score)
    for s in servers:
        if s is not base:
            base = merge_phase2(base, s)
    return base


def fuzzy_name_match(s: dict, kept: list[dict]) -> bool:
    """Phase-1 fuzzy duplicate check against already-kept records
    (deduplication.py:202-221): ratio > 0.85 on distinct normalized
    names, confirmed by servers_are_similar."""
    nn = normalize_name(s.get("name"))
    for k in kept:
        knn = normalize_name(k.get("name"))
        if knn == nn:
            continue
        if _sm_ratio(nn, knn) > 0.85 and servers_are_similar(s, k):
            return True
    return False
