"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Generates the Common-Crawl-style ``pages`` table
``(url, warc_ts, html, text, lang)`` with planted ground-truth
structure mirroring the reference's own test style — hand-built records
with planted duplicates (/root/reference/tests/test_global_ids.py:17-81):

  * E entities, each appearing on 1-4 registry page families;
  * exact-duplicate appearances sharing a repository URL
    (dedup key 1, deduplication.py:119-123), sharing name+author with
    no repo (key 2, 125-129), and author-less/repo-less copies that only
    the content-hash key catches (key 3, 131-134);
  * fuzzy name variants with SequenceMatcher ratio > 0.85
    (deduplication.py:202-221) and cross-registry phase-2 variants with
    ratio in (0.70, 0.85] and full-field similarity (323-382);
  * one hot author and keyword-hot descriptions so the relationship
    blocks are Zipfian (skew stress per SURVEY.md §4);
  * ~10% noise pages (extractor → None) and ~2% malformed bytes.

Everything is seeded; the ``text`` column is filled by the frozen
extractor so the byte-identical check is self-consistent.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta
from difflib import SequenceMatcher
from html import escape

import pyarrow as pa

from ..html_extract import extract_text
from ..normalize import normalize_name
from ..vocab import DOMAIN_REGISTRY, REGISTRIES, REGISTRY_DOMAIN  # noqa: F401 (re-export)

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])

_NOUNS = ["postgres", "redis", "filesystem", "webhook", "graphql", "slack",
          "metrics", "search", "neural", "cloud", "oauth", "storage", "git",
          "analytics", "discord", "elasticsearch", "kubernetes", "logging",
          "email", "jwt", "mongodb", "etl", "aws", "notify", "index"]
_QUALS = ["fast", "simple", "secure", "smart", "tiny", "turbo", "hyper",
          "open", "core", "plus", "pro", "lite", "max", "zen", "nova"]
_AUTHORS = ["alice", "bob", "carol", "dmitri", "elena", "fawzi", "grace",
            "hiro", "imani", "jorge", "kavya", "liang"]
_LANGS = ["python", "typescript", "go", "rust"]
_DESC_TEMPLATES = [
    "A {q} MCP server for {n} data access and {n2} integration.",
    "Provides {n} tools with {q} {n2} processing and api support.",
    "{q} server exposing {n} resources over an http api for {n2}.",
    "Connect your agent to {n} with {q} search and {n2} sync.",
]
_VERBS = ["get", "list", "create", "update", "query", "search", "run", "fetch"]


def _mutate_name(rng: random.Random, name: str, lo: float, hi: float) -> str:
    """Deterministically mutate until normalized-name ratio lands in (lo, hi]."""
    base = normalize_name(name)
    for attempt in range(50):
        r = random.Random(rng.randint(0, 1 << 30) + attempt)
        chars = list(name)
        for _ in range(1 + attempt // 10):
            op = r.choice(["dup", "drop", "swap", "suffix"])
            i = r.randrange(1, max(2, len(chars) - 1))
            if op == "dup":
                chars.insert(i, chars[i])
            elif op == "drop" and len(chars) > 4:
                del chars[i]
            elif op == "swap" and i + 1 < len(chars):
                chars[i], chars[i + 1] = chars[i + 1], chars[i]
            else:
                chars.append(r.choice("xyz"))
        cand = "".join(chars)
        ratio = SequenceMatcher(None, base, normalize_name(cand)).ratio()
        if lo < ratio <= hi and normalize_name(cand) != base:
            return cand
    return name + "x"  # last resort: tiny edit (high ratio)


def gen_entities(n_entities: int, seed: int = 42) -> list[dict]:
    """The planted ground-truth entity list."""
    rng = random.Random(seed)
    entities = []
    for i in range(n_entities):
        # Zipf-ish hot author: ~25% of entities share author[0]
        author = _AUTHORS[0] if rng.random() < 0.25 else rng.choice(_AUTHORS)
        noun = _NOUNS[i % len(_NOUNS)]
        qual = rng.choice(_QUALS)
        style = rng.random()
        if style < 0.3:
            name = f"mcp-{qual}-{noun}"
        elif style < 0.6:
            name = f"{qual}-{noun}-server"
        else:
            name = f"{qual} {noun}"
        desc = rng.choice(_DESC_TEMPLATES).format(
            q=qual, n=noun, n2=rng.choice(_NOUNS))
        has_repo = rng.random() < 0.8
        repo = (f"https://github.com/{author}/{name.replace(' ', '-').lower()}"
                if has_repo else None)
        n_tools = rng.randint(0, 4)
        tools = [f"{rng.choice(_VERBS)}_{noun}_{t}" for t in range(n_tools)]
        entities.append({
            "eid": i,
            "name": name,
            "author": author,
            "description": desc,
            "repository": repo,
            "homepage": f"https://{name.replace(' ', '-').lower()}.dev" if rng.random() < 0.4 else None,
            "language": rng.choice(_LANGS),
            "popularity": rng.randint(0, 5000),
            "tags": [f"#{noun}", qual] + (["data"] if rng.random() < 0.5 else []),
            "tools": tools,
        })
    return entities


def _render_html(e: dict, *, with_meta_desc: bool, with_author_in_title: bool,
                 name_override: str | None = None,
                 repo_override: str | None = "KEEP") -> str:
    name = name_override or e["name"]
    repo = e["repository"] if repo_override == "KEEP" else repo_override
    title = f"{name} by {e['author']}" if with_author_in_title and e["author"] else name
    parts = ["<html><head><title>", escape(title), "</title>"]
    if with_meta_desc:
        parts.append(f'<meta name="description" content="{escape(e["description"], quote=True)}">')
    parts.append(f'<meta name="language" content="{e["language"]}">')
    parts.append(f'<meta name="popularity" content="{e["popularity"]}">')
    parts.append("</head><body>")
    parts.append(f"<h1>{escape(title)}</h1>")
    parts.append(f"<p>{escape(e['description'])}</p>")
    if repo:
        parts.append(f'<a href="{escape(repo, quote=True)}">GitHub</a>')
    if e.get("homepage"):
        parts.append(f'<a href="{escape(e["homepage"], quote=True)}">Homepage</a>')
    for t in e["tags"]:
        parts.append(f'<span class="tag">{escape(t)}</span>')
    if e["tools"]:
        parts.append("<ul>")
        for tool in e["tools"]:
            parts.append(f'<li class="tool">{escape(tool)}</li>')
        parts.append("</ul>")
    parts.append("<script>var n=1;</script></body></html>")
    return "".join(parts)


def _page_url(registry: str, name: str, author: str | None) -> str:
    domain = REGISTRY_DOMAIN[registry]
    slug = name.replace(" ", "-").lower()
    return f"https://{domain}/server/{slug}/{author or 'unknown'}"


def gen_pages(n_entities: int = 100, seed: int = 42) -> pa.Table:
    """Render the pages table. ~2.2 pages/entity + noise + malformed."""
    rng = random.Random(seed + 1)
    entities = gen_entities(n_entities, seed)
    rows = []  # (url, html_bytes, lang)

    for e in entities:
        regs = rng.sample(REGISTRIES, k=rng.randint(1, 4))
        primary = regs[0]
        rows.append((_page_url(primary, e["name"], e["author"]),
                     _render_html(e, with_meta_desc=True, with_author_in_title=True),
                     "en"))
        kind_roll = rng.random()
        for extra_reg in regs[1:]:
            if kind_roll < 0.35 and e["repository"]:
                # key-1 dup: same repo URL (maybe with .git / trailing slash)
                repo_variant = e["repository"] + rng.choice(["", ".git", "/"])
                rows.append((_page_url(extra_reg, e["name"], e["author"]),
                             _render_html(e, with_meta_desc=rng.random() < 0.7,
                                          with_author_in_title=True,
                                          repo_override=repo_variant),
                             "en"))
            elif kind_roll < 0.55:
                # key-2 dup: same name+author, no repo
                rows.append((_page_url(extra_reg, e["name"], e["author"]),
                             _render_html(e, with_meta_desc=True,
                                          with_author_in_title=True,
                                          repo_override=None),
                             "en"))
            elif kind_roll < 0.70:
                # key-3 dup: author-less + repo-less copy → content-hash path
                e2 = dict(e, author=None)
                rows.append((_page_url(extra_reg, e["name"], None),
                             _render_html(e2, with_meta_desc=True,
                                          with_author_in_title=False,
                                          repo_override=None),
                             "en"))
            elif kind_roll < 0.85:
                # fuzzy dup: name ratio > 0.85, same author/desc/lang, no repo
                fuzzy_name = _mutate_name(rng, e["name"], 0.85, 0.995)
                rows.append((_page_url(extra_reg, fuzzy_name, e["author"]),
                             _render_html(e, with_meta_desc=True,
                                          with_author_in_title=True,
                                          name_override=fuzzy_name,
                                          repo_override=None),
                             "en"))
            else:
                # phase-2 cross-registry variant: ratio in (0.70, 0.85],
                # different repo same org
                p2_name = _mutate_name(rng, e["name"], 0.70, 0.85)
                p2_repo = (f"https://github.com/{e['author']}/"
                           f"{p2_name.replace(' ', '-').lower()}")
                rows.append((_page_url(extra_reg, p2_name, e["author"]),
                             _render_html(e, with_meta_desc=True,
                                          with_author_in_title=True,
                                          name_override=p2_name,
                                          repo_override=p2_repo),
                             "en"))

    # noise pages: too-short URL path + no h1/title name → extractor None
    n_noise = max(1, len(rows) // 9)
    for k in range(n_noise):
        domain = REGISTRY_DOMAIN[REGISTRIES[k % 4]]
        rows.append((f"https://{domain}/about{k}",
                     f"<html><body><p>About page {k}, nothing here.</p></body></html>",
                     rng.choice(["en", "en", "en", "de", "fr"])))

    # malformed pages (~2%): invalid utf-8, no parseable structure
    n_bad = max(1, len(rows) // 45)
    bad_rows = []
    for k in range(n_bad):
        bad_rows.append((f"https://{REGISTRY_DOMAIN['glama']}/bad{k}",
                         b"\xff\xfe<ht" + bytes([rng.randrange(256) for _ in range(40)]),
                         "en"))

    base_ts = datetime(2025, 1, 1)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for i, (url, html, lang) in enumerate(rows):
        b = html.encode() if isinstance(html, str) else html
        urls.append(url)
        tss.append(base_ts + timedelta(seconds=137 * i))
        htmls.append(b)
        texts.append(extract_text(b))
        langs.append(lang)
    for i, (url, b, lang) in enumerate(bad_rows):
        urls.append(url)
        tss.append(base_ts + timedelta(seconds=137 * (len(rows) + i)))
        htmls.append(b)
        texts.append(extract_text(b))
        langs.append(lang)

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.large_string()),
        "lang": pa.array(langs, pa.string()),
    }, schema=PAGES_SCHEMA)


def gen_alias_dict(n_entities: int = 100, seed: int = 42) -> pa.Table:
    """Broadcast alias table (FIXTURES.md §2): surface form → canonical id."""
    from ..normalize import global_id_candidate
    entities = gen_entities(n_entities, seed)
    aliases, eids, weights = [], [], []
    for e in entities:
        _, gid = global_id_candidate(e["name"], e["author"], e["repository"],
                                     e["description"], e["tools"])
        forms = {e["name"], e["name"].replace(" ", "-").lower(),
                 normalize_name(e["name"])}
        if e["repository"]:
            forms.add(e["repository"].rsplit("/", 1)[-1])
        for f in sorted(forms):
            if f:
                aliases.append(f)
                eids.append(gid)
                weights.append(round(0.5 + 0.5 * (len(f) / 40.0), 4))
    return pa.table({"alias": aliases, "entity_id": eids, "weight": weights})
