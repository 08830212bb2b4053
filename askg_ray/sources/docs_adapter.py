"""Adapter: driver testdata ``documents`` table → Common-Crawl-style pages.

The driver's correctness/bench inputs are the TPC-H-ish tables under
/root/testdata (TESTDATA.md); the KG pipeline's input contract is the
pages table from BASELINE.json's input_hint. This adapter renders each
``documents`` row into a deterministic synthetic server page: entity
fields are a pure function of ``doc_id`` (seeded pools, no randomness
at render time), so the same sf_dir always yields byte-identical pages
— making the full KG pipeline runnable (and oracle-checkable) on the
driver's own tables.

Planted structure: ~1/7 of docs render a DUPLICATE of the previous
doc's entity on a different registry (exact-key dup), and ~1/11 render
a fuzzy name variant — so dedup has work at every scale.
"""

from __future__ import annotations

import hashlib
import random
from datetime import datetime, timedelta

import pyarrow as pa

from ..html_extract import extract_text
from ..vocab import REGISTRIES, REGISTRY_DOMAIN
from .synth import _AUTHORS, _DESC_TEMPLATES, _LANGS, _NOUNS, _QUALS, _VERBS, _mutate_name, _render_html

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])

_BASE_TS = datetime(2025, 3, 1)


def entity_from_index(idx: int) -> dict:
    """Deterministic pseudo-entity for a doc index.

    Every "draw" is md5 arithmetic over ``str(idx)`` — reproducible in
    ANSI SQL (DuckDB ``md5()``), so the rendered pages and the
    extracted-text surface have an exact DuckDB oracle (the
    ``kg_texts`` / ``kg_page_*`` entries in ``__ray_entry__.py``).
    Distributions match the pre-round-5 ``random.Random`` version
    (20% hot author, 30/30/40 name styles, 80% has-repo)."""
    h = hashlib.md5(str(idx).encode()).hexdigest()
    noun = _NOUNS[idx % len(_NOUNS)]
    qual = _QUALS[(idx // len(_NOUNS)) % len(_QUALS)]
    author = (_AUTHORS[0] if int(h[0:8], 16) % 10 < 2
              else _AUTHORS[int(h[8:16], 16) % len(_AUTHORS)])
    style = int(h[16:20], 16) % 10
    if style < 3:
        name = f"mcp-{qual}-{noun}-{idx % 97}"
    elif style < 6:
        name = f"{qual}-{noun}-{idx % 97}-server"
    else:
        name = f"{qual} {noun} {idx % 97}"
    desc = _DESC_TEMPLATES[idx % len(_DESC_TEMPLATES)].format(
        q=qual, n=noun, n2=_NOUNS[(idx * 7 + 3) % len(_NOUNS)])
    has_repo = int(h[20:24], 16) % 10 < 8
    return {
        "name": name,
        "author": author,
        "description": desc,
        "repository": (f"https://github.com/{author}/{name.replace(' ', '-').lower()}"
                       if has_repo else None),
        "homepage": None,
        "language": _LANGS[idx % len(_LANGS)],
        "popularity": (idx * 131) % 5000,
        "tags": [f"#{noun}", qual],
        "tools": [f"{_VERBS[(idx + t) % len(_VERBS)]}_{noun}_{t}"
                  for t in range((idx % 4))],
    }


def _page_for_doc(doc_id: int, lang: str) -> tuple[str, bytes]:
    if doc_id % 7 == 0 and doc_id > 0:
        # exact duplicate of previous doc's entity, next registry over
        e = entity_from_index(doc_id - 1)
        registry = REGISTRIES[(doc_id - 1 + 1) % 4]
        name = e["name"]
    elif doc_id % 11 == 0 and doc_id > 0:
        # fuzzy variant of previous doc's entity, no repo. The "+x"
        # mutation is deterministic AND SQL-expressible; its
        # normalized-name SequenceMatcher ratio is 2n/(2n+1) ∈
        # (0.85, 0.995] for every generated name length, i.e. the same
        # fuzzy-dup band _mutate_name used to target.
        e = dict(entity_from_index(doc_id - 1))
        name = e["name"] + "x"
        e["repository"] = None
        registry = REGISTRIES[(doc_id + 2) % 4]
    else:
        e = entity_from_index(doc_id)
        registry = REGISTRIES[doc_id % 4]
        name = e["name"]
    html = _render_html(e, with_meta_desc=(doc_id % 5 != 1),
                        with_author_in_title=True,
                        name_override=None if name == e["name"] else name)
    slug = name.replace(" ", "-").lower()
    url = f"https://{REGISTRY_DOMAIN[registry]}/server/{slug}/{e['author']}"
    return url, html.encode()


def _replica_page(doc_id: int, r: int) -> tuple[str, bytes]:
    """Replica r ≥ 1: another appearance of doc_id's entity — a
    duplicate the dedup stages must collapse (registry rotated, repo URL
    variants, occasional fuzzy name / missing description). Scales the
    extraction + dedup WORK linearly with the replication factor while
    keeping the canonical node (and edge) set fixed."""
    e = dict(entity_from_index(doc_id))
    registry = REGISTRIES[(doc_id + r) % 4]
    name = e["name"]
    if r % 5 == 4:
        name = _mutate_name(random.Random(doc_id * 31 + r), e["name"], 0.85, 0.995)
        e["repository"] = None
    elif e["repository"]:
        e["repository"] += ["", ".git", "/", ""][r % 4]
    html = _render_html(e, with_meta_desc=(r % 3 != 2),
                        with_author_in_title=True,
                        name_override=None if name == e["name"] else name)
    slug = name.replace(" ", "-").lower()
    url = (f"https://{REGISTRY_DOMAIN[registry]}/server/{slug}/"
           f"{e['author']}?r={r}")
    return url, html.encode()


def docs_to_pages_batch(batch: pa.Table, replication: int = 1,
                        uniq_mult: int = 1,
                        columns: list[str] | None = None) -> pa.Table:
    """``replication``: appearance pages per entity (duplicates the
    dedup cascade must collapse — scales extraction/dedup work, keeps
    the canonical node set fixed). ``uniq_mult``: DISTINCT entities
    rendered per document row (doc_id → extended ids doc_id·m+k) —
    scales the corpus the way real growth does: more unique entities,
    linearly more near-dup clusters, quadratically more edges within
    category blocks (the reference's own edge semantics).

    ``columns``: the generator analog of ``read_parquet(columns=...)``
    projection pushdown. At 100 TB the pages corpus is STORED and a
    reader never decodes columns the pipeline prunes; here the corpus
    is synthesized in-stream, so skipping an un-requested column's
    computation is the faithful equivalent. Concretely: the ``text``
    column costs a full extractor parse per page (measured ≈37% of the
    whole extract stage) and the KG pipeline re-derives text from
    ``html`` anyway."""
    want = set(columns) if columns is not None else {f.name for f in PAGES_SCHEMA}
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, lang in zip(batch["doc_id"].to_pylist(), batch["lang"].to_pylist()):
        doc_id = int(doc_id)
        exts = ([doc_id] if uniq_mult <= 1
                else range(doc_id * uniq_mult, doc_id * uniq_mult + uniq_mult))
        for ext in exts:
            pages = [_page_for_doc(ext, lang)]
            pages += [_replica_page(ext, r) for r in range(1, replication)]
            for r, (url, html) in enumerate(pages):
                urls.append(url)
                tss.append(_BASE_TS + timedelta(seconds=ext, milliseconds=r))
                htmls.append(html)
                if "text" in want:
                    texts.append(extract_text(html))
                langs.append(lang)
    cols = {
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": (pa.array(texts, pa.large_string()) if "text" in want
                 else None),
        "lang": pa.array(langs, pa.string()),
    }
    fields = [f for f in PAGES_SCHEMA if f.name in want]
    return pa.table({f.name: cols[f.name] for f in fields},
                    schema=pa.schema(fields))


def pages_from_documents(sf_dir: str, replication: int = 1,
                         uniq_mult: int = 1,
                         partition: tuple[int, int] | None = None,
                         columns: list[str] | None = None):
    """Ray Dataset of pages rendered from {sf_dir}/documents.parquet.

    The render (and the downstream HTML extraction) is CPU-bound per
    row, and map parallelism is per-block — so the read is split to
    ~2×CPU blocks regardless of parquet row-group layout.

    ``replication`` > 1 emits that many appearance pages per document
    (duplicates the pipeline must collapse) — the bench knob that makes
    the corpus compute-dominated instead of scheduling-floor-bound.

    ``partition=(k, n)`` keeps only docs with ``doc_id % n == k`` —
    the hash-partition grain the incremental runner re-extracts at
    (pipelines/runner.incremental_entities).

    ``columns``: projection pushdown into the generator (see
    docs_to_pages_batch) — callers that never read the stored ``text``
    column (the whole KG build re-derives text from html) pass
    ``columns=KG_PAGE_COLUMNS`` and skip its per-page parse cost,
    exactly as a parquet read would skip decoding it."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    from ..rayutil import default_nblocks

    # The doc-id driver table is dimension-scale (KBs): read it on the
    # driver and pre-split into 2×CPU object-store blocks. A
    # read_parquet here runs as ONE streaming-generator task (single
    # row group) that trickles its SplitBlocks output through the
    # executor's bounded generator buffer — a measured ~3 s serial ramp
    # before the CPU-bound render/extract stage reaches full width. At
    # scale the real input is the pages corpus itself (many files →
    # many read tasks); this path only renders pages FROM the id table.
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang"])
    if partition is not None:
        import numpy as np

        k, n = partition
        ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        docs = docs.filter(pa.array(ids % n == k))
    if docs.num_rows == 0:
        empty = (PAGES_SCHEMA if columns is None
                 else pa.schema([f for f in PAGES_SCHEMA
                                 if f.name in set(columns)]))
        return rd.from_arrow(empty.empty_table())
    nchunks = min(default_nblocks() * 2, max(1, docs.num_rows))
    step = -(-docs.num_rows // nchunks)
    refs = [ray.put(docs.slice(i, step))
            for i in range(0, docs.num_rows, step)]
    return rd.from_arrow_refs(refs).map_batches(
        lambda t: docs_to_pages_batch(t, replication=replication,
                                      uniq_mult=uniq_mult, columns=columns),
        batch_format="pyarrow")


# the projection every html-deriving consumer needs (kg build, kg_texts,
# mention linking, dedup stats): everything except the stored text
KG_PAGE_COLUMNS = ["url", "warc_ts", "html"]


def pages_table_from_documents(sf_dir: str) -> pa.Table:
    """Driver-side (oracle) variant: plain Arrow, no Ray."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    return docs_to_pages_batch(docs)
