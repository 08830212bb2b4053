"""Extraction + enrichment map_batches stages (stateless).

extract_batch: pages (url, warc_ts, html) → per-page record with the
frozen extractor's text AND entity fields (entity fields null for noise
pages). One parse per row — HTML parsing is inherently per-row; the
output assembly is columnar Arrow. Reference semantics:
/root/reference/src/scrapers.py:611-690 (see html_extract.py).

enrich_batch: nodes_raw → + categories/operations (classify.py) and
every dedup / id key column (normalize.py). Pure scalar fns, no
shuffle (SURVEY.md §2.2 M8-M9, M13-M19).

Both drop their input's widest columns as early as possible: html never
survives extract_batch; text never survives entity projection
(SURVEY.md §7 hard-part (e)).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import PROMPTS_TYPE, RESOURCES_TYPE, TOOLS_TYPE
from ..classify import categorize, determine_operations
from ..html_extract import extract_entity_from_doc, parse_html
from ..normalize import (
    content_hash_md5,
    global_id_candidate,
    name_author_key,
    normalize_name,
    normalize_repository_url,
)
from ..vocab import REGISTRY_PRIORITY, registry_for_url

# Entity columns produced by extract_batch (besides url/warc_ts/text).
_ENTITY_FIELDS = [
    ("id", pa.string()),
    ("name", pa.string()),
    ("author", pa.string()),
    ("description", pa.large_string()),
    ("repository", pa.string()),
    ("homepage", pa.string()),
    ("version", pa.string()),
    ("license", pa.string()),
    ("implementation_language", pa.string()),
    ("popularity_score", pa.int64()),
    ("download_count", pa.int64()),
    ("data_types", pa.list_(pa.string())),
    ("tool_names", pa.list_(pa.string())),
    ("tools", TOOLS_TYPE),
    ("resources", RESOURCES_TYPE),
    ("prompts", PROMPTS_TYPE),
    ("raw_metadata_json", pa.large_string()),
    ("registry_source", pa.string()),
    ("source_url", pa.string()),
]

EXTRACTED_SCHEMA = pa.schema(
    [("url", pa.string()), ("warc_ts", pa.timestamp("us")),
     ("text", pa.large_string()), ("is_entity", pa.bool_())]
    + _ENTITY_FIELDS
)


def extract_batch(batch: pa.Table) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    cols: dict[str, list] = {name: [] for name, _ in _ENTITY_FIELDS}
    texts: list[str] = []
    flags: list[bool] = []
    for url, html in zip(urls, htmls):
        # one frozen parse per page feeds both text and entity
        doc_text = None
        ent = None
        try:
            doc = parse_html(html)
            doc_text = doc.text
            ent = extract_entity_from_doc(url, doc, registry_for_url(url))
        except Exception:
            pass
        texts.append(doc_text or "")
        flags.append(ent is not None)
        for name, _ in _ENTITY_FIELDS:
            cols[name].append(ent.get(name) if ent else None)
    arrays = [
        pa.array(urls, pa.string()),
        batch["warc_ts"].combine_chunks() if isinstance(batch["warc_ts"], pa.ChunkedArray) else batch["warc_ts"],
        pa.array(texts, pa.large_string()),
        pa.array(flags, pa.bool_()),
    ] + [pa.array(cols[name], typ) for name, typ in _ENTITY_FIELDS]
    return pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)


def entities_only(batch: pa.Table) -> pa.Table:
    """Keep entity rows, drop the text/html-adjacent columns."""
    out = batch.filter(pc.equal(batch["is_entity"], True))
    return out.drop_columns(["text", "is_entity"])


def texts_only(batch: pa.Table) -> pa.Table:
    return batch.select(["url", "text"])


def validate_batch(batch: pa.Table) -> pa.Table:
    """Schema/invariant validation — the Pydantic-validation analog
    (SURVEY.md §1.3): instead of raising (the reference skips invalid
    records, run_full_deduplication.py:50-56), a ``quarantine_reason``
    column routes failures to a quarantine table downstream."""
    ids = batch["id"].to_pylist()
    names = batch["name"].to_pylist()
    regs = batch["registry_source"].to_pylist()
    pops = batch["popularity_score"].to_pylist()
    urls = batch["source_url"].to_pylist()
    reasons = []
    for i in range(batch.num_rows):
        if not ids[i] or not names[i]:
            reasons.append("missing_identity")
        elif regs[i] not in REGISTRY_PRIORITY:
            reasons.append("unknown_registry")
        elif pops[i] is not None and pops[i] < 0:
            reasons.append("negative_popularity")
        elif not urls[i]:
            reasons.append("missing_source_url")
        else:
            reasons.append(None)
    return batch.append_column("quarantine_reason",
                               pa.array(reasons, pa.string()))


def valid_only(batch: pa.Table) -> pa.Table:
    t = batch.filter(pc.is_null(batch["quarantine_reason"]))
    return t.drop_columns(["quarantine_reason"])


def quarantined_only(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch["quarantine_reason"]))


def enrich_batch(batch: pa.Table) -> pa.Table:
    """Add categories/operations + all dedup/id key columns."""
    names = batch["name"].to_pylist()
    authors = batch["author"].to_pylist()
    descs = batch["description"].to_pylist()
    repos = batch["repository"].to_pylist()
    tools = batch["tool_names"].to_pylist()

    cats_col, ops_col, repo_keys, na_keys, chashes, norm_names = [], [], [], [], [], []
    gid_tiers, gid_cands = [], []
    for name, author, desc, repo, tool_names in zip(names, authors, descs, repos, tools):
        cats = categorize(name, desc)
        ops = determine_operations(tool_names)
        cats_col.append(cats)
        ops_col.append(ops)
        repo_keys.append(normalize_repository_url(repo))
        na_keys.append(name_author_key(name, author))
        chashes.append(content_hash_md5(name, author, desc, cats, ops))
        norm_names.append(normalize_name(name))
        tier, cand = global_id_candidate(name, author, repo, desc, tool_names)
        gid_tiers.append(tier)
        gid_cands.append(cand)

    reg_prio = [REGISTRY_PRIORITY.get(r, 99)
                for r in batch["registry_source"].to_pylist()]
    return (batch
            .append_column("reg_prio", pa.array(reg_prio, pa.int32()))
            .append_column("categories", pa.array(cats_col, pa.list_(pa.string())))
            .append_column("operations", pa.array(ops_col, pa.list_(pa.string())))
            .append_column("repo_key", pa.array(repo_keys, pa.string()))
            .append_column("na_key", pa.array(na_keys, pa.string()))
            .append_column("content_key", pa.array(chashes, pa.string()))
            .append_column("norm_name", pa.array(norm_names, pa.string()))
            .append_column("gid_tier", pa.array(gid_tiers, pa.int32()))
            .append_column("gid_candidate", pa.array(gid_cands, pa.string())))
