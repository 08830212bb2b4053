"""Arrow table ⇄ python-record helpers for map_groups bodies.

Group-merge logic (merge.py) works on plain dicts; these helpers keep
the Arrow round-trip schema-exact (pandas would silently turn nullable
int64 into float64 and lists into object arrays).
"""

from __future__ import annotations

import pyarrow as pa

# Canonical record order replacing the reference's input order
# ("first wins" dedup, pair direction) — SURVEY.md §2.11.
CANON_SORT = ("reg_prio", "warc_ts", "id", "source_url")

# Capability structs (SURVEY.md §1.3): MCPTool{name, description,
# parameters} → struct with parameters carried as JSON text
# (/root/reference/src/models.py:41-44). Resources/prompts follow the
# same shape when a source provides them.
TOOLS_TYPE = pa.list_(pa.struct([
    ("name", pa.string()),
    ("description", pa.string()),
    ("parameters_json", pa.string()),
]))

# MCPResource{uri, name, description, mime_type}
# (/root/reference/src/models.py:47-52) and MCPPrompt{name, description,
# arguments} (models.py:54-57, arguments carried as JSON text like tool
# parameters). Only API-shaped sources (glama) fill them; the HTML
# extractor leaves them null.
RESOURCES_TYPE = pa.list_(pa.struct([
    ("uri", pa.string()),
    ("name", pa.string()),
    ("description", pa.string()),
    ("mime_type", pa.string()),
]))

PROMPTS_TYPE = pa.list_(pa.struct([
    ("name", pa.string()),
    ("description", pa.string()),
    ("arguments_json", pa.string()),
]))

# nodes-table schema after enrichment (stages/extract.py + keys).
NODES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
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
    ("reg_prio", pa.int32()),
    ("categories", pa.list_(pa.string())),
    ("operations", pa.list_(pa.string())),
    ("repo_key", pa.string()),
    ("na_key", pa.string()),
    ("content_key", pa.string()),
    ("norm_name", pa.string()),
    ("gid_tier", pa.int32()),
    ("gid_candidate", pa.string()),
])

# rel_type is dictionary-encoded (4 distinct predicates — SURVEY §1.3);
# created_at is the reference's ServerRelationship.created_at
# (models.py:122), carried as a deterministic build timestamp.
# SURVEY §1.3 edge table. src/dst/description/evidence are
# dictionary-encoded (same sanction as nodes' registry_source "string
# (dict-encoded)"): an edge block drawn from a node cell references a
# few thousand distinct node ids / description strings but emits
# millions of pairs — plain string columns were 211 B/edge (4.1 GB at
# the sf0.1 bench corpus), and on this sandbox every freshly-allocated
# output page costs ~0.3 ms of first-touch fault time; dictionary
# indices cut the edge block to ~1/4 the bytes with zero information
# loss. evidence is a LIST OF dictionary items (not a dictionary of
# lists): Arrow implements concat/unification and parquet writes for
# nested-item dictionaries, but not for dictionaries with nested
# VALUE types — and Ray's batch iterator combines chunks across
# blocks, which requires unification.
EDGES_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("src", pa.dictionary(pa.int32(), pa.string())),
    ("dst", pa.dictionary(pa.int32(), pa.string())),
    ("rel_type", pa.dictionary(pa.int8(), pa.string())),
    ("confidence", pa.float64()),
    ("description", pa.dictionary(pa.int32(), pa.string())),
    ("evidence", pa.list_(pa.dictionary(pa.int32(), pa.string()))),
    ("created_at", pa.timestamp("us")),
])


def records_of(table: pa.Table) -> list[dict]:
    return table.to_pylist()


def table_of(records: list[dict], schema: pa.Schema) -> pa.Table:
    if not records:
        return schema.empty_table()
    cols = {f.name: [r.get(f.name) for r in records] for f in schema}
    return pa.table({n: pa.array(v, schema.field(n).type) for n, v in cols.items()},
                    schema=schema)


def list_col_matrix(col: "pa.ChunkedArray | pa.Array", dtype=None) -> "object":
    """list<float> column → (n, dim) numpy matrix without a Python-list
    round trip: flatten the Arrow child buffer and reshape. Falls back
    to to_pylist() for ragged rows (never the case for embeddings)."""
    import numpy as np

    dtype = dtype or np.float64
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), dtype=dtype)
    offsets = arr.offsets.to_numpy()
    widths = offsets[1:] - offsets[:-1]
    if (widths == widths[0]).all() and arr.null_count == 0:
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
        return flat.reshape(len(arr), widths[0])
    return np.array(arr.to_pylist(), dtype=dtype)


def canon_key(rec: dict) -> tuple:
    """Sort key for the canonical record order; None-safe."""
    return (rec.get("reg_prio") if rec.get("reg_prio") is not None else 99,
            rec.get("warc_ts") or pa.scalar(0, pa.timestamp("us")).as_py(),
            rec.get("id") or "",
            rec.get("source_url") or "")


def sort_canonical(records: list[dict]) -> list[dict]:
    return sorted(records, key=canon_key)
