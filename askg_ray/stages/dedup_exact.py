"""Exact dedup — cascaded hash-partitioned groupby merges.

Reproduces the reference's phase-1 key dedup
(/root/reference/src/deduplication.py:117-156) as three cascaded
``groupby(key).map_groups(merge_group)`` shuffles:
  1. repo_key   (normalized repository URL, deduplication.py:119-123)
  2. na_key     (norm_name|norm_author,      deduplication.py:125-129)
  3. content_key (md5 blocking key,          deduplication.py:131-134)

Order-dependence of the reference's streaming "first wins" is replaced
by the canonical record order (arrowutil.CANON_SORT); the group winner
keeps its ORIGINAL key columns — matching the reference, whose indexes
store the unique record's keys at add time and never re-key after a
merge (deduplication.py:142-156).

Null-keyed rows (the reference skips those checks for missing fields)
get a per-row sentinel key ("\\0" + id) so they ride the same shuffle as
singleton groups — no dataset fork, no union, no intermediate
materialization: the whole cascade is three chained shuffles executed
in one streaming pass.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import NODES_SCHEMA, records_of, sort_canonical, table_of
from ..merge import merge_phase1


def _merge_group(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0 or "__k" not in batch.column_names:
        return NODES_SCHEMA.empty_table()
    if batch.num_rows == 1:
        return batch.drop_columns(["__k"])
    recs = sort_canonical(records_of(batch.drop_columns(["__k"])))
    base = recs[0]
    for dup in recs[1:]:
        base = merge_phase1(base, dup)
    return table_of([base], NODES_SCHEMA)


def _dedup_on(ds, key: str):
    def add_sentinel(t: pa.Table) -> pa.Table:
        k = t[key]
        sentinel = pc.binary_join_element_wise(
            pa.scalar("\0"), t["id"], "")
        merged = pc.if_else(pc.is_valid(k), k, sentinel)
        return t.append_column("__k", merged)

    return (ds.map_batches(add_sentinel, batch_format="pyarrow")
            .groupby("__k")
            .map_groups(_merge_group, batch_format="pyarrow"))


def dedup_exact(nodes):
    """nodes (enriched) → survivors of the three exact key stages."""
    ds = _dedup_on(nodes, "repo_key")
    ds = _dedup_on(ds, "na_key")
    ds = _dedup_on(ds, "content_key")  # never null, but same code path
    return ds
