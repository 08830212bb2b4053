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
merge (deduplication.py:142-156). Null-keyed rows bypass their stage
(the reference skips those checks for missing fields).

Scale notes: each stage is one all-to-all hash shuffle on a short
string key; groups are duplicate clusters (tiny), so map_groups tasks
are balanced. No driver materialization.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import NODES_SCHEMA, records_of, sort_canonical, table_of
from ..merge import merge_phase1


def _merge_group(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 1:
        return batch
    recs = sort_canonical(records_of(batch))
    base = recs[0]
    for dup in recs[1:]:
        base = merge_phase1(base, dup)
    return table_of([base], NODES_SCHEMA)


def _dedup_on(ds, key: str):
    def keep_valid(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[key]))

    def keep_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t[key]))

    # fork point: both branches consume ds — compact + pin it so the
    # upstream pipeline neither re-executes per branch nor fragments the
    # following shuffle into hundreds of row-scale blocks
    from ..rayutil import compact
    ds = compact(ds)
    with_key = ds.map_batches(keep_valid, batch_format="pyarrow")
    without_key = ds.map_batches(keep_null, batch_format="pyarrow")
    merged = with_key.groupby(key).map_groups(_merge_group, batch_format="pyarrow")
    return merged.union(without_key)


def dedup_exact(nodes):
    """nodes (enriched) → survivors of the three exact key stages."""
    ds = _dedup_on(nodes, "repo_key")
    ds = _dedup_on(ds, "na_key")
    ds = _dedup_on(ds, "content_key")  # never null, but same code path
    return ds
