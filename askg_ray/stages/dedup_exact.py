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
in one streaming pass. At entity scale (materialized input ≤
stages/exchange.EXCHANGE_MAX rows) the same cascade runs as three
direct-task keyed exchanges instead — identical kernels, no per-shuffle
operator floor.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import NODES_SCHEMA, sort_canonical
from ..merge import merge_phase1
from .runs import merge_runs

_KEYS = ("repo_key", "na_key", "content_key")



def _merge_key_group(recs: list[dict]) -> list[dict]:
    recs = sort_canonical(recs)
    base = recs[0]
    for dup in recs[1:]:
        base = merge_phase1(base, dup)
    return [base]


def _add_sentinel(t: pa.Table, key: str) -> pa.Table:
    k = t[key]
    sentinel = pc.binary_join_element_wise(pa.scalar("\0"), t["id"], "")
    merged = pc.if_else(pc.is_valid(k), k, sentinel)
    return t.append_column("__k", merged)


def _dedup_on(ds, key: str):
    return merge_runs(
        ds.map_batches(lambda t, key=key: _add_sentinel(t, key),
                       batch_format="pyarrow"),
        "__k", _merge_key_group, NODES_SCHEMA)


def dedup_exact(nodes, small_max: int | None = None):
    """nodes (enriched) → survivors of the three exact key stages.

    Entity-scale inputs (materialized, ≤ EXCHANGE_MAX rows — count is
    free there, and a lazy upstream must not execute twice) run the
    cascade as three direct-task keyed exchanges (stages/exchange):
    same run-merge kernel, no groupby sort-shuffle floor, per-group
    merge work still spread over the reducers. Larger inputs use the
    streaming shuffle cascade unconditionally."""
    from ray.data.dataset import MaterializedDataset

    from .exchange import EXCHANGE_MAX, exchange_merge_runs

    small_max = EXCHANGE_MAX if small_max is None else small_max
    n = nodes.count() if isinstance(nodes, MaterializedDataset) else None
    if n is not None and n <= small_max:
        ds = nodes
        for key in _KEYS:
            ds = exchange_merge_runs(
                ds, "__k", _merge_key_group, NODES_SCHEMA,
                pre_fn=lambda t, key=key: _add_sentinel(t, key))
        return ds
    ds = _dedup_on(nodes, "repo_key")
    ds = _dedup_on(ds, "na_key")
    ds = _dedup_on(ds, "content_key")  # never null, but same code path
    return ds
