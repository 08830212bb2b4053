"""Bucketed group-merge — keyed grouping without per-group task overhead.

``groupby(key).map_groups(fn)`` pays a Python wrapper + pyarrow slice +
1-row table build PER GROUP; with mostly-singleton keys (exact dedup,
label resolution) that is tens of thousands of ~1 ms calls — the
measured dominant cost of the dedup cascade at any corpus size, because
group count scales with the data.

``merge_runs`` instead groups on ``crc32(key) % nbuckets`` (a few
hundred groups regardless of corpus size), then inside each bucket:

  1. sort the bucket block by ``key`` (one vectorized Arrow sort);
  2. find key runs via one numpy adjacent-compare;
  3. runs of length 1 — the vast majority — are emitted with a single
     zero-copy ``take``; no Python record ever materializes;
  4. only multi-row runs (actual duplicate groups) go through
     ``multi_fn(records) -> records``.

Exact same semantics as per-key map_groups (each key's rows arrive
together, multi_fn orders them itself), ~10× less overhead. Skew note:
a pathologically hot key serializes inside its one bucket — identical
to plain map_groups; nbuckets should be ≥ cluster-core count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import records_of, table_of


def _bucket_of(vals: list, nbuckets: int) -> pa.Array:
    """Vectorized key → bucket id (deterministic across processes:
    pandas' hash uses a fixed key). Any stable hash works — buckets
    only distribute; all rows of one key still land together."""
    import pandas as pd
    from pandas.util import hash_pandas_object

    h = hash_pandas_object(pd.Series(vals, dtype=object).astype(str),
                           index=False).to_numpy()
    return pa.array((h % np.uint64(nbuckets)).astype(np.int32), pa.int32())


def merge_table_runs(t: pa.Table, key: str, multi_fn,
                     out_schema: pa.Schema, single_fn=None) -> pa.Table:
    """The run-merge kernel over ONE table: sort by ``key``, emit
    singleton runs with a zero-copy take, route multi-row runs through
    ``multi_fn``. Shared by the distributed per-bucket reduce
    (merge_runs) and the small-side single-task cascade
    (stages/exchange.exchange_merge_runs)."""
    if t.num_rows == 0:
        return out_schema.empty_table()
    out_cols = [f.name for f in out_schema]
    t = t.take(pc.sort_indices(t, sort_keys=[(key, "ascending")]))
    ks = np.asarray(t[key].to_pylist(), dtype=object)
    # run starts: index 0 plus every key change
    change = np.nonzero(ks[1:] != ks[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(ks)]))
    lens = ends - starts
    single = lens == 1
    data = t.select(out_cols)
    parts = []
    if single.any():
        taken = data.take(pa.array(starts[single], pa.int64()))
        parts.append(single_fn(taken) if single_fn is not None else taken)
    merged: list[dict] = []
    for s, e in zip(starts[~single], ends[~single]):
        merged.extend(multi_fn(records_of(data.slice(s, e - s))))
    if merged:
        parts.append(table_of(merged, out_schema))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables([p.cast(out_schema) for p in parts])


def bucket_groups(ds, key: str, bucket_fn, nbuckets: int = 256):
    """Keyed grouping with a fully VECTORIZED per-bucket kernel.

    Like ``merge_runs`` but the caller handles the whole bucket table
    at once (``bucket_fn(table) -> table``) — for kernels whose
    per-group work is itself expressible as array ops (e.g. the
    hash-to-min round in stages/components.py), so no per-group Python
    call happens at all. All rows of any one ``key`` value arrive in
    the same bucket table; ``bucket_fn`` must not rely on row order."""
    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__b", _bucket_of(t[key].to_pylist(), nbuckets))

    def run_bucket(t: pa.Table) -> pa.Table:
        return bucket_fn(t.drop_columns(["__b"]))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(run_bucket, batch_format="pyarrow"))


def merge_runs(ds, key: str, multi_fn, out_schema: pa.Schema,
               nbuckets: int = 256, single_fn=None):
    """ds + key column → per-key merge with singleton passthrough.

    ds must contain ``key`` (non-null; callers sentinel-fill) plus
    exactly out_schema's columns (the key may itself be one of them).
    multi_fn: list[dict] (all rows of one key, unordered) → list[dict]
    rows to emit for that key. ``single_fn``: optional VECTORIZED
    transform (table → table, out_schema) applied to all singleton-run
    rows of a bucket at once; default passthrough.
    """
    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__b", _bucket_of(t[key].to_pylist(), nbuckets))

    def merge_bucket(t: pa.Table) -> pa.Table:
        return merge_table_runs(t, key, multi_fn, out_schema,
                                single_fn=single_fn)

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(merge_bucket, batch_format="pyarrow"))
