"""Direct-task keyed exchange for entity-scale run-merges.

Ray Data's ``groupby(key).map_groups`` sort-shuffle pays a multi-second
per-exchange floor (sample pass + sort + range reduce operators)
REGARDLESS of data size — measured 2.5-6 s per exchange on this
hardware for tables of a few 10^4 rows. The KG pipeline's narrow
stages (exact-dedup cascade, component grouping, global-id suffixes)
all operate at canonical-entity scale — the narrow end of the funnel —
so that floor, not compute, dominates them on small-to-medium corpora
and caps N-vs-4N scaling efficiency.

For MATERIALIZED inputs under a caller-enforced row bound this module
runs the same keyed co-location as M×R direct Ray tasks over the
existing blocks (the sanctioned drop-to-raw-tasks case: the Dataset
API cannot express a floor-free small exchange):

  * M split tasks — one per input block, applying the caller's pre-map
    (sentinel fill / label tag) and splitting by ``crc32(key) % R``
    with one vectorized filter per reducer;
  * R reduce tasks — concat their slices, run the shared run-merge
    kernel (stages/runs.merge_table_runs);
  * results re-enter Ray Data zero-copy via ``from_arrow_refs``.

Semantics are identical to the bucketed ``merge_runs`` shuffle: each
key's rows meet in exactly one reduce task and the kernels order their
groups themselves. Backpressure is not needed — the input is pinned
and bounded. Above the bound callers MUST use the streaming shuffle
path (stages/runs.merge_runs), which scales unconditionally; both
paths are forced in tests.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray

from .runs import merge_table_runs

# callers gate on this: max rows of a table the direct exchange accepts
import os

EXCHANGE_MAX = int(os.environ.get("ASKG_EXCHANGE_MAX", "250000"))


def _nred_default(n_rows: int) -> int:
    # ~20 ms of task overhead per reducer per exchange (measured): size
    # the reducer count to ~3k rows each so tiny tables pay the 8-task
    # minimum and big ones still spread their per-group Python work.
    # Beyond 128M rows the 64-reducer cap lifts toward 256 (~2M rows ≈
    # 48 MB per reducer) so the hundred-million-row exchanges the
    # round-4 gate raises admit keep flat per-reducer memory — the
    # 224M-row sf0.1 cosine partials reduce in ~13 s at this sizing.
    # Round 5: the row-derived count is additionally capped at 4× the
    # cluster's CPU count — on a narrow cluster, 54 reducers over 4
    # cpus is 13 waves of pure launch floor for the same work 16
    # reducers do in 4 (the measured driver of the 4-cpu exchange
    # overhead in SCALING_r04's Amdahl fit). Wide clusters are
    # unaffected; the 2M-rows/reducer memory bound still wins at the
    # high end so per-reducer heap stays flat.
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    by_rows = min(max(8, min(64, -(-n_rows // 3000))), max(8, 4 * cpus))
    return max(by_rows, min(256, -(-n_rows // 2_000_000)))


def _hash_buckets(col, nred: int) -> np.ndarray:
    """Reducer bucket per row. Integer keys take a fully vectorized
    uint64 wrap-mix (the packed-pair exchanges have ~all-distinct keys,
    where the per-distinct Python crc32 loop was ~0.5 s per 2M-row
    split block); other types hash crc32(str) once per DISTINCT key
    via dictionary encode — keyed exchanges with repeating keys pay
    one Python hash per unique value."""
    if pa.types.is_integer(col.type):
        v = (col.combine_chunks().to_numpy(zero_copy_only=False)
             .astype(np.int64).view(np.uint64))
        return ((v * np.uint64(0x9E3779B97F4A7C15))
                % np.uint64(nred)).astype(np.int64)
    enc = col.combine_chunks().dictionary_encode()
    per_uniq = np.array([zlib.crc32(str(v).encode()) % nred
                         for v in enc.dictionary.to_pylist()],
                        dtype=np.int64)
    return per_uniq[enc.indices.to_numpy(zero_copy_only=False)]


@ray.remote
def _split_block(tbl: pa.Table, pre_fn, key: str, nred: int):
    """ONE gather, R zero-copy slices. The obvious per-reducer
    ``filter(b == r)`` loop scans the full block R times — O(R × bytes),
    measured 5 s for 54 reducers over a 100 MB table; sorting the
    bucket array once and slicing run boundaries is O(bytes)."""
    if tbl.num_rows == 0:
        # Ray's map_batches/map_groups can emit SCHEMA-LESS empty blocks
        # (an empty upstream partition skips the fn); they carry nothing
        # and pre_fns are allowed to index columns, so bail BEFORE
        # pre_fn — hand every reducer a None, which _reduce_parts drops
        return (None,) * nred
    if pre_fn is not None:
        tbl = pre_fn(tbl)
    if tbl.num_rows == 0 or key not in tbl.column_names:
        return (None,) * nred
    b = _hash_buckets(tbl[key], nred)
    order = np.argsort(b, kind="stable")
    tbl = tbl.take(pa.array(order))
    bs = b[order]
    bounds = np.searchsorted(bs, np.arange(nred + 1))
    return tuple(tbl.slice(int(bounds[r]), int(bounds[r + 1] - bounds[r]))
                 for r in range(nred))


@ray.remote
def _reduce_parts(reduce_fn, out_schema: pa.Schema, *parts):
    if os.environ.get("ASKG_PROF"):
        import sys
        import time
        t0 = time.time()
        nin = sum(p.num_rows for p in parts if p is not None)
        parts = [p for p in parts if p is not None and p.num_rows]
        if not parts:
            return out_schema.empty_table()
        if os.environ.get("ASKG_PROF_CPROF"):
            import cProfile
            import io
            import pstats
            pr = cProfile.Profile()
            pr.enable()
            out = reduce_fn(pa.concat_tables(parts, promote_options="default"))
            pr.disable()
            dur = time.time() - t0
            if dur > float(os.environ.get("ASKG_PROF_CPROF", "5")):
                buf = io.StringIO()
                pstats.Stats(pr, stream=buf).sort_stats("tottime") \
                    .print_stats(12)
                print(f"[rprof] dur={dur:7.3f} in={nin}\n{buf.getvalue()}",
                      file=sys.stderr, flush=True)
            return out
        out = reduce_fn(pa.concat_tables(parts, promote_options="default"))
        print(f"[rtask] dur={time.time() - t0:7.3f} in={nin} "
              f"out={out.num_rows}", file=sys.stderr, flush=True)
        return out
    parts = [p for p in parts if p is not None and p.num_rows]
    if not parts:
        return out_schema.empty_table()
    return reduce_fn(pa.concat_tables(parts, promote_options="default"))


def exchange_reduce(ds, key: str, reduce_fn, out_schema: pa.Schema,
                    pre_fn=None, nred: int | None = None):
    """Generic direct-task keyed exchange: M split tasks (pre_fn +
    hash-split on ``key``) feeding ``nred`` reduce tasks that each run
    ``reduce_fn(concat_of_their_slices) -> pa.Table``. All rows sharing
    a key meet in exactly one reduce task; the kernel orders/groups its
    input itself. Caller is responsible for the row-bound gate and for
    passing a MATERIALIZED ds (the streaming groupby path is the
    unconditionally-scalable shape above the bound).
    """
    import ray.data as rd

    # nred >= 2 always: options(num_returns=1).remote() returns a bare
    # ObjectRef (not a 1-list), which would break the s[r] fan-in below
    nred = max(2, nred or _nred_default(ds.count()))
    refs = ds.get_internal_block_refs()
    if not refs:
        return rd.from_arrow(out_schema.empty_table())

    from ..rayutil import prof

    prof(f"exchange:start M={len(refs)} R={nred}")
    splits = [_split_block.options(num_returns=nred).remote(r, pre_fn, key,
                                                            nred)
              for r in refs]
    if os.environ.get("ASKG_PROF"):
        # profiling only: an explicit split barrier so the phase split
        # is visible — NOT on the production path (reduces normally
        # start as their inputs land)
        ray.wait([s[0] for s in splits], num_returns=len(splits))
        prof("exchange:splits-done")
    outs = [_reduce_parts.remote(reduce_fn, out_schema,
                                 *[s[r] for s in splits])
            for r in range(nred)]
    res = rd.from_arrow_refs(outs).materialize()
    prof("exchange:reduced")
    return res


def exchange_merge_runs(ds, key: str, multi_fn, out_schema: pa.Schema,
                        pre_fn=None, single_fn=None, nred: int | None = None):
    """merge_runs semantics over a MATERIALIZED entity-scale Dataset.

    ``pre_fn(tbl) -> tbl`` (optional) runs inside the split tasks —
    sentinel/bucket/tag maps fold into the exchange instead of paying
    their own operator launch. Caller is responsible for the
    ``EXCHANGE_MAX`` row gate and for passing a materialized ds.
    """

    def reduce_fn(t: pa.Table) -> pa.Table:
        return merge_table_runs(t, key, multi_fn, out_schema,
                                single_fn=single_fn)

    return exchange_reduce(ds, key, reduce_fn, out_schema,
                           pre_fn=pre_fn, nred=nred)


def exchange_reduce_chunked(ds, key: str, reduce_fn, out_schema: pa.Schema,
                            pre_fn=None, chunk_rows: int = 400_000_000,
                            nred: int | None = None,
                            chunk_key: str | None = None):
    """``exchange_reduce`` for inputs too large for ONE direct exchange:
    rows hash-partition by ``crc32(key) % k`` into k chunks (every row
    of a key lands in the same chunk, so per-chunk reduction is exact)
    and each chunk runs its own direct exchange — per-chunk plasma and
    reducer memory stay bounded by ``chunk_rows`` while the kernel
    keeps its reduceat/np.unique speed.

    This replaces the sort-shuffle ``groupby`` as the above-gate path
    for the hot keyed reductions: Ray 2.49's sort-based aggregate
    pays ~44 s per million rows on high-cardinality multi-column keys
    (measured: 222 s for 5M rows / 3.7M groups, 224M rows never
    finished in 10 min), while the chunked exchange costs k extra
    scans of the pinned input — C-speed filters.

    ``ds`` must be materialized. k == 1 degenerates to one exchange.
    ``chunk_key`` (default: ``key``) is the EXISTING column chunks
    hash on — needed when ``key`` is only created by ``pre_fn`` inside
    the split tasks (e.g. a packed pk); any column such that equal
    ``key`` values imply equal ``chunk_key`` values is correct.
    """
    import zlib as _zlib

    import numpy as _np
    import ray.data as rd

    ckey = chunk_key if chunk_key is not None else key
    n = ds.count()
    k = max(1, -(-n // max(chunk_rows, 1)))
    if k == 1:
        return exchange_reduce(ds, key, reduce_fn, out_schema,
                               pre_fn=pre_fn, nred=nred)

    def chunk_of(t: pa.Table, which: int) -> pa.Table:
        if t.num_rows == 0:
            return t
        col = t[ckey]
        if pa.types.is_integer(col.type):
            v = col.to_numpy(zero_copy_only=False).astype(np.int64) \
                .view(_np.uint64)
            h = v * _np.uint64(0x9E3779B97F4A7C15)   # uint64 wrap-mix
            m = (h % _np.uint64(k)) == which
        else:
            m = _np.array([_zlib.crc32(str(x).encode()) % k == which
                           for x in col.to_pylist()])
        return t.filter(pa.array(m))

    parts = []
    for i in range(k):
        sub = ds.map_batches(lambda t, _i=i: chunk_of(t, _i),
                             batch_format="pyarrow").materialize()
        if sub.count() == 0:
            continue
        parts.append(exchange_reduce(sub, key, reduce_fn, out_schema,
                                     pre_fn=pre_fn, nred=nred))
    if not parts:
        return rd.from_arrow(out_schema.empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
