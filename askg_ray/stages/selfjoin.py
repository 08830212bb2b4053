"""Grid-salted blocked self-join — the skew-safe pair generator.

Generic machinery for every "pairs within a block" step (relationship
inference SURVEY.md §2.6, candidate verification). A bare
``groupby(block_key).map_groups(pairs)`` dies on Zipfian blocks (the
reference corpus had 69.8% of entities in one category,
/root/reference/src/scale_assessment.py:127-128). Instead:

  1. block sizes via a cheap ``groupby(block_key).count()``;
  2. blocks over ``cap`` rows are salted into s = ⌈n/cap⌉ buckets by
     ``crc32(id) % s``; each row is replicated to the s grid cells
     (min(b,j), max(b,j)) — the classic triangle/grid self-join, so
     every pair of rows meets in exactly one cell;
  3. ``groupby(cell_key).map_groups`` emits pairs: within-bucket pairs
     only in diagonal cells, cross-bucket pairs only in their one
     off-diagonal cell → no duplicate pairs across salt replicas.

The hot-block map is tiny BY CONSTRUCTION (only keys with count > cap
rows — a cluster that can pair an n-row block can hold its key) and is
broadcast via ``ray.put``. Singleton-block pruning (typically the vast
majority of LSH bands) is done through a fixed-size Bloom filter over
the pairable keys, built distributedly (per-batch bitmaps OR-folded —
the driver holds only the bitmap, never the key set). A Bloom false
positive lets a singleton row through to the cell shuffle, where its
1-row group emits no pairs — pure wasted work, never wrong output.
Replication cost is s copies per hot row — bounded by the block size
the cluster can pair anyway.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import table_of

_BLOOM_HASHES = 4
_BLOOM_BITS_PER_KEY = 12  # ~0.5% fp at k=4
# Below this many exploded rows the hot-count + bloom pass folds
# per-batch partial counters on the driver (distinct keys bounded by the
# row count) instead of paying a count shuffle + three more executions.
SMALL_EXPLODED_ROWS = 2_000_000


def _partial_counts(t: pa.Table) -> pa.Table:
    g = pa.table({"k": t["block_key"]}).group_by("k").aggregate([([], "count_all")])
    return pa.table({"k": g["k"],
                     "n": g["count_all"].cast(pa.int64())})


def _count_block(tbl: pa.Table) -> pa.Table:
    # raw block-ref task: unlike map_batches, nothing upstream skips
    # the SCHEMA-LESS empty blocks repartition/map_groups can emit
    if tbl.num_rows == 0 or "block_key" not in tbl.column_names:
        return pa.schema([("k", pa.string()),
                          ("n", pa.int64())]).empty_table()
    return _partial_counts(tbl.select(["block_key"]))


# lazy remote wrapper: defined at import, bound to Ray on first use
import ray as _ray

_count_block_task = _ray.remote(num_cpus=1)(_count_block)


def _block_counts(exploded):
    """Dataset[(k, n)] of per-block row counts. Per-batch partial
    counters shrink the shuffle to distinct-keys-per-batch before one
    groupby-sum — the distributed replacement for a driver fold."""
    from ray.data.aggregate import Sum

    return (exploded.select_columns(["block_key"])
            .map_batches(_partial_counts, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("n", alias_name="n")))


def _bloom_positions(key, m_bits: int) -> list[int]:
    s = str(key).encode()
    h1 = zlib.crc32(s)
    h2 = zlib.crc32(s, 0x9E3779B9) | 1
    return [(h1 + i * h2) % m_bits for i in range(_BLOOM_HASHES)]


def _bloom_build(counts, n_keys: int) -> tuple[bytes, int]:
    """Bloom bitmap over keys with n >= 2, OR-folded from per-batch
    bitmaps — driver memory is the fixed bitmap size regardless of the
    number of distinct keys."""
    m_bits = 1 << max(14, (n_keys * _BLOOM_BITS_PER_KEY).bit_length())

    def partial_bitmap(t: pa.Table) -> pa.Table:
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        ks = t["k"].to_pylist()
        ns = t["n"].to_pylist()
        for k, n in zip(ks, ns):
            if n >= 2:
                for p in _bloom_positions(k, m_bits):
                    bm[p >> 3] |= 1 << (p & 7)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in (counts.map_batches(partial_bitmap, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for raw in b["bm"].to_pylist():
            acc |= np.frombuffer(raw, dtype=np.uint8)
    return acc.tobytes(), m_bits


def _bloom_contains(bm: bytes, m_bits: int, key) -> bool:
    for p in _bloom_positions(key, m_bits):
        if not (bm[p >> 3] >> (p & 7)) & 1:
            return False
    return True


def _cell_tables(t: pa.Table):
    """One sorted pass over a bucket group → (key, left_tbl,
    right_tbl|None) per cell, entirely in Arrow.

    Sort on (cell_key, id, __uid) replaces the old per-cell Python
    record sort; duplicate exploded rows (a record whose band keys
    collide lands in the same block twice — keyed on (id, __uid)
    because DISTINCT records may share a candidate id before
    stages/ids.py uniquifies) are dropped with one adjacent-equality
    mask. Rows inside each cell stay id-sorted — the kernels'
    precondition."""
    has_uid = "__uid" in t.column_names
    keys = [("cell_key", "ascending"), ("id", "ascending")]
    if has_uid:
        keys.append(("__uid", "ascending"))
    t = t.take(pc.sort_indices(t, sort_keys=keys)).combine_chunks()
    n = t.num_rows

    def adj_eq(name):
        a = t[name]
        x, y = a.slice(1), a.slice(0, n - 1)
        e = pc.equal(x, y)
        # null-safe: null == null counts as equal for dedupe
        return pc.coalesce(e, pc.and_(pc.is_null(x), pc.is_null(y))) \
            .to_numpy(zero_copy_only=False)

    if n > 1:
        dup = adj_eq("cell_key") & adj_eq("id")
        if has_uid:
            dup &= adj_eq("__uid")
        if dup.any():
            t = t.filter(pa.array(np.concatenate(([True], ~dup))))
            n = t.num_rows

    ck = t["cell_key"].combine_chunks().dictionary_encode()
    ki = ck.indices.to_numpy(zero_copy_only=False)
    change = np.nonzero(ki[1:] != ki[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    buckets = t["bucket"].to_numpy(zero_copy_only=False)
    cell_names = ck.dictionary.to_pylist()
    for s, e in zip(starts.tolist(), ends.tolist()):
        if e - s < 2:
            continue
        cell = cell_names[ki[s]]
        key, ci, cj = cell.rsplit("|", 2)
        sub = t.slice(s, e - s)
        if ci == cj:
            yield key, sub, None
        else:
            bseg = buckets[s:e]
            left = sub.filter(pa.array(bseg == int(ci)))
            right = sub.filter(pa.array(bseg == int(cj)))
            if left.num_rows and right.num_rows:
                yield key, left, right


# ---- thin-row payload resolution ------------------------------------------
# When the exploded rows are THIN (join keys only — see
# dedup_near._explode_bands(thin=True)), the verify pair_fn still needs
# full records. The payload travels as the ALREADY-MATERIALIZED block
# refs of the entity table: no driver copy, no per-task reshipping —
# reduce workers read the blocks zero-copy from plasma and build ONE
# (id, __uid) → row index per process (cached below). Only sanctioned
# under a documented row threshold (dedup_near._PAYLOAD_MAX); above it
# the fat path ships payloads through the shuffle as before.
_PAYLOAD_CACHE: dict = {}


def _payload_index(refs: tuple, project=None):
    """``project(tbl) -> tbl`` (optional) is applied per block BEFORE
    the index is built, so the per-worker heap holds only the columns
    the verifier reads (the ~200 B/row budget behind callers'
    payload-row thresholds assumes the slim projection, not the fat
    source table)."""
    key = tuple(r.hex() for r in refs)
    ent = _PAYLOAD_CACHE.get(key)
    if ent is None:
        import ray
        tbls = [t for t in ray.get(list(refs)) if t.num_rows]
        if project is not None:
            tbls = [project(t) for t in tbls]
        # combine_chunks: the index is taken from hundreds of times per
        # task with scattered indices, and take over a many-chunk table
        # pays a per-chunk binary search per index — measured ~13 ms per
        # per-cell take on the chunked concat vs <1 ms contiguous
        tbl = pa.concat_tables(tbls,
                               promote_options="default").combine_chunks()
        # the record-uid column is __uid in projected payloads and
        # source_url when the caller hands over its raw entity blocks
        uid_col = "__uid" if "__uid" in tbl.column_names else "source_url"
        idx = {a + "\x00" + (b or ""): i for i, (a, b) in
               enumerate(zip(tbl["id"].to_pylist(),
                             tbl[uid_col].to_pylist()))}
        _PAYLOAD_CACHE.clear()  # one payload per worker at a time
        _PAYLOAD_CACHE[key] = (tbl, idx)
        ent = (tbl, idx)
    return ent


def _pairs_from_cell(key, left, right, pair_fn, gate_fn,
                     out_schema, payload_refs=None,
                     payload_project=None) -> pa.Table | None:
    """pair_fn/gate mode: Python records are built ONLY for rows the
    vectorized gate lets through (the full to_pylist per cell was
    the #2 cost of the join)."""
    if gate_fn is not None:
        pairs = gate_fn(left, right, key)
        if len(pairs) == 0:
            return None
        xs = np.asarray([p[0] for p in pairs] if isinstance(pairs, list)
                        else pairs[:, 0], dtype=np.int64)
        ys = np.asarray([p[1] for p in pairs] if isinstance(pairs, list)
                        else pairs[:, 1], dtype=np.int64)
        lu = np.unique(xs)
        if payload_refs is not None:
            ptbl, pidx = _payload_index(payload_refs, payload_project)

            def _recs(src: pa.Table, pos: np.ndarray) -> dict:
                sub = src.take(pa.array(pos))
                rows = [pidx[a + "\x00" + (b or "")] for a, b in
                        zip(sub["id"].to_pylist(),
                            sub["__uid"].to_pylist())]
                return dict(zip(pos.tolist(),
                                ptbl.take(pa.array(rows, pa.int64()))
                                .to_pylist()))

            lrecs = _recs(left, lu)
            if right is None:
                rrecs = lrecs
                ru = np.setdiff1d(np.unique(ys), lu)
                if len(ru):
                    rrecs = dict(lrecs)
                    rrecs.update(_recs(left, ru))
            else:
                rrecs = _recs(right, np.unique(ys))
        else:
            lrecs = dict(zip(lu.tolist(),
                             left.take(pa.array(lu)).to_pylist()))
            if right is None:
                rrecs = lrecs
                ru = np.setdiff1d(np.unique(ys), lu)
                if len(ru):
                    rrecs = dict(lrecs)
                    rrecs.update(zip(ru.tolist(),
                                     left.take(pa.array(ru)).to_pylist()))
            else:
                ru = np.unique(ys)
                rrecs = dict(zip(ru.tolist(),
                                 right.take(pa.array(ru)).to_pylist()))
        edges: list[dict] = []
        for x, y in zip(xs.tolist(), ys.tolist()):
            r1, r2 = lrecs[x], rrecs[y]
            a, b = (r1, r2) if r1["id"] < r2["id"] else (r2, r1)
            edges.extend(pair_fn(a, b))
        return table_of(edges, out_schema)
    lrec = left.to_pylist()
    edges = []
    if right is None:
        for x in range(len(lrec)):
            for y in range(x + 1, len(lrec)):
                edges.extend(pair_fn(lrec[x], lrec[y]))
    else:
        rrec = right.to_pylist()
        for r1 in lrec:
            for r2 in rrec:
                a, b = (r1, r2) if r1["id"] < r2["id"] else (r2, r1)
                edges.extend(pair_fn(a, b))
    return table_of(edges, out_schema)


def _cols_of(tbl: pa.Table | None) -> dict | None:
    if tbl is None:
        return None
    return {c: tbl[c].to_pylist() for c in tbl.column_names}


def bucket_cells_impl(t: pa.Table, cell_fn, pair_fn, gate_fn,
                      out_schema, payload_refs=None,
                      payload_project=None) -> pa.Table:
    """Reduce kernel for one __cb bucket group of cells."""
    if t.num_rows == 0:
        return out_schema.empty_table()
    prof_cells = os.environ.get("ASKG_PROF")
    parts = []
    for key, left, right in _cell_tables(t):
        if prof_cells:
            import time
            c0 = time.time()
        if cell_fn is not None:
            out = cell_fn(_cols_of(left), _cols_of(right), key)
        else:
            out = _pairs_from_cell(key, left, right, pair_fn, gate_fn,
                                   out_schema, payload_refs=payload_refs,
                                   payload_project=payload_project)
        if prof_cells and time.time() - c0 > 0.5:
            import sys
            print(f"[cell] dur={time.time() - c0:7.3f} key={key} "
                  f"nl={left.num_rows} "
                  f"nr={right.num_rows if right is not None else -1} "
                  f"out={out.num_rows if out is not None else 0}",
                  file=sys.stderr, flush=True)
        if out is not None and out.num_rows:
            parts.append(out)
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)


def blocked_self_join(exploded, pair_fn, out_schema: pa.Schema, cap: int = 400,
                      cell_fn=None, gate_fn=None, salt_col: str = "id",
                      payload_refs=None, payload_project=None):
    """exploded: Dataset with 'block_key' + 'id' + carry columns.

    Two pair-generation modes:
      * pair_fn(rec1, rec2) -> list[dict] — generic per-pair dicts
        (rec1.id < rec2.id), used for candidate verification;
      * cell_fn(left_cols, right_cols_or_None, block_key) -> pa.Table —
        vectorized whole-cell kernel (numpy over column arrays), used by
        the hot edge-inference families. left/right are dicts of column
        lists sorted by id; right is None for diagonal cells.

    ``gate_fn(left_tbl, right_tbl_or_None, block_key_str) ->
    iterable[(x, y)]`` (pair_fn mode only): a vectorized per-cell
    prefilter over the id-sorted Arrow cell tables that names the
    candidate index pairs to hand to pair_fn — (x, y) into left×left
    with x < y for diagonal cells, left×right otherwise. Without it
    every O(n²) cell pair pays a Python pair_fn call; a numpy gate
    (e.g. the LSH pair-ownership rule + cheap similarity bounds in
    stages/dedup_near._pair_gate) turns the quadratic part into C-speed
    boolean masks, and Python records are built only for survivors.
    Returns a Dataset with out_schema rows.

    ``salt_col``: the column whose crc32 assigns rows of a HOT block to
    grid buckets. Pair-exactly-once holds for any choice; the right
    choice is the key the verify kernel dedupes on. Near-dup blocks
    salt by ``norm_name``: a duplicate-heavy name pair has up to
    |cluster|² record pairs, and id-salting scattered them over as many
    grid cells — the per-name-pair ratio work (the dominant verify
    cost) re-ran once per cell per worker process. Name-salting
    co-locates every record pair of a name pair in ONE cell, so the
    unique-name machinery in the gate collapses them all at once.
    """
    import ray

    from ..rayutil import compact, default_nblocks

    # exploded is consumed twice (count pass + cells) — pin it, and
    # guarantee the pair-verify groupby at least CPU-count reduce tasks:
    # the verify kernels are the CPU-heavy stages of the pipeline, and a
    # narrow (few-block, shuffle-optimized) upstream would otherwise
    # serialize them. Only ever repartition UP — large exploded sets
    # keep their natural block count. Callers with entity-scale inputs
    # append a lazy ``repartition(default_nblocks())`` to the exploded
    # set themselves so the split folds into this first materialization
    # and the second barrier below never fires.
    from ..rayutil import prof

    nb = default_nblocks()
    exploded = exploded.materialize()
    prof("selfjoin:exploded:pinned")
    if exploded.num_blocks() < nb:
        exploded = exploded.repartition(nb).materialize()
        prof("selfjoin:exploded:repartitioned")

    n_rows = exploded.count()
    if n_rows == 0:
        import ray.data as rd
        return rd.from_arrow(out_schema.empty_table())

    if n_rows < SMALL_EXPLODED_ROWS:
        # Small-side shortcut (same sanction as components' driver
        # union-find): fold the per-batch partial counters on the driver
        # — distinct keys ≤ n_rows < threshold bounds the transient dict
        # — and build hot map + bloom in one pass instead of a count
        # shuffle plus three more executions. The distributed path below
        # runs beyond the threshold and is forced in tests.
        # Partial counts run as direct block tasks over the already-
        # materialized blocks: a Ray Data map + iter_batches here paid
        # two extra operator launches (~3-6 s of pure floor at 32 cpus);
        # the fold itself is ONE Arrow groupby on the driver (C speed).
        partials = ray.get([_count_block_task.remote(ref)
                            for ref in exploded.get_internal_block_refs()])
        partials = [p for p in partials if p.num_rows]
        folded = (pa.concat_tables(partials).group_by("k")
                  .aggregate([("n", "sum")])) if partials else None
        if folded is None or folded.num_rows == 0:
            ks, ns = [], np.array([], dtype=np.int64)
        else:
            ks = folded["k"].to_pylist()
            ns = folded["n_sum"].to_numpy(zero_copy_only=False)
        hotm = ns > cap
        hot = {k: -(-int(n) // cap)
               for k, n in zip(np.asarray(ks, dtype=object)[hotm].tolist(),
                               ns[hotm].tolist())} if hotm.any() else {}
        pair_ns = ns[ns >= 2].astype(np.float64)
        est_pairs = int((pair_ns * (pair_ns - 1)).sum() // 2)
        m_bits = 1 << max(14, (len(ks) * _BLOOM_BITS_PER_KEY).bit_length())
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        for k, n in zip(ks, ns.tolist()):
            if n >= 2:
                for p in _bloom_positions(k, m_bits):
                    bm[p >> 3] |= 1 << (p & 7)
        bloom = bm.tobytes()
    else:
        # counts consumed three times (count + hot filter + bloom) — pin
        counts = compact(_block_counts(exploded))
        n_keys = counts.count()
        # hot keys (n > cap) are few by construction — safe to collect
        hot = {}
        est_pairs = 0
        for b in (counts.map_batches(
                lambda t: pa.table({
                    "k": t["k"], "n": t["n"],
                    "hot": pc.greater(t["n"], cap),
                    "p": pc.multiply(
                        pc.cast(t["n"], pa.float64()),
                        pc.cast(pc.subtract(t["n"], 1), pa.float64())),
                }),
                batch_format="pyarrow").iter_batches(batch_format="pyarrow")):
            est_pairs += int(pc.sum(b["p"]).as_py() or 0) // 2
            hb = b.filter(b["hot"])
            hot.update(zip(hb["k"].to_pylist(), hb["n"].to_pylist()))
        hot = {k: -(-n // cap) for k, n in hot.items()}
        bloom, m_bits = _bloom_build(counts, n_keys)
    prof("selfjoin:counts+bloom")
    hot_ref = ray.put((hot, bloom))

    def to_cells(batch: pa.Table) -> pa.Table:
        """Replicate each row to its grid cells — fully vectorized: the
        bloom probe, salt lookup and crc run once per DISTINCT block
        key / salt value, and the hot-row grid expansion is a numpy
        repeat + arange (the per-replica Python f-string loop was the
        critical-path straggler: the one input block holding the
        hottest author's rows paid ~8 µs × 350k replicas)."""
        smap, bm = ray.get(hot_ref)
        if batch.num_rows == 0:
            return batch.append_column(
                "cell_key", pa.array([], pa.string())).append_column(
                "bucket", pa.array([], pa.int32()))
        enc = batch["block_key"].combine_chunks().dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        uniq_str = pa.array([str(k) for k in uniq], pa.string())
        salts = np.array(
            [(smap.get(k, 1) if _bloom_contains(bm, m_bits, k) else 0)
             for k in uniq], dtype=np.int32)
        row_s = salts[enc.indices.to_numpy(zero_copy_only=False)]

        parts = []
        cold = row_s == 1
        if cold.any():
            t1 = batch.filter(pa.array(cold))
            keys1 = pc.binary_join_element_wise(uniq_str, "0", "0", "|")
            idx1 = enc.indices.to_numpy(zero_copy_only=False)[cold]
            t1 = t1.append_column("cell_key", pc.take(keys1, pa.array(idx1)))
            t1 = t1.append_column(
                "bucket", pa.array(np.zeros(len(idx1), dtype=np.int32)))
            parts.append(t1)

        hot_rows = row_s > 1
        if hot_rows.any():
            th = batch.filter(pa.array(hot_rows))
            s64 = row_s[hot_rows].astype(np.int64)
            kidx = enc.indices.to_numpy(zero_copy_only=False)[hot_rows]
            senc = th[salt_col].combine_chunks().dictionary_encode()
            crc_u = np.array(
                [zlib.crc32(str(v).encode())
                 for v in senc.dictionary.to_pylist()], dtype=np.int64)
            b_arr = crc_u[senc.indices.to_numpy(zero_copy_only=False)] % s64
            # row r lands in cells (min(b,j), max(b,j)) for j in 0..s-1
            total = int(s64.sum())
            take_idx = np.repeat(np.arange(len(s64), dtype=np.int64), s64)
            ends = np.cumsum(s64)
            j = np.arange(total, dtype=np.int64) - (ends - s64)[take_idx]
            b_rep = b_arr[take_idx]
            lo = np.minimum(b_rep, j)
            hi = np.maximum(b_rep, j)
            th = th.take(pa.array(take_idx))
            cks = pc.binary_join_element_wise(
                pc.take(uniq_str, pa.array(kidx[take_idx])),
                pc.cast(pa.array(lo), pa.string()),
                pc.cast(pa.array(hi), pa.string()), "|")
            th = th.append_column("cell_key", cks)
            th = th.append_column(
                "bucket", pa.array(b_rep.astype(np.int32)))
            parts.append(th)

        if not parts:
            empty = batch.slice(0, 0)
            return empty.append_column(
                "cell_key", pa.array([], pa.string())).append_column(
                "bucket", pa.array([], pa.int32()))
        return pa.concat_tables(parts).combine_chunks()

    def bucket_cells(t: pa.Table) -> pa.Table:
        return bucket_cells_impl(t, cell_fn, pair_fn, gate_fn, out_schema,
                                 payload_refs=payload_refs,
                                 payload_project=payload_project)

    # -- entity-scale direct cell exchange ---------------------------------
    # Below the small-input gate the cell shuffle runs as M split tasks
    # (to_cells folded in, hash-split on cell_key) feeding R direct
    # reduce tasks (stages/exchange.exchange_reduce) — every cell's rows
    # meet in exactly one reducer and bucket_cells_impl splits the cell
    # runs with one vectorized sort. This removes the sort-shuffle's
    # sample + sort + reduce operator floor AND its two materialization
    # barriers (the est_pairs>2M repartition + the Sort), and — unlike
    # sort partitions, where >4×CPU turned the exchange into a
    # small-object fetch storm (53.5 s at fan=4 vs 337 s at fan=8 on the
    # same input) — direct task args make many-reducer exchanges cheap,
    # so the CPU-heavy verify spreads evenly regardless of which input
    # block held the hot rows (measured: the per-block to_cells
    # replication skew serialized the old path's critical path).
    # R sizing: per-cell verify/emit cost is quadratic in cell size, so
    # hash-assigned reducers see heavy-tailed loads; finer tasks smooth
    # stragglers until per-task overhead (M×R slice objects, arg
    # fetches) bites. The knee MOVED when the verify/emit kernels went
    # native (~4× cheaper tasks): post-kernel min-of-2 at the
    # repl=32/mult=1 corpus, 32 cpus — mult 8 = 25.3 s, 4 = 21.5 s,
    # 2 = 20.5 s, 1 = 21.8 s; at 8 cpus mult 8 vs 2 are within noise
    # (40.0 vs 41.4 s). Default 2; the env knob remains for kernels
    # whose per-cell cost is heavy enough to re-buy straggler
    # smoothing.
    if n_rows < SMALL_EXPLODED_ROWS:
        from .exchange import exchange_reduce

        nred_mult = int(os.environ.get("ASKG_SJ_NRED_MULT", "2"))
        nred = max(2, min(nred_mult * nb, max(8, est_pairs // 2000)))
        return exchange_reduce(exploded, "cell_key", bucket_cells,
                               out_schema, pre_fn=to_cells, nred=nred)

    # -- streaming path: coarse cell buckets + sort-shuffle groupby --------
    # Group cells through coarse hash buckets instead of one map_groups
    # call per cell: the per-group wrapper (~1 ms of slicing + dispatch)
    # dominates wall time when there are tens of thousands of small
    # cells. One bucket group holds many cells; runs are split with one
    # vectorized sort + adjacent-compare, and singleton runs (no pairs
    # possible) are skipped without touching Python records.
    n_cell_buckets = 32 * default_nblocks()

    def add_cell_bucket(t: pa.Table) -> pa.Table:
        enc = t["cell_key"].combine_chunks().dictionary_encode()
        per_uniq = pa.array(
            np.array([zlib.crc32(k.encode()) for k in
                      enc.dictionary.to_pylist()], dtype=np.int64)
            % n_cell_buckets, pa.int32())
        return t.append_column("__cb", pc.take(per_uniq, enc.indices))

    # map_groups parallelism equals the grouped dataset's BLOCK count,
    # not the bucket count: a straggler block holding a few hot cells
    # can serialize the reduce. Pair-heavy joins (est_pairs from the
    # block counts) spread over 4× CPU-blocks; small joins skip the
    # extra repartition barrier. DO NOT raise the fan-out: the sort
    # shuffle pays O(M×N) partition fetches — see the measured numbers
    # above.
    celled = exploded.map_batches(to_cells, batch_format="pyarrow")
    if est_pairs > 2_000_000:
        fan = int(os.environ.get("ASKG_SJ_FAN", "4"))
        celled = celled.repartition(fan * nb)
    return (celled.map_batches(add_cell_bucket, batch_format="pyarrow")
            .groupby("__cb")
            .map_groups(bucket_cells, batch_format="pyarrow"))
