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
    import collections

    c = collections.Counter(t["block_key"].to_pylist())
    if not c:
        return pa.table({"k": pa.array([], t.schema.field("block_key").type),
                         "n": pa.array([], pa.int64())})
    ks, vs = zip(*c.items())
    return pa.table({"k": pa.array(list(ks)),
                     "n": pa.array(list(vs), pa.int64())})


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


def blocked_self_join(exploded, pair_fn, out_schema: pa.Schema, cap: int = 400,
                      cell_fn=None, gate_fn=None):
    """exploded: Dataset with 'block_key' + 'id' + carry columns.

    Two pair-generation modes:
      * pair_fn(rec1, rec2) -> list[dict] — generic per-pair dicts
        (rec1.id < rec2.id), used for candidate verification;
      * cell_fn(left_cols, right_cols_or_None, block_key) -> pa.Table —
        vectorized whole-cell kernel (numpy over column arrays), used by
        the hot edge-inference families. left/right are dicts of column
        lists sorted by id; right is None for diagonal cells.

    ``gate_fn(left_recs, right_recs_or_None, block_key_str) ->
    iterable[(x, y)]`` (pair_fn mode only): a vectorized per-cell
    prefilter that names the candidate index pairs to hand to pair_fn —
    (x, y) into left×left with x < y for diagonal cells, left×right
    otherwise. Without it every O(n²) cell pair pays a Python pair_fn
    call; a numpy gate (e.g. the LSH pair-ownership rule + cheap
    similarity bounds in stages/dedup_near._pair_gate) turns the
    quadratic part into C-speed boolean masks and leaves Python only
    the survivors.
    Returns a Dataset with out_schema rows.
    """
    import ray

    from ..rayutil import compact, default_nblocks

    # exploded is consumed twice (count pass + cells) — pin it, and
    # guarantee the pair-verify groupby at least CPU-count reduce tasks:
    # the verify kernels are the CPU-heavy stages of the pipeline, and a
    # narrow (few-block, shuffle-optimized) upstream would otherwise
    # serialize them. Only ever repartition UP — large exploded sets
    # keep their natural block count.
    exploded = exploded.materialize()
    nb = default_nblocks()
    if exploded.num_blocks() < nb:
        exploded = exploded.repartition(nb).materialize()

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
        import collections

        c: collections.Counter = collections.Counter()
        for b in (exploded.select_columns(["block_key"])
                  .map_batches(_partial_counts, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
            # iterated batches can concatenate several partial outputs,
            # so the same key may repeat within one batch — fold row-wise
            for k, n in zip(b["k"].to_pylist(), b["n"].to_pylist()):
                c[k] += n
        hot = {k: -(-n // cap) for k, n in c.items() if n > cap}
        m_bits = 1 << max(14, (len(c) * _BLOOM_BITS_PER_KEY).bit_length())
        bm = np.zeros(m_bits // 8, dtype=np.uint8)
        for k, n in c.items():
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
        for b in (counts.map_batches(
                lambda t: t.filter(pc.greater(t["n"], cap)),
                batch_format="pyarrow").iter_batches(batch_format="pyarrow")):
            hot.update(zip(b["k"].to_pylist(), b["n"].to_pylist()))
        hot = {k: -(-n // cap) for k, n in hot.items()}
        bloom, m_bits = _bloom_build(counts, n_keys)
    hot_ref = ray.put((hot, bloom))

    def to_cells(batch: pa.Table) -> pa.Table:
        smap, bm = ray.get(hot_ref)
        cols = batch.column_names
        data = {c: batch[c].to_pylist() for c in cols}
        out = {c: [] for c in cols}
        out["cell_key"] = []
        out["bucket"] = []
        for i in range(batch.num_rows):
            key = data["block_key"][i]
            if not _bloom_contains(bm, m_bits, key):
                continue
            s = smap.get(key, 1)
            b = zlib.crc32(str(data["id"][i]).encode()) % s
            cells = {(min(b, j), max(b, j)) for j in range(s)}
            for ci, cj in cells:
                for c in cols:
                    out[c].append(data[c][i])
                out["cell_key"].append(f"{key}|{ci}|{cj}")
                out["bucket"].append(b)
        arrays = {c: pa.array(out[c], batch.schema.field(c).type) for c in cols}
        arrays["cell_key"] = pa.array(out["cell_key"], pa.string())
        arrays["bucket"] = pa.array(out["bucket"], pa.int32())
        return pa.table(arrays)

    celled = exploded.map_batches(to_cells, batch_format="pyarrow")

    def _split_cell(batch: pa.Table):
        cell = batch["cell_key"][0].as_py()
        ci, cj = (int(x) for x in cell.rsplit("|", 2)[-2:])
        key = cell.rsplit("|", 2)[0]
        recs = batch.to_pylist()
        # dedupe identical exploded rows within the cell (a record whose
        # band keys collide lands in the same block twice). Keyed on
        # (id, __uid): the optional __uid column disambiguates DISTINCT
        # records that share a candidate id (ids are only made unique
        # later, stages/ids.py) — keying on id alone silently dropped
        # one of them per cell.
        by_id = {}
        for r in recs:
            by_id.setdefault((r["id"], r.get("__uid")), r)
        recs = sorted(by_id.values(), key=lambda r: (r["id"], str(r.get("__uid"))))
        if ci == cj:
            return key, [r for r in recs if r["bucket"] == ci], None
        return (key,
                [r for r in recs if r["bucket"] == ci],
                [r for r in recs if r["bucket"] == cj])

    def cell_pairs(batch: pa.Table) -> pa.Table:
        key, left, right = _split_cell(batch)
        edges: list[dict] = []
        if gate_fn is not None:
            rhs = left if right is None else right
            for x, y in gate_fn(left, right, key):
                r1, r2 = left[x], rhs[y]
                a, b = (r1, r2) if r1["id"] < r2["id"] else (r2, r1)
                edges.extend(pair_fn(a, b))
        elif right is None:
            for x in range(len(left)):
                for y in range(x + 1, len(left)):
                    edges.extend(pair_fn(left[x], left[y]))
        else:
            for r1 in left:
                for r2 in right:
                    a, b = (r1, r2) if r1["id"] < r2["id"] else (r2, r1)
                    edges.extend(pair_fn(a, b))
        return table_of(edges, out_schema)

    def _cols(recs: list[dict]) -> dict:
        if not recs:
            return {}
        return {k: [r.get(k) for r in recs] for k in recs[0]}

    def cell_pairs_vec(batch: pa.Table) -> pa.Table:
        key, left, right = _split_cell(batch)
        out = cell_fn(_cols(left), _cols(right) if right is not None else None, key)
        return out if out is not None else out_schema.empty_table()

    fn = cell_pairs_vec if cell_fn is not None else cell_pairs

    # Group cells through coarse hash buckets instead of one map_groups
    # call per cell: the per-group wrapper (~1 ms of slicing + dispatch)
    # dominates wall time when there are tens of thousands of small
    # cells. One bucket group holds many cells; runs are split with one
    # vectorized sort + adjacent-compare, and singleton runs (no pairs
    # possible) are skipped without touching Python records.
    n_cell_buckets = 32 * default_nblocks()

    def add_cell_bucket(t: pa.Table) -> pa.Table:
        bs = [zlib.crc32(k.encode()) % n_cell_buckets
              for k in t["cell_key"].to_pylist()]
        return t.append_column("__cb", pa.array(bs, pa.int32()))

    def bucket_cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        t = t.take(pc.sort_indices(t, sort_keys=[("cell_key", "ascending")]))
        ks = np.asarray(t["cell_key"].to_pylist(), dtype=object)
        change = np.nonzero(ks[1:] != ks[:-1])[0] + 1
        starts = np.concatenate(([0], change)).tolist()
        ends = np.concatenate((change, [len(ks)])).tolist()
        parts = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            out = fn(t.slice(s, e - s))
            if out is not None and out.num_rows:
                parts.append(out)
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    # map_groups parallelism equals the grouped dataset's BLOCK count,
    # not the bucket count: with a 32-block input the UDF-heavy cell
    # kernels ran as 32 reduce tasks and one straggler block holding a
    # few hot cells serialized the stage (measured 24 s of a 30 s edge
    # inference). The celled table is slim (ids + masks + block keys),
    # so repartitioning UP to 4× CPU-blocks is cheap and spreads the
    # ~n² cells across 4× more reduce tasks.
    celled = celled.repartition(4 * nb)
    return (celled.map_batches(add_cell_bucket, batch_format="pyarrow")
            .groupby("__cb")
            .map_groups(bucket_cells, batch_format="pyarrow"))
