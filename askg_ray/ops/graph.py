"""Iterative graph algorithms over Dataset joins (SURVEY.md §2 "beyond
the reference": the iterative-dataflow category — connected components
already lives in stages/components.py; this adds rank propagation).

The graph is derived deterministically from the TPC-H-ish tables: an
undirected customer—supplier edge exists where some order of the
customer contains a lineitem of the supplier. Both endpoints scale
with SF, so every per-iteration step is a hash shuffle, never a
broadcast: edges carry their endpoint's degree so one join + one
groupby-sum per iteration is the whole loop body.

At 100 TB: the edge table is built once (fact-fact join, distinct
pairs) and materialized; each PageRank iteration moves only
(node, rank) pairs plus one edges ⋈ ranks join — the standard
synchronous-iteration dataflow. Iterations are a fixed count (power
iteration converges geometrically; callers needing a tolerance stop
can compare successive rank tables with one extra join).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


from .joins import _npartitions  # shared size-aware partition sizing


def customer_supplier_edges(sf_dir: str, num_partitions: int | None = None,
                            exchange_max_rows: int | None = None):
    """DISTINCT (customer, supplier) pairs through orders ⋈ lineitem —
    both directions, so the bipartite graph is undirected (no PageRank
    sinks). Nodes are disambiguated by sign: customer k maps to k (≥0),
    supplier k to −(k+1) (<0) — the +1 keeps key 0 unambiguous."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..rayutil import parquet_num_rows

    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("orders", "lineitem")) == 0:
        return rd.from_arrow(pa.schema(
            [("u", pa.int64()), ("v", pa.int64())]).empty_table())

    npart = _npartitions(num_partitions, f"{sf_dir}/orders.parquet",
                         f"{sf_dir}/lineitem.parquet")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey"])
    j = li.join(orders, join_type="inner", num_partitions=npart,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def pairs(t: pa.Table) -> pa.Table:
        # local distinct + both directions; suppliers negated
        cust = t["o_custkey"].cast(pa.int64())
        supp = pc.negate(pc.add(t["l_suppkey"].cast(pa.int64()), 1))
        fwd = pa.table({"u": cust, "v": supp})
        rev = pa.table({"u": supp, "v": cust})
        return (pa.concat_tables([fwd, rev])
                .group_by(["u", "v"]).aggregate([]))

    p = j.map_batches(pairs, batch_format="pyarrow").materialize()
    n = p.count()
    gate = (COORDER_EXCHANGE_MAX if exchange_max_rows is None
            else exchange_max_rows)
    if 0 < n <= gate:
        import ray
        from ray.data.aggregate import Max, Min

        from ..stages.exchange import exchange_reduce

        # signed ids pack with asymmetric biases: the HIGH half must
        # stay under 2³¹ after biasing, so u rides +2³⁰ (|u| < 2³⁰ —
        # holds to TPC-H SF ~7000) and v rides +2³¹
        b = p.aggregate(Min("u", alias_name="ulo"),
                        Max("u", alias_name="uhi"),
                        Min("v", alias_name="vlo"),
                        Max("v", alias_name="vhi"))
        if (b["ulo"] >= -(1 << 30) and b["uhi"] < (1 << 30)
                and b["vlo"] >= -(1 << 31) and b["vhi"] < (1 << 31)):
            def pack(t: pa.Table) -> pa.Table:
                u = t["u"].to_numpy(zero_copy_only=False)
                v = t["v"].to_numpy(zero_copy_only=False)
                return pa.table({"pk": pa.array(
                    ((u + (1 << 30)) << 32) | (v + (1 << 31)),
                    pa.int64())})

            def distinct_kernel(t: pa.Table) -> pa.Table:
                pk = np.unique(t["pk"].to_numpy(zero_copy_only=False))
                return pa.table({
                    "u": pa.array((pk >> 32) - (1 << 30), pa.int64()),
                    "v": pa.array((pk & 0xFFFFFFFF) - (1 << 31),
                                  pa.int64())}, schema=PAIR_SCHEMA)

            return exchange_reduce(p, "pk", distinct_kernel,
                                   PAIR_SCHEMA, pre_fn=pack)
    return (p.groupby(["u", "v"]).aggregate(Count(alias_name="__c"))
            .select_columns(["u", "v"]))


def customer_supplier_degree(sf_dir: str, num_partitions: int | None = None):
    """Join-then-distinct-count: suppliers per customer through
    orders ⋈ lineitem (SQL-checkable companion of the graph build)."""
    from ray.data.aggregate import Count

    edges = customer_supplier_edges(sf_dir, num_partitions)
    cust = edges.map_batches(
        lambda t: t.filter(pc.greater_equal(t["u"], 0)).select(["u"]),
        batch_format="pyarrow")
    out = cust.groupby("u").aggregate(Count(alias_name="n_suppliers"))
    return out.map_batches(
        lambda t: pa.table({"c_custkey": t["u"],
                            "n_suppliers": t["n_suppliers"]}),
        batch_format="pyarrow")


DEGREE_ORACLE_SQL = """
SELECT o.o_custkey AS c_custkey,
       count(DISTINCT l.l_suppkey) AS n_suppliers
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_custkey
""".strip()


PAIR_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
COORDER_EXCHANGE_MAX = 500_000_000   # direct-task exchange row gate (r4 sizing)


def _coorder_pair_kernel(t: pa.Table) -> pa.Table:
    """Vectorized MULTI-GROUP pair explode: works on any table holding
    complete orderkey groups (a direct-exchange reduce slice or a
    single group). One lexsort + consecutive dedupe, then the pair
    triangles of ALL orders come out of ≤6 size-class passes (orders
    hold ≤7 lineitems) of pure index arithmetic — no Python call per
    order (the per-group map_groups draft paid one per order; support
    top-k at sf0.1: 17.4 s → ~11 s min-of-2, the residual being the
    (u, v) pair groupby itself)."""
    ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pk, ok))
    ok, pk = ok[order], pk[order]
    keep = np.r_[True, (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
    ok, pk = ok[keep], pk[keep]
    starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
    sizes = np.diff(np.r_[starts, len(ok)])
    us, vs = [], []
    for m in np.unique(sizes):
        if m < 2:
            continue
        s = starts[sizes == m]
        iu, iv = np.triu_indices(int(m), k=1)
        us.append(pk[(s[:, None] + iu[None, :]).ravel()])
        vs.append(pk[(s[:, None] + iv[None, :]).ravel()])
    if not us:
        return PAIR_SCHEMA.empty_table()
    return pa.table({"u": pa.array(np.concatenate(us)),
                     "v": pa.array(np.concatenate(vs))},
                    schema=PAIR_SCHEMA)


def _coorder_pairs(sf_dir: str,
                   exchange_max_rows: int = COORDER_EXCHANGE_MAX):
    """Per-order co-occurrence pair rows (u < v, deduped within the
    order, repeated across orders) — the shared first stage of the
    co-order graph family. Direct-task keyed exchange with the
    vectorized multi-group kernel under the row gate; identical kernel
    per group under ``groupby().map_groups`` above it."""
    import ray.data as rd

    from ..rayutil import parquet_num_rows
    from ..stages.exchange import exchange_reduce

    if parquet_num_rows(f"{sf_dir}/lineitem.parquet") == 0:
        return rd.from_arrow(PAIR_SCHEMA.empty_table())

    li = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_partkey"])
          .materialize())
    if li.count() <= exchange_max_rows:
        return exchange_reduce(li, "l_orderkey", _coorder_pair_kernel,
                               PAIR_SCHEMA)
    return (li.groupby("l_orderkey")
            .map_groups(_coorder_pair_kernel, batch_format="pyarrow"))



_SUPPORT_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                             ("n", pa.int64())])


def _support_count_kernel(t: pa.Table) -> pa.Table:
    """Vectorized multi-group pair-count over complete packed-key
    groups: one sort + run-boundary reduceat, no per-pair Python."""
    pk = t["pk"].to_numpy(zero_copy_only=False)
    pk = np.sort(pk)
    starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
    n = np.diff(np.r_[starts, len(pk)])
    heads = pk[starts]
    return pa.table({"u": pa.array(heads >> 32, pa.int64()),
                     "v": pa.array(heads & 0xFFFFFFFF, pa.int64()),
                     "n": pa.array(n, pa.int64())},
                    schema=_SUPPORT_SCHEMA)


def _coorder_support(sf_dir: str,
                     exchange_max_rows: int = COORDER_EXCHANGE_MAX):
    """(u, v, n) co-order support counts — the shared second stage of
    the co-order graph family (distinct edges, top-k, SSSP weights all
    derive from it). Under the row gate: pack (u, v) into ONE int64
    (partkeys < 2³² — probed per block like the cosine-pairs exchange)
    and run the direct-task keyed exchange with a run-boundary count
    kernel, skipping Ray's sort-shuffle aggregate (support at sf0.1:
    5.2 s → ~3 s incl. the explode). Above the gate, or with ids too
    wide to pack, the unconditionally-scalable two-key groupby."""
    from ray.data.aggregate import Count

    from ..stages.exchange import exchange_reduce, exchange_reduce_chunked

    pairs = _coorder_pairs(sf_dir,
                           exchange_max_rows=exchange_max_rows)
    pairs = pairs.materialize()
    cnt = pairs.count()
    # exchange_max_rows == 0 forces the groupby fallback (tests)
    if cnt > 0 and exchange_max_rows > 0:
        import ray

        # the high half must stay below 2³¹ — an id in [2³¹, 2³²)
        # makes ``u << 32`` wrap int64 negative and the kernel's
        # ``pk >> 32`` sign-extends it back as u − 2³² (ADVICE r3)
        wide = any(
            ray.get(ray.remote(num_cpus=0)(
                lambda t: bool(t.num_rows) and (
                    int(pc.max(t["u"]).as_py()) >= (1 << 31)
                    or int(pc.max(t["v"]).as_py()) >= (1 << 32)
                    or int(pc.min(t["u"]).as_py()) < 0
                    or int(pc.min(t["v"]).as_py()) < 0)
            ).remote(ref))
            for ref in pairs.get_internal_block_refs())
        if not wide:
            def pack(t: pa.Table) -> pa.Table:
                u = t["u"].to_numpy(zero_copy_only=False)
                v = t["v"].to_numpy(zero_copy_only=False)
                return pa.table({"pk": pa.array((u << 32) | v, pa.int64())})

            if cnt <= exchange_max_rows:
                return exchange_reduce(pairs, "pk", _support_count_kernel,
                                       _SUPPORT_SCHEMA, pre_fn=pack)
            # above the gate: chunk by u-hash, same reduceat kernel
            return exchange_reduce_chunked(
                pairs, "pk", _support_count_kernel, _SUPPORT_SCHEMA,
                pre_fn=pack, chunk_rows=exchange_max_rows, chunk_key="u")
    return (pairs.groupby(["u", "v"])
            .aggregate(Count(alias_name="n")))


def co_order_edges(sf_dir: str, num_partitions: int | None = None):
    """DISTINCT undirected part—part edges (u < v by id): two parts are
    adjacent when some order contains lineitems of both. The pair
    explode runs on the vectorized multi-group kernel over the direct
    exchange (``_coorder_pairs``); one distinct pass over thin (u, v)
    rows follows."""
    del num_partitions   # the exchange sizes itself
    return _coorder_support(sf_dir).select_columns(["u", "v"])


def parts_triangle_count(sf_dir: str, num_partitions: int | None = None,
                         exchange_max_rows: int = COORDER_EXCHANGE_MAX,
                         broadcast_threshold: int | None = None):
    """Per-part triangle count on the co-order graph — distributed
    triangle enumeration by DEGREE ORIENTATION, the standard trick that
    keeps wedge generation subquadratic at scale: orient every edge
    from its lower-(degree, id) endpoint to the higher, so out-degrees
    are O(√m) and the wedge set Σ out_deg² is bounded; each triangle is
    then found exactly once, at its orientation-minimal vertex. The
    per-vertex counts are orientation-invariant, so the id-ordered SQL
    oracle hash-matches.

    Dataflow: edges → degree groupby → the NODE-SCALE degree table
    attaches to both endpoints through the size-gated policy → a
    groupby(src) kernel emits the oriented wedge pairs → the wedges
    CLOSE against the oriented edges on a packed (a, b) int64 key over
    the direct exchange (marker-union kernel: a pk-run holding an edge
    marker turns its wedge rows into triangles and emits (vertex, n)
    partials in place — 24 s → ~8 s at sf0.01 vs the hash join +
    unaggregated vertex explode). Above the row gate, or with ids too
    wide to pack, the Dataset hash-join close runs instead (both paths
    unit-forced). Every exchange is keyed; no driver state beyond the
    gated degree broadcast.
    """
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet")
    edges = co_order_edges(sf_dir, num_partitions).materialize()

    out_schema = pa.schema([("l_partkey", pa.int64()),
                            ("n_triangles", pa.int64())])
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def both_ends(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()])})

    deg = (edges.map_batches(both_ends, batch_format="pyarrow")
           .groupby("node").aggregate(Count(alias_name="deg")))

    # node-scale dimension: size-gated broadcast beats two edge-scale
    # hash joins (every endpoint has a degree, so unmatched-null
    # semantics never fire)
    e = attach_dim(edges, deg, "u", "node", ["deg"],
                   broadcast_threshold=bt)
    e = e.map_batches(lambda t: pa.table(
        {"u": t["u"], "v": t["v"], "deg_u": t["deg"]}),
        batch_format="pyarrow")
    e = attach_dim(e, deg, "v", "node", ["deg"],
                   broadcast_threshold=bt)

    ORI_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                            ("dst_deg", pa.int64())])

    def orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        du = t["deg_u"].to_numpy(zero_copy_only=False)
        dv = t["deg"].to_numpy(zero_copy_only=False)
        # src = (deg, id)-smaller endpoint; u < v by id, so ties go u→v
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pa.table({
            "src": pa.array(np.where(fwd, u, v)),
            "dst": pa.array(np.where(fwd, v, u)),
            "dst_deg": pa.array(np.where(fwd, dv, du)),
        }, schema=ORI_SCHEMA)

    oriented = e.map_batches(orient, batch_format="pyarrow").materialize()

    WEDGE_SCHEMA = pa.schema([("w_src", pa.int64()), ("a", pa.int64()),
                              ("b", pa.int64())])

    def wedges(g: pa.Table) -> pa.Table:
        # canonical (a, b): a precedes b in the SAME (deg, id) total
        # order that oriented the edges, so the closing edge is a→b
        d = g["dst_deg"].to_numpy(zero_copy_only=False)
        n = g["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((n, d))
        n, src = n[order], int(g["src"][0].as_py())
        if len(n) < 2:
            return WEDGE_SCHEMA.empty_table()
        ia, ib = np.triu_indices(len(n), k=1)
        return pa.table({"w_src": pa.array(np.full(len(ia), src, np.int64)),
                         "a": pa.array(n[ia]), "b": pa.array(n[ib])},
                        schema=WEDGE_SCHEMA)

    cand = oriented.groupby("src").map_groups(wedges,
                                              batch_format="pyarrow")

    cand = cand.materialize()
    n_wedges = cand.count()
    from ray.data.aggregate import Max, Min
    # BOTH endpoints appear as packed HIGH halves (``a`` in wedge_pk
    # holds dst values, ``s`` in edge_marker holds src values), so
    # both must sit in [0, 2³¹) — a high half in [2³¹, 2³²) wraps
    # ``x << 32`` int64-negative and ``pk >> 32`` sign-extends it;
    # and degree orientation lets a src-only node exceed max(dst),
    # so max(src) must be bounded too (ADVICE r3)
    bounds = oriented.aggregate(
        Min("src", alias_name="src_lo"), Max("src", alias_name="src_hi"),
        Min("dst", alias_name="dst_lo"), Max("dst", alias_name="dst_hi"))
    packable = (bounds["src_lo"] is not None
                and min(bounds["src_lo"], bounds["dst_lo"]) >= 0
                and max(bounds["src_hi"], bounds["dst_hi"]) < (1 << 31))

    if packable and 0 < n_wedges <= exchange_max_rows:
        from ..stages.exchange import exchange_reduce

        pk_schema = pa.schema([("pk", pa.int64()), ("w_src", pa.int64())])

        def wedge_pk(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return pa.table({"pk": pa.array((a << 32) | b, pa.int64()),
                             "w_src": t["w_src"]}, schema=pk_schema)

        def edge_marker(t: pa.Table) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            return pa.table({"pk": pa.array((s << 32) | d, pa.int64()),
                             "w_src": pa.array(
                                 np.full(len(s), -1, np.int64))},
                            schema=pk_schema)

        both = (cand.map_batches(wedge_pk, batch_format="pyarrow")
                .union(oriented.map_batches(edge_marker,
                                            batch_format="pyarrow"))
                .materialize())

        part_schema = pa.schema([("l_partkey", pa.int64()),
                                 ("n", pa.int64())])

        def close_kernel(t: pa.Table) -> pa.Table:
            pk = t["pk"].to_numpy(zero_copy_only=False)
            ws = t["w_src"].to_numpy(zero_copy_only=False)
            order = np.argsort(pk, kind="stable")
            pk, ws = pk[order], ws[order]
            starts = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
            sizes = np.diff(np.r_[starts, len(pk)])
            has_edge = np.minimum.reduceat(ws, starts) == -1
            mask = np.repeat(has_edge, sizes) & (ws != -1)
            if not mask.any():
                return part_schema.empty_table()
            verts = np.concatenate([ws[mask], pk[mask] >> 32,
                                    pk[mask] & 0xFFFFFFFF])
            uniq, n = np.unique(verts, return_counts=True)
            return pa.table({"l_partkey": pa.array(uniq, pa.int64()),
                             "n": pa.array(n.astype(np.int64))},
                            schema=part_schema)

        partials = exchange_reduce(both, "pk", close_kernel, part_schema)
        return (partials.groupby("l_partkey")
                .aggregate(Sum("n", alias_name="n_triangles")))

    # fallback: Dataset hash-join close (unconditionally scalable).
    # dst_deg rides along as the non-key marker column: a key-only
    # right side coalesces away entirely in Ray 2.49's hash join
    # (same workaround as ops/joins.py / ops/curation.py)
    tri = cand.join(oriented, join_type="inner", num_partitions=npart,
                    on=("a", "b"), right_on=("src", "dst"))

    def explode(t: pa.Table) -> pa.Table:
        uniq, n = np.unique(np.concatenate(
            [t["w_src"].to_numpy(zero_copy_only=False),
             t["a"].to_numpy(zero_copy_only=False),
             t["b"].to_numpy(zero_copy_only=False)]), return_counts=True)
        return pa.table({"l_partkey": pa.array(uniq, pa.int64()),
                         "n": pa.array(n.astype(np.int64))})

    return (tri.map_batches(explode, batch_format="pyarrow")
            .groupby("l_partkey")
            .aggregate(Sum("n", alias_name="n_triangles")))


TRIANGLE_ORACLE_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM e e1 JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
verts AS (SELECT unnest([x, y, z]) AS l_partkey FROM tri)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM verts GROUP BY l_partkey
""".strip()


def supplier_pagerank(sf_dir: str, iters: int = 5, damping: float = 0.85,
                      num_partitions: int | None = None):
    """PageRank by synchronous power iteration on the undirected
    customer—supplier graph. Rows-only at the driver (floating-point
    sums are order-dependent across shuffles, so no SQL hash oracle);
    tests/test_ops.py checks the distributed result against a dense
    numpy power iteration to 1e-9 and pins the top node.

    Loop body per iteration: edges(u, v, deg_u) hash-joins ranks(u),
    contributions rank/deg stream to a groupby(v).Sum, and the damped
    update maps per batch. Only (node, rank) pairs and the pinned edge
    table move; no driver-side graph state at any size.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages.labeljoin import attach_dim

    del num_partitions   # node-scale dims ride the gated attach

    edges = customer_supplier_edges(sf_dir).materialize()
    n = edges.count()
    if n == 0:
        return rd.from_arrow(pa.schema(
            [("node", pa.int64()), ("rank", pa.float64())]).empty_table())
    deg = edges.groupby("u").aggregate(Count(alias_name="deg"))
    # the degree and rank tables are NODE-scale: the size-gated attach
    # (broadcast under threshold, padded-union groupby above) replaces
    # one edge-scale hash join per iteration
    edges = attach_dim(edges, deg, "u", "u", ["deg"]).materialize()
    n = deg.count()

    ranks = deg.map_batches(
        lambda t: pa.table({"u": t["u"],
                            "rank": pa.array([1.0 / n] * t.num_rows,
                                             pa.float64())}),
        batch_format="pyarrow").materialize()

    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = attach_dim(edges, ranks, "u", "u", ["rank"])
        contrib = contrib.map_batches(
            lambda t: pa.table({
                "v": t["v"],
                "c": pc.divide(t["rank"],
                               t["deg"].cast(pa.float64()))}),
            batch_format="pyarrow")
        summed = contrib.groupby("v").aggregate(Sum("c", alias_name="s"))
        ranks = summed.map_batches(
            lambda t: pa.table({
                "u": t["v"],
                "rank": pc.add(pa.scalar(base),
                               pc.multiply(pa.scalar(damping), t["s"]))}),
            batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t["u"], "rank": t["rank"]}),
        batch_format="pyarrow")


PR_SCALE = 10 ** 12        # fixed-point rank unit
PR_ITERS = 5
PR_BROADCAST_MAX = 5_000_000   # node gate for the broadcast loop


def supplier_pagerank_int(sf_dir: str, iters: int = PR_ITERS,
                          num_partitions: int | None = None,
                          broadcast_max: int = PR_BROADCAST_MAX):
    """PageRank in exact int64 fixed-point (rank × 10^12). Integer
    floor-division contributions make every per-node sum
    order-independent across shuffles, so — unlike the float variant
    above — this one IS hash-checkable against a DuckDB oracle that
    unrolls the same ``iters`` synchronous steps with identical
    ``//`` arithmetic (``PAGERANK_INT_ORACLE_SQL``). Same dataflow as
    ``supplier_pagerank``: the damped update is

        rank' = base + (85 * sum(rank_u // deg_u)) // 100

    with ``base = (15 * (SCALE // n)) // 100``. Worst-case magnitude
    85 × 10^12 sits far inside int64.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..stages.labeljoin import attach_dim

    del num_partitions   # node-scale dims ride the gated attach

    edges = customer_supplier_edges(sf_dir).materialize()
    out_schema = pa.schema([("node", pa.int64()),
                            ("rank_fp", pa.int64())])
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    deg = edges.groupby("u").aggregate(Count(alias_name="deg"))
    n = deg.count()
    init = PR_SCALE // n
    base = (15 * init) // 100

    if n <= broadcast_max:
        # node-scale state rides ray.put once per iteration; each
        # iteration is ONE stateless map over the pinned edge table
        # (searchsorted lookups + per-batch sum-per-dst partials) and a
        # bounded driver fold — no join, no groupby, no materialize per
        # step. Integer // arithmetic is order-independent, so this
        # path is bit-identical to the distributed one (unit-forced).
        import ray

        dt = pa.concat_tables(list(deg.iter_batches(
            batch_format="pyarrow")))
        us = dt["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        ds_ = dt["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(us)
        us, ds_ = us[order], ds_[order]
        ranks_v = np.full(n, init, np.int64)
        for _ in range(iters):
            # node arrays ride the object store, never the task closure
            rref = ray.put((us, ds_, ranks_v))

            def contrib_partial(t: pa.Table) -> pa.Table:
                us2, ds2, r = ray.get(rref)
                u = t["u"].to_numpy(zero_copy_only=False)
                v = t["v"].to_numpy(zero_copy_only=False)
                iu = np.searchsorted(us2, u)
                c = r[iu] // ds2[iu]
                ov = np.argsort(v, kind="stable")
                v, c = v[ov], c[ov]
                starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
                return pa.table({
                    "v": pa.array(v[starts], pa.int64()),
                    "s": pa.array(np.add.reduceat(c, starts), pa.int64())})

            parts = [b for b in edges.map_batches(
                contrib_partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow") if b.num_rows]
            cat = pa.concat_tables(parts)
            v = cat["v"].to_numpy(zero_copy_only=False)
            s = cat["s"].to_numpy(zero_copy_only=False)
            ov = np.argsort(v, kind="stable")
            v, s = v[ov], s[ov]
            starts = np.flatnonzero(np.r_[True, v[1:] != v[:-1]])
            summed = np.add.reduceat(s, starts)
            iv = np.searchsorted(us, v[starts])
            ranks_v = np.full(n, base, np.int64)
            ranks_v[iv] = base + (85 * summed) // 100
        return rd.from_arrow(pa.table({
            "node": pa.array(us, pa.int64()),
            "rank_fp": pa.array(ranks_v, pa.int64())}, schema=out_schema))

    edges = attach_dim(edges, deg, "u", "u", ["deg"]).materialize()

    ranks = deg.map_batches(
        lambda t: pa.table({"u": t["u"],
                            "rank": pa.array([init] * t.num_rows,
                                             pa.int64())}),
        batch_format="pyarrow").materialize()

    for _ in range(iters):
        contrib = attach_dim(edges, ranks, "u", "u", ["rank"])
        contrib = contrib.map_batches(
            lambda t: pa.table({
                "v": t["v"],
                "c": pc.divide(t["rank"].cast(pa.int64()),
                               t["deg"].cast(pa.int64()))}),
            batch_format="pyarrow")
        summed = contrib.groupby("v").aggregate(Sum("c", alias_name="s"))
        ranks = summed.map_batches(
            lambda t: pa.table({
                "u": t["v"],
                "rank": pc.add(
                    pa.scalar(base, pa.int64()),
                    pc.divide(pc.multiply(pa.scalar(85, pa.int64()),
                                          t["s"].cast(pa.int64())),
                              pa.scalar(100, pa.int64())))}),
            batch_format="pyarrow").materialize()

    return ranks.map_batches(
        lambda t: pa.table({"node": t["u"],
                            "rank_fp": t["rank"].cast(pa.int64())},
                           schema=out_schema),
        batch_format="pyarrow")


def _pagerank_int_oracle_sql(iters: int = PR_ITERS) -> str:
    """The same fixed-point power iteration, UNROLLED (one edge join +
    groupby-sum per step — the components-oracle pattern). n is data-
    dependent, so init/base come from scalar subqueries over the node
    count; every division is DuckDB's integer ``//`` on BIGINTs, which
    floors exactly like Python's on the nonnegative values here."""
    parts = [f"""WITH
e0 AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
       FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
e AS MATERIALIZED (
   SELECT CAST(c AS BIGINT) AS u, CAST(-(s + 1) AS BIGINT) AS v FROM e0
   UNION ALL
   SELECT CAST(-(s + 1) AS BIGINT) AS u, CAST(c AS BIGINT) AS v FROM e0),
deg AS MATERIALIZED (SELECT u AS node, count(*) AS deg FROM e GROUP BY u),
nn AS (SELECT count(*) AS n FROM deg),
ed AS MATERIALIZED (SELECT e.u, e.v, d.deg FROM e
                    JOIN deg d ON d.node = e.u),
r0 AS (SELECT node, (SELECT {PR_SCALE} // n FROM nn) AS rank FROM deg)"""]
    for k in range(1, iters + 1):
        parts.append(
            f"""r{k} AS (SELECT ed.v AS node,
  (SELECT (15 * ({PR_SCALE} // n)) // 100 FROM nn)
  + (85 * sum(r{k - 1}.rank // ed.deg)) // 100 AS rank
  FROM ed JOIN r{k - 1} ON r{k - 1}.node = ed.u GROUP BY ed.v)""")
    return (",\n".join(parts)
            + f"\nSELECT node, CAST(rank AS BIGINT) AS rank_fp"
              f" FROM r{iters}")


PAGERANK_INT_ORACLE_SQL = _pagerank_int_oracle_sql()


# ---------------------------------------------------------------------------
# Connected components as a driver-visible query


_PAD = 12                      # int64 partkeys fit; string min == numeric min


def parts_components(sf_dir: str, num_partitions: int | None = None,
                     driver_threshold: int = 2_000_000):
    """Connected components of the co-order part graph: every part
    labeled with the MIN partkey of its component — the same
    distributed hash-to-min machinery the dedup cascade runs
    (stages/components.connected_components, driver union-find below
    the pair threshold, label-propagation rounds above; both paths
    unit-forced there). Keys travel zero-padded so the string min the
    component stage takes IS the numeric min; the recursive-CTE oracle
    closes reachability the same way. Parts that never co-order with
    anything carry no label (same contract as the stage)."""
    import numpy as np
    import ray.data as rd

    from ..stages.components import connected_components

    out_schema = pa.schema([("l_partkey", pa.int64()),
                            ("component", pa.int64())])
    edges = co_order_edges(sf_dir, num_partitions)

    def to_pairs(t: pa.Table) -> pa.Table:
        u = t["u"].to_pylist()
        v = t["v"].to_pylist()
        return pa.table({"a": pa.array([f"{x:0{_PAD}d}" for x in u]),
                         "b": pa.array([f"{x:0{_PAD}d}" for x in v])})

    labels = connected_components(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        driver_threshold=driver_threshold)

    def back(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["node"].cast(pa.int64()),
            "component": t["component"].cast(pa.int64()),
        }, schema=out_schema)

    return labels.map_batches(back, batch_format="pyarrow")


def _components_oracle_sql(rounds: int = 24) -> str:
    """Synchronous min-label propagation, UNROLLED (DuckDB 1.0 has no
    keyed recursion, and the naive reachability closure is O(n·m) —
    73 s at sf0.01 vs 0.8 s for this). Each round is one edge join +
    groupby-min; MATERIALIZED pins the edge table to a single scan
    (inlined CTEs re-open the parquet per reference and exhaust file
    handles). Convergence is self-checking: if any label could still
    shrink after the last round, a poison (-1, -1) row is emitted and
    the driver's row/hash compare fails LOUDLY instead of silently
    blessing a truncated propagation."""
    parts = ["""WITH
li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
e AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
lab0 AS (SELECT u AS node, u AS lbl FROM e GROUP BY u)"""]
    for k in range(1, rounds + 1):
        mat = "MATERIALIZED " if k % 4 == 0 else ""
        parts.append(
            f"""nb{k} AS (SELECT e.v AS node, min(l.lbl) AS m
  FROM lab{k - 1} l JOIN e ON e.u = l.node GROUP BY e.v),
lab{k} AS {mat}(SELECT l.node, least(l.lbl, coalesce(n.m, l.lbl)) AS lbl
  FROM lab{k - 1} l LEFT JOIN nb{k} n ON n.node = l.node)""")
    # the fixpoint probe must be a FRESH propagation FROM the final
    # labels (nb{rounds} is already folded into lab{rounds} and can
    # never flag)
    return ",\n".join(parts) + f""",
probe AS (SELECT e.v AS node, min(l.lbl) AS m
  FROM lab{rounds} l JOIN e ON e.u = l.node GROUP BY e.v),
conv AS (SELECT count(*) AS bad FROM lab{rounds} a JOIN probe n
         ON n.node = a.node AND n.m < a.lbl)
SELECT node AS l_partkey, CAST(lbl AS BIGINT) AS component FROM lab{rounds}
UNION ALL
SELECT -1, -1 FROM conv WHERE bad > 0"""


COMPONENTS_ORACLE_SQL = _components_oracle_sql()


# ---------------------------------------------------------------------------
# k-core decomposition (iterative peel)

KCORE_K = 64


def parts_kcore(sf_dir: str, k: int = KCORE_K, max_rounds: int = 30,
                num_partitions: int | None = None):
    """The k-core of the co-order graph — iterative peeling with
    DATA-DEPENDENT termination (the dataflow shape PageRank's fixed
    count doesn't cover): drop every part with fewer than ``k``
    co-order neighbors, recompute degrees on the shrunken subgraph,
    repeat until no node drops. Output: surviving parts with their
    IN-CORE degree.

    Each round is one degree groupby + two survivor semi-joins over the
    remaining directed edges — everything keyed, the driver holds only
    the round's survivor COUNT (the fixpoint test). Edge sets shrink
    monotonically, so the per-round cost falls as the peel proceeds.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    out_schema = pa.schema([("l_partkey", pa.int64()),
                            ("core_degree", pa.int64())])
    edges = co_order_edges(sf_dir, num_partitions)

    def both_dir(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["u"].combine_chunks(),
                                      t["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["v"].combine_chunks(),
                                     t["u"].combine_chunks()])})

    cur = edges.map_batches(both_dir, batch_format="pyarrow").materialize()
    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet")

    for _ in range(max_rounds):
        deg = (cur.groupby("node").aggregate(Count(alias_name="deg"))
               .materialize())
        n_nodes = deg.count()
        if n_nodes == 0:
            return rd.from_arrow(out_schema.empty_table())
        surv = deg.filter(expr=f"deg >= {int(k)}").materialize()
        if surv.count() == n_nodes:        # fixpoint: nobody dropped
            return surv.map_batches(
                lambda t: pa.table({"l_partkey": t["node"],
                                    "core_degree": t["deg"]},
                                   schema=out_schema),
                batch_format="pyarrow")
        if surv.count() == 0:
            return rd.from_arrow(out_schema.empty_table())
        # restrict edges to survivor×survivor (deg is the marker column
        # both times; key-only sides coalesce away in Ray 2.49)
        cur = cur.join(surv, join_type="inner", num_partitions=npart,
                       on=("node",))
        cur = (cur.map_batches(lambda t: t.select(["node", "nbr"]),
                               batch_format="pyarrow")
               .join(surv, join_type="inner", num_partitions=npart,
                     on=("nbr",), right_on=("node",)))
        cur = cur.map_batches(lambda t: t.select(["node", "nbr"]),
                              batch_format="pyarrow").materialize()
    raise RuntimeError(f"k-core did not converge in {max_rounds} rounds")


def _kcore_oracle_sql(k: int = KCORE_K, rounds: int = 8) -> str:
    """Unrolled peel with the same poison-row convergence guard as the
    components oracle: if an extra round would still drop a node, a
    (-1, -1) row makes the driver compare fail loudly."""
    parts = ["""WITH
li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
e AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e0
                   UNION ALL SELECT v AS node, u AS nbr FROM e0),
v0 AS (SELECT DISTINCT node FROM e)"""]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS (SELECT e.node, count(*) AS deg
  FROM e JOIN v{r - 1} a ON a.node = e.node
         JOIN v{r - 1} b ON b.node = e.nbr
  GROUP BY e.node),
v{r} AS {"MATERIALIZED " if r % 2 == 0 else ""}(SELECT node FROM d{r} WHERE deg >= {k})""")
    return ",\n".join(parts) + f""",
probe AS (SELECT e.node, count(*) AS deg
  FROM e JOIN v{rounds} a ON a.node = e.node
         JOIN v{rounds} b ON b.node = e.nbr
  GROUP BY e.node),
conv AS (SELECT count(*) AS bad FROM probe WHERE deg < {k})
SELECT node AS l_partkey, CAST(deg AS BIGINT) AS core_degree FROM probe
UNION ALL
SELECT -1, -1 FROM conv WHERE bad > 0"""


KCORE_ORACLE_SQL = _kcore_oracle_sql()


# ---------------------------------------------------------------------------
# BFS hop distances from a canonical source (frontier-iterative)

BFS_MAX_ROUNDS = 40


BFS_BROADCAST_MAX = 5_000_000   # reached-node gate for the fast path


def parts_bfs_hops(sf_dir: str, max_rounds: int = BFS_MAX_ROUNDS,
                   num_partitions: int | None = None,
                   broadcast_max: int = BFS_BROADCAST_MAX):
    """Unweighted shortest-path hop counts over the co-order graph from
    a canonical source (the minimum partkey that appears in any edge) —
    the frontier-expansion iterative shape (SSSP/BFS) the degree/
    components/k-core family doesn't cover. TWO paths, same answer
    (the components-stage precedent):

    * **Broadcast fast path** (reached set ≤ ``broadcast_max``): the
      frontier + seen sets ride ``ray.put`` once per round; each round
      is ONE stateless map over the pinned edge table (vectorized
      isin + unique per batch) and a bounded driver merge of new
      nodes — no per-round shuffle at all (75 s → ~8 s at sf0.1).
    * **Distributed path** (forced with ``broadcast_max=0``; the
      unconditionally scalable shape): per round one marker-union
      expansion groupby plus one marker-union anti-join groupby —
      Dataset joins are deliberately avoided because a sparse frontier
      hands Ray 2.49's hash-join aggregator empty-bundle partitions.

    Rounds are bounded by the graph's diameter; the driver holds the
    round's new-node count (both paths) plus, on the fast path only,
    the gated reached set. Unreached nodes (other components) carry no
    row, matching the closure oracle."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    out_schema = pa.schema([("l_partkey", pa.int64()),
                            ("hop", pa.int64())])
    edges = co_order_edges(sf_dir, num_partitions)
    e_schema = pa.schema([("node", pa.int64()), ("nbr", pa.int64())])

    def both_dir(t: pa.Table) -> pa.Table:
        # normalize: upstream groupby can emit zero-column empty blocks,
        # which a downstream Arrow hash join rejects
        if t.num_rows == 0 or "u" not in t.column_names:
            return e_schema.empty_table()
        return pa.table({
            "node": pa.concat_arrays([t["u"].combine_chunks(),
                                      t["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["v"].combine_chunks(),
                                     t["u"].combine_chunks()])},
            schema=e_schema)

    e = edges.map_batches(both_dir, batch_format="pyarrow").materialize()
    if e.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    src = e.aggregate(Min("node", alias_name="m"))["m"]

    if broadcast_max > 0:
        nodes = [np.array([src], np.int64)]
        seen = {int(src)}
        frontier_arr = nodes[0]
        hops = [np.array([0], np.int64)]
        for r in range(1, max_rounds + 1):
            fref = ray.put(np.sort(frontier_arr))

            def expand(t: pa.Table) -> pa.Table:
                fr = ray.get(fref)
                node = t["node"].to_numpy(zero_copy_only=False)
                idx = np.searchsorted(fr, node)
                hit = (idx < len(fr)) & (fr[np.minimum(idx, len(fr) - 1)]
                                         == node)
                out = np.unique(t["nbr"].to_numpy(
                    zero_copy_only=False)[hit])
                return pa.table({"nbr": pa.array(out, pa.int64())})

            cand = np.unique(np.concatenate(
                [b["nbr"].to_numpy(zero_copy_only=False)
                 for b in e.map_batches(expand, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow")] or
                [np.array([], np.int64)]))
            new = np.array([n for n in cand if int(n) not in seen],
                           np.int64)
            if len(new) == 0:
                break
            if len(seen) + len(new) > broadcast_max:
                raise RuntimeError(
                    "BFS broadcast fast path exceeded its gate; rerun "
                    "with broadcast_max=0 for the distributed path")
            seen.update(int(n) for n in new)
            nodes.append(new)
            hops.append(np.full(len(new), r, np.int64))
            frontier_arr = new
        return rd.from_arrow(pa.table({
            "l_partkey": pa.array(np.concatenate(nodes), pa.int64()),
            "hop": pa.array(np.concatenate(hops), pa.int64()),
        }, schema=out_schema))

    dist = rd.from_arrow(pa.table({
        "l_partkey": pa.array([src], pa.int64()),
        "hop": pa.array([0], pa.int64())}, schema=out_schema)).materialize()
    frontier = dist

    # Both the frontier⋈edges expansion and the unseen anti-join run as
    # MARKER-UNION groupbys (the stages/labeljoin padded-union shape),
    # not Dataset joins — a sparse frontier hands Ray 2.49's hash-join
    # aggregator partitions with only empty bundles, which it cannot
    # finalize (same caveat as ops/webqual.prefix_containment).
    def fr_mark(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["l_partkey"].cast(pa.int64()),
            "nbr": pa.array(np.full(t.num_rows, -1, np.int64))},
            schema=e_schema)

    def expand(g: pa.Table) -> pa.Table:
        nbr = g["nbr"].to_numpy(zero_copy_only=False)
        if not (nbr == -1).any():          # node not on the frontier
            return pa.schema([("key", pa.int64())]).empty_table()
        return pa.table({"key": pa.array(np.unique(nbr[nbr != -1]))})

    def pick_new(g: pa.Table, hop: int) -> pa.Table:
        if pc.max(g["seen"]).as_py() == 1:  # already settled
            return out_schema.empty_table()
        return pa.table({
            "l_partkey": pa.array([g["key"][0].as_py()], pa.int64()),
            "hop": pa.array([hop], pa.int64())}, schema=out_schema)

    for r in range(1, max_rounds + 1):
        cand = (e.union(frontier.map_batches(fr_mark,
                                             batch_format="pyarrow"))
                .groupby("node").map_groups(expand,
                                            batch_format="pyarrow"))
        cand = cand.map_batches(
            lambda t: pa.table({
                "key": t["key"].cast(pa.int64()),
                "seen": pa.array(np.zeros(t.num_rows, np.int64))}),
            batch_format="pyarrow")
        settled = dist.map_batches(
            lambda t: pa.table({
                "key": t["l_partkey"].cast(pa.int64()),
                "seen": pa.array(np.ones(t.num_rows, np.int64))}),
            batch_format="pyarrow")
        new = (cand.union(settled).groupby("key")
               .map_groups(lambda g, _h=r: pick_new(g, _h),
                           batch_format="pyarrow")
               .materialize())
        if new.count() == 0:
            return dist
        dist = dist.union(new).materialize()
        frontier = new
    raise RuntimeError(f"BFS did not converge in {max_rounds} rounds")


def _bfs_oracle_sql(rounds: int = 8) -> str:
    """Unrolled frontier expansion with the same poison-row convergence
    guard as the k-core oracle: if round ``rounds``+1 would still
    discover a node, a (-1, -1) row fails the driver compare loudly."""
    parts = ["""WITH
li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
e AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e0
                   UNION ALL SELECT v AS node, u AS nbr FROM e0),
f0 AS (SELECT min(node) AS node FROM e),
a0 AS (SELECT node, 0 AS hop FROM f0)"""]
    for r in range(1, rounds + 1):
        parts.append(
            f"""f{r} AS (SELECT DISTINCT e.nbr AS node
  FROM e JOIN f{r - 1} f ON f.node = e.node
  WHERE e.nbr NOT IN (SELECT node FROM a{r - 1})),
a{r} AS MATERIALIZED (SELECT * FROM a{r - 1}
        UNION ALL SELECT node, {r} AS hop FROM f{r})""")
    return ",\n".join(parts) + f""",
probe AS (SELECT DISTINCT e.nbr AS node
  FROM e JOIN f{rounds} f ON f.node = e.node
  WHERE e.nbr NOT IN (SELECT node FROM a{rounds}))
SELECT node AS l_partkey, CAST(hop AS BIGINT) AS hop FROM a{rounds}
UNION ALL
SELECT -1, -1 FROM probe"""


BFS_ORACLE_SQL = _bfs_oracle_sql()


# ---------------------------------------------------------------------------
# Weighted bipartite projection, top-k (frequent-pair support counting)

COORDER_TOPK = 20


def parts_coorder_topk(sf_dir: str, k: int = COORDER_TOPK):
    """Top-``k`` part pairs by CO-ORDER SUPPORT (how many orders
    contain both) — the weighted bipartite-projection / frequent-
    itemset-pair shape (`co_order_edges` keeps only the distinct edge
    set; this keeps the weights). Same bounded pair kernel (orders
    hold ≤7 lineitems, so each order group emits ≤21 pair rows), one
    (u, v) groupby to sum support, then the per-block top-k + bounded
    merge every top-k in this repo uses. Tie-break (n DESC, u, v)
    pinned on both sides.
    """
    from .stats import _topk_table

    out_schema = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                            ("n", pa.int64())])
    support = _coorder_support(sf_dir)
    return _topk_table(support, [("n", "descending"), ("u", "ascending"),
                                 ("v", "ascending")], k, out_schema)


COORDER_TOPK_ORACLE_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS n
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2)
SELECT u, v, CAST(n AS BIGINT) AS n
FROM p ORDER BY n DESC, u, v LIMIT {COORDER_TOPK}
""".strip()


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths (min-plus relaxation rounds)

SSSP_WEIGHT_NUM = 1_000_000      # edge weight = NUM // support (floor)
SSSP_ORACLE_ROUNDS = 12          # unrolled relaxations in the SQL oracle
SSSP_MAX_ROUNDS = 64
SSSP_BROADCAST_MAX = 5_000_000   # settled-node gate for the fast path

_SSSP_SCHEMA = pa.schema([("l_partkey", pa.int64()), ("dist", pa.int64())])


def _sssp_weighted_edges(sf_dir: str):
    """Directed weighted edge table (node, nbr, w) over the co-order
    graph: w = SSSP_WEIGHT_NUM // support, so strongly co-ordered parts
    are CLOSER — integer floor division keeps every distance exact."""
    e_schema = pa.schema([("node", pa.int64()), ("nbr", pa.int64()),
                          ("w", pa.int64())])
    support = _coorder_support(sf_dir)

    def both_dir(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "u" not in t.column_names:
            return e_schema.empty_table()
        n = t["n"].to_numpy(zero_copy_only=False)
        w = pa.array(SSSP_WEIGHT_NUM // n, pa.int64())
        return pa.table({
            "node": pa.concat_arrays([t["u"].combine_chunks(),
                                      t["v"].combine_chunks()]),
            "nbr": pa.concat_arrays([t["v"].combine_chunks(),
                                     t["u"].combine_chunks()]),
            "w": pa.concat_arrays([w, w])}, schema=e_schema)

    return support.map_batches(both_dir, batch_format="pyarrow")


def parts_sssp(sf_dir: str, max_rounds: int = SSSP_MAX_ROUNDS,
               broadcast_max: int = SSSP_BROADCAST_MAX):
    """Exact weighted shortest-path distances from a canonical source
    (minimum partkey on any edge) — Bellman-Ford as distributed
    min-plus relaxation rounds, the weighted sibling of
    ``parts_bfs_hops`` (hop counts can't model tie strength; here
    support-weighted edges make strongly co-ordered parts close).
    Unlike BFS, a node's distance can IMPROVE after first discovery
    via a longer-but-lighter path, so rounds run until a full
    relaxation changes nothing. TWO paths, same answer:

    * **Broadcast fast path** (settled set ≤ ``broadcast_max``): the
      (sorted nodes, dists) arrays ride ``ray.put`` once per round;
      each round is ONE stateless map over the pinned weighted edge
      table (searchsorted hit test + per-batch min-per-nbr partials)
      and a bounded driver min-merge — no per-round shuffle.
    * **Distributed path** (``broadcast_max=0``; unconditionally
      scalable): per round one marker-union relaxation groupby(node)
      emitting (nbr, dist+w) candidates plus one marker-union
      min-merge groupby(key) that rebuilds the dist table and counts
      improvements — Dataset joins avoided for the same sparse-bundle
      reason as BFS.

    Rounds are bounded by the weighted diameter in hops; convergence =
    an improvement-free round. The oracle unrolls
    ``SSSP_ORACLE_ROUNDS`` relaxations with a poison row if a further
    relaxation would still improve — convergence is driver-checked on
    BOTH sides."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    e = _sssp_weighted_edges(sf_dir).materialize()
    if e.count() == 0:
        return rd.from_arrow(_SSSP_SCHEMA.empty_table())
    src = int(e.aggregate(Min("node", alias_name="m"))["m"])

    if broadcast_max > 0:
        nodes = np.array([src], np.int64)          # sorted
        dists = np.array([0], np.int64)
        for _ in range(max_rounds):
            dref = ray.put((nodes, dists))

            def relax(t: pa.Table) -> pa.Table:
                sn, sd = ray.get(dref)
                node = t["node"].to_numpy(zero_copy_only=False)
                idx = np.searchsorted(sn, node)
                hit = (idx < len(sn)) & (sn[np.minimum(idx, len(sn) - 1)]
                                         == node)
                nbr = t["nbr"].to_numpy(zero_copy_only=False)[hit]
                if len(nbr) == 0:      # no settled endpoint in batch
                    return pa.schema([("nbr", pa.int64()),
                                      ("d", pa.int64())]).empty_table()
                cand = (sd[idx[hit]]
                        + t["w"].to_numpy(zero_copy_only=False)[hit])
                order = np.lexsort((cand, nbr))
                nbr, cand = nbr[order], cand[order]
                starts = np.flatnonzero(np.r_[True, nbr[1:] != nbr[:-1]])
                return pa.table({"nbr": pa.array(nbr[starts], pa.int64()),
                                 "d": pa.array(cand[starts], pa.int64())})

            parts = [b for b in e.map_batches(relax,
                                              batch_format="pyarrow")
                     .iter_batches(batch_format="pyarrow") if b.num_rows]
            if not parts:
                break
            cat = pa.concat_tables(parts)
            nbr = cat["nbr"].to_numpy(zero_copy_only=False)
            cand = cat["d"].to_numpy(zero_copy_only=False)
            order = np.lexsort((cand, nbr))
            nbr, cand = nbr[order], cand[order]
            starts = np.flatnonzero(np.r_[True, nbr[1:] != nbr[:-1]])
            nbr, cand = nbr[starts], cand[starts]
            idx = np.searchsorted(nodes, nbr)
            known = (idx < len(nodes)) & (nodes[np.minimum(
                idx, len(nodes) - 1)] == nbr)
            improved = known & (cand < dists[np.minimum(
                idx, len(nodes) - 1)])
            if not (improved.any() or (~known).any()):
                return rd.from_arrow(pa.table(
                    {"l_partkey": pa.array(nodes, pa.int64()),
                     "dist": pa.array(dists, pa.int64())},
                    schema=_SSSP_SCHEMA))
            dists[idx[improved]] = cand[improved]
            nodes = np.concatenate([nodes, nbr[~known]])
            dists = np.concatenate([dists, cand[~known]])
            order = np.argsort(nodes)
            nodes, dists = nodes[order], dists[order]
            if len(nodes) > broadcast_max:
                raise RuntimeError(
                    "SSSP broadcast fast path exceeded its gate; rerun "
                    "with broadcast_max=0 for the distributed path")
        else:
            raise RuntimeError(
                f"SSSP did not converge in {max_rounds} rounds")
        return rd.from_arrow(pa.table(
            {"l_partkey": pa.array(nodes, pa.int64()),
             "dist": pa.array(dists, pa.int64())}, schema=_SSSP_SCHEMA))

    # ---- distributed path: marker-union groupbys, no Dataset joins ----
    em_schema = pa.schema([("node", pa.int64()), ("nbr", pa.int64()),
                           ("w", pa.int64()), ("d", pa.int64())])
    dist = rd.from_arrow(pa.table({
        "l_partkey": pa.array([src], pa.int64()),
        "dist": pa.array([0], pa.int64())},
        schema=_SSSP_SCHEMA)).materialize()
    e_marked = e.map_batches(
        lambda t: t.append_column("d", pa.array(
            np.full(t.num_rows, -1, np.int64))),
        batch_format="pyarrow").materialize()

    def dist_mark(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["l_partkey"].cast(pa.int64()),
            "nbr": pa.array(np.full(t.num_rows, -1, np.int64)),
            "w": pa.array(np.zeros(t.num_rows, np.int64)),
            "d": t["dist"].cast(pa.int64())}, schema=em_schema)

    cand_schema = pa.schema([("key", pa.int64()), ("d", pa.int64()),
                             ("old", pa.int64())])

    def relax_group(g: pa.Table) -> pa.Table:
        d_col = g["d"].to_numpy(zero_copy_only=False)
        mk = d_col >= 0
        if not mk.any():                   # node not settled yet
            return cand_schema.empty_table()
        d0 = int(d_col[mk].min())
        nbr = g["nbr"].to_numpy(zero_copy_only=False)[~mk]
        w = g["w"].to_numpy(zero_copy_only=False)[~mk]
        return pa.table({"key": pa.array(nbr, pa.int64()),
                         "d": pa.array(d0 + w, pa.int64()),
                         "old": pa.array(np.zeros(len(nbr), np.int64))},
                        schema=cand_schema)

    merged_schema = pa.schema([("l_partkey", pa.int64()),
                               ("dist", pa.int64()),
                               ("improved", pa.int64())])

    def min_merge(g: pa.Table) -> pa.Table:
        d = g["d"].to_numpy(zero_copy_only=False)
        old = g["old"].to_numpy(zero_copy_only=False)
        best = int(d.min())
        had = bool((old == 1).any())
        prev = int(d[old == 1].min()) if had else None
        return pa.table({
            "l_partkey": pa.array([int(g["key"][0].as_py())], pa.int64()),
            "dist": pa.array([best], pa.int64()),
            "improved": pa.array(
                [int((not had) or best < prev)], pa.int64())},
            schema=merged_schema)

    for _ in range(max_rounds):
        cand = (e_marked.union(dist.map_batches(dist_mark,
                                                batch_format="pyarrow"))
                .groupby("node").map_groups(relax_group,
                                            batch_format="pyarrow"))
        settled = dist.map_batches(
            lambda t: pa.table({"key": t["l_partkey"].cast(pa.int64()),
                                "d": t["dist"].cast(pa.int64()),
                                "old": pa.array(np.ones(t.num_rows,
                                                        np.int64))},
                               schema=cand_schema),
            batch_format="pyarrow")
        merged = (cand.union(settled).groupby("key")
                  .map_groups(min_merge, batch_format="pyarrow")
                  .materialize())
        n_improved = merged.aggregate(Sum("improved",
                                          alias_name="s"))["s"] or 0
        dist = merged.select_columns(["l_partkey", "dist"]).materialize()
        if n_improved == 0:
            return dist
    raise RuntimeError(f"SSSP did not converge in {max_rounds} rounds")


def _sssp_oracle_sql(rounds: int = SSSP_ORACLE_ROUNDS) -> str:
    """Unrolled min-plus relaxations with the BFS oracle's poison-row
    convergence guard: if relaxation ``rounds``+1 would still improve
    any distance, a (-1, -1) row fails the driver compare loudly."""
    parts = [f"""WITH
li AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
s0 AS MATERIALIZED (SELECT a.l_partkey AS u, b.l_partkey AS v,
        {SSSP_WEIGHT_NUM} // count(*) AS w
       FROM li a JOIN li b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2),
e AS MATERIALIZED (SELECT u AS node, v AS nbr, w FROM s0
                   UNION ALL SELECT v, u, w FROM s0),
a0 AS (SELECT min(node) AS node, 0 AS d FROM e)"""]
    for r in range(1, rounds + 1):
        parts.append(
            f"""c{r} AS (SELECT e.nbr AS node, min(a.d + e.w) AS d
  FROM e JOIN a{r - 1} a ON a.node = e.node GROUP BY e.nbr),
a{r} AS MATERIALIZED (SELECT node, min(d) AS d
  FROM (SELECT * FROM a{r - 1} UNION ALL SELECT * FROM c{r})
  GROUP BY node)""")
    return ",\n".join(parts) + f""",
probe AS (SELECT e.nbr AS node, min(a.d + e.w) AS d
  FROM e JOIN a{rounds} a ON a.node = e.node GROUP BY e.nbr),
viol AS (SELECT p.node FROM probe p
  LEFT JOIN a{rounds} a ON a.node = p.node
  WHERE a.node IS NULL OR p.d < a.d)
SELECT node AS l_partkey, CAST(d AS BIGINT) AS dist FROM a{rounds}
UNION ALL
SELECT -1, -1 FROM viol"""


SSSP_ORACLE_SQL = _sssp_oracle_sql()


# ---------------------------------------------------------------------------
# Frequent 3-itemsets (co-order part triples, the step beyond pairs)

TRIPLE_TOPK = 20


def _triple_kernel(t: pa.Table) -> pa.Table:
    """Vectorized multi-group TRIPLE explode over complete orderkey
    groups — `_coorder_pair_kernel`'s shape one order up: after the
    lexsort + in-order dedupe, all orders of size m emit their
    C(m, 3) sorted triples through one precomputed index template per
    size class (orders hold ≤7 lineitems → ≤35 triples, 5 classes)."""
    import itertools

    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("c", pa.int64())])
    ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((pk, ok))
    ok, pk = ok[order], pk[order]
    keep = np.r_[True, (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
    ok, pk = ok[keep], pk[keep]
    starts = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
    sizes = np.diff(np.r_[starts, len(ok)])
    outs = []
    for m in np.unique(sizes):
        if m < 3:
            continue
        s = starts[sizes == m]
        combo = np.array(list(itertools.combinations(range(int(m)), 3)),
                         np.int64)
        idx = s[:, None, None] + combo[None, :, :]   # orders × C(m,3) × 3
        flat = pk[idx.reshape(-1, 3)]
        outs.append(flat)
    if not outs:
        return schema.empty_table()
    allt = np.concatenate(outs)
    return pa.table({"a": pa.array(allt[:, 0]),
                     "b": pa.array(allt[:, 1]),
                     "c": pa.array(allt[:, 2])}, schema=schema)


def parts_coorder_triples_topk(sf_dir: str, k: int = TRIPLE_TOPK,
                               exchange_max_rows: int =
                               COORDER_EXCHANGE_MAX):
    """Top-``k`` part TRIPLES by co-order support — the frequent-
    3-itemset step of market-basket mining (`parts_coorder_topk` is the
    pair level). Each order group emits its C(m, 3) ≤ 35 sorted
    triples through the vectorized size-class kernel (direct exchange
    under the lineitem row gate, per-group map_groups above it), one
    (a, b, c) groupby sums support, and the usual bounded top-k merge
    runs on (n DESC, a, b, c)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..rayutil import parquet_num_rows
    from ..stages.exchange import exchange_reduce
    from .stats import _topk_table

    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("c", pa.int64()), ("n", pa.int64())])
    if parquet_num_rows(f"{sf_dir}/lineitem.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    li = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_orderkey", "l_partkey"])
          .materialize())
    tri_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                            ("c", pa.int64())])
    if li.count() <= exchange_max_rows:
        triples = exchange_reduce(li, "l_orderkey", _triple_kernel,
                                  tri_schema)
    else:
        triples = li.groupby("l_orderkey").map_groups(
            _triple_kernel, batch_format="pyarrow")
    support = (triples.groupby(["a", "b", "c"])
               .aggregate(Count(alias_name="n")))
    return _topk_table(support, [("n", "descending"), ("a", "ascending"),
                                 ("b", "ascending"), ("c", "ascending")],
                       k, out_schema)


TRIPLES_ORACLE_SQL = f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
t AS (SELECT x.l_partkey AS a, y.l_partkey AS b, z.l_partkey AS c,
             count(*) AS n
      FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
                         AND x.l_partkey < y.l_partkey
                JOIN li z ON y.l_orderkey = z.l_orderkey
                         AND y.l_partkey < z.l_partkey
      GROUP BY 1, 2, 3)
SELECT a, b, c, CAST(n AS BIGINT) AS n
FROM t ORDER BY n DESC, a, b, c LIMIT {TRIPLE_TOPK}
""".strip()
