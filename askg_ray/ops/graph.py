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

import pyarrow as pa
import pyarrow.compute as pc


from .joins import _npartitions  # shared size-aware partition sizing


def customer_supplier_edges(sf_dir: str, num_partitions: int | None = None):
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

    return (j.map_batches(pairs, batch_format="pyarrow")
            .groupby(["u", "v"]).aggregate(Count(alias_name="__c"))
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

    npart = _npartitions(num_partitions)

    edges = customer_supplier_edges(sf_dir, num_partitions).materialize()
    n = edges.count()
    if n == 0:
        return rd.from_arrow(pa.schema(
            [("node", pa.int64()), ("rank", pa.float64())]).empty_table())
    deg = edges.groupby("u").aggregate(Count(alias_name="deg"))
    edges = edges.join(deg, join_type="inner", num_partitions=npart,
                       on=("u",)).materialize()
    n = deg.count()

    ranks = deg.map_batches(
        lambda t: pa.table({"u": t["u"],
                            "rank": pa.array([1.0 / n] * t.num_rows,
                                             pa.float64())}),
        batch_format="pyarrow").materialize()

    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = edges.join(ranks, join_type="inner",
                             num_partitions=npart, on=("u",))
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
