"""Graph-side analysis aggregates (SURVEY.md §2.7 A5/A9, §2.2 M20).

All are partial-aggregate patterns: per-batch null/field counters emit
one partial row per (registry) per batch, then a small groupby sums the
partials — the pre-aggregation shape that keeps the shuffle tiny at any
corpus size (analyze_deduplication.py:183-207; id_standardization.py:
208-247 in /root/reference)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FIELDS = ["description", "author", "repository", "homepage", "version",
           "license", "implementation_language"]


def completeness_by_registry(nodes):
    """A5: per-registry field-presence counts (percentages derivable)."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        import collections
        regs = t["registry_source"].to_pylist()
        counters: dict[str, collections.Counter] = {}
        totals: collections.Counter = collections.Counter()
        for i, reg in enumerate(regs):
            totals[reg] += 1
        cols = {f: t[f].to_pylist() for f in _FIELDS}
        for f in _FIELDS:
            for i, reg in enumerate(regs):
                if cols[f][i]:
                    counters.setdefault(f, collections.Counter())[reg] += 1
        out_rows = []
        for reg in totals:
            row = {"registry_source": reg, "n_rows": totals[reg]}
            for f in _FIELDS:
                row[f"n_{f}"] = counters.get(f, {}).get(reg, 0)
            out_rows.append(row)
        schema = pa.schema([("registry_source", pa.string()),
                            ("n_rows", pa.int64())] +
                           [(f"n_{f}", pa.int64()) for f in _FIELDS])
        return pa.table({n: [r.get(n, 0) for r in out_rows]
                         for n in schema.names}, schema=schema)

    partial = nodes.map_batches(partials, batch_format="pyarrow")
    aggs = [Sum("n_rows", alias_name="n_rows")] + \
        [Sum(f"n_{f}", alias_name=f"n_{f}") for f in _FIELDS]
    return partial.groupby("registry_source").aggregate(*aggs)


def id_tier_histogram(nodes):
    """M20: global-id shape analysis — per-tier count plus 3 example ids
    (the reference prints 3 examples per tier,
    /root/reference/src/id_standardization.py:208-247). Partial rows per
    batch (count + 3 smallest ids) keep the shuffle at tiers×batches."""
    _SCHEMA = pa.schema([("gid_tier", pa.int32()), ("n", pa.int64()),
                         ("examples", pa.string())])

    def partials(t: pa.Table) -> pa.Table:
        by_tier: dict[int, list] = {}
        for tier, nid in zip(t["gid_tier"].to_pylist(), t["id"].to_pylist()):
            by_tier.setdefault(tier, []).append(nid)
        rows = [(tier, len(ids), ",".join(sorted(ids)[:3]))
                for tier, ids in sorted(by_tier.items())]
        return pa.table({"gid_tier": [r[0] for r in rows],
                         "n": [r[1] for r in rows],
                         "examples": [r[2] for r in rows]}, schema=_SCHEMA)

    def fold(t: pa.Table) -> pa.Table:
        tier = t["gid_tier"][0].as_py()
        n = sum(t["n"].to_pylist())
        ex = sorted({e for s in t["examples"].to_pylist()
                     for e in s.split(",") if e})[:3]
        return pa.table({"gid_tier": [tier], "n": [n],
                         "examples": [",".join(ex)]}, schema=_SCHEMA)

    return (nodes.select_columns(["gid_tier", "id"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("gid_tier").map_groups(fold, batch_format="pyarrow"))


def dedup_stats(pages, entities, nodes):
    """A4: input/entity/unique counts + dedup rate
    (/root/reference/src/deduplication.py:90-114, main.py:140-143).
    Counts are Dataset.count() — O(1) on materialized inputs."""
    import ray.data as rd

    n_pages = pages.count()
    n_entities = entities.count()
    n_nodes = nodes.count()
    removed = n_entities - n_nodes
    t = pa.table({
        "n_pages": pa.array([n_pages], pa.int64()),
        "n_entities": pa.array([n_entities], pa.int64()),
        "n_unique": pa.array([n_nodes], pa.int64()),
        "n_removed": pa.array([removed], pa.int64()),
        "dedup_rate_pct": pa.array(
            [round(removed / n_entities * 100, 1) if n_entities else 0.0],
            pa.float64()),
    })
    return rd.from_arrow(t)


def sample_per_registry(nodes, n: int = 10):
    """O5 (/root/reference/src/run_sample_deduplication.py:23-68):
    first n records per registry — "first" in canonical order so the
    sample is deterministic across runs and block layouts."""
    def head_n(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401
        from ..arrowutil import sort_canonical
        recs = sort_canonical(t.to_pylist())[:n]
        return pa.Table.from_pylist(recs, schema=t.schema)

    return (nodes.select_columns(["id", "name", "registry_source",
                                  "reg_prio", "warc_ts", "source_url"])
            .groupby("registry_source")
            .map_groups(head_n, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Cross-table constraint audit (data-quality gate)


def audit_constraints(sf_dir: str, num_partitions: int | None = None):
    """One-pass data-quality gate over the warehouse: per named
    constraint, how many rows violate it — the validation stage a
    pipeline runs before promoting a snapshot. Covers the three
    violation classes: row-local predicates (negative price, null
    text, unknown event type) as map-only per-batch counters;
    referential integrity (orders → customer) via the size-gated dim
    attach (count null marker rows); and fact-fact referential
    integrity (lineitem → orders) as a distinct-key left-outer join
    whose left side ships batch-deduped keys only. Every branch
    collapses to (constraint, n) partials before one vocabulary-sized
    groupby — a full audit costs one read per table plus thin keyed
    exchanges, never a row-for-row copy.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import attach_dim

    del num_partitions   # no Dataset joins on this path (see below)

    out_schema = pa.schema([("constraint", pa.string()),
                            ("n_violations", pa.int64())])

    def one(name: str, n: int) -> pa.Table:
        return pa.table({"constraint": pa.array([name], pa.string()),
                         "n_violations": pa.array([n], pa.int64())},
                        schema=out_schema)

    # -- row-local predicates (map-only) --------------------------------
    def part_neg(t: pa.Table) -> pa.Table:
        price = t["p_retailprice"].to_numpy(zero_copy_only=False)
        return one("part_negative_price", int((price < 0).sum()))

    def doc_null(t: pa.Table) -> pa.Table:
        nulls = pc.sum(pc.cast(pc.or_(
            pc.is_null(t["text"]),
            pc.equal(pc.fill_null(t["text"], ""), "")), pa.int64())).as_py()
        return one("documents_empty_text", int(nulls or 0))

    allowed = pa.array(["view", "click", "purchase", "error", "signup",
                        "logout", "login", "scroll", "search", "share"])

    def event_type(t: pa.Table) -> pa.Table:
        bad = pc.sum(pc.cast(pc.invert(pc.is_in(
            t["event_type"], value_set=allowed)), pa.int64())).as_py()
        return one("events_unknown_type", int(bad or 0))

    parts = (rd.read_parquet(f"{sf_dir}/part.parquet",
                             columns=["p_retailprice"])
             .map_batches(part_neg, batch_format="pyarrow"))
    docs = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["text"])
            .map_batches(doc_null, batch_format="pyarrow"))
    events = (rd.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["event_type"])
              .map_batches(event_type, batch_format="pyarrow"))

    # -- referential: orders → customer (size-gated dim attach) ---------
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    cust_m = cust.map_batches(
        lambda t: pa.table({"c_custkey": t["c_custkey"].cast(pa.int64()),
                            "__m": pa.array(
                                np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
    o_att = attach_dim(orders, cust_m, "o_custkey", "c_custkey", ["__m"])
    orphan_orders = o_att.map_batches(
        lambda t: one("orders_orphan_custkey",
                      int(pc.sum(pc.cast(pc.is_null(t["__m"]),
                                         pa.int64())).as_py() or 0)),
        batch_format="pyarrow")

    # -- referential: lineitem → orders (marker-union groupby — a
    # Dataset join would hand Ray 2.49's hash-join aggregator
    # empty-bundle partitions on sparse inputs, same caveat as
    # ops/graph.parts_bfs_hops) ------------------------------------
    key_schema = pa.schema([("key", pa.int64()), ("n_li", pa.int64()),
                            ("is_order", pa.int64())])
    li_rows = (rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey"])
               .map_batches(
                   lambda t: pa.table({
                       "key": (g := t.group_by("l_orderkey").aggregate(
                           [([], "count_all")]))["l_orderkey"]
                       .cast(pa.int64()),
                       "n_li": g["count_all"].cast(pa.int64()),
                       "is_order": pa.array(
                           np.zeros(g.num_rows, np.int64))},
                       schema=key_schema),
                   batch_format="pyarrow"))
    ok_rows = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey"])
               .map_batches(
                   lambda t: pa.table({
                       "key": t["o_orderkey"].cast(pa.int64()),
                       "n_li": pa.array(np.zeros(t.num_rows, np.int64)),
                       "is_order": pa.array(
                           np.ones(t.num_rows, np.int64))},
                       schema=key_schema),
                   batch_format="pyarrow"))

    def orphan_group(g: pa.Table) -> pa.Table:
        if pc.max(g["is_order"]).as_py() == 1:
            return out_schema.empty_table()
        return one("lineitem_orphan_orderkey",
                   int(pc.sum(g["n_li"]).as_py()))

    # a seed zero row keeps the constraint present on a clean corpus
    seed = rd.from_arrow(one("lineitem_orphan_orderkey", 0))
    orphan_li = (li_rows.union(ok_rows).groupby("key")
                 .map_groups(orphan_group, batch_format="pyarrow")
                 .union(seed))

    return (parts.union(docs, events, orphan_orders, orphan_li)
            .groupby("constraint")
            .aggregate(Sum("n_violations", alias_name="n_violations")))


AUDIT_ORACLE_SQL = """
SELECT 'part_negative_price' AS constraint,
       CAST(count(*) FILTER (p_retailprice < 0) AS BIGINT) AS n_violations
FROM part
UNION ALL
SELECT 'documents_empty_text',
       count(*) FILTER (text IS NULL OR text = '') FROM documents
UNION ALL
SELECT 'events_unknown_type',
       count(*) FILTER (event_type NOT IN
         ('view','click','purchase','error','signup','logout','login',
          'scroll','search','share')) FROM events
UNION ALL
SELECT 'orders_orphan_custkey',
       count(*) FILTER (c.c_custkey IS NULL)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       count(*) FILTER (o.o_orderkey IS NULL)
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
""".strip()
