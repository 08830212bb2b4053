"""Fact-fact joins and distinct-count aggregates (SURVEY.md §2.8-2.9).

The dimension joins in ops/relational.py go through the size-gated
broadcast/attach policy because one side is small. The operators here
are the other shape: BOTH sides grow with the corpus (orders and
lineitem both scale linearly with SF; at 100 TB neither fits a
broadcast), so they use Ray Data's native hash shuffle join
(``Dataset.join``) — each side is hash-partitioned on the key into
``num_partitions`` aggregators, so the exchange moves every row exactly
once and no task ever holds more than one partition of each side.

Design rules shared with ops/relational.py:
  * prune at the read and FILTER BEFORE THE SHUFFLE — the join only
    ever exchanges rows that survive their per-table predicates;
  * money is exact integer arithmetic (price-cents × (100 −
    discount-pct)) so value-hashes cannot drift on float sum order;
  * pre-aggregate per batch after the join, then a small groupby;
  * semi-joins ship DISTINCT KEYS, never payload rows: a per-batch
    local distinct shrinks the exchange before the global distinct.

Partition sizing: ``num_partitions`` defaults to a size-aware count
(~64 MB of input file bytes per aggregator partition, capped at the
CPU-proportional block count — see ``_npartitions``). At 100 TB pass it
explicitly: (left_bytes + right_bytes) / target partition size; the
hash join's memory high-water mark per aggregator is
(left_bytes + right_bytes) / num_partitions.
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Q3-flavored constants (arbitrary but pinned: both the Ray op and the
# SQL oracle below must agree).
SEGMENT = "BUILDING"
CUTOFF = datetime.datetime(1998, 7, 1)

_PRIORITY_COUNT_SCHEMA = pa.schema([("o_orderpriority", pa.string()),
                                    ("n_orders", pa.int64())])


def _npartitions(override: int | None = None, *paths: str) -> int:
    """Hash-join partition count: explicit override, else sized from
    the INPUT FILE BYTES (~64 MB of input per aggregator partition,
    floor 2) up to the CPU-proportional cap. Partition count drives how
    many shuffle-aggregator actors spawn — measured at sf0.1 (13 MB of
    input): 32 partitions = 6.6-9.5 s, 8 partitions = 3.8-4.0 s; the
    actor spin-up dominates tiny joins. At 100 TB pass num_partitions
    explicitly: (left+right bytes) / target partition size."""
    if override is not None:
        return override
    from ..rayutil import default_nblocks
    cap = default_nblocks()
    if paths:
        import os
        nbytes = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
        return max(2, min(cap, nbytes // (64 << 20) + 1))
    return cap


def _rev_cents(t: pa.Table, price: str = "l_extendedprice",
               disc: str = "l_discount"):
    """Exact integer revenue: round(price·100) × (100 − round(disc·100))."""
    import numpy as np
    price_c = np.rint(
        t[price].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
    disc_pct = np.rint(
        t[disc].to_numpy(zero_copy_only=False) * 100).astype(np.int64)
    return pa.array(price_c * (100 - disc_pct), pa.int64())


def order_revenue_topk(sf_dir: str, k: int = 10,
                       num_partitions: int | None = None,
                       broadcast_threshold: int | None = None):
    """TPC-H-Q3-flavored shipping-priority query: top-k unshipped orders
    by revenue for one market segment.

    Shape: customer segment attaches to orders through the size-gated
    dim policy (stages/labeljoin.attach_dim), then orders ⋈ lineitem —
    two fact tables — runs as a hash shuffle join on the order key with
    both sides pre-filtered (o_orderdate < cutoff, l_shipdate > cutoff:
    the filters drop ~½ and ~¾ of the rows BEFORE the exchange). The
    joined stream pre-aggregates revenue per (orderkey, orderdate)
    inside each batch, a small groupby sums the partials, and top-k is
    per-block (sort+head k inside each block) before one tiny final
    sort — no global sort of the full aggregate.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayutil import parquet_num_rows
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders", "customer")) == 0:
        return rd.from_arrow(pa.schema(
            [("l_orderkey", pa.int64()), ("o_orderdate", pa.timestamp("us")),
             ("revenue_u", pa.int64())]).empty_table())

    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet",
                         f"{sf_dir}/orders.parquet")
    cut = pa.scalar(CUTOFF, pa.timestamp("us"))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"].cast(pa.timestamp("us")),
                                   cut)),
        batch_format="pyarrow")
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    orders = attach_dim(orders, cust, "o_custkey", "c_custkey",
                        ["c_mktsegment"], broadcast_threshold=bt)
    orders = orders.map_batches(
        lambda t: t.filter(pc.equal(t["c_mktsegment"], SEGMENT))
                   .select(["o_orderkey", "o_orderdate"]),
        batch_format="pyarrow")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    li = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_shipdate"].cast(pa.timestamp("us")),
                                      cut))
                   .select(["l_orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")

    joined = li.join(orders, join_type="inner", num_partitions=npart,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "o_orderdate": pa.array([], pa.timestamp("us")),
                             "revenue_u": pa.array([], pa.int64())})
        part = (pa.table({
            "l_orderkey": t["l_orderkey"],
            "o_orderdate": t["o_orderdate"].cast(pa.timestamp("us")),
            "rev": _rev_cents(t),
        }).group_by(["l_orderkey", "o_orderdate"]).aggregate([("rev", "sum")]))
        return part.rename_columns(["l_orderkey", "o_orderdate", "revenue_u"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_orderkey", "o_orderdate"])
           .aggregate(Sum("revenue_u", alias_name="revenue_u")))

    def block_topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("revenue_u", "descending"),
                          ("l_orderkey", "ascending")])
        return t.take(order[:k])

    return (agg.map_batches(block_topk, batch_format="pyarrow")
            .sort(["revenue_u", "l_orderkey"], descending=[True, False])
            .limit(k))


ORDER_REVENUE_ORACLE_SQL = """
SELECT l.l_orderkey, o.o_orderdate,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_u
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-07-01'
  AND l.l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue_u DESC, l.l_orderkey
LIMIT 10
""".strip()


def orders_with_returns(sf_dir: str, num_partitions: int | None = None):
    """TPC-H-Q4-flavored fact-fact SEMI-join: orders per priority that
    have at least one returned lineitem (l_returnflag = 'R').

    The semi side never ships payload: lineitem collapses to DISTINCT
    l_orderkey in two stages (per-batch local distinct — a free ~6→1
    shrink since an order has several lineitems — then a keys-only
    groupby), and the distinct-key table hash-joins orders. The join
    output carries o_orderpriority only; a count groupby finishes.
    """
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..rayutil import parquet_num_rows

    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders")) == 0:
        return rd.from_arrow(_PRIORITY_COUNT_SCHEMA.empty_table())
    joined = _orders_joined_returned_keys(sf_dir, "inner", num_partitions)
    if joined is None:  # no returned lineitems at all → empty semi
        return rd.from_arrow(_PRIORITY_COUNT_SCHEMA.empty_table())
    return (joined.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n_orders")))


def _returned_orderkeys(sf_dir: str):
    """DISTINCT l_orderkey of returned lineitems, shrunk in two stages:
    per-batch local distinct (a free ~6→1 since an order has several
    lineitems), then a keys-only groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_returnflag"])

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        return (t.select(["l_orderkey"])
                .group_by(["l_orderkey"]).aggregate([]))

    # keep the count column as a non-null match marker: the hash join
    # coalesces the key columns, so a key-only right side would leave
    # left-outer unmatched rows indistinguishable
    return (li.map_batches(local_distinct, batch_format="pyarrow")
            .groupby("l_orderkey").aggregate(Count(alias_name="__c")))


def _orders_joined_returned_keys(sf_dir: str, join_type: str,
                                 num_partitions: int | None):
    """Returns None when the key set is EMPTY (predicate matched no
    lineitem): an all-empty aggregate output carries no schema and
    Ray's hash join cannot digest it. The key set is materialized —
    bounded by distinct matching orders, the same volume the join
    aggregators would hold — so emptiness costs one count."""
    import ray.data as rd

    keys = _returned_orderkeys(sf_dir).materialize()
    if keys.count() == 0:
        return None
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    # orders LEFT, keys RIGHT: left_outer keeps key-less orders (the
    # anti side); inner is the semi side
    return orders.join(keys, join_type=join_type,
                       num_partitions=_npartitions(
                           num_partitions, f"{sf_dir}/orders.parquet",
                           f"{sf_dir}/lineitem.parquet"),
                       on=("o_orderkey",), right_on=("l_orderkey",))


ORDERS_WITH_RETURNS_ORACLE_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderkey IN
      (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY o_orderpriority
""".strip()


def orders_without_returns(sf_dir: str, num_partitions: int | None = None):
    """Fact-fact ANTI-join: orders per priority with ZERO returned
    lineitems — a left-outer hash join against the distinct returned
    keys, keeping the null (unmatched) side. Same distinct-keys-only
    exchange as the semi-join; the anti semantics cost one extra
    null-filter map."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..rayutil import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/orders.parquet") == 0:
        return rd.from_arrow(_PRIORITY_COUNT_SCHEMA.empty_table())
    def _all_orders():
        # anti-join of an empty key set keeps EVERY order — no join
        orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_orderpriority"])
        return (orders.groupby("o_orderpriority")
                .aggregate(Count(alias_name="n_orders")))

    if parquet_num_rows(f"{sf_dir}/lineitem.parquet") == 0:
        return _all_orders()
    joined = _orders_joined_returned_keys(sf_dir, "left_outer",
                                          num_partitions)
    if joined is None:  # predicate matched no lineitem
        return _all_orders()
    unmatched = joined.map_batches(
        lambda t: t.filter(pc.is_null(t["__c"]))
                   .select(["o_orderpriority"]),
        batch_format="pyarrow")
    return (unmatched.groupby("o_orderpriority")
            .aggregate(Count(alias_name="n_orders")))


ORDERS_WITHOUT_RETURNS_ORACLE_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderkey NOT IN
      (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
GROUP BY o_orderpriority
""".strip()


def events_lead_lag(sf_dir: str):
    """LAG/LEAD window: per-user gap to the previous and next event in
    (ts, event_id) order, as exact integer microseconds. One
    groupby(user) shuffle; the per-group kernel is a numpy sort + two
    shifted subtractions (no Python per row). Boundary rows carry NULL,
    matching the SQL window functions.
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("event_id", pa.int64()),
                            ("prev_gap_us", pa.int64()),
                            ("next_gap_us", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                              ("event_id", "ascending")])
        t = t.take(order)
        us = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        n = len(us)
        prev = np.empty(n, dtype=np.int64)
        nxt = np.empty(n, dtype=np.int64)
        prev[1:] = us[1:] - us[:-1]
        nxt[:-1] = us[1:] - us[:-1]
        pmask = np.zeros(n, dtype=bool)
        nmask = np.zeros(n, dtype=bool)
        if n:
            pmask[0] = True
            nmask[-1] = True
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "prev_gap_us": pa.array(prev, pa.int64(), mask=pmask),
            "next_gap_us": pa.array(nxt, pa.int64(), mask=nmask),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


LEAD_LAG_ORACLE_SQL = """
SELECT user_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER w AS prev_gap_us,
       lead(epoch_us(ts)) OVER w - epoch_us(ts) AS next_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""".strip()


def events_distinct_users(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type via the two-level shrink:
    per-batch local distinct pairs (map-side combiner), one global
    pair-distinct groupby, then per-batch partial counts into a
    few-group sum. The only exchange proportional to data is the pair
    distinct, and its input is already batch-deduped — never one row
    per event.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def local_pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"]).aggregate([])

    pairs = (ev.map_batches(local_pairs, batch_format="pyarrow")
             .groupby(["event_type", "user_id"])
             .aggregate(Count(alias_name="__c")))

    def partial_count(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g["event_type"],
                         "n": g["count_all"].cast(pa.int64())})

    return (pairs.map_batches(partial_count, batch_format="pyarrow")
            .groupby("event_type").aggregate(Sum("n", alias_name="n_users")))


DISTINCT_USERS_ORACLE_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""".strip()


# ---------------------------------------------------------------------------
# Q10-flavored: top customers by returned revenue (fact ⋈ fact ⋈ dim)

RETURN_TOPK = 10


def top_return_customers(sf_dir: str, k: int = RETURN_TOPK,
                         num_partitions: int | None = None,
                         broadcast_threshold: int | None = None):
    """TPC-H-Q10-flavored: the k customers who returned the most
    revenue. Three-table shape exercising both join policies in one
    pipeline: lineitem (pre-filtered to l_returnflag='R' BEFORE the
    exchange, ~¼ of rows) ⋈ orders runs as the hash shuffle join —
    both sides scale with the corpus — then the per-customer revenue
    aggregate (one small row per custkey) attaches c_name through the
    size-gated dim policy, so a scale-factor-grown customer table
    falls back to the partitioned join instead of a driver broadcast.
    Revenue is exact integer units; top-k is per-block then one tiny
    final sort, never a global sort of the aggregate.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayutil import parquet_num_rows
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("c_name", pa.string()),
                            ("revenue_u", pa.int64())])
    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders", "customer")) == 0:
        return rd.from_arrow(out_schema.empty_table())

    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet",
                         f"{sf_dir}/orders.parquet")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_extendedprice",
                                  "l_discount", "l_returnflag"])

    def returned_rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        part = (pa.table({"l_orderkey": t["l_orderkey"],
                          "rev": _rev_cents(t)})
                .group_by("l_orderkey").aggregate([("rev", "sum")]))
        return part.rename_columns(["l_orderkey", "rev"])

    li = li.map_batches(returned_rev, batch_format="pyarrow")
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    joined = li.join(orders, join_type="inner", num_partitions=npart,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def per_cust(t: pa.Table) -> pa.Table:
        part = (t.select(["o_custkey", "rev"])
                .group_by("o_custkey").aggregate([("rev", "sum")]))
        return part.rename_columns(["c_custkey", "revenue_u"])

    agg = (joined.map_batches(per_cust, batch_format="pyarrow")
           .groupby("c_custkey")
           .aggregate(Sum("revenue_u", alias_name="revenue_u")))

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    agg = attach_dim(agg, cust, "c_custkey", "c_custkey", ["c_name"],
                     broadcast_threshold=bt)

    def block_topk(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[("revenue_u", "descending"),
                          ("c_custkey", "ascending")])
        return t.take(order[:k]).select(
            ["c_custkey", "c_name", "revenue_u"])

    return (agg.map_batches(block_topk, batch_format="pyarrow")
            .sort(["revenue_u", "c_custkey"], descending=[True, False])
            .limit(k))


RETURN_CUSTOMERS_ORACLE_SQL = f"""
SELECT o.o_custkey AS c_custkey, c.c_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_u
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY revenue_u DESC, c_custkey
LIMIT {RETURN_TOPK}
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: LEFT-OUTER join distribution (zero-order customers)


def customer_order_dist(sf_dir: str, num_partitions: int | None = None):
    """Customer distribution by order count INCLUDING zero-order
    customers — the Q13 shape whose whole point is the left-outer join
    (an inner join silently drops the c_count=0 bucket, usually the
    biggest one). Orders pre-shrink to (custkey, n) per-key counts
    before the join, so the exchange carries one row per ordering
    customer, and the unmatched-null marker maps to 0 before the final
    tiny groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ..rayutil import parquet_num_rows

    out_schema = pa.schema([("c_count", pa.int64()),
                            ("custdist", pa.int64())])
    if parquet_num_rows(f"{sf_dir}/customer.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    if parquet_num_rows(f"{sf_dir}/orders.parquet") == 0:
        return (cust.map_batches(
            lambda t: pa.table({"c_count": pa.array(
                np.zeros(t.num_rows, np.int64))}),
            batch_format="pyarrow")
            .groupby("c_count").aggregate(Count(alias_name="custdist")))

    counts = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey"])
              .groupby("o_custkey").aggregate(Count(alias_name="n")))
    j = cust.join(counts, join_type="left_outer",
                  num_partitions=_npartitions(
                      num_partitions, f"{sf_dir}/customer.parquet",
                      f"{sf_dir}/orders.parquet"),
                  on=("c_custkey",), right_on=("o_custkey",))

    def fill(t: pa.Table) -> pa.Table:
        return pa.table({"c_count": pc.fill_null(t["n"], 0)
                         .cast(pa.int64())})

    return (j.map_batches(fill, batch_format="pyarrow")
            .groupby("c_count").aggregate(Count(alias_name="custdist")))


Q13_ORACLE_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey)
GROUP BY c_count
""".strip()


# ---------------------------------------------------------------------------
# Lakehouse merge-into (upsert, latest version wins)

CDC_SCHEMA = pa.schema([("doc_id", pa.int64()),
                        ("version", pa.int64()),
                        ("fp", pa.string())])


def _cdc_base_rows(t: pa.Table) -> pa.Table:
    """Version-1 CDC row per document (md5 fingerprint, never text)."""
    import hashlib

    return pa.table({
        "doc_id": t["doc_id"].cast(pa.int64()),
        "version": pa.array(np.ones(t.num_rows, np.int64)),
        "fp": pa.array([hashlib.md5((x or "").encode()).hexdigest()
                        for x in t["text"].to_pylist()], pa.string()),
    }, schema=CDC_SCHEMA)


def _cdc_delta_rows(t: pa.Table) -> pa.Table:
    """The deterministic version-2 delta: doc_id % 10 == 3 arrives
    updated ('UPD ' prefix) and doc_id % 25 == 0 spawns a new row at
    doc_id + 1,000,000 ('NEW ' prefix)."""
    import hashlib

    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t["text"].to_pylist()
    out_i, out_f = [], []
    for d, x in zip(ids, texts):
        if d % 10 == 3:
            out_i.append(int(d))
            out_f.append(hashlib.md5(
                ("UPD " + (x or "")).encode()).hexdigest())
        if d % 25 == 0:
            out_i.append(int(d) + 1_000_000)
            out_f.append(hashlib.md5(
                ("NEW " + (x or "")).encode()).hexdigest())
    return pa.table({
        "doc_id": pa.array(out_i, pa.int64()),
        "version": pa.array(np.full(len(out_i), 2, np.int64)),
        "fp": pa.array(out_f, pa.string()),
    }, schema=CDC_SCHEMA)


def documents_upsert(sf_dir: str, num_partitions: int | None = None):
    """MERGE INTO / upsert: apply a CDC delta to the documents table,
    latest version wins per key. The delta is derived deterministically
    from the corpus so the op is self-contained: every doc_id % 10 == 3
    arrives updated ('UPD ' prefix, version 2) and every
    doc_id % 25 == 0 spawns a brand-new row at doc_id + 1_000_000
    ('NEW ' prefix, version 2); everything else stays version 1.

    Shape: base ∪ delta streams into ONE groupby(doc_id).Max(version),
    then the winners attach back by an equi-join on the composite
    (doc_id, version) — the argmax-join-back that replaces a
    per-group Python kernel with two vectorized keyed exchanges.
    Output carries md5 fingerprints, not text, so the compare is thin.
    """
    import ray.data as rd
    from ray.data.aggregate import Max

    from ..rayutil import parquet_num_rows

    out_schema = CDC_SCHEMA
    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    base = docs.map_batches(_cdc_base_rows, batch_format="pyarrow")
    delta = docs.map_batches(_cdc_delta_rows, batch_format="pyarrow")
    merged = base.union(delta)

    winners = (merged.select_columns(["doc_id", "version"])
               .groupby("doc_id").aggregate(Max("version",
                                                alias_name="version")))
    # both winner columns are join keys; a key-only side coalesces away
    # in Ray 2.49's hash join, so ride a constant marker along
    winners = winners.map_batches(
        lambda t: t.append_column("__w", pa.array(
            np.ones(t.num_rows, np.int8))),
        batch_format="pyarrow")
    npart = _npartitions(num_partitions, f"{sf_dir}/documents.parquet")
    j = merged.join(winners, join_type="inner", num_partitions=npart,
                    on=("doc_id", "version"))
    return j.map_batches(lambda t: t.select(["doc_id", "version", "fp"]),
                         batch_format="pyarrow")


UPSERT_ORACLE_SQL = """
WITH base AS (
  SELECT doc_id, 1 AS version, md5(coalesce(text, '')) AS fp
  FROM documents),
delta AS (
  SELECT doc_id, 2 AS version, md5('UPD ' || coalesce(text, '')) AS fp
  FROM documents WHERE doc_id % 10 = 3
  UNION ALL
  SELECT doc_id + 1000000, 2, md5('NEW ' || coalesce(text, ''))
  FROM documents WHERE doc_id % 25 = 0),
m AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
w AS (SELECT doc_id, max(version) AS version FROM m GROUP BY doc_id)
SELECT m.doc_id, CAST(m.version AS BIGINT) AS version, m.fp
FROM m JOIN w ON m.doc_id = w.doc_id AND m.version = w.version
""".strip()


# ---------------------------------------------------------------------------
# SCD Type-2 dimension build (validity intervals from CDC versions)

SCD2_SCHEMA = pa.schema([("doc_id", pa.int64()), ("version", pa.int64()),
                         ("fp", pa.string()), ("valid_to", pa.int64()),
                         ("is_current", pa.int64())])

SCD2_EXCHANGE_MAX = 500_000_000   # direct-task exchange row gate (r4 sizing)


def _scd2_kernel(t: pa.Table) -> pa.Table:
    """Vectorized multi-group SCD2 kernel: works on any table where
    complete doc_id groups are present (one reduce slice of the direct
    exchange, or a single group under the groupby fallback). One
    lexsort by (doc_id, version); each row's valid_to is the NEXT
    version inside its doc run (-1 on the run's last = current row)."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    ver = t["version"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ver, ids))
    ids_s, ver_s = ids[order], ver[order]
    n = len(ids_s)
    same_next = np.empty(n, dtype=bool)
    if n:
        same_next[:-1] = ids_s[1:] == ids_s[:-1]
        same_next[-1] = False
    valid_to = np.where(same_next, np.r_[ver_s[1:], np.int64(-1)],
                        np.int64(-1))
    return pa.table({
        "doc_id": pa.array(ids_s, pa.int64()),
        "version": pa.array(ver_s, pa.int64()),
        "fp": t["fp"].take(pa.array(order)).combine_chunks(),
        "valid_to": pa.array(valid_to, pa.int64()),
        "is_current": pa.array((valid_to == -1).astype(np.int64)),
    }, schema=SCD2_SCHEMA)


def documents_scd2(sf_dir: str,
                   exchange_max_rows: int = SCD2_EXCHANGE_MAX):
    """SCD Type-2 dimension build: the same deterministic CDC stream as
    ``documents_upsert`` (base v1 ∪ delta v2), but instead of keeping
    only the latest version, EVERY version becomes a row with its
    validity interval — ``valid_to`` = the superseding version (-1 if
    still current) and an ``is_current`` flag. The warehouse
    slowly-changing-dimension shape.

    Dataflow: one keyed exchange on doc_id. Below the row gate it is
    the direct-task M×R exchange with the vectorized multi-group
    kernel (one lexsort per reduce slice, run-boundary lead); above
    the gate the identical kernel runs per group under
    ``groupby().map_groups`` — the unconditionally scalable shape.
    Both paths are forced in tests. Fingerprints, never text, cross
    the exchange.
    """
    import ray.data as rd

    from ..rayutil import parquet_num_rows
    from ..stages.exchange import exchange_reduce

    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(SCD2_SCHEMA.empty_table())

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    merged = (docs.map_batches(_cdc_base_rows, batch_format="pyarrow")
              .union(docs.map_batches(_cdc_delta_rows,
                                      batch_format="pyarrow"))
              .materialize())
    if merged.count() <= exchange_max_rows:
        return exchange_reduce(merged, "doc_id", _scd2_kernel, SCD2_SCHEMA)
    return (merged.groupby("doc_id")
            .map_groups(_scd2_kernel, batch_format="pyarrow"))


SCD2_ORACLE_SQL = """
WITH base AS (
  SELECT doc_id, 1 AS version, md5(coalesce(text, '')) AS fp
  FROM documents),
delta AS (
  SELECT doc_id, 2 AS version, md5('UPD ' || coalesce(text, '')) AS fp
  FROM documents WHERE doc_id % 10 = 3
  UNION ALL
  SELECT doc_id + 1000000, 2, md5('NEW ' || coalesce(text, ''))
  FROM documents WHERE doc_id % 25 = 0),
m AS (SELECT * FROM base UNION ALL SELECT * FROM delta)
SELECT doc_id, CAST(version AS BIGINT) AS version, fp,
       CAST(coalesce(lead(version) OVER w, -1) AS BIGINT) AS valid_to,
       CAST(CASE WHEN lead(version) OVER w IS NULL
                 THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM m
WINDOW w AS (PARTITION BY doc_id ORDER BY version)
""".strip()


# ---------------------------------------------------------------------------
# Snapshot diff (added / removed / changed / same between corpus versions)

DIFF_MUT_MOD = 7       # doc_id % 7 == 0  → text mutated in v2
DIFF_DROP_MOD = 11     # doc_id % 11 == 0 → dropped from v2
DIFF_ADD_MOD = 13      # doc_id % 13 == 0 → a NEW v2 doc (+1,000,000 id)
DIFF_ADD_BASE = 1_000_000


def _diff_fp(text: str) -> int:
    import hashlib

    # 60-bit positive fingerprint — int64-safe, and the oracle rebuilds
    # it with a hex-cast md5 substring
    return int(hashlib.md5((text or "").encode()).hexdigest()[:15], 16)


def documents_snapshot_diff(sf_dir: str):
    """Incremental-ingest primitive: diff two corpus snapshots into
    (doc_id, status ∈ added/removed/changed/same). v2 is DERIVED
    deterministically from v1 (mutate ``% 7``, drop ``% 11``, add
    ``% 13`` under shifted ids — the pii_scrub planting pattern, so the
    op exercises every branch on any corpus and the oracle replays the
    derivation exactly). The compare is join-free and per-group-Python-
    free: both sides emit (doc_id, side, fp:int64) rows, ONE groupby
    aggregates count / min(fp) / max(fp) / max(side), and the status
    decodes from those four numbers vectorized — rows present once are
    added/removed by side, rows present twice are same/changed by
    fp equality. At 100 TB: one keyed exchange of 24-byte rows.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    from ..rayutil import parquet_num_rows

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("status", pa.string())])
    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def sides(t: pa.Table) -> pa.Table:
        ids_out, side_out, fp_out = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(),
                                t["text"].to_pylist()):
            text = text or ""
            ids_out.append(doc_id)
            side_out.append(1)
            fp_out.append(_diff_fp(text))
            if doc_id % DIFF_DROP_MOD != 0:          # survives into v2
                v2_text = (text + " v2" if doc_id % DIFF_MUT_MOD == 0
                           else text)
                ids_out.append(doc_id)
                side_out.append(2)
                fp_out.append(_diff_fp(v2_text))
            if doc_id % DIFF_ADD_MOD == 0:           # brand-new v2 doc
                ids_out.append(DIFF_ADD_BASE + doc_id)
                side_out.append(2)
                fp_out.append(_diff_fp(f"new doc {doc_id}"))
        return pa.table({"doc_id": pa.array(ids_out, pa.int64()),
                         "side": pa.array(side_out, pa.int64()),
                         "fp": pa.array(fp_out, pa.int64())})

    agg = (docs.map_batches(sides, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Count(alias_name="n"),
                      Max("side", alias_name="mx_side"),
                      Min("fp", alias_name="mn_fp"),
                      Max("fp", alias_name="mx_fp")))

    def decode(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        mx_side = t["mx_side"].to_numpy(zero_copy_only=False)
        same = (t["mn_fp"].to_numpy(zero_copy_only=False)
                == t["mx_fp"].to_numpy(zero_copy_only=False))
        status = np.where(
            n == 2, np.where(same, "same", "changed"),
            np.where(mx_side == 1, "removed", "added"))
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "status": pa.array(status.tolist(), pa.string())},
                        schema=out_schema)

    return agg.map_batches(decode, batch_format="pyarrow")


SNAPSHOT_DIFF_ORACLE_SQL = f"""
WITH v1 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % {DIFF_MUT_MOD} = 0 THEN text || ' v2'
              ELSE text END AS text
  FROM v1 WHERE doc_id % {DIFF_DROP_MOD} <> 0
  UNION ALL
  SELECT doc_id + {DIFF_ADD_BASE}, 'new doc ' || CAST(doc_id AS VARCHAR)
  FROM v1 WHERE doc_id % {DIFF_ADD_MOD} = 0),
f1 AS (SELECT doc_id,
              ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp FROM v1),
f2 AS (SELECT doc_id,
              ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp FROM v2)
SELECT coalesce(f1.doc_id, f2.doc_id) AS doc_id,
       CASE WHEN f1.doc_id IS NULL THEN 'added'
            WHEN f2.doc_id IS NULL THEN 'removed'
            WHEN f1.fp = f2.fp THEN 'same'
            ELSE 'changed' END AS status
FROM f1 FULL OUTER JOIN f2 ON f1.doc_id = f2.doc_id
""".strip()


# ---------------------------------------------------------------------------
# TPC-H-flavored join shapes, batch 2: conditional-aggregate ratio over a
# dim attach (Q14), fact ⋈ its-own-aggregate (Q17), HAVING-groupby feeding
# a fact join (Q18), scalar-threshold + anti-join (Q22). Each exercises a
# join/aggregate composition the earlier family does not.

PROMO_YEAR_LO = datetime.datetime(1997, 1, 1)
PROMO_YEAR_HI = datetime.datetime(1998, 1, 1)
VOLUME_QTY_U = 150 * 100          # Q18 HAVING sum(l_quantity) > 150
URGENT = "1-URGENT"


def promo_revenue_share(sf_dir: str,
                        broadcast_threshold: int | None = None):
    """TPC-H-Q14-flavored promo revenue share: of 1997's shipped
    revenue, what fraction came from parts of type PROMO.

    Shape: lineitem is pruned and date-filtered BEFORE the part
    attach (p_type rides the size-gated ``attach_dim`` policy — part
    scales 200k×SF, so it broadcasts small and shuffles large); each
    batch then collapses to ONE partial row (promo_u, total_u), the
    two global sums reduce driver-side, and the share is exact
    integer micro-units (promo·10⁶ // total) so the single-row hash
    cannot drift on float division.
    """
    import ray.data as rd

    from ..rayutil import parquet_num_rows
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    out_schema = pa.schema([("promo_rev_u", pa.int64()),
                            ("total_rev_u", pa.int64()),
                            ("promo_share_micro", pa.int64())])
    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "part")) == 0:
        return rd.from_arrow(out_schema.empty_table())

    lo = pa.scalar(PROMO_YEAR_LO, pa.timestamp("us"))
    hi = pa.scalar(PROMO_YEAR_HI, pa.timestamp("us"))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])
    li = li.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"].cast(pa.timestamp("us")), lo),
            pc.less(t["l_shipdate"].cast(pa.timestamp("us")), hi)))
                   .select(["l_partkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    li = attach_dim(li, part, "l_partkey", "p_partkey", ["p_type"],
                    broadcast_threshold=bt)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"promo_u": pa.array([], pa.int64()),
                             "total_u": pa.array([], pa.int64())})
        rev = _rev_cents(t).to_numpy(zero_copy_only=False)
        promo = pc.equal(t["p_type"], "PROMO").to_numpy(
            zero_copy_only=False)
        return pa.table({
            "promo_u": pa.array([int(rev[promo].sum())], pa.int64()),
            "total_u": pa.array([int(rev.sum())], pa.int64())})

    sums = li.map_batches(partial, batch_format="pyarrow").sum(
        ["promo_u", "total_u"])
    if sums is None:  # the date filter matched nothing
        return rd.from_arrow(out_schema.empty_table())
    promo_u, total_u = int(sums["sum(promo_u)"]), int(sums["sum(total_u)"])
    share = promo_u * 1_000_000 // total_u if total_u else None
    return rd.from_arrow(pa.table({
        "promo_rev_u": pa.array([promo_u], pa.int64()),
        "total_rev_u": pa.array([total_u], pa.int64()),
        "promo_share_micro": pa.array([share], pa.int64())},
        schema=out_schema))


PROMO_SHARE_ORACLE_SQL = """
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01')
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT)
           AS promo_rev_u,
       CAST(sum(rev) AS BIGINT) AS total_rev_u,
       CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END)
           * 1000000 // sum(rev) AS BIGINT) AS promo_share_micro
FROM f WHERE EXISTS (SELECT 1 FROM f)
""".strip()


def small_qty_revenue(sf_dir: str, num_partitions: int | None = None):
    """TPC-H-Q17-flavored: revenue locked in lineitems whose quantity
    is below 20% of their part's average quantity.

    Shape: the fact joins ITS OWN aggregate — per-partkey
    (sum_qty_u, n) from one groupby (per-batch partials pre-shrink
    the exchange ~linecount/partcount-fold), hash-joined back to
    lineitem on l_partkey. The below-average predicate is exact
    integer cross-multiplication (5·qty_u·n < sum_qty_u — no float
    average), and the qualifying rows collapse to one global row
    (n_small, revenue_cents).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayutil import parquet_num_rows

    out_schema = pa.schema([("n_small", pa.int64()),
                            ("revenue_cents", pa.int64())])
    if parquet_num_rows(f"{sf_dir}/lineitem.parquet") == 0:
        return rd.from_arrow(pa.table(
            {"n_small": pa.array([0], pa.int64()),
             "revenue_cents": pa.array([0], pa.int64())},
            schema=out_schema))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def qty_partial(t: pa.Table) -> pa.Table:
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                      * 100).astype(np.int64)
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table({
            "l_partkey": pa.array(uniq, pa.int64()),
            "sq": pa.array(np.bincount(inv, weights=qty).astype(np.int64)),
            "nq": pa.array(np.bincount(inv).astype(np.int64))})

    stats = (li.map_batches(qty_partial, batch_format="pyarrow")
             .groupby("l_partkey")
             .aggregate(Sum("sq", alias_name="sq"),
                        Sum("nq", alias_name="nq")))
    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet")
    joined = li.join(stats, join_type="inner", num_partitions=npart,
                     on=("l_partkey",))

    def small_partial(t: pa.Table) -> pa.Table:
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                      * 100).astype(np.int64)
        price = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        sq = t["sq"].to_numpy(zero_copy_only=False)
        nq = t["nq"].to_numpy(zero_copy_only=False)
        keep = 5 * qty * nq < sq
        return pa.table({
            "n_small": pa.array([int(keep.sum())], pa.int64()),
            "revenue_cents": pa.array([int(price[keep].sum())],
                                      pa.int64())})

    sums = joined.map_batches(small_partial, batch_format="pyarrow").sum(
        ["n_small", "revenue_cents"])
    return rd.from_arrow(pa.table({
        "n_small": pa.array([int(sums["sum(n_small)"])], pa.int64()),
        "revenue_cents": pa.array([int(sums["sum(revenue_cents)"])],
                                  pa.int64())}, schema=out_schema))


SMALL_QTY_ORACLE_SQL = """
WITH s AS (
  SELECT l_partkey,
         sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sq,
         count(*) AS nq
  FROM lineitem GROUP BY l_partkey)
SELECT count(*) AS n_small,
       CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)), 0)
           AS BIGINT) AS revenue_cents
FROM lineitem JOIN s USING (l_partkey)
WHERE 5 * CAST(round(l_quantity * 100) AS BIGINT) * nq < sq
""".strip()


def large_volume_customers(sf_dir: str, num_partitions: int | None = None,
                           broadcast_threshold: int | None = None):
    """TPC-H-Q18-flavored large-volume orders: every order whose total
    quantity exceeds 150, with its customer.

    Shape: a HAVING-filtered groupby feeds a fact join — per-order
    quantity sums (per-batch partials first), filtered to the >150
    tail BEFORE the exchange with orders (the filter drops ~99% of
    groups, so the join ships only the tail), then c_name attaches
    through the size-gated dim policy (customer scales 150k×SF).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayutil import parquet_num_rows
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64()),
                            ("c_name", pa.string()),
                            ("o_orderdate", pa.timestamp("us")),
                            ("totalprice_cents", pa.int64()),
                            ("sum_qty_u", pa.int64())])
    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders", "customer")) == 0:
        return rd.from_arrow(out_schema.empty_table())

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                      * 100).astype(np.int64)
        keys = t["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uniq, pa.int64()),
            "sum_qty_u": pa.array(
                np.bincount(inv, weights=qty).astype(np.int64))})

    big = (li.map_batches(qty_partial, batch_format="pyarrow")
           .groupby("l_orderkey")
           .aggregate(Sum("sum_qty_u", alias_name="sum_qty_u"))
           .map_batches(
               lambda t: t.filter(pc.greater(t["sum_qty_u"],
                                             VOLUME_QTY_U)),
               batch_format="pyarrow")
           .materialize())
    if big.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_totalprice"])
    npart = _npartitions(num_partitions, f"{sf_dir}/orders.parquet",
                         f"{sf_dir}/lineitem.parquet")
    joined = orders.join(big, join_type="inner", num_partitions=npart,
                         on=("o_orderkey",), right_on=("l_orderkey",))
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    joined = attach_dim(joined, cust, "o_custkey", "c_custkey",
                        ["c_name"], broadcast_threshold=bt)

    def finish(t: pa.Table) -> pa.Table:
        cents = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_custkey": t["o_custkey"].cast(pa.int64()),
            "c_name": t["c_name"],
            "o_orderdate": t["o_orderdate"].cast(pa.timestamp("us")),
            "totalprice_cents": pa.array(cents, pa.int64()),
            "sum_qty_u": t["sum_qty_u"].cast(pa.int64())},
            schema=out_schema)

    return joined.map_batches(finish, batch_format="pyarrow")


LARGE_VOLUME_ORACLE_SQL = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS sum_qty_u
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 15000)
SELECT o_orderkey, o_custkey, c_name, o_orderdate,
       CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
       sum_qty_u
FROM orders
JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
""".strip()


def customers_no_urgent_orders(sf_dir: str,
                               num_partitions: int | None = None):
    """TPC-H-Q22-flavored sales opportunity: per nation, the count and
    total balance of customers whose balance is above the positive
    average yet who have never placed a 1-URGENT order.

    Shape: a global scalar threshold (positive-balance average as
    exact (sum_cents, n) — the comparison cross-multiplies, no float)
    plus an ANTI join — distinct urgent-order custkeys collapse in
    two stages (per-batch local distinct, then a keys-only groupby)
    and left-outer-join customer; unmatched (null-marker) rows above
    the threshold aggregate per nation. When the urgent key set is
    empty the join is skipped entirely — the anti side keeps everyone.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..rayutil import parquet_num_rows

    out_schema = pa.schema([("c_nationkey", pa.int64()),
                            ("n_cust", pa.int64()),
                            ("total_bal_cents", pa.int64())])
    if parquet_num_rows(f"{sf_dir}/customer.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey",
                                    "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        pos = cents > 0
        return pa.table({"s": pa.array([int(cents[pos].sum())], pa.int64()),
                         "n": pa.array([int(pos.sum())], pa.int64())})

    sums = cust.map_batches(bal_partial, batch_format="pyarrow").sum(
        ["s", "n"])
    s, n = int(sums["sum(s)"]), int(sums["sum(n)"])
    if n == 0:  # no positive balances → nobody clears the threshold
        return rd.from_arrow(out_schema.empty_table())

    def above(t: pa.Table) -> pa.Table:
        cents = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        keep = cents * n > s
        t = t.filter(pa.array(keep))
        return pa.table({
            "c_custkey": t["c_custkey"].cast(pa.int64()),
            "c_nationkey": t["c_nationkey"].cast(pa.int64()),
            "bal_cents": pa.array(cents[keep], pa.int64())})

    rich = cust.map_batches(above, batch_format="pyarrow")

    def urgent_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], URGENT))
        return (t.select(["o_custkey"])
                .group_by(["o_custkey"]).aggregate([]))

    keys = (rd.read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_orderpriority"])
            .map_batches(urgent_keys, batch_format="pyarrow")
            .groupby("o_custkey").aggregate(Count(alias_name="__c"))
            .materialize())
    if keys.count() > 0:
        npart = _npartitions(num_partitions,
                             f"{sf_dir}/customer.parquet",
                             f"{sf_dir}/orders.parquet")
        rich = (rich.join(keys, join_type="left_outer",
                          num_partitions=npart,
                          on=("c_custkey",), right_on=("o_custkey",))
                .map_batches(
                    lambda t: t.filter(pc.is_null(t["__c"])),
                    batch_format="pyarrow"))
    return (rich.map_batches(
                lambda t: t.select(["c_nationkey", "bal_cents"]),
                batch_format="pyarrow")
            .groupby("c_nationkey")
            .aggregate(Count(alias_name="n_cust"),
                       Sum("bal_cents", alias_name="total_bal_cents")))


NO_URGENT_ORACLE_SQL = """
WITH avgpos AS (
  SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s, count(*) AS n
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS n_cust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS total_bal_cents
FROM customer, avgpos
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s
  AND c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""".strip()


# Q15 quarter (pinned; Ray op and oracle must agree).
TOPSUPP_LO = datetime.datetime(1997, 1, 1)
TOPSUPP_HI = datetime.datetime(1997, 4, 1)


def top_supplier_by_revenue(sf_dir: str,
                            broadcast_threshold: int | None = None):
    """TPC-H-Q15-flavored top supplier: the supplier(s) with the
    maximum lineitem revenue shipped in 1997 Q1 — ALL ties kept, so
    the result set is deterministic and hash-stable.

    Shape: argmax over an aggregate. Per-suppkey revenue partials
    collapse inside each batch (np.unique + bincount — the exchange
    carries supplier-count-bounded rows, never lineitems), one small
    groupby sums them, and the global max is a distributed ``max()``
    over that supplier-bounded aggregate (driver holds ONE scalar).
    The aggregate is materialized once so max + filter don't recompute
    it — it is supplier-bounded (10k×SF rows), never corpus-bounded.
    Supplier name/nation attach through the size-gated dim policy.

    Reference parity: the reference's "top popular servers" report
    (/root/reference/src/analysis.py) is top-k by a count; this is the
    max-of-aggregate variant of the same report family.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayutil import parquet_num_rows
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    out_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("s_name", pa.string()),
                            ("s_nationkey", pa.int64()),
                            ("total_rev_u", pa.int64())])
    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "supplier")) == 0:
        return rd.from_arrow(out_schema.empty_table())

    lo = pa.scalar(TOPSUPP_LO, pa.timestamp("us"))
    hi = pa.scalar(TOPSUPP_HI, pa.timestamp("us"))
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount", "l_shipdate"])

    def rev_partial(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].cast(pa.timestamp("us"))
        t = t.filter(pc.and_(pc.greater_equal(ship, lo),
                             pc.less(ship, hi)))
        if t.num_rows == 0:
            return pa.table({"s_suppkey": pa.array([], pa.int64()),
                             "total_rev_u": pa.array([], pa.int64())})
        rev = _rev_cents(t).to_numpy(zero_copy_only=False)
        keys = t["l_suppkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        return pa.table({
            "s_suppkey": pa.array(uniq, pa.int64()),
            "total_rev_u": pa.array(
                np.bincount(inv, weights=rev).astype(np.int64))})

    rev = (li.map_batches(rev_partial, batch_format="pyarrow")
           .groupby("s_suppkey")
           .aggregate(Sum("total_rev_u", alias_name="total_rev_u"))
           .materialize())
    if rev.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    top = rev.max("total_rev_u")
    best = rev.map_batches(
        lambda t: t.filter(pc.equal(t["total_rev_u"], top)),
        batch_format="pyarrow")

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name", "s_nationkey"])
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    best = attach_dim(
        best.map_batches(lambda t: t.rename_columns(["k", "total_rev_u"]),
                         batch_format="pyarrow"),
        supp, "k", "s_suppkey", ["s_name", "s_nationkey"],
        broadcast_threshold=bt)
    return best.map_batches(
        lambda t: pa.table({
            "s_suppkey": t["k"].cast(pa.int64()),
            "s_name": t["s_name"],
            "s_nationkey": t["s_nationkey"].cast(pa.int64()),
            "total_rev_u": t["total_rev_u"].cast(pa.int64())},
            schema=out_schema),
        batch_format="pyarrow")


TOP_SUPPLIER_ORACLE_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             AS BIGINT) AS total_rev_u
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, s_nationkey, total_rev_u
FROM revenue JOIN supplier USING (s_suppkey)
WHERE total_rev_u = (SELECT max(total_rev_u) FROM revenue)
""".strip()


def sole_failed_suppliers(sf_dir: str,
                          broadcast_threshold: int | None = None):
    """TPC-H-Q21-flavored "waiting suppliers" (adapted to this corpus's
    columns — no receipt/commit dates, so "late" is a returned line):
    per supplier, in how many finished ('F') multi-supplier orders was
    it the ONLY supplier with a returned ('R') line.

    Shape: multi-way EXISTS / NOT-EXISTS over the same fact, decoded
    JOIN-FREE in two chained groupbys. Lineitem emits per-batch-deduped
    thin (orderkey, suppkey, failed) rows; 'F' orders ride the same
    stream as suppkey=-1 marker rows (the status semi-join costs no
    extra exchange). The per-order groupby then decodes everything with
    plain aggregates: marker presence = min(suppkey)==-1, supplier
    count = count−marker, failing count = sum(failed), and — because
    the qualifying orders have EXACTLY ONE failing supplier — that
    supplier's identity is just sum(suppkey·failed). A final
    count-per-supplier groupby and the size-gated name attach finish.
    Three exchanges total, all carrying order/supplier-bounded thin
    int64 rows, never lineitems.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..rayutil import parquet_num_rows
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    out_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("s_name", pa.string()),
                            ("numwait", pa.int64())])
    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders", "supplier")) == 0:
        return rd.from_arrow(out_schema.empty_table())

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_returnflag"])

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        failed = pc.equal(t["l_returnflag"], "R").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pairs = np.stack([ok, sk], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uniq[:, 0], pa.int64()),
            "l_suppkey": pa.array(uniq[:, 1], pa.int64()),
            "failed": pa.array(
                np.bincount(inv, weights=failed).astype(bool)
                .astype(np.int64))})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderstatus"])

    def marker_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        n = t.num_rows
        return pa.table({
            "l_orderkey": t["o_orderkey"].cast(pa.int64()),
            "l_suppkey": pa.array(np.full(n, -1), pa.int64()),
            "failed": pa.array(np.zeros(n, np.int64))})

    thin = (li.map_batches(li_partial, batch_format="pyarrow")
            .union(orders.map_batches(marker_rows,
                                      batch_format="pyarrow")))
    # per (order, supplier): failed = max over duplicate partial rows
    per = (thin.groupby(["l_orderkey", "l_suppkey"])
           .aggregate(Max("failed", alias_name="failed")))

    def decode_partial(t: pa.Table) -> pa.Table:
        """Per-batch shrink toward the per-order decode: partial
        (count, min-suppkey, sum-failed, sum-suppkey·failed) rows."""
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        failed = t["failed"].to_numpy(zero_copy_only=False)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(ok, return_inverse=True)
        return pa.table({
            "l_orderkey": pa.array(uniq, pa.int64()),
            "n_rows": pa.array(np.bincount(inv).astype(np.int64)),
            "min_sk": pa.array(
                np.full(len(uniq), np.iinfo(np.int64).max)
                if not len(sk) else np.minimum.reduceat(
                    sk[np.argsort(inv, kind="stable")],
                    np.searchsorted(np.sort(inv), np.arange(len(uniq)))),
                pa.int64()),
            "n_failed": pa.array(
                np.bincount(inv, weights=failed).astype(np.int64)),
            "failed_sk": pa.array(
                np.bincount(inv, weights=sk * failed).astype(np.int64))})

    ordstat = (per.map_batches(decode_partial, batch_format="pyarrow")
               .groupby("l_orderkey")
               .aggregate(Sum("n_rows", alias_name="n_rows"),
                          Min("min_sk", alias_name="min_sk"),
                          Sum("n_failed", alias_name="n_failed"),
                          Sum("failed_sk", alias_name="failed_sk")))

    def qualify(t: pa.Table) -> pa.Table:
        has_marker = pc.equal(t["min_sk"], -1)
        n_supp = pc.subtract(t["n_rows"],
                             has_marker.cast(pa.int64()))
        keep = pc.and_(pc.and_(has_marker,
                               pc.greater_equal(n_supp, 2)),
                       pc.equal(t["n_failed"], 1))
        t = t.filter(keep)
        return pa.table({"s_suppkey": t["failed_sk"].cast(pa.int64())})

    counts = (ordstat.map_batches(qualify, batch_format="pyarrow")
              .groupby("s_suppkey")
              .aggregate(Count(alias_name="numwait")))

    supp = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_name"])
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    counts = attach_dim(
        counts.map_batches(lambda t: t.rename_columns(["k", "numwait"]),
                           batch_format="pyarrow"),
        supp, "k", "s_suppkey", ["s_name"], broadcast_threshold=bt)
    return counts.map_batches(
        lambda t: pa.table({"s_suppkey": t["k"].cast(pa.int64()),
                            "s_name": t["s_name"],
                            "numwait": t["numwait"].cast(pa.int64())},
                           schema=out_schema),
        batch_format="pyarrow")


SOLE_FAILED_ORACLE_SQL = """
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
  FROM lineitem
  WHERE l_orderkey IN
        (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY l_orderkey, l_suppkey),
ord AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(failed) AS n_failed
  FROM per GROUP BY l_orderkey)
SELECT l_suppkey AS s_suppkey, s_name,
       CAST(count(*) AS BIGINT) AS numwait
FROM per
JOIN ord USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE per.failed = 1 AND ord.n_supp >= 2 AND ord.n_failed = 1
GROUP BY l_suppkey, s_name
""".strip()


# ---------------------------------------------------------------------------
# Broadcast interval-lookup join (banding against a tiny range dimension)

PRICE_BANDS = [          # (lower bound cents, name); upper = next bound
    (0, "budget"), (5_000_00, "mid"), (15_000_00, "premium"),
    (30_000_00, "luxury")]


def orders_price_bands(sf_dir: str):
    """Each order labeled with its price BAND from a small range
    dimension — the broadcast interval-lookup join (the side every
    shuffle join should become when one input is tiny): band bounds
    ride into every task once via closure capture, the per-batch
    kernel is a single ``np.searchsorted`` against the bound array,
    and no exchange happens at all. The aggregate output (band,
    n_orders, sum cents) is one count-combiner groupby over the band
    vocabulary.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_totalprice"])
    bounds = np.array([b for b, _ in PRICE_BANDS], np.int64)
    names = [n for _, n in PRICE_BANDS]

    def band(t: pa.Table) -> pa.Table:
        cents = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        idx = np.searchsorted(bounds, cents, side="right") - 1
        idx = np.maximum(idx, 0)          # below the first bound: band 0
        g = (pa.table({"band": pa.array([names[i] for i in idx],
                                        pa.string()),
                       "cents": pa.array(cents)})
             .group_by("band")
             .aggregate([([], "count_all"), ("cents", "sum")]))
        return pa.table({"band": g["band"],
                         "n_orders": g["count_all"].cast(pa.int64()),
                         "sum_cents": g["cents_sum"].cast(pa.int64())})

    return (orders.map_batches(band, batch_format="pyarrow")
            .groupby("band")
            .aggregate(Sum("n_orders", alias_name="n_orders"),
                       Sum("sum_cents", alias_name="sum_cents")))


def _price_bands_oracle_sql() -> str:
    cases = []
    bounds = [b for b, _ in PRICE_BANDS] + [None]
    for (lo, name), hi in zip(PRICE_BANDS, bounds[1:]):
        cond = (f"cents >= {lo}" if hi is None
                else f"cents >= {lo} AND cents < {hi}")
        cases.append(f"WHEN {cond} THEN '{name}'")
    # below the first bound clamps into the first band, as in the kernel
    return f"""
WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
b AS (SELECT cents, CASE {' '.join(cases)} ELSE '{PRICE_BANDS[0][1]}' END
             AS band FROM c)
SELECT band, count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS sum_cents
FROM b GROUP BY band
""".strip()


PRICE_BANDS_ORACLE_SQL = _price_bands_oracle_sql()


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: two fact attaches meeting on a local-supplier predicate

Q5_REGION = "ASIA"
Q5_DATE_LO_US = 820_454_400_000_000      # 1996-01-01 epoch µs
Q5_DATE_HI_US = 852_076_800_000_000      # 1997-01-01 epoch µs


def local_supplier_revenue(sf_dir: str, num_partitions: int | None = None,
                           broadcast_threshold: int | None = None):
    """Full TPC-H-Q5: revenue per nation for orders of one region's
    customers in one year, COUNTING ONLY LOCAL SUPPLIERS
    (c_nationkey = s_nationkey) — the multi-join where two
    independently-prepared fact sides (lineitem⋈supplier and
    orders⋈customer) meet on an orderkey join and a cross-side
    equality predicate. Scale plan (classic Q5 pushdown): the
    fixed-size nation/region dims fold to a driver map of the target
    region's nation keys; BOTH growing dims (supplier 10k×SF,
    customer 150k×SF) attach through the size-gated
    broadcast-vs-partitioned policy; the region and date filters run
    BEFORE the one fact-fact hash join, so it carries only the
    region's suppliers' lineitems against the year's regional orders.
    Revenue in exact integer units (cents × (100 − discount-pct)).
    """
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    from ..rayutil import parquet_num_rows

    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders")) == 0:
        # empty fact side: Ray 2.49's hash-join aggregator cannot
        # finalize all-empty bundles — return the typed empty result
        import ray.data as _rd
        return _rd.from_arrow(pa.schema([("n_name", pa.string()), ("revenue_u", pa.int64())]).empty_table())

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = {k: n for k, n in zip(reg["r_regionkey"].to_pylist(),
                               reg["r_name"].to_pylist())}
    nation_name = {k: n for k, n, g in zip(
        nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist(),
        nat["n_regionkey"].to_pylist()) if rk[g] == Q5_REGION}
    region_keys = np.array(sorted(nation_name), np.int64)

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet",
                         f"{sf_dir}/orders.parquet")

    # fact side 1: lineitem with its supplier's nation, region-pruned
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    li = attach_dim(li, sup, "l_suppkey", "s_suppkey", ["s_nationkey"],
                    broadcast_threshold=bt)

    def li_prune(t: pa.Table) -> pa.Table:
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(sn, region_keys)
        t = t.filter(pa.array(keep))
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                          * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                       * 100).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "s_nat": t["s_nationkey"].cast(pa.int64()),
            "rev": pa.array(price_c * (100 - disc), pa.int64())})

    li = li.map_batches(li_prune, batch_format="pyarrow")

    # fact side 2: the year's orders with their customer's nation,
    # region-pruned
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])

    def date_filter(t: pa.Table) -> pa.Table:
        us = (t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        keep = (us >= Q5_DATE_LO_US) & (us < Q5_DATE_HI_US)
        t = t.filter(pa.array(keep))
        return t.select(["o_orderkey", "o_custkey"])

    orders = orders.map_batches(date_filter, batch_format="pyarrow")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    orders = attach_dim(orders, cust, "o_custkey", "c_custkey",
                        ["c_nationkey"], broadcast_threshold=bt)

    def ord_prune(t: pa.Table) -> pa.Table:
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(cn, region_keys)))
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "c_nat": t["c_nationkey"].cast(pa.int64())})

    orders = orders.map_batches(ord_prune, batch_format="pyarrow")

    j = li.join(orders, join_type="inner", num_partitions=npart,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        sn = t["s_nat"].to_numpy(zero_copy_only=False)
        cn = t["c_nat"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(sn == cn))
        g = (pa.table({"s_nat": t["s_nat"], "rev": t["rev"]})
             .group_by("s_nat").aggregate([("rev", "sum")]))
        return pa.table({
            "n_name": pa.array([nation_name[k]
                                for k in g["s_nat"].to_pylist()],
                               pa.string()),
            "revenue_u": g["rev_sum"].cast(pa.int64())})

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby("n_name").aggregate(Sum("revenue_u",
                                             alias_name="revenue_u")))


Q5_ORACLE_SQL = f"""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_u
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND c.c_nationkey = s.s_nationkey
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: cross-nation volume shipping by year

Q7_NATION_A = 3
Q7_NATION_B = 8


def nation_pair_volume(sf_dir: str, num_partitions: int | None = None,
                       broadcast_threshold: int | None = None):
    """Q7: shipping volume BETWEEN two nations by ship year — the
    disjunctive cross-side predicate ((s=A ∧ c=B) ∨ (s=B ∧ c=A)) that
    no single equi-join key expresses, plus date-part grouping. Plan:
    both fact sides pre-filter to the two nations through the
    size-gated dim attach (the pair predicate's UNION of keys prunes
    BEFORE the join, the disjunction itself resolves per batch after),
    one orderkey hash join, and a (supp, cust, year) groupby over
    per-batch partials. Ship year extracted vectorized from the
    timestamp (datetime64[Y] arithmetic, no per-row Python).
    """
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    from ..rayutil import parquet_num_rows

    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders")) == 0:
        # empty fact side: Ray 2.49's hash-join aggregator cannot
        # finalize all-empty bundles — return the typed empty result
        import ray.data as _rd
        return _rd.from_arrow(pa.schema([("supp_nation", pa.string()), ("cust_nation", pa.string()), ("l_year", pa.int64()), ("revenue_u", pa.int64())]).empty_table())

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    name = dict(zip(nat["n_nationkey"].to_pylist(),
                    nat["n_name"].to_pylist()))
    pair = np.array([Q7_NATION_A, Q7_NATION_B], np.int64)

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet",
                         f"{sf_dir}/orders.parquet")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_suppkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    li = attach_dim(li, sup, "l_suppkey", "s_suppkey", ["s_nationkey"],
                    broadcast_threshold=bt)

    def li_prune(t: pa.Table) -> pa.Table:
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(sn, pair)))
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                          * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                       * 100).astype(np.int64)
        ship = (t["l_shipdate"].cast(pa.timestamp("us"))
                .to_numpy(zero_copy_only=False))
        year = ship.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "s_nat": t["s_nationkey"].cast(pa.int64()),
            "l_year": pa.array(year, pa.int64()),
            "rev": pa.array(price_c * (100 - disc), pa.int64())})

    li = li.map_batches(li_prune, batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    orders = attach_dim(orders, cust, "o_custkey", "c_custkey",
                        ["c_nationkey"], broadcast_threshold=bt)

    def ord_prune(t: pa.Table) -> pa.Table:
        cn = t["c_nationkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(cn, pair)))
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "c_nat": t["c_nationkey"].cast(pa.int64())})

    orders = orders.map_batches(ord_prune, batch_format="pyarrow")

    j = li.join(orders, join_type="inner", num_partitions=npart,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        sn = t["s_nat"].to_numpy(zero_copy_only=False)
        cn = t["c_nat"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(sn != cn))   # within the pair: the disjunction
        g = (t.select(["s_nat", "c_nat", "l_year", "rev"])
             .group_by(["s_nat", "c_nat", "l_year"])
             .aggregate([("rev", "sum")]))
        return pa.table({
            "supp_nation": pa.array([name[k]
                                     for k in g["s_nat"].to_pylist()],
                                    pa.string()),
            "cust_nation": pa.array([name[k]
                                     for k in g["c_nat"].to_pylist()],
                                    pa.string()),
            "l_year": g["l_year"].cast(pa.int64()),
            "revenue_u": g["rev_sum"].cast(pa.int64())})

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["supp_nation", "cust_nation", "l_year"])
            .aggregate(Sum("revenue_u", alias_name="revenue_u")))


Q7_ORACLE_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_u
FROM lineitem l
JOIN orders o    ON l.l_orderkey = o.o_orderkey
JOIN customer c  ON o.o_custkey = c.c_custkey
JOIN supplier s  ON l.l_suppkey = s.s_suppkey
JOIN nation ns   ON s.s_nationkey = ns.n_nationkey
JOIN nation nc   ON c.c_nationkey = nc.n_nationkey
WHERE (s.s_nationkey = {Q7_NATION_A} AND c.c_nationkey = {Q7_NATION_B})
   OR (s.s_nationkey = {Q7_NATION_B} AND c.c_nationkey = {Q7_NATION_A})
GROUP BY 1, 2, 3
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: market share as an exact-ppm conditional aggregate

Q8_SUPP_NATION = 5          # the nation whose market share we measure
Q8_PART_TYPE = "ECONOMY"    # part-type slice of the market


def nation_market_share(sf_dir: str, num_partitions: int | None = None,
                        broadcast_threshold: int | None = None):
    """Q8: one nation's share of a part-type market by order year, in
    exact integer ppm — the conditional-aggregate-ratio shape
    (sum(CASE WHEN supplier is ours THEN rev END) / sum(rev)) with
    THREE SF-growing dimensions in one query: part (type filter, the
    market slice), supplier (whose nation drives the CASE), customer
    (not needed — the market is defined by the part type, so this Q8
    adaptation keeps orders only for the year). All dims attach
    through the size-gated broadcast-vs-partitioned policy; the part
    filter prunes the fact BEFORE the orderkey join; per-batch
    partials carry (year, rev, rev_ours) so the final exchange is a
    handful of year rows and the ppm division happens exactly once
    per year.
    """
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    from ..rayutil import parquet_num_rows

    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders")) == 0:
        # empty fact side: Ray 2.49's hash-join aggregator cannot
        # finalize all-empty bundles — return the typed empty result
        import ray.data as _rd
        return _rd.from_arrow(pa.schema([("o_year", pa.int64()), ("market_u", pa.int64()), ("share_ppm", pa.int64())]).empty_table())

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet",
                         f"{sf_dir}/orders.parquet")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_extendedprice", "l_discount"])
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    li = attach_dim(li, part, "l_partkey", "p_partkey", ["p_type"],
                    broadcast_threshold=bt)

    def type_prune(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(pc.fill_null(t["p_type"], ""),
                                 Q8_PART_TYPE))

    li = (li.map_batches(type_prune, batch_format="pyarrow"))
    li = attach_dim(li, sup, "l_suppkey", "s_suppkey", ["s_nationkey"],
                    broadcast_threshold=bt)

    def li_rows(t: pa.Table) -> pa.Table:
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                          * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                       * 100).astype(np.int64)
        sn = t["s_nationkey"].to_numpy(zero_copy_only=False)
        rev = price_c * (100 - disc)
        return pa.table({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "rev": pa.array(rev, pa.int64()),
            "rev_ours": pa.array(
                np.where(sn == Q8_SUPP_NATION, rev, 0), pa.int64())})

    li = li.map_batches(li_rows, batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def ord_year(t: pa.Table) -> pa.Table:
        od = (t["o_orderdate"].cast(pa.timestamp("us"))
              .to_numpy(zero_copy_only=False))
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_year": pa.array(
                od.astype("datetime64[Y]").astype(np.int64) + 1970,
                pa.int64())})

    orders = orders.map_batches(ord_year, batch_format="pyarrow")

    j = li.join(orders, join_type="inner", num_partitions=npart,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        return (t.select(["o_year", "rev", "rev_ours"])
                .group_by("o_year")
                .aggregate([("rev", "sum"), ("rev_ours", "sum")])
                .rename_columns(["o_year", "rev", "rev_ours"]))

    agg = (j.map_batches(partial, batch_format="pyarrow")
           .groupby("o_year")
           .aggregate(Sum("rev", alias_name="rev"),
                      Sum("rev_ours", alias_name="rev_ours")))

    def share(t: pa.Table) -> pa.Table:
        rev = t["rev"].to_numpy(zero_copy_only=False)
        ours = t["rev_ours"].to_numpy(zero_copy_only=False)
        return pa.table({
            "o_year": t["o_year"].cast(pa.int64()),
            "market_u": pa.array(rev, pa.int64()),
            "share_ppm": pa.array(ours * 1_000_000 // rev, pa.int64())})

    return agg.map_batches(share, batch_format="pyarrow")


Q8_ORACLE_SQL = f"""
WITH m AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev,
         CASE WHEN s.s_nationkey = {Q8_SUPP_NATION} THEN 1 ELSE 0 END
             AS ours
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_type = '{Q8_PART_TYPE}')
SELECT o_year, CAST(sum(rev) AS BIGINT) AS market_u,
       CAST(sum(rev * ours) * 1000000 // sum(rev) AS BIGINT) AS share_ppm
FROM m GROUP BY o_year
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunctive bands across two tables

Q19_BANDS = [   # (brand, max size, qty lo, qty hi) — OR of AND-groups
    ("Brand#11", 15, 1, 11),
    ("Brand#22", 25, 10, 20),
    ("Brand#33", 40, 20, 30)]


def banded_part_revenue(sf_dir: str, num_partitions: int | None = None,
                        broadcast_threshold: int | None = None):
    """Q19: revenue from lineitems matching ANY of three conjunctive
    (brand, size, quantity) bands — the OR-of-ANDs predicate that
    spans two tables (part attributes AND the lineitem measure), so no
    single side can evaluate it alone. Plan: the part side prunes to
    the UNION of banded brands (with each part's band index attached)
    through the size-gated attach; the per-batch kernel then evaluates
    only its own band's quantity range via array indexing — the
    disjunction costs one gather, not three passes. Output: per band
    matching band the row count and exact integer revenue.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand", "p_size"])
    brands = {b: i for i, (b, _, _, _) in enumerate(Q19_BANDS)}
    max_size = np.array([s for _, s, _, _ in Q19_BANDS], np.int64)
    qlo = np.array([q for _, _, q, _ in Q19_BANDS], np.int64)
    qhi = np.array([q for _, _, _, q in Q19_BANDS], np.int64)

    def band_parts(t: pa.Table) -> pa.Table:
        bid = np.array([brands.get(b, -1)
                        for b in t["p_brand"].to_pylist()], np.int64)
        size = t["p_size"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (bid >= 0) & (size >= 1) & (size <= max_size[
            np.maximum(bid, 0)])
        t = t.filter(pa.array(keep))
        return pa.table({"p_partkey": t["p_partkey"].cast(pa.int64()),
                         "band": pa.array(bid[keep], pa.int64())})

    dim = part.map_batches(band_parts, batch_format="pyarrow")
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    li = attach_dim(li, dim, "l_partkey", "p_partkey", ["band"],
                    broadcast_threshold=bt)

    def partial(t: pa.Table) -> pa.Table:
        # unmatched fact keys carry a null band from the attach
        band = pc.fill_null(t["band"], -1).to_numpy(zero_copy_only=False
                                                    ).astype(np.int64)
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                      ).astype(np.int64)
        ok = band >= 0
        b = np.maximum(band, 0)
        ok &= (qty >= qlo[b]) & (qty <= qhi[b])
        t = t.filter(pa.array(ok))
        band = band[ok]
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                          * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                       * 100).astype(np.int64)
        g = (pa.table({"band": pa.array(band),
                       "rev": pa.array(price_c * (100 - disc), pa.int64())})
             .group_by("band")
             .aggregate([([], "count_all"), ("rev", "sum")]))
        return pa.table({"band": g["band"],
                         "n_items": g["count_all"].cast(pa.int64()),
                         "revenue_u": g["rev_sum"].cast(pa.int64())})

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .groupby("band")
           .aggregate(Sum("n_items", alias_name="n_items"),
                      Sum("revenue_u", alias_name="revenue_u")))

    def name_bands(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_brand": pa.array(
                [Q19_BANDS[int(b)][0] for b in t["band"].to_pylist()],
                pa.string()),
            "n_items": t["n_items"].cast(pa.int64()),
            "revenue_u": t["revenue_u"].cast(pa.int64())})

    return agg.map_batches(name_bands, batch_format="pyarrow")


def _q19_oracle_sql() -> str:
    conds = []
    for b, s, lo, hi in Q19_BANDS:
        conds.append(
            f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {s} "
            f"AND l.l_quantity BETWEEN {lo} AND {hi})")
    return f"""
SELECT p.p_brand, count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_u
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {' OR '.join(conds)}
GROUP BY p.p_brand
""".strip()


Q19_ORACLE_SQL = _q19_oracle_sql()


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: single-table predicate-band aggregate

Q6_DISC_LO, Q6_DISC_HI = 5, 7        # discount pct band, inclusive
Q6_QTY_MAX = 24                      # quantity strictly below


def forecast_revenue_delta(sf_dir: str):
    """Q6: the revenue that WOULD be gained by eliminating a discount
    band — sum(extendedprice × discount) over one ship-date year, a
    discount band and a quantity cap. Pure map-side: the predicate and
    the product fold into per-batch one-row partials; the only
    exchange is a constant-key reduce of those scalars. Exact integer
    units (cents × discount-pct).
    """
    import ray.data as rd

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    mid = pa.schema([("k", pa.int64()), ("n_items", pa.int64()),
                     ("revenue_u", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        us = (t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                      ).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                       * 100).astype(np.int64)
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                          * 100).astype(np.int64)
        keep = ((us >= Q5_DATE_LO_US) & (us < Q5_DATE_HI_US)
                & (disc >= Q6_DISC_LO) & (disc <= Q6_DISC_HI)
                & (qty < Q6_QTY_MAX))
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_items": pa.array([int(keep.sum())], pa.int64()),
            "revenue_u": pa.array([int((price_c[keep]
                                        * disc[keep]).sum())], pa.int64()),
        }, schema=mid)

    def reduce_all(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_items": pa.array([pc.sum(t["n_items"]).as_py()], pa.int64()),
            "revenue_u": pa.array([pc.sum(t["revenue_u"]).as_py()],
                                  pa.int64())})

    return (li.map_batches(partial, batch_format="pyarrow")
            .groupby("k").map_groups(reduce_all, batch_format="pyarrow"))


Q6_ORACLE_SQL = f"""
SELECT count(*) AS n_items,
       CAST(coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
           * CAST(round(l_discount * 100) AS BIGINT)), 0) AS BIGINT)
           AS revenue_u
FROM lineitem
WHERE epoch_us(l_shipdate) >= {Q5_DATE_LO_US}
  AND epoch_us(l_shipdate) < {Q5_DATE_HI_US}
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN {Q6_DISC_LO} AND {Q6_DISC_HI}
  AND CAST(round(l_quantity) AS BIGINT) < {Q6_QTY_MAX}
""".strip()


# ---------------------------------------------------------------------------
# MERGE INTO with tombstones (CDC compaction incl. the DELETE branch)

CDC_DELETE_MOD = 20   # doc_id % 20 == 4 → v2 tombstone


def documents_compact(sf_dir: str,
                      exchange_max_rows: int = SCD2_EXCHANGE_MAX):
    """CDC compaction with ALL THREE MERGE branches: the deterministic
    delta updates doc_id %10==3 ('UPD'), inserts %25==0 (+1e6 ids),
    and now DELETES %20==4 via version-2 tombstones — the winner per
    key is the highest version, and a tombstone winner erases the row
    from the compacted table entirely. Join-free and, like
    ``documents_scd2``, keyed through the direct-task exchange with a
    VECTORIZED multi-group kernel (one lexsort per reduce slice,
    winners at doc-run starts) — never a Python call per key; above
    the row gate the identical kernel runs under
    ``groupby().map_groups``. Both paths forced in tests.
    """
    import ray.data as rd

    from ..rayutil import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(CDC_SCHEMA.empty_table())

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def tombstones(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = ids[ids % CDC_DELETE_MOD == 4]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "version": pa.array(np.full(len(ids), 2, np.int64)),
            "fp": pa.array(["__TOMBSTONE__"] * len(ids), pa.string()),
        }, schema=CDC_SCHEMA)

    merged = (docs.map_batches(_cdc_base_rows, batch_format="pyarrow")
              .union(docs.map_batches(_cdc_delta_rows,
                                      batch_format="pyarrow"))
              .union(docs.map_batches(tombstones, batch_format="pyarrow"))
              .materialize())

    def compact_kernel(t: pa.Table) -> pa.Table:
        # vectorized across ALL keys in the slice: one lexsort, winners
        # at doc-run starts (version desc, fp asc inside the run),
        # tombstone winners dropped — no per-key Python call
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        ver = t["version"].to_numpy(zero_copy_only=False)
        fp = t["fp"].to_numpy(zero_copy_only=False)
        order = np.lexsort((fp, -ver, ids))
        ids_s = ids[order]
        starts = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
        win = t.take(pa.array(order[starts]))
        keep = pc.invert(pc.equal(win["fp"], "__TOMBSTONE__"))
        return win.filter(keep).select(
            ["doc_id", "version", "fp"]).cast(CDC_SCHEMA)

    from ..stages.exchange import exchange_reduce

    if merged.count() <= exchange_max_rows:
        return exchange_reduce(merged, "doc_id", compact_kernel,
                               CDC_SCHEMA)
    return (merged.groupby("doc_id")
            .map_groups(compact_kernel, batch_format="pyarrow"))


COMPACT_ORACLE_SQL = f"""
WITH base AS (
  SELECT doc_id, 1 AS version, md5(coalesce(text, '')) AS fp
  FROM documents),
delta AS (
  SELECT doc_id, 2 AS version, md5('UPD ' || coalesce(text, '')) AS fp
  FROM documents WHERE doc_id % 10 = 3
  UNION ALL
  SELECT doc_id + 1000000, 2, md5('NEW ' || coalesce(text, ''))
  FROM documents WHERE doc_id % 25 = 0
  UNION ALL
  SELECT doc_id, 2, '__TOMBSTONE__'
  FROM documents WHERE doc_id % {CDC_DELETE_MOD} = 4),
m AS (SELECT * FROM base UNION ALL SELECT * FROM delta),
r AS (SELECT doc_id, version, fp,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY version DESC, fp) AS rn
      FROM m)
SELECT doc_id, CAST(version AS BIGINT) AS version, fp
FROM r WHERE rn = 1 AND fp <> '__TOMBSTONE__'
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: profit by supplier nation × order year over a part slice

Q9_PART_NEEDLE = "red"     # p_name substring slice of the market


def nation_profit(sf_dir: str, num_partitions: int | None = None,
                  broadcast_threshold: int | None = None):
    """Q9-shape profit rollup: for every lineitem of a part whose name
    contains ``Q9_PART_NEEDLE``, profit = revenue − cost, summed by the
    SUPPLIER's nation and the ORDER's year. (The reference schema has
    no partsupp table, so cost is the part's retail price × quantity —
    the join/aggregate shape of Q9 is unchanged: two dimension attaches
    on the lineitem side, one fact-fact orderkey join for the date,
    then a two-key rollup.)

    Scale plan: the part slice prunes lineitem BEFORE anything moves
    (attach p_retailprice via the size-gated dim policy, drop
    non-matching rows in the same batch pass); the supplier nation
    rides the second size-gated attach; orders ships only (orderkey,
    year) through the single hash join. Profit in exact integer
    10⁻⁴-dollar units: cents × (100 − disc-pct) − retail-cents × qty ×
    100, so the value-hash cannot drift on float sum order.
    """
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    from ..rayutil import parquet_num_rows

    if min(parquet_num_rows(f"{sf_dir}/{t}.parquet")
           for t in ("lineitem", "orders")) == 0:
        # empty fact side: Ray 2.49's hash-join aggregator cannot
        # finalize all-empty bundles — return the typed empty result
        import ray.data as _rd
        return _rd.from_arrow(pa.schema([("nation", pa.string()), ("o_year", pa.int64()), ("profit_u", pa.int64())]).empty_table())

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    name = dict(zip(nat["n_nationkey"].to_pylist(),
                    nat["n_name"].to_pylist()))

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    npart = _npartitions(num_partitions, f"{sf_dir}/lineitem.parquet",
                         f"{sf_dir}/orders.parquet")

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name", "p_retailprice"])

    def part_slice(t: pa.Table) -> pa.Table:
        t = t.filter(pc.match_substring(t["p_name"], Q9_PART_NEEDLE))
        retail_c = np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                           * 100).astype(np.int64)
        return pa.table({"p_partkey": t["p_partkey"].cast(pa.int64()),
                         "retail_c": pa.array(retail_c)})

    part = part.map_batches(part_slice, batch_format="pyarrow")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_suppkey",
                                  "l_quantity", "l_extendedprice",
                                  "l_discount"])
    li = attach_dim(li, part, "l_partkey", "p_partkey", ["retail_c"],
                    broadcast_threshold=bt)

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_nationkey"])
    li = attach_dim(li, sup, "l_suppkey", "s_suppkey", ["s_nationkey"],
                    broadcast_threshold=bt)

    def li_profit(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["retail_c"]))   # part-slice inner join
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                          * 100).astype(np.int64)
        disc = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                       * 100).astype(np.int64)
        qty = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)
                      ).astype(np.int64)
        retail_c = t["retail_c"].to_numpy(zero_copy_only=False)
        amount = price_c * (100 - disc) - retail_c * qty * 100
        return pa.table({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "s_nat": t["s_nationkey"].cast(pa.int64()),
            "amount_u": pa.array(amount, pa.int64())})

    li = li.map_batches(li_profit, batch_format="pyarrow")

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def ord_year(t: pa.Table) -> pa.Table:
        od = (t["o_orderdate"].cast(pa.timestamp("us"))
              .to_numpy(zero_copy_only=False))
        year = od.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"].cast(pa.int64()),
                         "o_year": pa.array(year, pa.int64())})

    orders = orders.map_batches(ord_year, batch_format="pyarrow")

    j = li.join(orders, join_type="inner", num_partitions=npart,
                on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select(["s_nat", "o_year", "amount_u"])
             .group_by(["s_nat", "o_year"])
             .aggregate([("amount_u", "sum")]))
        return pa.table({
            "nation": pa.array([name[k] for k in g["s_nat"].to_pylist()],
                               pa.string()),
            "o_year": g["o_year"].cast(pa.int64()),
            "profit_u": g["amount_u_sum"].cast(pa.int64())})

    return (j.map_batches(partial, batch_format="pyarrow")
            .groupby(["nation", "o_year"])
            .aggregate(Sum("profit_u", alias_name="profit_u")))


Q9_ORACLE_SQL = f"""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                - CAST(round(p.p_retailprice * 100) AS BIGINT)
                  * CAST(round(l.l_quantity) AS BIGINT) * 100)
            AS BIGINT) AS profit_u
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE contains(p.p_name, '{Q9_PART_NEEDLE}')
GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: order-priority count under a cross-table EXISTS predicate

Q4_DATE_LO_US = 820_454_400_000_000      # 1996-01-01 epoch µs
Q4_DATE_HI_US = 828_316_800_000_000      # 1996-04-01 epoch µs
Q4_LATE_DAYS = 90


def late_order_priority(sf_dir: str, num_partitions: int | None = None,
                        broadcast_threshold: int | None = None):
    """Q4-shape: count one quarter's orders per priority that have AT
    LEAST ONE lineitem shipped more than ``Q4_LATE_DAYS`` days after
    the order date — the correlated EXISTS whose predicate compares a
    column from EACH side (l_shipdate vs o_orderdate), so it cannot be
    pushed to either table alone.

    Scale plan: the quarter filter prunes orders first; (o_orderdate,
    o_orderpriority) rides the size-gated dim attach onto lineitem
    (lineitems of other quarters drop in the same pass — the attach IS
    the semi-join); the late predicate resolves per batch vectorized;
    EXISTS-dedup ships thin (orderkey, priority) rows through one
    groupby(orderkey) first-row pass; the final count is a priority
    groupby over per-batch partials.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate",
                                      "o_orderpriority"])

    def quarter(t: pa.Table) -> pa.Table:
        us = (t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        keep = (us >= Q4_DATE_LO_US) & (us < Q4_DATE_HI_US)
        t = t.filter(pa.array(keep))
        return pa.table({"o_orderkey": t["o_orderkey"].cast(pa.int64()),
                         "o_us": pa.array(us[keep], pa.int64()),
                         "o_orderpriority": t["o_orderpriority"]})

    orders = orders.map_batches(quarter, batch_format="pyarrow")

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])
    li = attach_dim(li, orders, "l_orderkey", "o_orderkey",
                    ["o_us", "o_orderpriority"], broadcast_threshold=bt)

    late_us = Q4_LATE_DAYS * 86_400_000_000

    def late_keys(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["o_us"]))       # quarter semi-join
        ship = (t["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        ous = t["o_us"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ship > ous + late_us))
        # local distinct: one (orderkey, priority) per batch
        g = (t.select(["l_orderkey", "o_orderpriority"])
             .group_by("l_orderkey").aggregate([("o_orderpriority", "min")]))
        return pa.table({"o_orderkey": g["l_orderkey"].cast(pa.int64()),
                         "o_orderpriority":
                             g["o_orderpriority_min"].cast(pa.string())})

    keys = li.map_batches(late_keys, batch_format="pyarrow")

    def first_row(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    keys = keys.groupby("o_orderkey").map_groups(first_row,
                                                 batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = (t.select(["o_orderpriority"]).group_by("o_orderpriority")
             .aggregate([([], "count_all")]))
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "order_count": g["count_all"].cast(pa.int64())})

    return (keys.map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("order_count", alias_name="order_count")))


Q4_ORACLE_SQL = f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate
                                   + INTERVAL {Q4_LATE_DAYS} DAY)
GROUP BY 1
""".strip()
