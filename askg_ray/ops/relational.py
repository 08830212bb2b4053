"""Relational operators over the driver testdata tables.

The generic groupby / top-k / join / window surface mirroring the
reference's aggregate queries (SURVEY.md §2.7-2.9, A1-A9 / O1-O4 / J2),
each with a DuckDB oracle (see __ray_entry__.oracle_sql). Design rules:

  * prune at the read (``columns=[...]``);
  * pre-aggregation happens inside Ray's hash aggregate; partial sums
    of integral doubles are exact, so value-hashes match SQL — queries
    avoid order-dependent float sums (no sum over random doubles);
  * small dimension tables are broadcast via ``ray.put`` (orders ⋈
    customer), never shuffled;
  * top-k always carries a deterministic tie-break key.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _rename(ds, mapping: dict[str, str]):
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])
    return ds.map_batches(fn, batch_format="pyarrow")


def doc_count_by_source(sf_dir: str):
    """A2 analog: docs per source."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])
    return _rename(docs.groupby("source").count(), {"count()": "n"})


def doc_lang_hist(sf_dir: str):
    """A3 analog: docs per language (full histogram, order-insensitive)."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])
    return _rename(docs.groupby("lang").count(), {"count()": "n"})


def doc_dup_groups(sf_dir: str):
    """A8 analog (duplicate-group analysis): blocking key → groups with
    more than one member. Key = n_chars (exact doc length)."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    counted = _rename(docs.groupby("n_chars").count(), {"count()": "n"})
    return counted.map_batches(lambda t: t.filter(pc.greater(t["n"], 1)),
                               batch_format="pyarrow")


def lineitem_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped: counts + exact integral sums per flag/status."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_linestatus", "l_quantity"])
    agg = (li.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("l_quantity", alias_name="sum_qty"),
                      Min("l_quantity", alias_name="min_qty"),
                      Max("l_quantity", alias_name="max_qty"),
                      Count(alias_name="n")))
    return agg


def orders_by_segment(sf_dir: str, broadcast_threshold: int | None = None):
    """orders ⋈ customer(c_mktsegment) → per-segment stats.

    customer grows with scale factor (TPC-H: 150k × SF rows), so the
    join goes through ``stages.labeljoin.attach_dim``'s size-gated
    policy: broadcast ``searchsorted`` lookup under the threshold, a
    partitioned shuffle join above it — never an unbounded driver dict.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Max

    from ..rayutil import parquet_num_rows
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    if parquet_num_rows(f"{sf_dir}/orders.parquet") == 0:
        return rd.from_arrow(pa.schema(
            [("c_mktsegment", pa.string()), ("n_orders", pa.int64()),
             ("max_price", pa.float64())]).empty_table())
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    joined = attach_dim(orders, cust, "o_custkey", "c_custkey",
                        ["c_mktsegment"], broadcast_threshold=bt)
    return (joined.groupby("c_mktsegment")
            .aggregate(Count(alias_name="n_orders"),
                       Max("o_totalprice", alias_name="max_price")))


def top_parts_by_price(sf_dir: str, k: int = 10):
    """O1 analog: ORDER BY p_retailprice DESC, p_partkey LIMIT k."""
    import ray.data as rd
    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_name", "p_retailprice"])
    return parts.sort(["p_retailprice", "p_partkey"],
                      descending=[True, False]).limit(k)


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate: events per (hour, event_type)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def truncate(t: pa.Table) -> pa.Table:
        hours = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table({"hour": hours, "event_type": t["event_type"]})

    return (ev.map_batches(truncate, batch_format="pyarrow")
            .groupby(["hour", "event_type"])
            .aggregate(Count(alias_name="n")))


def events_user_windows(sf_dir: str):
    """Per-user daily activity: groupby(user).map_groups windowing over
    the sorted per-user event log (stream-shaped op; ray_guide pattern)."""
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    def per_user(t: pa.Table) -> pa.Table:
        import numpy as np
        days = pc.floor_temporal(t["ts"], unit="day").combine_chunks()
        uniq, counts = np.unique(days.to_numpy(zero_copy_only=False),
                                 return_counts=True)
        uid = t["user_id"][0].as_py()
        return pa.table({
            "user_id": pa.array(np.full(len(uniq), uid, dtype=np.int64)),
            "day": pa.array(uniq).cast(pa.timestamp("us")),
            "n_events": pa.array(counts.astype(np.int64)),
        })

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def token_freq(sf_dir: str, min_count: int = 50):
    """Explode-then-aggregate: token frequencies over all documents
    (M6/J2-style flat_map explode + pre-aggregated groupby). Partial
    per-batch counters shrink the shuffle from one row per token
    OCCURRENCE to one row per (batch, distinct token)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter()
        for text in t["text"].to_pylist():
            c.update((text or "").split(" "))
        if not c:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ks, vs = zip(*c.items())
        return pa.table({"token": pa.array(list(ks), pa.string()),
                         "n": pa.array(list(vs), pa.int64())})

    agg = (docs.map_batches(partial_counts, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("n", alias_name="n")))
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
        batch_format="pyarrow")


def events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Session windows: per-user event count + session count, where a
    session breaks after a ``gap_minutes`` silence. The stream-shaped
    pattern from the Ray guide — partition by key, sort by ts within
    the group, window with pandas; the ordering assumption (per-user
    event-time order within the group) is established by the sort."""
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def per_user(t: pa.Table) -> pa.Table:
        import numpy as np
        ts = np.sort(t["ts"].combine_chunks().to_numpy(zero_copy_only=False))
        gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")
        n_sessions = 1 + int((np.diff(ts) > gap).sum())
        return pa.table({
            "user_id": pa.array([t["user_id"][0].as_py()], pa.int64()),
            "n_events": pa.array([len(ts)], pa.int64()),
            "n_sessions": pa.array([n_sessions], pa.int64()),
        })

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


def parts_topk_per_brand(sf_dir: str, k: int = 5):
    """Grouped top-k (``ROW_NUMBER() OVER (PARTITION BY ...)`` window
    analog): the k highest-priced parts per brand, ties broken by
    partkey. Same two-pass lossless pattern as
    ``stages.edges.truncate_out_degree``: a per-batch top-k runs BEFORE
    the shuffle (an edge dropped there is beaten by k better rows of
    the same brand in its own batch, so it cannot be in the global
    top-k), shrinking the shuffled volume to ≤ k rows per
    (batch, brand); an exact ``groupby(brand)`` reduce finishes."""
    import numpy as np
    import ray.data as rd

    parts = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_brand", "p_retailprice"])

    def topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        brand = np.asarray(t["p_brand"].to_pylist(), dtype=object)
        _, codes = np.unique(brand, return_inverse=True)
        price = t["p_retailprice"].to_numpy(zero_copy_only=False)
        key = t["p_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((key, -price, codes))
        c = codes[order]
        n = len(c)
        starts = np.concatenate(([0], np.nonzero(c[1:] != c[:-1])[0] + 1))
        run = np.zeros(n, dtype=np.int64)
        run[starts[1:]] = 1
        run = np.cumsum(run)
        pos = np.arange(n) - starts[run]
        return t.take(pa.array(np.sort(order[pos < k]), pa.int64()))

    return (parts.map_batches(topk, batch_format="pyarrow")
            .groupby("p_brand").map_groups(topk, batch_format="pyarrow"))


def filter_contains(sf_dir: str, needle: str = "data"):
    """F6 analog: case-insensitive substring filter + count per source."""
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])

    def flt(t: pa.Table) -> pa.Table:
        mask = pc.match_substring(t["text"], needle, ignore_case=True)
        return t.filter(mask).select(["source"])

    return _rename(docs.map_batches(flt, batch_format="pyarrow")
                   .groupby("source").count(), {"count()": "n"})


def events_asof_join(sf_dir: str):
    """As-of join: each purchase event ⋈ the most recent click by the
    same user at-or-before its timestamp (inner — purchases with no
    prior click drop out). Ray Data has no asof-join operator; the
    composition is one ``groupby(user_id)`` shuffle + a vectorized
    per-group sorted ``searchsorted`` merge — the documented
    partitioning assumption is that one user's events fit one group
    (true at any corpus scale for human-generated event streams; a
    pathological single-user firehose would need ts-range salting with
    boundary overlap). Oracle: DuckDB ASOF JOIN.
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    ev = ev.filter(expr="event_type == 'purchase' or event_type == 'click'")

    out_schema = pa.schema([
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("click_event_id", pa.int64()),
        ("click_ts", pa.timestamp("us")),
        ("gap_us", pa.int64()),
    ])

    def asof_group(t: pa.Table) -> pa.Table:
        # sort by (ts, event_id) ascending: searchsorted(side="right")-1
        # then lands on the LAST eligible click, i.e. among clicks that
        # share the max eligible ts the one with max event_id — exactly
        # the (user_id, ts)→max(event_id) dedup the oracle applies, so
        # the tie rule is pinned on both sides (DuckDB's bare ASOF JOIN
        # leaves the equal-ts winner unspecified)
        t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                                 ("event_id", "ascending")]))
        types = np.asarray(t["event_type"].to_pylist(), dtype=object)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        p = types == "purchase"
        c = types == "click"
        if not p.any() or not c.any():
            return out_schema.empty_table()
        cts, cids = ts[c], ids[c]
        idx = np.searchsorted(cts, ts[p], side="right") - 1
        keep = idx >= 0
        if not keep.any():
            return out_schema.empty_table()
        idx = idx[keep]
        pts, pids, puid = ts[p][keep], ids[p][keep], uid[p][keep]
        gap = ((pts - cts[idx]).astype("timedelta64[us]")).astype(np.int64)
        return pa.table({
            "event_id": pa.array(pids, pa.int64()),
            "user_id": pa.array(puid, pa.int64()),
            "ts": pa.array(pts),
            "click_event_id": pa.array(cids[idx], pa.int64()),
            "click_ts": pa.array(cts[idx]),
            "gap_us": pa.array(gap, pa.int64()),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(asof_group, batch_format="pyarrow")


ASOF_ORACLE_SQL = """
SELECT p.event_id, p.user_id, p.ts,
       c.event_id AS click_event_id, c.ts AS click_ts,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT user_id, ts, max(event_id) AS event_id
           FROM events WHERE event_type = 'click'
           GROUP BY user_id, ts) c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""".strip()


def lineitem_quantiles(sf_dir: str):
    """Exact distributed percentiles (p25/p50/p75/p90 of l_quantity per
    return flag) via value-histogram partial aggregation: l_quantity is
    low-cardinality, so each batch emits (flag, qty, n) partials, one
    small ``groupby`` sums them, and a per-flag kernel walks the
    cumulative histogram — no global sort, shuffle size bounded by
    (flags × distinct values) regardless of corpus rows. Matches DuckDB
    ``quantile_disc`` (lower discrete quantile: element at index
    ceil(q·n)-1 of the sorted multiset).
    """
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"flag": t["l_returnflag"], "qty": t["l_quantity"]})
             .group_by(["flag", "qty"]).aggregate([([], "count_all")]))
        return pa.table({"flag": g["flag"], "qty": g["qty"],
                         "n": g["count_all"].cast(pa.int64())})

    hist = (li.map_batches(partial, batch_format="pyarrow")
            .groupby(["flag", "qty"]).aggregate(Sum("n", alias_name="n")))

    out_schema = pa.schema([("l_returnflag", pa.string()),
                            ("p25", pa.float64()), ("p50", pa.float64()),
                            ("p75", pa.float64()), ("p90", pa.float64())])

    def quantiles(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("qty", "ascending")])
        t = t.take(order)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        cum = np.cumsum(n)
        total = int(cum[-1])
        vals = {}
        for name, q in [("p25", 0.25), ("p50", 0.5), ("p75", 0.75),
                        ("p90", 0.9)]:
            k = max(1, int(np.ceil(q * total)))  # 1-based rank
            vals[name] = float(qty[np.searchsorted(cum, k)])
        return pa.table({"l_returnflag": [t["flag"][0].as_py()],
                         **{k: [v] for k, v in vals.items()}},
                        schema=out_schema)

    return hist.groupby("flag").map_groups(quantiles, batch_format="pyarrow")


QUANTILES_ORACLE_SQL = """
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS p25,
       quantile_disc(l_quantity, 0.50) AS p50,
       quantile_disc(l_quantity, 0.75) AS p75,
       quantile_disc(l_quantity, 0.90) AS p90
FROM lineitem GROUP BY l_returnflag
""".strip()


def revenue_by_nation(sf_dir: str, broadcast_threshold: int | None = None):
    """TPC-H-Q5-flavored: lineitem ⋈ supplier ⋈ nation ⋈ region →
    revenue per (region, nation). nation (25 rows) and region (5) are
    FIXED size at any scale factor — they fold into a driver dict that
    decorates supplier into one (s_suppkey → r_name, n_name) dimension.
    supplier grows linearly (TPC-H: 10k × SF rows), so the fact-side
    attach goes through ``stages.labeljoin.attach_dim``'s size-gated
    policy (broadcast ``searchsorted`` lookup under the threshold, a
    partitioned shuffle join above it). Per-batch partial aggregation
    keeps the final exchange at few-group size. Revenue is exact
    integer arithmetic (price-cents × (100 − discount-pct)), so the
    hash compare cannot drift on float summation order.
    """
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"])
    rmap = dict(zip(reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist()))
    nmap = {k: (rmap[rk], n) for k, n, rk in
            zip(nat["n_nationkey"].to_pylist(), nat["n_name"].to_pylist(),
                nat["n_regionkey"].to_pylist())}

    def decorate_supplier(t: pa.Table) -> pa.Table:
        pairs = [nmap[k] for k in t["s_nationkey"].to_pylist()]
        return pa.table({
            "s_suppkey": t["s_suppkey"],
            "r_name": pa.array([p[0] for p in pairs], pa.string()),
            "n_name": pa.array([p[1] for p in pairs], pa.string()),
        })

    sup = (rd.read_parquet(f"{sf_dir}/supplier.parquet",
                           columns=["s_suppkey", "s_nationkey"])
           .map_batches(decorate_supplier, batch_format="pyarrow"))

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    joined = attach_dim(li, sup, "l_suppkey", "s_suppkey",
                        ["r_name", "n_name"], broadcast_threshold=bt)

    def partial(t: pa.Table) -> pa.Table:
        price_c = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                          * 100).astype(np.int64)
        disc_pct = np.rint(t["l_discount"].to_numpy(zero_copy_only=False)
                           * 100).astype(np.int64)
        part = (pa.table({
            "r_name": t["r_name"], "n_name": t["n_name"],
            "rev": pa.array(price_c * (100 - disc_pct), pa.int64()),
        }).group_by(["r_name", "n_name"]).aggregate([("rev", "sum")]))
        return part.rename_columns(["r_name", "n_name", "revenue_u"])

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby(["r_name", "n_name"])
            .aggregate(Sum("revenue_u", alias_name="revenue_u")))


REVENUE_ORACLE_SQL = """
SELECT r.r_name, n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_u
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""".strip()


def events_running_total(sf_dir: str):
    """Cumulative window: per-user running sum of ``value`` in ts
    order (SUM() OVER (PARTITION BY user ORDER BY ts)). One
    ``groupby(user_id)`` shuffle + a vectorized per-group sorted
    cumsum — same partitioning contract as events_asof_join. The
    running sum is emitted in integer cents (value has 2 decimals) so
    cumulative float error cannot leak into the hash compare.
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    out_schema = pa.schema([
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("running_u", pa.int64()),
    ])

    def cumsum_group(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                                 ("event_id", "ascending")]))
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "ts": t["ts"],
            "running_u": pa.array(np.cumsum(cents), pa.int64()),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(cumsum_group,
                                            batch_format="pyarrow")


RUNNING_ORACLE_SQL = """
SELECT event_id, user_id, ts,
       CAST(sum(CAST(round(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)
           AS running_u
FROM events
""".strip()


def events_sliding_count(sf_dir: str):
    """Sliding RANGE window: for every event, how many of the same
    user's events fall in (ts − 1 h, ts] — SQL RANGE BETWEEN INTERVAL 1
    HOUR PRECEDING AND CURRENT ROW semantics, peers (equal ts)
    included. One groupby(user) shuffle; the per-group kernel is two
    vectorized searchsorted calls over the sorted timestamp array (the
    boundary array ts−1h is monotone, so the whole group resolves in
    O(n log n) with no Python per row).
    """
    import numpy as np
    import ray.data as rd

    HOUR_US = 3_600_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def per_user(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(t, sort_keys=[("ts", "ascending"),
                                              ("event_id", "ascending")])
        t = t.take(order)
        us = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        lo = np.searchsorted(us, us - HOUR_US, side="left")
        hi = np.searchsorted(us, us, side="right")   # peers included
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "n_window": pa.array((hi - lo).astype(np.int64)),
        })

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


SLIDING_ORACLE_SQL = """
SELECT user_id, event_id,
       count(*) OVER (PARTITION BY user_id ORDER BY ts
                      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                      AND CURRENT ROW) AS n_window
FROM events
""".strip()


# the synthetic events table's closed type vocabulary — a pivot needs a
# fixed output schema, so the columns are pinned (and asserted) here
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot(sf_dir: str):
    """Pivot (wide aggregate): per-user event counts spread over one
    column per event type. Per-batch partials pivot locally (Arrow
    filter masks, one row per user per batch), then a single
    groupby(user).Sum per column — the shuffle carries the already-wide
    partials, never one row per event.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        uids = t["user_id"].to_numpy(zero_copy_only=False)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        uniq = np.unique(uids)
        cols = {"user_id": pa.array(uniq, pa.int64())}
        for et in EVENT_TYPES:
            sel = uids[types == et]
            cnt = np.zeros(len(uniq), dtype=np.int64)
            if len(sel):
                idx, c = np.unique(sel, return_counts=True)
                cnt[np.searchsorted(uniq, idx)] = c
            cols[f"n_{et}"] = pa.array(cnt)
        return pa.table(cols)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(*[Sum(f"n_{et}", alias_name=f"n_{et}")
                         for et in EVENT_TYPES]))


PIVOT_ORACLE_SQL = "SELECT user_id, " + ", ".join(
    f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_{et}" for et in EVENT_TYPES) + " FROM events GROUP BY user_id"


def orders_price_quantiles(sf_dir: str, collect_max: int = 65536):
    """Exact quantiles (p25/p50/p75/p90) of o_totalprice — a
    HIGH-cardinality double column, where the value-histogram trick of
    ``lineitem_quantiles`` (one row per distinct value) would not
    bound the shuffle. Classic iterative histogram refinement instead:
    each round is ONE streaming scan that bin-counts the values of
    every still-open quantile's candidate range (per-batch numpy
    bincount partials, one small groupby to sum), the driver descends
    into the bucket containing each target rank, and once a range
    holds ≤ ``collect_max`` values they are pulled and selected
    exactly. Driver state is O(buckets × quantiles); passes are
    O(log_B(range cardinality)) — 2 scans end-to-end here, ~3-4 at
    100 TB. Matches DuckDB quantile_disc (k = ceil(q·n), 1-based).
    """
    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    B = 1024
    QS = [("p25", 0.25), ("p50", 0.5), ("p75", 0.75), ("p90", 0.9)]

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice"]).materialize()
    n = ds.count()
    if n == 0:
        # matches quantile_disc over empty: one all-NULL row
        return rd.from_arrow(pa.table(
            {name: pa.nulls(1, pa.float64()) for name, _ in QS}))
    # open state per quantile: (rank k within [lo, hi), count in range)
    state = {name: {"k": max(1, int(np.ceil(q * n))), "lo": None,
                    "hi": None, "cnt": n, "val": None}
             for name, q in QS}

    def _hist(ranges: dict) -> dict:
        """One scan: per-quantile B-bucket counts over its [lo, hi)."""
        def partial(t: pa.Table) -> pa.Table:
            v = t["o_totalprice"].to_numpy(zero_copy_only=False)
            names, buckets, counts = [], [], []
            for name, (lo, hi) in ranges.items():
                sel = v if lo is None else v[(v >= lo) & (v < hi)]
                if lo is None:
                    lo_, hi_ = (float(v.min()), float(np.nextafter(
                        v.max(), np.inf))) if len(v) else (0.0, 1.0)
                else:
                    lo_, hi_ = lo, hi
                if len(sel):
                    b = np.minimum(((sel - lo_) * B / (hi_ - lo_))
                                   .astype(np.int64), B - 1)
                    idx, c = np.unique(b, return_counts=True)
                    names += [name] * len(idx)
                    buckets += idx.tolist()
                    counts += c.tolist()
            return pa.table({"q": pa.array(names, pa.string()),
                             "b": pa.array(buckets, pa.int64()),
                             "n": pa.array(counts, pa.int64())})

        out = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["q", "b"]).aggregate(Sum("n", alias_name="n")))
        hists: dict = {}
        for batch in out.iter_batches(batch_format="pyarrow"):
            for r in batch.to_pylist():
                hists.setdefault(r["q"], np.zeros(B, np.int64))[r["b"]] += r["n"]
        return hists

    # the first histogram pass needs the real value bounds — ONE fused
    # aggregate scan (separate .min()/.max() calls would scan twice)
    from ray.data.aggregate import Max, Min
    mm = ds.aggregate(Min("o_totalprice", alias_name="mn"),
                      Max("o_totalprice", alias_name="mx"))
    gmin = mm["mn"]
    gmax = float(np.nextafter(mm["mx"], np.inf))
    for s in state.values():
        s["lo"], s["hi"] = float(gmin), gmax

    while True:
        open_qs = {name: (s["lo"], s["hi"]) for name, s in state.items()
                   if s["val"] is None and s["cnt"] > collect_max}
        if not open_qs:
            break
        hists = _hist(open_qs)
        for name in open_qs:
            s = state[name]
            h = hists[name]
            cum = np.cumsum(h)
            j = int(np.searchsorted(cum, s["k"]))
            width = (s["hi"] - s["lo"]) / B
            s["k"] -= int(cum[j - 1]) if j else 0
            s["lo"], s["hi"] = s["lo"] + j * width, s["lo"] + (j + 1) * width
            s["cnt"] = int(h[j])

    def _collect(lo: float, hi: float) -> np.ndarray:
        def f(t: pa.Table) -> pa.Table:
            v = t["o_totalprice"]
            return t.filter(pc.and_(pc.greater_equal(v, lo),
                                    pc.less(v, hi)))
        vals = [b["o_totalprice"].to_numpy(zero_copy_only=False)
                for b in ds.map_batches(f, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")]
        return np.sort(np.concatenate(vals)) if vals else np.array([])

    for s in state.values():
        if s["val"] is None:
            vals = _collect(s["lo"], s["hi"])
            s["val"] = float(vals[s["k"] - 1])

    return rd.from_arrow(pa.table(
        {name: pa.array([state[name]["val"]], pa.float64())
         for name, _ in QS}))


PRICE_QUANTILES_ORACLE_SQL = """
SELECT quantile_disc(o_totalprice, 0.25) AS p25,
       quantile_disc(o_totalprice, 0.50) AS p50,
       quantile_disc(o_totalprice, 0.75) AS p75,
       quantile_disc(o_totalprice, 0.90) AS p90
FROM orders
""".strip()


def events_rollup(sf_dir: str):
    """ROLLUP(event_type, day): counts at (type, day), (type) and grand
    total, NULLs marking rolled-up levels. The finest level aggregates
    ONCE from the raw events; both coarser levels re-aggregate the
    (already tiny, types × days) finest result — never a second scan of
    the fact table. Matches DuckDB GROUP BY ROLLUP.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..rayutil import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/events.parquet") == 0:
        # SQL ROLLUP over an empty table still yields the grand total
        return rd.from_arrow(pa.table({
            "event_type": pa.nulls(1, pa.string()),
            "day": pa.nulls(1, pa.timestamp("us")),
            "n": pa.array([0], pa.int64())}))

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "day": pc.floor_temporal(
                             t["ts"].cast(pa.timestamp("us")), unit="day")})

    finest = (ev.map_batches(to_day, batch_format="pyarrow")
              .groupby(["event_type", "day"])
              .aggregate(Count(alias_name="n"))).materialize()

    def _shape(t: pa.Table, null_type: bool, null_day: bool) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "event_type": (pa.nulls(n, pa.string()) if null_type
                           else t["event_type"]),
            "day": (pa.nulls(n, pa.timestamp("us")) if null_day
                    else t["day"].cast(pa.timestamp("us"))),
            "n": t["n"].cast(pa.int64()),
        })

    by_type = (finest.groupby("event_type")
               .aggregate(Sum("n", alias_name="n"))
               .map_batches(lambda t: _shape(t, False, True),
                            batch_format="pyarrow"))
    # grand total: one scalar off the already-aggregated finest table
    total = rd.from_arrow(pa.table({
        "event_type": pa.nulls(1, pa.string()),
        "day": pa.nulls(1, pa.timestamp("us")),
        "n": pa.array([int(finest.sum("n"))], pa.int64())}))
    fin = finest.map_batches(lambda t: _shape(t, False, False),
                             batch_format="pyarrow")
    return fin.union(by_type).union(total)


ROLLUP_ORACLE_SQL = """
SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
FROM events GROUP BY ROLLUP(event_type, day)
""".strip()


def events_cube(sf_dir: str):
    """CUBE(event_type, day): the rollup's three levels plus the
    (·, day) marginal. Same one-scan shape — the fact table is
    aggregated once at the finest grain and all three coarser levels
    re-aggregate that tiny (types × days) result. Matches DuckDB
    GROUP BY CUBE.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..rayutil import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/events.parquet") == 0:
        return rd.from_arrow(pa.table({
            "event_type": pa.nulls(1, pa.string()),
            "day": pa.nulls(1, pa.timestamp("us")),
            "n": pa.array([0], pa.int64())}))

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def to_day(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "day": pc.floor_temporal(
                             t["ts"].cast(pa.timestamp("us")), unit="day")})

    finest = (ev.map_batches(to_day, batch_format="pyarrow")
              .groupby(["event_type", "day"])
              .aggregate(Count(alias_name="n"))).materialize()

    def _shape(t: pa.Table, null_type: bool, null_day: bool) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "event_type": (pa.nulls(n, pa.string()) if null_type
                           else t["event_type"]),
            "day": (pa.nulls(n, pa.timestamp("us")) if null_day
                    else t["day"].cast(pa.timestamp("us"))),
            "n": t["n"].cast(pa.int64()),
        })

    by_type = (finest.groupby("event_type")
               .aggregate(Sum("n", alias_name="n"))
               .map_batches(lambda t: _shape(t, False, True),
                            batch_format="pyarrow"))
    by_day = (finest.groupby("day")
              .aggregate(Sum("n", alias_name="n"))
              .map_batches(lambda t: _shape(t, True, False),
                           batch_format="pyarrow"))
    total = rd.from_arrow(pa.table({
        "event_type": pa.nulls(1, pa.string()),
        "day": pa.nulls(1, pa.timestamp("us")),
        "n": pa.array([int(finest.sum("n"))], pa.int64())}))
    fin = finest.map_batches(lambda t: _shape(t, False, False),
                             batch_format="pyarrow")
    return fin.union(by_type).union(by_day).union(total)


CUBE_ORACLE_SQL = """
SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n
FROM events GROUP BY CUBE(event_type, day)
""".strip()


def parts_above_brand_avg(sf_dir: str):
    """Correlated-subquery shape: parts priced strictly above their
    brand's average retail price. Two passes over the pruned fact
    columns: per-brand (sum_cents, n) partials shrink to one row per
    (brand, batch) before a groupby whose output is the BRAND table —
    25 rows at any TPC-H scale factor (brands are a fixed vocabulary,
    unlike customer/supplier, so the ``ray.put`` broadcast needs no
    size gate). The filter compares in exact integer cross-multiplied
    form (price_cents * n > sum_cents) — no float average, so the
    strictly-above predicate cannot drift from the oracle's.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand",
                                     "p_retailprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        brands = t["p_brand"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(brands, return_inverse=True)
        return pa.table({
            "p_brand": pa.array(uniq, pa.string()),
            "s": pa.array(np.bincount(inv, weights=cents).astype(np.int64)),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
        })

    brand_stats = (parts.map_batches(partial, batch_format="pyarrow")
                   .groupby("p_brand")
                   .aggregate(Sum("s", alias_name="s"),
                              Sum("n", alias_name="n"))
                   .to_pandas())

    out_schema = pa.schema([("p_partkey", pa.int64()),
                            ("p_brand", pa.string()),
                            ("price_cents", pa.int64())])
    if brand_stats.empty or "p_brand" not in brand_stats.columns:
        return rd.from_arrow(out_schema.empty_table())
    stats_ref = ray.put({b: (int(s), int(n)) for b, s, n in zip(
        brand_stats["p_brand"], brand_stats["s"], brand_stats["n"])})

    def above(t: pa.Table) -> pa.Table:
        stats = ray.get(stats_ref)
        cents = np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        brands = t["p_brand"].to_numpy(zero_copy_only=False)
        # vectorized lookup: factorize the batch's brands once
        uniq, inv = np.unique(brands, return_inverse=True)
        s = np.array([stats[b][0] for b in uniq], np.int64)[inv]
        n = np.array([stats[b][1] for b in uniq], np.int64)[inv]
        keep = cents * n > s
        t = t.filter(pa.array(keep))
        return pa.table({
            "p_partkey": t["p_partkey"].cast(pa.int64()),
            "p_brand": t["p_brand"],
            "price_cents": pa.array(cents[keep], pa.int64()),
        }, schema=out_schema)

    return parts.map_batches(above, batch_format="pyarrow")


ABOVE_AVG_ORACLE_SQL = """
WITH b AS (
  SELECT p_brand,
         sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS s,
         count(*) AS n
  FROM part GROUP BY p_brand)
SELECT p_partkey, p.p_brand,
       CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
FROM part p JOIN b USING (p_brand)
WHERE CAST(round(p_retailprice * 100) AS BIGINT) * n > s
""".strip()


def events_gap_fill(sf_dir: str):
    """Time-series densification: per (user, day) event counts with the
    missing days BETWEEN each user's first and last active day filled
    with n=0 — the gap-fill/resample step a metrics pipeline runs
    before any window math. Shape: a per-batch (user, day, count)
    partial shrinks the exchange to at most (users × active days) thin
    rows, then ONE groupby(user_id) whose kernel merges the partials
    and materializes the dense day range with a vectorized searchsorted
    scatter — per-group output is bounded by the user's own span, and
    there is no generate_series-style global driver loop.
    """
    import ray.data as rd

    DAY_US = 86_400_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    thin_schema = pa.schema([("user_id", pa.int64()),
                             ("day_us", pa.int64()),
                             ("n", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"].cast(pa.timestamp("us")),
                                unit="day").cast(pa.int64())
        g = (pa.table({"user_id": t["user_id"].cast(pa.int64()),
                       "day_us": day})
             .group_by(["user_id", "day_us"])
             .aggregate([([], "count_all")]))
        return pa.table({"user_id": g["user_id"], "day_us": g["day_us"],
                         "n": g["count_all"].cast(pa.int64())},
                        schema=thin_schema)

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("day", pa.timestamp("us")),
                            ("n", pa.int64())])

    def fill(g: pa.Table) -> pa.Table:
        uid = g["user_id"][0].as_py()
        day = g["day_us"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        dense = np.arange(day.min(), day.max() + DAY_US, DAY_US)
        counts = np.zeros(len(dense), np.int64)
        np.add.at(counts, np.searchsorted(dense, day), n)
        return pa.table({
            "user_id": pa.array(np.full(len(dense), uid, np.int64)),
            "day": pa.array(dense, pa.int64()).cast(pa.timestamp("us")),
            "n": pa.array(counts, pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").map_groups(fill, batch_format="pyarrow"))


GAP_FILL_ORACLE_SQL = """
WITH d AS (
  SELECT user_id, date_trunc('day', ts) AS day, count(*) AS n
  FROM events GROUP BY 1, 2),
b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM d
      GROUP BY user_id),
s AS (SELECT user_id,
             unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM b)
SELECT s.user_id, s.day, coalesce(d.n, 0)::BIGINT AS n
FROM s LEFT JOIN d ON s.user_id = d.user_id AND s.day = d.day
""".strip()


# ---------------------------------------------------------------------------
# Z-order (Morton) locality index

Z_BITS = 16                    # 16 bits per dimension → 32-bit z-value


def events_zorder(sf_dir: str):
    """Morton / Z-order locality key over (user_id, minute-of-epoch):
    the two 16-bit coordinates interleave bit-by-bit, so events close
    in BOTH dimensions land close in z — the layout key that turns a
    (user, time-range) scan over sorted/row-grouped Parquet into a
    handful of contiguous reads instead of a full pass. Map-only and
    exact-integer: numpy shift/mask kernels per batch; the oracle is
    the same 32-term bit sum generated symbolically, so the two sides
    cannot drift. Sorting/writing by z is the caller's layout choice —
    the op emits the key, which is the scale-relevant part.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def zval(t: pa.Table) -> pa.Table:
        u = (t["user_id"].to_numpy(zero_copy_only=False)
             .astype(np.int64)) & 0xFFFF
        ts_us = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        m = (ts_us // 60_000_000) & 0xFFFF       # minute-of-epoch mod 2^16
        z = np.zeros(len(u), np.int64)
        for i in range(Z_BITS):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((m >> i) & 1) << (2 * i + 1)
        return pa.table({"event_id": t["event_id"].cast(pa.int64()),
                         "z": pa.array(z, pa.int64())})

    return ev.map_batches(zval, batch_format="pyarrow")


def _zorder_oracle_sql(bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((u >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"((m >> {i}) & 1) * {1 << (2 * i + 1)}")
    expr = "\n       + ".join(terms)
    return f"""
WITH b AS (
  SELECT event_id,
         CAST(user_id AS BIGINT) & 65535 AS u,
         (CAST(epoch_us(ts) AS BIGINT) // 60000000) & 65535 AS m
  FROM events)
SELECT event_id,
       CAST({expr} AS BIGINT) AS z
FROM b
""".strip()


ZORDER_ORACLE_SQL = _zorder_oracle_sql()


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier (minimize price, maximize size)


def _skyline_kernel(t: pa.Table) -> pa.Table:
    """Rows of ``t`` not dominated by any other row of ``t``.
    Dominance: b dominates a iff b.price_c <= a.price_c and
    b.p_size >= a.p_size with at least one strict. Equal (price, size)
    pairs never dominate each other, so frontier duplicates all
    survive. One sort by (price asc, size desc): a row is dominated
    iff a strictly cheaper row has size >= its own (prefix max over
    earlier price runs) or a same-price row has size strictly greater
    (the run head, since within a run size is non-increasing).
    """
    order = pc.sort_indices(t, sort_keys=[("price_c", "ascending"),
                                          ("p_size", "descending"),
                                          ("p_partkey", "ascending")])
    t = t.take(order)
    price = t["price_c"].to_numpy(zero_copy_only=False)
    size = t["p_size"].to_numpy(zero_copy_only=False)
    n = len(price)
    if n == 0:
        return t
    new_run = np.empty(n, dtype=bool)
    new_run[0] = True
    np.not_equal(price[1:], price[:-1], out=new_run[1:])
    run_id = np.cumsum(new_run) - 1
    run_head_size = size[new_run][run_id]        # max size in own run
    # max size over all STRICTLY cheaper rows = running max of previous
    # run heads (run r sees max over heads 0..r-1)
    head_max = np.maximum.accumulate(size[new_run])
    prev_run_max = np.concatenate(
        [[np.iinfo(np.int64).min], head_max[:-1]])[run_id]
    dominated = (prev_run_max >= size) | (run_head_size > size)
    return t.filter(pa.array(~dominated))


def parts_skyline(sf_dir: str):
    """Pareto frontier of parts: cheapest price vs. largest size, all
    ties kept. Distributed shape: a row dominated inside one block is
    dominated globally, so each block prunes to its LOCAL skyline
    first (map-only, no exchange), and only the surviving frontier
    candidates — a vanishingly small fraction of any real table —
    meet in one final single-group pass that applies the same kernel.
    The candidate set, not the table, bounds the reduce: for n rows of
    random (price, size) the expected local skyline is O(log n) per
    block, and the final group is the union of those.
    """
    import ray.data as rd

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_name", "p_size",
                                    "p_retailprice"])

    schema = pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                        ("price_c", pa.int64()), ("p_size", pa.int64())])

    def local(t: pa.Table) -> pa.Table:
        t = pa.table({
            "p_partkey": t["p_partkey"].cast(pa.int64()),
            "p_name": t["p_name"],
            "price_c": pa.array(
                np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)),
            "p_size": t["p_size"].cast(pa.int64()),
        }, schema=schema)
        out = _skyline_kernel(t)
        return out.append_column("_k", pa.array(np.zeros(out.num_rows,
                                                         np.int64)))

    def final(t: pa.Table) -> pa.Table:
        return _skyline_kernel(t.select(
            ["p_partkey", "p_name", "price_c", "p_size"]))

    return (part.map_batches(local, batch_format="pyarrow")
            .groupby("_k").map_groups(final, batch_format="pyarrow"))


SKYLINE_ORACLE_SQL = """
WITH p AS (
  SELECT p_partkey, p_name,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS p_size
  FROM part)
SELECT p_partkey, p_name, price_c, p_size
FROM p a
WHERE NOT EXISTS (
  SELECT 1 FROM p b
  WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
    AND (b.price_c < a.price_c OR b.p_size > a.p_size))
""".strip()


# ---------------------------------------------------------------------------
# UNPIVOT / melt: wide numeric attributes -> long (key, attr, val) rows


def parts_unpivot(sf_dir: str):
    """Melt part's numeric attributes (size, retail price in cents)
    into long (p_partkey, attr, val) rows — the UNPIVOT shape every
    feature-store export needs. Map-only: each batch emits its own
    long rows by column concatenation (two takes + a literal attr
    column), no exchange at all, so it streams at any scale.
    """
    import ray.data as rd

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_size", "p_retailprice"])

    out_schema = pa.schema([("p_partkey", pa.int64()),
                            ("attr", pa.string()), ("val", pa.int64())])

    def melt(t: pa.Table) -> pa.Table:
        keys = t["p_partkey"].cast(pa.int64())
        size = t["p_size"].cast(pa.int64())
        price = pa.array(
            np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64))
        n = t.num_rows
        return pa.table({
            "p_partkey": pa.concat_arrays(
                [keys.combine_chunks(), keys.combine_chunks()]),
            "attr": pa.array(["size"] * n + ["price_c"] * n, pa.string()),
            "val": pa.concat_arrays([size.combine_chunks(), price]),
        }, schema=out_schema)

    return part.map_batches(melt, batch_format="pyarrow")


UNPIVOT_ORACLE_SQL = """
SELECT p_partkey, 'size' AS attr, CAST(p_size AS BIGINT) AS val FROM part
UNION ALL
SELECT p_partkey, 'price_c' AS attr,
       CAST(round(p_retailprice * 100) AS BIGINT) AS val FROM part
""".strip()


# ---------------------------------------------------------------------------
# DISTINCT ON / first-occurrence-per-window dedup


def events_first_per_window(sf_dir: str):
    """Event-log dedup at (user, day, type) grain: keep the first
    arrival (min event_id) per window and report how many duplicates
    it absorbed — the DISTINCT ON shape that turns an at-least-once
    event stream into an exactly-once one. Per-batch Arrow group_by
    shrinks to (window → min, count) partials before the single keyed
    groupby, so the exchange carries windows, never events.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"].cast(pa.timestamp("us")),
                                unit="day").cast(pa.int64())
        g = (pa.table({"user_id": t["user_id"].cast(pa.int64()),
                       "day_us": day,
                       "event_type": t["event_type"],
                       "event_id": t["event_id"].cast(pa.int64())})
             .group_by(["user_id", "day_us", "event_type"])
             .aggregate([("event_id", "min"), ([], "count_all")]))
        return pa.table({"user_id": g["user_id"], "day_us": g["day_us"],
                         "event_type": g["event_type"],
                         "first_eid": g["event_id_min"],
                         "n_dups": g["count_all"].cast(pa.int64())})

    agg = (ev.map_batches(partial, batch_format="pyarrow")
           .groupby(["user_id", "day_us", "event_type"])
           .aggregate(Min("first_eid", alias_name="first_event_id"),
                      Sum("n_dups", alias_name="n_in_window")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "day": t["day_us"].cast(pa.timestamp("us")),
            "event_type": t["event_type"],
            "first_event_id": t["first_event_id"].cast(pa.int64()),
            "n_in_window": t["n_in_window"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


FIRST_PER_WINDOW_ORACLE_SQL = """
SELECT user_id, date_trunc('day', ts) AS day, event_type,
       CAST(min(event_id) AS BIGINT) AS first_event_id,
       count(*) AS n_in_window
FROM events GROUP BY 1, 2, 3
""".strip()


# ---------------------------------------------------------------------------
# Diversified top-k (global ranking under a per-group quota)

DIV_TOPK = 10
DIV_PER_BRAND = 2


def parts_topk_diversified(sf_dir: str, k: int = DIV_TOPK,
                           per_group: int = DIV_PER_BRAND):
    """Global top-``k`` parts by (price DESC, partkey) holding AT MOST
    ``per_group`` per brand — the diversified-ranking shape (search
    results, recommendations) a plain LIMIT cannot express. Greedy
    selection in global order equals "brand-rank ≤ per_group, then
    global top-k" (a row's brand rank counts exactly its earlier
    same-brand rows), so the distributed plan is lossless: per-BLOCK
    per-brand top-``per_group`` partials, one brand groupby to settle
    the global brand ranks, then the bounded top-k merge. Price in
    integer cents so the order is hash-stable.
    """
    import ray.data as rd

    from .stats import _topk_table

    parts = rd.read_parquet(f"{sf_dir}/part.parquet",
                            columns=["p_partkey", "p_brand",
                                     "p_retailprice"])

    def cents(t: pa.Table) -> pa.Table:
        import numpy as np
        c = np.rint(t["p_retailprice"].to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64)
        return pa.table({"p_partkey": t["p_partkey"].cast(pa.int64()),
                         "p_brand": t["p_brand"],
                         "price_c": pa.array(c, pa.int64())})

    def block_per_brand(t: pa.Table) -> pa.Table:
        import numpy as np
        # lossless per-block shrink: keep each brand's local top
        # per_group by (price DESC, partkey ASC) — one lexsort, ranks
        # from run boundaries, no per-row Python
        bc = (t["p_brand"].combine_chunks().dictionary_encode()
              .indices.to_numpy(zero_copy_only=False).astype(np.int64))
        price = t["price_c"].to_numpy(zero_copy_only=False)
        pk = t["p_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, -price, bc))
        b_sorted = bc[order]
        starts = np.flatnonzero(np.r_[True, b_sorted[1:] != b_sorted[:-1]])
        rank = np.arange(len(order)) - np.repeat(
            starts, np.diff(np.r_[starts, len(order)]))
        keep = np.sort(order[rank < per_group])
        return t.take(pa.array(keep, pa.int64()))

    cand = parts.map_batches(cents, batch_format="pyarrow") \
                .map_batches(block_per_brand, batch_format="pyarrow")

    def brand_rank(g: pa.Table) -> pa.Table:
        import numpy as np
        price = g["price_c"].to_numpy(zero_copy_only=False)
        pk = g["p_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((pk, -price))
        g = g.take(pa.array(order[:per_group], pa.int64()))
        return g

    settled = cand.groupby("p_brand").map_groups(brand_rank,
                                                 batch_format="pyarrow")
    out_schema = pa.schema([("p_partkey", pa.int64()),
                            ("p_brand", pa.string()),
                            ("price_c", pa.int64())])
    return _topk_table(settled, [("price_c", "descending"),
                                 ("p_partkey", "ascending")], k, out_schema)


DIV_TOPK_ORACLE_SQL = f"""
WITH c AS (SELECT p_partkey, p_brand,
                  CAST(round(p_retailprice * 100) AS BIGINT) AS price_c
           FROM part),
r AS (SELECT *, row_number() OVER (PARTITION BY p_brand
                                   ORDER BY price_c DESC, p_partkey) AS rn
      FROM c)
SELECT p_partkey, p_brand, price_c
FROM r WHERE rn <= {DIV_PER_BRAND}
ORDER BY price_c DESC, p_partkey LIMIT {DIV_TOPK}
""".strip()
