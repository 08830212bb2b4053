"""User-behavior analytics: ordered funnel conversion and cohort
retention — the two aggregate shapes a product-metrics pipeline runs on
an event log.

Both share one scale discipline: the events table is pruned and
pre-shrunk per batch BEFORE the only corpus-proportional exchange (a
groupby(user_id)), each per-user kernel is bounded by that user's own
history, and the final aggregates are over tiny key spaces (stages,
cohort×offset cells) reached through per-batch partial counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Funnel stage sequence, in order. A stage counts as reached when an
# event of its type occurs STRICTLY AFTER the previous stage's matched
# event (greedy earliest-match, which is exact for subsequence
# existence); equal timestamps do not advance the funnel on either the
# Ray or the SQL side.
FUNNEL_STAGES = ("view", "click", "purchase")


def events_funnel(sf_dir: str):
    """Per funnel depth, how many users reached exactly that stage
    (0 = active but never viewed). One filtered scan (only the three
    stage types survive to the shuffle... plus a thin all-users pass so
    stage-0 users still count), one groupby(user_id) whose kernel runs
    the greedy subsequence match over the user's sorted history, then a
    stages-sized partial-count aggregate.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    thin_schema = pa.schema([("user_id", pa.int64()),
                             ("ts_us", pa.int64()),
                             ("stage", pa.int8())])

    def thin(t: pa.Table) -> pa.Table:
        # stage index per event; -1 rows are kept ONLY as user markers
        # (deduped per batch) so users with no funnel events count at 0
        st = np.full(t.num_rows, -1, np.int8)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        for i, name in enumerate(FUNNEL_STAGES):
            st[types == name] = i
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        keep = st >= 0
        marker_uids = np.unique(uid[~keep])
        return pa.table({
            "user_id": pa.array(np.concatenate([uid[keep], marker_uids])),
            "ts_us": pa.array(np.concatenate(
                [ts[keep], np.zeros(len(marker_uids), np.int64)])),
            "stage": pa.array(np.concatenate(
                [st[keep], np.full(len(marker_uids), -1, np.int8)])),
        }, schema=thin_schema)

    depth_schema = pa.schema([("stage_reached", pa.int64()),
                              ("n_users", pa.int64())])

    def per_user(g: pa.Table) -> pa.Table:
        st = g["stage"].to_numpy(zero_copy_only=False)
        ts = g["ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((st, ts))  # ts asc; stage order irrelevant
        st, ts = st[order], ts[order]
        reached, last_t = 0, None
        for k in range(len(FUNNEL_STAGES)):
            cand = (st == k) if last_t is None else ((st == k)
                                                     & (ts > last_t))
            pos = np.flatnonzero(cand)
            if len(pos) == 0:
                break
            last_t = ts[pos[0]]
            reached = k + 1
        return pa.table({"stage_reached": pa.array([reached], pa.int64()),
                         "n_users": pa.array([1], pa.int64())},
                        schema=depth_schema)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("stage_reached").aggregate([("n_users", "sum")])
        return g.rename_columns(["stage_reached", "n_users"])

    return (ev.map_batches(thin, batch_format="pyarrow")
            .groupby("user_id").map_groups(per_user, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("stage_reached")
            .aggregate(Sum("n_users", alias_name="n_users")))


FUNNEL_ORACLE_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
s1 AS (SELECT user_id, min(ts) AS t1 FROM events
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
       JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
       JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
SELECT CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
            WHEN s2.user_id IS NOT NULL THEN 2
            WHEN s1.user_id IS NOT NULL THEN 1
            ELSE 0 END AS BIGINT) AS stage_reached,
       count(*) AS n_users
FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
       LEFT JOIN s3 USING (user_id)
GROUP BY 1
""".strip()


def events_cohort_retention(sf_dir: str):
    """Cohort retention triangle: users grouped by their FIRST active
    day, counted per day-offset they came back on. Per-batch (user,
    day) distinct partials shrink the exchange; one groupby(user_id)
    kernel derives (cohort, offset) cells from the user's own distinct
    days (each user contributes at most one row per cell by
    construction, so the final count is a sum of ones); per-batch
    partials shrink the last aggregate to the cohort×offset key space.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def days(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"].cast(pa.timestamp("us")),
                                unit="day").cast(pa.int64())
        return (pa.table({"user_id": t["user_id"].cast(pa.int64()),
                          "day_us": day})
                .group_by(["user_id", "day_us"]).aggregate([]))

    cell_schema = pa.schema([("cohort_day", pa.timestamp("us")),
                             ("day_offset", pa.int64()),
                             ("n_users", pa.int64())])

    def per_user(g: pa.Table) -> pa.Table:
        d = np.unique(g["day_us"].to_numpy(zero_copy_only=False))
        cohort = d[0]
        return pa.table({
            "cohort_day": pa.array(np.full(len(d), cohort, np.int64))
                            .cast(pa.timestamp("us")),
            "day_offset": pa.array((d - cohort) // DAY_US, pa.int64()),
            "n_users": pa.array(np.ones(len(d), np.int64)),
        }, schema=cell_schema)

    def partial(t: pa.Table) -> pa.Table:
        g = (t.group_by(["cohort_day", "day_offset"])
             .aggregate([("n_users", "sum")]))
        return g.rename_columns(["cohort_day", "day_offset", "n_users"])

    return (ev.map_batches(days, batch_format="pyarrow")
            .groupby("user_id").map_groups(per_user, batch_format="pyarrow")
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["cohort_day", "day_offset"])
            .aggregate(Sum("n_users", alias_name="n_users")))


COHORT_ORACLE_SQL = """
WITH d AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
           FROM events),
f AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY user_id)
SELECT f.cohort AS cohort_day,
       CAST(date_diff('day', f.cohort, d.day) AS BIGINT) AS day_offset,
       count(*) AS n_users
FROM d JOIN f USING (user_id)
GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# RFM quartile segmentation

DAY_US = 86_400_000_000
RFM_NQ = 4


def events_rfm(sf_dir: str, nq: int = RFM_NQ):
    """RFM segmentation: every user's recency (last-active day),
    frequency (event count) and monetary (cents sum) land in exact
    corpus-wide quartiles (1..nq), plus the concatenated segment code
    ('444' = best). ntile semantics exactly — quartile = 1 + rank·nq //
    n_users with rank over (metric, user_id) — but WITHOUT a global
    sort: recency is quantized to days so each metric is
    low-cardinality, and each quartile pass is the value-keyed prefix
    scan (per-value groupby counts → driver prefix offsets over the
    distinct-value histogram → per-value groups rank locally by
    user_id). Three chained passes over the one-row-per-user metric
    table; driver state = three distinct-value histograms, bounded by
    the value domains (days, max events/user, cents range), never by
    user count.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False)) // DAY_US
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        g = (pa.table({"user_id": t["user_id"].cast(pa.int64()),
                       "r_day": pa.array(day), "cents": pa.array(cents)})
             .group_by("user_id")
             .aggregate([("r_day", "max"), ("cents", "sum"),
                         ([], "count_all")]))
        return pa.table({"user_id": g["user_id"],
                         "r_day": g["r_day_max"],
                         "f_n": g["count_all"].cast(pa.int64()),
                         "m_cents": g["cents_sum"]})

    metrics = (ev.map_batches(partial, batch_format="pyarrow")
               .groupby("user_id")
               .aggregate(Max("r_day", alias_name="r_day"),
                          Sum("f_n", alias_name="f_n"),
                          Sum("m_cents", alias_name="m_cents"))
               .materialize())
    total = metrics.count()
    if total == 0:
        return rd.from_arrow(pa.schema(
            [("user_id", pa.int64()), ("r_day", pa.int64()),
             ("f_n", pa.int64()), ("m_cents", pa.int64()),
             ("r_q", pa.int64()), ("f_q", pa.int64()),
             ("m_q", pa.int64()), ("segment", pa.string())]).empty_table())

    def quartile_pass(ds, col: str, qcol: str):
        """One value-keyed prefix scan: adds ``qcol`` (1..nq) ranked by
        (col, user_id), carrying every existing column through."""
        from ray.data.aggregate import Count as _Count

        hist = (ds.select_columns([col]).groupby(col)
                .aggregate(_Count(alias_name="c")).to_pandas()
                .sort_values(col))
        offs = np.concatenate([[0], np.cumsum(hist["c"].to_numpy())[:-1]])
        offsets_ref = ray.put(dict(zip(hist[col].astype(int), offs)))

        def rank_group(g: pa.Table) -> pa.Table:
            offsets = ray.get(offsets_ref)
            g = g.take(pc.sort_indices(
                g, sort_keys=[("user_id", "ascending")]))
            base = int(offsets[int(g[col][0].as_py())])
            rk = base + np.arange(g.num_rows)
            return g.append_column(
                qcol, pa.array(1 + (rk * nq) // total, pa.int64()))

        return (ds.groupby(col).map_groups(rank_group,
                                           batch_format="pyarrow")
                .materialize())

    out = quartile_pass(metrics, "r_day", "r_q")
    out = quartile_pass(out, "f_n", "f_q")
    out = quartile_pass(out, "m_cents", "m_q")

    def seg(t: pa.Table) -> pa.Table:
        code = pc.binary_join_element_wise(
            pc.cast(t["r_q"], pa.string()), pc.cast(t["f_q"], pa.string()),
            pc.cast(t["m_q"], pa.string()), "")
        return t.append_column("segment", code)

    return out.map_batches(seg, batch_format="pyarrow")


RFM_ORACLE_SQL = f"""
WITH m AS (
  SELECT user_id,
         CAST(epoch_us(max(ts)) // {DAY_US} AS BIGINT) AS r_day,
         count(*) AS f_n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m_cents
  FROM events GROUP BY user_id),
r AS (
  SELECT user_id, r_day, f_n, m_cents,
         row_number() OVER (ORDER BY r_day, user_id) - 1 AS rr,
         row_number() OVER (ORDER BY f_n, user_id) - 1 AS fr,
         row_number() OVER (ORDER BY m_cents, user_id) - 1 AS mr,
         count(*) OVER () AS n
  FROM m)
SELECT user_id, r_day, CAST(f_n AS BIGINT) AS f_n, m_cents,
       CAST(1 + rr * {RFM_NQ} // n AS BIGINT) AS r_q,
       CAST(1 + fr * {RFM_NQ} // n AS BIGINT) AS f_q,
       CAST(1 + mr * {RFM_NQ} // n AS BIGINT) AS m_q,
       CAST(1 + rr * {RFM_NQ} // n AS VARCHAR)
         || CAST(1 + fr * {RFM_NQ} // n AS VARCHAR)
         || CAST(1 + mr * {RFM_NQ} // n AS VARCHAR) AS segment
FROM r
""".strip()


# ---------------------------------------------------------------------------
# Windowed funnel (conversion deadlines between stages)

FUNNEL_WINDOW_US = 86_400_000_000   # each stage within 24 h of the last


def events_windowed_funnel(sf_dir: str, window_us: int = FUNNEL_WINDOW_US):
    """Funnel with CONVERSION DEADLINES: stage k+1 must land strictly
    after stage k and within 24 h of it. Greedy earliest-match — exact
    for the unwindowed funnel — is WRONG here (matching the earliest
    view can kill a conversion a later view would have made), so the
    kernel evaluates existence over all chains instead, still fully
    vectorized: a click is reachable iff ANY view sits in
    [click−W, click) (two searchsorted calls over the user's view
    array), and depth 3 iff any reachable click has a purchase in
    (click, click+W]. Output: per stage the number of users whose best
    chain reaches it (cumulative), stage 0 = all active users. Same
    thin-row shuffle as ``events_funnel``; the oracle states the same
    existence logic as chained EXISTS joins.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])

    thin_schema = pa.schema([("user_id", pa.int64()),
                             ("ts_us", pa.int64()),
                             ("stage", pa.int8())])

    def thin(t: pa.Table) -> pa.Table:
        st = np.full(t.num_rows, -1, np.int8)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        for i, name in enumerate(FUNNEL_STAGES):
            st[types == name] = i
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        keep = st >= 0
        marker_uids = np.unique(uid[~keep])
        return pa.table({
            "user_id": pa.array(np.concatenate([uid[keep], marker_uids])),
            "ts_us": pa.array(np.concatenate(
                [ts[keep], np.zeros(len(marker_uids), np.int64)])),
            "stage": pa.array(np.concatenate(
                [st[keep], np.full(len(marker_uids), -1, np.int8)])),
        }, schema=thin_schema)

    mid_schema = pa.schema([("stage", pa.int64()), ("n", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        st = t["stage"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        V = np.sort(ts[st == 0])
        C = np.sort(ts[st == 1])
        P = np.sort(ts[st == 2])
        depth = 0
        if len(V):
            depth = 1
            # click reachable iff a view sits in [c-W, c)
            lo = np.searchsorted(V, C - window_us, side="left")
            hi = np.searchsorted(V, C, side="left")
            reach = C[hi > lo]
            if len(reach):
                depth = 2
                pidx = np.searchsorted(P, reach, side="right")
                ok = pidx < len(P)
                if np.any(P[pidx[ok]] <= reach[ok] + window_us):
                    depth = 3
        return pa.table({
            "stage": pa.array(np.arange(depth + 1, dtype=np.int64)),
            "n": pa.array(np.ones(depth + 1, np.int64)),
        }, schema=mid_schema)

    # seed zero rows keep every stage present even when nobody converts
    # (the oracle's UNION ALL always emits all four)
    seed = rd.from_arrow(pa.table({
        "stage": pa.array(np.arange(4, dtype=np.int64)),
        "n": pa.array(np.zeros(4, np.int64))}, schema=mid_schema))
    return (ev.map_batches(thin, batch_format="pyarrow")
            .groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow")
            .union(seed)
            .groupby("stage").aggregate(Sum("n", alias_name="n_users")))


WINDOWED_FUNNEL_ORACLE_SQL = """
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
d1 AS (SELECT DISTINCT user_id FROM v),
d2 AS (SELECT DISTINCT v.user_id
       FROM v JOIN c ON c.user_id = v.user_id
        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR),
d3 AS (SELECT DISTINCT v.user_id
       FROM v JOIN c ON c.user_id = v.user_id
        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
       JOIN p ON p.user_id = c.user_id
        AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR)
SELECT 0 AS stage, (SELECT count(*) FROM u) AS n_users
UNION ALL SELECT 1, (SELECT count(*) FROM d1)
UNION ALL SELECT 2, (SELECT count(*) FROM d2)
UNION ALL SELECT 3, (SELECT count(*) FROM d3)
""".strip()
