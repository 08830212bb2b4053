"""Window-function family beyond the running/sliding/lag ops in
ops/relational.py and ops/joins.py: ranking windows (ROW_NUMBER / RANK
/ DENSE_RANK / NTILE), FIRST_VALUE/LAST_VALUE as a map-side combiner,
an interval range-join (ALL matches in a time window, vs. the as-of
join's latest-only and the sliding window's counts-only), and an
ordered list aggregation (string_agg).

Shared design rules (same as the rest of ops/):
  * reads prune to the columns the op touches;
  * per-group kernels are numpy/Arrow vectorized — no Python loop over
    rows inside a group;
  * anything that can shrink before the shuffle does (the first/last op
    ships ≤ one row per (user, batch); the range join ships each click
    row at most twice, never a cross product);
  * every output that feeds the driver's hash compare is integer or
    string typed with pinned tie-breaks, mirrored in the oracle SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Ranking windows


def events_rank_family(sf_dir: str):
    """ROW_NUMBER / RANK / DENSE_RANK / NTILE(4) per user over
    ``value`` descending (row_number and ntile totally ordered by the
    (value DESC, event_id ASC) tie-break; rank/dense_rank over value
    alone so ties share a rank). One groupby(user) shuffle; the
    per-group kernel is a single lexsort plus vectorized first-index
    arithmetic — ranks for the whole group come out of two
    ``np.unique`` style passes, no per-row Python.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "value"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("rn", pa.int64()), ("rnk", pa.int64()),
        ("drnk", pa.int64()), ("ntile4", pa.int64()),
    ])

    def per_user(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=[("value", "descending"),
                                                 ("event_id", "ascending")]))
        vals = t["value"].to_numpy(zero_copy_only=False)
        n = len(vals)
        rn = np.arange(1, n + 1, dtype=np.int64)
        # new_run[i] == True where vals[i] differs from its predecessor
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        np.not_equal(vals[1:], vals[:-1], out=new_run[1:])
        # RANK: first row number of the value run; DENSE_RANK: run index
        rnk = np.maximum.accumulate(np.where(new_run, rn, 0))
        drnk = np.cumsum(new_run)
        # NTILE(4): first (n % 4) tiles get one extra row
        q, r = divmod(n, 4)
        big = r * (q + 1)          # rows covered by the (q+1)-sized tiles
        i = rn - 1
        if q == 0:                 # fewer rows than tiles
            ntile = i + 1
        else:
            ntile = np.where(i < big, i // (q + 1), r + (i - big) // q) + 1
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "rn": pa.array(rn),
            "rnk": pa.array(rnk.astype(np.int64)),
            "drnk": pa.array(drnk.astype(np.int64)),
            "ntile4": pa.array(ntile.astype(np.int64)),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


RANK_FAMILY_ORACLE_SQL = """
SELECT user_id, event_id,
       CAST(row_number() OVER wo AS BIGINT) AS rn,
       CAST(rank()       OVER wv AS BIGINT) AS rnk,
       CAST(dense_rank() OVER wv AS BIGINT) AS drnk,
       CAST(ntile(4)     OVER wo AS BIGINT) AS ntile4
FROM events
WINDOW wo AS (PARTITION BY user_id ORDER BY value DESC, event_id),
       wv AS (PARTITION BY user_id ORDER BY value DESC)
""".strip()


# ---------------------------------------------------------------------------
# FIRST_VALUE / LAST_VALUE via map-side combiner (no full sort)


def events_first_last(sf_dir: str):
    """Per-user FIRST_VALUE/LAST_VALUE of event_type in (ts, event_id)
    order, plus the count — computed WITHOUT sorting the event log:
    each batch emits one candidate row per user it sees (argmin/argmax
    by the (ts, event_id) key plus a partial count), then a tiny
    groupby(user) reduce picks the global extremes and sums the counts.
    The shuffle carries ≤ one row per (user, batch) instead of one row
    per event — the map-side-combiner shape every bounded aggregate
    should take at 100 TB.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])

    mid_schema = pa.schema([
        ("user_id", pa.int64()),
        ("first_ts", pa.timestamp("us")), ("first_eid", pa.int64()),
        ("first_type", pa.string()),
        ("last_ts", pa.timestamp("us")), ("last_eid", pa.int64()),
        ("last_type", pa.string()),
        ("n_events", pa.int64()),
    ])

    def partial(t: pa.Table) -> pa.Table:
        uids = t["user_id"].to_numpy(zero_copy_only=False)
        us = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        # lexsort by (user, ts, eid): per-user first = run start,
        # last = run end — one sort replaces per-user argmin/argmax
        order = np.lexsort((eid, us, uids))
        su = uids[order]
        starts = np.flatnonzero(np.r_[True, su[1:] != su[:-1]])
        ends = np.r_[starts[1:], len(su)] - 1
        fi, li = order[starts], order[ends]
        types = t["event_type"]
        return pa.table({
            "user_id": pa.array(su[starts], pa.int64()),
            "first_ts": t["ts"].take(pa.array(fi)).combine_chunks(),
            "first_eid": pa.array(eid[fi], pa.int64()),
            "first_type": types.take(pa.array(fi)).combine_chunks(),
            "last_ts": t["ts"].take(pa.array(li)).combine_chunks(),
            "last_eid": pa.array(eid[li], pa.int64()),
            "last_type": types.take(pa.array(li)).combine_chunks(),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
        }, schema=mid_schema)

    out_schema = pa.schema([
        ("user_id", pa.int64()),
        ("first_type", pa.string()), ("last_type", pa.string()),
        ("n_events", pa.int64()),
    ])

    def reduce_user(t: pa.Table) -> pa.Table:
        fkey = pc.sort_indices(t, sort_keys=[("first_ts", "ascending"),
                                             ("first_eid", "ascending")])
        lkey = pc.sort_indices(t, sort_keys=[("last_ts", "descending"),
                                             ("last_eid", "descending")])
        return pa.table({
            "user_id": pa.array([t["user_id"][0].as_py()], pa.int64()),
            "first_type": t["first_type"].take(fkey[:1]).combine_chunks(),
            "last_type": t["last_type"].take(lkey[:1]).combine_chunks(),
            "n_events": pa.array([pc.sum(t["n_events"]).as_py()], pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id")
            .map_groups(reduce_user, batch_format="pyarrow"))


FIRST_LAST_ORACLE_SQL = """
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rdesc
  FROM events)
SELECT user_id,
       max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       max(CASE WHEN rdesc = 1 THEN event_type END) AS last_type,
       count(*) AS n_events
FROM r GROUP BY user_id
""".strip()


# ---------------------------------------------------------------------------
# Interval range-join: ALL same-user clicks within 24 h before a purchase


def events_range_join(sf_dir: str):
    """Interval join: every (purchase, click) pair of the SAME user
    with ``click.ts`` in ``[purchase.ts − 24 h, purchase.ts)`` — the
    as-of join keeps only the latest match and the sliding window only
    counts; a range join must emit EVERY pair. Distributed shape:
    bucket time into days, replicate each click to its own and the
    following day bucket (the 24 h window spans at most two), keep each
    purchase in exactly one bucket, then one groupby((user, day))
    shuffle; the per-group kernel resolves all pairs with two
    searchsorted calls + np.repeat (no per-row Python, no cross
    product). Replication factor is a fixed 2, so the exchange is
    ≤ 2× the click rows at any scale; a purchase lives in one group,
    so pairs are emitted exactly once.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])

    mid_schema = pa.schema([
        ("user_id", pa.int64()), ("bucket", pa.int64()),
        ("kind", pa.int8()),     # 0 = purchase (own bucket), 1 = click replica
        ("event_id", pa.int64()), ("ts_us", pa.int64()),
    ])

    def route(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.is_in(et, value_set=pa.array(["purchase", "click"]))
        t = t.filter(keep)
        us = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        uids = t["user_id"].to_numpy(zero_copy_only=False)
        eids = t["event_id"].to_numpy(zero_copy_only=False)
        is_click = pc.equal(t["event_type"], "click").to_numpy(
            zero_copy_only=False)
        day = us // DAY_US
        # purchases once; clicks to day and day+1
        pu, cl = ~is_click, is_click
        cols = {
            "user_id": np.concatenate([uids[pu], uids[cl], uids[cl]]),
            "bucket": np.concatenate([day[pu], day[cl], day[cl] + 1]),
            "kind": np.concatenate([
                np.zeros(int(pu.sum()), np.int8),
                np.ones(int(cl.sum()) * 2, np.int8)]),
            "event_id": np.concatenate([eids[pu], eids[cl], eids[cl]]),
            "ts_us": np.concatenate([us[pu], us[cl], us[cl]]),
        }
        return pa.table({k: pa.array(v) for k, v in cols.items()},
                        schema=mid_schema)

    out_schema = pa.schema([
        ("user_id", pa.int64()),
        ("purchase_event_id", pa.int64()),
        ("click_event_id", pa.int64()),
        ("gap_us", pa.int64()),
    ])

    def pairs(t: pa.Table) -> pa.Table:
        kind = t["kind"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        p = kind == 0
        pts, peid = ts[p], eid[p]
        order = np.argsort(ts[~p], kind="stable")
        cts, ceid = ts[~p][order], eid[~p][order]
        lo = np.searchsorted(cts, pts - DAY_US, side="left")
        hi = np.searchsorted(cts, pts, side="left")   # click.ts < purchase.ts
        cnt = hi - lo
        pi = np.repeat(np.arange(len(pts)), cnt)
        # concatenated ranges [lo[i], hi[i]) without a Python loop
        ci = np.arange(int(cnt.sum())) - np.repeat(
            np.cumsum(cnt) - cnt - lo, cnt)
        return pa.table({
            "user_id": pa.array(
                np.full(len(pi), t["user_id"][0].as_py(), np.int64)),
            "purchase_event_id": pa.array(peid[pi], pa.int64()),
            "click_event_id": pa.array(ceid[ci], pa.int64()),
            "gap_us": pa.array(pts[pi] - cts[ci], pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(route, batch_format="pyarrow")
            .groupby(["user_id", "bucket"])
            .map_groups(pairs, batch_format="pyarrow"))


RANGE_JOIN_ORACLE_SQL = """
SELECT p.user_id, p.event_id AS purchase_event_id,
       c.event_id AS click_event_id,
       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
FROM events p
JOIN events c ON c.user_id = p.user_id
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
  AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts < p.ts
""".strip()


# ---------------------------------------------------------------------------
# Ordered list aggregation (string_agg / collect_list)


JOURNEY_K = 10


def events_user_journey(sf_dir: str, k: int = JOURNEY_K):
    """Per-user 'journey': the first ``k`` event types in (ts,
    event_id) order joined with '>', plus the total event count — the
    ordered-list aggregation (string_agg / collect_list) shape. One
    groupby(user) shuffle; the group kernel sorts once and joins ≤ k
    short strings (output is one row per user, so the concat cost is
    bounded by k, not the event count).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("journey", pa.string()),
        ("n_events", pa.int64()),
    ])

    def per_user(t: pa.Table) -> pa.Table:
        head = t.take(pc.sort_indices(
            t, sort_keys=[("ts", "ascending"), ("event_id", "ascending")])[:k])
        return pa.table({
            "user_id": pa.array([t["user_id"][0].as_py()], pa.int64()),
            "journey": pa.array([">".join(head["event_type"].to_pylist())],
                                pa.string()),
            "n_events": pa.array([t.num_rows], pa.int64()),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


JOURNEY_ORACLE_SQL = f"""
WITH r AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events)
SELECT user_id,
       string_agg(event_type, '>' ORDER BY rn)
           FILTER (WHERE rn <= {JOURNEY_K}) AS journey,
       count(*) AS n_events
FROM r GROUP BY user_id
""".strip()


def events_share_of_day(sf_dir: str):
    """Ratio-to-report window: each (day, event_type) cell's share of
    its day's total events, in exact integer ppm. Per-batch (day,
    type)→count partials shrink the exchange to the day×type key
    space; ONE groupby(day) kernel owns the whole day (a bounded
    type-vocabulary group), sums its own total and emits the shares —
    the window never sees individual events and there is no second
    pass or totals join.
    """
    import numpy as np
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.floor_temporal(t["ts"].cast(pa.timestamp("us")),
                                unit="day").cast(pa.int64())
        g = (pa.table({"day_us": day, "event_type": t["event_type"]})
             .group_by(["day_us", "event_type"])
             .aggregate([([], "count_all")]))
        return pa.table({"day_us": g["day_us"],
                         "event_type": g["event_type"],
                         "n": g["count_all"].cast(pa.int64())})

    out_schema = pa.schema([("day", pa.timestamp("us")),
                            ("event_type", pa.string()),
                            ("n", pa.int64()),
                            ("share_ppm", pa.int64())])

    def shares(g: pa.Table) -> pa.Table:
        # partials for the same (day, type) may arrive from many
        # batches: re-aggregate before the ratio
        g = (g.select(["day_us", "event_type", "n"])
             .group_by(["day_us", "event_type"]).aggregate([("n", "sum")]))
        n = g["n_sum"].to_numpy(zero_copy_only=False)
        total = n.sum()
        return pa.table({
            "day": g["day_us"].cast(pa.timestamp("us")),
            "event_type": g["event_type"],
            "n": pa.array(n, pa.int64()),
            "share_ppm": pa.array(n * 1_000_000 // total, pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("day_us").map_groups(shares, batch_format="pyarrow"))


SHARE_ORACLE_SQL = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT day, event_type, n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY day) AS BIGINT)
           AS share_ppm
FROM c
""".strip()


# ---------------------------------------------------------------------------
# ROWS-frame moving average (ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW)

MAVG_WINDOW = 3


def events_moving_avg(sf_dir: str, window: int = MAVG_WINDOW):
    """Per-user moving average of ``value`` over the last ``window``
    ROWS in (ts, event_id) order — the ROWS-frame sibling of the
    RANGE-frame ``events_sliding_count``. One ``groupby(user)``
    exchange; inside the group a vectorized cumulative-sum window
    (cumsum minus its shifted self) yields every frame sum in O(n).
    Exact integers end to end: values are cents, the output is
    ``(frame_sum_cents * 100) // frame_len`` — avg in integer
    hundredths of a cent, so the hash can't drift on float division.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("mavg_c100", pa.int64()), ("frame_len", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)[order]
        n = len(cents)
        cs = np.concatenate([[0], np.cumsum(cents)])
        lo = np.maximum(np.arange(n) - window + 1, 0)
        frame_sum = cs[np.arange(n) + 1] - cs[lo]
        frame_len = np.arange(n) + 1 - lo
        return pa.table({
            "user_id": t["user_id"].take(pa.array(order)).cast(pa.int64()),
            "event_id": pa.array(eid[order], pa.int64()),
            "mavg_c100": pa.array((frame_sum * 100) // frame_len,
                                  pa.int64()),
            "frame_len": pa.array(frame_len, pa.int64())},
            schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user,
                                            batch_format="pyarrow")


MAVG_ORACLE_SQL = f"""
WITH c AS (SELECT user_id, event_id, ts,
                  CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT user_id, event_id,
       CAST((CAST(sum(cents) OVER w AS BIGINT) * 100)
            // (count(*) OVER w) AS BIGINT) AS mavg_c100,
       CAST(count(*) OVER w AS BIGINT) AS frame_len
FROM c
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {MAVG_WINDOW - 1} PRECEDING AND CURRENT ROW)
""".strip()


# ---------------------------------------------------------------------------
# PERCENT_RANK / CUME_DIST in exact integer ppm


def events_percent_rank(sf_dir: str):
    """PERCENT_RANK and CUME_DIST per user over ``value`` ascending,
    in exact integer ppm so the driver hash cannot drift on float
    division: ``prank_ppm = (rank-1)*1e6 // (n-1)`` (0 when n == 1),
    ``cdist_ppm = count(value <= v)*1e6 // n``. One groupby(user)
    exchange; the group kernel is a single sort plus value-run
    boundary arithmetic (shared ranks come from run starts, the
    <=-count from run ends) — no per-row Python.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "value"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("prank_ppm", pa.int64()), ("cdist_ppm", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        t = t.take(pc.sort_indices(t, sort_keys=[("value", "ascending"),
                                                 ("event_id", "ascending")]))
        vals = t["value"].to_numpy(zero_copy_only=False)
        n = len(vals)
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        np.not_equal(vals[1:], vals[:-1], out=new_run[1:])
        rn = np.arange(1, n + 1, dtype=np.int64)
        # rank of each row = row number at its value-run start
        rank = np.maximum.accumulate(np.where(new_run, rn, 0))
        # count(value <= v) = row number at the value-run END: propagate
        # each run's last rn backwards with a reversed accumulate
        run_end = np.empty(n, dtype=np.int64)
        is_end = np.empty(n, dtype=bool)
        is_end[:-1] = new_run[1:]
        is_end[-1] = True
        np.minimum.accumulate(np.where(is_end, rn, np.int64(n))[::-1],
                              out=run_end[::-1])
        prank = ((rank - 1) * 1_000_000 // (n - 1) if n > 1
                 else np.zeros(n, np.int64))
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "prank_ppm": pa.array(prank, pa.int64()),
            "cdist_ppm": pa.array(run_end * 1_000_000 // n, pa.int64()),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


PERCENT_RANK_ORACLE_SQL = """
WITH r AS (
  SELECT user_id, event_id,
         rank() OVER (PARTITION BY user_id ORDER BY value) AS rk,
         rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS rkd,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events)
SELECT user_id, event_id,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE (rk - 1) * 1000000 // (n - 1) END AS BIGINT)
           AS prank_ppm,
       CAST((n - rkd + 1) * 1000000 // n AS BIGINT) AS cdist_ppm
FROM r
""".strip()


# ---------------------------------------------------------------------------
# Session-grain table (gaps-and-islands with full session rows)

SESSION_GAP_US = 30 * 60 * 1_000_000


def events_session_table(sf_dir: str, gap_us: int = SESSION_GAP_US):
    """Sessionization at SESSION grain: one row per (user, session)
    with the 1-based session index, start/end timestamps (µs), event
    count and duration — the gaps-and-islands shape (sessions split at
    > 30 min silence; `events_sessions` only reports per-user counts).
    One groupby(user) exchange; the group kernel is a sort, a gap
    compare, a cumsum for the session ids, and run-boundary reduceat
    sums — no per-row Python.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("session_idx", pa.int64()),
        ("start_us", pa.int64()), ("end_us", pa.int64()),
        ("n_events", pa.int64()), ("duration_us", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        ts = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        n = len(ts)
        new_s = np.empty(n, dtype=bool)
        new_s[0] = True
        np.greater(ts[1:] - ts[:-1], gap_us, out=new_s[1:])
        starts = np.flatnonzero(new_s)
        ends = np.r_[starts[1:], n] - 1
        return pa.table({
            "user_id": pa.array(
                np.full(len(starts), t["user_id"][0].as_py(), np.int64)),
            "session_idx": pa.array(np.arange(1, len(starts) + 1,
                                              dtype=np.int64)),
            "start_us": pa.array(ts[starts], pa.int64()),
            "end_us": pa.array(ts[ends], pa.int64()),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
            "duration_us": pa.array(ts[ends] - ts[starts], pa.int64()),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


SESSION_TABLE_ORACLE_SQL = """
WITH d AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM d)
SELECT user_id, CAST(sid AS BIGINT) AS session_idx,
       epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
FROM s GROUP BY user_id, sid
""".strip()


# ---------------------------------------------------------------------------
# Windowed DISTINCT count (distinct event types in a trailing 24 h window)


def events_window_distinct(sf_dir: str):
    """Per event: how many DISTINCT event types the user produced in
    the trailing 24 h RANGE window (inclusive of now) — the windowed
    COUNT(DISTINCT) the sliding count can't answer. One groupby(user);
    the group kernel never materializes per-window sets: an event
    contributes +1 exactly when its PREVIOUS same-type occurrence
    falls outside the window, so two searchsorted passes (window
    starts; per-type previous index via one stable argsort) plus a
    cumulative sum of +1/-1 deltas give every window's distinct count
    in O(n log n) per group.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("event_id", pa.int64()),
        ("n_distinct", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        ts = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)[order]
        n = len(ts)
        # prev[i] = row index of the previous same-type event (-1 first)
        prev = np.full(n, -1, np.int64)
        o = np.argsort(codes, kind="stable")   # groups same-type runs
        sc = codes[o]
        same = np.flatnonzero(sc[1:] == sc[:-1]) + 1
        prev[o[same]] = o[same - 1]
        # window(i') covers row indices [lo[i'], hi[i']] — a RANGE frame
        # is value-defined, so it includes equal-ts peers AFTER i' too
        lo = np.searchsorted(ts, ts - DAY_US, side="left")
        hi = np.searchsorted(ts, ts, side="right") - 1
        # distinct(i') = #{i : lo' <= i <= hi', prev[i] < lo'} — each
        # type counted once, at its first in-window occurrence. Row i
        # satisfies that for a CONTIGUOUS run of windows (lo, hi are
        # nondecreasing): from max(first i' with hi' >= i, first i'
        # with lo' > prev[i]) until lo' passes i itself (where the
        # type's next occurrence, if in window, takes over seamlessly:
        # its prev == i < lo'). One +1/-1 delta per row, one cumsum.
        idx = np.arange(n)
        a = np.searchsorted(hi, idx, side="left")
        b = np.searchsorted(lo, prev, side="right")
        c = np.searchsorted(lo, idx, side="right")
        delta = np.zeros(n + 1, np.int64)
        np.add.at(delta, np.maximum(a, b), 1)
        np.subtract.at(delta, c, 1)
        return pa.table({
            "user_id": t["user_id"].take(pa.array(order)).cast(pa.int64()),
            "event_id": pa.array(eid, pa.int64()),
            "n_distinct": pa.array(np.cumsum(delta[:-1]), pa.int64()),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


WINDOW_DISTINCT_ORACLE_SQL = """
SELECT user_id, event_id,
       CAST(count(DISTINCT event_type) OVER (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 24 HOUR PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_distinct
FROM events
""".strip()


# ---------------------------------------------------------------------------
# Run-length encoding of per-user activity (value-change islands)


def events_type_runs(sf_dir: str):
    """Consecutive same-type runs per user in (ts, event_id) order —
    the value-change gaps-and-islands variant (sessions split on time
    silence; runs split on the VALUE changing): one row per run with
    its 1-based index, type, length and start timestamp. One
    groupby(user); the kernel is a sort, one change-compare, and
    run-boundary arithmetic.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("run_idx", pa.int64()),
        ("event_type", pa.string()), ("run_len", pa.int64()),
        ("start_us", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        ts = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        types = t["event_type"].take(pa.array(order)).combine_chunks()
        enc = pc.dictionary_encode(types)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        n = len(codes)
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        np.not_equal(codes[1:], codes[:-1], out=brk[1:])
        starts = np.flatnonzero(brk)
        lens = np.diff(np.r_[starts, n])
        return pa.table({
            "user_id": pa.array(
                np.full(len(starts), t["user_id"][0].as_py(), np.int64)),
            "run_idx": pa.array(np.arange(1, len(starts) + 1,
                                          dtype=np.int64)),
            "event_type": types.take(pa.array(starts)),
            "run_len": pa.array(lens, pa.int64()),
            "start_us": pa.array(ts[starts], pa.int64()),
        }, schema=out_schema)

    return ev.groupby("user_id").map_groups(per_user, batch_format="pyarrow")


TYPE_RUNS_ORACLE_SQL = """
WITH d AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, ts, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS rid
  FROM d)
SELECT user_id, CAST(rid AS BIGINT) AS run_idx,
       min(event_type) AS event_type, count(*) AS run_len,
       epoch_us(min(ts)) AS start_us
FROM s GROUP BY user_id, rid
""".strip()


# ---------------------------------------------------------------------------
# Longest consecutive-day streak per user (islands on the day grid)


def events_longest_streak(sf_dir: str):
    """Per user: the longest run of CONSECUTIVE ACTIVE DAYS, its start
    day, and the distinct-active-day count — gaps-and-islands on the
    day grid (sessions split on silence within a day; this collapses
    to days first, so the kernel's cost is active days, not events).
    Per-batch (user, day) distinct partials shrink the exchange; the
    group kernel is a sort over the user's distinct days, one
    difference compare, and run-boundary arithmetic. Earliest streak
    wins ties (pinned on both sides).
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False)) // DAY_US
        g = (pa.table({"user_id": t["user_id"].cast(pa.int64()),
                       "day": pa.array(day)})
             .group_by(["user_id", "day"]).aggregate([]))
        return g

    out_schema = pa.schema([
        ("user_id", pa.int64()), ("longest_streak", pa.int64()),
        ("streak_start_day", pa.int64()), ("n_active_days", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        days = np.unique(t["day"].to_numpy(zero_copy_only=False))
        brk = np.r_[True, np.diff(days) > 1]
        starts = np.flatnonzero(brk)
        lens = np.diff(np.r_[starts, len(days)])
        best = int(np.argmax(lens))          # first max = earliest streak
        return pa.table({
            "user_id": pa.array([t["user_id"][0].as_py()], pa.int64()),
            "longest_streak": pa.array([int(lens[best])], pa.int64()),
            "streak_start_day": pa.array([int(days[starts[best]])],
                                         pa.int64()),
            "n_active_days": pa.array([len(days)], pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").map_groups(per_user,
                                           batch_format="pyarrow"))


STREAK_ORACLE_SQL = f"""
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(date_trunc('day', ts)) // {DAY_US} AS day
  FROM events),
i AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
             AS island
  FROM d),
s AS (
  SELECT user_id, min(day) AS start_day, count(*) AS len
  FROM i GROUP BY user_id, island),
r AS (
  SELECT user_id, len, start_day,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY len DESC, start_day) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n_islands,
         sum(len) OVER (PARTITION BY user_id) AS n_days
  FROM s)
SELECT user_id, CAST(len AS BIGINT) AS longest_streak,
       CAST(start_day AS BIGINT) AS streak_start_day,
       CAST(n_days AS BIGINT) AS n_active_days
FROM r WHERE rn = 1
""".strip()


# ---------------------------------------------------------------------------
# Global max session concurrency (ordered sweep WITHOUT a global sort)

CONC_BUCKET_US = 86_400_000_000     # fixed day grid (data-independent)


def sessions_max_concurrency(sf_dir: str, gap_us: int = SESSION_GAP_US,
                             bucket_us: int = CONC_BUCKET_US):
    """Peak number of SIMULTANEOUSLY open sessions across all users
    (and the earliest µs timestamp achieving it) — the classic
    interval sweep, distributed exactly without a global sort:
    sessions (from ``events_session_table``'s gap rule) explode to
    (+1 at start, −1 at end+1µs) deltas; deltas land in FIXED
    day-grid buckets (data-independent, so the assignment is a
    stateless map); each bucket kernel sorts ITS OWN deltas and emits
    (bucket, total_delta, max_prefix, argmax_ts); the final
    constant-key kernel, bounded by the calendar span (buckets, never
    events), settles entry offsets by prefix sum and picks the global
    max. Concurrency is evaluated AFTER applying all deltas at a
    timestamp, so intra-ts order cannot matter — the tie rule is
    (max concurrency, earliest ts), pinned in the oracle's ORDER BY.
    """
    sess = events_session_table(sf_dir, gap_us=gap_us)

    delta_schema = pa.schema([("bucket", pa.int64()), ("ts", pa.int64()),
                              ("dlt", pa.int64())])

    def deltas(t: pa.Table) -> pa.Table:
        s = t["start_us"].to_numpy(zero_copy_only=False)
        e = t["end_us"].to_numpy(zero_copy_only=False) + 1
        ts = np.concatenate([s, e])
        dlt = np.concatenate([np.ones(len(s), np.int64),
                              np.full(len(e), -1, np.int64)])
        return pa.table({"bucket": pa.array(ts // bucket_us, pa.int64()),
                         "ts": pa.array(ts, pa.int64()),
                         "dlt": pa.array(dlt, pa.int64())},
                        schema=delta_schema)

    part_schema = pa.schema([("bucket", pa.int64()), ("total", pa.int64()),
                             ("max_prefix", pa.int64()),
                             ("argmax_ts", pa.int64())])

    def bucket_kernel(g: pa.Table) -> pa.Table:
        ts = g["ts"].to_numpy(zero_copy_only=False)
        dlt = g["dlt"].to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts, dlt = ts[order], dlt[order]
        starts = np.flatnonzero(np.r_[True, ts[1:] != ts[:-1]])
        per_ts = np.add.reduceat(dlt, starts)
        run = np.cumsum(per_ts)
        i = int(np.argmax(run))           # first occurrence of the max
        return pa.table({
            "bucket": pa.array([int(g["bucket"][0].as_py())], pa.int64()),
            "total": pa.array([int(run[-1])], pa.int64()),
            "max_prefix": pa.array([int(run[i])], pa.int64()),
            "argmax_ts": pa.array([int(ts[starts[i]])], pa.int64())},
            schema=part_schema)

    parts = (sess.map_batches(deltas, batch_format="pyarrow")
             .groupby("bucket").map_groups(bucket_kernel,
                                           batch_format="pyarrow"))

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("__k", pa.array([0] * t.num_rows, pa.int8()))

    out_schema = pa.schema([("max_concurrent", pa.int64()),
                            ("at_ts_us", pa.int64())])

    def final(g: pa.Table) -> pa.Table:
        order = np.argsort(g["bucket"].to_numpy(zero_copy_only=False),
                           kind="stable")
        total = g["total"].to_numpy(zero_copy_only=False)[order]
        mx = g["max_prefix"].to_numpy(zero_copy_only=False)[order]
        ats = g["argmax_ts"].to_numpy(zero_copy_only=False)[order]
        offset = np.r_[0, np.cumsum(total)[:-1]]
        cand = offset + mx
        i = int(np.argmax(cand))          # earliest bucket wins ties
        return pa.table({"max_concurrent": pa.array([int(cand[i])],
                                                    pa.int64()),
                         "at_ts_us": pa.array([int(ats[i])], pa.int64())},
                        schema=out_schema)

    return (parts.map_batches(add_key, batch_format="pyarrow")
            .groupby("__k").map_groups(
                lambda g: final(g.drop_columns(["__k"])),
                batch_format="pyarrow"))


MAX_CONCURRENCY_ORACLE_SQL = """
WITH d AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid, ts
  FROM d),
iv AS (SELECT epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us
       FROM s GROUP BY user_id, sid),
del AS (SELECT start_us AS ts, 1 AS dlt FROM iv
        UNION ALL SELECT end_us + 1, -1 FROM iv),
g AS (SELECT ts, sum(dlt) AS dlt FROM del GROUP BY ts),
c AS (SELECT ts, sum(dlt) OVER (ORDER BY ts ROWS UNBOUNDED PRECEDING)
             AS conc FROM g)
SELECT CAST(conc AS BIGINT) AS max_concurrent,
       CAST(ts AS BIGINT) AS at_ts_us
FROM c ORDER BY conc DESC, ts LIMIT 1
""".strip()


# ---------------------------------------------------------------------------
# Watermark-windowed aggregate with late-data accounting (streaming
# event-time semantics, replayed deterministically over the batch corpus)

WM_WINDOW_US = 3_600_000_000      # 1 h tumbling event-time windows
WM_DELAY_US = 3_600_000_000       # allowed lateness before the drop
WM_BUCKETS = 256                  # arrival-order prefix-scan grain


def events_watermark_windows(sf_dir: str, n_buckets: int = WM_BUCKETS):
    """Tumbling event-time windows with WATERMARK semantics — the
    streaming-window operator a batch engine must replay exactly:
    events arrive in ``event_id`` order; the watermark after arrival i
    is ``max(ts[0..i]) − DELAY``; an event whose window END the
    watermark has already passed is LATE (excluded from its window's
    aggregate, counted separately) — the drop rule of Flink/Beam
    allowed-lateness, made deterministic so DuckDB can replay it.

    Scale shape (no global sort): the arrival-order running max rides
    the repo's bucket-prefix-scan pattern — events hash to
    ``n_buckets`` equal event_id ranges, pass 1 computes per-bucket
    max(ts) (one tiny groupby), the driver prefix-maxes the ≤256
    bucket values (bounded, corpus-size independent) and broadcasts
    the exclusive offsets, pass 2 is ONE ``groupby(bucket)`` whose
    kernel sorts its own bucket by event_id and combines the in-bucket
    running max with the bucket offset. Late flags then feed one
    window-keyed groupby of integer partials.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from ..rayutil import parquet_num_rows

    out_schema = pa.schema([("window_start", pa.timestamp("us")),
                            ("n_on_time", pa.int64()),
                            ("n_late", pa.int64()),
                            ("on_time_cents", pa.int64())])
    if parquet_num_rows(f"{sf_dir}/events.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "value"]).materialize()
    b = ev.aggregate(Min("event_id", alias_name="lo"),
                     Max("event_id", alias_name="hi"))
    lo, hi = int(b["lo"]), int(b["hi"])
    span = max(hi - lo + 1, 1)

    def add_bucket(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        bk = ((eid - lo) * n_buckets // span).astype(np.int64)
        return t.append_column("bucket", pa.array(bk, pa.int64()))

    bucketed = ev.map_batches(add_bucket, batch_format="pyarrow") \
        .materialize()

    # pass 1: per-bucket max ts (≤ n_buckets rows to the driver)
    bmax = {int(r["bucket"]): int(r["max_ts"])
            for r in bucketed.map_batches(
                lambda t: pa.table(
                    {"bucket": t["bucket"],
                     "ts_us": t["ts"].cast(pa.int64())}),
                batch_format="pyarrow")
            .groupby("bucket").aggregate(Max("ts_us", alias_name="max_ts"))
            .take_all()}
    # exclusive prefix max per bucket — bounded driver arithmetic
    offsets = {}
    run = np.iinfo(np.int64).min
    for k in range(n_buckets):
        offsets[k] = run
        if k in bmax:
            run = max(run, bmax[k])
    import ray as _ray

    off_ref = _ray.put(offsets)

    part_schema = pa.schema([("window_start", pa.int64()),
                             ("on", pa.int64()), ("late", pa.int64()),
                             ("cents", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        offs = _ray.get(off_ref)
        order = pc.sort_indices(g, sort_keys=[("event_id", "ascending")])
        g = g.take(order)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = g["value"].to_numpy(zero_copy_only=False)
        prefix = np.maximum.accumulate(ts)
        wm = np.maximum(prefix, offs[int(g["bucket"][0].as_py())]) \
            - WM_DELAY_US
        wstart = ts // WM_WINDOW_US * WM_WINDOW_US
        late = wm >= wstart + WM_WINDOW_US
        cents = np.round(val * 100).astype(np.int64)
        # aggregate in place: (window, on, late, cents) partials
        uniq, inv = np.unique(wstart, return_inverse=True)
        on_n = np.bincount(inv, weights=~late).astype(np.int64)
        late_n = np.bincount(inv, weights=late).astype(np.int64)
        on_c = np.bincount(inv, weights=np.where(late, 0, cents)) \
            .astype(np.int64)
        return pa.table({"window_start": pa.array(uniq, pa.int64()),
                         "on": pa.array(on_n), "late": pa.array(late_n),
                         "cents": pa.array(on_c)}, schema=part_schema)

    parts = bucketed.groupby("bucket").map_groups(per_bucket,
                                                  batch_format="pyarrow")
    agg = (parts.groupby("window_start")
           .aggregate(Sum("on", alias_name="n_on_time"),
                      Sum("late", alias_name="n_late"),
                      Sum("cents", alias_name="on_time_cents")))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": t["window_start"].cast(pa.timestamp("us")),
            "n_on_time": t["n_on_time"].cast(pa.int64()),
            "n_late": t["n_late"].cast(pa.int64()),
            "on_time_cents": t["on_time_cents"].cast(pa.int64()),
        }, schema=out_schema)

    return agg.map_batches(finish, batch_format="pyarrow")


WATERMARK_ORACLE_SQL = """
WITH e AS (
  SELECT event_id, ts, value,
         max(ts) OVER (ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) AS wm_ts
  FROM events),
f AS (
  SELECT date_trunc('hour', ts) AS window_start,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CASE WHEN wm_ts - INTERVAL 1 HOUR
                   >= date_trunc('hour', ts) + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS late
  FROM e)
SELECT window_start,
       CAST(count(*) FILTER (late = 0) AS BIGINT) AS n_on_time,
       CAST(count(*) FILTER (late = 1) AS BIGINT) AS n_late,
       CAST(coalesce(sum(cents) FILTER (late = 0), 0) AS BIGINT)
           AS on_time_cents
FROM f GROUP BY 1
""".strip()
