"""Adversarial coverage for ops/windows.py and ops/stats.py beyond the
driver testdata: planted duplicate (user_id, ts) pairs and tied values
for the ranking family, exact 24 h boundary rows for the range join,
bigram-less documents for the novelty scorer — each hash-compared
against its own DuckDB oracle on the same synthetic parquet."""

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _canon(df):
    df = df[sorted(df.columns)].astype(str)
    return sorted("|".join(x) for x in df.itertuples(index=False))


@pytest.fixture()
def adversarial_events(tmp_path):
    """Events with duplicate (user_id, ts), tied values, and clicks
    planted exactly at the 24 h range-join boundary."""
    rows, eid = [], 0
    base = dt.datetime(2024, 1, 1)
    for u in range(3):
        for k in range(20):
            ts = base + dt.timedelta(hours=5 * k)
            kinds = (["click", "purchase", "click"] if k % 3 == 0
                     else ["click" if k % 2 else "purchase"])
            for kind in kinds:
                # value collides every 4 events -> rank/dense_rank ties
                rows.append({"event_id": eid, "ts": ts, "user_id": u,
                             "event_type": kind,
                             "value": float((eid % 4) + 1), "props": ""})
                eid += 1
        # a click EXACTLY 24 h before a purchase (inclusive bound) and
        # one exactly AT a purchase ts (exclusive bound)
        pts = base + dt.timedelta(days=40)
        for kind, off in [("click", dt.timedelta(hours=-24)),
                          ("click", dt.timedelta(0)),
                          ("purchase", dt.timedelta(0))]:
            rows.append({"event_id": eid, "ts": pts + off, "user_id": u,
                         "event_type": kind, "value": 1.0, "props": ""})
            eid += 1
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_window_family_adversarial(ray_session, adversarial_events):
    from askg_ray.ops import windows as w

    sf, con = adversarial_events
    for fn, sql in [(w.events_rank_family, w.RANK_FAMILY_ORACLE_SQL),
                    (w.events_first_last, w.FIRST_LAST_ORACLE_SQL),
                    (w.events_range_join, w.RANGE_JOIN_ORACLE_SQL),
                    (w.events_user_journey, w.JOURNEY_ORACLE_SQL)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got and got == exp, fn.__name__


def test_range_join_boundary_rows(ray_session, adversarial_events):
    """The planted boundary clicks: ts == purchase.ts - 24 h is IN the
    window, ts == purchase.ts is OUT."""
    from askg_ray.ops import windows as w

    sf, _ = adversarial_events
    df = w.events_range_join(sf).to_pandas()
    assert (df["gap_us"] == w.DAY_US).any()
    assert not (df["gap_us"] <= 0).any()


@pytest.fixture()
def tiny_corpus(tmp_path):
    """Documents with df ties, a bigram-less doc, an empty doc, and a
    lang split for the stratified sampler."""
    docs = [
        {"doc_id": 0, "text": "a b a b c", "lang": "en", "source": "s0"},
        {"doc_id": 1, "text": "a b x", "lang": "fr", "source": "s0"},
        {"doc_id": 2, "text": "solo", "lang": "en", "source": "s1"},
        {"doc_id": 3, "text": "", "lang": "de", "source": "s1"},
        {"doc_id": 4, "text": "a b a b", "lang": "fr", "source": "s2"},
        {"doc_id": 5, "text": "c x c x c x", "lang": "en", "source": "s2"},
    ]
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    return str(tmp_path), con


def test_stats_corpus_ops_adversarial(ray_session, tiny_corpus):
    from askg_ray.ops import stats as s

    sf, con = tiny_corpus
    for fn, sql in [(s.token_doc_freq, s.DOC_FREQ_ORACLE_SQL),
                    (s.token_lang_overlap, s.LANG_OVERLAP_ORACLE_SQL),
                    (s.doc_bigram_novelty, s.NOVELTY_ORACLE_SQL),
                    (s.docs_stratified_sample, s.STRATIFIED_ORACLE_SQL)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got == exp, fn.__name__
    # the bigram-less and empty docs must appear with novelty 0/0/0
    nov = s.doc_bigram_novelty(sf).to_pandas().set_index("doc_id")
    assert nov.loc[2, "n_bigrams"] == 0 and nov.loc[3, "n_bigrams"] == 0
    assert len(nov) == 6


def test_rank_family_tie_semantics(ray_session, adversarial_events):
    """rank() peers share a rank and leave a gap; dense_rank() doesn't;
    row_number() is total. Asserted structurally, not just vs oracle."""
    from askg_ray.ops import windows as w

    sf, _ = adversarial_events
    df = (w.events_rank_family(sf).to_pandas()
          .sort_values(["user_id", "rn"]))
    for _, g in df.groupby("user_id"):
        n = len(g)
        assert list(g["rn"]) == list(range(1, n + 1))
        assert g["rnk"].min() == 1 and g["drnk"].min() == 1
        assert (g["rnk"] >= g["drnk"]).all()
        assert g["drnk"].max() == g["drnk"].nunique()
        assert g["ntile4"].between(1, 4).all()


@pytest.fixture()
def modal_events(tmp_path):
    """Events with a single-event user (percent_rank n==1 branch, no
    markov transitions), a user whose type counts TIE (mode tie-break),
    an all-tied-values user, and duplicate (user, ts) pairs so the
    markov order falls back to event_id."""
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    # user 0: one event only
    rows.append({"event_id": eid, "ts": base, "user_id": 0,
                 "event_type": "view", "value": 5.0, "props": ""}); eid += 1
    # user 1: 2x click, 2x view (tie -> 'click' wins lexicographically),
    # all values EQUAL, and two events at the SAME timestamp
    for k, kind in enumerate(["view", "click", "view", "click"]):
        rows.append({"event_id": eid, "ts": base + dt.timedelta(
                         minutes=0 if k < 2 else k), "user_id": 1,
                     "event_type": kind, "value": 7.0, "props": ""}); eid += 1
    # user 2: a longer mixed sequence with value ties every 3rd event
    for k in range(12):
        rows.append({"event_id": eid, "ts": base + dt.timedelta(hours=k),
                     "user_id": 2,
                     "event_type": ["click", "view", "purchase"][k % 3],
                     "value": float(k % 3), "props": ""}); eid += 1
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_percent_rank_mode_markov_adversarial(ray_session, modal_events):
    from askg_ray.ops import stats as s
    from askg_ray.ops import windows as w

    sf, con = modal_events
    for fn, sql in [(w.events_percent_rank, w.PERCENT_RANK_ORACLE_SQL),
                    (s.events_mode_type, s.MODE_ORACLE_SQL),
                    (s.events_markov, s.MARKOV_ORACLE_SQL)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got and got == exp, fn.__name__
    # structural: n==1 user gets prank 0 / cdist 1e6; all-tied user
    # shares prank 0 and cdist 1e6 across every row
    pr = w.events_percent_rank(sf).to_pandas().set_index("event_id")
    assert pr.loc[0, "prank_ppm"] == 0 and pr.loc[0, "cdist_ppm"] == 1_000_000
    u1 = pr[pr["user_id"] == 1]
    assert (u1["prank_ppm"] == 0).all() and (u1["cdist_ppm"] == 1_000_000).all()
    # mode tie resolves lexicographically
    md = s.events_mode_type(sf).to_pandas().set_index("user_id")
    assert md.loc[1, "mode_type"] == "click" and md.loc[1, "n_mode"] == 2
    # single-event user contributes no transitions; shares sum to ~1e6
    mk = s.events_markov(sf).to_pandas()
    assert mk["n"].sum() == 3 + 11  # user1: 4 events, user2: 12 events
    for _, g in mk.groupby("prev_type"):
        assert 1_000_000 - len(g) < g["share_ppm"].sum() <= 1_000_000


def test_skyline_merge_property_and_ties(ray_session, tmp_path):
    """The skyline kernel is mergeable (skyline of local skylines ==
    global skyline) and keeps equal (price, size) duplicates — the
    properties the distributed split relies on."""
    import numpy as np

    from askg_ray.ops.relational import (SKYLINE_ORACLE_SQL, _skyline_kernel,
                                         parts_skyline)

    rng = np.random.RandomState(7)
    n = 400
    price = rng.randint(0, 40, n).astype(np.int64) * 100
    size = rng.randint(0, 40, n).astype(np.int64)
    # plant an exact duplicate pair on the frontier
    best = np.argmin(price * 1000 - size)
    price = np.r_[price, price[best]]; size = np.r_[size, size[best]]
    t = pa.table({"p_partkey": pa.array(np.arange(n + 1), pa.int64()),
                  "p_name": pa.array([f"p{i}" for i in range(n + 1)]),
                  "price_c": pa.array(price), "p_size": pa.array(size)})
    whole = _skyline_kernel(t).to_pandas().sort_values("p_partkey")
    halves = pa.concat_tables([_skyline_kernel(t.slice(0, 150)),
                               _skyline_kernel(t.slice(150))])
    merged = _skyline_kernel(halves).to_pandas().sort_values("p_partkey")
    assert whole.values.tolist() == merged.values.tolist()
    # the planted duplicate: both copies survive iff one does
    kept = set(whole["p_partkey"])
    assert (best in kept) == (n in kept) and best in kept
    # end-to-end vs oracle on a parquet corpus with the same rows
    pq.write_table(pa.table({
        "p_partkey": t["p_partkey"], "p_name": t["p_name"],
        "p_brand": pa.array(["b"] * (n + 1)),
        "p_type": pa.array(["t"] * (n + 1)),
        "p_size": t["p_size"].cast(pa.int32()),
        "p_retailprice": pc.divide(t["price_c"].cast(pa.float64()), 100.0),
    }), str(tmp_path / "part.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * "
            f"FROM read_parquet('{tmp_path}/part.parquet')")
    got = _canon(parts_skyline(str(tmp_path)).to_pandas())
    exp = _canon(con.sql(SKYLINE_ORACLE_SQL).df())
    assert got and got == exp


@pytest.fixture()
def session_events(tmp_path):
    """User 0: one event. User 1: a duplicated FIRST timestamp (the
    running-sum tie-break case), then a gap of exactly 30 min (stays in
    the session) and one of 30 min + 1 µs (splits). User 2: three
    sessions of varying sizes."""
    rows, eid = [], 0
    base = dt.datetime(2024, 6, 1)
    rows.append({"event_id": eid, "ts": base, "user_id": 0,
                 "event_type": "view", "value": 1.0, "props": ""}); eid += 1
    for off_us in [0, 0, 30 * 60 * 1_000_000,
                   2 * 30 * 60 * 1_000_000 + 1]:
        rows.append({"event_id": eid,
                     "ts": base + dt.timedelta(microseconds=off_us),
                     "user_id": 1, "event_type": "view", "value": 1.0,
                     "props": ""}); eid += 1
    for k in range(9):
        rows.append({"event_id": eid,
                     "ts": base + dt.timedelta(hours=k // 3, minutes=k % 3),
                     "user_id": 2, "event_type": "view", "value": 1.0,
                     "props": ""}); eid += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_session_table_boundaries(ray_session, session_events):
    from askg_ray.ops import windows as w

    sf, con = session_events
    got = _canon(w.events_session_table(sf).to_pandas())
    exp = _canon(con.sql(w.SESSION_TABLE_ORACLE_SQL).df())
    assert got and got == exp
    df = w.events_session_table(sf).to_pandas()
    u1 = df[df["user_id"] == 1].sort_values("session_idx")
    # exactly-30-min gap stays; +1 µs splits
    assert list(u1["n_events"]) == [3, 1]
    assert df[df["user_id"] == 2]["session_idx"].max() == 3
    assert (df[df["user_id"] == 0]["duration_us"] == 0).all()


def test_type_hll_grouped_sketch(ray_session):
    """Per-type registers: merging the sketch with itself is a no-op
    (max-combine idempotence), each type's estimate lands within 15%
    of its true distinct-user count, and the per-type registers agree
    with the global sketch's hash contract."""
    import duckdb
    import numpy as np

    from askg_ray.ops.stats import HLL_P, events_type_hll

    sf = "/root/testdata/sf0.01"
    regs = events_type_hll(sf).to_pandas()
    m = 1 << HLL_P
    truth = duckdb.sql(
        f"SELECT event_type, count(DISTINCT user_id) AS n FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY event_type"
    ).df().set_index("event_type")["n"]
    alpha = 0.7213 / (1 + 1.079 / m)
    for et, g in regs.groupby("event_type"):
        r = np.zeros(m)
        r[g["register"].to_numpy()] = g["max_rho"].to_numpy()
        est = alpha * m * m / np.sum(2.0 ** -r)
        zeros = m - np.count_nonzero(r)
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        assert abs(est - truth[et]) / truth[et] < 0.15, et


def test_checksum_partition_and_content_sensitivity(ray_session, tmp_path):
    """The checksum is invariant to row order / partitioning and
    sensitive to any single-row change."""
    import duckdb

    from askg_ray.ops.stats import documents_checksum

    sf = "/root/testdata/sf0.001"
    base = documents_checksum(sf).to_pandas()
    # shuffled, re-chunked copy of the same rows
    con = duckdb.connect()
    con.sql(f"COPY (SELECT * FROM read_parquet('{sf}/documents.parquet') "
            f"ORDER BY md5(CAST(doc_id AS VARCHAR))) TO "
            f"'{tmp_path}/documents.parquet' (ROW_GROUP_SIZE 37)")
    shuf = documents_checksum(str(tmp_path)).to_pandas()
    assert base.values.tolist() == shuf.values.tolist()
    # mutate one row -> checksum moves, count doesn't
    con.sql(f"COPY (SELECT doc_id, CASE WHEN doc_id = 1 THEN 'X' || text "
            f"ELSE text END AS text, lang, source, n_chars "
            f"FROM read_parquet('{sf}/documents.parquet')) TO "
            f"'{tmp_path}/documents.parquet' (ROW_GROUP_SIZE 64)")
    mut = documents_checksum(str(tmp_path)).to_pandas()
    assert mut["n_rows"][0] == base["n_rows"][0]
    assert mut["checksum"][0] != base["checksum"][0]


def test_window_distinct_and_type_runs(ray_session, modal_events):
    """Windowed COUNT(DISTINCT) and RLE runs vs their oracles on the
    duplicate-ts corpus; RANGE-frame peer semantics asserted
    structurally (equal-ts rows share one distinct count)."""
    from askg_ray.ops import windows as w

    sf, con = modal_events
    for fn, sql in [(w.events_window_distinct, w.WINDOW_DISTINCT_ORACLE_SQL),
                    (w.events_type_runs, w.TYPE_RUNS_ORACLE_SQL)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got and got == exp, fn.__name__
    wd = w.events_window_distinct(sf).to_pandas().set_index("event_id")
    # user 1's two equal-ts events (eids 1, 2) are RANGE peers: both
    # windows contain both rows -> both count 2 distinct types
    assert wd.loc[1, "n_distinct"] == 2 and wd.loc[2, "n_distinct"] == 2
    runs = w.events_type_runs(sf).to_pandas()
    u2 = runs[runs["user_id"] == 2]
    assert (u2["run_len"] == 1).all() and len(u2) == 12  # alternating


@pytest.fixture()
def flatten_events(tmp_path):
    texts = ['{"k": 7}', "", None, '{"j": 9}', '{"k": notanum}',
             '{"k": 123456}']
    rows = [{"event_id": i, "ts": dt.datetime(2024, 1, 1), "user_id": 0,
             "event_type": "view", "value": 1.0, "props": p}
            for i, p in enumerate(texts)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_props_flatten_malformed(ray_session, flatten_events):
    from askg_ray.ops.stats import (PROPS_FLATTEN_ORACLE_SQL,
                                    events_props_flatten)

    sf, con = flatten_events
    got_df = events_props_flatten(sf).to_pandas()
    assert _canon(got_df) == _canon(con.sql(PROPS_FLATTEN_ORACLE_SQL).df())
    by = got_df.set_index("event_id")
    assert by.loc[0, "k"] == 7 and by.loc[0, "has_k"] == 1
    assert (by.loc[[1, 2, 3, 4], "k"] == -1).all()
    assert by.loc[5, "k"] == 123456 and by["has_k"].sum() == 2


def test_bottomk_per_lang(ray_session, tiny_corpus):
    from askg_ray.ops.curation import (BOTTOMK_PER_LANG_ORACLE_SQL,
                                       docs_bottomk_per_lang)

    sf, con = tiny_corpus
    got = _canon(docs_bottomk_per_lang(sf).to_pandas())
    exp = _canon(con.sql(BOTTOMK_PER_LANG_ORACLE_SQL).df())
    assert got and got == exp
    # k=1: exactly one doc per language, the md5-minimal one
    one = docs_bottomk_per_lang(sf, k=1).to_pandas()
    assert len(one) == 3 and one["lang"].is_unique
    exp1 = con.sql(
        "SELECT lang, min(md5(CAST(doc_id AS VARCHAR))) AS priority "
        "FROM documents GROUP BY lang").df()
    assert (one.sort_values("lang")["priority"].tolist()
            == exp1.sort_values("lang")["priority"].tolist())


def test_longest_streak_ties_and_gaps(ray_session, tmp_path):
    """Two equal-length streaks -> the EARLIEST wins; single-day users
    report streak 1; multiple same-day events collapse to one day."""
    rows, eid = [], 0
    base = dt.datetime(2024, 7, 1)
    # user 0: days 0,1,2 then gap, days 10,11,12 (tie -> start day 0)
    for d in [0, 1, 2, 10, 11, 12]:
        for _ in range(2):                      # same-day duplicates
            rows.append({"event_id": eid, "ts": base + dt.timedelta(days=d),
                         "user_id": 0, "event_type": "view", "value": 1.0,
                         "props": ""}); eid += 1
    # user 1: one day only
    rows.append({"event_id": eid, "ts": base, "user_id": 1,
                 "event_type": "view", "value": 1.0, "props": ""}); eid += 1
    # user 2: days 0,1 then 3,4,5 (longer second streak wins)
    for d in [0, 1, 3, 4, 5]:
        rows.append({"event_id": eid, "ts": base + dt.timedelta(days=d),
                     "user_id": 2, "event_type": "view", "value": 1.0,
                     "props": ""}); eid += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    from askg_ray.ops.windows import (STREAK_ORACLE_SQL,
                                      events_longest_streak)

    got_df = events_longest_streak(str(tmp_path)).to_pandas()
    assert _canon(got_df) == _canon(con.sql(STREAK_ORACLE_SQL).df())
    by = got_df.set_index("user_id")
    base_day = int(base.timestamp() * 1e6) // (86_400_000_000)
    assert by.loc[0, "longest_streak"] == 3
    assert by.loc[0, "streak_start_day"] == base_day       # earliest tie
    assert by.loc[0, "n_active_days"] == 6
    assert by.loc[1, "longest_streak"] == 1
    assert by.loc[2, "longest_streak"] == 3
    assert by.loc[2, "streak_start_day"] == base_day + 3


def test_decayed_score_horizon_and_halving(ray_session, tmp_path):
    """The newest day weighs 2^20 per event, each older day exactly
    halves, and events past the 20-day horizon contribute ZERO."""
    rows, eid = [], 0
    base = dt.datetime(2024, 8, 1)
    for d, n in [(0, 1), (1, 2), (20, 4), (25, 8)]:   # ages rel. newest
        for _ in range(n):
            rows.append({"event_id": eid,
                         "ts": base - dt.timedelta(days=d), "user_id": 0,
                         "event_type": "view", "value": 1.0,
                         "props": ""}); eid += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    from askg_ray.ops.stats import DECAYED_ORACLE_SQL, events_decayed_score

    got = events_decayed_score(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(DECAYED_ORACLE_SQL).df())
    row = got.iloc[0]
    # 1*2^20 + 2*2^19 + 4*1 + 8*0
    assert row["score_u"] == (1 << 20) + 2 * (1 << 19) + 4
    assert row["n"] == 15


def test_max_concurrency_cross_bucket(ray_session, tmp_path):
    """Sessions that OVERLAP across users and SPAN the day-bucket
    boundary (a +1 in one bucket, its -1 in the next) — the
    cross-bucket prefix-sum path — plus a planted tie in the peak
    (two timestamps reach the same concurrency; earliest must win).
    Checked against the oracle AND re-run with a 1-hour bucket grid,
    which must give the identical answer (grid independence)."""
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1, 23, 50)      # 10 min before midnight
    # three users whose single sessions all straddle midnight
    for u in range(3):
        for m in [0, 20]:                       # 23:50 -> 00:10, one session
            rows.append({"event_id": eid,
                         "ts": base + dt.timedelta(minutes=m + u),
                         "user_id": u, "event_type": "view", "value": 1.0,
                         "props": ""}); eid += 1
    # later, a second peak of 3 at a LATER ts (tie -> earliest wins)
    late = dt.datetime(2024, 3, 3, 12, 0)
    for u in range(3, 6):
        rows.append({"event_id": eid, "ts": late, "user_id": u,
                     "event_type": "view", "value": 1.0,
                     "props": ""}); eid += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    from askg_ray.ops.windows import (MAX_CONCURRENCY_ORACLE_SQL,
                                      sessions_max_concurrency)

    got = sessions_max_concurrency(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(MAX_CONCURRENCY_ORACLE_SQL).df())
    assert int(got["max_concurrent"].iloc[0]) == 3
    # earliest of the two 3-way peaks: user 2's session start (23:52)
    exp_ts = int((base + dt.timedelta(minutes=2)).timestamp() * 1e6)
    assert int(got["at_ts_us"].iloc[0]) == exp_ts
    # grid independence: 1-hour buckets, same answer
    fine = sessions_max_concurrency(
        str(tmp_path), bucket_us=3_600_000_000).to_pandas()
    assert _canon(fine) == _canon(got)


def test_diversified_topk_quota_and_ties(ray_session, tmp_path):
    """One brand owns the 5 highest prices (quota must cut it to 2),
    exact price ties INSIDE a brand and ACROSS brands (partkey breaks
    both), and the freed slots fall to lower-priced brands — checked
    against the window-function oracle plus explicit quota asserts."""
    rows = []
    pk = 0
    for price in [99.0, 98.0, 97.0, 96.0, 95.0]:    # brand HOG tops all
        rows.append({"p_partkey": pk, "p_brand": "HOG",
                     "p_retailprice": price}); pk += 1
    for b in ["A", "B", "C"]:
        for price in [50.0, 50.0, 40.0]:            # in/cross-brand ties
            rows.append({"p_partkey": pk, "p_brand": b,
                         "p_retailprice": price}); pk += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "part.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * "
            f"FROM read_parquet('{tmp_path}/part.parquet')")

    from askg_ray.ops.relational import (DIV_PER_BRAND, DIV_TOPK_ORACLE_SQL,
                                         parts_topk_diversified)

    got = parts_topk_diversified(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(DIV_TOPK_ORACLE_SQL).df())
    assert (got.groupby("p_brand").size() <= DIV_PER_BRAND).all()
    hog = got[got["p_brand"] == "HOG"].sort_values("price_c")
    assert list(hog["price_c"]) == [9800, 9900]     # top-2 only
    # 2 HOG + 2 each of A/B/C = 8 rows total (k=10 not reachable)
    assert len(got) == 8


def test_simpson_exact_rational(ray_session, tmp_path):
    """User 0: single event (den must be 0 — undefined index). User 1:
    all same type (num == den, index exactly 1). User 2: 2+2 split over
    two types (num 4, den 12 → 1/3). Hash-checked against the oracle
    and against hand arithmetic."""
    rows, eid = [], 0
    base = dt.datetime(2024, 9, 1)
    def add(u, et):
        nonlocal eid
        rows.append({"event_id": eid, "ts": base, "user_id": u,
                     "event_type": et, "value": 1.0, "props": ""})
        eid += 1
    add(0, "view")
    for _ in range(5):
        add(1, "click")
    for et in ["view", "view", "click", "click"]:
        add(2, et)
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    from askg_ray.ops.stats import SIMPSON_ORACLE_SQL, events_user_simpson

    got = events_user_simpson(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(SIMPSON_ORACLE_SQL).df())
    by = got.set_index("user_id")
    assert by.loc[0, "simpson_den"] == 0 and by.loc[0, "simpson_num"] == 0
    assert by.loc[1, "simpson_num"] == by.loc[1, "simpson_den"] == 20
    assert (by.loc[2, "simpson_num"], by.loc[2, "simpson_den"]) == (4, 12)
    assert by.loc[2, "n_types"] == 2


def test_watermark_windows_semantics(ray_session, tmp_path):
    """Hand-built arrival sequence: an event whose window end the
    watermark (running max ts − 1 h) has passed is LATE; results are
    independent of the bucket grain."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from askg_ray.ops.windows import events_watermark_windows

    B = dt.datetime(2025, 1, 1)

    def ts(h, m=0):
        return B + dt.timedelta(hours=h, minutes=m)

    # arrival order = event_id order:
    #  e1 @ 00:10  -> wm 23:10 prev day: on time (window 00)
    #  e2 @ 05:00  -> wm jumps to 04:00: window 00 CLOSED afterwards
    #  e3 @ 00:20  -> late (window 00 end 01:00 <= wm 04:00)
    #  e4 @ 04:30  -> on time (window 04 end 05:00 > wm 04:00)
    #  e5 @ 03:30  -> late (window 03 end 04:00 <= wm 04:00)
    rows = [(1, ts(0, 10), 1.0), (2, ts(5), 2.0), (3, ts(0, 20), 4.0),
            (4, ts(4, 30), 8.0), (5, ts(3, 30), 16.0)]
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }), str(tmp_path / "events.parquet"))

    def collect(n_buckets):
        out = {}
        for r in events_watermark_windows(str(tmp_path),
                                          n_buckets=n_buckets).take_all():
            out[r["window_start"]] = (r["n_on_time"], r["n_late"],
                                      r["on_time_cents"])
        return out

    got = collect(256)
    assert got[ts(0)] == (1, 1, 100)      # e1 on time, e3 late
    assert got[ts(5)] == (1, 0, 200)      # e2
    assert got[ts(4)] == (1, 0, 800)      # e4
    assert got[ts(3)] == (0, 1, 0)        # e5 late
    # bucket-grain independence: the prefix-scan decomposition is exact
    assert collect(2) == got == collect(1)
