"""Adversarial coverage for events_gap_fill, events_value_outliers,
events_type_cooccurrence, doc_inverted_index and top_return_customers:
single-day users, an exact mean+2σ boundary value, σ=0 groups,
single-type users, posting lists longer than the cap, revenue ties and
a forced shuffle-path dim attach — each hash-compared against its
DuckDB oracle on the same synthetic parquet."""

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _canon(df):
    df = df[sorted(df.columns)].astype(str)
    return sorted("|".join(x) for x in df.itertuples(index=False))


@pytest.fixture()
def gap_events(tmp_path):
    """User 0: one single active day. User 1: two events 10 days apart
    (9 gap days). User 2: exact-midnight events on adjacent days.
    Type 'flat' has σ=0; type 'edge' = four 0.00 plus one 1.00, so the
    1.00 sits EXACTLY at mean+2σ (strictly-above must exclude it);
    'wild' has one extreme outlier that must be flagged."""
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)

    def add(ts, uid, kind, val):
        nonlocal eid
        rows.append({"event_id": eid, "ts": ts, "user_id": uid,
                     "event_type": kind, "value": float(val), "props": ""})
        eid += 1

    add(base + dt.timedelta(hours=5), 0, "flat", 7.0)
    add(base, 1, "flat", 7.0)
    add(base + dt.timedelta(days=10, hours=3), 1, "flat", 7.0)
    add(base, 2, "edge", 0.0)              # exact midnight
    add(base + dt.timedelta(days=1), 2, "edge", 0.0)
    add(base + dt.timedelta(days=1, hours=1), 2, "edge", 0.0)
    add(base + dt.timedelta(hours=2), 2, "edge", 0.0)
    add(base + dt.timedelta(hours=3), 2, "edge", 1.0)   # == mean+2σ
    # 20 baseline wild events + 1 extreme: with n=21 the extreme's
    # z-score (~4.5) clears 2σ; a smaller group could never flag
    # (max z among n points is < 2 for n <= 5)
    for i in range(20):
        add(base + dt.timedelta(minutes=i), i % 3, "wild", 10.0)
    add(base + dt.timedelta(hours=1), 1, "wild", 1000.0)  # flagged
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_gap_fill_adversarial(ray_session, gap_events):
    from askg_ray.ops import relational as r

    sf, con = gap_events
    got = r.events_gap_fill(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(r.GAP_FILL_ORACLE_SQL).df())
    # user 0: single active day -> exactly one row; user 1: 11 dense
    # days of which 9 are zero-filled
    assert len(got[got["user_id"] == 0]) == 1
    u1 = got[got["user_id"] == 1]
    assert len(u1) == 11 and (u1["n"] == 0).sum() == 9


def test_outliers_boundary_and_sigma_zero(ray_session, gap_events):
    from askg_ray.ops import stats as s

    sf, con = gap_events
    got = s.events_value_outliers(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(s.OUTLIERS_ORACLE_SQL).df())
    # σ=0 group flags nothing; the exact mean+2σ value is NOT flagged
    # (strict >); only the planted extreme survives
    assert list(got["event_type"]) == ["wild"]
    assert list(got["value_cents"]) == [100000]


def test_cooccurrence_single_type_user(ray_session, gap_events):
    from askg_ray.ops import stats as s

    sf, con = gap_events
    got = s.events_type_cooccurrence(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(s.COOCCURRENCE_ORACLE_SQL).df())
    # users 0/1 have {flat, wild}, user 2 {edge, wild}: two pairs, and
    # pair members are always lexicographically ordered
    assert (got["type_a"] < got["type_b"]).all()
    n = got.set_index(["type_a", "type_b"])["n_users"]
    assert n[("flat", "wild")] == 2 and n[("edge", "wild")] == 1


@pytest.fixture()
def tiny_docs_idx(tmp_path):
    """12 docs all sharing token 'common' (df > cap) with in-doc
    repeats that must count once."""
    docs = [{"doc_id": i, "text": "common common tok%d" % (i % 3)}
            for i in range(12)]
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    return str(tmp_path), con


def test_inverted_index_cap_and_repeats(ray_session, tiny_docs_idx):
    from askg_ray.ops import text as t

    sf, con = tiny_docs_idx
    got = t.doc_inverted_index(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(t.INVERTED_ORACLE_SQL).df())
    row = got.set_index("token").loc["common"]
    assert row["df"] == 12                       # true df survives the cap
    assert row["postings"] == ",".join(str(i) for i in range(10))


@pytest.fixture()
def tiny_tpch(tmp_path):
    """Two customers tied on returned revenue (tie-break by custkey),
    one with nothing returned, and one with no orders at all (the Q13
    zero bucket)."""
    custs = [{"c_custkey": i, "c_name": f"Cust#{i}"} for i in range(4)]
    orders = [{"o_orderkey": 10 + i, "o_custkey": i} for i in range(3)]
    li = [
        {"l_orderkey": 10, "l_extendedprice": 50.0, "l_discount": 0.0,
         "l_returnflag": "R"},
        {"l_orderkey": 11, "l_extendedprice": 25.0, "l_discount": 0.0,
         "l_returnflag": "R"},
        {"l_orderkey": 11, "l_extendedprice": 25.0, "l_discount": 0.0,
         "l_returnflag": "R"},
        {"l_orderkey": 12, "l_extendedprice": 99.0, "l_discount": 0.0,
         "l_returnflag": "N"},
    ]
    for name, rows in [("customer", custs), ("orders", orders),
                       ("lineitem", li)]:
        pq.write_table(pa.Table.from_pylist(rows),
                       str(tmp_path / f"{name}.parquet"))
    con = duckdb.connect()
    for name in ("customer", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {name} AS SELECT * "
                f"FROM read_parquet('{tmp_path}/{name}.parquet')")
    return str(tmp_path), con


def test_top_return_customers_tie_and_shuffle_path(ray_session, tiny_tpch):
    from askg_ray.ops import joins as j

    sf, con = tiny_tpch
    exp = _canon(con.sql(j.RETURN_CUSTOMERS_ORACLE_SQL).df())
    # broadcast attach path AND forced partitioned-join attach path
    for bt in (None, 0):
        got = j.top_return_customers(sf, broadcast_threshold=bt).to_pandas()
        assert _canon(got) == exp, f"broadcast_threshold={bt}"
        # revenue tie (5000u) breaks on the lower custkey first
        assert list(got["c_custkey"]) == [0, 1]


@pytest.fixture()
def funnel_events(tmp_path):
    """One user per funnel depth, plus the strict-order edges: a click
    AT the view's exact timestamp must not advance (user 10), and a
    purchase BEFORE the view/click chain must not count (user 11)."""
    rows, eid = [], 0
    base = dt.datetime(2024, 5, 1)

    def add(uid, kind, hours):
        nonlocal eid
        rows.append({"event_id": eid, "ts": base + dt.timedelta(hours=hours),
                     "user_id": uid, "event_type": kind,
                     "value": 1.0, "props": ""})
        eid += 1

    add(0, "error", 0)                              # stage 0
    add(1, "view", 0)                               # stage 1
    add(2, "view", 0); add(2, "click", 1)           # stage 2
    add(3, "view", 0); add(3, "click", 1); add(3, "purchase", 2)  # 3
    add(10, "view", 0); add(10, "click", 0)         # same ts: stage 1
    add(11, "purchase", 0); add(11, "view", 1); add(11, "click", 2)  # 2
    # user 12: second chance — first click precedes view, later one counts
    add(12, "click", 0); add(12, "view", 1); add(12, "click", 2)     # 2
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_funnel_strict_order(ray_session, funnel_events):
    from askg_ray.ops import funnel as f

    sf, con = funnel_events
    got = f.events_funnel(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(f.FUNNEL_ORACLE_SQL).df())
    n = got.set_index("stage_reached")["n_users"]
    assert n[0] == 1 and n[1] == 2 and n[2] == 3 and n[3] == 1


def test_cohort_retention_offsets(ray_session, gap_events):
    from askg_ray.ops import funnel as f

    sf, con = gap_events
    got = f.events_cohort_retention(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(f.COHORT_ORACLE_SQL).df())
    # user 1's 10-day return shows as offset 10 in its cohort
    assert 10 in set(got["day_offset"])
    # offset-0 row(s) cover every user exactly once
    assert got[got["day_offset"] == 0]["n_users"].sum() == 3


@pytest.fixture()
def stat_events(tmp_path):
    """Order-statistic boundary groups: n=1, even n (lower median),
    n=10 (p90 index 9·9//10=8 → the 9th value), duplicated values; one
    day with a single type (share exactly 1e6) and one day splitting
    1:2 (floor shares 333333/666666)."""
    rows, eid = [], 0
    base = dt.datetime(2024, 7, 1)

    def add(kind, val, day=0, uid=0):
        nonlocal eid
        rows.append({"event_id": eid,
                     "ts": base + dt.timedelta(days=day, minutes=eid),
                     "user_id": uid, "event_type": kind,
                     "value": float(val), "props": ""})
        eid += 1

    add("solo", 42.5)                       # n=1: median = p90 = 4250
    for v in (1, 2, 3, 4):                  # even n: lower median = 200
        add("even", v)
    for v in (5, 1, 1, 2, 2, 3, 3, 4, 4, 5):  # n=10 with dups: p90 = 500
        add("ten", v)
    add("alone", 1, day=5)                  # single-type day
    add("pair", 1, day=6)                   # 1:2 day split
    add("trio", 1, day=6)
    add("trio", 2, day=6)
    t = pa.Table.from_pylist(rows)
    pq.write_table(t, str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_type_median_order_statistics(ray_session, stat_events):
    from askg_ray.ops import stats as s

    sf, con = stat_events
    got = s.events_type_median(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(s.TYPE_MEDIAN_ORACLE_SQL).df())
    m = got.set_index("event_type")
    assert m.loc["solo", "median_cents"] == 4250
    assert m.loc["solo", "p90_cents"] == 4250
    assert m.loc["even", "median_cents"] == 200     # lower middle of 4
    assert m.loc["ten", "p90_cents"] == 500         # 9th of 10 sorted


def test_share_of_day_floor_ppm(ray_session, stat_events):
    from askg_ray.ops import windows as w

    sf, con = stat_events
    got = w.events_share_of_day(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(w.SHARE_ORACLE_SQL).df())
    by = got.set_index("event_type")
    assert by.loc["alone", "share_ppm"] == 1_000_000
    assert by.loc["pair", "share_ppm"] == 333_333   # floor, not round
    assert by.loc["trio", "share_ppm"] == 666_666


@pytest.fixture()
def random_events(tmp_path):
    """Seeded collision-heavy random corpus: tiny ts domain (many exact
    duplicate timestamps), tiny value domain (ties everywhere), skewed
    type mix — the distributions that break tie-breaks and boundary
    arithmetic if anything is off."""
    import numpy as np

    rng = np.random.RandomState(7)
    n = 400
    base = dt.datetime(2024, 1, 1)
    rows = [{
        "event_id": i,
        # 40 distinct hour slots over 10 days -> heavy ts collisions
        "ts": base + dt.timedelta(days=int(rng.randint(10)),
                                  hours=int(rng.randint(4))),
        "user_id": int(rng.randint(12)),
        "event_type": ["view", "click", "purchase", "error",
                       "signup"][rng.randint(5)],
        "value": float(rng.randint(7)) / 2.0,   # 7 values incl. x.5
        "props": "",
    } for i in range(n)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_randomized_event_ops_parity(ray_session, random_events):
    from askg_ray.ops import funnel as f
    from askg_ray.ops import relational as r
    from askg_ray.ops import stats as s
    from askg_ray.ops import windows as w

    sf, con = random_events
    cases = [
        (r.events_gap_fill, r.GAP_FILL_ORACLE_SQL),
        (s.events_value_outliers, s.OUTLIERS_ORACLE_SQL),
        (s.events_type_cooccurrence, s.COOCCURRENCE_ORACLE_SQL),
        (s.events_type_median, s.TYPE_MEDIAN_ORACLE_SQL),
        (w.events_share_of_day, w.SHARE_ORACLE_SQL),
        (f.events_funnel, f.FUNNEL_ORACLE_SQL),
        (f.events_cohort_retention, f.COHORT_ORACLE_SQL),
    ]
    for fn, sql in cases:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got == exp, fn.__name__


@pytest.fixture()
def random_docs(tmp_path):
    """Seeded random docs over an 8-word vocab (df/tf ties everywhere),
    including empty and single-token docs, with doc_ids spread across
    packing buckets. Words share 2-letter prefixes/suffixes so
    char-pair (BPE merge) counts collide and tie too."""
    import numpy as np

    rng = np.random.RandomState(11)
    vocab = ["a", "ab", "ba", "abc", "bb", "c", "ca", "cb"]
    docs = []
    for i in range(60):
        did = int(i * 97 % 3500)            # spreads over buckets 0-3
        k = int(rng.randint(0, 12))
        docs.append({"doc_id": did,
                     "text": " ".join(vocab[rng.randint(8)]
                                      for _ in range(k))})
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    return str(tmp_path), con


def test_randomized_doc_ops_parity(ray_session, random_docs):
    from askg_ray.ops import packing as p
    from askg_ray.ops import stats as s
    from askg_ray.ops import text as t

    sf, con = random_docs
    for fn, sql in [(p.docs_pack_sequences, p.PACK_ORACLE_SQL),
                    (p.doc_shuffle_index, p.SHUFFLE_INDEX_ORACLE_SQL),
                    (p.docs_curriculum_decile, p.CURRICULUM_ORACLE_SQL),
                    (s.doc_lm_score, s.LM_SCORE_ORACLE_SQL),
                    (t.doc_top_terms, t.TOP_TERMS_ORACLE_SQL),
                    (t.doc_inverted_index, t.INVERTED_ORACLE_SQL),
                    (t.bpe_merge_vocab, t.BPE_MERGE_ORACLE_SQL)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got == exp, fn.__name__
    # packing invariant vs a naive driver scan: offsets are a cumsum
    got = p.docs_pack_sequences(sf).to_pandas().sort_values("doc_id")
    starts = (got["seq_id"] * 256 + got["offset_in_seq"]).to_numpy()
    ntok = got["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert ((starts[1:] - starts[:-1]) == ntok[:-1]).all()
    # shuffle index is a dense permutation covering every doc exactly once
    import numpy as np
    sh = p.doc_shuffle_index(sf).to_pandas()
    assert sorted(sh["shuffle_rank"]) == list(range(len(sh)))
    assert sh["doc_id"].nunique() == len(got)
    # curriculum deciles: monotone in length, balanced within one doc
    cd = p.docs_curriculum_decile(sf).to_pandas().sort_values(
        ["n_tokens", "doc_id"])
    assert cd["decile"].is_monotonic_increasing
    assert cd["decile"].value_counts().max() <= -(-len(cd) // 10) + 1
    # lm score bounds: every doc appears; per-occurrence score <= 1e6
    lm = s.doc_lm_score(sf).to_pandas()
    assert len(lm) == len(got)
    assert (lm["lm_score_micro"]
            <= lm["n_bigrams"] * 1_000_000).all()
    assert (lm.loc[lm["n_bigrams"] == 0, "lm_score_micro"] == 0).all()


def test_corpus_pack_consistent_with_prep(ray_session):
    """The prep→pack composite covers exactly the train split corpus_prep
    reports, and its offsets form one contiguous token stream."""
    from askg_ray.ops.curation import corpus_prep
    from askg_ray.ops.packing import SEQ_BUDGET, corpus_pack

    sf = "/root/testdata/sf0.001"
    prep = corpus_prep(sf).to_pandas().set_index("split")
    packed = corpus_pack(sf).to_pandas().sort_values("doc_id")
    assert len(packed) == prep.loc["train", "n_docs"]
    starts = (packed["seq_id"] * SEQ_BUDGET
              + packed["offset_in_seq"]).to_numpy()
    ntok = packed["n_tokens"].to_numpy()
    assert starts[0] == 0
    assert ((starts[1:] - starts[:-1]) == ntok[:-1]).all()


def test_hll_estimate_accuracy(ray_session):
    """The register sketch feeds the standard HLL estimator to within
    15% of the true distinct-user count (sf0.1: 1500 users over 256
    registers — the raw-estimate regime; small corpora would need the
    linear-counting correction)."""
    import math

    import duckdb

    from askg_ray.ops.stats import HLL_P, events_user_hll

    sf = "/root/testdata/sf0.1"
    regs = {r["register"]: r["max_rho"]
            for r in events_user_hll(sf).take_all()}
    m = 1 << HLL_P
    alpha = 0.7213 / (1 + 1.079 / m)
    s = sum(2.0 ** -regs.get(j, 0) for j in range(m))
    est = alpha * m * m / s
    true = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{sf}/events.parquet')").fetchone()[0]
    assert abs(est - true) / true < 0.15, (est, true)
    # registers are a max-combine: re-running on a different block
    # layout must give the identical table
    regs2 = {r["register"]: r["max_rho"]
             for r in events_user_hll(sf).take_all()}
    assert regs == regs2


def test_upsert_and_q13_semantics(ray_session):
    """Latest-wins upsert: %10==3 keys land on version 2 with the UPD
    fingerprint, spawned keys exist above 1e6, everything else stays
    version 1 and the key set is exactly base ∪ new. Q13: the
    zero-order bucket exists and buckets sum to the customer count."""
    import duckdb

    from askg_ray.ops.joins import customer_order_dist, documents_upsert

    sf = "/root/testdata/sf0.001"
    up = documents_upsert(sf).to_pandas()
    assert up["doc_id"].is_unique
    old = up[up["doc_id"] < 1_000_000]
    assert ((old["version"] == 2) == (old["doc_id"] % 10 == 3)).all()
    new = up[up["doc_id"] >= 1_000_000]
    assert (new["version"] == 2).all()
    n_docs, n_new = duckdb.sql(
        f"SELECT count(*), count(*) FILTER (doc_id % 25 = 0) FROM "
        f"read_parquet('{sf}/documents.parquet')").fetchone()
    assert len(old) == n_docs and len(new) == n_new

    q13 = customer_order_dist(sf).to_pandas()
    n_cust = duckdb.sql(f"SELECT count(*) FROM "
                        f"read_parquet('{sf}/customer.parquet')").fetchone()[0]
    assert q13["custdist"].sum() == n_cust


def test_q13_zero_bucket(ray_session, tiny_tpch):
    """The bucket an inner join silently loses: the orderless customer
    lands in c_count=0, and the Ray output hash-matches the oracle."""
    from askg_ray.ops import joins as j

    sf, con = tiny_tpch
    got = j.customer_order_dist(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(j.Q13_ORACLE_SQL).df())
    assert got.set_index("c_count").loc[0, "custdist"] == 1


def test_scd2_semantics_both_paths(ray_session):
    """SCD Type-2: updated keys carry BOTH versions — v1 closed
    (valid_to=2, is_current=0) and v2 open (-1, 1); untouched and
    spawned keys carry exactly one open row. The direct-exchange path
    and the groupby fallback (exchange_max_rows=0) emit identical
    rows."""
    from askg_ray.ops.joins import documents_scd2

    sf = "/root/testdata/sf0.001"
    ex = documents_scd2(sf).to_pandas()
    gb = documents_scd2(sf, exchange_max_rows=0).to_pandas()
    key = ["doc_id", "version"]
    assert (ex.sort_values(key).reset_index(drop=True).equals(
            gb.sort_values(key).reset_index(drop=True)))

    upd = ex[(ex["doc_id"] < 1_000_000) & (ex["doc_id"] % 10 == 3)]
    assert set(upd["version"]) == {1, 2}
    v1 = upd[upd["version"] == 1]
    assert (v1["valid_to"] == 2).all() and (v1["is_current"] == 0).all()
    v2 = upd[upd["version"] == 2]
    assert (v2["valid_to"] == -1).all() and (v2["is_current"] == 1).all()
    rest = ex[~ex["doc_id"].isin(upd["doc_id"])]
    assert (rest["is_current"] == 1).all() and (rest["valid_to"] == -1).all()
    # exactly one current row per key
    cur = ex[ex["is_current"] == 1]
    assert cur["doc_id"].is_unique and set(cur["doc_id"]) == set(ex["doc_id"])


@pytest.fixture()
def typo_corpus(tmp_path):
    """Tokens planted at every edit class: substitution ('merge' vs
    'marge', dist 1), deletion ('stream' vs 'steam', dist 1), double
    edit ('batch' vs 'match' + trailing swap 'botch', dist 1/2), a
    dist-3 pair that must NOT pair ('filter' vs 'fiddle'), a
    frequency-1 token ('rarely') and a short token ('abc') that the
    vocab filters drop."""
    texts = [
        "merge stream batch filter merge stream",
        "marge steam match fiddle marge steam",
        "botch batch match filter abc abc",
        "rarely merge marge batch botch match",
    ]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["synthetic"] * len(texts)),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    return str(tmp_path), con


def test_token_fuzzy_pairs_adversarial(ray_session, typo_corpus):
    from askg_ray.ops.text import FUZZY_PAIRS_ORACLE_SQL, token_fuzzy_pairs

    sf, con = typo_corpus
    got_df = token_fuzzy_pairs(sf).to_pandas()
    got = _canon(got_df)
    exp = _canon(con.sql(FUZZY_PAIRS_ORACLE_SQL).df())
    assert got and got == exp
    pairs = {(a, b): d for a, b, d in
             zip(got_df["tok_a"], got_df["tok_b"], got_df["dist"])}
    assert pairs[("marge", "merge")] == 1        # substitution
    assert pairs[("steam", "stream")] == 1       # deletion
    assert pairs[("batch", "match")] == 1
    assert pairs[("batch", "botch")] == 1
    assert ("fiddle", "filter") not in pairs     # dist 3 excluded
    assert not any("rarely" in p or "abc" in p for p in pairs)  # filtered
    # each unordered pair appears exactly once despite multi-key blocking
    assert got_df.groupby(["tok_a", "tok_b"]).size().max() == 1


@pytest.fixture()
def rfm_events(tmp_path):
    """All users share ONE frequency (f quartiles split purely by the
    user_id tie-break), monetary values collide in pairs, and user 9's
    duplicate same-day events exercise the first-per-window dedup."""
    rows, eid = [], 0
    base = dt.datetime(2024, 5, 1)
    for u in range(10):
        for k in range(3):                      # same f_n = 3 for all
            rows.append({"event_id": eid,
                         "ts": base + dt.timedelta(days=u, hours=k),
                         "user_id": u, "event_type": "view",
                         "value": float((u // 2) * 10),   # paired ties
                         "props": ""}); eid += 1
    for k in range(4):                          # dup (user, day, type)
        rows.append({"event_id": eid, "ts": base + dt.timedelta(minutes=k),
                     "user_id": 9, "event_type": "click", "value": 1.0,
                     "props": ""}); eid += 1
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    return str(tmp_path), con


def test_rfm_and_first_per_window(ray_session, rfm_events):
    from askg_ray.ops.funnel import RFM_ORACLE_SQL, events_rfm
    from askg_ray.ops.relational import (FIRST_PER_WINDOW_ORACLE_SQL,
                                         events_first_per_window)

    sf, con = rfm_events
    for fn, sql in [(events_rfm, RFM_ORACLE_SQL),
                    (events_first_per_window, FIRST_PER_WINDOW_ORACLE_SQL)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got and got == exp, fn.__name__
    rfm = events_rfm(sf).to_pandas().sort_values("user_id")
    # 10 users, all-tied frequency: ntile semantics put users 0-2 in f_q
    # 1 ... 8-9 in f_q 4, split ONLY by user_id
    u9 = rfm[rfm["user_id"] == 9].iloc[0]
    assert list(rfm["f_q"])[:3] == [1, 1, 1] and u9["f_q"] == 4
    assert u9["f_n"] == 7                        # the 4 dup clicks count
    assert (rfm["segment"] ==
            rfm["r_q"].astype(str) + rfm["f_q"].astype(str)
            + rfm["m_q"].astype(str)).all()
    # recency strictly increases with user_id here -> r_q non-decreasing
    assert rfm["r_q"].is_monotonic_increasing
    fw = events_first_per_window(sf).to_pandas()
    dup = fw[(fw["user_id"] == 9) & (fw["event_type"] == "click")]
    assert len(dup) == 1 and dup.iloc[0]["n_in_window"] == 4
    assert dup.iloc[0]["first_event_id"] == 30


def test_bfs_hops_path_graph(ray_session, tmp_path):
    """Handcrafted path graph 1-2-3-4-5 (one co-order pair per order)
    plus an isolated part 99: hops are exact, the isolated part is
    unreached, and the oracle agrees including its convergence probe."""
    import duckdb

    from askg_ray.ops.graph import BFS_ORACLE_SQL, parts_bfs_hops

    li = [{"l_orderkey": 100 + i, "l_partkey": p}
          for i, pair in enumerate([(1, 2), (2, 3), (3, 4), (4, 5)])
          for p in pair]
    li.append({"l_orderkey": 900, "l_partkey": 99})  # isolated
    pq.write_table(pa.Table.from_pylist(li),
                   str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * "
            f"FROM read_parquet('{tmp_path}/lineitem.parquet')")
    exp = _canon(con.sql(BFS_ORACLE_SQL).df())
    # broadcast fast path AND the forced distributed marker-union path
    for bm in (None, 0):
        kw = {} if bm is None else {"broadcast_max": bm}
        got = parts_bfs_hops(str(tmp_path), **kw).to_pandas()
        assert dict(zip(got["l_partkey"], got["hop"])) == {
            1: 0, 2: 1, 3: 2, 4: 3, 5: 4}, f"broadcast_max={bm}"
        assert _canon(got) == exp, f"broadcast_max={bm}"


def test_types_csv_and_key_skew(ray_session, rfm_events):
    from askg_ray.ops.stats import (KEY_SKEW_ORACLE_SQL,
                                    TYPES_CSV_ORACLE_SQL, events_key_skew,
                                    events_types_csv)

    sf, con = rfm_events
    for fn, sql in [(events_types_csv, TYPES_CSV_ORACLE_SQL),
                    (events_key_skew, KEY_SKEW_ORACLE_SQL)]:
        got = _canon(fn(sf).to_pandas())
        exp = _canon(con.sql(sql).df())
        assert got and got == exp, fn.__name__
    csv = events_types_csv(sf).to_pandas().set_index("user_id")
    assert csv.loc[9, "types_csv"] == "click,view"    # sorted distinct
    assert csv.loc[0, "n_types"] == 1
    sk = events_key_skew(sf).to_pandas().set_index("group_size")
    assert sk.loc[3, "n_keys"] == 9 and sk.loc[7, "n_keys"] == 1


@pytest.fixture()
def dup_docs(tmp_path):
    """Documents with exact duplicate payload bytes (docs 0/2/5 share
    one text, 1/4 another, 3 unique, 6 empty + 7 empty — empties dup
    too) and repeated word bigrams across docs."""
    texts = ["spark join spark join", "fast scan", "spark join spark join",
             "solo words here", "fast scan", "spark join spark join",
             "", ""]
    rows = [{"doc_id": i, "text": t, "lang": "en", "source": "s",
             "n_chars": len(t)} for i, t in enumerate(texts)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    return str(tmp_path), con


def test_media_dedup_and_word_bigrams(ray_session, dup_docs):
    from askg_ray.ops.multimodal import MEDIA_DEDUP_ORACLE_SQL, media_dedup
    from askg_ray.ops.text import WORD_BIGRAM_ORACLE_SQL, doc_word_bigrams

    sf, con = dup_docs
    md = media_dedup(sf).to_pandas()
    assert _canon(md) == _canon(con.sql(MEDIA_DEDUP_ORACLE_SQL).df())
    by = md.set_index("canonical_id")
    assert by.loc[0, "n_copies"] == 3      # docs 0/2/5
    assert by.loc[1, "n_copies"] == 2      # docs 1/4
    # the two empties + doc 7's re-upload replica (id 500007)
    assert by.loc[6, "n_copies"] == 3
    assert 3 not in set(md["canonical_id"])  # unique doc absent

    wb = doc_word_bigrams(sf).to_pandas()
    assert _canon(wb) == _canon(con.sql(WORD_BIGRAM_ORACLE_SQL).df())
    top = wb.set_index("bigram")["n"]
    assert top["spark join"] == 6 and top["join spark"] == 3



def test_gini_exact_properties(ray_session, rfm_events):
    """Histogram-based Gini equals the rank-formula oracle (tie order
    can't matter), zero for a constant group, and equals the brute
    pairwise |xi-xj| sum on the same rows."""
    import itertools

    from askg_ray.ops.stats import GINI_ORACLE_SQL, events_value_gini

    sf, con = rfm_events
    got_df = events_value_gini(sf).to_pandas()
    assert _canon(got_df) == _canon(con.sql(GINI_ORACLE_SQL).df())
    rows = con.sql("SELECT event_type, CAST(round(value*100) AS BIGINT) c "
                   "FROM events").df()
    for et, g in rows.groupby("event_type"):
        xs = g["c"].tolist()
        brute = sum(abs(a - b) for a, b in itertools.combinations(xs, 2))
        mine = got_df.set_index("event_type").loc[et, "gini_num"]
        assert mine == brute, et
    click = got_df.set_index("event_type").loc["click"]
    assert click["gini_num"] == 0          # all click values equal (1.0)


def test_coorder_topk_support_counts(ray_session, tmp_path):
    """Pair (1,2) co-orders twice, (2,3) once; supports and the
    (n DESC, u, v) tie-break order are exact."""
    import duckdb

    from askg_ray.ops.graph import COORDER_TOPK_ORACLE_SQL, parts_coorder_topk

    li = [{"l_orderkey": o, "l_partkey": p}
          for o, ps in [(1, (1, 2)), (2, (1, 2, 2)), (3, (2, 3))]
          for p in ps]
    pq.write_table(pa.Table.from_pylist(li),
                   str(tmp_path / "lineitem.parquet"))
    got = parts_coorder_topk(str(tmp_path)).to_pandas()
    assert got.values.tolist() == [[1, 2, 2], [2, 3, 1]]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * "
            f"FROM read_parquet('{tmp_path}/lineitem.parquet')")
    assert _canon(got) == _canon(con.sql(COORDER_TOPK_ORACLE_SQL).df())


def test_price_bands_boundaries(ray_session, tmp_path):
    """Exact band-boundary prices land in the upper band (lower bound
    inclusive); a price below the first bound clamps into band 0."""
    import duckdb

    from askg_ray.ops.joins import (PRICE_BANDS, PRICE_BANDS_ORACLE_SQL,
                                    orders_price_bands)

    prices = [b / 100 for b, _ in PRICE_BANDS]          # exact bounds
    prices += [0.01, 4999.99, 5000.01, 99999.0]
    rows = [{"o_orderkey": i, "o_custkey": 0, "o_orderstatus": "O",
             "o_totalprice": p, "o_orderdate": dt.date(2024, 1, 1),
             "o_orderpriority": "1-URGENT"}
            for i, p in enumerate(prices)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "orders.parquet"))
    got = orders_price_bands(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * "
            f"FROM read_parquet('{tmp_path}/orders.parquet')")
    assert _canon(got) == _canon(con.sql(PRICE_BANDS_ORACLE_SQL).df())
    n = got.set_index("band")["n_orders"]
    # bounds at 0/5000/15000/30000 plus 0.01 & 4999.99 -> budget 3,
    # 5000.01 -> mid 2, 99999 -> luxury 2
    assert n["budget"] == 3 and n["mid"] == 2
    assert n["premium"] == 1 and n["luxury"] == 2


def test_q5_local_supplier_both_paths(ray_session):
    """Full Q5 on sf0.001 through BOTH dim-attach paths (broadcast and
    forced partitioned join): identical rows, and every reported
    nation is in the target region."""
    import duckdb

    from askg_ray.ops.joins import (Q5_ORACLE_SQL, Q5_REGION,
                                    local_supplier_revenue)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation",
              "region"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf}/{t}.parquet')")
    exp = _canon(con.sql(Q5_ORACLE_SQL).df())
    for bt in (None, 0):
        got_df = local_supplier_revenue(sf, broadcast_threshold=bt
                                        ).to_pandas()
        assert _canon(got_df) == exp, f"broadcast_threshold={bt}"
    asia = set(con.sql(
        f"SELECT n_name FROM nation n JOIN region r "
        f"ON n.n_regionkey = r.r_regionkey WHERE r_name = '{Q5_REGION}'"
    ).df()["n_name"])
    assert set(got_df["n_name"]) <= asia and len(got_df) >= 1


def test_q7_pair_direction_and_both_paths(ray_session):
    """Q7's disjunction: both (A→B) and (B→A) directions appear,
    never (A→A)/(B→B); both dim-attach paths agree with the oracle."""
    import duckdb

    from askg_ray.ops.joins import (Q7_ORACLE_SQL, nation_pair_volume)

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "supplier", "nation"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf}/{t}.parquet')")
    exp = _canon(con.sql(Q7_ORACLE_SQL).df())
    for bt in (None, 0):
        got = nation_pair_volume(sf, broadcast_threshold=bt).to_pandas()
        assert _canon(got) == exp, f"broadcast_threshold={bt}"
    assert (got["supp_nation"] != got["cust_nation"]).all()


def test_q8_share_bounds_and_both_paths(ray_session):
    """Market shares stay in [0, 1e6] ppm, shares of a nation with no
    suppliers would be 0, and both dim-attach paths match the oracle."""
    import duckdb

    from askg_ray.ops.joins import Q8_ORACLE_SQL, nation_market_share

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part", "supplier"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf}/{t}.parquet')")
    exp = _canon(con.sql(Q8_ORACLE_SQL).df())
    for bt in (None, 0):
        got = nation_market_share(sf, broadcast_threshold=bt).to_pandas()
        assert _canon(got) == exp, f"broadcast_threshold={bt}"
    assert got["share_ppm"].between(0, 1_000_000).all()
    assert (got["market_u"] > 0).all()


def test_q19_band_boundaries(ray_session, tmp_path):
    """Each conjunctive band matches only its own (brand, size, qty)
    box: boundary quantities are inclusive, an in-brand part with an
    out-of-range size contributes nothing, and both attach paths agree
    with the oracle."""
    import duckdb

    from askg_ray.ops.joins import (Q19_BANDS, Q19_ORACLE_SQL,
                                    banded_part_revenue)

    parts, lis = [], []
    for i, (brand, smax, qlo, qhi) in enumerate(Q19_BANDS):
        parts.append({"p_partkey": i, "p_name": "x", "p_brand": brand,
                      "p_type": "t", "p_size": smax,      # boundary size
                      "p_retailprice": 1.0})
        # boundary quantities (in) and one just outside (out)
        for q, okflag in [(qlo, 1), (qhi, 1), (qhi + 1, 0)]:
            lis.append({"l_orderkey": len(lis), "l_partkey": i,
                        "l_suppkey": 0, "l_linenumber": 1,
                        "l_quantity": float(q), "l_extendedprice": 100.0,
                        "l_discount": 0.0, "l_tax": 0.0,
                        "l_returnflag": "N", "l_linestatus": "O",
                        "l_shipdate": dt.datetime(2024, 1, 1)})
    # in-brand part with size beyond the band's cap: never matches
    parts.append({"p_partkey": 99, "p_name": "x",
                  "p_brand": Q19_BANDS[0][0], "p_type": "t",
                  "p_size": Q19_BANDS[0][1] + 1, "p_retailprice": 1.0})
    lis.append({"l_orderkey": len(lis), "l_partkey": 99, "l_suppkey": 0,
                "l_linenumber": 1, "l_quantity": float(Q19_BANDS[0][2]),
                "l_extendedprice": 100.0, "l_discount": 0.0, "l_tax": 0.0,
                "l_returnflag": "N", "l_linestatus": "O",
                "l_shipdate": dt.datetime(2024, 1, 1)})
    pq.write_table(pa.Table.from_pylist(parts),
                   str(tmp_path / "part.parquet"))
    pq.write_table(pa.Table.from_pylist(lis),
                   str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    for t in ("part", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{tmp_path}/{t}.parquet')")
    exp = _canon(con.sql(Q19_ORACLE_SQL).df())
    for bt in (None, 0):
        got = banded_part_revenue(str(tmp_path),
                                  broadcast_threshold=bt).to_pandas()
        assert _canon(got) == exp, f"broadcast_threshold={bt}"
    n = got.set_index("p_brand")["n_items"]
    assert len(got) == 3 and (n == 2).all()   # 2 boundary hits per band


def test_q6_band_aggregate(ray_session):
    """Q6 returns exactly one row of non-negative exact-integer fields
    and hash-matches its oracle."""
    import duckdb

    from askg_ray.ops.joins import Q6_ORACLE_SQL, forecast_revenue_delta

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * "
            f"FROM read_parquet('{sf}/lineitem.parquet')")
    q6 = forecast_revenue_delta(sf).to_pandas()
    assert _canon(q6) == _canon(con.sql(Q6_ORACLE_SQL).df())
    assert len(q6) == 1 and q6["revenue_u"][0] >= 0


def test_audit_constraints_planted_violations(ray_session, tmp_path):
    """Every constraint class trips on a planted violation: an orphan
    order, an orphan lineitem (with TWO lineitems so the count is
    row-grain, not key-grain), a negative price, an empty and a NULL
    text, and an unknown event type."""
    import duckdb

    from askg_ray.ops.analyze import AUDIT_ORACLE_SQL, audit_constraints

    pq.write_table(pa.Table.from_pylist(
        [{"p_partkey": 0, "p_name": "x", "p_brand": "b", "p_type": "t",
          "p_size": 1, "p_retailprice": -5.0},
         {"p_partkey": 1, "p_name": "y", "p_brand": "b", "p_type": "t",
          "p_size": 1, "p_retailprice": 5.0}]),
        str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ok", "", None], pa.string()),
        "lang": pa.array(["en"] * 3), "source": pa.array(["s"] * 3),
        "n_chars": pa.array([2, 0, 0], pa.int64())}),
        str(tmp_path / "documents.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"event_id": 0, "ts": dt.datetime(2024, 1, 1), "user_id": 0,
          "event_type": "view", "value": 1.0, "props": ""},
         {"event_id": 1, "ts": dt.datetime(2024, 1, 1), "user_id": 0,
          "event_type": "teleport", "value": 1.0, "props": ""}]),
        str(tmp_path / "events.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"o_orderkey": 10, "o_custkey": 1, "o_orderstatus": "O",
          "o_totalprice": 1.0, "o_orderdate": dt.datetime(2024, 1, 1),
          "o_orderpriority": "1"},
         {"o_orderkey": 11, "o_custkey": 999, "o_orderstatus": "O",
          "o_totalprice": 1.0, "o_orderdate": dt.datetime(2024, 1, 1),
          "o_orderpriority": "1"}]),
        str(tmp_path / "orders.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"c_custkey": 1, "c_name": "c", "c_nationkey": 0,
          "c_acctbal": 0.0, "c_mktsegment": "BUILDING"}]),
        str(tmp_path / "customer.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [{"l_orderkey": 10, "l_partkey": 0, "l_suppkey": 0,
          "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 1.0,
          "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
          "l_linestatus": "O", "l_shipdate": dt.datetime(2024, 1, 2)},
         {"l_orderkey": 777, "l_partkey": 0, "l_suppkey": 0,
          "l_linenumber": 1, "l_quantity": 1.0, "l_extendedprice": 1.0,
          "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
          "l_linestatus": "O", "l_shipdate": dt.datetime(2024, 1, 2)},
         {"l_orderkey": 777, "l_partkey": 1, "l_suppkey": 0,
          "l_linenumber": 2, "l_quantity": 1.0, "l_extendedprice": 1.0,
          "l_discount": 0.0, "l_tax": 0.0, "l_returnflag": "N",
          "l_linestatus": "O", "l_shipdate": dt.datetime(2024, 1, 2)}]),
        str(tmp_path / "lineitem.parquet"))

    con = duckdb.connect()
    for t in ("part", "documents", "events", "orders", "customer",
              "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{tmp_path}/{t}.parquet')")
    got = audit_constraints(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(AUDIT_ORACLE_SQL).df())
    n = got.set_index("constraint")["n_violations"]
    assert n["part_negative_price"] == 1
    assert n["documents_empty_text"] == 2
    assert n["events_unknown_type"] == 1
    assert n["orders_orphan_custkey"] == 1
    assert n["lineitem_orphan_orderkey"] == 2   # row grain


def test_compact_all_three_merge_branches(ray_session):
    """UPDATE keys carry the UPD fingerprint at v2, INSERT keys exist
    above 1e6, DELETE keys (%20==4) are absent entirely, untouched
    keys stay v1 — and the compacted key set is exactly
    (base - deleted) ∪ inserted."""
    import duckdb

    from askg_ray.ops.joins import CDC_DELETE_MOD, documents_compact

    sf = "/root/testdata/sf0.001"
    got = documents_compact(sf).to_pandas()
    # forced groupby fallback emits identical rows
    gb = documents_compact(sf, exchange_max_rows=0).to_pandas()
    key = ["doc_id"]
    assert (got.sort_values(key).reset_index(drop=True).equals(
            gb.sort_values(key).reset_index(drop=True)))
    ids = duckdb.sql(f"SELECT doc_id FROM "
                     f"read_parquet('{sf}/documents.parquet')"
                     ).df()["doc_id"]
    deleted = set(ids[ids % CDC_DELETE_MOD == 4])
    inserted = {i + 1_000_000 for i in ids[ids % 25 == 0]}
    assert set(got["doc_id"]) == (set(ids) - deleted) | inserted
    assert got["doc_id"].is_unique
    old = got[got["doc_id"] < 1_000_000]
    assert ((old["version"] == 2) == (old["doc_id"] % 10 == 3)).all()
    assert not (got["fp"] == "__TOMBSTONE__").any()


def test_mad_exact_and_robust(ray_session, rfm_events):
    """MAD equals the brute per-group computation under the lower-
    median convention, is zero for a constant group, and ignores a
    planted extreme value (robustness — unlike the 2σ clip)."""
    from askg_ray.ops.stats import MAD_ORACLE_SQL, events_value_mad

    sf, con = rfm_events
    got = events_value_mad(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(MAD_ORACLE_SQL).df())
    rows = con.sql("SELECT event_type, CAST(round(value*100) AS BIGINT) c "
                   "FROM events").df()
    for et, g in rows.groupby("event_type"):
        xs = sorted(g["c"])
        med = xs[(len(xs) - 1) // 2]
        mad = sorted(abs(x - med) for x in xs)[(len(xs) - 1) // 2]
        row = got.set_index("event_type").loc[et]
        assert row["median_cents"] == med and row["mad_cents"] == mad, et
    assert got.set_index("event_type").loc["click", "mad_cents"] == 0


def test_windowed_funnel_greedy_trap(ray_session, tmp_path):
    """The case greedy matching gets wrong: user 0's EARLIEST view is
    too old for the click (greedy would bind to it and fail), but a
    later view converts — the existence semantics must reach depth 3.
    User 1's click at exactly view+24h converts (inclusive deadline);
    user 2's click at +24h+1µs does not. User 3 never views."""
    rows, eid = [], 0
    base = dt.datetime(2024, 9, 1)
    W = dt.timedelta(hours=24)

    def add(uid, kind, off):
        nonlocal eid
        rows.append({"event_id": eid, "ts": base + off, "user_id": uid,
                     "event_type": kind, "value": 1.0, "props": ""})
        eid += 1

    add(0, "view", dt.timedelta(0))                       # too old
    add(0, "view", dt.timedelta(days=5))                  # the real chain
    add(0, "click", dt.timedelta(days=5, hours=1))
    add(0, "purchase", dt.timedelta(days=5, hours=2))
    add(1, "view", dt.timedelta(0)); add(1, "click", W)   # inclusive edge
    add(2, "view", dt.timedelta(0))
    add(2, "click", W + dt.timedelta(microseconds=1))     # past deadline
    add(3, "error", dt.timedelta(0))                      # stage 0 only
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    from askg_ray.ops.funnel import (WINDOWED_FUNNEL_ORACLE_SQL,
                                     events_windowed_funnel)

    got = events_windowed_funnel(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(WINDOWED_FUNNEL_ORACLE_SQL).df())
    n = got.set_index("stage")["n_users"]
    assert n[0] == 4 and n[1] == 3 and n[2] == 2 and n[3] == 1


def test_knn_join_ties_zero_vector_small_n(ray_session, tmp_path):
    """Planted DUPLICATE vectors (exact cosine ties -> lowest neighbor
    id must win), a ZERO vector (guarded denominator; everyone's
    sim_q=0 against it, itself ties everywhere), and n-1 < k (rows must
    emit only their n-1 real neighbors, no sentinel padding) — all
    hash-compared against the window-function oracle."""
    import numpy as np

    vecs = [
        [1.0, 0.0, 0.0, 0.0],     # 0
        [1.0, 0.0, 0.0, 0.0],     # 1 duplicate of 0 (tie vs everyone)
        [0.9, 0.1, 0.0, 0.0],     # 2 near 0/1
        [0.0, 1.0, 0.0, 0.0],     # 3 orthogonal
        [0.0, 0.0, 0.0, 0.0],     # 4 zero vector
        [-1.0, 0.0, 0.0, 0.0],    # 5 antipode
    ]
    t = pa.table({"vec_id": pa.array(range(6), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0] * 6, pa.int32())})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM read_parquet('{tmp_path}/embeddings.parquet')")

    from askg_ray.ops.similarity import (KNN_JOIN_ORACLE_SQL,
                                         embedding_knn_join)

    got = embedding_knn_join(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(KNN_JOIN_ORACLE_SQL).df())
    by = got.set_index(["vec_id", "rank"]).sort_index()
    assert by.loc[(0, 1), "neighbor_id"] == 1        # the duplicate
    assert by.loc[(1, 1), "neighbor_id"] == 0
    # 5 real neighbors per row even though k=5 == n-1 exactly; force
    # the n-1 < k path too
    assert (got.groupby("vec_id").size() == 5).all()
    got3 = embedding_knn_join(str(tmp_path), k=8).to_pandas()
    assert (got3.groupby("vec_id").size() == 5).all()
    # zero vector: sim 0 against everyone; ties break by lowest id
    z = got[got["vec_id"] == 4].sort_values("rank")
    assert list(z["neighbor_id"]) == [0, 1, 2, 3, 5]
    assert (z["sim_q"] == 0).all()


def test_sssp_lighter_long_path_and_both_paths(ray_session, tmp_path):
    """Planted Bellman-Ford trap: the direct (1,2) edge has support 1
    (w=1,000,000) but 1-3-2 rides two support-4 edges (250,000 each),
    so node 2's distance must IMPROVE after first discovery — the case
    hop-BFS cannot express. Fast path, the forced distributed path
    (broadcast_max=0), and the unrolled SQL oracle must all agree."""
    rows = []
    def order(ok, parts):
        for p in parts:
            rows.append({"l_orderkey": ok, "l_partkey": p})
    order(1, [1, 2])
    for i in range(4):
        order(10 + i, [1, 3])
        order(20 + i, [2, 3])
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * "
            f"FROM read_parquet('{tmp_path}/lineitem.parquet')")

    from askg_ray.ops.graph import SSSP_ORACLE_SQL, parts_sssp

    fast = parts_sssp(str(tmp_path)).to_pandas()
    assert _canon(fast) == _canon(con.sql(SSSP_ORACLE_SQL).df())
    by = fast.set_index("l_partkey")["dist"]
    assert by[1] == 0 and by[3] == 250_000 and by[2] == 500_000
    dist = parts_sssp(str(tmp_path), broadcast_max=0).to_pandas()
    assert _canon(dist) == _canon(fast)


def test_pmi_association_beats_frequency(ray_session, tmp_path):
    """'zx qv' occurs only 6 times but its words appear NOWHERE else
    (maximal association); 'the cat' occurs 40 times amid very frequent
    unigrams. PMI must rank the rare-but-exclusive pair first, counts
    would rank it last. Double spaces (empty tokens) are dropped on
    both sides, and the forced-shuffle attach path (threshold 0) must
    match the broadcast path."""
    rows = []
    for i in range(6):
        rows.append({"doc_id": i, "text": "zx qv", "lang": "en",
                     "source": "s", "n_chars": 5})
    for i in range(40):
        rows.append({"doc_id": 100 + i,
                     "text": "the cat  the dog the bird", "lang": "en",
                     "source": "s", "n_chars": 25})
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")

    from askg_ray.ops.text import PMI_ORACLE_SQL, word_pmi_topk

    got = word_pmi_topk(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(PMI_ORACLE_SQL).df())
    first = got.sort_values(["pmi_ppm", "w1", "w2"],
                            ascending=[False, True, True]).iloc[0]
    assert (first["w1"], first["w2"]) == ("zx", "qv")
    assert first["n_xy"] == 6 and first["n_x"] == 6 and first["n_y"] == 6
    # counts would pick 'the cat'/'the dog'/'the bird' (40 each)
    assert got.loc[got["w1"] == "the", "pmi_ppm"].max() < first["pmi_ppm"]
    forced = word_pmi_topk(str(tmp_path), broadcast_threshold=0).to_pandas()
    assert _canon(forced) == _canon(got)


def test_coorder_support_both_paths(ray_session):
    """The packed-key direct-exchange support count and the forced
    two-key groupby fallback (gate 0) must emit identical (u, v, n)
    rows."""
    from askg_ray.ops.graph import _coorder_support

    sf = "/root/testdata/sf0.001"
    fast = _coorder_support(sf).to_pandas()
    slow = _coorder_support(sf, exchange_max_rows=0).to_pandas()
    assert _canon(fast) == _canon(slow) and len(fast) > 0


def test_triangle_close_both_paths(ray_session):
    """The packed-key exchange close and the forced Dataset hash-join
    close (gate 0) emit identical per-vertex triangle counts, and the
    forced-shuffle degree attach (threshold 0) matches the broadcast
    attach."""
    from askg_ray.ops.graph import parts_triangle_count

    sf = "/root/testdata/sf0.001"
    fast = parts_triangle_count(sf).to_pandas()
    slow = parts_triangle_count(sf, exchange_max_rows=0).to_pandas()
    forced_attach = parts_triangle_count(sf,
                                         broadcast_threshold=0).to_pandas()
    assert _canon(fast) == _canon(slow) == _canon(forced_attach)
    assert len(fast) > 0


def test_pagerank_int_broadcast_matches_distributed(ray_session):
    """The broadcast power-iteration loop and the forced distributed
    attach+groupby loop (gate 0) are bit-identical — integer //
    arithmetic is order-independent, so the paths must agree exactly."""
    from askg_ray.ops.graph import supplier_pagerank_int

    sf = "/root/testdata/sf0.001"
    fast = supplier_pagerank_int(sf).to_pandas()
    slow = supplier_pagerank_int(sf, broadcast_max=0).to_pandas()
    assert _canon(fast) == _canon(slow) and len(fast) > 0


def test_coorder_triples_handcrafted(ray_session, tmp_path):
    """Order {1,2,3,4} contributes all four of its C(4,3) triples,
    three repeat orders push (1,2,3) to support 4, a duplicate lineitem
    (same part twice in one order) must NOT inflate support, and
    2-item orders contribute nothing. Exchange and forced-groupby
    paths both match the three-way self-join oracle."""
    rows = []
    def order(ok, parts):
        for p in parts:
            rows.append({"l_orderkey": ok, "l_partkey": p})
    order(1, [1, 2, 3, 4])
    for i in range(3):
        order(10 + i, [1, 2, 3])
    order(20, [5, 5, 6, 7])         # dup lineitem: one (5,6,7) only
    order(30, [8, 9])               # too small
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * "
            f"FROM read_parquet('{tmp_path}/lineitem.parquet')")

    from askg_ray.ops.graph import (TRIPLES_ORACLE_SQL,
                                    parts_coorder_triples_topk)

    got = parts_coorder_triples_topk(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(TRIPLES_ORACLE_SQL).df())
    top = got.sort_values(["n", "a", "b", "c"],
                          ascending=[False, True, True, True]).iloc[0]
    assert (top["a"], top["b"], top["c"], top["n"]) == (1, 2, 3, 4)
    assert got.set_index(["a", "b", "c"]).loc[(5, 6, 7), "n"] == 1
    forced = parts_coorder_triples_topk(str(tmp_path),
                                        exchange_max_rows=0).to_pandas()
    assert _canon(forced) == _canon(got)


def test_cs_edges_packed_distinct_both_paths(ray_session):
    """The biased-packed-key exchange distinct and the forced two-key
    groupby fallback (gate 0) emit the same signed edge set."""
    from askg_ray.ops.graph import customer_supplier_edges

    sf = "/root/testdata/sf0.001"
    fast = customer_supplier_edges(sf).to_pandas()
    slow = customer_supplier_edges(sf, exchange_max_rows=0).to_pandas()
    assert _canon(fast) == _canon(slow) and len(fast) > 0
    assert (fast["u"] < 0).any() and (fast["u"] >= 0).any()  # both signs


def test_new_ops_empty_corpus(ray_session, tmp_path):
    """Every op added this session must return an EMPTY (or
    sensible-degenerate) result on schema-correct zero-row inputs
    instead of crashing — the empty-partition shape a 100 TB run hits
    constantly."""
    src = "/root/testdata/sf0.001"
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        pq.write_table(pq.read_schema(f"{src}/{name}.parquet")
                       .empty_table(), str(tmp_path / f"{name}.parquet"))
    sf = str(tmp_path)

    from askg_ray.ops.graph import (parts_coorder_triples_topk, parts_sssp)
    from askg_ray.ops.similarity import embedding_knn_join
    from askg_ray.ops.stats import events_user_simpson
    from askg_ray.ops.text import word_pmi_topk
    from askg_ray.ops.windows import sessions_max_concurrency

    assert parts_sssp(sf).count() == 0
    assert parts_coorder_triples_topk(sf).count() == 0
    assert embedding_knn_join(sf).count() == 0
    assert word_pmi_topk(sf).count() == 0
    assert events_user_simpson(sf).count() == 0
    assert sessions_max_concurrency(sf).count() == 0

    # the 14 ops the first full empty sweep (tools/check_empty.py)
    # caught crashing: ann family, sinks, hash-join Q5/7/8/9, and the
    # driver-stat guards
    from askg_ray.ops.joins import (local_supplier_revenue,
                                    nation_market_share,
                                    nation_pair_volume, nation_profit)
    from askg_ray.ops.relational import (orders_by_segment,
                                         orders_price_quantiles,
                                         parts_above_brand_avg)
    from askg_ray.ops.similarity import ann_bruteforce, ann_ivf, ann_lsh
    from askg_ray.ops.text import bm25_search
    from askg_ray.pipelines.export import (export_sorted_parquet,
                                           ivf_index_query,
                                           pruned_range_scan)

    for fn in [local_supplier_revenue, nation_pair_volume,
               nation_market_share, nation_profit, orders_by_segment,
               parts_above_brand_avg, ann_bruteforce, ann_lsh, ann_ivf,
               bm25_search]:
        assert fn(sf).count() == 0, fn.__name__
    assert orders_price_quantiles(sf).count() == 1     # all-NULL row
    assert export_sorted_parquet(sf, str(tmp_path / "se"))["n_rows"] == 0
    assert pruned_range_scan(
        sf, out_dir=str(tmp_path / "ps")).to_pylist()[0]["n_match"] == 0
    q = ivf_index_query(sf, out_dir=str(tmp_path / "iv")).to_pylist()[0]
    assert q["n_rows_total"] == 0 and q["recall_pct"] == 100

    # the FLAGSHIP: the whole KG build degrades to empty tables
    from askg_ray.pipelines.kg import build_kg
    from askg_ray.sources.docs_adapter import pages_from_documents

    out = build_kg(pages_from_documents(sf))
    assert (out["nodes"].count() == out["edges"].count()
            == out["membership"].count() == 0)


def test_mixed_sample_bias_and_paths(ray_session, tmp_path):
    """A tiny under-represented source gets the mixture's full 10x
    upsample cap while the dominant source's weight falls below par,
    so the rare source is strongly over-represented in the draw
    relative to its 1% corpus share; forced-shuffle attach matches the
    broadcast path and the oracle hash-matches."""
    rows = []
    for i in range(200):
        rows.append({"doc_id": i, "text": "a b c d e f g h",
                     "lang": "en", "source": "big", "n_chars": 15})
    for i in range(2):
        rows.append({"doc_id": 1000 + i, "text": "x y",
                     "lang": "en", "source": "tiny", "n_chars": 3})
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")

    from askg_ray.ops.curation import (MIX_CAP_PPM,
                                       MIXED_SAMPLE_ORACLE_SQL,
                                       corpus_mixed_sample)

    got = corpus_mixed_sample(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(MIXED_SAMPLE_ORACLE_SQL).df())
    by = got.drop_duplicates("source").set_index("source")["weight_ppm"]
    assert by.get("tiny", 0) == MIX_CAP_PPM       # capped upsample
    assert 0 < by["big"] < 1_000_000              # below par
    # both tiny docs make the k=50 draw despite a 1% corpus share
    assert (got["source"] == "tiny").sum() == 2
    forced = corpus_mixed_sample(str(tmp_path),
                                 broadcast_threshold=0).to_pandas()
    assert _canon(forced) == _canon(got)
