"""Adversarial coverage for the web-text quality battery, token-aligned
prefix containment, fixed-point PageRank and CUBE: rule-boundary word
counts, an empty document, a non-token-aligned character match that a
naive substring check would miscount, mutual containment of identical
documents, and the int-vs-float PageRank agreement — each hash-compared
against its DuckDB oracle on the same synthetic parquet."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from askg_ray.ops import webqual as wq


def _canon(df):
    df = df[sorted(df.columns)].astype(str)
    return sorted("|".join(x) for x in df.itertuples(index=False))


def _docs_fixture(tmp_path, texts):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts), pa.string()),
                  "source": pa.array(["t"] * len(texts), pa.string()),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    return str(tmp_path), con


def test_gopher_rule_boundaries(ray_session, tmp_path):
    # 5-char filler keeps mean word length in the [400,520] band for
    # the boundary-count docs (28*5+3+1 = 144 chars / 30 words = 480);
    # the planted failures each break exactly ONE rule
    w29 = " ".join(["words"] * 27 + ["the", "a"])         # n_words=29 < 30
    w30 = " ".join(["words"] * 28 + ["the", "a"])         # boundary pass
    w90 = " ".join(["words"] * 88 + ["the", "a"])         # boundary pass
    w91 = " ".join(["words"] * 89 + ["the", "a"])         # > 90 fails
    symb = " ".join(["words"] * 28 + ["the", "a"]) + " ###"  # 3 '#'/31 w
    digits = " ".join(["12345"] * 28 + ["the", "a"])      # alpha fails
    onestop = " ".join(["words"] * 29 + ["the"])          # hits=1 fails
    short_mean = " ".join(["ab"] * 28 + ["the", "a"])     # mean 200 < 400
    empty = ""
    dots = "words.... words " + " ".join(["words"] * 28 + ["the", "a"])
    sf, con = _docs_fixture(tmp_path, [w29, w30, w90, w91, symb, digits,
                                       onestop, short_mean, empty, dots])
    got = wq.gopher_quality(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(wq.GOPHER_ORACLE_SQL).df())
    by_id = got.set_index("doc_id")
    assert list(by_id.loc[[0, 1, 2, 3], "keep"]) == [0, 1, 1, 0]
    assert by_id.loc[4, "symbol_permille"] == 3 * 1000 // 31
    assert by_id.loc[4, "keep"] == 1          # 96 permille < 100 passes
    assert by_id.loc[5, "alpha_permille"] == 2 * 1000 // 30  # 'the','a'
    assert list(by_id.loc[[5, 6, 7], "keep"]) == [0, 0, 0]
    assert by_id.loc[8, "n_words"] == 0 and by_id.loc[8, "keep"] == 0
    # 'words....' yields ONE non-overlapping '...' (python str.count
    # semantics == replace-diff//3 in SQL); 32 tokens in that doc
    assert by_id.loc[9, "symbol_permille"] == 1 * 1000 // 32
    assert by_id.loc[9, "keep"] == 1


def test_prefix_containment_alignment(ray_session, tmp_path):
    prefix = "alpha beta gamma delta eps zeta eta theta iota kappa lam mu"
    a = prefix + " tail tail"                        # the probed doc
    b = "lead lead " + prefix + " more words here"   # token-aligned hit
    # character-level match only: probe chars appear inside a merged
    # first token ('xalpha'), so token-aligned containment must say NO
    c = "lead xalpha beta gamma delta eps zeta eta theta iota kappa " \
        "lam mu more"
    d = "short doc under twelve tokens"              # probed = 0
    dup = prefix + " tail tail"                      # identical to a
    sf, con = _docs_fixture(tmp_path, [a, b, c, d, dup])
    got = wq.prefix_containment(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(wq.CONTAINMENT_ORACLE_SQL).df())
    by_id = got.set_index("doc_id")
    # a's prefix lives in b and in dup (2 containers); c's merged-token
    # char match is rejected by the padded check on BOTH sides
    assert by_id.loc[0, "n_containers"] == 2
    assert by_id.loc[4, "n_containers"] == 2          # dup mirrors a
    assert by_id.loc[2, "n_containers"] == 0          # c's own probe
    assert by_id.loc[3, "probed"] == 0
    assert by_id.loc[3, "n_containers"] == 0


def test_pagerank_int_matches_oracle_and_float(ray_session, tmp_path):
    # 3 customers x 4 suppliers bipartite graph with skewed degrees
    orders = pa.table({"o_orderkey": pa.array(range(6), pa.int64()),
                       "o_custkey": pa.array([0, 0, 0, 1, 1, 2],
                                             pa.int64())})
    li = pa.table({
        "l_orderkey": pa.array([0, 0, 1, 2, 3, 4, 5, 5], pa.int64()),
        "l_suppkey": pa.array([0, 1, 2, 3, 0, 1, 0, 2], pa.int64())})
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{tmp_path}/{t}.parquet')")

    from askg_ray.ops import graph as g

    got = g.supplier_pagerank_int(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(g.PAGERANK_INT_ORACLE_SQL).df())
    # fixed-point result tracks the float power iteration to ~1e-9
    flo = (g.supplier_pagerank(str(tmp_path)).to_pandas()
           .set_index("node")["rank"])
    for node, fp in zip(got["node"], got["rank_fp"]):
        assert abs(fp / g.PR_SCALE - flo[node]) < 1e-6
    # 7 nodes (3 customers + 4 suppliers), probability mass ~1
    assert len(got) == 7
    assert abs(got["rank_fp"].sum() / g.PR_SCALE - 1.0) < 1e-3


def test_events_cube_levels(ray_session, tmp_path):
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 5, 1)
    for i in range(8):
        rows.append({"event_id": i, "ts": base + dt.timedelta(
            days=i % 2, hours=i), "user_id": i % 3,
            "event_type": "click" if i % 2 else "view",
            "value": 1.0, "props": ""})
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    from askg_ray.ops import relational as r

    got = r.events_cube(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(r.CUBE_ORACLE_SQL).df())
    # all four grouping levels present
    both = got[got["event_type"].isna() & got["day"].isna()]
    assert len(both) == 1 and both["n"].iloc[0] == 8
    assert got["event_type"].isna().sum() > 1     # (·, day) marginal
    assert got["day"].isna().sum() > 1            # (type, ·) marginal


def test_cms_one_sided_and_threshold(ray_session, tmp_path):
    import duckdb
    import pyarrow.parquet as pq

    from askg_ray.ops import stats as s

    # 'heavy' appears 600x (>= threshold 500); 'light' 499x (just
    # under — must NOT appear unless a collision inflates it, in which
    # case the oracle inflates identically); filler tokens add noise
    texts = (["heavy " * 60] * 10 + ["light " * 499]
             + [f"tok{i} tok{i} filler" for i in range(50)])
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array([x.strip() for x in texts], pa.string()),
                  "lang": ["en"] * len(texts),
                  "source": ["t"] * len(texts),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")

    got = s.token_cms_topk(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(s.CMS_ORACLE_SQL).df())
    by_tok = got.set_index("token")["est_count"]
    # one-sided error: the estimate never undercounts
    assert by_tok["heavy"] >= 600
    # every reported token's TRUE count is <= its estimate
    true = con.sql(
        "SELECT unnest(list_filter(string_split(text,' '), x -> x <> ''))"
        " AS tok FROM documents").df()["tok"].value_counts()
    for tok, est in by_tok.items():
        assert true.get(tok, 0) <= est


def test_new_ops_degenerate_empty_inputs(ray_session, tmp_path):
    """Zero-row input files must produce well-formed (mostly empty)
    results for every op added in this batch."""
    import pyarrow.parquet as pq

    from askg_ray.ops import graph as g
    from askg_ray.ops import relational as r
    from askg_ray.ops import stats as s

    SF = "/root/testdata/sf0.001"
    empty = tmp_path / "empty"
    empty.mkdir()
    for t in ["documents", "orders", "lineitem", "events"]:
        pq.write_table(pq.read_table(f"{SF}/{t}.parquet").slice(0, 0),
                       str(empty / f"{t}.parquet"))
    e = str(empty)
    assert wq.gopher_quality(e).count() == 0
    assert wq.prefix_containment(e).count() == 0
    assert g.supplier_pagerank_int(e).count() == 0
    assert s.token_cms_topk(e).count() == 0
    rows = [x for b in r.events_cube(e).iter_batches(
        batch_format="pyarrow") for x in b.to_pylist()]
    assert rows == [{"event_type": None, "day": None, "n": 0}]


def test_props_stats_malformed_and_null_max(ray_session, tmp_path):
    """Malformed JSON, a missing field, and a type with ZERO valid k
    (null max on both sides) must all hash-match the regex oracle."""
    import datetime as dt

    import duckdb
    import pyarrow.parquet as pq

    from askg_ray.ops import stats as s

    base = dt.datetime(2024, 6, 1)
    rows = [
        {"event_id": 0, "event_type": "ok", "props": '{"k": 7}'},
        {"event_id": 1, "event_type": "ok", "props": '{"k":42}'},
        {"event_id": 2, "event_type": "ok", "props": "not json at all"},
        {"event_id": 3, "event_type": "nok", "props": "{}"},
        {"event_id": 4, "event_type": "nok", "props": '{"j": 9}'},
        {"event_id": 5, "event_type": "ws", "props": '{"k":   13}'},
    ]
    for r_ in rows:
        r_.update(ts=base, user_id=0, value=1.0)
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    got = s.events_props_stats(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(s.PROPS_ORACLE_SQL).df())
    by = got.set_index("event_type")
    assert (by.loc["ok", "n"], by.loc["ok", "n_k"],
            by.loc["ok", "sum_k"], by.loc["ok", "max_k"]) == (3, 2, 49, 42)
    assert by.loc["nok", "n_k"] == 0 and by.loc["nok", "sum_k"] == 0
    assert by.loc["nok", "max_k"] == -1        # sentinel, not NULL
    assert by.loc["ws", "max_k"] == 13


def test_kmeans_empty_cluster_drop_and_grouping(ray_session, tmp_path):
    """Three true clusters, k=8 seeds with duplicates: tie-to-lowest
    empties the duplicate seed clusters, which must drop out on BOTH
    sides; the final partition must match the planted A/B/C groups."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from askg_ray.ops import similarity as sim

    # seeds (vec 0..7) are EXACT center duplicates, so the argmin tie
    # rule funnels everything to clusters 0/1/2 and empties 3..7;
    # non-seed rows carry a tiny deterministic jitter (no RNG)
    centers = {0: 0.3, 1: -0.3, 2: 0.0}
    vecs, ids = [], []
    for i in range(12):
        c = i % 3
        v = np.full(64, centers[c]) + (1e-3 if i >= 8 else 0.0)
        vecs.append(v.astype(np.float32))
        ids.append(i)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in ids], pa.int32())})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM read_parquet('{tmp_path}/embeddings.parquet')")

    got = sim.embedding_kmeans(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(sim.KMEANS_ORACLE_SQL).df())
    by = got.set_index("vec_id")["cluster"]
    # the planted partition survives: same-center vecs share a cluster,
    # different-center vecs never do
    for i in range(12):
        for j in range(12):
            same = by[i] == by[j]
            assert same == (i % 3 == j % 3)
    assert got["cluster"].nunique() == 3        # duplicates dropped


def test_bottomk_merge_equals_global_and_zorder_locality(ray_session,
                                                         tmp_path):
    """bottom-k across many blocks == the global k smallest priorities;
    z-order interleave verified bit-by-bit against a Python reference
    and for the locality property (same user, adjacent minutes →
    adjacent z region)."""
    import datetime as dt
    import hashlib as hl

    import duckdb
    import pyarrow.parquet as pq

    from askg_ray.ops import curation as cu
    from askg_ray.ops import relational as r

    texts = [f"doc {i}" for i in range(200)]
    t = pa.table({"doc_id": pa.array(range(200), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": ["en"] * 200, "source": ["t"] * 200,
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    got = cu.docs_bottomk_sample(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(cu.BOTTOMK_ORACLE_SQL).df())
    exp = sorted(range(200),
                 key=lambda d: hl.md5(str(d).encode()).hexdigest())[:25]
    assert sorted(got["doc_id"]) == sorted(exp)

    base = dt.datetime(2024, 7, 1)
    rows = [{"event_id": i, "ts": base + dt.timedelta(minutes=i % 7),
             "user_id": i % 5, "event_type": "x", "value": 0.0,
             "props": ""} for i in range(50)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")
    gz = r.events_zorder(str(tmp_path)).to_pandas()
    assert _canon(gz) == _canon(con.sql(r.ZORDER_ORACLE_SQL).df())

    def z_ref(u, m):
        z = 0
        for i in range(16):
            z |= ((u >> i) & 1) << (2 * i)
            z |= ((m >> i) & 1) << (2 * i + 1)
        return z

    by = gz.set_index("event_id")["z"]
    for row in rows[:10]:
        m = (int(row["ts"].timestamp()) // 60) & 0xFFFF
        assert by[row["event_id"]] == z_ref(row["user_id"] & 0xFFFF, m)
    # locality: flipping ONLY the low user bit moves z by exactly 1
    assert abs(z_ref(4, 100) - z_ref(5, 100)) == 1


def test_randomized_webqual_parity(ray_session, tmp_path):
    """Seeded adversarial sweep for the round-3 batch: multi-space
    runs, unicode tokens, '#'/'...' runs, shared 12-token prefixes (so
    containment actually fires), empty and 1-token docs — every op
    hash-compared to its oracle on the same corpus."""
    import numpy as np

    from askg_ray.ops import curation as cu
    from askg_ray.ops import stats as s

    rng = np.random.RandomState(23)
    vocab = ["the", "a", "tablé", "join", "row", "x#y", "dots...",
             "1234", "ab", "zzzzz"]
    shared = " ".join(vocab[(i * 3) % 10] for i in range(12))
    texts = []
    for i in range(80):
        k = int(rng.randint(0, 25))
        words = [vocab[rng.randint(10)] for _ in range(k)]
        sep = "  " if rng.randint(3) == 0 else " "   # double-space runs
        body = sep.join(words)
        if rng.randint(4) == 0:                      # plant the prefix
            body = shared + " " + body
        texts.append(body)
    texts += ["", " ", shared]                       # degenerates
    sf, con = _docs_fixture(tmp_path, texts)
    for fn, sql in [(wq.gopher_quality, wq.GOPHER_ORACLE_SQL),
                    (wq.prefix_containment, wq.CONTAINMENT_ORACLE_SQL),
                    (s.token_cms_topk, s.CMS_ORACLE_SQL),
                    (cu.docs_bottomk_sample, cu.BOTTOMK_ORACLE_SQL)]:
        assert _canon(fn(sf).to_pandas()) == _canon(con.sql(sql).df()), \
            fn.__name__
    # the planted prefix must have produced at least one containment
    got = wq.prefix_containment(sf).to_pandas()
    assert got["contained"].sum() > 0


def test_randomized_graph_event_parity(ray_session, tmp_path):
    """Seeded random bipartite graph (skewed degrees, parallel order
    lines) for fixed-point PageRank, and collision-heavy events with a
    valid/garbage props mix for CUBE / props-stats / z-order."""
    import datetime as dt

    import numpy as np

    from askg_ray.ops import graph as g
    from askg_ray.ops import relational as r
    from askg_ray.ops import stats as s

    rng = np.random.RandomState(31)
    orders = pa.table({
        "o_orderkey": pa.array(range(40), pa.int64()),
        "o_custkey": pa.array(rng.zipf(1.7, 40) % 9, pa.int64())})
    li = pa.table({
        "l_orderkey": pa.array(rng.randint(0, 40, 120), pa.int64()),
        "l_suppkey": pa.array(rng.zipf(1.5, 120) % 13, pa.int64())})
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))

    base = dt.datetime(2024, 2, 1)
    props_pool = ['{"k": %d}', '{"k":%d}', 'bad %d json', '{"j": %d}']
    rows = [{
        "event_id": i,
        "ts": base + dt.timedelta(days=int(rng.randint(4)),
                                  minutes=int(rng.randint(90))),
        "user_id": int(rng.randint(70000)),     # exercises the & 0xFFFF
        "event_type": ["v", "c", "p"][rng.randint(3)],
        "value": 1.0,
        "props": props_pool[rng.randint(4)] % int(rng.randint(1000)),
    } for i in range(300)]
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events"):
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{tmp_path}/{t}.parquet')")

    for fn, sql in [(g.supplier_pagerank_int, g.PAGERANK_INT_ORACLE_SQL),
                    (r.events_cube, r.CUBE_ORACLE_SQL),
                    (s.events_props_stats, s.PROPS_ORACLE_SQL),
                    (r.events_zorder, r.ZORDER_ORACLE_SQL)]:
        assert _canon(fn(str(tmp_path)).to_pandas()) == \
            _canon(con.sql(sql).df()), fn.__name__


def test_moving_avg_rows_frame(ray_session, tmp_path):
    """ROWS-frame semantics vs RANGE: duplicate timestamps must still
    count as separate rows (event_id tie-break), warm-up frames are
    short, and the integer c100 floor matches the oracle."""
    import datetime as dt

    import duckdb

    from askg_ray.ops import windows as w

    base = dt.datetime(2024, 8, 1)
    rows = [
        # user 0: 5 events, two sharing a timestamp
        {"event_id": 0, "ts": base, "user_id": 0, "value": 1.0},
        {"event_id": 1, "ts": base, "user_id": 0, "value": 2.0},
        {"event_id": 2, "ts": base + dt.timedelta(minutes=1),
         "user_id": 0, "value": 4.0},
        {"event_id": 3, "ts": base + dt.timedelta(minutes=2),
         "user_id": 0, "value": 8.0},
        {"event_id": 4, "ts": base + dt.timedelta(minutes=3),
         "user_id": 0, "value": 0.01},          # fractional cents path
        # user 1: single event
        {"event_id": 5, "ts": base, "user_id": 1, "value": 5.0},
    ]
    for r_ in rows:
        r_.update(event_type="x", props="")
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "events.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * "
            f"FROM read_parquet('{tmp_path}/events.parquet')")

    got = w.events_moving_avg(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(w.MAVG_ORACLE_SQL).df())
    by = got.set_index("event_id")
    # warm-up: frames of 1 then 2 rows (the duplicate ts is a SECOND
    # row — RANGE semantics would merge it)
    assert (by.loc[0, "frame_len"], by.loc[1, "frame_len"]) == (1, 2)
    assert by.loc[1, "mavg_c100"] == (100 + 200) * 100 // 2
    # full 3-row frame over (2,4,8): floor((1400*100)/3)
    assert by.loc[3, "mavg_c100"] == 1400 * 100 // 3
    assert by.loc[5, "frame_len"] == 1


def test_gopher_null_text_row(ray_session, tmp_path):
    """A NULL text row must behave as an empty doc on both sides."""
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["the a words", None], pa.string()),
                  "lang": ["en", "en"], "source": ["t", "t"],
                  "n_chars": pa.array([11, 0], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    got = wq.gopher_quality(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(wq.GOPHER_ORACLE_SQL).df())
    assert got.set_index("doc_id").loc[1, "n_words"] == 0


def test_containment_groupby_fallback_path(ray_session, tmp_path):
    """Force the above-gate groupby path (exchange_max_rows=0) and
    check it produces exactly the direct-exchange result."""
    prefix = "alpha beta gamma delta eps zeta eta theta iota kappa lam mu"
    texts = [prefix + " tail", "pad pad " + prefix + " x",
             "unrelated words here only four", prefix + " tail"]
    sf, con = _docs_fixture(tmp_path, texts)
    fast = wq.prefix_containment(sf).to_pandas()
    slow = wq.prefix_containment(sf, exchange_max_rows=0).to_pandas()
    assert _canon(fast) == _canon(slow)
    assert _canon(fast) == _canon(con.sql(wq.CONTAINMENT_ORACLE_SQL).df())
    assert fast.set_index("doc_id").loc[0, "n_containers"] == 2


def test_docs_encode_vocab_rank_and_oov(ray_session, tmp_path):
    """Vocab rank is (freq DESC, token ASC); everything past the vocab
    cut encodes as OOV -1; empty docs emit an empty id string."""
    import duckdb

    from askg_ray.ops import text as tx

    # 'zz' and 'aa' tie on frequency -> 'aa' outranks by token text
    texts = ["aa zz aa zz rare1", "aa zz", ""]
    sf, con = _docs_fixture(tmp_path, texts)
    got = tx.docs_encode(sf, vocab_size=2).to_pandas()
    # re-render the oracle for the small vocab
    sql = tx.ENCODE_ORACLE_SQL.replace(
        f"LIMIT {tx.ENCODE_VOCAB_SIZE}", "LIMIT 2")
    assert _canon(got) == _canon(con.sql(sql).df())
    by = got.set_index("doc_id")
    assert by.loc[0, "ids_csv"] == "0,1,0,1,-1"   # aa=0, zz=1, rare1 OOV
    assert by.loc[0, "n_oov"] == 1
    assert by.loc[2, "ids_csv"] == "" and by.loc[2, "n_tokens"] == 0


def test_snapshot_diff_statuses(ray_session, tmp_path):
    """doc_ids chosen to hit every branch, including the %77 overlap
    (mutate AND drop → drop wins on both sides) and the shifted-id
    added rows."""
    import duckdb

    from askg_ray.ops import joins as j

    ids = [1, 7, 11, 13, 77, 91]   # same, changed, removed, add-src,
                                   # drop-beats-mutate, changed+add-src
    t = pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array([f"text {i}" for i in ids], pa.string()),
                  "lang": ["en"] * len(ids), "source": ["t"] * len(ids),
                  "n_chars": pa.array([6] * len(ids), pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    got = j.documents_snapshot_diff(str(tmp_path)).to_pandas()
    assert _canon(got) == _canon(con.sql(j.SNAPSHOT_DIFF_ORACLE_SQL).df())
    by = got.set_index("doc_id")["status"]
    assert by[1] == "same"
    assert by[7] == "changed"
    assert by[11] == "removed"
    assert by[13] == "same" and by[1000013] == "added"
    assert by[77] == "removed"          # drop beats mutate
    assert by[91] == "changed" and by[1000091] == "added"
