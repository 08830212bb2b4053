"""Adversarial coverage for ops/windows.py and ops/stats.py beyond the
driver testdata: planted duplicate (user_id, ts) pairs and tied values
for the ranking family, exact 24 h boundary rows for the range join,
bigram-less documents for the novelty scorer — each hash-compared
against its own DuckDB oracle on the same synthetic parquet."""

import datetime as dt

import duckdb
import pyarrow as pa
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
