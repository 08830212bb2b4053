"""Adversarial coverage for docs_pack_sequences, doc_top_terms and
parts_above_brand_avg beyond the driver testdata: empty docs, a doc
straddling the sequence budget, doc_ids spread across scan buckets,
score ties broken by token, single-part brands and parts priced exactly
at their brand average — each hash-compared against its DuckDB oracle
on the same synthetic parquet."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _canon(df):
    df = df[sorted(df.columns)].astype(str)
    return sorted("|".join(x) for x in df.itertuples(index=False))


@pytest.fixture()
def pack_corpus(tmp_path):
    """Docs with an empty text (1 token per the split convention), a
    300-token doc straddling the 256-token sequence budget, and doc_ids
    spread across three scan buckets (BUCKET_SPAN=1000)."""
    docs = [
        {"doc_id": 0, "text": ""},                       # 1 token
        {"doc_id": 3, "text": "w " * 299 + "w"},         # 300 tokens
        {"doc_id": 500, "text": "a b c"},                # bucket 0
        {"doc_id": 1500, "text": "x y"},                 # bucket 1
        {"doc_id": 2500, "text": "solo"},                # bucket 2
        {"doc_id": 2501, "text": "p q r s"},
    ]
    pq.write_table(pa.Table.from_pylist(docs),
                   str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{tmp_path}/documents.parquet')")
    return str(tmp_path), con


def test_pack_sequences_adversarial(ray_session, pack_corpus):
    from askg_ray.ops import packing as p

    sf, con = pack_corpus
    got_df = p.docs_pack_sequences(sf).to_pandas()
    assert _canon(got_df) == _canon(con.sql(p.PACK_ORACLE_SQL).df())
    # structural: the 300-token doc starts in seq 0 at offset 1 (after
    # the empty doc's single token) and the next doc starts in seq 1
    by_id = got_df.set_index("doc_id")
    assert by_id.loc[0, "seq_id"] == 0 and by_id.loc[0, "offset_in_seq"] == 0
    assert by_id.loc[3, "offset_in_seq"] == 1
    assert by_id.loc[500, "seq_id"] == 1    # 301 // 256
    assert by_id.loc[500, "offset_in_seq"] == 301 % 256


def test_top_terms_ties_and_empty(ray_session, pack_corpus):
    from askg_ray.ops import text as t

    sf, con = pack_corpus
    got = t.doc_top_terms(sf).to_pandas()
    assert _canon(got) == _canon(con.sql(t.TOP_TERMS_ORACLE_SQL).df())
    # doc 2501: four tokens all tf=1 df=1 -> ties break token-ascending
    g = got[got["doc_id"] == 2501].sort_values("rn")
    assert list(g["token"]) == ["p", "q", "r", "s"]
    # the empty doc surfaces its '' token rather than vanishing
    assert (got[got["doc_id"] == 0]["token"] == "").all()


@pytest.fixture()
def tiny_parts(tmp_path):
    """Brands with one part (never strictly above its own average) and
    a brand whose parts tie exactly at the average."""
    parts = [
        {"p_partkey": 1, "p_brand": "A", "p_retailprice": 10.00},
        {"p_partkey": 2, "p_brand": "B", "p_retailprice": 5.00},
        {"p_partkey": 3, "p_brand": "B", "p_retailprice": 5.00},
        {"p_partkey": 4, "p_brand": "C", "p_retailprice": 1.00},
        {"p_partkey": 5, "p_brand": "C", "p_retailprice": 2.00},
        {"p_partkey": 6, "p_brand": "C", "p_retailprice": 3.00},
    ]
    pq.write_table(pa.Table.from_pylist(parts),
                   str(tmp_path / "part.parquet"))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * "
            f"FROM read_parquet('{tmp_path}/part.parquet')")
    return str(tmp_path), con


def test_above_brand_avg_boundaries(ray_session, tiny_parts):
    from askg_ray.ops import relational as r

    sf, con = tiny_parts
    got_df = r.parts_above_brand_avg(sf).to_pandas()
    assert _canon(got_df) == _canon(con.sql(r.ABOVE_AVG_ORACLE_SQL).df())
    # only the strictly-above part survives: brand A (singleton) and
    # brand B (all at the average) contribute nothing; C keeps partkey 6
    assert list(got_df["p_partkey"]) == [6]
