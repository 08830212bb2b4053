"""Training-sequence packing: assign every document a position in the
concatenated token stream (docs in ``doc_id`` order) and derive the
fixed-budget training sequence it starts in — the "concat then chop
every N tokens" layout LLM data loaders use.

The core primitive is a **distributed global prefix scan**: an ordered
running total over the whole corpus, which no single groupby can
express. Shape (two thin shuffles + O(#buckets) driver state):

  1. map_batches shrinks each doc to a thin ``(bucket, doc_id,
     n_tokens)`` row, where ``bucket = doc_id // BUCKET_SPAN`` — a
     RANGE partition by key, not by block layout, so the result is
     deterministic on any cluster size.
  2. groupby(bucket).sum gives per-bucket token totals — #buckets =
     n_docs / BUCKET_SPAN rows, the only thing the driver ever holds.
     The driver prefix-sums that small table and broadcasts the
     bucket→offset map with ``ray.put`` (at 10^12 docs, pick
     BUCKET_SPAN so #buckets stays ~10^6, or nest the same trick one
     level deeper: scan the bucket table itself).
  3. a second groupby(bucket) sorts each bucket by doc_id, local-
     cumsums, and adds the broadcast offset: every doc now knows its
     exact global token start without any global sort or barrier
     beyond the two keyed exchanges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

BUCKET_SPAN = 1_000          # docs per scan bucket (drives driver state size)
SEQ_BUDGET = 256             # tokens per packed training sequence


def docs_pack_sequences(sf_dir: str, budget: int = SEQ_BUDGET):
    """Per doc: its whitespace token count, the global token offset of
    its first token (docs concatenated in doc_id order), the training
    sequence that token lands in (``seq_id = start // budget``) and the
    offset inside that sequence. Token counting mirrors the oracle's
    ``len(string_split(text, ' '))`` exactly (empty text = 1 token).
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    thin_schema = pa.schema([("bucket", pa.int64()),
                             ("doc_id", pa.int64()),
                             ("n_tokens", pa.int64())])

    def thin(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        # list_value_length(split_pattern) == len(str.split(' ')) for
        # every string including '' (one empty element)
        ntok = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).cast(pa.int64())
        return pa.table({"bucket": pa.array(did // BUCKET_SPAN),
                         "doc_id": t["doc_id"].cast(pa.int64()),
                         "n_tokens": ntok}, schema=thin_schema)

    thin_ds = docs.map_batches(thin, batch_format="pyarrow").materialize()
    return _pack_thin(thin_ds, budget)


PACK_SCHEMA = pa.schema([("doc_id", pa.int64()),
                         ("n_tokens", pa.int64()),
                         ("seq_id", pa.int64()),
                         ("offset_in_seq", pa.int64())])


def _pack_thin(thin_ds, budget: int):
    """Steps 2-3 of the scan over a MATERIALIZED thin (bucket, doc_id,
    n_tokens) dataset — shared by the raw-corpus and the prep-composite
    packers."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    totals = (thin_ds.select_columns(["bucket", "n_tokens"])
              .groupby("bucket").aggregate(Sum("n_tokens", alias_name="s"))
              .to_pandas())
    if len(totals) == 0:
        return rd.from_arrow(PACK_SCHEMA.empty_table())
    totals = totals.sort_values("bucket")
    offs = np.concatenate([[0], np.cumsum(totals["s"].to_numpy())[:-1]])
    offsets_ref = ray.put(dict(zip(totals["bucket"].astype(int), offs)))

    def scan_bucket(g: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        g = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        ntok = g["n_tokens"].to_numpy(zero_copy_only=False)
        start = (np.cumsum(ntok) - ntok
                 + int(offsets[int(g["bucket"][0].as_py())]))
        return pa.table({
            "doc_id": g["doc_id"],
            "n_tokens": g["n_tokens"],
            "seq_id": pa.array(start // budget, pa.int64()),
            "offset_in_seq": pa.array(start % budget, pa.int64()),
        }, schema=PACK_SCHEMA)

    return (thin_ds.groupby("bucket")
            .map_groups(scan_bucket, batch_format="pyarrow"))


def corpus_pack(sf_dir: str, budget: int = SEQ_BUDGET):
    """The prep→pack composite: run the full training-corpus prep
    (exact-dedup reps, eval slice + contamination dropped, quality
    filter, content-hash split — ``ops/curation.corpus_kept``), keep
    the TRAIN split, and assign every surviving doc its packed-sequence
    position in doc_id order. This is the end-to-end layout step a
    data loader consumes; the oracle composes the prep CTEs with the
    window cumsum, so the hash check covers the whole chain.

    Scale shape: corpus_kept's joins + one filter feed the same
    two-shuffle prefix scan as ``docs_pack_sequences`` — token counts
    ride the kept rows (computed once in the prep pass), so no second
    read of the documents table.
    """
    from .curation import corpus_kept

    kept = corpus_kept(sf_dir)

    thin_schema = pa.schema([("bucket", pa.int64()),
                             ("doc_id", pa.int64()),
                             ("n_tokens", pa.int64())])

    def thin(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["split"], "train"))
        return pa.table({
            "bucket": pa.array(t["doc_id"].to_numpy(zero_copy_only=False)
                               // BUCKET_SPAN),
            "doc_id": t["doc_id"],
            "n_tokens": t["n_tokens"],
        }, schema=thin_schema)

    return _pack_thin(
        kept.map_batches(thin, batch_format="pyarrow").materialize(),
        budget)


def _corpus_pack_oracle_sql() -> str:
    from .curation import (DECON_N, EVAL_MOD, SPLIT_MOD, SPLIT_TRAIN,
                           SPLIT_VAL)
    from .text import STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
toks AS (SELECT doc_id, string_split(text,' ') ws FROM documents),
grams AS (SELECT DISTINCT doc_id,
                 array_to_string(list_slice(ws,i,i+{DECON_N - 1}),' ') g
          FROM toks, LATERAL (SELECT unnest(
               range(1, greatest(len(ws)-{DECON_N - 1},0)+1)) i)),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0),
cont AS (SELECT DISTINCT g.doc_id FROM grams g JOIN ev USING (g)
         WHERE g.doc_id % {EVAL_MOD} <> 0),
q AS (SELECT doc_id FROM (
      SELECT doc_id, string_split(text,' ') ws FROM documents)
      WHERE len(ws) >= 50
        AND (len(list_filter(ws, x -> x IN ({stoplist}))) * 100) // len(ws)
            BETWEEN 5 AND 60),
s AS (SELECT doc_id,
      CASE WHEN md5_number_upper(coalesce(text,'')) % {SPLIT_MOD}
                < {SPLIT_TRAIN} THEN 'train'
           WHEN md5_number_upper(coalesce(text,'')) % {SPLIT_MOD}
                < {SPLIT_VAL} THEN 'val' ELSE 'test' END AS split,
      CAST(len(string_split(coalesce(text,''),' ')) AS BIGINT) AS n_tokens
      FROM documents),
kept AS (SELECT s.doc_id, s.n_tokens
         FROM reps JOIN q USING (doc_id) JOIN s USING (doc_id)
         WHERE reps.doc_id % {EVAL_MOD} <> 0
           AND reps.doc_id NOT IN (SELECT doc_id FROM cont)
           AND s.split = 'train'),
c AS (SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum
      FROM kept)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {SEQ_BUDGET} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {SEQ_BUDGET} AS BIGINT) AS offset_in_seq
FROM c
""".strip()


CORPUS_PACK_ORACLE_SQL = _corpus_pack_oracle_sql()


def doc_shuffle_index(sf_dir: str):
    """Deterministic global training shuffle: every doc gets a dense
    rank 0..n-1 in md5(doc_id) order — the content-addressed stand-in
    for `ORDER BY random()` that reproduces bit-identically on any
    cluster size, block layout, or resumed run (the property a
    restartable data loader needs; seeded RNG over blocks does not
    survive a re-partition).

    Same distributed prefix scan as the packer, with the bucket taken
    from the top byte of the hash instead of a doc_id range: hex md5
    ordering is lexicographic and the first two hex chars order
    exactly like their integer value, so ranks assigned inside bucket
    b, offset by the count of all docs hashing below b, form the
    global permutation with no global sort. Driver state is the
    256-row bucket histogram at ANY corpus size.
    """
    import hashlib

    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    thin_schema = pa.schema([("bucket", pa.int64()),
                             ("key", pa.string()),
                             ("doc_id", pa.int64())])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("shuffle_rank", pa.int64())])

    def thin(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        keys = [hashlib.md5(str(int(d)).encode()).hexdigest() for d in ids]
        return pa.table({
            "bucket": pa.array([int(k[:2], 16) for k in keys], pa.int64()),
            "key": pa.array(keys, pa.string()),
            "doc_id": pa.array(ids, pa.int64()),
        }, schema=thin_schema)

    thin_ds = docs.map_batches(thin, batch_format="pyarrow").materialize()
    totals = (thin_ds.select_columns(["bucket"])
              .groupby("bucket").aggregate(Count(alias_name="n"))
              .to_pandas())
    if len(totals) == 0:
        return rd.from_arrow(out_schema.empty_table())
    totals = totals.sort_values("bucket")
    offs = np.concatenate([[0], np.cumsum(totals["n"].to_numpy())[:-1]])
    offsets_ref = ray.put(dict(zip(totals["bucket"].astype(int), offs)))

    def rank_bucket(g: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        # doc_id tie-break mirrors the oracle's ORDER BY (md5 collisions
        # cannot occur over int64 ids, but the rule is pinned anyway)
        g = g.take(pc.sort_indices(g, sort_keys=[("key", "ascending"),
                                                 ("doc_id", "ascending")]))
        base = int(offsets[int(g["bucket"][0].as_py())])
        return pa.table({
            "doc_id": g["doc_id"],
            "shuffle_rank": pa.array(base + np.arange(g.num_rows),
                                     pa.int64()),
        }, schema=out_schema)

    return (thin_ds.groupby("bucket")
            .map_groups(rank_bucket, batch_format="pyarrow"))


SHUFFLE_INDEX_ORACLE_SQL = """
SELECT doc_id,
       CAST(row_number() OVER (
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1
            AS BIGINT) AS shuffle_rank
FROM documents
""".strip()


PACK_ORACLE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum
  FROM t)
SELECT doc_id, n_tokens,
       CAST((cum - n_tokens) // {SEQ_BUDGET} AS BIGINT) AS seq_id,
       CAST((cum - n_tokens) % {SEQ_BUDGET} AS BIGINT) AS offset_in_seq
FROM c
""".strip()


N_CURRICULUM_BUCKETS = 10


def docs_curriculum_decile(sf_dir: str, nb: int = N_CURRICULUM_BUCKETS):
    """Curriculum bucketing: every doc gets its corpus-wide token-length
    decile (1..nb, shortest first) — the length-ordered schedule a
    curriculum loader consumes. Third use of the distributed prefix
    scan, this time RANGE-partitioned by the value itself: token counts
    are low-cardinality, so groupby(n_tokens) counts → driver prefix
    sums over the distinct-length histogram (the only driver state;
    bounded by max doc length, not corpus size) → per-length groups
    rank locally by doc_id. decile = 1 + rank·nb // N exactly, ties
    split by doc_id on both oracle sides — no global sort."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("decile", pa.int64())])

    def thin(t: pa.Table) -> pa.Table:
        ntok = pc.list_value_length(
            pc.split_pattern(pc.fill_null(t["text"], ""), " ")
        ).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "n_tokens": ntok})

    thin_ds = docs.map_batches(thin, batch_format="pyarrow").materialize()
    hist = (thin_ds.select_columns(["n_tokens"])
            .groupby("n_tokens").aggregate(Count(alias_name="c"))
            .to_pandas())
    if len(hist) == 0:
        return rd.from_arrow(out_schema.empty_table())
    hist = hist.sort_values("n_tokens")
    total = int(hist["c"].sum())
    offs = np.concatenate([[0], np.cumsum(hist["c"].to_numpy())[:-1]])
    offsets_ref = ray.put(dict(zip(hist["n_tokens"].astype(int), offs)))

    def rank_group(g: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        g = g.take(pc.sort_indices(g, sort_keys=[("doc_id", "ascending")]))
        base = int(offsets[int(g["n_tokens"][0].as_py())])
        rk = base + np.arange(g.num_rows)
        return pa.table({
            "doc_id": g["doc_id"],
            "n_tokens": g["n_tokens"],
            "decile": pa.array(1 + (rk * nb) // total, pa.int64()),
        }, schema=out_schema)

    return (thin_ds.groupby("n_tokens")
            .map_groups(rank_group, batch_format="pyarrow"))


CURRICULUM_ORACLE_SQL = f"""
WITH t AS (SELECT doc_id,
                  CAST(len(string_split(coalesce(text, ''), ' '))
                       AS BIGINT) AS n_tokens
           FROM documents),
r AS (SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens, doc_id) - 1 AS rk
      FROM t),
c AS (SELECT count(*) AS n FROM t)
SELECT doc_id, n_tokens,
       CAST(1 + (rk * {N_CURRICULUM_BUCKETS}) // n AS BIGINT) AS decile
FROM r, c
""".strip()
