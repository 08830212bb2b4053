"""Text-analysis operators over the ``documents`` table.

Large-scale training-data-pipeline staples: token counting, stopword /
quality metrics, document fingerprinting, heuristic language ID. All
are stateless (or broadcast-dictionary) map_batches stages; outputs use
integer / string columns so the DuckDB oracles hash-match exactly.

Tokenization contract (frozen, mirrored in the SQL oracles): split on
single spaces — ``text.split(' ')`` == DuckDB ``string_split(text, ' ')``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# 20-word stoplist in the spirit of the reference's query-side stoplist
# (/root/reference/src/text2cypher.py:214-220); frozen for oracle parity.
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "for",
             "on", "with", "at", "by", "as", "it", "this", "that", "be", "are"]


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_chars, n_tokens, n_stopwords, n_distinct_tokens."""
    stop = set(STOPWORDS)
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    n_chars, n_tokens, n_stop, n_distinct = [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split(" ")
        n_chars.append(len(t))
        n_tokens.append(len(toks))
        n_stop.append(sum(1 for w in toks if w in stop))
        n_distinct.append(len(set(toks)))
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_stopwords": pa.array(n_stop, pa.int64()),
        "n_distinct_tokens": pa.array(n_distinct, pa.int64()),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """doc_id, fp = md5(text), crc = crc32(text) — exact-dup keys.

    md5 matches DuckDB ``md5(text)``; crc32 is the cheap rolling-hash
    stand-in used by the minhash shingling too."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    crcs = [zlib.crc32((t or "").encode()) for t in texts]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "fp": pa.array(fps, pa.string()),
        "crc": pa.array(crcs, pa.int64()),
    })


# character-bigram profiles for a tiny deterministic language-ID heuristic;
# scores are integer bigram-hit counts so output is exactly reproducible.
_LANG_BIGRAMS = {
    "en": ["th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"],
    "de": ["en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "un"],
    "fr": ["es", "le", "de", "en", "re", "nt", "on", "ou", "ai", "it"],
    "es": ["de", "es", "en", "el", "la", "os", "ar", "ue", "ra", "as"],
    "zh": ["zh", "sh", "ng", "ia", "uo", "ji", "xi", "qi", "ao", "ei"],
}


class LangId:
    """Actor-pool language-ID stage: bigram tables built once per actor
    (the model-load-in-__init__ pattern; here the 'model' is tiny)."""

    def __init__(self):
        self.tables = {lang: set(bs) for lang, bs in _LANG_BIGRAMS.items()}
        self.langs = sorted(self.tables)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        preds, scores = [], []
        for t in texts:
            t = (t or "").lower()
            grams = [t[i:i + 2] for i in range(0, max(0, len(t) - 1))]
            best_lang, best = "en", -1
            for lang in self.langs:
                table = self.tables[lang]
                s = sum(1 for g in grams if g in table)
                if s > best:
                    best, best_lang = s, lang
            preds.append(best_lang)
            scores.append(best)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lang_pred": pa.array(preds, pa.string()),
            "bigram_hits": pa.array(scores, pa.int64()),
        })


def quality_batch(batch: pa.Table) -> pa.Table:
    """Quality-scoring signals (training-data staple): punctuation /
    uppercase counts, stopword ratio, and a bucketed verdict. Integer
    and string outputs only, so the DuckDB oracle hash-matches."""
    import re

    punct_re = re.compile(r"[.,!?;:]")
    upper_re = re.compile(r"[A-Z]")
    stop = set(STOPWORDS)
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    n_punct, n_upper, ratio, verdict = [], [], [], []
    for t in texts:
        t = t or ""
        toks = t.split(" ")
        np_ = len(punct_re.findall(t))
        nu = len(upper_re.findall(t))
        ns = sum(1 for w in toks if w in stop)
        rp = (ns * 100) // len(toks) if toks else 0
        n_punct.append(np_)
        n_upper.append(nu)
        ratio.append(rp)
        verdict.append("good" if len(toks) >= 50 and 5 <= rp <= 60 else "low")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_punct": pa.array(n_punct, pa.int64()),
        "n_upper": pa.array(n_upper, pa.int64()),
        "stop_ratio_pct": pa.array(ratio, pa.int64()),
        "quality": pa.array(verdict, pa.string()),
    })


def token_stats(sf_dir: str):
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(token_stats_batch, batch_format="pyarrow")


def fingerprints(sf_dir: str):
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow")


def quality(sf_dir: str):
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(quality_batch, batch_format="pyarrow")


def langid(sf_dir: str):
    import ray.data as rd
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(LangId, batch_format="pyarrow", concurrency=2,
                            batch_size=1024)


BM25_QUERY = ("spark", "shuffle", "join")
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(sf_dir: str, k: int = 20):
    """BM25 keyword ranking over ``documents`` for a fixed query.

    Scale shape: per-doc term frequencies for the (tiny, broadcast)
    query vocabulary are computed in one stateless map — no shuffle
    grows with the corpus; document frequencies and the corpus length
    stats are partial-aggregated to a handful of scalars (bounded by
    the query size, driver-safe); scoring is a second stateless map
    with the df table broadcast; only the final top-k pays a sort of
    the MATCHING docs. Scores are emitted as integer micro-units
    (round(score·1e6)) so the DuckDB oracle hash-compares exactly
    (float formatting differences cannot leak into the hash; the
    summation-order error is ~1e-16 relative, far below half a
    micro-unit). idf = ln(1 + (N - df + 0.5)/(df + 0.5)) — the
    Lucene/Okapi non-negative variant.
    """
    import math

    import numpy as np
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).materialize()
    terms = list(BM25_QUERY)

    def tf_batch(t: pa.Table) -> pa.Table:
        ids, dls = [], []
        tfs = {q: [] for q in terms}
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = (txt or "").split(" ")
            ids.append(int(did))
            dls.append(len(ws))
            for q in terms:
                tfs[q].append(ws.count(q))
        cols = {"doc_id": pa.array(ids, pa.int64()),
                "dl": pa.array(dls, pa.int64())}
        for q in terms:
            cols[f"tf_{q}"] = pa.array(tfs[q], pa.int64())
        return pa.table(cols)

    tf = docs.map_batches(tf_batch, batch_format="pyarrow").materialize()

    def stats_partial(t: pa.Table) -> pa.Table:
        row = {"n_docs": [t.num_rows],
               "sum_dl": [int(pa.compute.sum(t["dl"]).as_py() or 0)]}
        for q in terms:
            row[f"df_{q}"] = [int(pa.compute.sum(
                pa.compute.greater(t[f"tf_{q}"], 0).cast(pa.int64())).as_py()
                or 0)]
        return pa.table(row)

    # bounded by (2 + |query|) scalars per batch — driver-safe fold
    parts = tf.map_batches(stats_partial, batch_format="pyarrow")
    agg = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for c in b.column_names:
            agg[c] = agg.get(c, 0) + int(pa.compute.sum(b[c]).as_py() or 0)
    n_docs = agg.get("n_docs", 0)
    if n_docs == 0:            # empty corpus: no scoreable docs
        import ray.data as rd
        return rd.from_arrow(pa.schema(
            [("doc_id", pa.int64()),
             ("score_u", pa.int64())]).empty_table())
    avgdl = agg["sum_dl"] / max(1, n_docs)
    idf = {q: math.log(1.0 + (n_docs - agg[f"df_{q}"] + 0.5)
                       / (agg[f"df_{q}"] + 0.5)) for q in terms}

    def score_batch(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
        score = np.zeros(len(dl))
        for q in terms:
            f = t[f"tf_{q}"].to_numpy(zero_copy_only=False).astype(np.float64)
            score += idf[q] * f * (BM25_K1 + 1.0) / (f + norm)
        keep = score > 0.0
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "score_u": pa.array(np.rint(score[keep] * 1e6).astype(np.int64),
                                pa.int64()),
        })

    scored = tf.map_batches(score_batch, batch_format="pyarrow")
    return scored.sort(["score_u", "doc_id"],
                       descending=[True, False]).limit(k)


def bm25_oracle_sql(k: int = 20) -> str:
    term_vals = ", ".join(f"('{q}')" for q in BM25_QUERY)
    return f"""
WITH t(term) AS (VALUES {term_vals}),
d AS (SELECT doc_id, string_split(coalesce(text,''),' ') ws FROM documents),
stats AS (SELECT count(*) AS n_docs, avg(len(ws)) AS avgdl FROM d),
tf AS (SELECT d.doc_id, t.term, len(ws) AS dl,
       len(list_filter(ws, w -> w = t.term)) AS f
       FROM d CROSS JOIN t),
df AS (SELECT term, sum(CASE WHEN f > 0 THEN 1 ELSE 0 END) AS df
       FROM tf GROUP BY term),
sc AS (SELECT tf.doc_id,
       sum(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
           * tf.f * ({BM25_K1} + 1.0)
           / (tf.f + {BM25_K1} * (1.0 - {BM25_B}
              + {BM25_B} * tf.dl / stats.avgdl))) AS score
       FROM tf JOIN df USING (term) CROSS JOIN stats
       GROUP BY tf.doc_id)
SELECT doc_id, CAST(round(score * 1e6) AS BIGINT) AS score_u
FROM sc WHERE score > 0
ORDER BY score_u DESC, doc_id ASC LIMIT {k}
""".strip()


# ---- BPE-ish regex tokenizer ------------------------------------------------

# GPT-2-style pre-tokenization pattern, restricted to RE2-compatible
# constructs (no lookahead) so DuckDB's regexp_extract_all reproduces
# Python re.findall exactly (both engines match leftmost-first here).
BPE_PAT = (r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
           r"| ?[^A-Za-z0-9\s]+|\s+")


def bpe_token_counts(sf_dir: str):
    """Token counting with a BPE-ish pre-tokenizer regex alongside the
    whitespace counts of token_stats: per doc, the number of pattern
    matches. The regex compiles ONCE per worker process (module-level
    cache), the map is stateless and shuffle-free."""
    import re

    import ray.data as rd

    rx = re.compile(BPE_PAT)

    def counts(t: pa.Table) -> pa.Table:
        n = [len(rx.findall(x or "")) for x in t["text"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "n_bpe_tokens": pa.array(n, pa.int64())})

    return (rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(counts, batch_format="pyarrow"))


BPE_ORACLE_SQL = (
    "SELECT doc_id, len(regexp_extract_all(text, '"
    + BPE_PAT.replace("'", "''")
    + "')) AS n_bpe_tokens FROM documents")


TOP_TERMS_K = 5


def doc_top_terms(sf_dir: str, k: int = TOP_TERMS_K):
    """TF-IDF-style top-k terms per document, with the document
    frequency attached INSIDE the token's own group rather than by
    broadcasting or joining a vocabulary table: docs explode once to
    one (token, doc_id, tf) row per distinct (token, doc) pair, so a
    groupby(token) group holds exactly df rows — the group size IS the
    df. A second groupby(doc_id) takes the per-doc top-k. Scoring is
    exact integer micro-units (tf * 1e6 // df) so ranking and the
    driver hash cannot drift on float rounding; ties break on token.

    Two thin-row shuffles, zero driver state, no vocab broadcast —
    the same single-shuffle membership trick as ops/stats.
    doc_bigram_novelty, extended with a per-group size statistic.
    """
    import collections

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    tf_schema = pa.schema([("token", pa.string()),
                           ("doc_id", pa.int64()),
                           ("tf", pa.int64())])

    def tf_rows(t: pa.Table) -> pa.Table:
        toks, dids, tfs = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            c = collections.Counter((text or "").split(" "))
            for w, n in c.items():
                toks.append(w)
                dids.append(did)
                tfs.append(n)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "doc_id": pa.array(dids, pa.int64()),
                         "tf": pa.array(tfs, pa.int64())}, schema=tf_schema)

    def attach_df(g: pa.Table) -> pa.Table:
        # one row per distinct doc => group size == document frequency
        df = g.num_rows
        tf = g["tf"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": g["doc_id"],
            "token": g["token"],
            "tf": g["tf"],
            "df": pa.array(np.full(df, df, np.int64)),
            "score_micro": pa.array(tf * 1_000_000 // df, pa.int64()),
        })

    scored = (docs.map_batches(tf_rows, batch_format="pyarrow")
              .groupby("token")
              .map_groups(attach_df, batch_format="pyarrow"))

    def topk(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("score_micro", "descending"),
                                            ("token", "ascending")])[:k]
        g = g.take(idx)
        return g.append_column("rn", pa.array(
            np.arange(1, g.num_rows + 1, dtype=np.int64)))

    return scored.groupby("doc_id").map_groups(topk, batch_format="pyarrow")


TOP_TERMS_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token),
df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token),
s AS (
  SELECT doc_id, token, tf, df,
         tf * 1000000 // df AS score_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf * 1000000 // df DESC, token) AS rn
  FROM tf JOIN df USING (token))
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score_micro AS BIGINT) AS score_micro, CAST(rn AS BIGINT) AS rn
FROM s WHERE rn <= {TOP_TERMS_K}
""".strip()


POSTINGS_CAP = 10


def doc_inverted_index(sf_dir: str, cap: int = POSTINGS_CAP):
    """Inverted-index build: token → document frequency + the first
    ``cap`` posting doc_ids (comma-joined, ascending). The cap is the
    scale guard: a stopword's full posting list is the whole corpus,
    so the emitted row is bounded at ``cap`` ids regardless of df,
    while df still reports the true count. One explode to distinct
    (token, doc_id) thin rows (per-batch Counter keys — a doc never
    emits a token twice), one groupby(token) whose kernel sorts its
    own postings; no vocabulary broadcast, no driver state.
    """
    import collections

    import numpy as np
    import pyarrow.compute as pc
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    td_schema = pa.schema([("token", pa.string()),
                           ("doc_id", pa.int64())])

    def explode(t: pa.Table) -> pa.Table:
        toks, dids = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in collections.Counter((text or "").split(" ")):
                toks.append(w)
                dids.append(did)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "doc_id": pa.array(dids, pa.int64())},
                        schema=td_schema)

    out_schema = pa.schema([("token", pa.string()),
                            ("df", pa.int64()),
                            ("postings", pa.string())])

    def postings(g: pa.Table) -> pa.Table:
        ids = np.sort(g["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table({
            "token": g["token"].slice(0, 1),
            "df": pa.array([len(ids)], pa.int64()),
            "postings": pa.array(
                [",".join(str(i) for i in ids[:cap])], pa.string()),
        }, schema=out_schema)

    return (docs.map_batches(explode, batch_format="pyarrow")
            .groupby("token").map_groups(postings, batch_format="pyarrow"))


INVERTED_ORACLE_SQL = f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
r AS (
  SELECT token, doc_id,
         row_number() OVER (PARTITION BY token ORDER BY doc_id) AS rn,
         count(*) OVER (PARTITION BY token) AS df
  FROM tok)
SELECT token, df,
       string_agg(doc_id, ',' ORDER BY doc_id) AS postings
FROM r WHERE rn <= {POSTINGS_CAP}
GROUP BY token, df
""".strip()


# ---------------------------------------------------------------------------
# BPE merge selection (tokenizer vocabulary induction, round 1)

BPE_MERGE_K = 30


def bpe_merge_vocab(sf_dir: str, k: int = BPE_MERGE_K):
    """The merge-selection step of BPE tokenizer training: count every
    adjacent character pair inside whitespace tokens across the corpus
    and keep the top-k merges (the pair a real trainer would fuse
    first, iterated; one exact round is the representative kernel —
    later rounds are the same count-and-pick over re-segmented text).

    Scale shape: a per-batch Counter collapses each batch to its
    distinct-pair partials (the pair alphabet is tiny — bounded by
    charset², not corpus), one small groupby-Sum, then the per-block
    top-k + bounded driver merge of ops/stats._topk_table. Tie-break
    (n DESC, pair ASC) is pinned on both sides of the oracle.
    """
    import collections

    import ray.data as rd
    from ray.data.aggregate import Sum

    from .stats import _topk_table

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        c: collections.Counter = collections.Counter()
        for text in t["text"].to_pylist():
            for tok in (text or "").split(" "):
                for i in range(len(tok) - 1):
                    c[tok[i:i + 2]] += 1
        return pa.table({"pair": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    counts = (docs.map_batches(partial, batch_format="pyarrow")
              .groupby("pair").aggregate(Sum("n", alias_name="n")))
    return _topk_table(counts,
                       [("n", "descending"), ("pair", "ascending")], k,
                       pa.schema([("pair", pa.string()),
                                  ("n", pa.int64())]))


BPE_MERGE_ORACLE_SQL = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
prs AS (SELECT unnest([substr(tok, i, 2) FOR i IN range(1, len(tok))])
               AS pair
        FROM w WHERE len(tok) >= 2),
c AS (SELECT pair, count(*) AS n FROM prs GROUP BY pair)
SELECT pair, CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, pair ASC LIMIT {BPE_MERGE_K}
""".strip()


# ---------------------------------------------------------------------------
# Vocabulary build + token-id encoding (the tokenizer-application pass)

ENCODE_VOCAB_SIZE = 256
OOV_ID = -1


def docs_encode(sf_dir: str, vocab_size: int = ENCODE_VOCAB_SIZE):
    """Tokenizer application end to end: build the top-``vocab_size``
    vocabulary by corpus frequency (ties broken by token text — the
    deterministic rank DuckDB's ``row_number() ORDER BY n DESC, token``
    reproduces), broadcast the token→id dict once via ``ray.put``, and
    stream every document through a stateless encode that emits its
    id sequence (ids joined by ',' — a string column, because a
    list<int> column renders differently in pandas vs DuckDB and would
    split the driver's value hash) plus token/OOV counts. The
    frequency pass is the standard partial-counter groupby; the
    vocabulary is driver-bounded at ``vocab_size`` rows by the same
    per-block top-k + bounded merge every top-k in this repo uses.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .stats import _topk_table

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter()
        for text in t["text"].to_pylist():
            c.update(w for w in (text or "").split(" ") if w)
        if not c:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ks = sorted(c)
        return pa.table({"token": pa.array(ks, pa.string()),
                         "n": pa.array([c[k] for k in ks], pa.int64())})

    freq = (docs.map_batches(partial_counts, batch_format="pyarrow")
            .groupby("token").aggregate(Sum("n", alias_name="n")))
    vocab_tbl = _topk_table(
        freq, [("n", "descending"), ("token", "ascending")], vocab_size,
        pa.schema([("token", pa.string()), ("n", pa.int64())]))
    vocab = {r["token"]: i
             for i, r in enumerate(vocab_tbl.take_all())}
    vref = ray.put(vocab)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("ids_csv", pa.string()),
                            ("n_tokens", pa.int64()),
                            ("n_oov", pa.int64())])

    def encode(t: pa.Table) -> pa.Table:
        v = ray.get(vref)
        csvs, nt, no = [], [], []
        for text in t["text"].to_pylist():
            toks = [w for w in (text or "").split(" ") if w]
            ids = [v.get(w, OOV_ID) for w in toks]
            csvs.append(",".join(map(str, ids)))
            nt.append(len(ids))
            no.append(sum(1 for i in ids if i == OOV_ID))
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "ids_csv": pa.array(csvs, pa.string()),
                         "n_tokens": pa.array(nt, pa.int64()),
                         "n_oov": pa.array(no, pa.int64())},
                        schema=out_schema)

    return docs.map_batches(encode, batch_format="pyarrow")


ENCODE_ORACLE_SQL = f"""
WITH d AS (
  SELECT doc_id,
         list_filter(string_split(coalesce(text, ''), ' '),
                     x -> x <> '') AS ws
  FROM documents),
toks AS (
  SELECT doc_id, s.pos AS pos, s.tok AS tok
  FROM (SELECT doc_id,
               unnest(list_transform(range(1, len(ws) + 1),
                      i -> {{'pos': i, 'tok': ws[i]}})) AS s
        FROM d)),
freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, row_number() OVER (ORDER BY n DESC, tok) - 1 AS id
  FROM freq ORDER BY n DESC, tok LIMIT {ENCODE_VOCAB_SIZE}),
enc AS (
  SELECT t.doc_id, t.pos,
         CAST(coalesce(v.id, {OOV_ID}) AS BIGINT) AS id
  FROM toks t LEFT JOIN vocab v ON v.tok = t.tok)
SELECT d.doc_id,
       coalesce(e.ids_csv, '') AS ids_csv,
       CAST(coalesce(e.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(e.n_oov, 0) AS BIGINT) AS n_oov
FROM d LEFT JOIN (
  SELECT doc_id,
         string_agg(CAST(id AS VARCHAR), ',' ORDER BY pos) AS ids_csv,
         count(*) AS n_tokens,
         sum(CASE WHEN id = {OOV_ID} THEN 1 ELSE 0 END) AS n_oov
  FROM enc GROUP BY doc_id) e USING (doc_id)
""".strip()


# ---------------------------------------------------------------------------
# Fuzzy string similarity join over the token vocabulary (FastSS)

FUZZY_MAX_DIST = 2     # Levenshtein threshold
FUZZY_MIN_LEN = 4      # vocab filter: token length
FUZZY_MIN_FREQ = 2     # vocab filter: corpus frequency


def _lev_leq(a: str, b: str, k: int) -> int:
    """Exact Levenshtein distance if <= k, else k + 1 (banded DP —
    O(len * k) per candidate pair, only ever run on blocked survivors)."""
    if abs(len(a) - len(b)) > k:
        return k + 1
    if len(a) > len(b):
        a, b = b, a
    prev = list(range(len(a) + 1))
    for j, cb in enumerate(b, 1):
        cur = [j] + [0] * len(a)
        lo = max(1, j - k)
        hi = min(len(a), j + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for i in range(lo, hi + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1,
                         prev[i - 1] + (a[i - 1] != b[j - 1]))
        if hi < len(a):
            cur[hi + 1:] = [k + 1] * (len(a) - hi)
        if min(cur[max(0, lo - 1):hi + 1]) > k:
            return k + 1
        prev = cur
    return min(prev[-1], k + 1)


def _deletion_keys(tok: str, k: int) -> set:
    """FastSS deletion neighborhood: ``tok`` with up to ``k``
    characters removed. lev(u, v) <= k implies the neighborhoods of u
    and v intersect (Bocek et al. 2007), so grouping by these keys is a
    COMPLETE blocking for the exact verify that follows."""
    out, frontier = {tok}, {tok}
    for _ in range(k):
        frontier = {s[:i] + s[i + 1:] for s in frontier
                    for i in range(len(s))}
        out |= frontier
    return out


def token_fuzzy_pairs(sf_dir: str, max_dist: int = FUZZY_MAX_DIST):
    """Typo-candidate mining / fuzzy similarity self-join: all pairs of
    vocabulary tokens (length >= FUZZY_MIN_LEN, corpus frequency >=
    FUZZY_MIN_FREQ) within Levenshtein distance ``max_dist``, with both
    frequencies attached. The corpus-scale work is the distributed
    frequency count (per-batch Counter partials, one token groupby);
    the pair search then runs over the vocabulary — still expressed as
    a keyed shuffle so a million-token web vocabulary never meets a
    V^2 loop: FastSS deletion-neighborhood keys block candidates
    (complete for Levenshtein <= k), one groupby(key) emits in-block
    pairs, a (tok_a, tok_b) groupby dedups pairs that share several
    keys, and only then does the banded-DP exact verify run — once per
    distinct candidate pair.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial_counts(t: pa.Table) -> pa.Table:
        import collections
        c = collections.Counter()
        for text in t["text"].to_pylist():
            c.update(w for w in (text or "").split(" ")
                     if len(w) >= FUZZY_MIN_LEN)
        ks = sorted(c)
        return pa.table({"token": pa.array(ks, pa.string()),
                         "n": pa.array([c[k] for k in ks], pa.int64())})

    vocab = (docs.map_batches(partial_counts, batch_format="pyarrow")
             .groupby("token").aggregate(Sum("n", alias_name="n"))
             .filter(expr=f"n >= {FUZZY_MIN_FREQ}"))

    key_schema = pa.schema([("key", pa.string()), ("token", pa.string()),
                            ("n", pa.int64())])

    def emit_keys(t: pa.Table) -> pa.Table:
        toks = t["token"].to_pylist()
        ns = t["n"].to_numpy(zero_copy_only=False)
        out_k, out_t, out_n = [], [], []
        for tok, n in zip(toks, ns):
            for key in _deletion_keys(tok, max_dist):
                out_k.append(key)
                out_t.append(tok)
                out_n.append(int(n))
        return pa.table({"key": pa.array(out_k, pa.string()),
                         "token": pa.array(out_t, pa.string()),
                         "n": pa.array(out_n, pa.int64())},
                        schema=key_schema)

    pair_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                             ("n_a", pa.int64()), ("n_b", pa.int64())])

    def block_pairs(g: pa.Table) -> pa.Table:
        # tokens sharing one deletion key: emit each unordered pair once
        g = (g.select(["token", "n"]).group_by("token")
             .aggregate([("n", "max")]))
        g = g.take(pc.sort_indices(g, sort_keys=[("token", "ascending")]))
        toks = g["token"].to_pylist()
        ns = g["n_max"].to_numpy(zero_copy_only=False)
        m = len(toks)
        if m < 2:
            return pair_schema.empty_table()
        ia, ib = np.triu_indices(m, k=1)
        return pa.table({
            "tok_a": pa.array([toks[i] for i in ia], pa.string()),
            "tok_b": pa.array([toks[j] for j in ib], pa.string()),
            "n_a": pa.array(ns[ia], pa.int64()),
            "n_b": pa.array(ns[ib], pa.int64()),
        }, schema=pair_schema)

    out_schema = pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                            ("dist", pa.int64()),
                            ("n_a", pa.int64()), ("n_b", pa.int64())])

    def verify(t: pa.Table) -> pa.Table:
        ta = t["tok_a"].to_pylist()
        tb = t["tok_b"].to_pylist()
        dist = np.array([_lev_leq(a, b, max_dist) for a, b in zip(ta, tb)],
                        np.int64)
        keep = dist <= max_dist
        return pa.table({
            "tok_a": pa.array([x for x, k in zip(ta, keep) if k]),
            "tok_b": pa.array([x for x, k in zip(tb, keep) if k]),
            "dist": pa.array(dist[keep], pa.int64()),
            "n_a": t["n_a"].filter(pa.array(keep)).combine_chunks(),
            "n_b": t["n_b"].filter(pa.array(keep)).combine_chunks(),
        }, schema=out_schema)

    candidates = (vocab.map_batches(emit_keys, batch_format="pyarrow")
                  .groupby("key").map_groups(block_pairs,
                                             batch_format="pyarrow")
                  .groupby(["tok_a", "tok_b"])
                  .aggregate(Max("n_a", alias_name="n_a"),
                             Max("n_b", alias_name="n_b")))
    return candidates.map_batches(verify, batch_format="pyarrow")


FUZZY_PAIRS_ORACLE_SQL = f"""
WITH w AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
v AS (SELECT tok, count(*) AS n FROM w WHERE len(tok) >= {FUZZY_MIN_LEN}
      GROUP BY tok HAVING count(*) >= {FUZZY_MIN_FREQ})
SELECT a.tok AS tok_a, b.tok AS tok_b,
       CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist,
       CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b
FROM v a JOIN v b ON a.tok < b.tok
WHERE levenshtein(a.tok, b.tok) <= {FUZZY_MAX_DIST}
""".strip()


# ---------------------------------------------------------------------------
# Word-bigram counts (n-gram LM counts at word granularity)

WORD_BIGRAM_K = 30


def doc_word_bigrams(sf_dir: str, k: int = WORD_BIGRAM_K):
    """Top-``k`` corpus word bigrams by count ((count DESC, bigram ASC)
    tie-break) — the word-granularity n-gram count pass every LM data
    pipeline runs (``bpe_merge_vocab`` is the CHARACTER-pair sibling).
    Per-batch Counter partials collapse in-batch repeats, the groupby
    carries one row per distinct bigram per batch, and the top-k is
    the usual per-block + bounded-merge sketch."""
    import collections

    import ray.data as rd
    from ray.data.aggregate import Sum

    from .stats import _topk_table

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for text in t["text"].to_pylist():
            ws = [w for w in (text or "").split(" ") if w]
            c.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        ks = sorted(c)
        return pa.table({"bigram": pa.array(ks, pa.string()),
                         "n": pa.array([c[x] for x in ks], pa.int64())})

    counts = (docs.map_batches(partial, batch_format="pyarrow")
              .groupby("bigram").aggregate(Sum("n", alias_name="n")))
    return _topk_table(counts, [("n", "descending"),
                                ("bigram", "ascending")], k,
                       pa.schema([("bigram", pa.string()),
                                  ("n", pa.int64())]))


WORD_BIGRAM_ORACLE_SQL = f"""
WITH d AS (SELECT list_filter(string_split(coalesce(text, ''), ' '),
                              w -> w <> '') AS ws FROM documents),
b AS (SELECT unnest([ws[i] || ' ' || ws[i + 1]
                     FOR i IN range(1, len(ws))]) AS bigram
      FROM d WHERE len(ws) >= 2),
c AS (SELECT bigram, count(*) AS n FROM b GROUP BY bigram)
SELECT bigram, CAST(n AS BIGINT) AS n
FROM c ORDER BY n DESC, bigram ASC LIMIT {WORD_BIGRAM_K}
""".strip()


# ---------------------------------------------------------------------------
# PMI collocations (top bigrams by exact-integer pointwise mutual info)

PMI_TOPK = 30
PMI_MIN_COUNT = 5
PMI_SCALE = 1_000_000


def _pmi_ppm(n_xy, n_x, n_y, total):
    """Integer PMI score ``n_xy·total·SCALE // (n_x·n_y)``. The
    vectorized int64 path is gated on BOTH sides: the numerator
    ``n_xy·total·SCALE`` and, independently, the denominator
    ``n_x·n_y`` — two unigrams each with ~3e9+ occurrences would wrap
    the int64 product into a negative divisor on the numpy path while
    the numerator gate alone stays green (ADVICE r3). Either overflow
    risk drops the batch to exact Python big-int arithmetic (rows are
    vocab²-bounded, so the fallback is cheap)."""
    num_ok = (total and int(n_xy.max(initial=0)) * total
              <= (1 << 62) // PMI_SCALE)
    den_ok = (len(n_x) == 0
              or int(n_x.max()) * int(n_y.max()) <= (1 << 62))
    if num_ok and den_ok:
        return n_xy * total * PMI_SCALE // (n_x * n_y)
    return np.array([int(a) * total * PMI_SCALE // (int(b) * int(c))
                     for a, b, c in zip(n_xy, n_x, n_y)], np.int64)


def word_pmi_topk(sf_dir: str, k: int = PMI_TOPK,
                  min_count: int = PMI_MIN_COUNT,
                  broadcast_threshold: int | None = None):
    """Top-``k`` collocations: adjacent word pairs ranked by the PMI
    RATIO n_xy·N / (n_x·n_y) in exact integer ppm — the monotone image
    of log-PMI, so no float log ever enters the order (the
    ``doc_word_bigrams`` count pass finds frequent pairs; this finds
    ASSOCIATED pairs whose joint count beats chance). Shape: unigram
    and bigram count passes (per-batch Counter partials, one groupby
    each), a ``min_count`` support filter, then the vocabulary-scale
    unigram table attaches n_x and n_y through the size-gated policy
    and the usual bounded top-k merge runs on (pmi_ppm DESC, w1, w2).
    The corpus total N is ONE driver scalar. Integer contract:
    n_xy·N·10⁶ must fit int64 — true to ~10¹² corpus tokens with the
    numpy path; the kernel falls back to exact Python-int arithmetic
    (vocab²-bounded rows, never corpus-bounded) beyond it."""
    import collections

    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim
    from .stats import _topk_table

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def uni_partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for text in t["text"].to_pylist():
            c.update(w for w in (text or "").split(" ") if w)
        ks = sorted(c)
        return pa.table({"tok": pa.array(ks, pa.string()),
                         "n": pa.array([c[x] for x in ks], pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for text in t["text"].to_pylist():
            ws = [w for w in (text or "").split(" ") if w]
            c.update(zip(ws, ws[1:]))
        ks = sorted(c)
        return pa.table({"w1": pa.array([a for a, _ in ks], pa.string()),
                         "w2": pa.array([b for _, b in ks], pa.string()),
                         "n_xy": pa.array([c[x] for x in ks], pa.int64())})

    uni = (docs.map_batches(uni_partial, batch_format="pyarrow")
           .groupby("tok").aggregate(Sum("n", alias_name="n"))
           .materialize())
    total = int(uni.aggregate(Sum("n", alias_name="s"))["s"] or 0)

    bi = (docs.map_batches(bi_partial, batch_format="pyarrow")
          .groupby(["w1", "w2"]).aggregate(Sum("n_xy", alias_name="n_xy"))
          .filter(expr=f"n_xy >= {int(min_count)}"))

    bi = attach_dim(bi, uni, "w1", "tok", ["n"], broadcast_threshold=bt)
    bi = bi.map_batches(
        lambda t: t.rename_columns(
            [("n_x" if c == "n" else c) for c in t.column_names]),
        batch_format="pyarrow")
    bi = attach_dim(bi, uni, "w2", "tok", ["n"], broadcast_threshold=bt)

    out_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("n_xy", pa.int64()), ("n_x", pa.int64()),
                            ("n_y", pa.int64()), ("pmi_ppm", pa.int64())])

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_xy" not in t.column_names:
            return out_schema.empty_table()
        n_xy = t["n_xy"].to_numpy(zero_copy_only=False)
        n_x = t["n_x"].to_numpy(zero_copy_only=False)
        n_y = t["n"].to_numpy(zero_copy_only=False)
        pmi = _pmi_ppm(n_xy, n_x, n_y, total)
        return pa.table({"w1": t["w1"], "w2": t["w2"],
                         "n_xy": pa.array(n_xy, pa.int64()),
                         "n_x": pa.array(n_x, pa.int64()),
                         "n_y": pa.array(n_y, pa.int64()),
                         "pmi_ppm": pa.array(pmi, pa.int64())},
                        schema=out_schema)

    scored = bi.map_batches(score, batch_format="pyarrow")
    return _topk_table(scored, [("pmi_ppm", "descending"),
                                ("w1", "ascending"), ("w2", "ascending")],
                       k, out_schema)


PMI_ORACLE_SQL = f"""
WITH d AS (SELECT list_filter(string_split(coalesce(text, ''), ' '),
                              w -> w <> '') AS ws FROM documents),
u AS (SELECT unnest(ws) AS tok FROM d),
un AS (SELECT tok, count(*) AS n FROM u GROUP BY tok),
tot AS (SELECT count(*) AS n FROM u),
b AS (SELECT unnest([ws[i] || ' ' || ws[i + 1]
                     FOR i IN range(1, len(ws))]) AS bigram
      FROM d WHERE len(ws) >= 2),
bc AS (SELECT split_part(bigram, ' ', 1) AS w1,
              split_part(bigram, ' ', 2) AS w2, count(*) AS n_xy
       FROM b GROUP BY 1, 2 HAVING count(*) >= {PMI_MIN_COUNT}),
p AS (SELECT w1, w2, n_xy, ux.n AS n_x, uy.n AS n_y,
             n_xy * (SELECT n FROM tot) * {PMI_SCALE}
                 // (ux.n * uy.n) AS pmi_ppm
      FROM bc JOIN un ux ON bc.w1 = ux.tok
              JOIN un uy ON bc.w2 = uy.tok)
SELECT w1, w2, CAST(n_xy AS BIGINT) AS n_xy, CAST(n_x AS BIGINT) AS n_x,
       CAST(n_y AS BIGINT) AS n_y, CAST(pmi_ppm AS BIGINT) AS pmi_ppm
FROM p ORDER BY pmi_ppm DESC, w1, w2 LIMIT {PMI_TOPK}
""".strip()
