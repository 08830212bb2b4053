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

import pyarrow as pa

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
