"""Web-text quality filtering and containment dedup over ``documents``.

Two curation staples of public web-corpus pipelines (Gopher, C4,
RefinedWeb — see PAPERS.md) the reference lacks, each with an exact
DuckDB oracle:

  gopher_quality   the Gopher-style per-document rule battery (word
                   count bounds, mean word length band, symbol-to-word
                   ratio, alphabetic-word fraction, stop-word
                   containment) emitted as integer-quantized metrics
                   plus a keep verdict. Stateless ``map_batches``,
                   fully vectorized: one ``split_pattern`` per batch,
                   token-level stats folded back per document with
                   ``np.bincount`` over ``list_parent_indices`` — no
                   Python loop over rows or tokens.
  prefix_containment  token-aligned prefix-containment dedup: a
                   document is "contained" when its first
                   PROBE_TOKENS tokens occur as a consecutive token
                   run inside ANOTHER document. The probe's first
                   GRAM-token window is the blocking key: documents
                   explode to md5'd gram rows (the decontaminate
                   shape — grams travel as 16-byte hex, never text),
                   one groupby co-locates probes with candidate
                   containers, and only the surviving candidate PAIRS
                   pay the exact padded-substring verification. At
                   100 TB this is one keyed all-to-all on the gram
                   hash plus two id-keyed joins for the verify
                   payloads; no driver-side state at any size.

Tokenization contract matches ops/text.py / ops/curation.py: split on
single spaces, drop empty tokens (``text.split(' ')`` == DuckDB
``string_split(text, ' ')``; the filter drops run-of-space artifacts
identically on both sides). All ratios are integer-quantized
(floor-divided permille / x100) so the driver's value hash cannot
drift on float formatting.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Gopher rule battery (Rae et al. 2021 table A1 shape, thresholds
# re-banded for the synthetic corpus so the verdict actually splits):
N_WORDS_MIN, N_WORDS_MAX = 30, 90
MEAN_LEN_MIN_X100, MEAN_LEN_MAX_X100 = 400, 520
SYMBOL_MAX_PERMILLE = 100
ALPHA_MIN_PERMILLE = 800
STOPWORDS = ("the", "a", "and", "of", "to")
STOPWORD_MIN_HITS = 2

PROBE_TOKENS = 12          # prefix length (tokens) probed for containment
CONTAIN_GRAM = 8           # blocking-gram width (<= PROBE_TOKENS)


def _read_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


# ---- Gopher-style quality rules -------------------------------------------

def gopher_batch(batch: pa.Table) -> pa.Table:
    # null text → empty doc (mirrored by coalesce in the oracle);
    # without the fill a null row would poison the int casts below
    txt = pc.fill_null(batch["text"].combine_chunks().cast(pa.string()),
                       "")
    n = len(txt)
    hashes = pc.count_substring(txt, pattern="#").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ellipses = pc.count_substring(txt, pattern="...").to_numpy(
        zero_copy_only=False).astype(np.int64)

    words = pc.split_pattern(txt, pattern=" ")
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(words)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    nonempty = wlen > 0

    n_words = np.bincount(parent[nonempty], minlength=n).astype(np.int64)
    chars = np.bincount(parent, weights=wlen,
                        minlength=n).astype(np.int64)
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
        zero_copy_only=False)
    alpha_words = np.bincount(parent[alpha & nonempty],
                              minlength=n).astype(np.int64)

    hits = np.zeros(n, dtype=np.int64)
    for sw in STOPWORDS:
        present = np.zeros(n, dtype=bool)
        eq = pc.equal(flat, sw).to_numpy(zero_copy_only=False)
        present[parent[eq]] = True
        hits += present

    nw1 = np.maximum(n_words, 1)
    mean_x100 = (chars * 100) // nw1
    symbol_pm = ((hashes + ellipses) * 1000) // nw1
    alpha_pm = (alpha_words * 1000) // nw1
    keep = ((n_words >= N_WORDS_MIN) & (n_words <= N_WORDS_MAX)
            & (mean_x100 >= MEAN_LEN_MIN_X100)
            & (mean_x100 <= MEAN_LEN_MAX_X100)
            & (symbol_pm < SYMBOL_MAX_PERMILLE)
            & (alpha_pm >= ALPHA_MIN_PERMILLE)
            & (hits >= STOPWORD_MIN_HITS)).astype(np.int64)

    return pa.table({
        "doc_id": batch["doc_id"],
        "n_words": pa.array(n_words, pa.int64()),
        "mean_word_len_x100": pa.array(mean_x100, pa.int64()),
        "symbol_permille": pa.array(symbol_pm, pa.int64()),
        "alpha_permille": pa.array(alpha_pm, pa.int64()),
        "stopword_hits": pa.array(hits, pa.int64()),
        "keep": pa.array(keep, pa.int64()),
    })


def gopher_quality(sf_dir: str):
    return _read_docs(sf_dir).map_batches(gopher_batch,
                                          batch_format="pyarrow")


def _sw_hits_sql() -> str:
    return " + ".join(
        f"(CASE WHEN list_contains(ws, '{w}') THEN 1 ELSE 0 END)"
        for w in STOPWORDS)


GOPHER_ORACLE_SQL = f"""
WITH t0 AS (SELECT doc_id, coalesce(text, '') AS text FROM documents),
w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws,
         length(text) - length(replace(text, '#', '')) AS hashes,
         (length(text) - length(replace(text, '...', ''))) // 3
           AS ellipses
  FROM t0),
s AS (
  SELECT doc_id,
         len(ws) AS n_words,
         greatest(len(ws), 1) AS nw1,
         coalesce(list_sum(list_transform(ws, x -> length(x))), 0)
           AS chars,
         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
           AS alpha_words,
         {_sw_hits_sql()} AS stopword_hits,
         hashes + ellipses AS symbols
  FROM w)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST((chars * 100) // nw1 AS BIGINT) AS mean_word_len_x100,
       CAST((symbols * 1000) // nw1 AS BIGINT) AS symbol_permille,
       CAST((alpha_words * 1000) // nw1 AS BIGINT) AS alpha_permille,
       CAST(stopword_hits AS BIGINT) AS stopword_hits,
       CAST(CASE WHEN n_words BETWEEN {N_WORDS_MIN} AND {N_WORDS_MAX}
             AND (chars * 100) // nw1
                 BETWEEN {MEAN_LEN_MIN_X100} AND {MEAN_LEN_MAX_X100}
             AND (symbols * 1000) // nw1 < {SYMBOL_MAX_PERMILLE}
             AND (alpha_words * 1000) // nw1 >= {ALPHA_MIN_PERMILLE}
             AND stopword_hits >= {STOPWORD_MIN_HITS}
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s
""".strip()


# ---- token-aligned prefix containment -------------------------------------

def _gram_key(tokens: list[str]) -> str:
    return hashlib.md5(" ".join(tokens).encode()).hexdigest()


def containment_gram_rows(batch: pa.Table) -> pa.Table:
    """(gram_key, doc_id, is_probe) rows: every token-aligned
    CONTAIN_GRAM window of every doc (deduped per doc), plus — for docs
    long enough to carry a probe — the probe's leading gram flagged
    ``is_probe=1``. Grams travel as md5 hex only."""
    gs, ids, probes = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(),
                            batch["text"].to_pylist()):
        toks = [w for w in (text or "").split(" ") if w]
        seen = set()
        for i in range(len(toks) - CONTAIN_GRAM + 1):
            k = _gram_key(toks[i:i + CONTAIN_GRAM])
            if k not in seen:
                seen.add(k)
                gs.append(k)
                ids.append(doc_id)
                probes.append(0)
        if len(toks) >= PROBE_TOKENS:
            gs.append(_gram_key(toks[:CONTAIN_GRAM]))
            ids.append(doc_id)
            probes.append(1)
    return pa.table({"g": pa.array(gs, pa.string()),
                     "doc_id": pa.array(ids, pa.int64()),
                     "is_probe": pa.array(probes, pa.int64())})


def _candidate_pairs(group: pa.Table) -> pa.Table:
    """Within one gram bucket: (probe_doc, cand_doc) for every probe ×
    container row, self-pairs excluded."""
    ids = group["doc_id"].to_pylist()
    probe = group["is_probe"].to_pylist()
    probe_docs = sorted({d for d, p in zip(ids, probe) if p})
    cand_docs = sorted({d for d, p in zip(ids, probe) if not p})
    ps, cs = [], []
    for p in probe_docs:
        for c in cand_docs:
            if c != p:
                ps.append(p)
                cs.append(c)
    return pa.table({"probe_doc": pa.array(ps, pa.int64()),
                     "cand_doc": pa.array(cs, pa.int64())})


def _norm_and_probe(batch: pa.Table) -> pa.Table:
    norms, probes = [], []
    for text in batch["text"].to_pylist():
        toks = [w for w in (text or "").split(" ") if w]
        norms.append(" ".join(toks))
        probes.append(" ".join(toks[:PROBE_TOKENS])
                      if len(toks) >= PROBE_TOKENS else None)
    return pa.table({"doc_id": batch["doc_id"],
                     "norm": pa.array(norms, pa.string()),
                     "probe": pa.array(probes, pa.string())})


def prefix_containment(sf_dir: str, num_partitions: int | None = None):
    """Per document: how many OTHER documents contain its
    PROBE_TOKENS-token prefix as a consecutive token run (and a 0/1
    ``contained`` verdict; docs shorter than the probe report 0 with
    ``probed = 0``). Blocking is exact — a token-aligned occurrence of
    the probe implies the container carries the probe's leading gram —
    so the gram groupby misses nothing, and every candidate pair is
    verified with the padded-substring check before it counts.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from ..rayutil import parquet_num_rows

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_containers", pa.int64()),
                            ("contained", pa.int64()),
                            ("probed", pa.int64())])
    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    del num_partitions  # exchanges below are groupbys; Ray sizes them
    docs = _read_docs(sf_dir)
    meta = docs.map_batches(_norm_and_probe,
                            batch_format="pyarrow").materialize()

    pair_schema = pa.schema([("probe_doc", pa.int64()),
                             ("cand_doc", pa.int64())])

    def _norm_pairs(t: pa.Table) -> pa.Table:
        # an aggregator partition whose groups were ALL empty emits a
        # schema-less block; pin the pair schema before the next stage
        if t.num_rows == 0 or "probe_doc" not in t.column_names:
            return pair_schema.empty_table()
        return t.select(["probe_doc", "cand_doc"]).cast(pair_schema)

    pairs = (docs.map_batches(containment_gram_rows,
                              batch_format="pyarrow")
             .groupby("g").map_groups(_candidate_pairs,
                                      batch_format="pyarrow")
             .map_batches(_norm_pairs, batch_format="pyarrow"))

    # attach the probe string (by probe_doc) and the normalized
    # container text (by cand_doc). Both attaches are union+groupby
    # keyed exchanges, NOT Dataset joins: the pair side is sparse
    # (possibly zero rows per hash partition) and Ray 2.49's hash-join
    # aggregator cannot finalize a left partition that received only
    # empty bundles — a groupby tolerates that shape.
    probe_rows = meta.map_batches(
        lambda t: pa.table({"key": t["doc_id"],
                            "cand_doc": pa.nulls(t.num_rows, pa.int64()),
                            "payload": t["probe"]}),
        batch_format="pyarrow")
    pair_rows = pairs.map_batches(
        lambda t: pa.table({"key": t["probe_doc"],
                            "cand_doc": t["cand_doc"],
                            "payload": pa.nulls(t.num_rows, pa.string())}),
        batch_format="pyarrow")

    def _attach_probe(g: pa.Table) -> pa.Table:
        cands = g["cand_doc"].to_pylist()
        pays = g["payload"].to_pylist()
        keys = g["key"].to_pylist()
        probe = next((p for c, p in zip(cands, pays) if c is None), None)
        out_c = [c for c in cands if c is not None]
        return pa.table({
            "key2": pa.array(out_c, pa.int64()),
            "probe_doc": pa.array([keys[0]] * len(out_c), pa.int64()),
            "probe": pa.array([probe] * len(out_c), pa.string())})

    withprobe_schema = pa.schema([("key2", pa.int64()),
                                  ("probe_doc", pa.int64()),
                                  ("probe", pa.string())])

    def _norm_withprobe(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "key2" not in t.column_names:
            return withprobe_schema.empty_table()
        return t.select(["key2", "probe_doc", "probe"]).cast(
            withprobe_schema)

    withprobe = (probe_rows.union(pair_rows).groupby("key")
                 .map_groups(_attach_probe, batch_format="pyarrow")
                 .map_batches(_norm_withprobe, batch_format="pyarrow"))

    # second exchange: key = candidate doc; its norm text rides in on
    # a marker row and every pair in the group verifies against it
    norm_rows = meta.map_batches(
        lambda t: pa.table({"key2": t["doc_id"],
                            "probe_doc": pa.nulls(t.num_rows, pa.int64()),
                            "probe": pa.nulls(t.num_rows, pa.string()),
                            "norm": t["norm"]}),
        batch_format="pyarrow")
    withprobe2 = withprobe.map_batches(
        lambda t: pa.table({"key2": t["key2"],
                            "probe_doc": t["probe_doc"],
                            "probe": t["probe"],
                            "norm": pa.nulls(t.num_rows, pa.string())}),
        batch_format="pyarrow")

    hit_schema = pa.schema([("doc_id", pa.int64()),
                            ("hit", pa.int64()),
                            ("probed", pa.int64())])

    def _verify_group(g: pa.Table) -> pa.Table:
        probes_ = g["probe"].to_pylist()
        pdocs = g["probe_doc"].to_pylist()
        norms_ = g["norm"].to_pylist()
        norm = next((s for s in norms_ if s is not None), "")
        ids, hits_ = [], []
        for pd_, p in zip(pdocs, probes_):
            if pd_ is None:
                continue
            ids.append(pd_)
            hits_.append(int(p is not None
                             and (" " + p + " ") in (" " + norm + " ")))
        # a pair only exists for probed docs, so probed rides along as 1
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "hit": pa.array(hits_, pa.int64()),
                         "probed": pa.array([1] * len(ids), pa.int64())})

    def _norm_hits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            return hit_schema.empty_table()
        return t.select(["doc_id", "hit", "probed"]).cast(hit_schema)

    hits = (norm_rows.union(withprobe2).groupby("key2")
            .map_groups(_verify_group, batch_format="pyarrow")
            .map_batches(_norm_hits, batch_format="pyarrow"))

    # one zero row per doc carries the probed flag (probe IS NOT NULL),
    # so the groupby below needs no driver-side id set at any scale
    base = meta.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "hit": pa.array([0] * t.num_rows, pa.int64()),
            "probed": pc.cast(pc.is_valid(t["probe"]), pa.int64())}),
        batch_format="pyarrow")
    counts = (base.union(hits).groupby("doc_id")
              .aggregate(Sum("hit", alias_name="n_containers"),
                         Max("probed", alias_name="probed")))

    def finish(t: pa.Table) -> pa.Table:
        nc = t["n_containers"].cast(pa.int64())
        contained = pc.cast(pc.greater(nc, 0), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_containers": nc,
                         "contained": contained,
                         "probed": t["probed"].cast(pa.int64())},
                        schema=out_schema)

    return counts.map_batches(finish, batch_format="pyarrow")


CONTAINMENT_ORACLE_SQL = f"""
WITH p AS (
  SELECT doc_id,
         array_to_string(list_filter(string_split(text, ' '),
                                     x -> x <> ''), ' ') AS norm,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents),
q AS (
  SELECT doc_id, norm,
         CASE WHEN len(ws) >= {PROBE_TOKENS}
              THEN array_to_string(list_slice(ws, 1, {PROBE_TOKENS}), ' ')
              ELSE NULL END AS probe
  FROM p)
SELECT a.doc_id,
       CAST(count(b.doc_id) AS BIGINT) AS n_containers,
       CAST(CASE WHEN count(b.doc_id) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS contained,
       CAST(CASE WHEN a.probe IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         AS probed
FROM q a LEFT JOIN q b
  ON b.doc_id <> a.doc_id
 AND a.probe IS NOT NULL
 AND position((' ' || a.probe || ' ') IN (' ' || b.norm || ' ')) > 0
GROUP BY a.doc_id, a.probe
""".strip()
