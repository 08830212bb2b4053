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
                   one keyed exchange co-locates probes with candidate
                   containers, and only the surviving candidate PAIRS
                   pay the exact padded-substring verification against
                   a second exchange's norm-marker rows. At 100 TB
                   this is two keyed all-to-alls plus one counting
                   groupby; no driver-side state at any size.

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
    """(gram_key, doc_id, is_probe, probe) rows: every token-aligned
    CONTAIN_GRAM window of every doc (deduped per doc), plus — for docs
    long enough to carry a probe — the probe's leading gram flagged
    ``is_probe=1`` and carrying the probe STRING itself (one short row
    per doc, so pairs leave the gram exchange with the probe already
    attached — no separate probe-attach exchange). Non-probe grams
    travel as md5 hex only; document text never rides a gram row."""
    gs, ids, probes, pstr = [], [], [], []
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
                pstr.append(None)
        if len(toks) >= PROBE_TOKENS:
            gs.append(_gram_key(toks[:CONTAIN_GRAM]))
            ids.append(doc_id)
            probes.append(1)
            pstr.append(" ".join(toks[:PROBE_TOKENS]))
    return pa.table({"g": pa.array(gs, pa.string()),
                     "doc_id": pa.array(ids, pa.int64()),
                     "is_probe": pa.array(probes, pa.int64()),
                     "probe": pa.array(pstr, pa.string())})


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


PAIR_SCHEMA = pa.schema([("key2", pa.int64()),      # candidate doc
                         ("probe_doc", pa.int64()),
                         ("probe", pa.string())])

HIT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                        ("hit", pa.int64()),
                        ("probed", pa.int64())])


def _pair_kernel(tbl: pa.Table) -> pa.Table:
    """Vectorized MULTI-group pair expansion: sort by (g, is_probe
    DESC), find gram-run boundaries with one numpy compare, then touch
    Python only inside runs that actually start with a probe row (at
    most one such run per probed doc). The same kernel serves a whole
    hash bucket (exchange path) or a single group (groupby fallback) —
    Ray's one-Python-call-per-group ``map_groups`` at 50 grams/doc was
    the measured hot spot of the first implementation."""
    if tbl.num_rows == 0:
        return PAIR_SCHEMA.empty_table()
    order = pc.sort_indices(tbl, sort_keys=[("g", "ascending"),
                                            ("is_probe", "descending"),
                                            ("doc_id", "ascending")])
    t = tbl.take(order)
    gs = t["g"].to_numpy(zero_copy_only=False)
    flag = t["is_probe"].to_numpy(zero_copy_only=False)
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.concatenate([[True], gs[1:] != gs[:-1]]))
    ends = np.append(starts[1:], len(gs))
    live = flag[starts] == 1
    probe_col = None
    ks, pds, ps = [], [], []
    for s, e in zip(starts[live], ends[live]):
        split = s
        while split < e and flag[split]:
            split += 1
        if split == e:                       # probes only, no cands
            continue
        if probe_col is None:
            probe_col = t["probe"].to_pylist()
        for pi in range(s, split):
            for ci in range(split, e):
                if ids[ci] != ids[pi]:
                    ks.append(int(ids[ci]))
                    pds.append(int(ids[pi]))
                    ps.append(probe_col[pi])
    return pa.table({"key2": pa.array(ks, pa.int64()),
                     "probe_doc": pa.array(pds, pa.int64()),
                     "probe": pa.array(ps, pa.string())})


def _verify_kernel(tbl: pa.Table) -> pa.Table:
    """Vectorized MULTI-group verify: key2 = candidate doc, each run
    holds one marker row carrying the candidate's normalized text
    (is_norm=1, sorted first) plus the pair rows probing it. Python
    runs only over pair rows — the rare survivors of gram blocking."""
    if tbl.num_rows == 0:
        return HIT_SCHEMA.empty_table()
    order = pc.sort_indices(tbl, sort_keys=[("key2", "ascending"),
                                            ("is_norm", "descending")])
    t = tbl.take(order)
    keys = t["key2"].to_numpy(zero_copy_only=False)
    isn = t["is_norm"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.concatenate([[True],
                                            keys[1:] != keys[:-1]]))
    ends = np.append(starts[1:], len(keys))
    busy = (ends - starts) > 1               # runs with actual pairs
    if not busy.any():
        return HIT_SCHEMA.empty_table()
    norms = t["norm"].to_pylist()
    probes = t["probe"].to_pylist()
    pd_col = t["probe_doc"].to_pylist()
    out_d, out_h = [], []
    for s, e in zip(starts[busy], ends[busy]):
        padded = " " + (norms[s] if isn[s] else "") + " "
        for i in range(s + 1 if isn[s] else s, e):
            p = probes[i]
            out_d.append(pd_col[i])
            out_h.append(int(p is not None
                             and (" " + p + " ") in padded))
    return pa.table({"doc_id": pa.array(out_d, pa.int64()),
                     "hit": pa.array(out_h, pa.int64()),
                     "probed": pa.array([1] * len(out_d), pa.int64())})


EXCHANGE_MAX_ROWS = 500_000_000   # direct-task exchange row gate (r4 sizing)


def prefix_containment(sf_dir: str, num_partitions: int | None = None,
                       exchange_max_rows: int = EXCHANGE_MAX_ROWS):
    """Per document: how many OTHER documents contain its
    PROBE_TOKENS-token prefix as a consecutive token run (and a 0/1
    ``contained`` verdict; docs shorter than the probe report 0 with
    ``probed = 0``). Blocking is exact — a token-aligned occurrence of
    the probe implies the container carries the probe's leading gram —
    and every candidate pair pays the padded-substring check before it
    counts.

    Dataflow: TWO keyed exchanges (gram key → candidate pairs with the
    probe string already attached; candidate doc → verify against the
    marker row carrying its normalized text) plus one counting groupby.
    Under ``exchange_max_rows`` each exchange runs as the direct-task
    M×R exchange (``stages/exchange.py``) with the vectorized
    multi-group kernels above; above the gate the same kernels run
    per-group under ``groupby().map_groups`` — the unconditionally
    scalable shape (both paths are forced in tests). Dataset joins are
    deliberately avoided: the pair side is sparse and Ray 2.49's
    hash-join aggregator cannot finalize a partition that received
    only empty bundles."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from ..rayutil import parquet_num_rows
    from ..stages.exchange import exchange_reduce

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_containers", pa.int64()),
                            ("contained", pa.int64()),
                            ("probed", pa.int64())])
    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(out_schema.empty_table())

    del num_partitions               # exchanges size themselves
    docs = _read_docs(sf_dir)
    meta = docs.map_batches(_norm_and_probe,
                            batch_format="pyarrow").materialize()

    def _keyed(ds, key, kernel, schema):
        n = ds.count()
        if n <= exchange_max_rows:
            return exchange_reduce(ds, key, kernel, schema)

        def norm(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or schema.names[0] not in t.column_names:
                return schema.empty_table()
            return t.select(schema.names).cast(schema)

        return (ds.groupby(key).map_groups(kernel,
                                           batch_format="pyarrow")
                .map_batches(norm, batch_format="pyarrow"))

    gram_rows = docs.map_batches(containment_gram_rows,
                                 batch_format="pyarrow").materialize()
    pairs = _keyed(gram_rows, "g", _pair_kernel, PAIR_SCHEMA)

    norm_rows = meta.map_batches(
        lambda t: pa.table({
            "key2": t["doc_id"],
            "probe_doc": pa.nulls(t.num_rows, pa.int64()),
            "probe": pa.nulls(t.num_rows, pa.string()),
            "norm": t["norm"],
            "is_norm": pa.array([1] * t.num_rows, pa.int64())}),
        batch_format="pyarrow")
    pair_rows = pairs.map_batches(
        lambda t: pa.table({
            "key2": t["key2"],
            "probe_doc": t["probe_doc"],
            "probe": t["probe"],
            "norm": pa.nulls(t.num_rows, pa.string()),
            "is_norm": pa.array([0] * t.num_rows, pa.int64())}),
        batch_format="pyarrow")
    both = norm_rows.union(pair_rows).materialize()
    hits = _keyed(both, "key2", _verify_kernel, HIT_SCHEMA)

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
