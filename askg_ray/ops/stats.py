"""Statistical / corpus-analysis aggregates: fixed-width histogram,
exact regression sufficient statistics, token document-frequency,
cross-language token overlap, and a two-pass n-gram-LM novelty score.

All of these are map-side-partial shapes: the per-batch kernel shrinks
one-row-per-event/token-occurrence inputs to one-row-per-(batch,
group) partials before the (small) groupby — the only all-to-all any
of them performs is over the already-aggregated key space. Money and
scores are exact integers (same np.rint cents convention as
ops/relational.py) so the driver's value-hash cannot drift on float
order.
"""

from __future__ import annotations

import collections

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Fixed-width histogram (binning)

BIN_WIDTH = 25


def events_value_histogram(sf_dir: str, width: int = BIN_WIDTH):
    """Fixed-width binning of ``value``: per bin the event count and
    the exact cents sum. The per-batch kernel bincounts locally, so the
    groupby input is ≤ (batches × distinct bins) rows — at 100 TB the
    shuffle moves a few dozen rows per block regardless of row count.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        cents = np.rint(v * 100).astype(np.int64)
        bins = (np.floor(v / width)).astype(np.int64)
        uniq, inv = np.unique(bins, return_inverse=True)
        return pa.table({
            "bin": pa.array(uniq, pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_cents": pa.array(np.bincount(inv, weights=cents)
                                  .astype(np.int64)),
        })

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("bin")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("sum_cents", alias_name="sum_cents")))


HISTOGRAM_ORACLE_SQL = f"""
SELECT CAST(floor(value / {BIN_WIDTH}) AS BIGINT) AS bin,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1
""".strip()


# ---------------------------------------------------------------------------
# Regression / correlation sufficient statistics (exact integers)


def lineitem_regression(sf_dir: str):
    """Per-returnflag sufficient statistics for a quantity→price
    regression: n, Σx, Σx², Σy, Σxy with x = l_quantity (integral in
    TPC-H) and y = price cents. Everything downstream of these five
    sums (slope, intercept, Pearson r) is driver-side O(groups)
    arithmetic — the distributed part never touches a float
    accumulator. Σxy bound: qty ≤ 50 × price ≤ 10⁷ cents × 6M rows/SF
    ≈ 3·10¹⁵/SF — document the int64 headroom (overflows ~SF 3000;
    switch y to dollar units above that).
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def partial(t: pa.Table) -> pa.Table:
        x = np.rint(t["l_quantity"].to_numpy(zero_copy_only=False)) \
            .astype(np.int64)
        y = np.rint(t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * 100).astype(np.int64)
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(flags, return_inverse=True)
        def s(w):
            return pa.array(np.bincount(inv, weights=w).astype(np.int64))
        return pa.table({
            "l_returnflag": pa.array(uniq, pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_x": s(x), "sum_x2": s(x * x),
            "sum_y": s(y), "sum_xy": s(x * y),
        })

    return (li.map_batches(partial, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(*[Sum(c, alias_name=c)
                         for c in ["n", "sum_x", "sum_x2", "sum_y", "sum_xy"]]))


REGRESSION_ORACLE_SQL = """
SELECT l_returnflag,
       count(*) AS n,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_x,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)
                * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_x2,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_y,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)
                * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_xy
FROM lineitem GROUP BY l_returnflag
""".strip()


# ---------------------------------------------------------------------------
# Token document frequency (distinct-doc counts, stopword identification)

DF_TOPK = 100


def _topk_table(ds, sort_keys, k: int, out_schema: pa.Schema):
    """Per-block top-k then one bounded driver merge (≤ k rows per
    block cross the wire; no all-to-all sort of the aggregate table).
    Same shape as ops/similarity._topk_merge, generalized."""
    import ray.data as rd

    def block_topk(t: pa.Table) -> pa.Table:
        return t.take(pc.sort_indices(t, sort_keys=sort_keys)[:k])

    heads = list(ds.map_batches(block_topk, batch_format="pyarrow")
                 .iter_batches(batch_format="pyarrow"))
    heads = [pa.table(h) for h in heads if h.num_rows]
    if not heads:
        return rd.from_arrow(out_schema.empty_table())
    merged = pa.concat_tables(heads, promote_options="default")
    merged = merged.take(pc.sort_indices(merged, sort_keys=sort_keys)[:k])
    return rd.from_arrow(merged.cast(out_schema))


def token_doc_freq(sf_dir: str, k: int = DF_TOPK):
    """Top-k tokens by DOCUMENT frequency (distinct docs containing the
    token — the stopword/IDF statistic; token_freq counts occurrences).
    Because one row = one whole document, per-batch ``np.unique`` per
    doc makes the (token, batch-df) partial exact — no global distinct
    needed, the groupby sums partial dfs. Top-k via per-block heads +
    one bounded merge, not a vocab-wide sort."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for text in t["text"].to_pylist():
            c.update(set((text or "").split(" ")))
        if not c:
            return pa.table({"token": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        ks, vs = zip(*c.items())
        return pa.table({"token": pa.array(list(ks), pa.string()),
                         "df": pa.array(list(vs), pa.int64())})

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby("token").aggregate(Sum("df", alias_name="df")))
    return _topk_table(agg,
                       [("df", "descending"), ("token", "ascending")], k,
                       pa.schema([("token", pa.string()),
                                  ("df", pa.int64())]))


DOC_FREQ_ORACLE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents)
SELECT token, count(*) AS df
FROM tok GROUP BY token
ORDER BY df DESC, token LIMIT {DF_TOPK}
""".strip()


# ---------------------------------------------------------------------------
# Cross-language token overlap (distributed set intersection)

OVERLAP_LANGS = ("en", "fr")
OVERLAP_TOPK = 50


def token_lang_overlap(sf_dir: str, k: int = OVERLAP_TOPK):
    """Tokens that occur in BOTH English and French documents — a
    distributed set intersection, expressed as a wide partial (one
    occurrence-count column per language) + groupby sum + both-positive
    filter. Top-k by combined count with a pinned token tie-break."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    la, lb = OVERLAP_LANGS
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["lang"], value_set=pa.array(OVERLAP_LANGS)))
        cnt: dict[str, list[int]] = {}
        for text, lang in zip(t["text"].to_pylist(), t["lang"].to_pylist()):
            col = 0 if lang == la else 1
            for w in (text or "").split(" "):
                e = cnt.get(w)
                if e is None:
                    cnt[w] = e = [0, 0]
                e[col] += 1
        toks = list(cnt)
        return pa.table({
            "token": pa.array(toks, pa.string()),
            f"n_{la}": pa.array([cnt[w][0] for w in toks], pa.int64()),
            f"n_{lb}": pa.array([cnt[w][1] for w in toks], pa.int64()),
        })

    agg = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby("token")
           .aggregate(Sum(f"n_{la}", alias_name=f"n_{la}"),
                      Sum(f"n_{lb}", alias_name=f"n_{lb}")))

    def add_total(t: pa.Table) -> pa.Table:
        both = pc.and_(pc.greater(t[f"n_{la}"], 0),
                       pc.greater(t[f"n_{lb}"], 0))
        t = t.filter(both)
        return t.append_column(
            "n_total", pc.add(t[f"n_{la}"], t[f"n_{lb}"]).cast(pa.int64()))

    ranked = agg.map_batches(add_total, batch_format="pyarrow")
    return _topk_table(ranked,
                       [("n_total", "descending"), ("token", "ascending")], k,
                       pa.schema([("token", pa.string()),
                                  (f"n_{la}", pa.int64()),
                                  (f"n_{lb}", pa.int64()),
                                  ("n_total", pa.int64())]))


LANG_OVERLAP_ORACLE_SQL = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE lang IN ('{OVERLAP_LANGS[0]}', '{OVERLAP_LANGS[1]}')),
a AS (
  SELECT token,
         sum(CASE WHEN lang = '{OVERLAP_LANGS[0]}' THEN 1 ELSE 0 END)
             AS n_{OVERLAP_LANGS[0]},
         sum(CASE WHEN lang = '{OVERLAP_LANGS[1]}' THEN 1 ELSE 0 END)
             AS n_{OVERLAP_LANGS[1]}
  FROM tok GROUP BY token)
SELECT token, CAST(n_{OVERLAP_LANGS[0]} AS BIGINT) AS n_{OVERLAP_LANGS[0]},
       CAST(n_{OVERLAP_LANGS[1]} AS BIGINT) AS n_{OVERLAP_LANGS[1]},
       CAST(n_{OVERLAP_LANGS[0]} + n_{OVERLAP_LANGS[1]} AS BIGINT) AS n_total
FROM a WHERE n_{OVERLAP_LANGS[0]} > 0 AND n_{OVERLAP_LANGS[1]} > 0
ORDER BY n_total DESC, token LIMIT {OVERLAP_TOPK}
""".strip()


# ---------------------------------------------------------------------------
# Two-pass bigram-LM novelty score (train on the corpus, score each doc)

NOVELTY_MIN_COUNT = 3


def doc_bigram_novelty(sf_dir: str, min_count: int = NOVELTY_MIN_COUNT):
    """Language-model-style novelty: pass 1 'trains' the model (corpus
    bigram occurrence counts; the vocabulary is every bigram seen
    ≥ ``min_count`` times), pass 2 scores each document by how many of
    its bigram occurrences are OUT of vocabulary (novelty in basis
    points, integer math end-to-end).

    Distributed shape: the vocabulary is never broadcast OR joined —
    docs explode once into thin (md5-bigram, doc_id, count) rows, and
    whether a bigram is in-vocabulary is decided INSIDE its own
    groupby(g) group (the group holds every occurrence, so the corpus
    total is local — same single-shuffle membership trick as
    ops/curation.decontaminate). A second groupby(doc_id) sums the
    per-gram verdicts back to one row per doc. Two key shuffles over
    thin rows, zero driver state, no join to feed empty partitions at
    small scale or to re-partition at 100 TB.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def bigram_rows(t: pa.Table) -> pa.Table:
        import hashlib
        out_g, out_d, out_c = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = (text or "").split(" ")
            if len(ws) < 2:
                # bigram-less doc: zero-count sentinel keeps the doc in
                # the output (scored 0/0/0, mirroring the oracle's
                # UNION ALL branch); total 0 can never enter the vocab
                out_g.append("-")
                out_d.append(did)
                out_c.append(0)
                continue
            c = collections.Counter(
                ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1))
            for g, n in c.items():
                out_g.append(hashlib.md5(g.encode()).hexdigest())
                out_d.append(did)
                out_c.append(n)
        return pa.table({"g": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "cnt": pa.array(out_c, pa.int64())})

    grams = docs.map_batches(bigram_rows, batch_format="pyarrow")

    def per_gram(group: pa.Table) -> pa.Table:
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        known = 1 if int(cnt.sum()) >= min_count else 0
        return pa.table({
            "doc_id": group["doc_id"],
            "n_bigrams": group["cnt"],
            "n_known": pa.array(cnt * known, pa.int64()),
        })

    per_doc = (grams.groupby("g")
               .map_groups(per_gram, batch_format="pyarrow")
               .groupby("doc_id")
               .aggregate(Sum("n_bigrams", alias_name="n_bigrams"),
                          Sum("n_known", alias_name="n_known")))

    def score(t: pa.Table) -> pa.Table:
        nb = t["n_bigrams"].to_numpy(zero_copy_only=False)
        nk = t["n_known"].to_numpy(zero_copy_only=False)
        bp = np.where(nb > 0, (nb - nk) * 10_000 // np.maximum(nb, 1), 0)
        return t.append_column("novelty_bp", pa.array(bp.astype(np.int64)))

    return per_doc.map_batches(score, batch_format="pyarrow")


def doc_lm_score(sf_dir: str):
    """Conditional-probability bigram-LM scoring — the normalized
    sibling of ``doc_bigram_novelty``: pass 1 'trains' the model
    (corpus counts c(w1,w2) and the prefix totals c(w1·)), pass 2
    scores each document by Σ over its bigram occurrences of
    ⌊c(w1,w2)·10⁶ / c(w1·)⌋ — an integer perplexity proxy (high =
    made of predictable transitions, low = unusual text). Integer
    math end-to-end so the DuckDB oracle hash-matches bit-exactly.

    Distributed shape: ONE groupby keyed on the md5 of the PREFIX
    token delivers both counts locally — a prefix group holds every
    corpus occurrence of every bigram starting with w1, so c(w1·) is
    the group's total and each c(w1,w2) a subtotal (np.unique inverse;
    no join, no broadcast vocabulary). A second groupby(doc_id) sums
    the per-occurrence scores back to one row per doc. Skew note: the
    hottest prefix ("the") owns a group sized O(distinct (w2, doc)
    under it) — per-batch Counter pre-shrink bounds it by docs×vocab,
    and at extreme scale the prefix key can be salted by w2's first
    md5 nibble with c(w1·) carried via a 16-way subtotal exchange;
    this corpus is far below that threshold.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def bigram_rows(t: pa.Table) -> pa.Table:
        import hashlib
        out_p, out_g, out_d, out_c = [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = (text or "").split(" ")
            if len(ws) < 2:
                # bigram-less doc: zero-count sentinel keeps the doc in
                # the output (scored 0/0, mirroring the oracle's
                # UNION ALL branch); the shared "-" group is all-zero
                out_p.append("-")
                out_g.append("-")
                out_d.append(did)
                out_c.append(0)
                continue
            c = collections.Counter(
                ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1))
            for g, n in c.items():
                w1 = g.split(" ", 1)[0]
                out_p.append(hashlib.md5(w1.encode()).hexdigest())
                out_g.append(hashlib.md5(g.encode()).hexdigest())
                out_d.append(did)
                out_c.append(n)
        return pa.table({"p": pa.array(out_p, pa.string()),
                         "g": pa.array(out_g, pa.string()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "cnt": pa.array(out_c, pa.int64())})

    grams = docs.map_batches(bigram_rows, batch_format="pyarrow")

    def per_prefix(group: pa.Table) -> pa.Table:
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        np_total = int(cnt.sum())
        if np_total == 0:            # the bigram-less sentinel group
            zero = pa.array(np.zeros(group.num_rows, np.int64))
            return pa.table({"doc_id": group["doc_id"],
                             "n_bigrams": zero, "score": zero})
        _, inv = np.unique(np.asarray(group["g"].to_pylist(), dtype=object),
                           return_inverse=True)
        nb = np.bincount(inv, weights=cnt).astype(np.int64)[inv]
        per_occ = (nb * 1_000_000) // np_total
        return pa.table({
            "doc_id": group["doc_id"],
            "n_bigrams": group["cnt"],
            "score": pa.array(cnt * per_occ, pa.int64()),
        })

    return (grams.groupby("p")
            .map_groups(per_prefix, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n_bigrams", alias_name="n_bigrams"),
                       Sum("score", alias_name="lm_score_micro")))


LM_SCORE_ORACLE_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
                         FOR i IN range(1, len(ws))]) AS g
  FROM w),
cb AS (SELECT g, count(*) AS nb FROM bg GROUP BY g),
cp AS (SELECT string_split(g, ' ')[1] AS w1, sum(nb) AS np
       FROM cb GROUP BY 1)
SELECT bg.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum((cb.nb * 1000000) // cp.np) AS BIGINT) AS lm_score_micro
FROM bg JOIN cb USING (g)
JOIN cp ON string_split(bg.g, ' ')[1] = cp.w1
GROUP BY bg.doc_id
UNION ALL
SELECT doc_id, 0, 0 FROM w WHERE len(ws) < 2
""".strip()


NOVELTY_ORACLE_SQL = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bg AS (
  SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1]
                         FOR i IN range(1, len(ws))]) AS g
  FROM w),
vocab AS (
  SELECT g FROM bg GROUP BY g HAVING count(*) >= {NOVELTY_MIN_COUNT}),
per AS (
  SELECT bg.doc_id,
         count(*) AS n_bigrams,
         sum(CASE WHEN v.g IS NULL THEN 0 ELSE 1 END) AS n_known
  FROM bg LEFT JOIN vocab v USING (g) GROUP BY bg.doc_id)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(n_known AS BIGINT) AS n_known,
       CAST((n_bigrams - n_known) * 10000 // n_bigrams AS BIGINT)
           AS novelty_bp
FROM per WHERE n_bigrams > 0
UNION ALL
SELECT doc_id, 0, 0, 0 FROM w WHERE len(ws) < 2
""".strip()


# ---------------------------------------------------------------------------
# Stratified deterministic sampling (per-group rates)

STRATA_RATES = {"en": 10}     # pct per lang; everything else:
STRATA_DEFAULT_PCT = 30


def docs_stratified_sample(sf_dir: str):
    """Per-language sampling rates (downsample the dominant language,
    keep more of the rest — the class-rebalancing read): same
    content-addressed md5 bucket as ops/curation.doc_sample, but the
    threshold varies by the row's stratum. Map-only, no RNG state, the
    same slice on any cluster size or block layout."""
    import hashlib

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "source"])

    def pick(t: pa.Table) -> pa.Table:
        langs = t["lang"].to_pylist()
        keep = [
            int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16) % 100
            < STRATA_RATES.get(lang, STRATA_DEFAULT_PCT)
            for d, lang in zip(t["doc_id"].to_pylist(), langs)]
        return t.filter(pa.array(keep, pa.bool_()))

    return docs.map_batches(pick, batch_format="pyarrow")


STRATIFIED_ORACLE_SQL = f"""
SELECT doc_id, lang, source FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 100 < (CASE WHEN lang = 'en' THEN {STRATA_RATES['en']}
               ELSE {STRATA_DEFAULT_PCT} END)
""".strip()


# ---------------------------------------------------------------------------
# Exact integer sigma-clipping (grouped z-score outlier filter)


def events_value_outliers(sf_dir: str):
    """Flag events whose value sits more than 2σ from their event_type's
    mean — the sigma-clip every metrics/quality pipeline runs — in
    EXACT integer arithmetic so the driver hash cannot drift: the
    predicate |v − s/n| > 2σ cross-multiplies to (n·v − s)² > 4(n·ss −
    s²), which the driver solves ONCE per type with Python bigints
    (``isqrt``) into two integer thresholds; the per-batch filter is
    then a pure int64 comparison. Moments come from per-batch partials
    (3 ints per (batch, type)), so the only shuffle is over the tiny
    type vocabulary. int64 bound: ss ≤ 9.2e18 holds to ~1e9 events at
    value ≤ $30k; beyond that widen the ss partial to two lanes.
    """
    import ray
    import ray.data as rd
    from math import isqrt
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "event_type",
                                  "value"])

    def moments(t: pa.Table) -> pa.Table:
        vc = np.rint(t["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(types, return_inverse=True)
        return pa.table({
            "event_type": pa.array(uniq, pa.string()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=vc).astype(np.int64)),
            "ss": pa.array(np.bincount(inv, weights=vc * vc)
                           .astype(np.int64)),
        })

    mom = (ev.map_batches(moments, batch_format="pyarrow")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                      Sum("ss", alias_name="ss"))
           .to_pandas())
    # exact integer thresholds: flag iff n·v − s ≥ r+1 or ≤ −(r+1),
    # r = isqrt(4(n·ss − s²)) — i.e. v ≥ ceil((s+r+1)/n) or
    # v ≤ floor((s−r−1)/n). Python bigints: no intermediate overflow.
    bounds = {}
    for _, row in mom.iterrows():
        n, s, ss = int(row["n"]), int(row["s"]), int(row["ss"])
        r = isqrt(4 * (n * ss - s * s))
        bounds[row["event_type"]] = (-(-(s + r + 1) // n),  # hi: ceil
                                     (s - r - 1) // n)      # lo: floor
    bounds_ref = ray.put(bounds)

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("event_type", pa.string()),
                            ("value_cents", pa.int64())])

    def clip(t: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        vc = np.rint(t["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(types, return_inverse=True)
        hi = np.array([b[u][0] for u in uniq], np.int64)[inv]
        lo = np.array([b[u][1] for u in uniq], np.int64)[inv]
        keep = (vc >= hi) | (vc <= lo)
        t = t.filter(pa.array(keep))
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "user_id": t["user_id"].cast(pa.int64()),
            "event_type": t["event_type"],
            "value_cents": pa.array(vc[keep], pa.int64()),
        }, schema=out_schema)

    return ev.map_batches(clip, batch_format="pyarrow")


OUTLIERS_ORACLE_SQL = """
WITH v AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
m AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         CAST(sum(vc) AS HUGEINT) AS s,
         CAST(sum(CAST(vc AS HUGEINT) * vc) AS HUGEINT) AS ss
  FROM v GROUP BY event_type)
SELECT v.event_id, v.user_id, v.event_type, v.vc AS value_cents
FROM v JOIN m USING (event_type)
WHERE (n * v.vc - s) * (n * v.vc - s) > 4 * (n * ss - s * s)
""".strip()


# ---------------------------------------------------------------------------
# Per-user event-type co-occurrence (association counts)


def events_type_cooccurrence(sf_dir: str):
    """How many users exhibit each unordered PAIR of event types — the
    co-occurrence/association count (market-basket shape, same math as
    token co-occurrence over documents). Per-batch local distinct
    shrinks the exchange to (user, type) pairs, one groupby(user)
    emits the user's C(k,2) pairs (k ≤ the fixed type vocabulary, so
    per-group output is bounded), and per-batch partial counts shrink
    the final pair groupby to the vocabulary-squared key space.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.group_by(["user_id", "event_type"]).aggregate([])

    dist = (ev.map_batches(local_distinct, batch_format="pyarrow")
            .groupby(["user_id", "event_type"])
            .aggregate(Count(alias_name="__c")))

    pair_schema = pa.schema([("type_a", pa.string()),
                             ("type_b", pa.string()),
                             ("n", pa.int64())])

    def pairs(g: pa.Table) -> pa.Table:
        ts = sorted(set(g["event_type"].to_pylist()))
        a, b = [], []
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                a.append(ts[i])
                b.append(ts[j])
        return pa.table({"type_a": pa.array(a, pa.string()),
                         "type_b": pa.array(b, pa.string()),
                         "n": pa.array(np.ones(len(a), np.int64))},
                        schema=pair_schema)

    def partial_count(t: pa.Table) -> pa.Table:
        g = (t.group_by(["type_a", "type_b"]).aggregate([("n", "sum")]))
        return g.rename_columns(["type_a", "type_b", "n"])

    return (dist.groupby("user_id").map_groups(pairs,
                                               batch_format="pyarrow")
            .map_batches(partial_count, batch_format="pyarrow")
            .groupby(["type_a", "type_b"])
            .aggregate(Sum("n", alias_name="n_users")))


COOCCURRENCE_ORACLE_SQL = """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*) AS n_users
FROM d a JOIN d b
  ON a.user_id = b.user_id AND a.event_type < b.event_type
GROUP BY 1, 2
""".strip()


# ---------------------------------------------------------------------------
# Grouped exact order statistics (median / p90 by discrete index)


def events_type_median(sf_dir: str):
    """Exact per-type median and p90 of value, as ORDER STATISTICS at
    integer indices (lower median = sorted[(n−1)//2], p90 =
    sorted[9(n−1)//10]) — no float quantile convention to drift from
    the oracle. Shape: per-batch (type, cents)→count partials bound
    the exchange by type × distinct cent values (value domains are
    finite in cents), then one groupby(type) kernel cumsums the counts
    and reads both indices off a searchsorted — the full value list is
    never shuffled or held anywhere.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        vc = np.rint(t["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        types = t["event_type"].to_numpy(zero_copy_only=False)
        key = np.char.add(np.char.add(types.astype(str), "\x00"),
                          vc.astype(str))
        uniq, first, inv = np.unique(key, return_index=True,
                                     return_inverse=True)
        return pa.table({
            "event_type": pa.array(types[first], pa.string()),
            "vc": pa.array(vc[first], pa.int64()),
            "n": pa.array(np.bincount(inv).astype(np.int64)),
        })

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()),
                            ("median_cents", pa.int64()),
                            ("p90_cents", pa.int64())])

    def order_stats(g: pa.Table) -> pa.Table:
        vc = g["vc"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(vc)
        vc, n = vc[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        idx = np.array([(total - 1) // 2, 9 * (total - 1) // 10])
        picked = vc[np.searchsorted(cum, idx, side="right")]
        return pa.table({
            "event_type": g["event_type"].slice(0, 1),
            "n": pa.array([total], pa.int64()),
            "median_cents": pa.array([picked[0]], pa.int64()),
            "p90_cents": pa.array([picked[1]], pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .map_groups(order_stats, batch_format="pyarrow"))


TYPE_MEDIAN_ORACLE_SQL = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
r AS (
  SELECT event_type, vc,
         row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v)
SELECT event_type, n,
       max(CASE WHEN rn = (n - 1) // 2 + 1 THEN vc END) AS median_cents,
       max(CASE WHEN rn = 9 * (n - 1) // 10 + 1 THEN vc END) AS p90_cents
FROM r GROUP BY event_type, n
""".strip()


# ---------------------------------------------------------------------------
# HyperLogLog register sketch (approximate distinct users)

HLL_P = 8                      # 2^p = 256 registers


def events_user_hll(sf_dir: str):
    """HyperLogLog register table for distinct-user counting — the
    sketch that makes COUNT(DISTINCT) a near-free aggregate at 100 TB:
    each batch collapses to ≤256 (register, rho) partials (max-combine,
    so re-aggregation is associative at any tree depth / cluster
    width), and the full-corpus sketch is ONE tiny groupby-Max. The
    registers themselves are deterministic integers (md5-derived), so
    unlike the float estimate they hash-match a SQL oracle exactly;
    the estimator is a reader-side formula over the 256 rows (see
    tests/test_ops_batch2.py, which checks it lands within 15% of the
    true distinct count).

    Hash contract (mirrors ops/curation.doc_split): 64-bit
    little-endian first-8-md5-bytes == DuckDB ``md5_number_upper``;
    register = low ``HLL_P`` bits, rho = leading-zero count of the
    remaining 56-bit window + 1.
    """
    import hashlib

    import ray.data as rd
    from ray.data.aggregate import Max

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    mask = (1 << HLL_P) - 1
    width = 64 - HLL_P

    def partial(t: pa.Table) -> pa.Table:
        uids = np.unique(t["user_id"].to_numpy(zero_copy_only=False))
        regs = np.empty(len(uids), np.int64)
        rhos = np.empty(len(uids), np.int64)
        for i, u in enumerate(uids):
            h = int.from_bytes(
                hashlib.md5(str(int(u)).encode()).digest()[:8], "little")
            regs[i] = h & mask
            rest = h >> HLL_P
            rhos[i] = width + 1 - rest.bit_length()
        # batch-local max-combine: ≤2^p rows leave the batch
        out_r = np.unique(regs)
        out_m = np.zeros(len(out_r), np.int64)
        np.maximum.at(out_m, np.searchsorted(out_r, regs), rhos)
        return pa.table({"register": pa.array(out_r),
                         "rho": pa.array(out_m)})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("register").aggregate(Max("rho", alias_name="max_rho")))


HLL_ORACLE_SQL = f"""
WITH h AS (SELECT md5_number_upper(CAST(user_id AS VARCHAR)) AS x
           FROM events),
r AS (SELECT CAST(x % {1 << HLL_P} AS BIGINT) AS register,
             CAST(CASE WHEN (x >> {HLL_P}) = 0 THEN {64 - HLL_P + 1}
                  ELSE {64 - HLL_P + 1} - length(bin(x >> {HLL_P}))
                  END AS BIGINT) AS rho
      FROM h)
SELECT register, CAST(max(rho) AS BIGINT) AS max_rho
FROM r GROUP BY register
""".strip()


# ---------------------------------------------------------------------------
# Count-Min-Sketch heavy hitters over the document token stream

CMS_D = 4                      # sketch depth (independent hash rows)
CMS_W = 1024                   # sketch width (buckets per row)
CMS_THRESHOLD = 500            # report tokens whose estimate >= this


def _cms_bucket(j: int, tok: str) -> int:
    import hashlib

    return int(hashlib.md5(f"{j}:{tok}".encode()).hexdigest()[:12],
               16) % CMS_W


def token_cms_topk(sf_dir: str, threshold: int = CMS_THRESHOLD):
    """Heavy hitters via a Count-Min sketch (Cormode & Muthukrishnan
    2005): per-batch token counts fold into D×W bucket partials
    (md5-derived row hashes), one tiny groupby merges them into the
    global sketch — a CONSTANT 4,096 counters however large the corpus,
    which is the whole point: the shuffle and the driver state are both
    O(D·W), not O(vocab) and never O(tokens). The sketch is broadcast
    once (``ray.put``) and the candidate vocabulary streams through a
    ``map_batches`` estimator (est = min over rows of the token's
    bucket counter; one-sided error, so every true heavy hitter
    survives the threshold). The DuckDB oracle rebuilds the identical
    sketch — same md5 bucket hash via hex-cast — so the estimates,
    collisions included, hash-match exactly.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        c = collections.Counter()
        for text in t["text"].to_pylist():
            c.update(w for w in (text or "").split(" ") if w)
        agg: dict = {}
        for tok, n in c.items():
            for j in range(CMS_D):
                k = (j, _cms_bucket(j, tok))
                agg[k] = agg.get(k, 0) + n
        ks = sorted(agg)
        return pa.table({
            "j": pa.array([k[0] for k in ks], pa.int64()),
            "b": pa.array([k[1] for k in ks], pa.int64()),
            "c": pa.array([agg[k] for k in ks], pa.int64())})

    sketch_rows = (docs.map_batches(partial, batch_format="pyarrow")
                   .groupby(["j", "b"])
                   .aggregate(Sum("c", alias_name="sc"))).take_all()
    sketch = {(r["j"], r["b"]): r["sc"] for r in sketch_rows}
    sketch_ref = ray.put(sketch)

    def tok_rows(t: pa.Table) -> pa.Table:
        toks = set()
        for text in t["text"].to_pylist():
            toks.update(w for w in (text or "").split(" ") if w)
        return pa.table({"token": pa.array(sorted(toks), pa.string())})

    cand = (docs.map_batches(tok_rows, batch_format="pyarrow")
            .groupby("token").aggregate(Count(alias_name="__n"))
            .select_columns(["token"]))

    def estimate(t: pa.Table) -> pa.Table:
        sk = ray.get(sketch_ref)
        toks, ests = [], []
        for tok in t["token"].to_pylist():
            est = min(sk.get((j, _cms_bucket(j, tok)), 0)
                      for j in range(CMS_D))
            if est >= threshold:
                toks.append(tok)
                ests.append(est)
        return pa.table({"token": pa.array(toks, pa.string()),
                         "est_count": pa.array(ests, pa.int64())})

    return cand.map_batches(estimate, batch_format="pyarrow")


CMS_ORACLE_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
           AS tok
  FROM documents),
cnt AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
js AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(j)),
tb AS (SELECT cnt.tok, cnt.c, js.j,
         ('0x' || substr(md5(CAST(js.j AS VARCHAR) || ':' || cnt.tok),
                         1, 12))::BIGINT % {CMS_W} AS b
       FROM cnt CROSS JOIN js),
sketch AS (SELECT j, b, sum(c) AS sc FROM tb GROUP BY j, b),
est AS (SELECT tb.tok, min(sketch.sc) AS est
        FROM tb JOIN sketch ON sketch.j = tb.j AND sketch.b = tb.b
        GROUP BY tb.tok)
SELECT tok AS token, CAST(est AS BIGINT) AS est_count
FROM est WHERE est >= {CMS_THRESHOLD}
""".strip()


# ---------------------------------------------------------------------------
# Semi-structured property extraction (JSON field -> grouped aggregate)

PROPS_FIELD = "k"


def events_props_stats(sf_dir: str):
    """Extract the integer ``k`` field out of the JSON ``props`` string
    and aggregate per event type (count, rows-with-k, sum, max). The
    extraction is ONE vectorized ``pc.extract_regex`` over the batch —
    no ``json.loads`` row loop — with the documented contract that
    ``props`` carries a flat integer field (the oracle uses the same
    regex via ``regexp_extract`` so malformed rows degrade identically:
    no match → excluded from sum/max, counted in ``n`` only; a group
    with no valid k reports max_k = -1 — an explicit sentinel rather
    than NULL, because a NULL BIGINT max renders as float NaN on the
    DuckDB side and None on the Arrow side and the driver's string
    hash would split on that). Per-batch partials shrink to one row
    per (type, batch) before the tiny groupby.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        ks = pc.extract_regex(
            t["props"].combine_chunks().cast(pa.string()),
            pattern=r'"' + PROPS_FIELD + r'":\s*(?P<v>\d+)').field("v")
        valid = pc.not_equal(ks, "").to_numpy(zero_copy_only=False)
        vals = np.zeros(len(valid), np.int64)
        lst = ks.to_pylist()
        vals[valid] = [int(x) for x, ok in zip(lst, valid) if ok]
        types = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(types, return_inverse=True)
        n = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        n_k = np.bincount(inv[valid], minlength=len(uniq)).astype(np.int64)
        sum_k = np.bincount(inv, weights=np.where(valid, vals, 0),
                            minlength=len(uniq)).astype(np.int64)
        max_k = np.full(len(uniq), -1, np.int64)
        np.maximum.at(max_k, inv[valid], vals[valid])
        return pa.table({
            "event_type": pa.array(uniq.tolist(), pa.string()),
            "n": pa.array(n, pa.int64()),
            "n_k": pa.array(n_k, pa.int64()),
            "sum_k": pa.array(sum_k, pa.int64()),
            "max_k": pa.array(max_k, pa.int64())})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n", alias_name="n"),
                       Sum("n_k", alias_name="n_k"),
                       Sum("sum_k", alias_name="sum_k"),
                       Max("max_k", alias_name="max_k")))


PROPS_ORACLE_SQL = f"""
WITH x AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"{PROPS_FIELD}":\\s*(\\d+)', 1)
                  AS BIGINT) AS k
  FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(k) AS BIGINT) AS n_k,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(coalesce(max(k), -1) AS BIGINT) AS max_k
FROM x GROUP BY event_type
""".strip()


# ---------------------------------------------------------------------------
# MODE per group (most frequent event_type per user, deterministic tie)


def events_mode_type(sf_dir: str):
    """Per-user modal event_type with a pinned tie-break (highest
    count, then lexicographically smallest type). Map-side combiner
    shape: each batch shrinks to (user, type) -> count partials via one
    Arrow group_by, so the exchange carries at most |users seen| x
    |type vocab| rows per batch, never events. The groupby(user)
    reduce re-sums partials and picks the argmax with one sort.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = (t.group_by(["user_id", "event_type"])
             .aggregate([([], "count_all")]))
        return pa.table({"user_id": g["user_id"].cast(pa.int64()),
                         "event_type": g["event_type"],
                         "n": g["count_all"].cast(pa.int64())})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("mode_type", pa.string()),
                            ("n_mode", pa.int64())])

    def reduce_user(t: pa.Table) -> pa.Table:
        g = (t.select(["user_id", "event_type", "n"])
             .group_by(["user_id", "event_type"]).aggregate([("n", "sum")]))
        top = g.take(pc.sort_indices(
            g, sort_keys=[("n_sum", "descending"),
                          ("event_type", "ascending")])[:1])
        return pa.table({
            "user_id": top["user_id"].cast(pa.int64()),
            "mode_type": top["event_type"],
            "n_mode": top["n_sum"].cast(pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").map_groups(reduce_user,
                                           batch_format="pyarrow"))


MODE_ORACLE_SQL = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2),
r AS (
  SELECT user_id, event_type, n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n DESC, event_type) AS rn
  FROM c)
SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n_mode
FROM r WHERE rn = 1
""".strip()


# ---------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences


def events_markov(sf_dir: str):
    """First-order Markov transition counts over each user's event
    sequence in (ts, event_id) order, plus the per-prev-type share in
    exact integer ppm. Two bounded exchanges: groupby(user) orders one
    user's events and emits (prev, next) -> count partials (at most
    |vocab|^2 rows per user, vocab is the event-type alphabet), then a
    groupby(prev_type) owns one row of the transition matrix and
    computes its shares — the matrix never exceeds |vocab|^2 rows, so
    both reduces are trivially small at any corpus size.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])

    mid_schema = pa.schema([("prev_type", pa.string()),
                            ("next_type", pa.string()),
                            ("n", pa.int64())])

    def per_user(t: pa.Table) -> pa.Table:
        ts = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
              .to_numpy(zero_copy_only=False))
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False)[order]
        if len(codes) < 2:
            return mid_schema.empty_table()
        k = len(enc.dictionary)
        pair = codes[:-1].astype(np.int64) * k + codes[1:]
        counts = np.bincount(pair, minlength=k * k)
        nz = np.flatnonzero(counts)
        names = enc.dictionary
        return pa.table({
            "prev_type": names.take(pa.array(nz // k, pa.int32())),
            "next_type": names.take(pa.array(nz % k, pa.int32())),
            "n": pa.array(counts[nz], pa.int64()),
        }, schema=mid_schema)

    out_schema = pa.schema([("prev_type", pa.string()),
                            ("next_type", pa.string()),
                            ("n", pa.int64()),
                            ("share_ppm", pa.int64())])

    def shares(t: pa.Table) -> pa.Table:
        g = (t.select(["prev_type", "next_type", "n"])
             .group_by(["prev_type", "next_type"]).aggregate([("n", "sum")]))
        n = g["n_sum"].to_numpy(zero_copy_only=False)
        total = n.sum()
        return pa.table({
            "prev_type": g["prev_type"],
            "next_type": g["next_type"],
            "n": pa.array(n, pa.int64()),
            "share_ppm": pa.array(n * 1_000_000 // total, pa.int64()),
        }, schema=out_schema)

    return (ev.groupby("user_id").map_groups(per_user,
                                             batch_format="pyarrow")
            .groupby("prev_type").map_groups(shares,
                                             batch_format="pyarrow"))


MARKOV_ORACLE_SQL = """
WITH s AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (
  SELECT event_type AS prev_type, nxt AS next_type, count(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
           AS share_ppm
FROM c
""".strip()


# ---------------------------------------------------------------------------
# Per-group HyperLogLog (distinct users per event_type)


def events_type_hll(sf_dir: str):
    """One HyperLogLog register table PER event_type — grouped
    COUNT(DISTINCT) as a mergeable sketch. Same hash contract as
    ``events_user_hll`` (64-bit little-endian first-8-md5-bytes ==
    DuckDB ``md5_number_upper``; register = low HLL_P bits, rho =
    leading-zero count + 1), but partials and the final max-combine
    are keyed by (event_type, register), so the exchange carries at
    most |vocab| x 256 rows per batch however many events stream
    through — the grouped-sketch shape that replaces a
    groupby-count-distinct shuffle of raw (type, user) pairs.
    """
    import hashlib

    import ray.data as rd
    from ray.data.aggregate import Max

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    mask = (1 << HLL_P) - 1
    width = 64 - HLL_P

    def partial(t: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(t["event_type"].combine_chunks())
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uids = t["user_id"].to_numpy(zero_copy_only=False)
        # distinct (type, user) within the batch before hashing
        tu = np.unique(np.stack([codes, uids], axis=1), axis=0)
        regs = np.empty(len(tu), np.int64)
        rhos = np.empty(len(tu), np.int64)
        for i, u in enumerate(tu[:, 1]):
            h = int.from_bytes(
                hashlib.md5(str(int(u)).encode()).digest()[:8], "little")
            regs[i] = h & mask
            rest = h >> HLL_P
            rhos[i] = width + 1 - rest.bit_length()
        # batch-local (type, register) max-combine
        key = tu[:, 0] * (mask + 1) + regs
        out_k = np.unique(key)
        out_m = np.zeros(len(out_k), np.int64)
        np.maximum.at(out_m, np.searchsorted(out_k, key), rhos)
        return pa.table({
            "event_type": enc.dictionary.take(
                pa.array(out_k // (mask + 1), pa.int32())),
            "register": pa.array(out_k % (mask + 1), pa.int64()),
            "rho": pa.array(out_m, pa.int64())})

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "register"])
            .aggregate(Max("rho", alias_name="max_rho")))


TYPE_HLL_ORACLE_SQL = f"""
WITH h AS (SELECT DISTINCT event_type,
                  md5_number_upper(CAST(user_id AS VARCHAR)) AS x
           FROM events),
r AS (SELECT event_type,
             CAST(x % {1 << HLL_P} AS BIGINT) AS register,
             CAST(CASE WHEN (x >> {HLL_P}) = 0 THEN {64 - HLL_P + 1}
                  ELSE {64 - HLL_P + 1} - length(bin(x >> {HLL_P}))
                  END AS BIGINT) AS rho
      FROM h)
SELECT event_type, register, CAST(max(rho) AS BIGINT) AS max_rho
FROM r GROUP BY event_type, register
""".strip()


# ---------------------------------------------------------------------------
# Order-independent table checksum (cross-snapshot validation primitive)

CHECKSUM_MOD = 1 << 36   # partial sums of <2^36 values stay exact in
                         # int64 for up to 2^27 batches


def documents_checksum(sf_dir: str):
    """One-row table fingerprint for cross-cluster / cross-snapshot
    validation: row count, id range, and an order-independent content
    checksum — the sum (mod 2^36) of a 64-bit md5 of each row's
    canonical serialization (``doc_id|md5(text)``). Commutative
    arithmetic means ANY partitioning, block order, or re-aggregation
    tree yields the identical value, so two clusters can compare
    tables by exchanging one row. Map-side partials (one row per
    batch) feed a constant-key reduce; the mod keeps every partial
    below 2^36 so int64 sums stay exact to 2^27 batches.
    """
    import hashlib

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    mid = pa.schema([("k", pa.int64()), ("n_rows", pa.int64()),
                     ("checksum", pa.int64()),
                     ("min_id", pa.int64()), ("max_id", pa.int64())])

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        total = 0
        for d, x in zip(ids, t["text"].to_pylist()):
            row = f"{int(d)}|{hashlib.md5((x or '').encode()).hexdigest()}"
            total += int.from_bytes(
                hashlib.md5(row.encode()).digest()[:8], "little")
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n_rows": pa.array([len(ids)], pa.int64()),
            "checksum": pa.array([total % CHECKSUM_MOD], pa.int64()),
            "min_id": pa.array([int(ids.min()) if len(ids) else 2**62],
                               pa.int64()),
            "max_id": pa.array([int(ids.max()) if len(ids) else -2**62],
                               pa.int64()),
        }, schema=mid)

    out_schema = pa.schema([("n_rows", pa.int64()), ("checksum", pa.int64()),
                            ("min_id", pa.int64()), ("max_id", pa.int64())])

    def reduce_all(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_rows": pa.array([pc.sum(t["n_rows"]).as_py()], pa.int64()),
            "checksum": pa.array(
                [pc.sum(t["checksum"]).as_py() % CHECKSUM_MOD], pa.int64()),
            "min_id": pa.array([pc.min(t["min_id"]).as_py()], pa.int64()),
            "max_id": pa.array([pc.max(t["max_id"]).as_py()], pa.int64()),
        }, schema=out_schema)

    return (docs.map_batches(partial, batch_format="pyarrow")
            .groupby("k").map_groups(reduce_all, batch_format="pyarrow"))


CHECKSUM_ORACLE_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(md5_number_upper(CAST(doc_id AS VARCHAR) || '|'
                                 || md5(coalesce(text, '')))
                % {CHECKSUM_MOD}) % {CHECKSUM_MOD} AS BIGINT) AS checksum,
       CAST(min(doc_id) AS BIGINT) AS min_id,
       CAST(max(doc_id) AS BIGINT) AS max_id
FROM documents
""".strip()


# ---------------------------------------------------------------------------
# collect_set: distinct event types per user as a sorted CSV


def events_types_csv(sf_dir: str):
    """Per-user DISTINCT event-type set rendered as a sorted
    comma-joined string plus its cardinality — the collect_set /
    array_agg(DISTINCT) shape, hash-stable because the join order is
    pinned. Per-batch distinct (user, type) partials bound the
    exchange at |users seen| x |vocab| rows per batch; the
    groupby(user) kernel re-distincts and joins <= vocab short
    strings."""
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        g = (t.group_by(["user_id", "event_type"])
             .aggregate([([], "count_all")]))
        return pa.table({"user_id": g["user_id"].cast(pa.int64()),
                         "event_type": g["event_type"]})

    out_schema = pa.schema([("user_id", pa.int64()),
                            ("types_csv", pa.string()),
                            ("n_types", pa.int64())])

    def reduce_user(t: pa.Table) -> pa.Table:
        types = sorted(set(t["event_type"].to_pylist()))
        return pa.table({
            "user_id": pa.array([t["user_id"][0].as_py()], pa.int64()),
            "types_csv": pa.array([",".join(types)], pa.string()),
            "n_types": pa.array([len(types)], pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("user_id").map_groups(reduce_user,
                                           batch_format="pyarrow"))


TYPES_CSV_ORACLE_SQL = """
SELECT user_id,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type)
           AS types_csv,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY user_id
""".strip()


# ---------------------------------------------------------------------------
# Join-key skew report (group-size histogram)


def events_key_skew(sf_dir: str):
    """Skew diagnostic for a prospective join/groupby key: the
    distribution of group sizes for user_id — (group_size, n_keys)
    rows, the report that tells you whether a key needs salting BEFORE
    you shuffle on it. Two shrinking exchanges: per-batch (user, n)
    partials -> groupby(user) sum -> per-batch size-histogram partials
    -> groupby(size) sum. The final key space is the distinct group
    sizes, never users or events."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return pa.table({"user_id": g["user_id"].cast(pa.int64()),
                         "n": g["count_all"].cast(pa.int64())})

    per_user = (ev.map_batches(partial, batch_format="pyarrow")
                .groupby("user_id").aggregate(Sum("n", alias_name="n")))

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (t.select(["n"]).group_by("n")
             .aggregate([([], "count_all")]))
        return pa.table({"group_size": g["n"].cast(pa.int64()),
                         "n_keys": g["count_all"].cast(pa.int64())})

    return (per_user.map_batches(hist_partial, batch_format="pyarrow")
            .groupby("group_size")
            .aggregate(Sum("n_keys", alias_name="n_keys")))


KEY_SKEW_ORACLE_SQL = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
SELECT n AS group_size, count(*) AS n_keys FROM c GROUP BY n
""".strip()


# ---------------------------------------------------------------------------
# JSON flatten (semi-structured props -> typed columns, per row)


def events_props_flatten(sf_dir: str):
    """Row-level JSON flatten of ``props`` into typed columns — the
    ETL sibling of the ``events_props_stats`` AGGREGATE: every event
    keeps its extracted integer field (-1 when absent/malformed, same
    sentinel convention) plus a 0/1 validity flag. Map-only — one
    vectorized ``extract_regex`` per batch, no exchange, streams at
    any scale.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "props"])

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("k", pa.int64()), ("has_k", pa.int64())])

    def flatten(t: pa.Table) -> pa.Table:
        ex = pc.struct_field(pc.extract_regex(
            pc.fill_null(t["props"], ""),
            pattern=r'"' + PROPS_FIELD + r'":\s*(?P<v>\d+)'), "v")
        k = pc.fill_null(pc.cast(ex, pa.int64()), -1)
        return pa.table({
            "event_id": t["event_id"].cast(pa.int64()),
            "k": k,
            "has_k": pc.cast(pc.greater_equal(k, 0), pa.int64()),
        }, schema=out_schema)

    return ev.map_batches(flatten, batch_format="pyarrow")


PROPS_FLATTEN_ORACLE_SQL = f"""
WITH x AS (
  SELECT event_id,
         TRY_CAST(regexp_extract(props, '"{PROPS_FIELD}":\\s*(\\d+)', 1)
                  AS BIGINT) AS kk
  FROM events)
SELECT event_id, CAST(coalesce(kk, -1) AS BIGINT) AS k,
       CAST(CASE WHEN kk IS NULL THEN 0 ELSE 1 END AS BIGINT) AS has_k
FROM x
""".strip()


# ---------------------------------------------------------------------------
# Exact Gini coefficient per group (histogram-based, no global sort)


def events_value_gini(sf_dir: str):
    """Per-type Gini inequality index over ``value``, as EXACT integer
    sufficient statistics: ``gini_num = Σ_i (2·rank_i − n − 1)·cents_i``
    (= Σ_{i,j} |c_i − c_j|, tie-order invariant) and the denominator
    parts (n, Σcents) — the consumer divides; no float ever forms, so
    the hash can't drift. Scale shape: cents are bounded-cardinality,
    so each batch shrinks to (type, cents) → count partials and the
    groupby(type) kernel computes the rank sum FROM THE HISTOGRAM —
    sorted distinct values with prefix sums of counts, never the event
    rows. A type with a billion events costs the kernel only its
    distinct-cents histogram.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100).astype(np.int64)
        g = (pa.table({"event_type": t["event_type"],
                       "cents": pa.array(cents)})
             .group_by(["event_type", "cents"])
             .aggregate([([], "count_all")]))
        return pa.table({"event_type": g["event_type"],
                         "cents": g["cents"],
                         "c": g["count_all"].cast(pa.int64())})

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()), ("sum_cents", pa.int64()),
                            ("gini_num", pa.int64())])

    def gini(g: pa.Table) -> pa.Table:
        h = (g.select(["event_type", "cents", "c"])
             .group_by(["event_type", "cents"]).aggregate([("c", "sum")]))
        h = h.take(pc.sort_indices(h, sort_keys=[("cents", "ascending")]))
        v = h["cents"].to_numpy(zero_copy_only=False)
        c = h["c_sum"].to_numpy(zero_copy_only=False)
        n = int(c.sum())
        # ranks of a value run occupy [start+1, start+c]; their rank sum
        # is c*start + c*(c+1)/2, so Σ(2·rank−n−1)·v telescopes to a
        # prefix-sum expression over the histogram
        start = np.concatenate([[0], np.cumsum(c)[:-1]])
        rank_sum = c * start + c * (c + 1) // 2
        gini_num = int(np.sum((2 * rank_sum - (n + 1) * c) * v))
        return pa.table({
            "event_type": pa.array([g["event_type"][0].as_py()]),
            "n": pa.array([n], pa.int64()),
            "sum_cents": pa.array([int(np.sum(c * v))], pa.int64()),
            "gini_num": pa.array([gini_num], pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(gini,
                                              batch_format="pyarrow"))


GINI_ORACLE_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT event_type, CAST(max(n) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       CAST(sum((2 * rn - n - 1) * cents) AS BIGINT) AS gini_num
FROM c GROUP BY event_type
""".strip()


# ---------------------------------------------------------------------------
# Exact median absolute deviation per group (robust dispersion)


def events_value_mad(sf_dir: str):
    """Per-type MEDIAN ABSOLUTE DEVIATION of value — the robust
    dispersion statistic (insensitive to the outliers the 2σ clip
    chases), exact to the cent with the same lower-median order-stat
    convention as ``events_type_median`` (sorted[(n−1)//2]). Both
    medians come off the (type, cents) HISTOGRAM inside one
    groupby(type) kernel: the value median by cumsum + searchsorted,
    then the deviation histogram is |v − med| with the SAME counts
    (re-sorted, equal deviations merged), so the second median costs
    another cumsum — the full value list is never shuffled or held.
    """
    import ray.data as rd

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        vc = np.rint(t["value"].to_numpy(zero_copy_only=False)
                     * 100).astype(np.int64)
        g = (pa.table({"event_type": t["event_type"],
                       "vc": pa.array(vc)})
             .group_by(["event_type", "vc"])
             .aggregate([([], "count_all")]))
        return pa.table({"event_type": g["event_type"], "vc": g["vc"],
                         "n": g["count_all"].cast(pa.int64())})

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()),
                            ("median_cents", pa.int64()),
                            ("mad_cents", pa.int64())])

    def mad(g: pa.Table) -> pa.Table:
        h = (g.select(["event_type", "vc", "n"])
             .group_by(["event_type", "vc"]).aggregate([("n", "sum")]))
        vc = h["vc"].to_numpy(zero_copy_only=False)
        n = h["n_sum"].to_numpy(zero_copy_only=False)
        order = np.argsort(vc)
        vc, n = vc[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        med = int(vc[np.searchsorted(cum, (total - 1) // 2,
                                     side="right")])
        # deviation histogram: same counts over |v - med|
        dev = np.abs(vc - med)
        dorder = np.argsort(dev, kind="stable")
        dev, dn = dev[dorder], n[dorder]
        dcum = np.cumsum(dn)
        mad_c = int(dev[np.searchsorted(dcum, (total - 1) // 2,
                                        side="right")])
        return pa.table({
            "event_type": h["event_type"].slice(0, 1),
            "n": pa.array([total], pa.int64()),
            "median_cents": pa.array([med], pa.int64()),
            "mad_cents": pa.array([mad_c], pa.int64()),
        }, schema=out_schema)

    return (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type").map_groups(mad,
                                              batch_format="pyarrow"))


MAD_ORACLE_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS vc
  FROM events),
m AS (
  SELECT event_type, vc,
         row_number() OVER (PARTITION BY event_type ORDER BY vc) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c),
med AS (
  SELECT event_type, vc AS median_cents, n
  FROM m WHERE rn = (n - 1) // 2 + 1),
d AS (
  SELECT c.event_type, abs(c.vc - med.median_cents) AS dev,
         med.median_cents, med.n
  FROM c JOIN med ON c.event_type = med.event_type),
dm AS (
  SELECT event_type, dev, median_cents, n,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn
  FROM d)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CAST(median_cents AS BIGINT) AS median_cents,
       CAST(dev AS BIGINT) AS mad_cents
FROM dm WHERE rn = (n - 1) // 2 + 1
""".strip()


# ---------------------------------------------------------------------------
# Exponentially time-decayed score per group (recsys popularity)

DECAY_SCALE_BITS = 20   # weight = 2^20 >> age_days (integer halving/day)


def events_decayed_score(sf_dir: str):
    """Per-type popularity under EXPONENTIAL TIME DECAY — every event
    contributes ``2^20 >> age_days`` (halving per day relative to the
    corpus's newest event), so the score is an exact integer and the
    whole 'decayed aggregate' is hash-checkable, unlike float e^-λt.
    Two-phase: per-batch (type, day) → count partials (the exchange is
    bounded by type × active days); the reference day is the max over
    a few per-batch maxima (driver holds ONE scalar); the final
    groupby(type) kernel folds counts × shifted weights. Events older
    than 20 days contribute exactly 0 — the integer decay has a hard
    horizon, which is precisely what a freshness score wants.
    """
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = (t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False)) // 86_400_000_000
        g = (pa.table({"event_type": t["event_type"],
                       "day": pa.array(day)})
             .group_by(["event_type", "day"])
             .aggregate([([], "count_all")]))
        return pa.table({"event_type": g["event_type"], "day": g["day"],
                         "n": g["count_all"].cast(pa.int64())})

    parts = (ev.map_batches(partial, batch_format="pyarrow")
             .materialize())
    ref_day = parts.aggregate(Max("day", alias_name="m"))["m"]

    out_schema = pa.schema([("event_type", pa.string()),
                            ("n", pa.int64()), ("score_u", pa.int64())])

    def fold(g: pa.Table) -> pa.Table:
        h = (g.select(["event_type", "day", "n"])
             .group_by(["event_type", "day"]).aggregate([("n", "sum")]))
        day = h["day"].to_numpy(zero_copy_only=False)
        n = h["n_sum"].to_numpy(zero_copy_only=False)
        age = np.minimum(ref_day - day, 63)
        w = (1 << DECAY_SCALE_BITS) >> age.astype(np.int64)
        return pa.table({
            "event_type": h["event_type"].slice(0, 1),
            "n": pa.array([int(n.sum())], pa.int64()),
            "score_u": pa.array([int((n * w).sum())], pa.int64()),
        }, schema=out_schema)

    return parts.groupby("event_type").map_groups(fold,
                                                  batch_format="pyarrow")


DECAYED_ORACLE_SQL = f"""
WITH d AS (
  SELECT event_type,
         epoch_us(date_trunc('day', ts)) // 86400000000 AS day
  FROM events),
r AS (SELECT max(day) AS ref FROM d)
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN ref - day >= {DECAY_SCALE_BITS + 1} THEN 0
                ELSE (1 << {DECAY_SCALE_BITS}) // (1 << (ref - day))
                END) AS BIGINT) AS score_u
FROM d, r GROUP BY event_type
""".strip()


# ---------------------------------------------------------------------------
# Simpson diversity / concentration index per user (exact rational)

def events_user_simpson(sf_dir: str):
    """Per-user event-type concentration as the EXACT rational Simpson
    index: num = Σc·(c−1), den = n·(n−1) (the probability two random
    events share a type, without replacement) — entropy's log makes it
    unhashable, Simpson stays in integers. Two chained groupbys, both
    map-side pre-aggregated: per-batch (user, type) counts shrink the
    first exchange; per-batch (Σc, Σc², types) partials shrink the
    second to one row per user per block. den = 0 for single-event
    users (index undefined; emitted as the raw integers, the reader
    divides)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def pair_partial(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": t["user_id"],
                       "event_type": t["event_type"]})
             .group_by(["user_id", "event_type"]).aggregate([([], "count_all")]))
        return pa.table({"user_id": g["user_id"],
                         "event_type": g["event_type"],
                         "c": g["count_all"].cast(pa.int64())})

    counts = (ev.map_batches(pair_partial, batch_format="pyarrow")
              .groupby(["user_id", "event_type"])
              .aggregate(Sum("c", alias_name="c")))

    def user_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return pa.schema([("user_id", pa.int64()), ("n", pa.int64()),
                              ("n_types", pa.int64()),
                              ("sum_c2", pa.int64())]).empty_table()
        u = t["user_id"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(u, return_inverse=True)
        return pa.table({
            "user_id": pa.array(uniq, pa.int64()),
            "n": pa.array(np.bincount(inv, weights=c).astype(np.int64)),
            "n_types": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_c2": pa.array(np.bincount(inv, weights=c * c)
                               .astype(np.int64))})

    agg = (counts.map_batches(user_partial, batch_format="pyarrow")
           .groupby("user_id")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("n_types", alias_name="n_types"),
                      Sum("sum_c2", alias_name="sum_c2")))

    def final(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False)
        c2 = t["sum_c2"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "n": pa.array(n, pa.int64()),
            "n_types": t["n_types"].cast(pa.int64()),
            "simpson_num": pa.array(c2 - n, pa.int64()),
            "simpson_den": pa.array(n * (n - 1), pa.int64())})

    return agg.map_batches(final, batch_format="pyarrow")


SIMPSON_ORACLE_SQL = """
WITH c AS (SELECT user_id, event_type, count(*) AS c
           FROM events GROUP BY 1, 2)
SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(c * c) - sum(c) AS BIGINT) AS simpson_num,
       CAST(sum(c) * (sum(c) - 1) AS BIGINT) AS simpson_den
FROM c GROUP BY user_id
""".strip()
