"""Training-data curation operators over the ``documents`` table.

Three large-corpus curation staples the reference lacks but a 100 TB
training-data pipeline needs, each with an exact DuckDB oracle:

  decontaminate   flag training docs sharing any 8-gram with a held-out
                  eval slice (doc_id % EVAL_MOD == 0) — the standard
                  benchmark-decontamination pass. Hash-partitioned
                  semi-join on the gram key: both sides explode to
                  (gram, doc_id, is_eval) rows, one groupby(gram)
                  co-locates them, contaminated train ids come out of
                  the group — no driver-side set, no broadcast of the
                  (potentially huge) eval n-gram set.
  pii_scrub       email/phone redaction with counts + a redacted-text
                  md5. The synthetic corpus has no natural PII, so the
                  op first plants a DETERMINISTIC contact trailer per
                  row (pure function of doc_id, mirrored in the SQL
                  oracle) — every row then exercises a real redaction.
  repetition      Gopher-style repetition filter: duplicate-bigram
                  fraction per doc, integer percent + verdict.

Tokenization contract matches ops/text.py: split on single spaces
(``text.split(' ')`` == DuckDB ``string_split(text, ' ')``).

Scale notes: the gram explode multiplies rows ~n_tokens per doc; grams
travel as md5 hex (16-byte key), never the raw text. At 100 TB the
groupby(gram) is one all-to-all keyed shuffle — the same shape (and the
same key) whether the eval side is 0.1% or 50% of the corpus. pii/
repetition are stateless map_batches — embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EVAL_MOD = 10          # doc_id % EVAL_MOD == 0 → held-out eval slice
DECON_N = 8            # n-gram width for contamination
REP_THRESHOLD = 5      # dup-bigram percent above which a doc is 'repetitive'

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
PHONE_RE = re.compile(r"\b\d{3}-\d{4}\b")
# RE2-compatible source strings for the DuckDB oracle (same patterns).
EMAIL_PAT = EMAIL_RE.pattern
PHONE_PAT = PHONE_RE.pattern


def _read_docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])


# ---- decontamination ------------------------------------------------------

def _gram_rows(batch: pa.Table, n: int, eval_mod: int) -> pa.Table:
    """Distinct n-grams per doc → (g=md5(gram), doc_id, is_eval) rows."""
    out_g, out_id, out_ev = [], [], []
    for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = (t or "").split(" ")
        grams = {" ".join(ws[i:i + n]) for i in range(max(0, len(ws) - n + 1))}
        ev = int(did) % eval_mod == 0
        for g in grams:
            out_g.append(hashlib.md5(g.encode()).hexdigest())
            out_id.append(int(did))
            out_ev.append(ev)
    return pa.table({
        "g": pa.array(out_g, pa.string()),
        "doc_id": pa.array(out_id, pa.int64()),
        "is_eval": pa.array(out_ev, pa.bool_()),
    })


def _contaminated_in_group(group: pa.Table) -> pa.Table:
    """All rows share one gram: emit each train doc_id once iff an eval
    doc also carries the gram (train ids are already distinct per gram
    — _gram_rows dedups within doc)."""
    ev = group["is_eval"].to_numpy(zero_copy_only=False)
    if not ev.any():
        return pa.table({"doc_id": pa.array([], pa.int64())})
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table({"doc_id": pa.array(ids[~ev], pa.int64())})


def decontaminate(sf_dir: str, n: int = DECON_N, eval_mod: int = EVAL_MOD):
    """Train docs sharing ≥1 n-gram with the eval slice → (doc_id,
    n_hit_grams = distinct shared grams). Oracle: SQL semi-join below."""
    grams = _read_docs(sf_dir).map_batches(
        lambda t: _gram_rows(t, n, eval_mod), batch_format="pyarrow")
    hits = grams.groupby("g").map_groups(_contaminated_in_group,
                                         batch_format="pyarrow")
    counts = hits.groupby("doc_id").count()
    return counts.map_batches(
        lambda t: t.rename_columns(["doc_id", "n_hit_grams"]),
        batch_format="pyarrow")


DECON_ORACLE_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text,' ') ws FROM documents),
grams AS (SELECT DISTINCT doc_id, array_to_string(list_slice(ws,i,i+{DECON_N - 1}),' ') g
          FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(ws)-{DECON_N - 1},0)+1)) i)),
ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % {EVAL_MOD} = 0)
SELECT g.doc_id, count(*) AS n_hit_grams
FROM grams g JOIN ev USING (g)
WHERE g.doc_id % {EVAL_MOD} <> 0
GROUP BY g.doc_id
""".strip()


# ---- PII scrub -------------------------------------------------------------

def _augment(doc_id: int, text: str) -> str:
    """Deterministic contact trailer (test fixture — the synthetic corpus
    has no natural PII). Mirrored verbatim in PII_ORACLE_SQL."""
    return (f"{text or ''} contact user{doc_id}@example.com phone "
            f"555-0{doc_id % 1000:03d}-{(doc_id * 7) % 10000:04d}")


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    n_em, n_ph, md5s = [], [], []
    for did, t in zip(ids, texts):
        aug = _augment(int(did), t)
        n_em.append(len(EMAIL_RE.findall(aug)))
        t1 = EMAIL_RE.sub("<EMAIL>", aug)
        n_ph.append(len(PHONE_RE.findall(t1)))
        t2 = PHONE_RE.sub("<PHONE>", t1)
        md5s.append(hashlib.md5(t2.encode()).hexdigest())
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_emails": pa.array(n_em, pa.int64()),
        "n_phones": pa.array(n_ph, pa.int64()),
        "redacted_md5": pa.array(md5s, pa.string()),
    })


def pii_scrub(sf_dir: str):
    return _read_docs(sf_dir).map_batches(pii_scrub_batch,
                                          batch_format="pyarrow")


PII_ORACLE_SQL = f"""
WITH aug AS (SELECT doc_id, text || ' contact user' || doc_id || '@example.com phone 555-0' ||
             lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-' ||
             lpad(((doc_id*7) % 10000)::VARCHAR, 4, '0') AS t FROM documents),
s1 AS (SELECT doc_id, len(regexp_extract_all(t, '{EMAIL_PAT}')) n_emails,
       regexp_replace(t, '{EMAIL_PAT}', '<EMAIL>', 'g') t1 FROM aug),
s2 AS (SELECT doc_id, n_emails, len(regexp_extract_all(t1, '{PHONE_PAT}')) n_phones,
       regexp_replace(t1, '{PHONE_PAT}', '<PHONE>', 'g') t2 FROM s1)
SELECT doc_id, n_emails, n_phones, md5(t2) AS redacted_md5 FROM s2
""".strip()


# ---- repetition filter -----------------------------------------------------

def repetition_batch(batch: pa.Table) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    n_g, n_d, pct, verdict = [], [], [], []
    for t in texts:
        ws = (t or "").split(" ")
        gs = [" ".join(ws[i:i + 2]) for i in range(max(0, len(ws) - 1))]
        n, nd = len(gs), len(set(gs))
        dp = ((n - nd) * 100) // n if n else 0
        n_g.append(n)
        n_d.append(nd)
        pct.append(dp)
        verdict.append("repetitive" if n and dp > REP_THRESHOLD else "ok")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_grams": pa.array(n_g, pa.int64()),
        "n_distinct_grams": pa.array(n_d, pa.int64()),
        "dup_pct": pa.array(pct, pa.int64()),
        "verdict": pa.array(verdict, pa.string()),
    })


def repetition(sf_dir: str):
    return _read_docs(sf_dir).map_batches(repetition_batch,
                                          batch_format="pyarrow")


REP_ORACLE_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text,' ') ws FROM documents),
g AS (SELECT doc_id, list_transform(range(1, greatest(len(ws)-1,0)+1),
      i -> array_to_string(list_slice(ws,i,i+1),' ')) gs FROM toks)
SELECT doc_id, len(gs) AS n_grams, len(list_distinct(gs)) AS n_distinct_grams,
       CASE WHEN len(gs) > 0 THEN ((len(gs)-len(list_distinct(gs)))*100)//len(gs) ELSE 0 END AS dup_pct,
       CASE WHEN len(gs) > 0 AND ((len(gs)-len(list_distinct(gs)))*100)//len(gs) > {REP_THRESHOLD}
            THEN 'repetitive' ELSE 'ok' END AS verdict
FROM g
""".strip()


# ---- deterministic train/val/test split ------------------------------------

SPLIT_MOD = 100        # hash buckets
SPLIT_TRAIN = 80       # bucket < 80 → train
SPLIT_VAL = 90         # 80 ≤ bucket < 90 → val; rest → test


def split_batch(batch: pa.Table) -> pa.Table:
    """Content-hash split: bucket = first-8-md5-bytes (little-endian,
    == DuckDB md5_number_upper) mod 100. Content-keyed, so exact
    duplicates always land in the same split (no train/test leakage
    from dups) and assignment is stable under repartition/re-runs."""
    ids = batch["doc_id"].to_pylist()
    buckets, splits = [], []
    for t in batch["text"].to_pylist():
        b = int.from_bytes(
            hashlib.md5((t or "").encode()).digest()[:8], "little") % SPLIT_MOD
        buckets.append(b)
        splits.append("train" if b < SPLIT_TRAIN
                      else "val" if b < SPLIT_VAL else "test")
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "bucket": pa.array(buckets, pa.int64()),
        "split": pa.array(splits, pa.string()),
    })


def doc_split(sf_dir: str):
    return _read_docs(sf_dir).map_batches(split_batch,
                                          batch_format="pyarrow")


SPLIT_ORACLE_SQL = f"""
WITH b AS (SELECT doc_id,
           CAST(md5_number_upper(coalesce(text,'')) % {SPLIT_MOD} AS BIGINT) AS bucket
           FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < {SPLIT_TRAIN} THEN 'train'
            WHEN bucket < {SPLIT_VAL} THEN 'val' ELSE 'test' END AS split
FROM b
""".strip()


# ---- fixed-size token chunking ---------------------------------------------

CHUNK_TOKENS = 64      # tokens per training chunk (no overlap)


def chunk_batch(batch: pa.Table) -> pa.Table:
    """Explode each doc into CHUNK_TOKENS-token windows (last partial
    window kept). Chunk text travels as md5 so the exploded rows stay
    small; at 100 TB this is a stateless map_batches explode — no
    shuffle, output shards inherit input partitioning."""
    out_id, out_idx, out_n, out_md5 = [], [], [], []
    for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = (t or "").split(" ")
        for i in range(0, len(ws), CHUNK_TOKENS):
            w = ws[i:i + CHUNK_TOKENS]
            out_id.append(int(did))
            out_idx.append(i // CHUNK_TOKENS)
            out_n.append(len(w))
            out_md5.append(hashlib.md5(" ".join(w).encode()).hexdigest())
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "chunk_idx": pa.array(out_idx, pa.int64()),
        "n_tokens": pa.array(out_n, pa.int64()),
        "chunk_md5": pa.array(out_md5, pa.string()),
    })


def doc_chunks(sf_dir: str):
    return _read_docs(sf_dir).map_batches(chunk_batch,
                                          batch_format="pyarrow")


CHUNK_ORACLE_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(coalesce(text,''),' ') ws FROM documents),
c AS (SELECT doc_id, unnest(
      [{{'chunk_idx': (i-1)//{CHUNK_TOKENS},
         'n_tokens': len(ws[i:i+{CHUNK_TOKENS - 1}]),
         'chunk_md5': md5(array_to_string(ws[i:i+{CHUNK_TOKENS - 1}],' '))}}
       FOR i IN range(1, len(ws)+1, {CHUNK_TOKENS})], recursive := true)
      FROM toks)
SELECT doc_id, chunk_idx, n_tokens, chunk_md5 FROM c
""".strip()


# ---- deterministic sampling -------------------------------------------------

SAMPLE_RATE_PCT = 10   # default held-out slice size


def sample_batch(batch: pa.Table, rate_pct: int) -> pa.Table:
    """Content-addressed Bernoulli filter: keep a row iff the first 8
    hex chars of md5(doc_id) mod 100 < rate_pct. No RNG state, no seed
    plumbing — the SAME slice falls out on any cluster size, block
    layout or re-run, which is what makes held-out carving reproducible
    at 100 TB (a map-only scan; dataset-level random_sample() would
    need a seed per block and re-deal on repartition)."""
    keep = [int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
            % 100 < rate_pct
            for d in batch["doc_id"].to_pylist()]
    return batch.filter(pa.array(keep, pa.bool_()))


def doc_sample(sf_dir: str, rate_pct: int = SAMPLE_RATE_PCT):
    """Deterministic ~rate_pct% document sample (uniform across sources
    because the hash is independent of the source column — the
    stratified read falls out of grouping this output)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])
    return docs.map_batches(lambda t: sample_batch(t, rate_pct),
                            batch_format="pyarrow")


SAMPLE_ORACLE_SQL = f"""
SELECT doc_id, source, n_chars FROM documents
WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      % 100 < {SAMPLE_RATE_PCT}
""".strip()


# ---- cross-document passage dedup -------------------------------------------

PASSAGE_TOKENS = 16    # non-overlapping passage window (last partial kept)


def passage_rows(batch: pa.Table) -> pa.Table:
    """Explode docs into (h=md5(passage), pos=doc_id·10⁶+idx) thin rows
    — the passage text itself never leaves the map task."""
    out_h, out_pos = [], []
    for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        ws = (t or "").split(" ")
        d = int(did) * 1_000_000
        for i in range(0, len(ws), PASSAGE_TOKENS):
            out_h.append(hashlib.md5(
                " ".join(ws[i:i + PASSAGE_TOKENS]).encode()).hexdigest())
            out_pos.append(d + i // PASSAGE_TOKENS)
    return pa.table({"h": pa.array(out_h, pa.string()),
                     "pos": pa.array(out_pos, pa.int64())})


def passage_dedup(sf_dir: str, num_partitions: int | None = None):
    """Corpus-wide passage-level dedup accounting (the
    remove-duplicated-passages shape of web-corpus curation): for every
    doc, how many of its PASSAGE_TOKENS-token windows already occur
    earlier in the corpus (earlier = lower (doc_id, idx) — the unique
    owner of each passage hash).

    Scale shape: thin (h, pos) rows → one Min-groupby on the hash (the
    only data-proportional shuffle, pre-shrunk to 16 B + 8 B per
    passage) → native hash join back on the same key → per-batch
    partial counts into a per-doc sum. No passage text is ever
    shuffled; no driver state.
    """
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    from ..rayutil import default_nblocks, parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(pa.schema(
            [("doc_id", pa.int64()), ("n_passages", pa.int64()),
             ("n_dup_passages", pa.int64())]).empty_table())

    npart = num_partitions if num_partitions is not None else default_nblocks()

    rows = _read_docs(sf_dir).map_batches(passage_rows,
                                          batch_format="pyarrow")
    owners = rows.groupby("h").aggregate(Min("pos", alias_name="min_pos"))
    joined = rows.join(owners, join_type="inner", num_partitions=npart,
                       on=("h",))

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np
        pos = t["pos"].to_numpy(zero_copy_only=False)
        mn = t["min_pos"].to_numpy(zero_copy_only=False)
        g = (pa.table({"doc_id": pa.array(pos // 1_000_000, pa.int64()),
                       "n": pa.array(np.ones(len(pos), np.int64)),
                       "n_dup": pa.array((pos > mn).astype(np.int64))})
             .group_by(["doc_id"]).aggregate([("n", "sum"), ("n_dup", "sum")]))
        return g.rename_columns(["doc_id", "n", "n_dup"])

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(Sum("n", alias_name="n_passages"),
                       Sum("n_dup", alias_name="n_dup_passages")))


PASSAGE_ORACLE_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(coalesce(text,''),' ') ws
              FROM documents),
p AS (SELECT doc_id, unnest(
      [{{'idx': (i-1)//{PASSAGE_TOKENS},
         'h': md5(array_to_string(ws[i:i+{PASSAGE_TOKENS - 1}],' '))}}
       FOR i IN range(1, len(ws)+1, {PASSAGE_TOKENS})],
      recursive := true) FROM toks),
o AS (SELECT h, min(doc_id*1000000+idx) AS min_pos FROM p GROUP BY h)
SELECT p.doc_id, count(*) AS n_passages,
       CAST(sum(CASE WHEN p.doc_id*1000000+p.idx > o.min_pos
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages
FROM p JOIN o ON p.h = o.h GROUP BY p.doc_id
""".strip()


# ---- composite: end-to-end training-corpus prep ------------------------------

KEPT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("split", pa.string()),
                         ("n_chunks", pa.int64()), ("n_tokens", pa.int64())])


def corpus_kept(sf_dir: str, num_partitions: int | None = None):
    """The retained-document set the composite prep pipeline trains on:
    exact-dedup representatives, minus the eval slice and everything
    contaminated by it, quality='good' only, each row carrying its
    content-hash split plus chunk and token counts. ``corpus_prep``
    aggregates this; ``ops/packing.corpus_pack`` packs its train split.

    Execution shape: one pass over documents computes quality, split
    and chunk/token counts per doc (a doc's chunks never leave their
    batch, so the count is batch-local); the two global facts — dedup
    representatives and the contaminated set — arrive as hash joins
    (semi via inner, anti via left-outer null marker). No driver state
    beyond the empty-contamination guard's one count.
    """
    import numpy as np
    import ray.data as rd

    from ..rayutil import default_nblocks, parquet_num_rows
    from .dedup import exact_dedup
    from .text import quality_batch

    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return rd.from_arrow(KEPT_SCHEMA.empty_table())
    npart = (num_partitions if num_partitions is not None
             else default_nblocks())

    def per_doc(t: pa.Table) -> pa.Table:
        q = quality_batch(t)
        s = split_batch(t)
        ch = chunk_batch(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        u, c = np.unique(ch["doc_id"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        n_chunks = c[np.searchsorted(u, ids)]   # every doc has ≥1 chunk
        ntok = pc.list_value_length(pc.split_pattern(
            pc.fill_null(t["text"], ""), " ")).cast(pa.int64())
        keep = ((np.asarray(q["quality"].to_pylist()) == "good")
                & (ids % EVAL_MOD != 0))        # eval slice never trains
        take = pa.array(np.nonzero(keep)[0])
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "split": s["split"].combine_chunks().take(take),
            "n_chunks": pa.array(n_chunks[keep].astype(np.int64)),
            "n_tokens": pc.take(ntok.combine_chunks(), take),
        }, schema=KEPT_SCHEMA)

    candidates = _read_docs(sf_dir).map_batches(per_doc,
                                                batch_format="pyarrow")

    # keep the fp column: a key-only join side coalesces away entirely
    # (the hash join strips the key from the right table — same lesson
    # as the anti-join's null marker in ops/joins.py)
    reps = exact_dedup(sf_dir)
    kept = candidates.join(reps, join_type="inner", num_partitions=npart,
                           on=("doc_id",))

    from ..stages.labeljoin import BROADCAST_LABELS_MAX

    cont = decontaminate(sf_dir).materialize()   # (doc_id, n_hit_grams)
    n_cont = cont.count()
    if 0 < n_cont <= BROADCAST_LABELS_MAX:
        # tiny anti side → broadcast set (a shuffle join would hand
        # most partitions an EMPTY right table, which the hash join
        # cannot digest — and it is the wrong shape anyway)
        import ray
        bad = ray.put(np.sort(np.concatenate(
            [b["doc_id"].to_numpy(zero_copy_only=False)
             for b in cont.iter_batches(batch_format="pyarrow")])))

        def anti(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            arr = ray.get(bad)
            pos = np.searchsorted(arr, ids)
            hit = (pos < len(arr)) & (arr[np.minimum(pos, len(arr) - 1)]
                                      == ids)
            return t.filter(pa.array(~hit))

        kept = kept.map_batches(anti, batch_format="pyarrow")
    elif n_cont > BROADCAST_LABELS_MAX:
        kept = kept.join(cont, join_type="left_outer",
                         num_partitions=npart, on=("doc_id",))
        kept = kept.map_batches(
            lambda t: t.filter(pc.is_null(t["n_hit_grams"])),
            batch_format="pyarrow")
    return kept.map_batches(lambda t: t.select(KEPT_SCHEMA.names),
                            batch_format="pyarrow")


def corpus_prep(sf_dir: str, num_partitions: int | None = None):
    """The ops composed as ONE pipeline — the shape a real
    training-data prep run takes: exact-dedup to representatives, drop
    the eval slice and everything contaminated by it, keep only
    quality='good' docs, assign the content-hash split, and account
    chunks per split. Output: (split, n_docs, n_chunks). The retained
    set itself comes from ``corpus_kept`` (shared with the packing
    composite); this is just its per-split aggregate.
    """
    from ray.data.aggregate import Count, Sum

    return (corpus_kept(sf_dir, num_partitions)
            .groupby("split")
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_chunks", alias_name="n_chunks")))


def _corpus_prep_oracle_sql() -> str:
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
      (len(string_split(coalesce(text,''),' ')) + {CHUNK_TOKENS - 1})
          // {CHUNK_TOKENS} AS n_chunks
      FROM documents)
SELECT s.split, count(*) AS n_docs,
       CAST(sum(s.n_chunks) AS BIGINT) AS n_chunks
FROM reps JOIN q USING (doc_id) JOIN s USING (doc_id)
WHERE reps.doc_id % {EVAL_MOD} <> 0
  AND reps.doc_id NOT IN (SELECT doc_id FROM cont)
GROUP BY s.split
""".strip()


CORPUS_PREP_ORACLE_SQL = _corpus_prep_oracle_sql()


# ---- bottom-k deterministic uniform sample --------------------------------

BOTTOMK_K = 25


def docs_bottomk_sample(sf_dir: str, k: int = BOTTOMK_K):
    """Exactly-k uniform sample via the bottom-k sketch: every doc gets
    the deterministic priority md5(doc_id) and the k smallest
    priorities win. Unlike the rate-based ``doc_sample`` (whose output
    SIZE varies with the corpus), bottom-k yields a fixed-size sample
    that is mergeable across any partitioning — per-block bottom-k
    then one bounded ≤ k-rows-per-block driver merge, the same shape
    as every top-k in this repo. The priority column rides along so
    the oracle's ORDER BY tie-handling is moot (md5 keys are distinct
    with overwhelming probability; doc_id breaks the ties anyway).
    """
    from .stats import _topk_table

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id"])

    def key(t: pa.Table) -> pa.Table:
        ks = [hashlib.md5(str(d).encode()).hexdigest()
              for d in t["doc_id"].to_pylist()]
        return pa.table({"doc_id": t["doc_id"],
                         "priority": pa.array(ks, pa.string())})

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("priority", pa.string())])
    return _topk_table(docs.map_batches(key, batch_format="pyarrow"),
                       [("priority", "ascending"),
                        ("doc_id", "ascending")], k, out_schema)


BOTTOMK_ORACLE_SQL = f"""
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {BOTTOMK_K}
""".strip()


# ---------------------------------------------------------------------------
# Per-group bottom-k sample (stratified fixed-size, mergeable)

BOTTOMK_GROUP_K = 5


def docs_bottomk_per_lang(sf_dir: str, k: int = BOTTOMK_GROUP_K):
    """Exactly-k-PER-LANGUAGE deterministic sample — the per-stratum
    bottom-k sketch (``docs_stratified_sample`` keeps a rate, so its
    stratum sizes drift with the corpus; this pins them). Per-batch
    kernel: one lexsort, keep each language's k smallest md5
    priorities — so the groupby(lang) exchange carries at most
    k × |langs seen| rows per batch, and the per-lang reduce merges
    bounded partials with the same rule. Mergeable under any
    partitioning, like every bottom-k/top-k in this repo.
    """
    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang"])

    out_schema = pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                            ("priority", pa.string())])

    def local_bottomk(t: pa.Table) -> pa.Table:
        ks = pa.array([hashlib.md5(str(d).encode()).hexdigest()
                       for d in t["doc_id"].to_pylist()], pa.string())
        t = pa.table({"lang": t["lang"], "doc_id": t["doc_id"].cast(
            pa.int64()), "priority": ks}, schema=out_schema)
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("lang", "ascending"), ("priority", "ascending"),
            ("doc_id", "ascending")]))
        langs = t["lang"].to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, langs[1:] != langs[:-1]])
        # positions within each lang run; keep rank < k
        pos = np.arange(len(langs)) - np.repeat(
            starts, np.diff(np.r_[starts, len(langs)]))
        return t.filter(pa.array(pos < k))

    return (docs.map_batches(local_bottomk, batch_format="pyarrow")
            .groupby("lang").map_groups(local_bottomk,
                                        batch_format="pyarrow"))


BOTTOMK_PER_LANG_ORACLE_SQL = f"""
WITH p AS (
  SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS priority,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
             AS rn
  FROM documents)
SELECT lang, doc_id, priority FROM p WHERE rn <= {BOTTOMK_GROUP_K}
""".strip()


# ---- ExactSubstr-style duplicate-span accounting ---------------------------

DUPSPAN_W = 8          # overlapping window width (tokens)


def doc_dup_spans(sf_dir: str, w: int = DUPSPAN_W,
                  broadcast_threshold: int | None = None):
    """Per-doc duplicate-span accounting with OVERLAPPING windows — the
    ExactSubstr shape of web-corpus dedup (Lee et al.'s
    deduplicate-text-datasets: find substrings repeated ACROSS
    documents; here token-aligned): for every doc, how many of its
    ``w``-token sliding windows also occur verbatim in at least one
    OTHER document. Unlike ``passage_dedup`` (disjoint passages, "seen
    earlier" ownership), every window position counts and the predicate
    is cross-doc multiplicity, not first-owner.

    Scale shape: windows travel as md5 hex thin rows (hash, doc_id) —
    never text; ONE groupby(hash) co-locates a gram's occurrences and
    emits per-doc counts only for grams spanning ≥2 distinct docs; the
    per-doc rollup and the (doc_id, n_windows) totals are doc-scale;
    the final zero-fill attach rides the size-gated broadcast/shuffle
    policy. Docs shorter than ``w`` tokens report 0 windows.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)

    def gram_rows(batch: pa.Table) -> pa.Table:
        hs, dids = [], []
        for did, t in zip(batch["doc_id"].to_pylist(),
                          batch["text"].to_pylist()):
            ws = (t or "").split(" ")
            for i in range(len(ws) - w + 1):
                hs.append(hashlib.md5(
                    " ".join(ws[i:i + w]).encode()).hexdigest())
                dids.append(did)
        return pa.table({"h": pa.array(hs, pa.string()),
                         "doc_id": pa.array(dids, pa.int64())})

    grams = _read_docs(sf_dir).map_batches(gram_rows, batch_format="pyarrow")

    def cross_doc(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(ids, return_counts=True)
        if len(uniq) < 2:
            return pa.schema([("doc_id", pa.int64()),
                              ("c", pa.int64())]).empty_table()
        return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                         "c": pa.array(counts, pa.int64())})

    dup = (grams.groupby("h").map_groups(cross_doc, batch_format="pyarrow")
           .groupby("doc_id").aggregate(Sum("c", alias_name="dup_windows")))

    def totals(batch: pa.Table) -> pa.Table:
        n = [max(len((t or "").split(" ")) - w + 1, 0)
             for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                         "n_windows": pa.array(n, pa.int64())})

    tot = _read_docs(sf_dir).map_batches(totals, batch_format="pyarrow")
    out = attach_dim(tot, dup, "doc_id", "doc_id", ["dup_windows"],
                     broadcast_threshold=bt)

    def zero_fill(t: pa.Table) -> pa.Table:
        # when NO document reaches w tokens the dup aggregate is a
        # schema-less empty dataset and attach_dim hands the facts
        # through untouched — append the all-zero column instead of
        # set_column on a missing field (ADVICE r3)
        if "dup_windows" not in t.column_names:
            return t.append_column(
                "dup_windows", pa.array([0] * t.num_rows, pa.int64()))
        return t.set_column(
            t.schema.get_field_index("dup_windows"), "dup_windows",
            pc.coalesce(t["dup_windows"].cast(pa.int64()),
                        pa.scalar(0, pa.int64())))

    return out.map_batches(zero_fill, batch_format="pyarrow")


DUP_SPANS_ORACLE_SQL = f"""
WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
           FROM documents),
wins AS (
  SELECT doc_id, array_to_string(ws[i : i + {DUPSPAN_W - 1}], ' ') AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(
                       1, len(ws) - {DUPSPAN_W - 1})) AS i) gs(i)),
dup_grams AS (
  SELECT gram FROM wins GROUP BY gram
  HAVING count(DISTINCT doc_id) >= 2),
per_doc AS (
  SELECT w.doc_id, count(*) AS dup_windows
  FROM wins w JOIN dup_grams d USING (gram)
  GROUP BY w.doc_id)
SELECT t.doc_id,
       CAST(greatest(len(t.ws) - {DUPSPAN_W - 1}, 0) AS BIGINT)
           AS n_windows,
       CAST(coalesce(p.dup_windows, 0) AS BIGINT) AS dup_windows
FROM t LEFT JOIN per_doc p USING (doc_id)
""".strip()


# ---- domain/source mixing weights ------------------------------------------

MIX_CAP_PPM = 10_000_000        # max upsampling = 10× (parts-per-million)


def source_mixing_weights(sf_dir: str):
    """Per-source resampling weights toward a UNIFORM token budget —
    the domain-mixture step of training-data assembly (each source's
    weight = target-share / actual-share, upsampling capped at
    ``MIX_CAP_PPM``). Exact integer arithmetic end-to-end:
    weight_ppm = min(total_tokens·10⁶ // (n_sources·n_tokens), cap),
    so the value-hash cannot drift.

    Scale shape: one map-side (source, n_docs, n_tokens) partial per
    batch (the token count never leaves the map task as rows), a
    source-vocabulary groupby, then the totals resolve inside ONE
    constant-key kernel over the source-scale aggregate — no driver
    collection at any corpus size.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        nt = [len((t or "").split(" ")) for t in batch["text"].to_pylist()]
        g = (pa.table({"source": pa.array(src, pa.string()),
                       "n_tokens": pa.array(nt, pa.int64())})
             .group_by("source")
             .aggregate([([], "count_all"), ("n_tokens", "sum")]))
        return pa.table({"source": g["source"],
                         "n_docs": g["count_all"].cast(pa.int64()),
                         "n_tokens": g["n_tokens_sum"].cast(pa.int64())})

    import ray.data as rd

    agg = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "text"])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("source")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tokens", alias_name="n_tokens")))

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("__k", pa.array([0] * t.num_rows, pa.int8()))

    def weigh(g: pa.Table) -> pa.Table:
        nt = g["n_tokens"].to_numpy(zero_copy_only=False)
        total = int(nt.sum())
        ns = g.num_rows
        ppm = np.minimum(total * 1_000_000 // (ns * np.maximum(nt, 1)),
                         MIX_CAP_PPM)
        return pa.table({"source": g["source"],
                         "n_docs": g["n_docs"].cast(pa.int64()),
                         "n_tokens": g["n_tokens"].cast(pa.int64()),
                         "weight_ppm": pa.array(ppm, pa.int64())})

    return (agg.map_batches(add_key, batch_format="pyarrow")
            .groupby("__k").map_groups(weigh, batch_format="pyarrow"))


MIXING_ORACLE_SQL = f"""
WITH s AS (
  SELECT source, count(*) AS n_docs,
         sum(len(string_split(coalesce(text, ''), ' '))) AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(n_tokens) AS t, count(*) AS ns FROM s)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(least((t * 1000000) // (ns * greatest(n_tokens, 1)),
                  {MIX_CAP_PPM}) AS BIGINT) AS weight_ppm
FROM s, tot
""".strip()


# ---- weighted bottom-k sample ----------------------------------------------

WEIGHTED_K = 50


def docs_weighted_sample(sf_dir: str, k: int = WEIGHTED_K):
    """Exactly-k WEIGHTED sample (weight = n_chars): an integer
    Efraimidis–Spirakis-style priority sketch — every doc gets the
    deterministic priority md5₆₀(doc_id) // weight and the k smallest
    win, so a doc's selection odds grow with its weight while the
    draw stays reproducible on any cluster size or block layout (no
    RNG state). Same mergeable shape as ``docs_bottomk_sample``:
    per-block bottom-k, then one bounded ≤ k-rows-per-block merge.
    Exact integer arithmetic; (priority, doc_id) is a total order.
    """
    from .stats import _topk_table

    import ray.data as rd

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source", "n_chars"])

    def key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        w = np.maximum(t["n_chars"].to_numpy(zero_copy_only=False), 1)
        h = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
                      for d in ids], np.int64)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "source": t["source"],
                         "n_chars": t["n_chars"].cast(pa.int64()),
                         "priority": pa.array(h // w, pa.int64())})

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("source", pa.string()),
                            ("n_chars", pa.int64()),
                            ("priority", pa.int64())])
    return _topk_table(docs.map_batches(key, batch_format="pyarrow"),
                       [("priority", "ascending"),
                        ("doc_id", "ascending")], k, out_schema)


WEIGHTED_SAMPLE_ORACLE_SQL = f"""
SELECT doc_id, source, n_chars,
       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) // greatest(n_chars, 1) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {WEIGHTED_K}
""".strip()


# ---- mixture-weighted corpus draw ------------------------------------------

MIXED_K = 50


def corpus_mixed_sample(sf_dir: str, k: int = MIXED_K,
                        broadcast_threshold: int | None = None):
    """END-TO-END corpus assembly draw: the per-source mixture weights
    (``source_mixing_weights`` — uniform token budget, upsample cap)
    become each document's sampling weight, and the exactly-``k``
    deterministic Efraimidis–Spirakis draw (``docs_weighted_sample``'s
    integer priority md5₆₀(doc_id) // weight) runs under them — so
    under-represented sources surface proportionally more docs, with
    zero RNG state and a hashable result. The source-vocabulary weight
    table attaches through the size-gated policy; the draw stays the
    mergeable per-block bottom-k + bounded merge."""
    import ray.data as rd

    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_dim
    from .stats import _topk_table

    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    weights = source_mixing_weights(sf_dir)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "source"])
    docs = attach_dim(docs, weights, "source", "source", ["weight_ppm"],
                      broadcast_threshold=bt)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("source", pa.string()),
                            ("weight_ppm", pa.int64()),
                            ("priority", pa.int64())])

    def key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "weight_ppm" not in t.column_names:
            return out_schema.empty_table()
        ids = t["doc_id"].to_pylist()
        w = np.maximum(t["weight_ppm"].to_numpy(zero_copy_only=False), 1)
        h = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:15],
                          16) for d in ids], np.int64)
        return pa.table({"doc_id": t["doc_id"].cast(pa.int64()),
                         "source": t["source"],
                         "weight_ppm": pa.array(w, pa.int64()),
                         "priority": pa.array(h // w, pa.int64())},
                        schema=out_schema)

    return _topk_table(docs.map_batches(key, batch_format="pyarrow"),
                       [("priority", "ascending"),
                        ("doc_id", "ascending")], k, out_schema)


MIXED_SAMPLE_ORACLE_SQL = f"""
WITH s AS (
  SELECT source, sum(len(string_split(coalesce(text, ''), ' ')))
             AS n_tokens
  FROM documents GROUP BY source),
tot AS (SELECT sum(n_tokens) AS t, count(*) AS ns FROM s),
w AS (SELECT source,
             greatest(CAST(least((t * 1000000)
                                 // (ns * greatest(n_tokens, 1)),
                                 {MIX_CAP_PPM}) AS BIGINT), 1)
                 AS weight_ppm
      FROM s, tot)
SELECT d.doc_id, d.source, w.weight_ppm,
       CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
            AS BIGINT) // w.weight_ppm AS priority
FROM documents d JOIN w USING (source)
ORDER BY priority, doc_id LIMIT {MIXED_K}
""".strip()
