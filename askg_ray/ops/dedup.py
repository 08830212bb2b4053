"""Document-level deduplication family (training-data-pipeline ops).

Five dedup strategies over the ``documents`` table, each emitting the
full (doc_id, rep_id) assignment — rep_id = min doc_id of the duplicate
cluster, rep_id == doc_id for uniques:

  exact          md5(text) hash-partition + per-group min (SQL-checkable)
  minhash_lsh    word-3-shingle MinHash (64 perm) → 16-band LSH →
                 estimated-Jaccard verify ≥ 0.5 → connected components
  ngram_jaccard  same blocking, EXACT shingle-set Jaccard verify ≥ 0.5
  simhash        64-bit SimHash, 4×16-bit bands (pigeonhole: hamming ≤ 3
                 ⇒ ≥1 intact band), verify hamming ≤ 3
  embedding      random-hyperplane LSH over the embedding column,
                 verify cosine ≥ 0.95

All shuffles are keyed on band values; verification happens inside the
band group with the needed payload (signature / shingle ids / vector)
carried in the exploded rows — no join back to the corpus. Components
via stages/components.py (hash-to-min).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

from ..minhash import (
    band_keys,
    hamming64,
    minhash_signature,
    shingle_ids,
    simhash64,
    word_shingles,
)
from ..stages.components import PAIR_SCHEMA, connected_components

_ASSIGN_SCHEMA = pa.schema([("doc_id", pa.int64()), ("rep_id", pa.int64())])


# ---- exact ---------------------------------------------------------------

def exact_dedup(sf_dir: str):
    """min(doc_id) per md5(text) — the SQL-checkable exact strategy."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from .text import fingerprint_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    fps = docs.map_batches(fingerprint_batch, batch_format="pyarrow")
    agg = fps.groupby("fp").aggregate(Min("doc_id", alias_name="doc_id"))
    return agg.map_batches(lambda t: t.select(["doc_id", "fp"]),
                           batch_format="pyarrow")


# ---- shared near-dup machinery ------------------------------------------

def _identity(v):
    return v


def _labels_to_int(batch: pa.Table) -> pa.Table:
    return pa.table({
        "node": pa.array([int(v) for v in batch["node"].to_pylist()],
                         pa.int64()),
        "component": pa.array([int(v) for v in batch["component"].to_pylist()],
                              pa.int64()),
    })


def _near_dedup(blocks, verify_fn, all_ids, broadcast_threshold=None):
    """blocks: Dataset[(block_key, doc_id, payload...)] → assignments.

    Pair generation rides the grid-salted self-join (singleton-block
    pruning + hot-block salting, stages/selfjoin.py); doc ids are
    zero-padded so string component labels sort numerically. Label
    attachment goes through stages/labeljoin.attach_labels — broadcast
    for provably small label sets, a partitioned shuffle join above the
    threshold (no driver-side label dict at any corpus size)."""
    from ..stages.labeljoin import BROADCAST_LABELS_MAX, attach_labels
    from ..stages.selfjoin import blocked_self_join

    def add_str_id(batch: pa.Table) -> pa.Table:
        sids = [str(d).zfill(12) for d in batch["doc_id"].to_pylist()]
        return batch.append_column("id", pa.array(sids, pa.string()))

    def pair_fn(r1: dict, r2: dict) -> list[dict]:
        if verify_fn(r1, r2):
            return [{"a": r1["id"], "b": r2["id"]}]
        return []

    pairs = blocked_self_join(
        blocks.map_batches(add_str_id, batch_format="pyarrow"),
        pair_fn, PAIR_SCHEMA, cap=256)
    labels = connected_components(pairs).map_batches(
        _labels_to_int, batch_format="pyarrow")
    tagged = attach_labels(
        all_ids, labels, key="doc_id", make_default=_identity,
        broadcast_threshold=(BROADCAST_LABELS_MAX if broadcast_threshold is None
                             else broadcast_threshold),
        comp_type=pa.int64())

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch["doc_id"],
                         "rep_id": batch["comp"]}, schema=_ASSIGN_SCHEMA)

    return tagged.map_batches(finish, batch_format="pyarrow")


def _read_docs(sf_dir: str):
    import ray.data as rd

    from ..rayutil import default_nblocks
    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"],
                           override_num_blocks=default_nblocks())


# ---- minhash / ngram-jaccard --------------------------------------------

_MH_PERM = 64
_MH_BANDS = 16


def _owns(r1: dict, r2: dict) -> bool:
    """Band-ownership: a candidate pair meets in EVERY shared band; only
    the minimum shared band verifies (and emits) it. Each unique pair is
    verified exactly once — no duplicate SequenceMatcher/cosine work and
    no duplicate pair rows into connected components."""
    shared = set(r1["bands"]).intersection(r2["bands"])
    return bool(shared) and r1["block_key"] == min(shared)


def _minhash_blocks(batch: pa.Table, keep_shingles: bool) -> pa.Table:
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_key, out_bands, out_id, out_sig, out_sh = [], [], [], [], []
    for did, t in zip(ids, texts):
        sh = shingle_ids(word_shingles((t or "").lower(), k=3))
        sig = minhash_signature(sh, _MH_PERM)
        bks = band_keys(sig, _MH_BANDS)
        for bk in bks:
            out_key.append(bk)
            out_bands.append(bks)
            out_id.append(did)
            out_sig.append(sig.tobytes())
            out_sh.append(sh.tobytes() if keep_shingles else b"")
    return pa.table({
        "block_key": pa.array(out_key, pa.int64()),
        "bands": pa.array(out_bands, pa.list_(pa.int64())),
        "doc_id": pa.array(out_id, pa.int64()),
        "sig": pa.array(out_sig, pa.binary()),
        "sh": pa.array(out_sh, pa.binary()),
    })


def _verify_est_jaccard(r1, r2, thresh=0.5) -> bool:
    if not _owns(r1, r2):
        return False
    s1 = np.frombuffer(r1["sig"], dtype=np.uint64)
    s2 = np.frombuffer(r2["sig"], dtype=np.uint64)
    return float(np.mean(s1 == s2)) >= thresh


def _verify_exact_jaccard(r1, r2, thresh=0.5) -> bool:
    if not _owns(r1, r2):
        return False
    a = set(np.frombuffer(r1["sh"], dtype=np.uint64).tolist())
    b = set(np.frombuffer(r2["sh"], dtype=np.uint64).tolist())
    if not a and not b:
        return False
    u = len(a | b)
    return (len(a & b) / u if u else 0.0) >= thresh


def minhash_dedup(sf_dir: str, broadcast_threshold=None):
    docs = _read_docs(sf_dir).materialize()
    blocks = docs.map_batches(lambda t: _minhash_blocks(t, False),
                              batch_format="pyarrow").materialize()
    return _near_dedup(blocks, _verify_est_jaccard, docs, broadcast_threshold)


def ngram_jaccard_dedup(sf_dir: str, broadcast_threshold=None):
    docs = _read_docs(sf_dir).materialize()
    blocks = docs.map_batches(lambda t: _minhash_blocks(t, True),
                              batch_format="pyarrow").materialize()
    return _near_dedup(blocks, _verify_exact_jaccard, docs, broadcast_threshold)


# ---- simhash -------------------------------------------------------------

def _simhash_blocks(batch: pa.Table) -> pa.Table:
    """Token ids are md5-based (minhash.token_ids_md5) with no splitmix
    so the sketch — and therefore the hamming-≤3 closure — is exactly
    reproducible in DuckDB (SIMHASH_ORACLE_SQL); the 4×16-bit pigeonhole
    banding is lossless for hamming ≤ 3, so the Ray pair set IS the
    exact hamming closure and the oracle is a true hash check."""
    from ..minhash import token_ids_md5

    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    out_key, out_bands, out_id, out_h = [], [], [], []
    for did, t in zip(ids, texts):
        toks = token_ids_md5([w for w in (t or "").lower().split(" ") if w])
        h = simhash64(toks, mix=False)
        bks = [(band << 16) | ((h >> (band * 16)) & 0xFFFF)
               for band in range(4)]  # 4 × 16-bit bands
        for bk in bks:
            out_key.append(bk)
            out_bands.append(bks)
            out_id.append(did)
            out_h.append(h - (1 << 64) if h >= (1 << 63) else h)  # store signed
    return pa.table({
        "block_key": pa.array(out_key, pa.int64()),
        "bands": pa.array(out_bands, pa.list_(pa.int64())),
        "doc_id": pa.array(out_id, pa.int64()),
        "sim": pa.array(out_h, pa.int64()),
    })


def _verify_hamming(r1, r2, maxd=3) -> bool:
    if not _owns(r1, r2):
        return False
    h1, h2 = r1["sim"] & ((1 << 64) - 1), r2["sim"] & ((1 << 64) - 1)
    return hamming64(h1, h2) <= maxd


def simhash_dedup(sf_dir: str):
    docs = _read_docs(sf_dir).materialize()
    # sketch computation is the dominant cost — pin it so the self-join's
    # two passes (hot-count + cells) don't recompute it
    blocks = docs.map_batches(_simhash_blocks, batch_format="pyarrow").materialize()
    return _near_dedup(blocks, _verify_hamming, docs)


# Exact hamming-≤3 SimHash closure in DuckDB: per-doc 64-bit sketch from
# md5 token ids (bit b set iff Σ±1 over distinct-token bit b is > 0 —
# mirrors minhash.simhash64(mix=False) over token_ids_md5), pairs via
# bit_count(xor) ≤ 3, then the same recursive min-reach closure as
# _NGRAM_CLOSURE_SQL. Banding in the Ray path is pigeonhole-lossless at
# hamming ≤ 3, so a hash match checks the FULL pipeline, not a sample.
SIMHASH_ORACLE_SQL = """
WITH RECURSIVE
tok AS (SELECT doc_id, unnest(list_distinct(list_filter(
          string_split(lower(text), ' '), x -> x <> ''))) AS w
        FROM documents),
ids AS (SELECT DISTINCT doc_id,
               ('0x' || substr(md5(w), 1, 16))::UBIGINT AS tid FROM tok),
bits AS (SELECT doc_id, b,
                sum(CASE WHEN (tid >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         FROM ids, range(0, 64) t(b) GROUP BY doc_id, b),
sh0 AS (SELECT doc_id,
               (sum(CASE WHEN s > 0 THEN (1::UBIGINT << b)
                         ELSE 0::UBIGINT END))::UBIGINT AS h
        FROM bits GROUP BY doc_id),
sh AS (SELECT d.doc_id, coalesce(s.h, 0::UBIGINT) AS h
       FROM documents d LEFT JOIN sh0 s ON d.doc_id = s.doc_id),
e AS (SELECT a.doc_id AS a, b.doc_id AS b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.h, b.h)) <= 3),
und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
walk(node, reach) AS (SELECT DISTINCT a, a FROM und
  UNION SELECT w2.node, u.b FROM walk w2 JOIN und u ON u.a = w2.reach),
lab AS (SELECT node, min(reach) AS rep FROM walk GROUP BY node)
SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS rep_id
FROM documents d LEFT JOIN lab l ON d.doc_id = l.node
""".strip()


# ---- embedding cosine ----------------------------------------------------

@functools.lru_cache(maxsize=8)
def _hyperplanes(dim: int, nbits: int = 32, seed: int = 11) -> np.ndarray:
    """Cached per (dim, nbits, seed) — built once per worker process,
    never inside the per-batch hot path (same pattern as minhash._coeffs)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float64)


def _embed_blocks(batch: pa.Table) -> pa.Table:
    from ..arrowutil import list_col_matrix

    ids = batch["vec_id"].to_pylist()
    vecs = list_col_matrix(batch["embedding"])
    planes = _hyperplanes(vecs.shape[1])
    bits = (vecs @ planes.T) > 0  # n × 32
    out_key, out_bands, out_id, out_vec = [], [], [], []
    for row, did, v in zip(bits, ids, vecs):
        word = int(np.packbits(row, bitorder="little")[:4].view(np.uint32)[0]) \
            if row.size >= 32 else 0
        bks = [(band << 8) | ((word >> (band * 8)) & 0xFF)
               for band in range(4)]  # 4 × 8-bit bands of the 32-bit sketch
        for bk in bks:
            out_key.append(bk)
            out_bands.append(bks)
            out_id.append(did)
            out_vec.append(v.tobytes())
    return pa.table({
        "block_key": pa.array(out_key, pa.int64()),
        "bands": pa.array(out_bands, pa.list_(pa.int64())),
        "doc_id": pa.array(out_id, pa.int64()),
        "vec": pa.array(out_vec, pa.binary()),
    })


def _verify_cosine(r1, r2, thresh=0.95) -> bool:
    if not _owns(r1, r2):
        return False
    v1 = np.frombuffer(r1["vec"], dtype=np.float64)
    v2 = np.frombuffer(r2["vec"], dtype=np.float64)
    denom = np.linalg.norm(v1) * np.linalg.norm(v2)
    if denom == 0:
        return False
    return float(v1 @ v2 / denom) >= thresh


def embedding_dedup(sf_dir: str):
    import ray.data as rd

    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"]).materialize()
    blocks = embs.map_batches(_embed_blocks, batch_format="pyarrow").materialize()
    ids = embs.map_batches(
        lambda t: pa.table({"doc_id": t["vec_id"]}), batch_format="pyarrow")
    return _near_dedup(blocks, _verify_cosine, ids)
