"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline — the query matrix is
broadcast once via ``ray.put`` and each batch does one numpy matmul
(never re-shipped per batch) — and an LSH-bucketed approximate variant
as the scale path (probe only buckets sharing a band with the query).
Output columns are integers (vec_id, label, rank) so the DuckDB oracle
hash-matches without float comparisons.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIM_SCHEMA = pa.schema([("rank", pa.int64()), ("vec_id", pa.int64()),
                         ("label", pa.int32())])


def _query_vector(sf_dir: str, query_id: int) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "=", query_id)])
    return np.array(t["embedding"].to_pylist()[0], dtype=np.float64)


def _score_batches(embs, q: np.ndarray):
    import ray

    qref = ray.put(q / np.linalg.norm(q))

    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        vecs = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        sims = (vecs @ qv) / norms
        return pa.table({
            "vec_id": batch["vec_id"],
            "label": batch["label"],
            "sim": pa.array(sims, pa.float64()),
        })

    return embs.map_batches(score, batch_format="pyarrow")


def ann_bruteforce(sf_dir: str, query_id: int = 0, k: int = 10):
    """Exact cosine top-k (excluding the query row itself)."""
    import ray.data as rd

    q = _query_vector(sf_dir, query_id)
    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding", "label"])
    scored = _score_batches(embs, q)
    top = (scored
           .map_batches(lambda t: t.filter(pc.not_equal(t["vec_id"], query_id)),
                        batch_format="pyarrow")
           .sort(["sim", "vec_id"], descending=[True, False])
           .limit(k))
    rows = [r for b in top.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    return rd.from_arrow(pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        "label": pa.array([r["label"] for r in rows], pa.int32()),
    }, schema=_SIM_SCHEMA))


def ann_lsh(sf_dir: str, query_id: int = 0, k: int = 10):
    """LSH-bucketed ANN: probe only vectors sharing ≥1 hyperplane band
    with the query (candidate pruning; approximate → rows-only check)."""
    import ray.data as rd

    from .dedup import _embed_blocks

    q = _query_vector(sf_dir, query_id)
    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding", "label"]).materialize()
    # bands of the query
    qt = pa.table({"vec_id": pa.array([query_id], pa.int64()),
                   "embedding": pa.array([q.tolist()], pa.list_(pa.float64()))})
    q_bands = set(_embed_blocks(qt)["block_key"].to_pylist())

    def in_query_buckets(batch: pa.Table) -> pa.Table:
        blocks = _embed_blocks(batch.select(["vec_id", "embedding"]))
        hit_ids = {d for d, bk in zip(blocks["doc_id"].to_pylist(),
                                      blocks["block_key"].to_pylist())
                   if bk in q_bands}
        mask = pa.array([v in hit_ids for v in batch["vec_id"].to_pylist()])
        return batch.filter(mask)

    candidates = embs.map_batches(in_query_buckets, batch_format="pyarrow")
    scored = _score_batches(candidates, q)
    top = (scored
           .map_batches(lambda t: t.filter(pc.not_equal(t["vec_id"], query_id)),
                        batch_format="pyarrow")
           .sort(["sim", "vec_id"], descending=[True, False])
           .limit(k))
    rows = [r for b in top.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    return rd.from_arrow(pa.table({
        "rank": pa.array(range(1, len(rows) + 1), pa.int64()),
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        "label": pa.array([r["label"] for r in rows], pa.int32()),
    }, schema=_SIM_SCHEMA))
