"""Offline Neo4j bulk-load export — the no-network analog of the
reference's graph sink (S8/S9, /root/reference/src/neo4j_integration.py:
46-53 node label ``Server`` + per-field indexes, 298 ``Category``
nodes, 558-631 typed inferred relationships).

Layout matches ``neo4j-admin database import full``:

    out_dir/
      nodes.header.csv          id:ID,name,...,categories:string[],:LABEL
      nodes/*.csv               headerless data shards (one per block)
      categories.header.csv     id:ID,name,:LABEL
      categories/*.csv
      edges.header.csv          :START_ID,:END_ID,:TYPE,confidence:double
      edges/*.csv               inferred edges
      membership.header.csv     :START_ID,:END_ID,:TYPE
      membership/*.csv          Server-BELONGS_TO->Category

Every data shard is written by ``Dataset.write_csv`` with headers
suppressed, so the export streams block-by-block (no driver
materialization, one file per block — resumable/parallel-loadable) and
the import tool concatenates shards under the single header file, the
standard shape for bulk graph loads at any corpus size.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def _source_fingerprint(sf_dir: str, *tables: str) -> str:
    """Content fingerprint for /tmp scratch caches: path + mtime_ns +
    size of each source parquet. Keying a resumable sink on the corpus
    PATH alone serves stale shards when the data at that path is
    regenerated with unchanged per-shard row counts (the footer-probe
    skip cannot tell) — ADVICE r3. mtime+size changes on any rewrite,
    so a regenerated corpus gets a fresh scratch dir."""
    import hashlib

    parts = [sf_dir]
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        try:
            st = os.stat(p)
            parts.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        except OSError:
            parts.append(f"{t}:absent")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:16]


def _write_headerless(ds, path: str) -> None:
    from pyarrow import csv as pacsv

    ds.write_csv(path, arrow_csv_args_fn=lambda: {
        "write_options": pacsv.WriteOptions(include_header=False)})


def _header(path: str, cols: list[str]) -> None:
    with open(path, "w") as fh:
        fh.write(",".join(cols) + "\n")


def export_neo4j_bulk(kg: dict, out_dir: str) -> dict:
    """kg: the build_kg output dict (nodes / edges / membership
    Datasets). Returns per-table row counts. The output dir is
    recreated fresh: ``write_csv`` appends by default, so a rerun into
    a stale dir would double every shard under the import headers."""
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def node_rows(t: pa.Table) -> pa.Table:
        cats = pc.binary_join(
            pc.if_else(pc.is_null(t["categories"]),
                       pa.array([[]] * t.num_rows,
                                pa.list_(pa.string())),
                       t["categories"].combine_chunks()), ";")
        return pa.table({
            "id": t["id"],
            "name": t["name"],
            "author": t["author"],
            "registry_source": t["registry_source"],
            "implementation_language": t["implementation_language"],
            "popularity_score": t["popularity_score"],
            "categories": cats,
            "label": pa.array(["Server"] * t.num_rows, pa.string()),
        })

    nodes = kg["nodes"].map_batches(node_rows, batch_format="pyarrow")
    _write_headerless(nodes, f"{out_dir}/nodes")
    _header(f"{out_dir}/nodes.header.csv",
            ["id:ID", "name", "author", "registry_source",
             "implementation_language", "popularity_score:long",
             "categories:string[]", ":LABEL"])

    from ..ontology import categories_flat
    cat_ds = categories_flat().map_batches(  # fixed 7-row ontology dim
        lambda t: pa.table({
            "id": t["id"], "name": t["name"],
            "label": pa.array(["Category"] * t.num_rows, pa.string())}),
        batch_format="pyarrow")
    _write_headerless(cat_ds, f"{out_dir}/categories")
    _header(f"{out_dir}/categories.header.csv", ["id:ID", "name", ":LABEL"])

    def edge_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src"].cast(pa.string()),
            "dst": t["dst"].cast(pa.string()),
            "rel_type": pc.utf8_upper(t["rel_type"].cast(pa.string())),
            "confidence": t["confidence"],
        })

    edges = kg["edges"].map_batches(edge_rows, batch_format="pyarrow")
    _write_headerless(edges, f"{out_dir}/edges")
    _header(f"{out_dir}/edges.header.csv",
            [":START_ID", ":END_ID", ":TYPE", "confidence:double"])

    def member_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["server_id"],
            "dst": t["category_id"],
            "rel_type": pa.array(["BELONGS_TO_CATEGORY"] * t.num_rows,
                                 pa.string()),
        })

    membership = kg["membership"].map_batches(member_rows,
                                              batch_format="pyarrow")
    _write_headerless(membership, f"{out_dir}/membership")
    _header(f"{out_dir}/membership.header.csv",
            [":START_ID", ":END_ID", ":TYPE"])

    return {"nodes": kg["nodes"].count(),
            "categories": cat_ds.count(),
            "edges": kg["edges"].count(),
            "membership": kg["membership"].count()}


def export_corpus_jsonl(sf_dir: str, out_dir: str,
                        columns: list[str] | None = None) -> dict:
    """Training-corpus JSONL sink: documents stream out as one
    ``.jsonl`` shard per block via ``Dataset.write_json`` — the
    interchange format LLM data loaders ingest — plus a
    ``manifest.json`` recording row/byte totals and the shard list so
    a consumer (or a resumed run) can verify completeness without
    re-reading the data. Rerun-safe: the shard directory is recreated
    fresh (``write_json`` would otherwise append new shards beside
    stale ones). No driver materialization at any size — the only
    driver state is the shard listing.
    """
    import json
    import shutil

    import ray.data as rd

    cols = columns or ["doc_id", "text", "lang", "source"]
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)

    shard_dir = f"{out_dir}/docs"
    shutil.rmtree(shard_dir, ignore_errors=True)
    os.makedirs(shard_dir, exist_ok=True)
    docs.write_json(shard_dir)

    shards = sorted(f for f in os.listdir(shard_dir)
                    if f.endswith((".json", ".jsonl")))
    n_rows = rd.read_json([f"{shard_dir}/{s}" for s in shards]).count()
    manifest = {
        "format": "jsonl",
        "columns": cols,
        "n_rows": n_rows,
        "n_shards": len(shards),
        "total_bytes": sum(os.path.getsize(f"{shard_dir}/{s}")
                           for s in shards),
        "shards": shards,
    }
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest


SORTED_EXPORT_BUCKETS = 16


def export_sorted_parquet(sf_dir: str, out_dir: str,
                          nbuckets: int = SORTED_EXPORT_BUCKETS) -> dict:
    """Range-partitioned, globally sorted, RESUMABLE Parquet sink:
    documents land in ``nbuckets`` shards keyed by (n_chars, doc_id)
    such that shard i's keys all precede shard i+1's — reading shards
    in order yields a fully sorted corpus WITHOUT any global sort
    operator. Bucket boundaries come from the distinct-value histogram
    (one tiny groupby; driver holds distinct n_chars values, bounded
    by the length domain): value v's bucket is
    ``cum_count_before(v) * nbuckets // total`` — the value-keyed
    prefix-scan rule, so the assignment is deterministic and
    SQL-checkable.

    RESUME: each bucket writes atomically (tmp + rename) and records
    its expected row count; a rerun probes the existing shard's
    Parquet footer and SKIPS buckets whose count already matches —
    the per-partition skip a 100 TB job needs to survive preemption.
    """
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    cols = ["doc_id", "n_chars", "lang", "source"]
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=cols)
    os.makedirs(out_dir, exist_ok=True)

    hist = (docs.select_columns(["n_chars"]).groupby("n_chars")
            .aggregate(Count(alias_name="c")).to_pandas())
    if hist.empty or "n_chars" not in hist.columns:
        hist = hist.reindex(columns=["n_chars", "c"])
    hist = hist.sort_values("n_chars")
    total = int(hist["c"].sum())
    if total == 0:
        manifest = {"format": "parquet-sorted", "n_rows": 0, "buckets": []}
        with open(f"{out_dir}/manifest.json", "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        return manifest
    cum_before = np.concatenate([[0],
                                 np.cumsum(hist["c"].to_numpy())[:-1]])
    vals = hist["n_chars"].to_numpy().astype(np.int64)
    buckets = cum_before * nbuckets // total
    expected = {int(b): int(hist["c"].to_numpy()[buckets == b].sum())
                for b in np.unique(buckets)}
    plan_ref = ray.put((vals, buckets.astype(np.int64), expected))

    def tag(t: pa.Table) -> pa.Table:
        v, b, _ = ray.get(plan_ref)
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "bucket", pa.array(b[np.searchsorted(v, nc)], pa.int64()))

    stats_schema = pa.schema([
        ("bucket", pa.int64()), ("n_rows", pa.int64()),
        ("min_chars", pa.int64()), ("max_chars", pa.int64()),
        ("skipped", pa.int64())])

    def write_bucket(g: pa.Table) -> pa.Table:
        _, _, exp = ray.get(plan_ref)
        b = int(g["bucket"][0].as_py())
        path = f"{out_dir}/part-{b:05d}.parquet"
        nc = g["n_chars"].to_numpy(zero_copy_only=False)
        row = {"bucket": [b], "n_rows": [g.num_rows],
               "min_chars": [int(nc.min())], "max_chars": [int(nc.max())]}
        if os.path.exists(path):
            try:
                if pq.read_metadata(path).num_rows == exp[b]:
                    return pa.table({**row, "skipped": [1]},
                                    schema=stats_schema)
            except Exception:
                pass                       # corrupt shard: rewrite
        g = g.take(pc.sort_indices(
            g, sort_keys=[("n_chars", "ascending"),
                          ("doc_id", "ascending")])).drop_columns("bucket")
        tmp = path + ".tmp"
        pq.write_table(g, tmp)
        os.replace(tmp, path)
        return pa.table({**row, "skipped": [0]}, schema=stats_schema)

    stats = (docs.map_batches(tag, batch_format="pyarrow")
             .groupby("bucket").map_groups(write_bucket,
                                           batch_format="pyarrow")
             .to_pandas().sort_values("bucket"))
    manifest = {
        "format": "parquet-sorted",
        "sort_key": ["n_chars", "doc_id"],
        "n_rows": int(stats["n_rows"].sum()),
        "n_buckets": len(stats),
        "buckets": stats.to_dict("records"),
    }
    tmp = f"{out_dir}/manifest.json.tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest


SORTED_EXPORT_ORACLE_SQL = f"""
WITH h AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY n_chars),
t AS (SELECT sum(c) AS total FROM h),
b AS (SELECT n_chars, c,
             (sum(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) - c)
               * {SORTED_EXPORT_BUCKETS} // total AS bucket
      FROM h, t)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM b GROUP BY bucket
""".strip()


# ---------------------------------------------------------------------------
# Min/max file skipping over the range-partitioned sink

PRUNE_LO, PRUNE_HI = 40, 60     # n_chars range predicate


def pruned_range_scan(sf_dir: str, out_dir: str | None = None,
                      lo: int = PRUNE_LO, hi: int = PRUNE_HI):
    """Predicate-pruned scan over the range-partitioned sorted sink —
    the file-skipping read every table format (Iceberg/Delta/Hudi)
    does with partition stats: consult the manifest's per-shard
    (min_chars, max_chars), OPEN ONLY shards whose range overlaps
    [lo, hi], and count matches inside them. Returns one row:
    (n_match, n_buckets_total, n_buckets_opened, rows_scanned) — all
    deterministic because the bucket rule is the SQL-mirrored
    prefix-scan; n_match must equal the unpruned predicate count (the
    correctness of skipping), rows_scanned < corpus proves I/O was
    actually avoided.

    The sink itself is resumable, so reruns reuse finished shards: the
    scratch dir is keyed by a content fingerprint of the corpus
    (path + mtime + size), so regenerated data never serves stale
    shards.
    """
    import ray.data as rd

    if out_dir is None:
        out_dir = ("/tmp/askg_sorted_cache_"
                   + _source_fingerprint(sf_dir, "documents"))
    manifest = export_sorted_parquet(sf_dir, out_dir)
    buckets = manifest["buckets"]
    opened = [b for b in buckets
              if b["min_chars"] <= hi and b["max_chars"] >= lo]
    rows_scanned = sum(b["n_rows"] for b in opened)

    n_match = 0
    if opened:
        paths = [f"{out_dir}/part-{b['bucket']:05d}.parquet"
                 for b in opened]
        scanned = rd.read_parquet(paths, columns=["n_chars"])

        def count_range(t: pa.Table) -> pa.Table:
            nc = t["n_chars"].to_numpy(zero_copy_only=False)
            n = int(((nc >= lo) & (nc <= hi)).sum())
            return pa.table({"n": pa.array([n], pa.int64())})

        from ray.data.aggregate import Sum

        agg = (scanned.map_batches(count_range, batch_format="pyarrow")
               .aggregate(Sum("n")))
        n_match = int(agg["sum(n)"] or 0)

    return pa.table({
        "n_match": pa.array([n_match], pa.int64()),
        "n_buckets_total": pa.array([len(buckets)], pa.int64()),
        "n_buckets_opened": pa.array([len(opened)], pa.int64()),
        "rows_scanned": pa.array([rows_scanned], pa.int64()),
    })


PRUNED_SCAN_ORACLE_SQL = f"""
WITH h AS (SELECT n_chars, count(*) AS c FROM documents GROUP BY n_chars),
t AS (SELECT sum(c) AS total FROM h),
b AS (SELECT n_chars, c,
             (sum(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) - c)
               * {SORTED_EXPORT_BUCKETS} // total AS bucket
      FROM h, t),
pb AS (SELECT bucket, sum(c) AS n_rows, min(n_chars) AS mn,
              max(n_chars) AS mx
       FROM b GROUP BY bucket),
op AS (SELECT * FROM pb WHERE mn <= {PRUNE_HI} AND mx >= {PRUNE_LO})
SELECT
  CAST((SELECT count(*) FROM documents
        WHERE n_chars BETWEEN {PRUNE_LO} AND {PRUNE_HI}) AS BIGINT)
      AS n_match,
  CAST((SELECT count(*) FROM pb) AS BIGINT) AS n_buckets_total,
  CAST((SELECT count(*) FROM op) AS BIGINT) AS n_buckets_opened,
  CAST((SELECT coalesce(sum(n_rows), 0) FROM op) AS BIGINT)
      AS rows_scanned
""".strip()


# ---------------------------------------------------------------------------
# IVF-partitioned vector index sink + list-pruned query

IVF_EXPORT_LISTS = 16


def export_ivf_index(sf_dir: str, out_dir: str,
                     n_lists: int = IVF_EXPORT_LISTS) -> dict:
    """Persist the embeddings as an IVF-PARTITIONED Parquet index: one
    shard per coarse-quantizer list (nearest codebook centroid by
    cosine, the exact assignment ``ops/similarity.ann_ivf`` uses), so
    a later query opens only its probed lists — the build-once/
    query-many split of a disk ANN index, expressed as the same
    resumable partitioned sink as ``export_sorted_parquet``: each list
    writes atomically (tmp + rename), a rerun probes the existing
    shard's footer row count and SKIPS finished lists, and the
    manifest records per-list counts for the pruned reader. The
    codebook is the deterministic bounded-sample spherical k-means
    (≤2048 driver-side vectors at ANY corpus size); assignment is one
    GEMM per batch against the broadcast codebook."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..arrowutil import list_col_matrix
    from ..ops.similarity import _ivf_centroids

    from ..rayutil import parquet_num_rows

    os.makedirs(out_dir, exist_ok=True)
    if parquet_num_rows(f"{sf_dir}/embeddings.parquet") == 0:
        manifest = {"format": "parquet-ivf", "n_lists_trained": 0,
                    "n_rows": 0, "lists": []}
        with open(f"{out_dir}/manifest.json", "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        return manifest
    C = _ivf_centroids(sf_dir, n_lists)
    cref = ray.put(C)

    embs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding", "label"])

    def tag(t: pa.Table) -> pa.Table:
        import numpy as np
        Cm = ray.get(cref)
        vecs = list_col_matrix(t["embedding"])
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True),
                           1e-12)
        assign = np.argmax((vecs / norms) @ Cm.T, axis=1).astype(np.int64)
        return t.append_column("list_id", pa.array(assign, pa.int64()))

    stats_schema = pa.schema([("list_id", pa.int64()),
                              ("n_rows", pa.int64()),
                              ("skipped", pa.int64())])

    def write_list(g: pa.Table) -> pa.Table:
        lid = int(g["list_id"][0].as_py())
        path = f"{out_dir}/list-{lid:05d}.parquet"
        if os.path.exists(path):
            try:
                if pq.read_metadata(path).num_rows == g.num_rows:
                    return pa.table({"list_id": [lid],
                                     "n_rows": [g.num_rows],
                                     "skipped": [1]}, schema=stats_schema)
            except Exception:
                pass                      # corrupt shard: rewrite
        g = g.take(pc.sort_indices(g, sort_keys=[("vec_id", "ascending")]))
        tmp = path + ".tmp"
        pq.write_table(g.drop_columns("list_id"), tmp)
        os.replace(tmp, path)
        return pa.table({"list_id": [lid], "n_rows": [g.num_rows],
                         "skipped": [0]}, schema=stats_schema)

    stats = (embs.map_batches(tag, batch_format="pyarrow")
             .groupby("list_id").map_groups(write_list,
                                            batch_format="pyarrow")
             .to_pandas().sort_values("list_id"))
    manifest = {
        "format": "parquet-ivf",
        "n_lists_trained": int(len(C)),
        "n_rows": int(stats["n_rows"].sum()),
        "lists": stats.to_dict("records"),
    }
    tmp = f"{out_dir}/manifest.json.tmp"
    import json
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, f"{out_dir}/manifest.json")
    return manifest


def ivf_index_query(sf_dir: str, out_dir: str | None = None,
                    query_id: int = 0, k: int = 10, n_probe: int = 4,
                    n_lists: int = IVF_EXPORT_LISTS,
                    min_recall: float | None = 0.3):
    """List-pruned ANN over the persisted IVF index: consult the
    manifest, OPEN ONLY the ``n_probe`` shards whose centroids are
    nearest the query (cosine), exact-rerank inside them, and report
    the pruning evidence the same way ``pruned_range_scan`` does —
    one row with the approximate top-1, recall@k vs the exact
    brute-force baseline (RAISES below ``min_recall``, so a degraded
    index fails the driver run loudly), and
    (n_lists_total, n_lists_opened, rows_scanned, n_rows_total)
    proving I/O was skipped. The sink is resumable, so repeated
    queries reuse finished shards (scratch dir keyed by corpus path).
    """
    import hashlib as _hl

    import numpy as np
    import ray.data as rd

    from ..ops.similarity import (_ivf_centroids, _query_vector,
                                  _score_batches, _topk_merge,
                                  ann_bruteforce)

    if out_dir is None:
        out_dir = ("/tmp/askg_ivf_cache_" + _hl.md5(
            f"{_source_fingerprint(sf_dir, 'embeddings')}|{n_lists}"
            .encode()).hexdigest()[:12])
    manifest = export_ivf_index(sf_dir, out_dir, n_lists=n_lists)
    lists = manifest["lists"]

    q = _query_vector(sf_dir, query_id)
    if q is None or not lists:
        # empty index / absent query: degenerate stats row (recall is
        # vacuously perfect, so the floor check cannot fire)
        return pa.table({
            "top1_vec_id": pa.array([-1], pa.int64()),
            "recall_pct": pa.array([100], pa.int64()),
            "n_lists_total": pa.array([len(lists)], pa.int64()),
            "n_lists_opened": pa.array([0], pa.int64()),
            "rows_scanned": pa.array([0], pa.int64()),
            "n_rows_total": pa.array([manifest["n_rows"]], pa.int64()),
        })
    C = _ivf_centroids(sf_dir, n_lists)
    qn = q / max(np.linalg.norm(q), 1e-12)
    ranked = np.argsort(-(C @ qn))
    present = {int(r["list_id"]): int(r["n_rows"]) for r in lists}
    probe = [int(l) for l in ranked if int(l) in present][:n_probe]
    rows_scanned = sum(present[l] for l in probe)

    scanned = rd.read_parquet(
        [f"{out_dir}/list-{l:05d}.parquet" for l in probe],
        columns=["vec_id", "embedding", "label"])
    approx = _topk_merge(_score_batches(scanned, q), query_id, k)
    approx_t = pa.concat_tables(
        list(approx.iter_batches(batch_format="pyarrow")))
    exact_t = pa.concat_tables(
        list(ann_bruteforce(sf_dir, query_id, k)
             .iter_batches(batch_format="pyarrow")))
    exact_ids = set(exact_t["vec_id"].to_pylist())
    hits = sum(1 for v in approx_t["vec_id"].to_pylist()
               if v in exact_ids)
    recall_pct = 100 * hits // max(len(exact_ids), 1)
    if min_recall is not None and recall_pct < 100 * min_recall:
        raise ValueError(
            f"IVF index recall@{k} degraded: {recall_pct}% "
            f"< {100 * min_recall:.0f}%")
    top1 = (int(approx_t["vec_id"][0].as_py())
            if approx_t.num_rows else -1)
    return pa.table({
        "top1_vec_id": pa.array([top1], pa.int64()),
        "recall_pct": pa.array([recall_pct], pa.int64()),
        "n_lists_total": pa.array([len(lists)], pa.int64()),
        "n_lists_opened": pa.array([len(probe)], pa.int64()),
        "rows_scanned": pa.array([rows_scanned], pa.int64()),
        "n_rows_total": pa.array([manifest["n_rows"]], pa.int64()),
    })
