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
