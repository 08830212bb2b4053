"""Checkpointed pipeline runner — manifest-diffing resume.

Runs the KG build as a chain of checkpointed stages; a rerun skips
every stage whose manifest fingerprint (chained over inputs + stage
versions) still matches — the distributed replacement for the
reference's master-data currency check
(/root/reference/src/master_data.py:29-91, SURVEY.md §3.2).

On a real cluster this module is the ``ray job submit`` entry point
(``python -m askg_ray.pipelines.runner <sf_dir> <ckpt_dir>``); the
driver stays thin — every stage is Dataset-level.
"""

from __future__ import annotations

import os
import time

from ..state.manifest import (
    fingerprint,
    load_stage,
    stage_current,
    write_stage,
)

# bump a stage's version when its semantics change — invalidates its
# checkpoint and everything downstream (fingerprints chain).
STAGE_VERSIONS = {
    "entities": "v3",  # v3: partition-grain incremental re-extraction
    "nodes": "v2",
    "edges": "v3",  # v3: dict-encoded src/dst/desc/evidence, hash ids
    "membership": "v1",
}

# extraction re-runs at this hash-partition grain on a changed corpus
# (doc_id % INCR_PARTITIONS); at 100 TB the grain maps to input shards
INCR_PARTITIONS = 16


def _partition_fingerprints(sf_dir: str, n_parts: int) -> dict[int, str]:
    """Order-insensitive content fingerprint PER doc_id-hash partition,
    computed distributedly: each batch folds (doc_id, lang, text) into
    per-partition (count, id-sum, content-hash-sum) partials, one tiny
    groupby sums them — the snapshot-diff primitive
    (ops/joins.documents_snapshot_diff) at partition grain, so a rerun
    knows WHICH partitions changed without reading the old corpus."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..rayutil import parquet_num_rows

    if parquet_num_rows(f"{sf_dir}/documents.parquet") == 0:
        return {}

    MOD = (1 << 61) - 1

    # Partial sums are split into 32-bit halves so Ray's Sum aggregator
    # never overflows int64: a per-batch partial bounded by 2^61 summed
    # over batches exceeded 2^63 at sf0.1 and crashed the reduce with
    # an ArrowConversionError (latent round-4 bug, found+fixed round 5).
    # Each half sums to < 2^32 × n_batches — safe to ~2^31 batches —
    # and the driver recombines (hi·2^32 + lo) % MOD per partition.
    def partials(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        parts = ids % n_parts
        h = np.array([int.from_bytes(hashlib.md5(
            f"{i}|{lg or ''}|{tx or ''}".encode()).digest()[:7], "big")
            for i, lg, tx in zip(ids.tolist(), t["lang"].to_pylist(),
                                 t["text"].to_pylist())], dtype=np.int64)
        cols: dict[str, list] = {k: [] for k in (
            "part", "n", "id_lo", "id_hi", "h_lo", "h_hi")}
        for p in np.unique(parts):
            m = parts == p
            i_s = int(ids[m].sum() % MOD)
            h_s = int(h[m].sum() % MOD)
            cols["part"].append(int(p))
            cols["n"].append(int(m.sum()))
            cols["id_lo"].append(i_s & 0xFFFFFFFF)
            cols["id_hi"].append(i_s >> 32)
            cols["h_lo"].append(h_s & 0xFFFFFFFF)
            cols["h_hi"].append(h_s >> 32)
        return pa.table({k: pa.array(v, pa.int64())
                         for k, v in cols.items()})

    agg = (rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "lang", "text"])
           .map_batches(partials, batch_format="pyarrow")
           .groupby("part").aggregate(
               Sum("n", alias_name="n"),
               Sum("id_lo", alias_name="id_lo"),
               Sum("id_hi", alias_name="id_hi"),
               Sum("h_lo", alias_name="h_lo"),
               Sum("h_hi", alias_name="h_hi")))
    out = {}
    for r in agg.take_all():
        id_sum = ((int(r["id_hi"]) << 32) + int(r["id_lo"])) % MOD
        h_sum = ((int(r["h_hi"]) << 32) + int(r["h_lo"])) % MOD
        out[int(r["part"])] = fingerprint(
            str(r["n"]), str(id_sum), str(h_sum), str(n_parts))
    return out


def incremental_entities(sf_dir: str, ckpt_dir: str,
                         n_partitions: int = INCR_PARTITIONS,
                         force: bool = False):
    """Partition-grain incremental extraction (reference S7 semantics,
    /root/reference/src/master_data.py:29-91, at partition grain): the
    corpus hash-partitions by doc_id; each partition's entity output is
    its own checkpointed stage keyed by that partition's CONTENT
    fingerprint, so a changed corpus re-extracts only the partitions
    the snapshot diff flags — untouched partitions load from Parquet.

    Returns (entities Dataset, chained fingerprint, per-partition log).
    """
    from ..pipelines.kg import extract_entities
    from ..sources.docs_adapter import KG_PAGE_COLUMNS, pages_from_documents

    version = STAGE_VERSIONS["entities"]
    fps = _partition_fingerprints(sf_dir, n_partitions)
    plog = []
    parts_ds = []
    for k in range(n_partitions):
        fp = fps.get(k)
        if fp is None:          # no docs hash here: nothing to extract
            plog.append({"part": k, "empty": True})
            continue
        pdir = os.path.join(ckpt_dir, "entities", f"part-{k:04d}")
        if not force and stage_current(pdir, fp, version):
            plog.append({"part": k, "skipped": True})
            parts_ds.append(load_stage(pdir))
            continue
        t0 = time.time()
        ds = extract_entities(pages_from_documents(
            sf_dir, partition=(k, n_partitions),
            columns=KG_PAGE_COLUMNS))
        ds = write_stage(ds, pdir, fp, version,
                         metrics={"build_wall_s": round(time.time() - t0, 3)})
        plog.append({"part": k, "skipped": False,
                     "wall_s": round(time.time() - t0, 3)})
        parts_ds.append(ds)

    combined_fp = fingerprint(version, str(n_partitions),
                              *[fps.get(k, "-") for k in range(n_partitions)])
    if not parts_ds:
        # empty corpus: run the extraction once over the (empty) input
        # so the empty-table schema matches the from-scratch build
        return (extract_entities(pages_from_documents(
                    sf_dir, columns=KG_PAGE_COLUMNS)),
                combined_fp, plog)
    ents = parts_ds[0]
    for p in parts_ds[1:]:
        ents = ents.union(p)
    return ents, combined_fp, plog


def run_checkpointed(sf_dir: str, ckpt_dir: str, force: bool = False) -> dict:
    """Returns {stage: Dataset} plus per-stage skip/run info in '_log'."""
    from ..stages.dedup_exact import dedup_exact
    from ..stages.dedup_near import near_dedup
    from ..stages.edges import infer_edges
    from ..stages.ids import assign_global_ids
    from ..pipelines.kg import membership_table

    os.makedirs(ckpt_dir, exist_ok=True)
    log: list[dict] = []
    out: dict = {"_log": log}

    def stage(name: str, parent_fp: str, build):
        fp = fingerprint(parent_fp, name, STAGE_VERSIONS[name])
        sdir = os.path.join(ckpt_dir, name)
        if not force and stage_current(sdir, fp, STAGE_VERSIONS[name]):
            log.append({"stage": name, "skipped": True})
            return load_stage(sdir), fp
        t0 = time.time()
        ds = build()
        ds = write_stage(ds, sdir, fp, STAGE_VERSIONS[name],
                         metrics={"build_wall_s": round(time.time() - t0, 3)})
        log.append({"stage": name, "skipped": False,
                    "wall_s": round(time.time() - t0, 3)})
        return ds, fp

    # extraction is INCREMENTAL at partition grain: only partitions the
    # content-fingerprint diff flags re-extract; the rest load from
    # their per-partition checkpoints. Downstream stages chain off the
    # combined fingerprint (dedup/ids are global by semantics, so they
    # rebuild whenever ANY partition changed — and skip entirely when
    # none did).
    ents, fp1, plog = incremental_entities(sf_dir, ckpt_dir, force=force)
    n_ran = sum(1 for p in plog if p.get("skipped") is False)
    log.append({"stage": "entities",
                "skipped": n_ran == 0,
                "partitions_ran": n_ran,
                "partitions": plog})

    def build_nodes():
        # same single-pass near-dedup path as pipelines/kg.canonical_nodes:
        # the exact-dedup output is compacted (near_dedup consumes its
        # input multiple times — candidate generation + tag passes; an
        # unpinned lazy chain would re-run the exact-dedup shuffles 3×)
        from ..rayutil import compact
        d1 = compact(dedup_exact(compact(ents)))
        d3 = near_dedup(d1)  # fuzzy drop + cross-registry merge, one pass
        # materialized input → one-task small path at entity scale
        return assign_global_ids(compact(d3))

    nodes, fp2 = stage("nodes", fp1, build_nodes)

    edges, _ = stage("edges", fp2, lambda: infer_edges(nodes))
    membership, _ = stage("membership", fp2, lambda: membership_table(nodes))

    out.update({"entities": ents, "nodes": nodes, "edges": edges,
                "membership": membership})
    return out


def main(argv: list[str]) -> int:
    import json

    import ray

    args = [a for a in argv[1:] if not a.startswith("--")]
    flags = {a.split("=", 1)[0]: (a.split("=", 1) + [""])[1]
             for a in argv[1:] if a.startswith("--")}
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    ckpt = args[1] if len(args) > 1 else "/tmp/askg_ckpt"
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    out = run_checkpointed(sf_dir, ckpt)
    log = {"stages": out["_log"],
           "nodes": out["nodes"].count(),
           "edges": out["edges"].count()}
    if "--export-neo4j" in flags:
        # offline graph sink: --export-neo4j=DIR writes the neo4j-admin
        # bulk-import layout next to the parquet checkpoints
        from .export import export_neo4j_bulk
        dest = flags["--export-neo4j"] or os.path.join(ckpt, "neo4j_bulk")
        log["neo4j_bulk"] = {"dir": dest, **export_neo4j_bulk(out, dest)}
    print(json.dumps(log))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    import sys

    raise SystemExit(main(sys.argv))
