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
    input_fingerprint,
    load_stage,
    stage_current,
    write_stage,
)

# bump a stage's version when its semantics change — invalidates its
# checkpoint and everything downstream (fingerprints chain).
STAGE_VERSIONS = {
    "entities": "v2",  # v2: + tools capability structs, raw_metadata_json
    "nodes": "v2",
    "edges": "v3",  # v3: dict-encoded src/dst/desc/evidence, hash ids
    "membership": "v1",
}


def run_checkpointed(sf_dir: str, ckpt_dir: str, force: bool = False) -> dict:
    """Returns {stage: Dataset} plus per-stage skip/run info in '_log'."""
    from ..stages.dedup_exact import dedup_exact
    from ..stages.dedup_near import near_dedup
    from ..stages.edges import infer_edges
    from ..stages.ids import assign_global_ids
    from ..pipelines.kg import extract_entities, membership_table
    from ..sources.docs_adapter import pages_from_documents

    os.makedirs(ckpt_dir, exist_ok=True)
    in_fp = input_fingerprint(f"{sf_dir}/documents.parquet")
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

    def build_entities():
        return extract_entities(pages_from_documents(sf_dir))

    ents, fp1 = stage("entities", in_fp, build_entities)

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
