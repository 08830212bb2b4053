"""Checkpoint/resume: manifest-diffing skips finished stages and
re-running produces identical outputs (SURVEY.md §5 item (e))."""

import json
import os
import shutil


def _edge_set(ds):
    return {(r["src"], r["rel_type"], r["dst"])
            for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()}


def test_checkpoint_resume(ray_session, tmp_path_factory):
    from askg_ray.pipelines.runner import run_checkpointed

    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    sf = "/root/testdata/sf0.001"

    out1 = run_checkpointed(sf, ckpt)
    assert all(not s["skipped"] for s in out1["_log"])
    edges1 = _edge_set(out1["edges"])
    nodes1 = out1["nodes"].count()

    # full rerun: every stage skipped, outputs identical
    out2 = run_checkpointed(sf, ckpt)
    assert all(s["skipped"] for s in out2["_log"]), out2["_log"]
    assert _edge_set(out2["edges"]) == edges1
    assert out2["nodes"].count() == nodes1

    # simulate a killed run: edges stage lost → only it re-runs
    shutil.rmtree(os.path.join(ckpt, "edges"))
    out3 = run_checkpointed(sf, ckpt)
    skipped = {s["stage"]: s["skipped"] for s in out3["_log"]}
    assert skipped == {"entities": True, "nodes": True,
                       "edges": False, "membership": True}
    assert _edge_set(out3["edges"]) == edges1

    # manifests carry lineage + metrics
    with open(os.path.join(ckpt, "nodes", "manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] == nodes1
    from askg_ray.pipelines.runner import STAGE_VERSIONS
    assert m["stage_version"] == STAGE_VERSIONS["nodes"]
    assert m["partitions"]
    assert "build_wall_s" in m["metrics"]

    # input change invalidates everything (fingerprint chain)
    from askg_ray.state.manifest import stage_current
    assert not stage_current(os.path.join(ckpt, "nodes"), "other-fp", "v1")
