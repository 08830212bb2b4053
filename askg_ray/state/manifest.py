"""Per-stage Parquet checkpoints with lineage manifests.

The engine's resume story (north_rule: "resumable from checkpoint with
per-partition lineage + metrics"; replaces the reference's master-data
mtime checks, /root/reference/src/master_data.py:29-124):

  <ckpt_dir>/<stage>/data/*.parquet      the materialized stage output
  <ckpt_dir>/<stage>/manifest.json       lineage + metrics

A manifest records the input fingerprint (chained: each stage's
fingerprint folds in its upstream's), the stage version (bump the
constant when stage semantics change), row count, per-file partition
list, and wall-time metrics. ``stage_current`` compares fingerprints —
a rerun skips every stage whose manifest matches, and the write is
atomic (temp dir + rename) so a killed run never leaves a half-written
stage that passes the check.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def fingerprint(*parts: str) -> str:
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def input_fingerprint(path: str) -> str:
    """Fingerprint of an input file/dir: path + size + mtime per file."""
    entries = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in sorted(files):
                p = os.path.join(root, f)
                st = os.stat(p)
                entries.append(f"{p}:{st.st_size}:{int(st.st_mtime)}")
    else:
        st = os.stat(path)
        entries.append(f"{path}:{st.st_size}:{int(st.st_mtime)}")
    return fingerprint(*entries)


def _manifest_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "manifest.json")


def stage_current(stage_dir: str, fp: str, version: str) -> bool:
    try:
        with open(_manifest_path(stage_dir)) as f:
            m = json.load(f)
        return m.get("fingerprint") == fp and m.get("stage_version") == version
    except (OSError, json.JSONDecodeError):
        return False


def write_stage(ds, stage_dir: str, fp: str, version: str,
                metrics: dict | None = None):
    """Atomically write ds + manifest; returns the reloaded Dataset."""
    import ray.data as rd

    tmp = stage_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
    t0 = time.time()
    ds.write_parquet(os.path.join(tmp, "data"))
    wall = round(time.time() - t0, 3)
    out = rd.read_parquet(os.path.join(tmp, "data"))
    rows = out.count()
    # per-partition lineage: file → (bytes, sha256), the S3-checksum
    # analog (/root/reference/src/scrapers.py:90-91) at file granularity
    parts = {}
    for fname in sorted(os.listdir(os.path.join(tmp, "data"))):
        fpath = os.path.join(tmp, "data", fname)
        h = hashlib.sha256()
        with open(fpath, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        parts[fname] = {"bytes": os.path.getsize(fpath),
                        "sha256": h.hexdigest()}
    manifest = {
        "fingerprint": fp,
        "stage_version": version,
        "rows": rows,
        "partitions": parts,
        "metrics": dict(metrics or {}, write_wall_s=wall),
    }
    with open(_manifest_path(tmp), "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, stage_dir) if not os.path.exists(stage_dir) else None
    if os.path.exists(tmp):  # os.replace on dirs fails if target exists
        shutil.move(tmp, stage_dir)
    return rd.read_parquet(os.path.join(stage_dir, "data"))


def load_stage(stage_dir: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(stage_dir, "data"))


def read_manifest(stage_dir: str) -> dict:
    with open(_manifest_path(stage_dir)) as f:
        return json.load(f)
