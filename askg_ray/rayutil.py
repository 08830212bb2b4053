"""Ray-side physical-layout helpers.

Ray's sort-based shuffle schedules O(blocks) map + O(blocks) reduce
tasks; a small table fragmented into hundreds of row-scale blocks (the
natural result of unions and per-group map_groups outputs) makes every
subsequent groupby pay seconds of pure scheduling. ``compact()``
repartitions to a CPU-proportional block count before wide ops.

Scale note: block counts here are driven by cluster CPU count because
the entity-scale tables this engine compacts are far smaller than the
pages corpus. For tables where rows × row-width approaches
``target_max_block_size`` × cpus, switch to rows-per-block sizing
(``rows // ROWS_PER_BLOCK``) — ``compact`` takes an optional row count
for exactly that.
"""

from __future__ import annotations

ROWS_PER_BLOCK = 65536
# target bytes per block for shuffle-bound tables: a sort shuffle
# schedules O(M×N) partition fetches, so a 28 MB entity table split
# into 64 row-scale blocks pays ~8 s of pure exchange per groupby
# (measured); at 16 MB/block the same groupby is ~3 s. CPU-bound group
# stages that need task parallelism repartition UP explicitly
# (stages/selfjoin.py) — compact only sets the shuffle-side layout.
TARGET_BLOCK_BYTES = 16 << 20


def default_nblocks() -> int:
    import os

    override = os.environ.get("ASKG_NBLOCKS")
    if override:
        return int(override)
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(4, min(cpus, 32))


def compact(ds, rows: int | None = None):
    """Pin in the object store; right-size blocks for wide ops.

    Materializes first (one plan execution), then repartitions when the
    realized block count is more than 2× the size-derived target:
    ``max(4, bytes/TARGET_BLOCK_BYTES)`` — small (entity-scale) tables
    collapse to a handful of blocks so each subsequent shuffle pays a
    minimal exchange floor; large tables keep proportionally many
    blocks (the target grows with bytes, never capped by CPU count)."""
    m = ds.materialize()
    nbytes = m.size_bytes() or 0
    nb = max(4, -(-nbytes // TARGET_BLOCK_BYTES))
    if rows is not None:
        nb = max(nb, rows // ROWS_PER_BLOCK)
    if m.num_blocks() > nb * 2:
        m = m.repartition(nb).materialize()
    return m


# ---- env-gated stage profiler (ASKG_PROF=1) ------------------------------
# Prints one stderr line per pipeline barrier with elapsed-since-first
# mark, for the width-scaling profiles recorded in BASELINE.md. Zero
# cost when the env var is unset.
import os as _os
import sys as _sys
import time as _time

_PROF_T0: list = []


def prof(label: str) -> None:
    if not _os.environ.get("ASKG_PROF"):
        return
    now = _time.time()
    if not _PROF_T0:
        _PROF_T0.append(now)
    print(f"[prof] {now - _PROF_T0[0]:8.2f} {label}",
          file=_sys.stderr, flush=True)


def parquet_num_rows(*paths: str) -> int:
    """Total rows across parquet files from FILE METADATA — O(1), no
    scan. Zero-row inputs produce datasets with no blocks and therefore
    no schema, which Ray's hash join and some aggregates cannot digest;
    operators reading known files guard with this and short-circuit an
    empty (schema'd) result instead."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)
