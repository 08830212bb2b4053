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
    """Pin in the object store; repartition only when fragmented.

    Materializes first (one plan execution), then repartitions only if
    the realized block count is more than 2× the target — most shuffle
    outputs already land near the target, and skipping the extra
    repartition execution saves ~1-2s of scheduling per call."""
    nb = default_nblocks()
    if rows is not None:
        nb = max(nb, rows // ROWS_PER_BLOCK)
    m = ds.materialize()
    if m.num_blocks() > nb * 2:
        m = m.repartition(nb).materialize()
    return m
