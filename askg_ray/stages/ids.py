"""Global-id uniqueness — deterministic suffix assignment per candidate.

The reference's ``GlobalIDGenerator`` resolves collisions with a
process-global ``used_ids`` set and ``-1/-2`` suffixes
(/root/reference/src/id_standardization.py:18-70). Shared mutable state
doesn't distribute; instead the enrich stage computes each record's
first-applicable candidate (normalize.global_id_candidate) and one
``groupby(gid_candidate).map_groups`` assigns suffixes in canonical
order — first keeps the bare candidate, later ones get ``-1``, ``-2``…
(SURVEY.md §2.2 M19; set-level parity — the reference would instead
fall through to the next tier for tier-1..3 collisions, a rare case).

The original registry-specific id is preserved in ``registry_id``
(the reference stashes it in raw_metadata,
id_standardization.py:171-177).
"""

from __future__ import annotations

import pyarrow as pa

IDS_EXTRA = [("registry_id", pa.string())]


def _assign_run(recs: list[dict]) -> list[dict]:
    """Collision run (≥2 records sharing a candidate): suffix in
    canonical order OF THE ORIGINAL ids (pre-assignment ids live in
    registry_id — the batch-wide pre-pass already set id = candidate)."""
    from ..arrowutil import canon_key

    recs = sorted(recs, key=lambda r: canon_key({**r, "id": r["registry_id"]}))
    cand = recs[0]["gid_candidate"]
    out = []
    for i, r in enumerate(recs):
        r = dict(r)
        r["id"] = cand if i == 0 else f"{cand}-{i}"
        out.append(r)
    return out


def assign_global_ids(nodes, small_max: int | None = None):
    """Collision-free candidates (the vast majority: the reference
    measured 100% unique ids on its corpus) pass through the bucketed
    run split without touching Python; only collision runs pay the
    record round-trip. The vectorized pre-pass moves the original id to
    registry_id and installs the bare candidate as id — exactly right
    for singletons, re-suffixed per run otherwise."""
    from ray.data.dataset import MaterializedDataset

    from ..arrowutil import NODES_SCHEMA
    from .exchange import EXCHANGE_MAX, exchange_merge_runs
    from .runs import merge_runs

    out_schema = NODES_SCHEMA.append(pa.field("registry_id", pa.string()))

    def pre(t: pa.Table) -> pa.Table:
        t = t.append_column("registry_id", t["id"])
        idx = t.schema.get_field_index("id")
        return t.set_column(idx, "id", t["gid_candidate"].cast(pa.string()))

    # entity-scale direct-task exchange (see dedup_exact / exchange.py);
    # materialized inputs only — count free, no lazy double-execution
    small_max = EXCHANGE_MAX if small_max is None else small_max
    n = nodes.count() if isinstance(nodes, MaterializedDataset) else None
    if n is not None and n <= small_max:
        return exchange_merge_runs(nodes, "gid_candidate", _assign_run,
                                   out_schema, pre_fn=pre)

    pre_ds = nodes.map_batches(pre, batch_format="pyarrow")
    return merge_runs(pre_ds, "gid_candidate", _assign_run, out_schema)
