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

from ..arrowutil import records_of, sort_canonical

IDS_EXTRA = [("registry_id", pa.string())]


def _assign_group(batch: pa.Table) -> pa.Table:
    recs = sort_canonical(records_of(batch))
    cand = recs[0]["gid_candidate"]
    out = []
    for i, r in enumerate(recs):
        r = dict(r)
        r["registry_id"] = r["id"]
        r["id"] = cand if i == 0 else f"{cand}-{i}"
        out.append(r)
    schema = batch.schema
    if "registry_id" not in schema.names:
        schema = schema.append(pa.field("registry_id", pa.string()))
    from ..arrowutil import table_of
    return table_of(out, schema)


def assign_global_ids(nodes):
    return nodes.groupby("gid_candidate").map_groups(
        _assign_group, batch_format="pyarrow")
