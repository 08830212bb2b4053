"""CSV registry-dump source (SURVEY §2.1 S4 family, third format).

Catalog exports also ship as flat CSV (name, author, repository,
description, language columns). Read with ``ray.data.read_csv``
(parallel by file, schema from Arrow's CSV reader) and project rows
through the SAME id/guard conventions as the JSON projectors
(stages/ingest.parse_glama_record's name guard and slug id), emitting
the extractor's entity schema so the one downstream pipeline serves
all three formats (Parquet / JSONL / CSV) unchanged. Nameless rows are
dropped, mirroring the projector guard.
"""

from __future__ import annotations

import pyarrow as pa

from .jsonl import DUMP_TS, ENTITY_SCHEMA

# the flat columns a CSV catalog can carry → entity field they fill
_CSV_FIELDS = ["name", "author", "description", "repository",
               "implementation_language", "version", "homepage",
               "license"]


def _project_csv(batch: pa.Table, registry: str) -> pa.Table:
    cols = {c: (batch[c].to_pylist() if c in batch.column_names
                else [None] * batch.num_rows)
            for c in _CSV_FIELDS}
    recs = []
    for i in range(batch.num_rows):
        name = cols["name"][i]
        if not name or not str(name).strip():
            continue  # projector name guard
        name = str(name)
        slug = name.lower().replace(" ", "_").replace("-", "_")
        recs.append({
            "id": f"{registry}_csv_{slug}",
            "name": name,
            **{f: (str(cols[f][i]) if cols[f][i] is not None else None)
               for f in _CSV_FIELDS[1:]},
            "version": (str(cols["version"][i])
                        if cols["version"][i] is not None else "1.0.0"),
            "registry_source": registry,
            "source_url": f"https://{registry}.example/csv/{slug}",
        })
    arrays = [
        pa.array([r.get("source_url") for r in recs], pa.string()),
        pa.array([DUMP_TS] * len(recs), pa.timestamp("us")),
    ] + [pa.array([r.get(name) for r in recs], typ)
         for name, typ in zip(ENTITY_SCHEMA.names[2:],
                              ENTITY_SCHEMA.types[2:])]
    return pa.Table.from_arrays(arrays, schema=ENTITY_SCHEMA)


def read_registry_csv(path: str, registry: str = "catalog"):
    """CSV dump → entity rows (ENTITY_SCHEMA), pipeline-compatible."""
    import ray.data as rd

    return rd.read_csv(path).map_batches(
        lambda t: _project_csv(t, registry), batch_format="pyarrow")
