"""Extractor plugin registry — the user-extension surface.

The reference's scraper plugin registry maps a registry source to a
``BaseScraper`` with a shared helper surface
(/root/reference/src/scrapers.py:1282-1287, 94-156). Here the analog is
a ``source_kind → batch extractor`` map: every extractor is a callable
``pa.Table → pa.Table`` usable directly in ``map_batches``, producing
raw entity rows (SURVEY.md §2.12). Register new kinds with
``register_extractor`` before building a pipeline over them.
"""

from __future__ import annotations

import json
from collections.abc import Callable

import pyarrow as pa

from .stages.extract import extract_batch
from .stages.ingest import parse_api_payload, parse_glama_record, parse_repo_json_batch


def _glama_json_batch(batch: pa.Table) -> pa.Table:
    rows = []
    for s in batch["server_json"].to_pylist():
        try:
            rec = parse_glama_record(json.loads(s))
        except (json.JSONDecodeError, TypeError):
            rec = None
        if rec is not None:
            rows.append(rec)
    return pa.Table.from_pylist(rows) if rows else pa.table({})


def _marketplace_json_batch(batch: pa.Table) -> pa.Table:
    rows = []
    for s in batch["payload_json"].to_pylist():
        try:
            rows.extend(parse_api_payload(json.loads(s)))
        except (json.JSONDecodeError, TypeError):
            continue
    return pa.Table.from_pylist(rows) if rows else pa.table({})


EXTRACTORS: dict[str, Callable[[pa.Table], pa.Table]] = {
    "html_page": extract_batch,            # M1/M2 — pages (url, warc_ts, html)
    "github_repo_json": parse_repo_json_batch,   # M3 — column repo_json
    "glama_api_json": _glama_json_batch,         # M10 — column server_json
    "marketplace_json": _marketplace_json_batch,  # M12 — column payload_json
}


def register_extractor(kind: str, fn: Callable[[pa.Table], pa.Table]) -> None:
    EXTRACTORS[kind] = fn


def extractor_for(kind: str) -> Callable[[pa.Table], pa.Table]:
    try:
        return EXTRACTORS[kind]
    except KeyError:
        raise KeyError(f"no extractor registered for source kind {kind!r}; "
                       f"known: {sorted(EXTRACTORS)}") from None
