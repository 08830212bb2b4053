"""Graph-side analysis aggregates (SURVEY.md §2.7 A5/A9, §2.2 M20).

All are partial-aggregate patterns: per-batch null/field counters emit
one partial row per (registry) per batch, then a small groupby sums the
partials — the pre-aggregation shape that keeps the shuffle tiny at any
corpus size (analyze_deduplication.py:183-207; id_standardization.py:
208-247 in /root/reference)."""

from __future__ import annotations

import pyarrow as pa

_FIELDS = ["description", "author", "repository", "homepage", "version",
           "license", "implementation_language"]


def completeness_by_registry(nodes):
    """A5: per-registry field-presence counts (percentages derivable)."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        import collections
        regs = t["registry_source"].to_pylist()
        counters: dict[str, collections.Counter] = {}
        totals: collections.Counter = collections.Counter()
        for i, reg in enumerate(regs):
            totals[reg] += 1
        cols = {f: t[f].to_pylist() for f in _FIELDS}
        for f in _FIELDS:
            for i, reg in enumerate(regs):
                if cols[f][i]:
                    counters.setdefault(f, collections.Counter())[reg] += 1
        out_rows = []
        for reg in totals:
            row = {"registry_source": reg, "n_rows": totals[reg]}
            for f in _FIELDS:
                row[f"n_{f}"] = counters.get(f, {}).get(reg, 0)
            out_rows.append(row)
        schema = pa.schema([("registry_source", pa.string()),
                            ("n_rows", pa.int64())] +
                           [(f"n_{f}", pa.int64()) for f in _FIELDS])
        return pa.table({n: [r.get(n, 0) for r in out_rows]
                         for n in schema.names}, schema=schema)

    partial = nodes.map_batches(partials, batch_format="pyarrow")
    aggs = [Sum("n_rows", alias_name="n_rows")] + \
        [Sum(f"n_{f}", alias_name=f"n_{f}") for f in _FIELDS]
    return partial.groupby("registry_source").aggregate(*aggs)


def id_tier_histogram(nodes):
    """M20: global-id shape analysis — per-tier count plus 3 example ids
    (the reference prints 3 examples per tier,
    /root/reference/src/id_standardization.py:208-247). Partial rows per
    batch (count + 3 smallest ids) keep the shuffle at tiers×batches."""
    _SCHEMA = pa.schema([("gid_tier", pa.int32()), ("n", pa.int64()),
                         ("examples", pa.string())])

    def partials(t: pa.Table) -> pa.Table:
        by_tier: dict[int, list] = {}
        for tier, nid in zip(t["gid_tier"].to_pylist(), t["id"].to_pylist()):
            by_tier.setdefault(tier, []).append(nid)
        rows = [(tier, len(ids), ",".join(sorted(ids)[:3]))
                for tier, ids in sorted(by_tier.items())]
        return pa.table({"gid_tier": [r[0] for r in rows],
                         "n": [r[1] for r in rows],
                         "examples": [r[2] for r in rows]}, schema=_SCHEMA)

    def fold(t: pa.Table) -> pa.Table:
        tier = t["gid_tier"][0].as_py()
        n = sum(t["n"].to_pylist())
        ex = sorted({e for s in t["examples"].to_pylist()
                     for e in s.split(",") if e})[:3]
        return pa.table({"gid_tier": [tier], "n": [n],
                         "examples": [",".join(ex)]}, schema=_SCHEMA)

    return (nodes.select_columns(["gid_tier", "id"])
            .map_batches(partials, batch_format="pyarrow")
            .groupby("gid_tier").map_groups(fold, batch_format="pyarrow"))


def dedup_stats(pages, entities, nodes):
    """A4: input/entity/unique counts + dedup rate
    (/root/reference/src/deduplication.py:90-114, main.py:140-143).
    Counts are Dataset.count() — O(1) on materialized inputs."""
    import ray.data as rd

    n_pages = pages.count()
    n_entities = entities.count()
    n_nodes = nodes.count()
    removed = n_entities - n_nodes
    t = pa.table({
        "n_pages": pa.array([n_pages], pa.int64()),
        "n_entities": pa.array([n_entities], pa.int64()),
        "n_unique": pa.array([n_nodes], pa.int64()),
        "n_removed": pa.array([removed], pa.int64()),
        "dedup_rate_pct": pa.array(
            [round(removed / n_entities * 100, 1) if n_entities else 0.0],
            pa.float64()),
    })
    return rd.from_arrow(t)


def sample_per_registry(nodes, n: int = 10):
    """O5 (/root/reference/src/run_sample_deduplication.py:23-68):
    first n records per registry — "first" in canonical order so the
    sample is deterministic across runs and block layouts."""
    def head_n(t: pa.Table) -> pa.Table:
        import pandas as pd  # noqa: F401
        from ..arrowutil import sort_canonical
        recs = sort_canonical(t.to_pylist())[:n]
        return pa.Table.from_pylist(recs, schema=t.schema)

    return (nodes.select_columns(["id", "name", "registry_source",
                                  "reg_prio", "warc_ts", "source_url"])
            .groupby("registry_source")
            .map_groups(head_n, batch_format="pyarrow"))
