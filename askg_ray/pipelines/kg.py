"""End-to-end knowledge-graph construction pipeline.

read pages → extract (map_batches, html dropped immediately) → enrich
(classify + keys) → exact dedup (3 keyed shuffles) → fuzzy dedup
(LSH + components) → cross-registry merge → global ids → edge
inference (blocked self-joins) → nodes/edges/membership tables.

Mirrors the reference lifecycle /root/reference/src/main.py:97-190
(scrape → dedup → categorize → infer → load) with the scrape replaced
by the pages Parquet corpus and the Neo4j load replaced by Parquet
materialization (graph-as-tables, SURVEY.md §2.1 S8-S9).

The post-dedup entity table is materialized between wide stages — it is
the narrow end of the funnel (entities ≪ pages) and each dedup phase
consumes it more than once (candidate generation + tagging). The pages
table itself is never materialized: extraction streams.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.dedup_exact import dedup_exact
from ..stages.dedup_near import near_dedup
from ..stages.edges import infer_edges
from ..stages.extract import enrich_batch, entities_only, extract_batch, texts_only
from ..stages.ids import assign_global_ids

MEMBERSHIP_SCHEMA = pa.schema([
    ("server_id", pa.string()),
    ("category_id", pa.string()),
])


def extract_entities(pages):
    """pages → enriched entity rows (stateless map_batches chain)."""
    slim = pages.select_columns(["url", "warc_ts", "html"])
    extracted = slim.map_batches(extract_batch, batch_format="pyarrow")
    return (extracted
            .map_batches(entities_only, batch_format="pyarrow")
            .map_batches(enrich_batch, batch_format="pyarrow"))


def extract_texts(pages):
    """pages → (url, text) — the byte-identical invariant surface."""
    slim = pages.select_columns(["url", "warc_ts", "html"])
    return (slim.map_batches(extract_batch, batch_format="pyarrow")
            .map_batches(texts_only, batch_format="pyarrow"))


def canonical_nodes(pages):
    """pages → deduplicated, globally-id'd nodes table.

    Materialization policy: this function owns every pin — one per
    wide phase, at the narrow (entity-scale) end of the funnel. The
    stage functions themselves are pure lazy chains."""
    from ..rayutil import compact, prof
    prof("extract:start")
    ents = compact(extract_entities(pages))
    prof("extract:pinned")
    d1 = compact(dedup_exact(ents))
    prof("dedup_exact:pinned")
    d3 = near_dedup(d1)  # fuzzy + cross-registry from one candidate pass
    # compact BEFORE id assignment: a materialized input lets
    # assign_global_ids take its one-task small path (no groupby
    # shuffle) at entity scale — the extra pin costs ~1 barrier, the
    # avoided sort-shuffle several
    out = compact(assign_global_ids(compact(d3)))
    prof("global_ids:pinned")
    return out


def _explode_membership(batch: pa.Table) -> pa.Table:
    """List explode via Arrow offsets — ``list_parent_indices`` names
    each flattened value's source row; no per-row Python loop."""
    import pyarrow.compute as pc

    cats = batch["categories"].combine_chunks()
    parents = pc.list_parent_indices(cats)
    return pa.table({
        "server_id": pc.take(batch["id"].combine_chunks(), parents),
        "category_id": pc.list_flatten(cats).cast(pa.string()),
    }, schema=MEMBERSHIP_SCHEMA)


def membership_table(nodes):
    """J2 semi-join-by-explode (/root/reference/src/main.py:149-163)."""
    return (nodes.select_columns(["id", "categories"])
            .map_batches(_explode_membership, batch_format="pyarrow"))


def build_kg(pages, edge_cap: int = 400,
             max_out_degree: int | None = None) -> dict:
    """Full build. Returns dict of Datasets: nodes, edges, membership.

    ``max_out_degree``: optional scale-run edge truncation (see
    stages/edges.infer_edges); None = exact reference parity."""
    nodes = canonical_nodes(pages)
    # edges stay LAZY: they are the quadratic-in-block-size output (4 GB
    # at the repl=24 bench corpus, unboundedly larger at scale) — pinning
    # them in the object store is pure non-scaling memory-bandwidth cost.
    # Consumers stream them into a count/write/aggregate; anything that
    # re-reads them more than once can materialize at its own risk. The
    # upstream nodes table IS pinned, so a re-execution re-runs only the
    # edge inference itself.
    edges = infer_edges(nodes, cap=edge_cap, max_out_degree=max_out_degree)
    return {
        "nodes": nodes,
        "edges": edges,
        "membership": membership_table(nodes).materialize(),
    }


# ---- graph-side aggregates (SURVEY.md §2.7-2.8) -------------------------

def category_histogram(membership):
    """A1/A7: servers per category (main.py:222-229)."""
    return membership.groupby("category_id").count()


def registry_histogram(nodes):
    """A2: servers per registry (main.py:232-239)."""
    return nodes.groupby("registry_source").count()


def language_top10(nodes):
    """A3: top-10 implementation languages (main.py:242-250)."""
    return (nodes.groupby("implementation_language").count()
            .sort("count()", descending=True).limit(10))


def popular_topk(nodes, k: int = 10):
    """O1: ORDER BY popularity DESC LIMIT k (neo4j_integration.py:518-530)."""
    return (nodes.select_columns(["id", "name", "popularity_score"])
            .sort("popularity_score", descending=True).limit(k))
