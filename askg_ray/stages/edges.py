"""Relationship inference — blocked self-joins per predicate.

Reproduces the reference's O(n²) pairwise inference
(/root/reference/src/neo4j_integration.py:558-631) as three blocked
self-join families over a slim node projection (never n² globally):

  author blocks   → same_author          (conf 1.0; 574-584)
  category blocks → similar_functionality (conf |∩|/max; 586-599)
                    + alternative_to      (conf 0.6, same language +
                                           shared cats; 616-629)
  op-pair blocks  → complementary        (conf (|∩|/max)·0.8, needs
                                           ≥2 shared ops; 601-614)

Blocks are grid-salted for skew (selfjoin.py). A pair sharing k
categories (or C(k,2) op-pairs) is emitted k times across blocks;
a final ``groupby(id).map_groups(first)`` dedupes — identical rows, so
"first" is trivial. Edge direction: lexicographic by node id
(canonical substitute for the reference's input-index order,
SURVEY.md §2.11). Evidence value lists are sorted (the reference
iterates Python sets — process-randomized order).
"""

from __future__ import annotations

from itertools import combinations

import pyarrow as pa

from ..arrowutil import EDGES_SCHEMA
from ..vocab import REL_ALTERNATIVE, REL_COMPLEMENTARY, REL_SAME_AUTHOR, REL_SIMILAR
from .selfjoin import blocked_self_join

_SLIM = ["id", "author", "categories", "operations", "implementation_language"]


def _slim_schema(extra_type: pa.DataType) -> pa.Schema:
    return pa.schema([
        ("block_key", extra_type),
        ("id", pa.string()),
        ("author", pa.string()),
        ("categories", pa.list_(pa.string())),
        ("operations", pa.list_(pa.string())),
        ("implementation_language", pa.string()),
    ])


def _explode_by(colname: str):
    """Emit one slim row per block value (author / category / op-pair)."""

    def fn(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c].to_pylist() for c in _SLIM}
        out = {c: [] for c in _SLIM}
        out["block_key"] = []
        for i in range(batch.num_rows):
            if colname == "author":
                a = cols["author"][i]
                keys = [a] if a else []
            elif colname == "categories":
                keys = cols["categories"][i] or []
            else:  # op-pairs
                ops = sorted(set(cols["operations"][i] or []))
                keys = [f"{x}+{y}" for x, y in combinations(ops, 2)]
            for k in keys:
                out["block_key"].append(k)
                for c in _SLIM:
                    out[c].append(cols[c][i])
        schema = _slim_schema(pa.string())
        return pa.table({n: pa.array(out[n], schema.field(n).type)
                         for n in schema.names}, schema=schema)

    return fn


def _same_author_pair(r1: dict, r2: dict) -> list[dict]:
    a1, a2 = r1.get("author"), r2.get("author")
    if not (a1 and a2 and a1 == a2):
        return []
    return [{
        "id": f"{r1['id']}_same_author_{r2['id']}",
        "src": r1["id"], "dst": r2["id"], "rel_type": REL_SAME_AUTHOR,
        "confidence": 1.0,
        "description": f"Both servers created by {a1}",
        "evidence": [f"Author: {a1}"],
    }]


def _category_pair(r1: dict, r2: dict) -> list[dict]:
    c1, c2 = r1.get("categories") or [], r2.get("categories") or []
    common = sorted(set(c1) & set(c2))
    if not common:
        return []
    edges = [{
        "id": f"{r1['id']}_similar_{r2['id']}",
        "src": r1["id"], "dst": r2["id"], "rel_type": REL_SIMILAR,
        "confidence": len(common) / max(len(c1), len(c2)),
        "description": f"Share {len(common)} common categories",
        "evidence": [f"Common categories: {', '.join(common)}"],
    }]
    l1, l2 = r1.get("implementation_language"), r2.get("implementation_language")
    if l1 and l2 and l1 == l2:
        edges.append({
            "id": f"{r1['id']}_alternative_{r2['id']}",
            "src": r1["id"], "dst": r2["id"], "rel_type": REL_ALTERNATIVE,
            "confidence": 0.6,
            "description": f"Alternative implementations in {l1}",
            "evidence": [f"Same language: {l1}", "Similar categories"],
        })
    return edges


def _complementary_pair(r1: dict, r2: dict) -> list[dict]:
    o1, o2 = r1.get("operations") or [], r2.get("operations") or []
    common = sorted(set(o1) & set(o2))
    if len(common) < 2:
        return []
    return [{
        "id": f"{r1['id']}_complementary_{r2['id']}",
        "src": r1["id"], "dst": r2["id"], "rel_type": REL_COMPLEMENTARY,
        "confidence": (len(common) / max(len(o1), len(o2))) * 0.8,
        "description": f"Share {len(common)} common operations",
        "evidence": [f"Common operations: {', '.join(common)}"],
    }]


def _dedupe_first(batch: pa.Table) -> pa.Table:
    return batch.slice(0, 1)


def infer_edges(nodes, cap: int = 400):
    """nodes (final canonical) → edges Dataset (EDGES_SCHEMA)."""
    from ..rayutil import compact
    slim = compact(nodes.select_columns(_SLIM))  # 3 explode consumers
    fams = [
        (slim.map_batches(_explode_by("author"), batch_format="pyarrow"),
         _same_author_pair),
        (slim.map_batches(_explode_by("categories"), batch_format="pyarrow"),
         _category_pair),
        (slim.map_batches(_explode_by("oppairs"), batch_format="pyarrow"),
         _complementary_pair),
    ]
    edge_sets = [blocked_self_join(ex, fn, EDGES_SCHEMA, cap=cap)
                 for ex, fn in fams]
    all_edges = compact(edge_sets[0].union(*edge_sets[1:]))
    return all_edges.groupby("id").map_groups(_dedupe_first, batch_format="pyarrow")
