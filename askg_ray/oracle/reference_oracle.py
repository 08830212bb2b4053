"""Single-process reference-semantics oracle (SURVEY.md §5 item (b)).

A faithful sequential port of the reference's *algorithms* — the
order-dependent streaming dedup (/root/reference/src/deduplication.py:
43-115), the used_ids global-id generator with tier fallthrough
(/root/reference/src/id_standardization.py:22-70) and the O(n²)
pairwise relationship inference (/root/reference/src/neo4j_integration.py:
558-631) — run over the pages corpus in the engine's canonical record
order. The Ray pipeline must match its outputs at triple P/R ≥ 0.95
(BASELINE.json north_rule).

Shares the frozen extractor and the per-pair/merge predicates with the
pipeline (html_extract / classify / normalize / merge) — those are
"one function, two callers" by design; what this oracle checks
independently is the *distributed orchestration*: blocking recall,
shuffle correctness, ordering, suffix assignment.
"""

from __future__ import annotations

from ..arrowutil import sort_canonical
from ..classify import categorize, determine_operations
from ..html_extract import extract_entity
from ..merge import (
    are_highly_similar,
    fuzzy_name_match,
    merge_multiple,
    merge_phase1,
)
from ..normalize import (
    content_hash_md5,
    extract_repository_id,
    name_author_key,
    normalize_id,
    normalize_repository_url,
    content_hash_sha256,
)
from ..vocab import (
    REGISTRY_PRIORITY,
    REL_ALTERNATIVE,
    REL_COMPLEMENTARY,
    REL_SAME_AUTHOR,
    REL_SIMILAR,
    registry_for_url,
)


def extract_records(pages_table) -> list[dict]:
    """pages Arrow table → enriched records in canonical order."""
    recs = []
    for row in pages_table.to_pylist():
        ent = extract_entity(row["url"], row["html"], registry_for_url(row["url"]))
        if ent is None:
            continue
        ent["warc_ts"] = row["warc_ts"]
        ent["categories"] = categorize(ent["name"], ent["description"])
        ent["operations"] = determine_operations(ent["tool_names"])
        ent["reg_prio"] = REGISTRY_PRIORITY.get(ent["registry_source"], 99)
        recs.append(ent)
    return sort_canonical(recs)


def dedup_sequential(records: list[dict]) -> list[dict]:
    """deduplication.py:43-115 — phase-1 streaming first-wins."""
    repo_index: dict[str, dict] = {}
    na_index: dict[str, dict] = {}
    content_index: dict[str, dict] = {}
    uniques: list[dict] = []

    for s in records:
        existing = None
        rk = normalize_repository_url(s.get("repository"))
        nak = name_author_key(s.get("name"), s.get("author"))
        ck = content_hash_md5(s.get("name"), s.get("author"), s.get("description"),
                              s.get("categories"), s.get("operations"))
        is_dup = ((rk is not None and rk in repo_index)
                  or (nak is not None and nak in na_index)
                  or ck in content_index
                  or fuzzy_name_match(s, uniques))
        if is_dup:
            # merge lookup: repo index first, then name+author (264-281);
            # fuzzy/content-only dups are dropped without a merge
            if rk is not None and rk in repo_index:
                existing = repo_index[rk]
            elif nak is not None and nak in na_index:
                existing = na_index[nak]
            if existing is not None:
                merged = merge_phase1(existing, s)
                existing.clear()
                existing.update(merged)  # in-place, indexes keep pointing at it
            continue
        if rk is not None:
            repo_index[rk] = s
        if nak is not None:
            na_index[nak] = s
        content_index[ck] = s
        uniques.append(s)
    return uniques


def merge_similar_sequential(servers: list[dict]) -> list[dict]:
    """deduplication.py:323-373 — phase-2 star-grouping scan."""
    out: list[dict] = []
    processed: set[int] = set()
    for i, s in enumerate(servers):
        if i in processed:
            continue
        sims = [j for j in range(i + 1, len(servers))
                if j not in processed and are_highly_similar(s, servers[j])]
        if sims:
            out.append(merge_multiple([s] + [servers[j] for j in sims]))
            processed.add(i)
            processed.update(sims)
        else:
            out.append(s)
            processed.add(i)
    return out


def assign_global_ids_sequential(servers: list[dict]) -> list[dict]:
    """id_standardization.py:22-70 — used_ids with tier fallthrough."""
    used: set[str] = set()
    out = []
    for s in servers:
        gid = None
        repo_id = extract_repository_id(s.get("repository"))
        if repo_id:
            cand = normalize_id(repo_id)
            if cand and cand not in used:
                gid = cand
        if gid is None and s.get("name") and s.get("author"):
            cand = normalize_id(f"{s['author']}/{s['name']}")
            if cand and cand not in used:
                gid = cand
        if gid is None and s.get("name"):
            cand = normalize_id(s["name"])
            if cand and cand not in used:
                gid = cand
        if gid is None:
            h = content_hash_sha256(s.get("name"), s.get("author"),
                                    s.get("description"), s.get("repository"),
                                    s.get("tool_names"))
            cand = f"server-{h[:12]}"
            gid, counter = cand, 1
            while gid in used:
                gid = f"{cand}-{counter}"
                counter += 1
        used.add(gid)
        s = dict(s)
        s["registry_id"], s["id"] = s["id"], gid
        out.append(s)
    return out


def infer_edges_pairwise(servers: list[dict]) -> list[dict]:
    """neo4j_integration.py:558-631 — O(n²), edge direction by id order."""
    edges = []
    for i in range(len(servers)):
        for j in range(i + 1, len(servers)):
            s1, s2 = servers[i], servers[j]
            if s1["id"] > s2["id"]:
                s1, s2 = s2, s1  # canonical lexicographic direction
            a1, a2 = s1.get("author"), s2.get("author")
            if a1 and a2 and a1 == a2:
                edges.append({"id": f"{s1['id']}_same_author_{s2['id']}",
                              "src": s1["id"], "dst": s2["id"],
                              "rel_type": REL_SAME_AUTHOR, "confidence": 1.0})
            c1, c2 = s1.get("categories") or [], s2.get("categories") or []
            common = set(c1) & set(c2)
            if common:
                edges.append({"id": f"{s1['id']}_similar_{s2['id']}",
                              "src": s1["id"], "dst": s2["id"],
                              "rel_type": REL_SIMILAR,
                              "confidence": len(common) / max(len(c1), len(c2))})
            o1, o2 = s1.get("operations") or [], s2.get("operations") or []
            common_ops = set(o1) & set(o2)
            if len(common_ops) >= 2:
                edges.append({"id": f"{s1['id']}_complementary_{s2['id']}",
                              "src": s1["id"], "dst": s2["id"],
                              "rel_type": REL_COMPLEMENTARY,
                              "confidence": (len(common_ops) / max(len(o1), len(o2))) * 0.8})
            l1, l2 = s1.get("implementation_language"), s2.get("implementation_language")
            if l1 and l2 and l1 == l2 and common:
                edges.append({"id": f"{s1['id']}_alternative_{s2['id']}",
                              "src": s1["id"], "dst": s2["id"],
                              "rel_type": REL_ALTERNATIVE, "confidence": 0.6})
    return edges


def build_kg_oracle(pages_table) -> dict:
    """Full oracle build: nodes + edges + membership, plain Python."""
    recs = extract_records(pages_table)
    uniques = dedup_sequential(recs)
    merged = merge_similar_sequential(uniques)
    final = assign_global_ids_sequential(merged)
    edges = infer_edges_pairwise(final)
    membership = [(s["id"], c) for s in final for c in s.get("categories") or []]
    return {"nodes": final, "edges": edges, "membership": membership}


def triple_set(edges, with_confidence: bool = True) -> set:
    """Comparable (src, pred, dst[, conf]) set; direction normalized."""
    out = set()
    for e in edges:
        src, dst = e["src"], e["dst"]
        if src > dst:
            src, dst = dst, src
        if with_confidence:
            out.add((src, e["rel_type"], dst, round(float(e["confidence"]), 9)))
        else:
            out.add((src, e["rel_type"], dst))
    return out


def precision_recall(pipeline_edges, oracle_edges, with_confidence=True) -> tuple[float, float]:
    p = triple_set(pipeline_edges, with_confidence)
    o = triple_set(oracle_edges, with_confidence)
    if not p and not o:
        return 1.0, 1.0
    inter = len(p & o)
    return (inter / len(p) if p else 0.0,
            inter / len(o) if o else 0.0)
