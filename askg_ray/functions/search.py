"""Query-side search API over the nodes/edges tables.

Deterministic reimplementation of the reference's search surface as
pyarrow/Ray ops over the materialized graph tables (the LLM text2cypher
hook is out of scope; the keyword fallback path is the parity target,
SURVEY.md §2.12):

  extract_search_terms   /root/reference/mcp/server.py:314-365
  keyword_search         fallback scorer, src/text2cypher.py:254-305
                         (name hit 10.0, description hit 8.0,
                          popularity*0.001 tiebreak, threshold, sort,
                          limit)
  structured_search      _build_search_query, mcp/server.py:422-471
                         (name 3.0 / desc 2.0 + |matched cats|*2.0 +
                          |matched ops|*1.5 + popularity*0.1)
  similar_servers        neo4j_integration.py:468-488 (common_cats*2 +
                          common_ops + same_author + same_lang)
  server_relationships   neo4j_integration.py:490-501 (by confidence)
  clean_cypher           src/text2cypher.py:131-148 (markdown fences)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# mcp/server.py:323-337 — query-side category keyword table (differs
# from the scraper-side table on purpose; kept verbatim).
SEARCH_CATEGORY_KEYWORDS = {
    "database": ["database", "db", "sql", "nosql", "query", "store"],
    "file_system": ["file", "filesystem", "fs", "storage", "read", "write"],
    "api_integration": ["api", "rest", "graphql", "http", "webhook"],
    "development_tools": ["dev", "development", "tool", "utility"],
    "data_processing": ["process", "transform", "analyze", "etl"],
    "cloud_services": ["cloud", "aws", "azure", "gcp", "s3"],
    "communication": ["chat", "message", "email", "notification"],
    "authentication": ["auth", "login", "oauth", "jwt", "security"],
    "monitoring": ["monitor", "log", "metric", "alert"],
    "search": ["search", "index", "elasticsearch", "lucene"],
    "ai_ml": ["ai", "ml", "machine learning", "model", "prediction"],
}

# mcp/server.py:343-352
SEARCH_OPERATION_KEYWORDS = {
    "read": ["read", "get", "fetch", "retrieve"],
    "write": ["write", "save", "store", "create", "update"],
    "execute": ["execute", "run", "call", "invoke"],
    "query": ["query", "search", "find", "filter"],
    "transform": ["transform", "convert", "process", "analyze"],
    "monitor": ["monitor", "watch", "observe", "track"],
}

# src/text2cypher.py:261 — fallback keyword stoplist, verbatim.
FALLBACK_STOPLIST = {"find", "show", "me", "the", "best", "popular", "servers",
                     "tools", "for", "that", "can", "and", "or", "with", "are",
                     "what", "how", "when", "where", "why"}


def extract_search_terms(prompt: str) -> dict:
    """mcp/server.py:314-365 — keyword intent extraction."""
    p = prompt.lower()
    categories = [c for c, kws in SEARCH_CATEGORY_KEYWORDS.items()
                  if any(k in p for k in kws)]
    operations = [o for o, kws in SEARCH_OPERATION_KEYWORDS.items()
                  if any(k in p for k in kws)]
    return {"categories": categories, "operations": operations,
            "keywords": prompt.split(), "original_prompt": prompt}


def clean_cypher(cypher_query: str) -> str:
    """src/text2cypher.py:131-148 — strip markdown fences."""
    if cypher_query.startswith("```cypher"):
        cypher_query = cypher_query[9:]
    elif cypher_query.startswith("```"):
        cypher_query = cypher_query[3:]
    if cypher_query.endswith("```"):
        cypher_query = cypher_query[:-3]
    return cypher_query.strip().strip("\n")


def _score_batch_keyword(query: str, min_confidence: float):
    q = query.lower()

    def fn(t: pa.Table) -> pa.Table:
        name_hit = pc.match_substring(pc.utf8_lower(t["name"]), q)
        desc_hit = pc.match_substring(
            pc.utf8_lower(pc.fill_null(t["description"], "")), q)
        text_score = pc.if_else(
            name_hit, pa.scalar(10.0),
            pc.if_else(desc_hit, pa.scalar(8.0), pa.scalar(0.0)))
        pop = pc.cast(pc.fill_null(t["popularity_score"], 0), pa.float64())
        total = pc.add(text_score, pc.multiply(pop, pa.scalar(0.001)))
        out = t.append_column("total_score", total)
        keep = pc.and_(pc.greater(text_score, 0.0),
                       pc.greater_equal(total, min_confidence))
        return out.filter(keep)

    return fn


def keyword_search(nodes, prompt: str, limit: int = 10,
                   min_confidence: float = 0.0):
    """Fallback keyword search (text2cypher.py:254-305): filter the
    stoplist out of the prompt, substring-match name/description,
    threshold, sort desc, limit."""
    terms = [w for w in prompt.split() if w.lower() not in FALLBACK_STOPLIST]
    search_text = " ".join(terms) if terms else prompt
    scored = nodes.map_batches(
        _score_batch_keyword(search_text, min_confidence),
        batch_format="pyarrow")
    return (scored.select_columns(["id", "name", "description", "total_score"])
            .sort(["total_score", "id"], descending=[True, False]).limit(limit))


def structured_search(nodes, prompt: str, limit: int = 10,
                      min_confidence: float = 0.0):
    """No-LLM structured scorer (mcp/server.py:422-471)."""
    terms = extract_search_terms(prompt)
    cats, ops = set(terms["categories"]), set(terms["operations"])
    q = prompt.lower()

    def fn(t: pa.Table) -> pa.Table:
        names = t["name"].to_pylist()
        descs = t["description"].to_pylist()
        cat_col = t["categories"].to_pylist()
        op_col = t["operations"].to_pylist()
        pops = t["popularity_score"].to_pylist()
        scores = []
        for name, desc, cl, ol, pop in zip(names, descs, cat_col, op_col, pops):
            text = 3.0 if q in (name or "").lower() else (
                2.0 if q in (desc or "").lower() else 0.0)
            cscore = len(cats & set(cl or [])) * 2.0
            oscore = len(ops & set(ol or [])) * 1.5
            scores.append(text + cscore + oscore + (pop or 0) * 0.1)
        out = t.append_column("total_score", pa.array(scores, pa.float64()))
        return out.filter(pc.greater_equal(out["total_score"], min_confidence))

    return (nodes.map_batches(fn, batch_format="pyarrow")
            .select_columns(["id", "name", "total_score"])
            .sort(["total_score", "id"], descending=[True, False]).limit(limit))


def similar_servers(nodes, server_id: str, limit: int = 10):
    """neo4j_integration.py:468-488 — score vs one anchor server.

    The anchor row is tiny: broadcast it, score every other row in a
    vectorized pass (no self-join needed for a single-anchor query)."""
    import ray

    anchor_t = (nodes.map_batches(
        lambda t: t.filter(pc.equal(t["id"], server_id)), batch_format="pyarrow")
        .take_all())
    if not anchor_t:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            "id": pa.array([], pa.string()),
            "similarity_score": pa.array([], pa.int64())}))
    anchor = anchor_t[0]
    ref = ray.put(anchor)

    def _common_count(list_col: pa.ChunkedArray, anchor_vals: set,
                      n_rows: int):
        """Per-row |row_list ∩ anchor_vals| via list-offset kernels: flatten,
        index_in against the anchor set, distinct (parent, value) pairs,
        bincount by parent — no Python loop over rows."""
        import numpy as np

        if not anchor_vals or n_rows == 0:
            return np.zeros(n_rows, dtype=np.int64)
        col = list_col.combine_chunks()
        parents = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        hits = pc.index_in(pc.list_flatten(col),
                           value_set=pa.array(sorted(anchor_vals)))
        h = hits.to_numpy(zero_copy_only=False).astype(np.float64)
        mask = ~np.isnan(h)
        if not mask.any():
            return np.zeros(n_rows, dtype=np.int64)
        pairs = np.unique(parents[mask].astype(np.int64) * len(anchor_vals)
                          + h[mask].astype(np.int64))
        return np.bincount(pairs // len(anchor_vals), minlength=n_rows)

    def fn(t: pa.Table) -> pa.Table:
        import numpy as np

        a = ray.get(ref)
        n = t.num_rows
        ccats = _common_count(t["categories"], set(a["categories"] or []), n)
        cops = _common_count(t["operations"], set(a["operations"] or []), n)
        def _eq_scalar(col, v):
            # None == None is a match in the reference's Python compare
            if v is None:
                return pc.is_null(col)
            return pc.equal(col, pa.scalar(v, pa.string()))

        same_auth = _eq_scalar(t["author"], a["author"])
        same_lang = _eq_scalar(t["implementation_language"],
                               a["implementation_language"])
        score = (2 * ccats + cops
                 + pc.fill_null(same_auth, False)
                 .to_numpy(zero_copy_only=False).astype(np.int64)
                 + pc.fill_null(same_lang, False)
                 .to_numpy(zero_copy_only=False).astype(np.int64))
        out = pa.table({"id": t["id"].cast(pa.string()),
                        "similarity_score": pa.array(score, pa.int64())})
        keep = pc.and_(pc.greater(out["similarity_score"], 0),
                       pc.not_equal(out["id"], a["id"]))
        return out.filter(keep)

    return (nodes.map_batches(fn, batch_format="pyarrow")
            .sort(["similarity_score", "id"], descending=[True, False])
            .limit(limit))


def server_relationships(edges, server_id: str):
    """neo4j_integration.py:490-501 — a server's edges by confidence."""
    def fn(t: pa.Table) -> pa.Table:
        keep = pc.or_(pc.equal(t["src"], server_id),
                      pc.equal(t["dst"], server_id))
        return t.filter(keep)

    return (edges.map_batches(fn, batch_format="pyarrow")
            .sort(["confidence", "id"], descending=[True, False]))
