"""Query-side search API tests (functions/search.py)."""

import pyarrow as pa


def _rows(ds):
    return [r for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]


def _nodes_ds():
    import ray.data as rd

    t = pa.table({
        "id": ["a/pg", "b/files", "c/noise"],
        "name": ["postgres helper", "file manager", "zzz"],
        "description": ["a database tool", "manages files", "nothing"],
        "author": ["alice", "bob", "alice"],
        "implementation_language": ["python", "python", "go"],
        "popularity_score": [100, 2000, 0],
        "categories": [["database"], ["file_system"], ["database"]],
        "operations": [["read", "query"], ["read", "write"], ["read"]],
    })
    return rd.from_arrow(t)


def test_extract_search_terms():
    from askg_ray.functions.search import extract_search_terms

    t = extract_search_terms("find database tools that query stuff")
    assert "database" in t["categories"]
    assert "query" in t["operations"]


def test_clean_cypher():
    from askg_ray.functions.search import clean_cypher

    assert clean_cypher("```cypher\nMATCH (n)\n```") == "MATCH (n)"
    assert clean_cypher("```\nX\n```") == "X"
    assert clean_cypher("  Y  ") == "Y"


def test_keyword_search(ray_session):
    from askg_ray.functions.search import keyword_search

    rows = _rows(keyword_search(_nodes_ds(), "postgres", limit=5))
    assert rows[0]["id"] == "a/pg"
    assert rows[0]["total_score"] == 10.0 + 100 * 0.001
    # stoplist filtering: "find the postgres" reduces to "postgres"
    rows2 = _rows(keyword_search(_nodes_ds(), "find the postgres", limit=5))
    assert rows2[0]["id"] == "a/pg"


def test_structured_search(ray_session):
    from askg_ray.functions.search import structured_search

    rows = _rows(structured_search(_nodes_ds(), "database query", limit=5,
                                   min_confidence=1.0))
    ids = [r["id"] for r in rows]
    assert "a/pg" in ids  # category + operation hits


def test_similar_servers(ray_session):
    from askg_ray.functions.search import similar_servers

    rows = _rows(similar_servers(_nodes_ds(), "a/pg", limit=5))
    by_id = {r["id"]: r["similarity_score"] for r in rows}
    # c/noise: shared category(2) + shared read(1) + same author(1) = 4
    assert by_id["c/noise"] == 4
    # b/files: shared read(1) + same language(1) = 2
    assert by_id["b/files"] == 2


def test_server_relationships(ray_session):
    import ray.data as rd

    from askg_ray.functions.search import server_relationships

    edges = rd.from_arrow(pa.table({
        "id": ["e1", "e2", "e3"],
        "src": ["a", "a", "x"],
        "dst": ["b", "c", "y"],
        "rel_type": ["same_author"] * 3,
        "confidence": [0.5, 0.9, 1.0],
    }))
    rows = _rows(server_relationships(edges, "a"))
    assert [r["id"] for r in rows] == ["e2", "e1"]  # confidence desc
