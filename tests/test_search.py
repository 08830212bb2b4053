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


def test_text2query_llm_path_and_fallbacks(ray_session):
    """Probe-run control flow (mcp/server.py:367-420): LLM plan used
    when it yields rows; empty LLM result and client exceptions both
    route through the SAME fallback the reference uses."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from askg_ray.functions.text2query import (
        FailingClient,
        StubClient,
        Text2Query,
        run_plan,
        semantic_search,
    )

    nodes = rd.from_arrow(pa.table({
        "id": ["a", "b", "c"],
        "name": ["postgres helper", "file reader", "misc"],
        "description": ["sql database tool", "reads files", None],
        "categories": [["database"], ["file_system"], []],
        "operations": [["query"], ["read"], []],
        "popularity_score": [10, 5, 1],
    })).materialize()

    # 1. stub-LLM path: plan parses, probe-run returns rows → LLM plan used
    conv = Text2Query(StubClient())
    plan = conv.convert("find database servers", limit=5, min_confidence=0.0)
    assert plan["kind"] == "structured" and plan["model"] == "stub-local"
    got = semantic_search(nodes, "find database servers", limit=5,
                          min_confidence=0.0, converter=conv)
    assert "a" in {r["id"] for r in got.take_all()}

    # 2. client raises → convert returns the keyword fallback plan
    conv_fail = Text2Query(FailingClient())
    plan2 = conv_fail.convert("find database servers", 5, 0.0)
    assert plan2 == conv_fail.fallback_plan("find database servers", 5, 0.0)
    assert plan2["query"] == "database"  # stoplist removed find/servers

    # 3. probe-run empty → fallback re-run (LLM plan matches nothing)
    class NoHitClient:
        model = "nohit"

        def __call__(self, p):
            return json.dumps({"kind": "structured", "query": "zzz-nothing",
                               "min_confidence": 99.0})

    got3 = semantic_search(nodes, "postgres", limit=5, min_confidence=0.0,
                           converter=Text2Query(NoHitClient()))
    assert {r["id"] for r in got3.take_all()} == {"a"}  # keyword fallback hit

    # 4. no converter configured → structured scorer branch
    got4 = semantic_search(nodes, "find database servers", limit=5)
    assert len(got4.take_all()) > 0

    # 5. run_plan executes both plan kinds
    assert run_plan(nodes, {"kind": "keyword", "query": "postgres",
                            "limit": 3, "min_confidence": 0.0}).count() == 1


def test_batched_client_scorer_actor_pool(ray_session, tmp_path):
    """T3 shape: the scoring client is built ONCE PER ACTOR (not per
    batch) and serves whole batches — verified by marker files the
    factory/client write on build and on each batched call."""
    import glob
    import os
    import uuid

    import pyarrow as pa
    import ray.data as rd

    from askg_ray.functions.text2query import (StubHeavyClient,
                                               llm_rerank, semantic_search)

    marker_dir = str(tmp_path)

    class TrackedClient(StubHeavyClient):
        def __init__(self):
            super().__init__()
            self._tag = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
            open(f"{marker_dir}/build-{self._tag}", "w").close()

        def score_batch(self, query, texts):
            open(f"{marker_dir}/call-{self._tag}-{uuid.uuid4().hex[:8]}",
                 "w").close()
            return super().score_batch(query, texts)

    n = 64
    nodes = rd.from_arrow(pa.table({
        "id": [f"s{i:03d}" for i in range(n)],
        "name": [f"server{i} database" for i in range(n)],
        "description": ["fast database tools" if i % 2 else "misc"
                        for i in range(n)],
    })).repartition(8)

    out = llm_rerank(nodes, "database tools", TrackedClient,
                     limit=10, concurrency=2, batch_size=8)
    rows = out.take_all()
    assert len(rows) == 10
    # deterministic stub scoring: overlap-weighted, desc by score
    scores = [r["total_score"] for r in rows]
    assert scores == sorted(scores, reverse=True) and scores[0] > 0

    builds = glob.glob(f"{marker_dir}/build-*")
    calls = glob.glob(f"{marker_dir}/call-*")
    # one client build per pool actor — never per batch
    assert len(builds) == 2
    # many batches served through those two clients
    assert len(calls) >= 8
    served_tags = {os.path.basename(c).split("-")[1] + "-"
                   + os.path.basename(c).split("-")[2] for c in calls}
    built_tags = {os.path.basename(b)[len("build-"):] for b in builds}
    assert served_tags == built_tags

    # the semantic_search hook routes through the same pool
    for f in glob.glob(f"{marker_dir}/*"):
        os.remove(f)
    got = semantic_search(nodes, "database tools",
                          scorer_factory=TrackedClient, limit=5)
    assert len(got.take_all()) == 5
    assert len(glob.glob(f"{marker_dir}/build-*")) == 2
