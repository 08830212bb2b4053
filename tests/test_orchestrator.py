"""Orchestrator pipeline-step API — offline analog of the reference's
LangGraph supervisor (analyze → select → order → execute with
per-step history)."""

from __future__ import annotations

import pyarrow as pa


def _nodes_ds():
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id": ["ai1", "db1", "db2", "fs1", "pr1", "zz1"],
        "name": ["model server", "postgres server", "market api",
                 "file vault", "etl engine", "misc thing"],
        "description": [
            "ml predictions", "sql database for market data",
            "market data api", "save report files to storage",
            "process and transform data", "unrelated"],
        "categories": [["ai_ml"], ["database"], ["api_integration"],
                       ["file_system"], ["data_processing"], ["other"]],
        "operations": [["execute"], ["query", "read"], ["read"],
                       ["write"], ["transform"], []],
    }))


def test_analyze_task():
    from askg_ray.functions.orchestrator import analyze_task

    caps = analyze_task("query the database for market data, process "
                        "and analyze it, then save a report file")
    assert "database" in caps["categories"]
    assert "api_integration" in caps["categories"]   # "market" is crypto/fin
    assert "data_processing" in caps["categories"]
    assert "file_system" in caps["categories"]
    assert {"query", "write", "execute"} <= set(caps["operations"])


def test_find_and_order(ray_session):
    from askg_ray.functions.orchestrator import (analyze_task,
                                                 build_pipeline,
                                                 find_compatible_servers)

    caps = analyze_task("query the database for market data, process "
                        "and analyze it, then save a report file")
    servers = find_compatible_servers(_nodes_ds(), caps, limit=8)
    ids = servers["id"].to_pylist()
    assert "db1" in ids and "pr1" in ids and "fs1" in ids
    assert "zz1" not in ids                     # zero score filtered out

    steps = build_pipeline(servers)
    order = [s["id"] for s in steps]
    # sources -> processing -> (ai/ml) -> file output, stable by id
    assert order.index("db1") < order.index("pr1") < order.index("fs1")
    assert order.index("db2") < order.index("pr1")
    assert order == sorted(
        order, key=lambda i: order.index(i))    # sanity: a total order


def test_execute_pipeline_history_and_chaining(ray_session):
    from askg_ray.functions.orchestrator import (build_pipeline,
                                                 execute_pipeline,
                                                 find_compatible_servers,
                                                 analyze_task)

    caps = analyze_task("query the database for market data, process "
                        "and analyze it, then save a report file")
    steps = build_pipeline(find_compatible_servers(_nodes_ds(), caps))
    state = execute_pipeline("t", steps)
    h = state["pipeline_history"]
    assert [e["step"] for e in h] == list(range(1, len(steps) + 1))
    assert all(e["status"] == "success" for e in h)
    assert state["errors"] == []
    # chaining: the processing step saw the upstream data_result rows
    pr = state["results"]["pr1"]
    assert pr["type"] == "processed_result"
    assert pr["input_type"] == "data_result" and pr["n_in"] == 3
    # deterministic: identical rerun
    state2 = execute_pipeline("t", steps)
    assert state2["pipeline_history"] == h


def test_execute_pipeline_error_capture_and_agent_cache(ray_session):
    from askg_ray.functions.orchestrator import execute_pipeline

    builds = []

    class Flaky:
        def __init__(self, server):
            builds.append(server["id"])
            self.agent_id = f"agent_{server['id']}"
            self.server = server

        def execute(self, data):
            if self.server["id"] == "bad":
                raise RuntimeError("boom")
            return {"type": "generic_result"}

    steps = [{"id": "ok1", "name": "ok1", "categories": ["other"]},
             {"id": "bad", "name": "bad", "categories": ["other"]},
             {"id": "ok1", "name": "ok1", "categories": ["other"]}]
    state = execute_pipeline("t", steps, agent_factory=Flaky)
    assert [e["status"] for e in state["pipeline_history"]] \
        == ["success", "failed", "success"]
    assert len(state["errors"]) == 1 and "boom" in state["errors"][0]
    # create-once per server id (supervisor agent cache)
    assert builds == ["ok1", "bad"]


def test_orchestrate_end_to_end_table(ray_session):
    from askg_ray.functions.orchestrator import (HISTORY_SCHEMA,
                                                 history_table,
                                                 orchestrate)

    state = orchestrate(_nodes_ds())
    t = history_table(state)
    assert t.schema.equals(HISTORY_SCHEMA)
    assert t.num_rows >= 3
    assert t["virtual_ts"].to_pylist() == t["step"].to_pylist()
