"""Text→query converter hook — the reference's text2cypher shape.

Reproduces the control flow of /root/reference/src/text2cypher.py:94-129
and /root/reference/mcp/server.py:367-420 without a network LLM:

  * ``Text2Query.convert`` builds a prompt, calls an INJECTABLE client
    (any ``Callable[[str], str]``; real deployments plug an LLM call
    here), strips markdown fences from the reply (M22 clean_cypher, the
    same position the reference cleans generated Cypher), parses the
    plan, and on ANY exception falls back to the keyword plan —
    mirroring convert_to_cypher's try/except → _fallback_query.
  * ``semantic_search`` mirrors _semantic_search's probe-run: execute
    the converted plan, and if it returns ZERO rows, re-run with the
    fallback keyword plan (server.py:388-401). No converter configured →
    straight to the structured scorer (server.py:414-416).

The "Cypher" analog is a JSON query plan executed over the nodes
Dataset by ``run_plan`` — the engine's graph lives in Arrow tables, so
a declarative plan plays the role the Cypher string plays against
Neo4j. ``StubClient`` is the offline stand-in: deterministic, returns a
fenced JSON plan like an LLM reply, so the LLM path is exercised by
tests through the same code the real client would take.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from .search import (
    FALLBACK_STOPLIST,
    clean_cypher,
    extract_search_terms,
    keyword_search,
    structured_search,
)


class StubClient:
    """Offline LLM stand-in: emits a fenced JSON plan (category/operation
    intent from the keyword tables — deterministic), formatted the way a
    code-fenced LLM reply arrives."""

    model = "stub-local"

    def __call__(self, prompt: str) -> str:
        # the prompt's last line carries the user query (see _build_prompt)
        query = prompt.rsplit("\n", 1)[-1]
        terms = extract_search_terms(query)
        plan = {"kind": "structured", "query": query,
                "categories": terms["categories"],
                "operations": terms["operations"]}
        # plain ``` fence: the M22 cleaner strips bare and ```cypher
        # fences (text2cypher.py:131-148), not language-tagged ones
        return "```\n" + json.dumps(plan, sort_keys=True) + "\n```"


class FailingClient:
    """Client that always raises — drives the exception→fallback arm."""

    model = "failing"

    def __call__(self, prompt: str) -> str:
        raise RuntimeError("LLM unavailable (offline container)")


class StubHeavyClient:
    """Stubbed-but-HEAVY batched scoring client: ``__init__`` stands in
    for an expensive model load (builds a deterministic token-weight
    table the way a real client loads weights / opens a session —
    the build-once shape of /root/reference/src/text2cypher.py:28-92,
    where the OpenAI client is constructed once and reused), and
    ``score_batch`` serves a WHOLE batch per call (batched inference,
    never per-row). Deterministic, so the rerank is test/oracle-able
    offline; a real deployment injects a factory returning an object
    with the same two-method surface."""

    model = "stub-batched"

    def __init__(self):
        import zlib

        # "model weights": stable per-token weights from crc32 — stands
        # in for the heavy artifact a real client would load once
        self._weight = lambda w: (zlib.crc32(w.encode()) % 1000) / 1000.0

    def score_batch(self, query: str, texts: list[str]) -> list[float]:
        q = {w for w in query.lower().split() if w}
        out = []
        for t in texts:
            toks = (t or "").lower().split()
            overlap = [w for w in toks if w in q]
            out.append(round(sum(self._weight(w) for w in overlap)
                             + 0.1 * len(overlap), 6))
        return out


class BatchedClientScorer:
    """T3 actor-pool stage: the client object is built ONCE per actor
    in ``__init__`` from the injectable factory; ``__call__`` scores
    one Arrow batch with ONE batched client invocation. Pass the CLASS
    to ``map_batches(..., concurrency=N)`` so Ray constructs it once
    per pool actor — the client-once pattern of the reference's
    text2cypher client (text2cypher.py:28-92)."""

    def __init__(self, client_factory: Callable[[], object], query: str,
                 min_confidence: float = 0.0):
        self.client = client_factory()          # heavy load: once per actor
        self.query = query
        self.min_confidence = float(min_confidence)

    def __call__(self, t):
        import pyarrow as pa
        import pyarrow.compute as pc

        texts = [f"{n or ''} {d or ''}"
                 for n, d in zip(t["name"].to_pylist(),
                                 t["description"].to_pylist())]
        scores = self.client.score_batch(self.query, texts)
        out = t.append_column(
            "total_score", pa.array([float(s) for s in scores],
                                    pa.float64()))
        return out.filter(pc.greater_equal(out["total_score"],
                                           self.min_confidence))


def llm_rerank(nodes, prompt: str,
               client_factory: Callable[[], object] | None = None,
               limit: int = 10, min_confidence: float = 0.0,
               concurrency: int = 2, batch_size: int = 256):
    """Batched LLM-style scoring over the nodes Dataset as an ACTOR
    POOL (client built per actor, batches served per call), then the
    usual top-k. The factory defaults to the offline StubHeavyClient;
    a real deployment injects one returning its API client."""
    factory = client_factory if client_factory is not None \
        else StubHeavyClient
    scored = nodes.map_batches(
        BatchedClientScorer, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size,
        fn_constructor_kwargs={"client_factory": factory,
                               "query": prompt,
                               "min_confidence": min_confidence})
    return (scored.select_columns(["id", "name", "total_score"])
            .sort(["total_score", "id"], descending=[True, False])
            .limit(limit))


class Text2Query:
    """convert_to_cypher analog with an injectable client."""

    def __init__(self, client: Callable[[str], str] | None = None):
        self.client = client

    def _build_prompt(self, query: str, limit: int, min_confidence: float) -> str:
        # schema header + instructions + the raw query on the last line
        # (text2cypher.py:20-93 builds the schema_info system prompt)
        return (f"Convert to a JSON query plan over the nodes table. "
                f"limit={limit} min_confidence={min_confidence}\n{query}")

    def fallback_plan(self, query: str, limit: int,
                      min_confidence: float) -> dict:
        """_fallback_query (text2cypher.py:254-305): stoplist-filtered
        keyword plan."""
        terms = [w for w in query.split() if w.lower() not in FALLBACK_STOPLIST]
        return {"kind": "keyword",
                "query": " ".join(terms) if terms else query,
                "limit": limit, "min_confidence": min_confidence,
                "model": "fallback"}

    def convert(self, query: str, limit: int = 20,
                min_confidence: float = 0.5) -> dict:
        try:
            reply = self.client(self._build_prompt(query, limit, min_confidence))
            plan = json.loads(clean_cypher(reply))
            if not isinstance(plan, dict) or "kind" not in plan:
                raise ValueError("client returned no plan")
            plan.setdefault("limit", limit)
            plan.setdefault("min_confidence", min_confidence)
            plan["model"] = getattr(self.client, "model", "injected")
            return plan
        except Exception:
            return self.fallback_plan(query, limit, min_confidence)


def run_plan(nodes, plan: dict):
    """Execute a query plan over the nodes Dataset (the session.run
    analog)."""
    limit = int(plan.get("limit", 20))
    min_conf = float(plan.get("min_confidence", 0.0))
    if plan.get("kind") == "keyword":
        return keyword_search(nodes, plan["query"], limit=limit,
                              min_confidence=min_conf)
    return structured_search(nodes, plan.get("query", ""), limit=limit,
                             min_confidence=min_conf)


def semantic_search(nodes, prompt: str, limit: int = 10,
                    min_confidence: float = 0.0,
                    converter: Text2Query | None = None,
                    scorer_factory: Callable[[], object] | None = None):
    """mcp/server.py:367-420 — converter plan, probe-run, empty →
    fallback keyword plan; no converter → structured scorer.
    ``scorer_factory`` is the batched-model hook: when injected, the
    query routes through the ``llm_rerank`` actor pool (client built
    once per actor, whole batches scored per call) instead of the
    keyword scorers — the T3 shape a real LLM deployment uses."""
    if scorer_factory is not None:
        return llm_rerank(nodes, prompt, scorer_factory, limit=limit,
                          min_confidence=min_confidence)
    if converter is not None and converter.client is not None:
        plan = converter.convert(prompt, limit, min_confidence)
        result = run_plan(nodes, plan)
        if result.count() == 0:
            plan = converter.fallback_plan(prompt, limit, min_confidence)
            result = run_plan(nodes, plan)
        return result
    return structured_search(nodes, prompt, limit=limit,
                             min_confidence=min_confidence)
