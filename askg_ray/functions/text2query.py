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
                    converter: Text2Query | None = None):
    """mcp/server.py:367-420 — converter plan, probe-run, empty →
    fallback keyword plan; no converter → structured scorer."""
    if converter is not None and converter.client is not None:
        plan = converter.convert(prompt, limit, min_confidence)
        result = run_plan(nodes, plan)
        if result.count() == 0:
            plan = converter.fallback_plan(prompt, limit, min_confidence)
            result = run_plan(nodes, plan)
        return result
    return structured_search(nodes, prompt, limit=limit,
                             min_confidence=min_confidence)
