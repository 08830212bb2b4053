"""Parity harness: Ray pipeline vs reference-semantics oracle.

The BASELINE.json gate: triple P/R ≥ 0.95 on the fixture corpus, plus
the byte-identical-text-per-url invariant (input_hint)."""

import pytest

from askg_ray.oracle.reference_oracle import precision_recall, triple_set


def test_triple_parity(kg_small, oracle_small):
    p, r = precision_recall(kg_small["edges"], oracle_small["edges"])
    assert p >= 0.95, f"precision {p:.4f} < 0.95"
    assert r >= 0.95, f"recall {r:.4f} < 0.95"


def test_node_id_parity(kg_small, oracle_small):
    pipe = {n["id"] for n in kg_small["nodes"]}
    orac = {n["id"] for n in oracle_small["nodes"]}
    inter = len(pipe & orac)
    assert inter / max(len(pipe), 1) >= 0.95
    assert inter / max(len(orac), 1) >= 0.95


def test_membership_parity(kg_small, oracle_small):
    pipe = {(m["server_id"], m["category_id"]) for m in kg_small["membership"]}
    orac = set(oracle_small["membership"])
    inter = len(pipe & orac)
    assert inter / max(len(pipe), 1) >= 0.95
    assert inter / max(len(orac), 1) >= 0.95


def test_edge_confidence_exact_when_matched(kg_small, oracle_small):
    """Matched triples must carry bit-identical confidence (same float ops)."""
    p_with = triple_set(kg_small["edges"], with_confidence=True)
    o_with = triple_set(oracle_small["edges"], with_confidence=True)
    p_topo = triple_set(kg_small["edges"], with_confidence=False)
    o_topo = triple_set(oracle_small["edges"], with_confidence=False)
    assert len(p_with & o_with) == len(p_topo & o_topo)


def test_byte_identical_text(ray_session, pages_small):
    import ray.data as rd

    from askg_ray.pipelines.kg import extract_texts

    expected = {r["url"]: r["text"] for r in pages_small.to_pylist()}
    got = {}
    for b in (extract_texts(rd.from_arrow(pages_small))
              .iter_batches(batch_format="pyarrow")):
        got.update(zip(b["url"].to_pylist(), b["text"].to_pylist()))
    assert got.keys() == expected.keys()
    mismatches = [u for u in expected if got[u] != expected[u]]
    assert not mismatches, f"text mismatch for {mismatches[:3]}"


@pytest.mark.slow
def test_parity_larger_corpus(ray_session):
    import ray.data as rd

    from askg_ray.oracle.reference_oracle import build_kg_oracle
    from askg_ray.pipelines.kg import build_kg
    from askg_ray.sources.synth import gen_pages

    pages = gen_pages(150, seed=7)
    out = build_kg(rd.from_arrow(pages))
    edges = [r for b in out["edges"].iter_batches(batch_format="pyarrow")
             for r in b.to_pylist()]
    oracle = build_kg_oracle(pages)
    p, r = precision_recall(edges, oracle["edges"])
    assert p >= 0.95 and r >= 0.95, f"P={p:.4f} R={r:.4f}"


@pytest.mark.slow
def test_parity_docs_adapter_corpus(ray_session):
    """Parity on the driver-testdata-derived corpus (what entry() and
    the kg_* queries actually run on)."""
    from askg_ray.oracle.reference_oracle import build_kg_oracle
    from askg_ray.pipelines.kg import build_kg
    from askg_ray.sources.docs_adapter import (
        pages_from_documents, pages_table_from_documents)

    sf = "/root/testdata/sf0.001"
    out = build_kg(pages_from_documents(sf))
    edges = [r for b in out["edges"].iter_batches(batch_format="pyarrow")
             for r in b.to_pylist()]
    oracle = build_kg_oracle(pages_table_from_documents(sf))
    p, r = precision_recall(edges, oracle["edges"])
    assert p >= 0.95 and r >= 0.95, f"P={p:.4f} R={r:.4f}"
