"""Shared fixtures — ONE Ray session per pytest run."""

from __future__ import annotations

import logging

import pytest


@pytest.fixture(scope="session")
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small():
    from askg_ray.sources.synth import gen_pages

    return gen_pages(40, seed=42)


@pytest.fixture(scope="session")
def kg_small(ray_session, pages_small):
    """Pipeline output on the small corpus, collected to Python."""
    import ray.data as rd

    from askg_ray.pipelines.kg import build_kg

    out = build_kg(rd.from_arrow(pages_small))
    nodes = [r for b in out["nodes"].iter_batches(batch_format="pyarrow")
             for r in b.to_pylist()]
    edges = [r for b in out["edges"].iter_batches(batch_format="pyarrow")
             for r in b.to_pylist()]
    membership = [r for b in out["membership"].iter_batches(batch_format="pyarrow")
                  for r in b.to_pylist()]
    return {"nodes": nodes, "edges": edges, "membership": membership}


@pytest.fixture(scope="session")
def oracle_small(pages_small):
    from askg_ray.oracle.reference_oracle import build_kg_oracle

    return build_kg_oracle(pages_small)
