"""Benchmark — headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "triples_per_sec": ...}

--scaling: runs the same bench in fresh processes at each width of
GRAFT_SCALING_PAIRS (default "2:8,8:32" — each width once, shared
across pairs) on the same input and prints throughputs + scaling
efficiency per pair (the sandbox stand-in for N vs 4N Ray nodes —
BASELINE.md). A warm-up read primes the page cache first so the
runs measure compute + shuffle, not first-touch disk.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Bench corpus knobs. GRAFT_PAGE_REPL: appearance pages per entity
# (duplicates the dedup cascade collapses — scales extraction/dedup
# work at a FIXED canonical node set). GRAFT_DOC_MULT: distinct
# entities per document row — scales the corpus the way real growth
# does (more unique entities → linearly more near-dup clusters,
# quadratically more edges inside category blocks, per the
# reference's own edge semantics). At repl=1/mult=1 the sf0.1 corpus
# is scheduling-floor-bound and cannot saturate 32 cpus; round 2 cut
# per-unit compute ~3-4× (vectorized explodes, dictionary edge
# columns, single-parse extraction), so the bench corpus grows with
# the engine (Gustafson) — per-unit rates stay comparable via
# triples_per_sec. Replication is the WRONG axis to grow further:
# in-cluster near-dup pairs grow quadratically with it and skew the
# job toward one stage, hence the doc multiplier.
PAGE_REPL = int(os.environ.get("GRAFT_PAGE_REPL", "24"))
DOC_MULT = int(os.environ.get("GRAFT_DOC_MULT", "2"))
# Optional scale-run edge truncation (SURVEY §2.6 "cap with documented
# truncation"): keep only the k highest-confidence outgoing edges per
# node. Default off = exact reference parity; set e.g. 400 for scale
# runs where the reference's quadratic-in-block edge semantics would
# otherwise emit 10^4x edges at 100x corpus (see BASELINE.md).
MAX_OUT_DEGREE = os.environ.get("GRAFT_MAX_OUT_DEGREE")
MAX_OUT_DEGREE = int(MAX_OUT_DEGREE) if MAX_OUT_DEGREE else None


def _bench_queries():
    """name → zero-arg callable returning a consumed (counted) result."""
    from askg_ray.ops.dedup import minhash_dedup, simhash_dedup
    from askg_ray.ops.joins import order_revenue_topk
    from askg_ray.ops.relational import lineitem_pricing_summary, orders_by_segment
    from askg_ray.ops.graph import parts_sssp
    from askg_ray.ops.similarity import (ann_bruteforce, doc_cosine_pairs,
                                         embedding_kmeans,
                                         embedding_knn_join)
    from askg_ray.ops.text import token_stats
    from askg_ray.ops.webqual import gopher_quality
    from askg_ray.pipelines.kg import build_kg
    from askg_ray.sources.docs_adapter import KG_PAGE_COLUMNS, pages_from_documents

    state: dict = {}

    def kg_build():
        out = build_kg(pages_from_documents(SF_DIR, replication=PAGE_REPL,
                                            uniq_mult=DOC_MULT,
                                            columns=KG_PAGE_COLUMNS),
                       max_out_degree=MAX_OUT_DEGREE)
        state["n_edges"] = out["edges"].count()
        state["n_nodes"] = out["nodes"].count()
        return state["n_edges"]

    return state, {
        "kg_build": kg_build,
        "dedup_minhash": lambda: minhash_dedup(SF_DIR).count(),
        "dedup_simhash": lambda: simhash_dedup(SF_DIR).count(),
        "token_stats": lambda: token_stats(SF_DIR).count(),
        "lineitem_agg": lambda: lineitem_pricing_summary(SF_DIR).count(),
        "orders_join": lambda: orders_by_segment(SF_DIR).count(),
        "fact_join_topk": lambda: order_revenue_topk(SF_DIR).count(),
        "ann_cosine": lambda: ann_bruteforce(SF_DIR).count(),
        "quality_gopher": lambda: gopher_quality(SF_DIR).count(),
        "kmeans": lambda: embedding_kmeans(SF_DIR).count(),
        "knn_join": lambda: embedding_knn_join(SF_DIR).count(),
        "graph_sssp": lambda: parts_sssp(SF_DIR).count(),
        # exercises the above-gate chunked direct exchange (the
        # designated 100-TB route for the ~224M pair partials at sf0.1)
        # so regressions on exchange_reduce_chunked are tracked per
        # round (VERDICT r4 "Next round" #6)
        "cosine_pairs": lambda: doc_cosine_pairs(SF_DIR).count(),
    }


def run_bench() -> dict:
    import logging

    import ray
    from ray.data import DataContext

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    # untimed warm-up, two parts, same ABSOLUTE size at every cpu
    # width so the scaling ratio compares steady states:
    #  1. spin the worker pool to full width (32 workers fork in ~3 s);
    #  2. push ~4 GB of throwaway blocks through the object store.
    # This sandbox VM faults freshly-mapped pages at ~0.3 ms/4K — an
    # un-warmed plasma segment turns the first big materialization
    # into a fault storm that serializes across workers (the same edge
    # job measured 48 s cold vs 8-10 s warm at 32 cpus). On real
    # hardware this is a no-op costing a few seconds of memcpy.
    import numpy as _np
    import pyarrow as _pa
    import ray.data as rd

    def _blob(b):
        return _pa.table({"x": _pa.array(
            [_np.random.bytes(1 << 20) for _ in range(len(b["id"]))],
            _pa.binary())})

    rd.range(4096, override_num_blocks=NUM_CPUS).map_batches(
        _blob, batch_size=4096 // NUM_CPUS).count()

    state, queries = _bench_queries()
    # min-of-N per query (GRAFT_TRIALS, default 2; GRAFT_KG_TRIALS
    # overrides for kg_build only). The first execution of an operator
    # chain in a session pays worker forks + code ship + plasma growth
    # (measured ~2× at 32 cpus) and this VM sees hypervisor steal
    # bursts (~10% mean, bursty) — min-of-N is the standard steady-state
    # measure under noisy neighbors. Round 5 (VERDICT r4 #4): min-of-2
    # applies to EVERY query, not just kg_build, so one contended
    # invocation can't become the official record; the per-query load
    # average at measurement time is reported alongside.
    trials_default = int(os.environ.get("GRAFT_TRIALS", "2"))
    kg_trials = int(os.environ.get("GRAFT_KG_TRIALS", str(trials_default)))
    timings: dict[str, float] = {}
    loadavgs: list[float] = []
    total = 0.0
    for name, fn in queries.items():
        trials = kg_trials if name == "kg_build" else trials_default
        dt = None
        for _ in range(trials):
            loadavgs.append(round(os.getloadavg()[0], 1))
            t0 = time.time()
            fn()
            t = round(time.time() - t0, 3)
            dt = t if dt is None else min(dt, t)
        timings[name] = dt
        total += dt
    kg_secs = timings["kg_build"]
    # latest RECORDED --scaling result (SCALING_r04.json, committed):
    # surfaced here so the one-line bench JSON carries the width-pair
    # efficiencies without re-running the ~30-minute scaling harness
    scaling_rec = None
    try:
        import glob as _glob
        latest = sorted(_glob.glob(os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "SCALING_r0*.json")))[-1]
        with open(latest) as fh:
            s = json.load(fh)
        scaling_rec = {
            "pairs_2v8": s["scaling_efficiency_2v8"],
            "pairs_4v16_raw": s["scaling_efficiency_4v16_raw"],
            "pairs_4v16_4x_corpus_raw":
                s["scaling_efficiency_4v16_4x_corpus_raw"],
            "pairs_8v32_raw": s["scaling_efficiency_8v32_raw"],
            "engine_attributable": {
                k: v["engine_attributable"]
                for k, v in s["engine_attributable"].items()},
            "source": os.path.basename(latest) + " (committed --scaling record)",
        }
    except Exception:
        pass
    result = {
        "metric": "kg_construct end-to-end + training-data ops, sf0.1",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "page_replication": PAGE_REPL,
        "doc_mult": DOC_MULT,
        "max_out_degree": MAX_OUT_DEGREE,
        "trials_per_query": trials_default,
        "loadavg_1min_samples": loadavgs,
        "n_nodes": state.get("n_nodes"),
        "n_edges": state.get("n_edges"),
        "triples_per_sec": round(state.get("n_edges", 0) / kg_secs, 1) if kg_secs else None,
        "scaling_recorded": scaling_rec,
    }
    ray.shutdown()
    return result


def run_scaling():
    """N-vs-4N-cpu scaling on the headline KG pipeline — THREE pairs
    (2v8, 4v16, 8v32) by default, each width run once and shared.
    4v16 is the second uncontended pair (round-4 addition): both
    widths stay below this host's SMT/memory-bus saturation point, so
    together with 2v8 it evidences the N-vs-4N-node criterion without
    the one-box contention the 8v32 raw number folds in.

    Corpus: GRAFT_SCALING_REPL×GRAFT_SCALING_MULT (default 32×1) — the
    verify/extract-CPU-dominated shape. Interpretation: 2v8 keeps both
    widths in this host's uncontended regime and is the faithful
    stand-in for N-vs-4N *nodes* (each node brings its own cores,
    object store and memory bus); the 8v32 raw ratio folds in the
    host's one-box contention — per-task measurements on identical
    work put per-vcpu throughput at 32-wide at ~0.53× of 8-wide
    (BASELINE.md "8v32 decomposition"), so BASELINE also reports the
    engine-attributable number. Both regimes + two full invocations
    are recorded in SCALING_r03.json. kg_build runs twice per width
    (min) to shed the first-run fork/code-ship penalty and noise
    bursts.
    """
    import subprocess

    def run(ncpu: int) -> dict:
        # efficiency is computed on kg_build only — keep the secondary
        # queries at 1 trial so a width run stays ~half the wall time
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_PAGE_REPL=os.environ.get("GRAFT_SCALING_REPL", "32"),
                   GRAFT_DOC_MULT=os.environ.get("GRAFT_SCALING_MULT", "1"),
                   GRAFT_TRIALS=os.environ.get("GRAFT_TRIALS", "1"),
                   GRAFT_KG_TRIALS=os.environ.get("GRAFT_KG_TRIALS", "2"))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    # warm the page cache (untimed)
    import glob
    for f in glob.glob(f"{SF_DIR}/*.parquet"):
        with open(f, "rb") as fh:
            fh.read()

    # pairs to report: default BOTH the unthrottled 2v8 regime and the
    # mandated 8v32 axis (each width runs ONCE; 8 is shared). Legacy
    # GRAFT_SCALING_LO/HI force a single pair.
    if os.environ.get("GRAFT_SCALING_LO") or os.environ.get("GRAFT_SCALING_HI"):
        pairs = [(int(os.environ.get("GRAFT_SCALING_LO", "2")),
                  int(os.environ.get("GRAFT_SCALING_HI", "8")))]
    else:
        pairs = [tuple(int(x) for x in p.split(":")) for p in
                 os.environ.get("GRAFT_SCALING_PAIRS",
                                "2:8,4:16,8:32").split(",")]

    widths = sorted({w for p in pairs for w in p})
    runs = {w: run(w) for w in widths}
    out: dict = {"widths": widths, "pairs": []}
    for w in widths:
        out[f"kg_sec_{w}cpu"] = runs[w]["queries"]["kg_build"]
        out[f"sec_{w}cpu"] = runs[w]["value"]
        out[f"triples_per_sec_{w}cpu"] = runs[w]["triples_per_sec"]
        out[f"queries_{w}cpu"] = runs[w]["queries"]
    # efficiency is measured on the headline pipeline (the "same job"
    # of the scaling criterion); the small per-query timings at this
    # corpus size are scheduling-floor noise and are reported raw
    for lo_n, hi_n in pairs:
        ratio = hi_n / lo_n
        kg_lo = runs[lo_n]["queries"]["kg_build"]
        kg_hi = runs[hi_n]["queries"]["kg_build"]
        out["pairs"].append({
            "lo_cpus": lo_n, "hi_cpus": hi_n,
            "scaling_efficiency": round((kg_lo / kg_hi) / ratio, 3),
            "scaling_efficiency_total": round(
                (runs[lo_n]["value"] / runs[hi_n]["value"]) / ratio, 3),
        })
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
