"""Round-4 regression tests for the ADVICE r3 findings: packed-key
sign-extension gates, int64-overflow guards, the doc_dup_spans empty-
aggregate guard, and content-fingerprinted scratch caches."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WIDE = 1 << 31          # smallest id whose ``x << 32`` wraps int64


# ---------------------------------------------------------------------------
# packed-key width gates (ADVICE medium)


def _write_lineitem(tmp_path, rows):
    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    return str(tmp_path)


def _coorder_truth(rows):
    """Pure-python (u, v, n) co-order support."""
    import collections
    import itertools

    orders = collections.defaultdict(set)
    for ok, pk in rows:
        orders[ok].add(pk)
    c = collections.Counter()
    for parts in orders.values():
        for u, v in itertools.combinations(sorted(parts), 2):
            c[(u, v)] += 1
    return dict(c)


def test_coorder_support_wide_ids(ray_session, tmp_path):
    """partkeys in [2^31, 2^32) must NOT ride the packed-key kernel —
    before the r4 gate fix, ``u << 32`` wrapped negative and
    ``pk >> 32`` sign-extended u back as u - 2^32."""
    from askg_ray.ops.graph import _coorder_support

    rows = [(1, WIDE + 5), (1, WIDE + 9), (1, 7),
            (2, WIDE + 5), (2, WIDE + 9),
            (3, WIDE + 5), (3, 7)]
    sf = _write_lineitem(tmp_path, rows)
    got = {(r["u"], r["v"]): r["n"]
           for r in _coorder_support(sf).take_all()}
    assert got == _coorder_truth(rows)
    assert all(u >= 0 and v >= 0 for u, v in got)


def test_coorder_support_narrow_ids_exchange_parity(ray_session, tmp_path):
    """Narrow ids take the packed exchange; result must equal the
    unconditional groupby fallback."""
    from askg_ray.ops.graph import _coorder_support

    rng = np.random.default_rng(7)
    rows = [(int(rng.integers(1, 20)), int(rng.integers(1, 30)))
            for _ in range(200)]
    sf = _write_lineitem(tmp_path, rows)
    fast = {(r["u"], r["v"]): r["n"]
            for r in _coorder_support(sf).take_all()}
    slow = {(r["u"], r["v"]): r["n"]
            for r in _coorder_support(sf, exchange_max_rows=0).take_all()}
    assert fast == slow == _coorder_truth(rows)


def _triangle_truth(rows):
    """Per-part triangle count on the co-order graph, pure python."""
    import collections
    import itertools

    edges = set(_coorder_truth(rows))
    adj = collections.defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    c = collections.Counter()
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v:       # count each triangle once at (u < v < w)
                c[u] += 1
                c[v] += 1
                c[w] += 1
    return dict(c)


@pytest.mark.parametrize("base", [0, WIDE])
def test_triangle_count_wide_and_narrow(ray_session, tmp_path, base):
    """Triangles with ids ≥ 2^31 must fall back to the hash-join close
    (both src and dst appear as packed HIGH halves); narrow ids ride
    the exchange. Same counts either way."""
    from askg_ray.ops.graph import parts_triangle_count

    # K4 on {1..4} plus a pendant edge, all shifted by ``base``
    parts = [base + p for p in (1, 2, 3, 4)]
    rows = []
    ok = 0
    for a, b in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]:
        ok += 1
        rows += [(ok, parts[a]), (ok, parts[b])]
    rows += [(99, base + 4), (99, base + 50)]
    sf = _write_lineitem(tmp_path, rows)
    got = {r["l_partkey"]: r["n_triangles"]
           for r in parts_triangle_count(sf).take_all()}
    assert got == _triangle_truth(rows)


def test_pair_dot_sums_wide_ids(ray_session):
    """(a, b) partials with a ≥ 2^31 must not be packed — the old gate
    only rejected b ≥ 2^32 / negative a."""
    import ray.data as rd

    from askg_ray.ops.similarity import _pair_dot_sums

    t = pa.table({
        "a": pa.array([WIDE + 1, WIDE + 1, 5, 5], pa.int64()),
        "b": pa.array([WIDE + 2, WIDE + 2, 6, 6], pa.int64()),
        "p": pa.array([3, 4, 10, 20], pa.int64()),
    })
    got = {(r["a"], r["b"]): r["dot"]
           for r in _pair_dot_sums(rd.from_arrow(t)).take_all()}
    assert got == {(WIDE + 1, WIDE + 2): 7, (5, 6): 30}


# ---------------------------------------------------------------------------
# int64-overflow guards (ADVICE low ×2)


def test_cosine_keep_overflow():
    """dot ~4e8 wraps 100·dot² in int64; the guard must fall back to
    exact big-int arithmetic and keep the predicate truthful."""
    from askg_ray.ops.similarity import _cosine_keep

    dot = np.array([400_000_000, 3, 400_000_000], np.int64)
    # pair 0: cos = 1 (identical) -> keep; pair 1: tiny dot vs big
    # norms -> drop; pair 2: dot² big but norms bigger -> drop
    na = np.array([400_000_000, 400_000_000, 500_000_000], np.int64)
    nb = np.array([400_000_000, 400_000_000, 500_000_000], np.int64)
    keep = _cosine_keep(dot, na, nb)
    expect = [100 * int(d) * int(d) >= 64 * int(x) * int(y)
              for d, x, y in zip(dot, na, nb)]
    assert list(keep) == expect == [True, False, True]
    # vectorized path parity on small values
    dot = np.array([4, 1], np.int64)
    na = np.array([5, 5], np.int64)
    nb = np.array([5, 5], np.int64)
    assert list(_cosine_keep(dot, na, nb)) == [True, False]
    assert list(_cosine_keep(np.array([], np.int64), na[:0], nb[:0])) == []


def test_pmi_ppm_denominator_overflow():
    """n_x·n_y alone can wrap int64 into a negative divisor while the
    numerator gate stays green — the r4 gate checks both sides."""
    from askg_ray.ops.text import _pmi_ppm

    n_x = np.array([3_100_000_000], np.int64)
    n_y = np.array([3_100_000_000], np.int64)
    n_xy = np.array([1], np.int64)
    total = 4_000_000_000
    got = _pmi_ppm(n_xy, n_x, n_y, total)
    expect = 1 * total * 1_000_000 // (3_100_000_000 * 3_100_000_000)
    assert int(got[0]) == expect == 0
    # sanity: numpy alone would have produced garbage via wraparound
    assert (n_x * n_y)[0] < 0
    # small-value vectorized path
    small = _pmi_ppm(np.array([10], np.int64), np.array([20], np.int64),
                     np.array([30], np.int64), 100)
    assert int(small[0]) == 10 * 100 * 1_000_000 // (20 * 30)


# ---------------------------------------------------------------------------
# doc_dup_spans: every-document-short corpus (ADVICE low)


def test_doc_dup_spans_all_short_docs(ray_session, tmp_path):
    """When no document reaches w tokens the dup aggregate is a
    schema-less empty dataset; zero_fill must append the zero column
    instead of raising on a missing field."""
    from askg_ray.ops.curation import doc_dup_spans

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", "d e", "f"], pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = sorted(doc_dup_spans(str(tmp_path)).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["doc_id"] for r in rows] == [1, 2, 3]
    assert all(r["n_windows"] == 0 and r["dup_windows"] == 0
               for r in rows)


# ---------------------------------------------------------------------------
# content-fingerprinted scratch caches (ADVICE low)


def _write_docs(tmp_path, n_chars_vals):
    t = pa.table({
        "doc_id": pa.array(range(len(n_chars_vals)), pa.int64()),
        "n_chars": pa.array(n_chars_vals, pa.int64()),
        "lang": pa.array(["en"] * len(n_chars_vals), pa.string()),
        "source": pa.array(["s"] * len(n_chars_vals), pa.string()),
        "text": pa.array(["x"] * len(n_chars_vals), pa.string()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))


def test_pruned_scan_cache_invalidated_on_regenerate(ray_session, tmp_path):
    """Regenerating the corpus at the same path with the same per-shard
    row counts must NOT serve stale shards from the default scratch
    dir (cache is keyed on path+mtime+size now, not path alone)."""
    from askg_ray.pipelines.export import pruned_range_scan

    _write_docs(tmp_path, [10, 50, 90, 50])
    r1 = pruned_range_scan(str(tmp_path)).to_pylist()[0]
    assert r1["n_match"] == 2

    # same row count, all values now outside [40, 60]
    _write_docs(tmp_path, [10, 90, 10, 90])
    # force a distinct mtime even on coarse-granularity filesystems
    p = str(tmp_path / "documents.parquet")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    r2 = pruned_range_scan(str(tmp_path)).to_pylist()[0]
    assert r2["n_match"] == 0


# ---------------------------------------------------------------------------
# link_mentions size-gated alias policy (VERDICT r3 #5)


def _mention_rows(ds):
    return sorted(
        (r["url"], r["alias"], r["entity_id"], round(r["score"], 6))
        for r in ds.take_all())


def test_link_mentions_sharded_equals_broadcast(ray_session):
    """Forced shard path (threshold 0, one alias per shard) must equal
    the broadcast automaton exactly — including overlapping aliases
    living in different shards, where naive per-shard finditer would
    diverge from the combined leftmost-longest consumption."""
    import ray.data as rd

    from askg_ray.stages.link import link_mentions

    texts = rd.from_arrow(pa.table({
        "url": ["u1", "u2", "u3"],
        "text": [
            "big postgres data pipeline with data and postgres here",
            "data postgres data",
            "nothing relevant",
        ],
    }))
    aliases = pa.table({
        "alias": ["postgres data", "data", "postgres", "pipeline"],
        "entity_id": ["e1", "e2", "e3", "e4"],
        "weight": [0.9, 0.5, 0.7, 0.6],
    })
    base = _mention_rows(link_mentions(texts, aliases, concurrency=1))
    sharded = _mention_rows(link_mentions(
        texts, aliases, concurrency=1,
        broadcast_threshold=0, shard_rows=1))
    assert sharded == base
    # combined-automaton semantics sanity: "postgres data" (longest)
    # wins at its span, so "postgres" alone is only found at the
    # standalone occurrence
    u1 = [(a, e) for (u, a, e, _) in base if u == "u1"]
    assert ("postgres data", "e1") in u1 and ("data", "e2") in u1 \
        and ("postgres", "e3") in u1 and ("pipeline", "e4") in u1


def test_link_mentions_dataset_input_no_driver_concat(ray_session):
    """link_mentions accepts the alias table as a Dataset (the
    __ray_entry__ query path) and still matches the Arrow-table path."""
    import ray.data as rd

    from askg_ray.stages.link import link_mentions

    texts = rd.from_arrow(pa.table({
        "url": ["a"], "text": ["we use fast-redis and slow-redis"]}))
    tbl = pa.table({"alias": ["fast-redis", "slow-redis"],
                    "entity_id": ["r1", "r2"], "weight": [0.9, 0.8]})
    via_tbl = _mention_rows(link_mentions(texts, tbl, concurrency=1))
    via_ds = _mention_rows(link_mentions(texts, rd.from_arrow(tbl),
                                         concurrency=1))
    assert via_tbl == via_ds
    assert len(via_tbl) == 2


# ---------------------------------------------------------------------------
# multimodal decode: real path where PIL exists, loud raise where not


class _StubImage:
    """Minimal PIL.Image stand-in: 'decodes' a payload of raw bytes,
    convert/resize crop-or-pad to the target pixel count."""

    def __init__(self, data: bytes):
        self.data = data

    def convert(self, mode):
        return self

    def resize(self, wh):
        w, h = wh
        need = w * h
        buf = (self.data * (need // max(len(self.data), 1) + 1))[:need]
        return _StubImage(buf)

    def tobytes(self):
        return self.data


def _install_stub_pil(monkeypatch):
    import sys
    import types

    mod = types.ModuleType("PIL")
    img_mod = types.ModuleType("PIL.Image")
    img_mod.open = lambda fh: _StubImage(fh.read())
    mod.Image = img_mod
    monkeypatch.setitem(sys.modules, "PIL", mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", img_mod)


def test_media_decode_lib_absent_raises_at_init():
    """No PIL in this container: fake=False must fail at ACTOR BUILD
    (once, loudly), not mid-stream."""
    import pytest as _pytest

    from askg_ray.ops import multimodal as mm

    with _pytest.raises(NotImplementedError):
        mm.MediaFeaturizer(fake=False)
    with _pytest.raises(NotImplementedError):
        mm.MediaResizer(fake=False)


def test_media_decode_lib_present_real_path(monkeypatch):
    """With (a stub) PIL importable, fake=False decodes for real:
    image features come from decoded pixels, audio features from raw
    int16 PCM band energies, resize fingerprints from resized bytes."""
    import numpy as np

    from askg_ray.ops import multimodal as mm

    _install_stub_pil(monkeypatch)
    media = mm.synth_media_table(8)

    feats = mm.MediaFeaturizer(fake=False)(media)
    assert feats.num_rows == 8
    mat = np.array(feats["feature"].to_pylist(), dtype=np.float32)
    assert mat.shape == (8, 8)
    assert np.isfinite(mat).all() and (mat >= 0).all() and (mat <= 1).all()
    # image rows (even media_id) differ from the fake sha-based path
    fake = mm.MediaFeaturizer(fake=True)(media)
    fm = np.array(fake["feature"].to_pylist(), dtype=np.float32)
    assert not np.allclose(mat, fm)

    res = mm.MediaResizer(fake=False)(media)
    assert res.num_rows == 8
    assert all(len(fp) == 16 for fp in res["resized_fp16"].to_pylist())
    # deterministic: same inputs, same fingerprints
    res2 = mm.MediaResizer(fake=False)(media)
    assert res["resized_fp16"].to_pylist() == res2["resized_fp16"].to_pylist()
    # and different from the fake-path fingerprints
    fres = mm.MediaResizer(fake=True)(media)
    assert (res["resized_fp16"].to_pylist()
            != fres["resized_fp16"].to_pylist())


# ---------------------------------------------------------------------------
# chunked direct exchange (round-4 above-gate path)


def test_chunked_exchange_paths_match(ray_session, tmp_path):
    """Forcing chunk_rows below the input size must leave results
    identical to the single exchange (pair dots, pair distinct,
    co-order support)."""
    import ray.data as rd

    from askg_ray.ops.dedup import _distinct_pairs
    from askg_ray.ops.graph import _coorder_support
    from askg_ray.ops.similarity import _pair_dot_sums

    rng = np.random.default_rng(11)
    t = pa.table({
        "a": pa.array(rng.integers(0, 50, 4000), pa.int64()),
        "b": pa.array(rng.integers(0, 50, 4000), pa.int64()),
        "p": pa.array(rng.integers(1, 9, 4000), pa.int64()),
    })
    one = {(r["a"], r["b"]): r["dot"]
           for r in _pair_dot_sums(rd.from_arrow(t)).take_all()}
    many = {(r["a"], r["b"]): r["dot"]
            for r in _pair_dot_sums(rd.from_arrow(t),
                                    exchange_max_rows=500).take_all()}
    assert one == many and len(one) > 100

    cand = rd.from_arrow(t.select(["a", "b"]))
    d1 = {(r["a"], r["b"]) for r in _distinct_pairs(cand).take_all()}
    d2 = {(r["a"], r["b"])
          for r in _distinct_pairs(cand, exchange_max_rows=500).take_all()}
    assert d1 == d2 and len(d1) > 100

    rows = [(int(rng.integers(1, 40)), int(rng.integers(1, 60)))
            for _ in range(600)]
    sf = _write_lineitem(tmp_path, rows)
    s1 = {(r["u"], r["v"]): r["n"]
          for r in _coorder_support(sf).take_all()}
    s2 = {(r["u"], r["v"]): r["n"]
          for r in _coorder_support(sf, exchange_max_rows=40).take_all()}
    assert s1 == _coorder_truth(rows)
    # exchange_max_rows gates BOTH the pair explode and the support
    # reduce; with it tiny the explode takes groupby and the reduce
    # takes the chunked exchange — counts must not change
    assert s2 == s1
