"""Property-based tests (hypothesis) for the pure kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from askg_ray.merge import merge_phase1, merge_phase2
from askg_ray.minhash import (
    char_shingles,
    hamming64,
    jaccard,
    minhash_signature,
    shingle_ids,
    simhash64,
)
from askg_ray.normalize import (
    normalize_id,
    normalize_name,
    normalize_repository_url,
)

names = st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=300),
                max_size=60)


@given(names)
@settings(max_examples=200)
def test_normalize_name_idempotent(s):
    once = normalize_name(s)
    assert normalize_name(once) == once or once == ""
    # output alphabet is constrained
    assert all(c.isalnum() or c == " " for c in once)


@given(names)
@settings(max_examples=200)
def test_normalize_id_idempotent_and_bounded(s):
    once = normalize_id(s)
    assert normalize_id(once) == once
    assert len(once) <= 100
    assert all(c.islower() or c.isdigit() or c in "-/" for c in once)


@given(st.text(max_size=80))
@settings(max_examples=100)
def test_repo_url_normalization_stable(s):
    u = normalize_repository_url("https://" + s) if s else None
    if u is not None:
        # scheme-stripped and lowercase
        assert u == u.lower()
        assert not u.startswith("http")


@given(st.text(min_size=1, max_size=40), st.text(min_size=0, max_size=5))
@settings(max_examples=100)
def test_minhash_estimates_jaccard_direction(base, suffix):
    """Signature agreement of s vs s+suffix ≥ agreement vs reversed+noise."""
    a = shingle_ids(char_shingles(base, 2))
    b = shingle_ids(char_shingles(base + suffix, 2))
    c = shingle_ids(char_shingles(base[::-1] + "qzx9", 2))
    sa = minhash_signature(a, 64)
    sb = minhash_signature(b, 64)
    sc = minhash_signature(c, 64)
    sim_ab = float((sa == sb).mean())
    j_ab = jaccard(set(a.tolist()), set(b.tolist()))
    j_ac = jaccard(set(a.tolist()), set(c.tolist()))
    if j_ab - j_ac > 0.5:  # clearly more similar → estimate must not invert hard
        sim_ac = float((sa == sc).mean())
        assert sim_ab >= sim_ac - 0.25


@given(st.lists(st.integers(min_value=1, max_value=1 << 31), min_size=1,
                max_size=30, unique=True))
@settings(max_examples=100)
def test_simhash_self_zero(ids):
    import numpy as np

    arr = np.array(ids, dtype=np.uint64)
    h = simhash64(arr)
    assert 0 <= h < (1 << 64)
    assert hamming64(h, h) == 0


_rec = st.fixed_dictionaries({
    "description": st.one_of(st.none(), st.text(max_size=20)),
    "version": st.one_of(st.none(), st.text(max_size=5)),
    "license": st.one_of(st.none(), st.text(max_size=5)),
    "homepage": st.one_of(st.none(), st.text(max_size=10)),
    "categories": st.lists(st.sampled_from(["a", "b", "c"]), max_size=3),
    "operations": st.lists(st.sampled_from(["read", "write"]), max_size=2),
    "data_types": st.lists(st.text(max_size=4), max_size=2),
    "tool_names": st.lists(st.text(min_size=1, max_size=4), max_size=3),
    "popularity_score": st.integers(min_value=0, max_value=100),
    "download_count": st.integers(min_value=0, max_value=100),
    "warc_ts": st.integers(min_value=0, max_value=1000),
})


@given(_rec, _rec)
@settings(max_examples=150)
def test_merge_invariants(a, b):
    for merge in (merge_phase1, merge_phase2):
        m = merge(a, b)
        # unions are supersets, sorted, deduped
        assert set(m["categories"]) >= set(a["categories"])
        assert m["categories"] == sorted(set(m["categories"]))
        # maxima never decrease (truthiness semantics: 0 counts as empty)
        if a["popularity_score"] and b["popularity_score"]:
            assert m["popularity_score"] == max(a["popularity_score"],
                                                b["popularity_score"])
        # fill-empty never overwrites non-empty base scalars
        if a["description"]:
            assert m["description"] == a["description"]
        assert m["warc_ts"] == max(a["warc_ts"], b["warc_ts"])


# ---- native fastratio == difflib, exactly ---------------------------------

_name_alpha = st.text(
    alphabet="abcdefghij-_ 0123456789é中", min_size=0, max_size=60)


@given(_name_alpha, _name_alpha,
       st.sampled_from([0.0, 0.5, 0.75, 0.85]))
@settings(max_examples=400, deadline=None)
def test_fastratio_matches_difflib_exactly(a, b, thresh):
    """The C replica must be BIT-identical to SequenceMatcher: same
    quick_ratio short-circuit at the threshold, same ratio doubles."""
    from difflib import SequenceMatcher

    from askg_ray._fastratio import ratio_gated

    got = ratio_gated(a, b, thresh)
    if got is None:  # no compiler on this host — fallback path covers it
        return
    sm = SequenceMatcher(None, a, b)
    want = 0.0 if sm.quick_ratio() <= thresh else sm.ratio()
    assert got == want


def test_name_ratio_native_and_fallback_agree():
    """_name_ratio must return the same values with the native path
    disabled (ASKG_NO_NATIVE) as with it on — spot-checked here by
    comparing against a fresh difflib evaluation."""
    from difflib import SequenceMatcher

    from askg_ray.stages.dedup_near import _name_ratio

    cases = [("mcp server", "mcp-server"), ("alpha", "alphabet"),
             ("x" * 150, "x" * 149 + "y"), ("", "nonempty"),
             ("abc", "abc")]
    for nn1, nn2 in cases:
        got = _name_ratio(nn1, nn2, 0.75)
        if nn1 == nn2:
            assert got == 1.0
            continue
        l1, l2 = len(nn1), len(nn2)
        if not l1 or not l2 or 2.0 * min(l1, l2) / (l1 + l2) <= 0.75:
            assert got == 0.0
            continue
        sm = SequenceMatcher(None, nn1, nn2)
        want = 0.0 if sm.quick_ratio() <= 0.75 else sm.ratio()
        assert got == want


@given(st.text(alphabet="abcdefgh-_ 0123456789é中𝄞", min_size=0,
               max_size=40))
@settings(max_examples=300, deadline=None)
def test_native_name_bands_match_python(s):
    """The C band kernel must reproduce the pure-Python
    shingle→minhash→band_keys chain exactly (same crc32, same uint64
    wrap, same sentinel for the empty string)."""
    from askg_ray._fastratio import name_bands
    from askg_ray.minhash import (_coeffs, band_keys, char_shingles,
                                  minhash_signature, shingle_ids)
    from askg_ray.stages.dedup_near import _BANDS, _NUM_PERM

    a, b = _coeffs(_NUM_PERM, 7)
    got = name_bands(s, a, b, _NUM_PERM, _BANDS)
    if got is None:  # no compiler on this host
        return
    want = tuple(band_keys(
        minhash_signature(shingle_ids(char_shingles(s, k=2)), _NUM_PERM),
        _BANDS))
    assert got == want


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), min_size=0,
                max_size=50))
@settings(max_examples=100, deadline=None)
def test_native_edge_ids_match_numpy(vals):
    """The C edge-id kernel (splitmix chain + hex) must emit the same
    StringArray as the numpy fallback."""
    import numpy as np

    from askg_ray.stages import edges as E

    hs = np.array(vals, dtype=np.uint64)
    hd = hs[::-1].copy()
    t = E._tag_hash("similar")
    got = E._ids_from_hashes(hs, hd, t)
    # numpy fallback, inlined (module reload under ASKG_NO_NATIVE is
    # too heavy per example)
    h1 = E._splitmix(hs ^ E._splitmix(hd ^ t))
    h2 = E._splitmix(h1 ^ hd ^ np.uint64(0xD6E8FEB86659FD93))
    n = len(h1)
    b = np.empty((n, 16), dtype=np.uint8)
    b[:, :8] = h1.byteswap().view(np.uint8).reshape(n, 8)
    b[:, 8:] = h2.byteswap().view(np.uint8).reshape(n, 8)
    import pyarrow as pa
    chars = np.ascontiguousarray(E._HEX2[b])
    offsets = np.arange(0, 32 * (n + 1), 32, dtype=np.int32)
    want = pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets), pa.py_buffer(chars))
    assert got.equals(want)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(st.tuples(st.integers(min_value=-50, max_value=50),
                       st.integers(min_value=1, max_value=9)),
             min_size=1, max_size=300),
    st.integers(min_value=1, max_value=4),
    st.sampled_from(["int", "str"]),
)
def test_chunked_exchange_equals_plain_groupby(ray_session, rows, k_div,
                                               key_type):
    """exchange_reduce_chunked(sum kernel) == exact per-key sums for
    ANY chunk size ≥ 1 and both key column types (vectorized int mix
    vs per-distinct crc32)."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from askg_ray.stages.exchange import exchange_reduce_chunked

    keys = [k for k, _ in rows]
    if key_type == "str":
        tbl = pa.table({"k": pa.array([f"k{v}" for v in keys]),
                        "p": pa.array([p for _, p in rows], pa.int64())})
        expect = collections.Counter()
        for v, p in rows:
            expect[f"k{v}"] += p
        out_schema = pa.schema([("k", pa.string()), ("s", pa.int64())])
    else:
        tbl = pa.table({"k": pa.array(keys, pa.int64()),
                        "p": pa.array([p for _, p in rows], pa.int64())})
        expect = collections.Counter()
        for v, p in rows:
            expect[v] += p
        out_schema = pa.schema([("k", pa.int64()), ("s", pa.int64())])

    def sum_kernel(t: pa.Table) -> pa.Table:
        g = (pa.table({"k": t["k"], "p": t["p"]})
             .group_by("k").aggregate([("p", "sum")]))
        return pa.table({"k": g["k"], "s": g["p_sum"].cast(pa.int64())},
                        schema=out_schema)

    chunk_rows = max(1, len(rows) // k_div)
    ds = rd.from_arrow(tbl).materialize()
    got = {r["k"]: r["s"]
           for r in exchange_reduce_chunked(
               ds, "k", sum_kernel, out_schema,
               chunk_rows=chunk_rows).take_all()}
    assert got == dict(expect)
