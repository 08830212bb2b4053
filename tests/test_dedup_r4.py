"""Round-4 doc-dedup stress tests: the vectorized thin-row candidate
path must survive dup-HEAVY clusters (every exact dup shares all bands,
so cells go quadratic — the regime the round-3 per-pair-Python verify
was flagged for) and still match a brute-force oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _union_find(n_ids):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    return find, union


def _brute_assign(ids, pair_pred):
    find, union = _union_find(ids)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if pair_pred(a, b):
                union(a, b)
    # path-compress to the true minimum of each component
    comp = {}
    for i in ids:
        r = i
        while True:
            nr = find(r)
            if nr == r:
                break
            r = nr
        comp.setdefault(r, []).append(i)
    return {i: min(m) for m in comp.values() for i in m}


def _dup_heavy_corpus():
    """200 copies of one doc + 100 of another + 50 distinct docs —
    every copy shares all 16 bands with every other, the quadratic
    cell regime."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(400)]
    base_a = " ".join(rng.choice(vocab, 60))
    base_b = " ".join(rng.choice(vocab, 60))
    texts, ids = [], []
    did = 0
    for _ in range(200):
        texts.append(base_a)
        ids.append(did)
        did += 1
    for _ in range(100):
        texts.append(base_b)
        ids.append(did)
        did += 1
    for _ in range(50):
        texts.append(" ".join(rng.choice(vocab, 60)))
        ids.append(did)
        did += 1
    return ids, texts


def _write_corpus(tmp_path, ids, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_minhash_dedup_dup_heavy(ray_session, tmp_path):
    from askg_ray.minhash import (band_keys, minhash_signature, shingle_ids,
                                  word_shingles)
    from askg_ray.ops.dedup import minhash_dedup

    ids, texts = _dup_heavy_corpus()
    sf = _write_corpus(tmp_path, ids, texts)

    sigs = {i: minhash_signature(
        shingle_ids(word_shingles(t.lower(), k=3)), 64)
        for i, t in zip(ids, texts)}
    bands = {i: set(band_keys(s, 16)) for i, s in sigs.items()}

    def pred(a, b):
        # pipeline semantics: candidates share ≥1 LSH band, then the
        # estimated-Jaccard verify
        return bool(bands[a] & bands[b]) \
            and int((sigs[a] == sigs[b]).sum()) * 2 >= 64

    expect = _brute_assign(ids, pred)
    got = {r["doc_id"]: r["rep_id"] for r in minhash_dedup(sf).take_all()}
    assert got == expect
    # sanity on the construction: two big clusters actually formed
    assert sum(1 for v in got.values() if v == got[0]) == 200
    assert sum(1 for v in got.values() if v == got[200]) == 100


def test_simhash_dedup_dup_heavy(ray_session, tmp_path):
    from askg_ray.minhash import simhash64, token_ids_md5
    from askg_ray.ops.dedup import simhash_dedup

    ids, texts = _dup_heavy_corpus()
    sf = _write_corpus(tmp_path, ids, texts)

    hs = {i: simhash64(token_ids_md5(
        [w for w in t.lower().split(" ") if w]), mix=False)
        for i, t in zip(ids, texts)}

    def pred(a, b):
        return bin(hs[a] ^ hs[b]).count("1") <= 3

    expect = _brute_assign(ids, pred)
    got = {r["doc_id"]: r["rep_id"] for r in simhash_dedup(sf).take_all()}
    assert got == expect


def test_ngram_dedup_overlapping_docs(ray_session, tmp_path):
    """Half-overlapping shingle sets around the Jaccard-0.5 boundary,
    plus empty docs (never dups of each other by the union>0 rule)."""
    from askg_ray.minhash import (band_keys, minhash_signature, shingle_ids,
                                  word_shingles)
    from askg_ray.ops.dedup import ngram_jaccard_dedup

    rng = np.random.default_rng(9)
    vocab = [f"t{i}" for i in range(100)]
    core = list(rng.choice(vocab, 40))
    texts, ids = [], []
    for d in range(30):
        # doc d = shared core + d fresh words → pairwise Jaccard decays
        extra = [f"x{d}_{j}" for j in range(d)]
        texts.append(" ".join(core + extra))
        ids.append(d)
    texts += ["", ""]
    ids += [30, 31]
    sf = _write_corpus(tmp_path, ids, texts)

    shs = {i: set(shingle_ids(word_shingles(t.lower(), k=3)).tolist())
           for i, t in zip(ids, texts)}
    bands = {i: set(band_keys(minhash_signature(
        shingle_ids(word_shingles(t.lower(), k=3)), 64), 16))
        for i, t in zip(ids, texts)}

    def pred(a, b):
        # pipeline semantics: LSH-band candidates, exact-Jaccard verify
        if not bands[a] & bands[b]:
            return False
        u = len(shs[a] | shs[b])
        return u > 0 and 2 * len(shs[a] & shs[b]) >= u

    expect = _brute_assign(ids, pred)
    got = {r["doc_id"]: r["rep_id"]
           for r in ngram_jaccard_dedup(sf).take_all()}
    assert got[30] == 30 and got[31] == 31       # empties stay singletons
    assert got == expect


def test_dedup_incremental_branches_and_paths(ray_session, tmp_path):
    """All three statuses (dup_of_corpus / kept / dup_in_delta) on a
    crafted corpus; direct-exchange and groupby paths agree."""
    from askg_ray.ops.dedup import dedup_incremental

    # docs 7 and 14 share a text → their % 7 "changed" versions are
    # identical (dup_in_delta pair); doc 17's re-crawl copy hits the
    # corpus; doc 13's "new doc 13" is fresh
    texts = {i: f"text {i} body" for i in range(20)}
    texts[14] = texts[7]
    t = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                  "text": pa.array([texts[i] for i in sorted(texts)],
                                   pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    fast = {r["doc_id"]: (r["status"], r["rep_doc_id"])
            for r in dedup_incremental(str(tmp_path)).take_all()}
    slow = {r["doc_id"]: (r["status"], r["rep_doc_id"])
            for r in dedup_incremental(str(tmp_path),
                                       exchange_max_rows=0).take_all()}
    chunked = {r["doc_id"]: (r["status"], r["rep_doc_id"])
               for r in dedup_incremental(str(tmp_path),
                                          exchange_max_rows=5).take_all()}
    assert fast == slow == chunked
    assert fast[7] == ("kept", 7)                  # changed, fresh content
    assert fast[14] == ("dup_in_delta", 7)         # same changed content
    assert fast[2000017] == ("dup_of_corpus", 17)  # re-crawl copy
    # copy of doc 14's text reps to the MIN corpus holder (doc 7)
    assert fast[2000000] == ("dup_of_corpus", 0)
    assert fast[1000013] == ("kept", 1000013)      # brand-new content
