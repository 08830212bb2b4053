"""Relationship inference — vectorized blocked self-joins per predicate.

Reproduces the reference's O(n²) pairwise inference
(/root/reference/src/neo4j_integration.py:558-631) as three blocked
self-join families over a slim node projection (never n² globally):

  author blocks   → same_author           (conf 1.0; 574-584)
  category blocks → similar_functionality (conf |∩|/max; 586-599)
                    + alternative_to      (conf 0.6, same language +
                                           shared cats; 616-629)
  op-pair blocks  → complementary         (conf (|∩|/max)·0.8, needs
                                           ≥2 shared ops; 601-614)

Blocks are grid-salted for skew (selfjoin.py). The edge output of this
predicate set is inherently pair-dense, so the kernels are vectorized:
category/operation lists become bitmasks at explode time; each cell
computes all pair intersections with numpy popcounts; evidence /
description strings are cached per intersection mask (≤ 2^12 distinct).

No dedupe shuffle: a pair sharing k categories meets in k blocks but is
emitted only from the block equal to its LOWEST shared category bit
(resp. the lowest shared op-pair) — exactly-once by construction.
Edge direction: lexicographic by node id (canonical substitute for the
reference's input-index order, SURVEY.md §2.11). Evidence value lists
are sorted (the reference iterates Python sets — randomized order).
"""

from __future__ import annotations

from datetime import datetime
from itertools import combinations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..arrowutil import EDGES_SCHEMA
from ..vocab import (
    CATEGORIES,
    OPERATIONS,
    REL_ALTERNATIVE,
    REL_COMPLEMENTARY,
    REL_SAME_AUTHOR,
    REL_SIMILAR,
)
from .selfjoin import blocked_self_join

_CAT_BIT = {c: i for i, c in enumerate(CATEGORIES)}
_OP_BIT = {o: i for i, o in enumerate(OPERATIONS)}

_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.int32)


def _popcount(x: np.ndarray) -> np.ndarray:
    return _POP16[x & 0xFFFF] + _POP16[(x >> 16) & 0xFFFF]


_SLIM = ["id", "author", "implementation_language", "cat_mask", "op_mask"]
_SLIM_SCHEMA = pa.schema([
    ("block_key", pa.string()),
    ("id", pa.string()),
    ("author", pa.string()),
    ("implementation_language", pa.string()),
    ("cat_mask", pa.int32()),
    ("op_mask", pa.int32()),
])


def _mask(values, table) -> int:
    m = 0
    for v in values or []:
        b = table.get(v)
        if b is not None:
            m |= 1 << b
    return m


def _explode_by(kind: str):
    """kind: 'author' | 'category' | 'oppair' — one slim row per block."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        authors = batch["author"].to_pylist()
        langs = batch["implementation_language"].to_pylist()
        cats = batch["categories"].to_pylist()
        ops = batch["operations"].to_pylist()
        out = {n: [] for n in _SLIM_SCHEMA.names}
        for i in range(len(ids)):
            cm = _mask(cats[i], _CAT_BIT)
            om = _mask(ops[i], _OP_BIT)
            if kind == "author":
                keys = [f"a|{authors[i]}"] if authors[i] else []
            elif kind == "category":
                keys = [f"c|{_CAT_BIT[c]:02d}" for c in set(cats[i] or [])
                        if c in _CAT_BIT]
            else:
                bits = sorted({_OP_BIT[o] for o in ops[i] or [] if o in _OP_BIT})
                keys = [f"o|{x}{y}" for x, y in combinations(bits, 2)]
            for k in keys:
                out["block_key"].append(k)
                out["id"].append(ids[i])
                out["author"].append(authors[i])
                out["implementation_language"].append(langs[i])
                out["cat_mask"].append(cm)
                out["op_mask"].append(om)
        return pa.table({n: pa.array(out[n], _SLIM_SCHEMA.field(n).type)
                         for n in _SLIM_SCHEMA.names}, schema=_SLIM_SCHEMA)

    return fn


def _names_from_mask(mask: int, vocab: list[str]) -> list[str]:
    return sorted(v for i, v in enumerate(vocab) if (mask >> i) & 1)


def _pair_index(left: dict, right: dict | None):
    """(i_idx, j_idx, a_ids, b_ids, swap arrays) honoring id order."""
    if right is None:
        n = len(left["id"])
        if n < 2:
            return None
        i, j = np.triu_indices(n, 1)
        return left, left, i, j
    if not left.get("id") or not right.get("id"):
        return None
    n1, n2 = len(left["id"]), len(right["id"])
    i, j = np.repeat(np.arange(n1), n2), np.tile(np.arange(n2), n1)
    return left, right, i, j


def _ordered_ids(lc, rc, i, j):
    """(ai, bi, pool) — per-pair indices into the cell's small id pool
    with pool[ai] < pool[bi], WITHOUT per-pair string work of any kind
    (the edge columns stay dictionary-encoded over ``pool``; expanding
    to plain strings was 211 B/edge × 19.5M edges of fresh allocations).

    Cells arrive id-sorted (selfjoin._cell_tables), so diagonal pairs
    (i < j) are already ordered. Off-diagonal: one O(n₂ log n₁)
    searchsorted ranks right ids among left ids (grid buckets partition
    ids disjointly, so equality can't occur) and the swap becomes an
    index select over the concatenated pool."""
    L = pa.array(lc["id"], pa.string())
    if rc is lc:
        return i, j, L
    R = pa.array(rc["id"], pa.string())
    pos = np.searchsorted(np.asarray(lc["id"], dtype=object),
                          np.asarray(rc["id"], dtype=object), side="left")
    swap = pos[j] <= i  # ⟺ R[j] < L[i]
    n1 = len(L)
    comb = pa.concat_arrays([L, R])
    ai = np.where(swap, j + n1, i)
    bi = np.where(swap, i, j + n1)
    return ai, bi, comb


_HEXTAB = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)
# byte → its two hex chars packed as one little-endian uint16 (low byte =
# high-nibble char), so the hex expansion is ONE contiguous gather instead
# of two strided half-writes — the strided stores were the measured cost
# of _ids_from_hashes under full-width memory contention
_HEX2 = np.array([int.from_bytes(f"{i:02x}".encode(), "little")
                  for i in range(256)], dtype=np.uint16)


def _splitmix(x: np.ndarray) -> np.ndarray:
    # in-place after the first copy: the 9-temporary version paid ~2×
    # the memory traffic on multi-million-edge cells
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _pool_hashes(pool: pa.Array) -> np.ndarray:
    """Stable 64-bit hash per unique node id (pool is cell-small)."""
    from hashlib import blake2b

    return np.array([int.from_bytes(blake2b(s.encode(), digest_size=8)
                                    .digest(), "little")
                     for s in pool.to_pylist()], dtype=np.uint64)


def _tag_hash(tag: str) -> np.uint64:
    from hashlib import blake2b

    return np.uint64(int.from_bytes(blake2b(tag.encode(), digest_size=8)
                                    .digest(), "little"))


# rel_type value → the id-derivation tag hash used at emission (the
# tags at the _table call sites) — what lets truncate_out_degree drop
# the id column across its shuffle and rebuild it byte-identically
_TAG_HASH = {
    REL_SAME_AUTHOR: _tag_hash("same_author"),
    REL_SIMILAR: _tag_hash("similar"),
    REL_ALTERNATIVE: _tag_hash("alternative"),
    REL_COMPLEMENTARY: _tag_hash("complementary"),
}


def _edge_ids(ai, bi, pool: pa.Array, tag: str) -> pa.Array:
    """Deterministic 128-bit (32 hex chars) edge id per (src, rel, dst)
    — a pure function of the node id strings and relationship tag, so
    reruns are byte-identical AND the id can be dropped before a
    shuffle and recomputed after (truncate_out_degree does exactly
    that). Built fully vectorized: 64-bit mixes in numpy, nibble-table
    hex, and the Arrow StringArray assembled directly from fixed-stride
    offset + data buffers (no per-edge Python strings; the old
    ``src_tag_dst`` join was ~65 B/edge — 1.3 GB of the 4.1 GB edge
    block at the bench corpus)."""
    hp = _pool_hashes(pool)
    return _ids_from_hashes(hp[ai], hp[bi], _tag_hash(tag))


def _ids_from_hashes(hs: np.ndarray, hd: np.ndarray, t) -> pa.Array:
    n = len(hs)
    offsets = np.arange(0, 32 * (n + 1), 32, dtype=np.int32)
    from .._fastratio import edge_ids_hex
    chars = edge_ids_hex(hs, hd, t)  # one C pass, no temporaries
    if chars is None:  # numpy fallback — identical output, ~4× the traffic
        h1 = _splitmix(hs ^ _splitmix(hd ^ t))
        h2 = _splitmix(h1 ^ hd ^ np.uint64(0xD6E8FEB86659FD93))
        b = np.empty((n, 16), dtype=np.uint8)
        b[:, :8] = h1.byteswap().view(np.uint8).reshape(n, 8)
        b[:, 8:] = h2.byteswap().view(np.uint8).reshape(n, 8)
        chars = np.ascontiguousarray(_HEX2[b])
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offsets), pa.py_buffer(chars))


def _dict32(indices: np.ndarray, pool: pa.Array) -> pa.DictionaryArray:
    return pa.DictionaryArray.from_arrays(
        pa.array(np.ascontiguousarray(indices, dtype=np.int32)), pool)


def _evid_list(inv: np.ndarray, pool_lists: list[list[str]]) -> pa.ListArray:
    """evidence column: list over dictionary-encoded items. ``inv`` maps
    each edge to its pool entry (a small list of evidence strings);
    expansion is offsets + index gathers — never per-edge strings."""
    strings: list[str] = []
    sid: dict = {}
    enc = []
    for lst in pool_lists:
        ids = []
        for s in lst:
            k = sid.get(s)
            if k is None:
                k = sid[s] = len(strings)
                strings.append(s)
            ids.append(k)
        enc.append(np.array(ids, dtype=np.int32))
    lens = np.array([len(e) for e in enc], dtype=np.int32)
    per_edge = lens[inv]
    offsets = np.empty(len(inv) + 1, dtype=np.int32)
    offsets[0] = 0
    np.cumsum(per_edge, out=offsets[1:])
    if (lens == 1).all():
        items = np.concatenate(enc)[inv]
    else:
        flat = np.concatenate(enc)
        starts = np.cumsum(lens) - lens
        idx = (np.repeat(starts[inv], per_edge)
               + np.arange(int(per_edge.sum()), dtype=np.int64)
               - np.repeat(offsets[:-1], per_edge))
        items = flat[idx]
    item_arr = pa.DictionaryArray.from_arrays(
        pa.array(items), pa.array(strings, pa.string()))
    return pa.ListArray.from_arrays(pa.array(offsets), item_arr)


# Deterministic stand-in for ServerRelationship.created_at
# (/root/reference/src/models.py:122, set to datetime.now() at build);
# fixed so every rerun over the same corpus is byte-identical.
EDGE_CREATED_AT = datetime(2025, 3, 1)
_CREATED_AT_SCALAR = pa.scalar(EDGE_CREATED_AT, pa.timestamp("us"))
_REL_SCALARS = {}  # rel string → 1-row dictionary array, reused per n


def _const_rel(rel: str, n: int) -> pa.DictionaryArray:
    """Constant rel_type column without a 14M-element Python list:
    int8 zero indices (numpy) over a 1-entry dictionary."""
    dic = _REL_SCALARS.get(rel)
    if dic is None:
        dic = _REL_SCALARS[rel] = pa.array([rel], pa.string())
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int8)), dic)


def _table(ai, bi, pool, tag, rel, conf, desc, evid) -> pa.Table:
    """ai/bi: per-pair indices into the cell's id ``pool`` (src < dst);
    desc/evid: DictionaryArrays over the cell's few distinct strings.
    Every column is either dictionary-encoded or fixed-width — no
    per-edge Python objects and ~4× fewer output bytes than plain
    string columns (19.5M edges at the sf0.1 bench corpus)."""
    n = len(ai)
    if not isinstance(conf, (pa.Array, pa.ChunkedArray)):
        conf = pa.array(np.asarray(conf, dtype=np.float64), pa.float64())
    return pa.table({
        "id": _edge_ids(ai, bi, pool, tag),
        "src": _dict32(ai, pool),
        "dst": _dict32(bi, pool),
        "rel_type": _const_rel(rel, n),
        "confidence": conf,
        "description": desc,
        "evidence": evid,
        "created_at": pa.repeat(_CREATED_AT_SCALAR, n),
    }, schema=EDGES_SCHEMA)


def _const_dict(value, typ: pa.DataType, n: int) -> pa.DictionaryArray:
    """n copies of one value as zero indices over a 1-entry dictionary."""
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value], typ))


def _author_cell(left: dict, right: dict | None, key: str) -> pa.Table | None:
    px = _pair_index(left, right)
    if px is None:
        return None
    lc, rc, i, j = px
    ai, bi, pool = _ordered_ids(lc, rc, i, j)
    author = key.split("|", 1)[1]
    n = len(ai)
    conf = np.ones(n)
    desc = _const_dict(f"Both servers created by {author}", pa.string(), n)
    evid = _evid_list(np.zeros(n, dtype=np.int64),
                      [[f"Author: {author}"]])
    return _table(ai, bi, pool, "same_author", REL_SAME_AUTHOR, conf, desc, evid)


def _category_cell(left: dict, right: dict | None, key: str) -> pa.Table | None:
    px = _pair_index(left, right)
    if px is None:
        return None
    lc, rc, i, j = px
    block_bit = int(key.split("|", 1)[1])
    cm_l = np.array(lc["cat_mask"], dtype=np.int32)
    cm_r = np.array(rc["cat_mask"], dtype=np.int32)
    inter = cm_l[i] & cm_r[j]
    # emit only from the lowest shared category's block: exactly-once
    keep = (inter & ((1 << block_bit) - 1) == 0) & ((inter >> block_bit) & 1 == 1)
    if not keep.any():
        return None
    i, j, inter = i[keep], j[keep], inter[keep]
    len_l = _popcount(cm_l)[i]
    len_r = _popcount(cm_r)[j]
    n_common = _popcount(inter)
    conf = n_common / np.maximum(len_l, len_r)
    ai, bi, pool = _ordered_ids(lc, rc, i, j)

    def strings(m: int):
        names = _names_from_mask(m, CATEGORIES)
        return (f"Share {len(names)} common categories",
                [f"Common categories: {', '.join(names)}"])

    # per-edge strings as dictionary indices over the few distinct
    # masks — the string formatting runs once per mask value, and the
    # edge column is int32 indices, never expanded strings
    uniq, inv = np.unique(inter, return_inverse=True)
    pairs = [strings(int(m)) for m in uniq]
    desc = _dict32(inv, pa.array([p[0] for p in pairs], pa.string()))
    evid = _evid_list(inv, [p[1] for p in pairs])
    out = _table(ai, bi, pool, "similar", REL_SIMILAR, conf, desc, evid)

    # alternative_to: same non-null language + shared categories (616-629)
    langs_l = np.array([x or "" for x in lc["implementation_language"]], dtype=object)
    langs_r = np.array([x or "" for x in rc["implementation_language"]], dtype=object)
    same_lang = (langs_l[i] == langs_r[j]) & (langs_l[i] != "")
    if same_lang.any():
        ia, ib = ai[same_lang], bi[same_lang]
        lang_vals = langs_l[i][same_lang]
        lu, linv = np.unique(lang_vals, return_inverse=True)
        conf2 = np.full(len(ia), 0.6)
        desc2 = _dict32(linv, pa.array(
            [f"Alternative implementations in {lv}" for lv in lu],
            pa.string()))
        evid2 = _evid_list(linv, [[f"Same language: {lv}",
                                   "Similar categories"] for lv in lu])
        out = pa.concat_tables([
            out, _table(ia, ib, pool, "alternative", REL_ALTERNATIVE,
                        conf2, desc2, evid2)])
    return out


def _oppair_cell(left: dict, right: dict | None, key: str) -> pa.Table | None:
    px = _pair_index(left, right)
    if px is None:
        return None
    lc, rc, i, j = px
    bits = key.split("|", 1)[1]
    block_mask = (1 << int(bits[0])) | (1 << int(bits[1]))
    om_l = np.array(lc["op_mask"], dtype=np.int32)
    om_r = np.array(rc["op_mask"], dtype=np.int32)
    inter = om_l[i] & om_r[j]
    n_common = _popcount(inter)
    # exactly-once: this block must be the two LOWEST shared-op bits
    low1 = inter & (-inter)
    rest = inter ^ low1
    low2 = rest & (-rest)
    keep = (n_common >= 2) & ((low1 | low2) == block_mask)
    if not keep.any():
        return None
    i2, j2, inter = i[keep], j[keep], inter[keep]
    conf = (_popcount(inter) / np.maximum(_popcount(om_l)[i2], _popcount(om_r)[j2])) * 0.8
    ai, bi, pool = _ordered_ids(lc, rc, i2, j2)

    def strings(m: int):
        names = _names_from_mask(m, OPERATIONS)
        return (f"Share {len(names)} common operations",
                [f"Common operations: {', '.join(names)}"])

    uniq, inv = np.unique(inter, return_inverse=True)
    pairs = [strings(int(m)) for m in uniq]
    desc = _dict32(inv, pa.array([p[0] for p in pairs], pa.string()))
    evid = _evid_list(inv, [p[1] for p in pairs])
    return _table(ai, bi, pool, "complementary", REL_COMPLEMENTARY,
                  conf, desc, evid)


_CELL_DISPATCH = {}  # filled below; block-key prefix → cell kernel


def _dispatch_cell(left: dict, right: dict | None, key: str):
    return _CELL_DISPATCH[key[0]](left, right, key)


def _explode_all(batch: pa.Table) -> pa.Table:
    """All three families in one pass — block keys carry their family
    prefix ('a|'/'c|'/'o|') so ONE grid-salted self-join covers them."""
    parts = [_explode_by(kind)(batch) for kind in ("author", "category", "oppair")]
    return pa.concat_tables(parts)


def infer_edges(nodes, cap: int = 400, max_out_degree: int | None = None):
    """nodes (final canonical, materialized) → edges Dataset.

    ``max_out_degree`` is the documented scale-run truncation policy
    (SURVEY.md §2.6 "cap with documented truncation"): the reference
    semantics are quadratic within a block (n nodes sharing a category
    emit ~n² edges, /root/reference/src/neo4j_integration.py:558-631) —
    exact at research scale, ruinous at 100× corpus size. When set,
    only the k highest-confidence outgoing edges per src survive
    (ties: dst ascending, then rel_type — fully deterministic).
    Default None preserves exact reference parity."""
    slim = nodes.select_columns(
        ["id", "author", "implementation_language", "categories", "operations"])
    exploded = slim.map_batches(_explode_all, batch_format="pyarrow")
    edges = blocked_self_join(exploded, None, EDGES_SCHEMA, cap=cap,
                              cell_fn=_dispatch_cell)
    if max_out_degree is not None:
        # recompute_ids is sound here because these ids ARE the
        # (src, dst, tag)-derived ones _edge_ids emits
        edges = truncate_out_degree(edges, max_out_degree,
                                    recompute_ids=True)
    return edges


def truncate_out_degree(edges, k: int, recompute_ids: bool = False):
    """Keep the top-k edges per src by (confidence desc, dst, rel_type).

    ``recompute_ids=True`` (sound ONLY for infer_edges output, whose id
    column is the pure (src, dst, tag) hash of ``_edge_ids``): the
    36 B/row plain-string id — over half the shuffled bytes of the
    dictionary-encoded edge row — is dropped BEFORE the src shuffle and
    rebuilt byte-identically afterwards from the surviving rows.

    Two passes, only paid when the knob is on:

      1. per-BATCH top-k (vectorized sort + run-position mask) BEFORE
         the shuffle — lossless for the global result (an edge dropped
         here is beaten by k better edges of the same src in its own
         batch, so it cannot be in the global top-k), and it shrinks
         the shuffled volume from the full quadratic edge set to
         ≤ k × (batches a src appears in): measured 77M → ~5M rows at
         the mult=2 bench corpus;
      2. exact global ``groupby(src)`` top-k on the survivors.

    Degree is bounded per DIRECTION (src side); a node may also appear
    as dst of up to k edges from each of its partners, so the
    total-degree bound is 2k against adversarial skew."""
    import zlib

    def _rank_key(col) -> np.ndarray:
        """Lexicographic RANK per row, computed on the (small) unique
        value set — dictionary columns rank their dictionary, plain
        strings rank via np.unique; no per-row string sort, no
        to_pylist of the full column."""
        arr = col.combine_chunks()
        if pa.types.is_dictionary(arr.type):
            dvals = np.asarray(arr.dictionary.to_pylist(), dtype=object)
            rank = np.empty(len(dvals), dtype=np.int64)
            rank[np.argsort(dvals)] = np.arange(len(dvals))
            return rank[arr.indices.to_numpy(zero_copy_only=False)]
        vals = np.asarray(arr.to_pylist(), dtype=object)
        _, inv = np.unique(vals, return_inverse=True)
        return inv

    def _topk_runs(t: pa.Table, src_rank: np.ndarray) -> pa.Table:
        """Exact top-k per src over ONE table: numpy lexsort on rank
        keys + run-position mask. Used per pre-shuffle batch (keeps a
        lossless superset: an edge dropped here is beaten by k better
        edges of the same src in the same table, so it cannot be in
        the global top-k) and per post-shuffle bucket (where each src's
        rows are complete → the mask IS the global answer)."""
        conf = t["confidence"].to_numpy(zero_copy_only=False)
        dst_r = _rank_key(t["dst"])
        rel_r = _rank_key(t["rel_type"])
        order = np.lexsort((rel_r, dst_r, -conf, src_rank))
        s = src_rank[order]
        n = len(s)
        starts = np.concatenate(([0], np.nonzero(s[1:] != s[:-1])[0] + 1))
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts[1:]] = 1
        run_id = np.cumsum(run_id)
        pos = np.arange(n) - starts[run_id]
        return t.take(pa.array(np.sort(order[pos < k]), pa.int64()))

    def batch_topk(t: pa.Table) -> pa.Table:
        if recompute_ids and "id" in t.column_names:
            t = t.drop_columns(["id"])
        if t.num_rows == 0:
            return t.append_column("__b", pa.array([], pa.int32()))
        t = _topk_runs(t, _rank_key(t["src"]))
        # bucket key for the reduce: all rows of one src meet in one
        # bucket (few hundred buckets — no per-group task overhead)
        enc = t["src"].combine_chunks()
        if pa.types.is_dictionary(enc.type):
            per_uniq = np.array([zlib.crc32(v.encode()) % 256
                                 for v in enc.dictionary.to_pylist()],
                                dtype=np.int32)
            b = per_uniq[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            b = np.array([zlib.crc32(v.encode()) % 256
                          for v in enc.to_pylist()], dtype=np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    def bucket_topk(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["__b"])
        if t.num_rows == 0:
            return t
        return _topk_runs(t, _rank_key(t["src"]))

    def restore_ids(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return EDGES_SCHEMA.empty_table()

        def col_hashes(arr) -> np.ndarray:
            enc = arr.combine_chunks()
            if not pa.types.is_dictionary(enc.type):
                enc = enc.dictionary_encode()
            hp = _pool_hashes(enc.dictionary)
            return hp[enc.indices.to_numpy(zero_copy_only=False)]

        rel = t["rel_type"].combine_chunks()
        if not pa.types.is_dictionary(rel.type):
            rel = rel.dictionary_encode()
        per_rel = np.array([_TAG_HASH[v] for v in rel.dictionary.to_pylist()],
                           dtype=np.uint64)
        tvec = per_rel[rel.indices.to_numpy(zero_copy_only=False)]
        ids = _ids_from_hashes(col_hashes(t["src"]), col_hashes(t["dst"]),
                               tvec)
        cols = {"id": ids, **{c: t[c] for c in t.column_names}}
        return pa.table(cols).cast(EDGES_SCHEMA)

    # batch_size=None → one batch per BLOCK: the pre-shuffle shrink is
    # only as strong as the batch is wide (a src with ≤ k rows inside a
    # batch drops nothing), and Ray's default 1024-row batches reduce
    # phase 1 to 75k useless tiny lexsorts over the bench edge set —
    # measured 190 s for the whole truncation vs ~83 s with block-wide
    # batches on the same corpus. recompute_ids halves the shuffled
    # bytes on top (id is 36 B of the ~70 B dictionary-encoded row);
    # its wall gain was not separable from this host's noise window.
    out = (edges.map_batches(batch_topk, batch_format="pyarrow",
                             batch_size=None)
           .groupby("__b").map_groups(bucket_topk, batch_format="pyarrow"))
    if recompute_ids:
        out = out.map_batches(restore_ids, batch_format="pyarrow",
                              batch_size=None)
    return out


_CELL_DISPATCH.update({"a": _author_cell, "c": _category_cell, "o": _oppair_cell})
