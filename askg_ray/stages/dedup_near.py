"""Near-dup + cross-registry canonicalization — MinHash-LSH blocking.

Replaces the reference's two O(n²) scans with shuffle-based blocking
(SURVEY.md §2.5):

  phase-1 fuzzy (/root/reference/src/deduplication.py:202-221):
    norm_name char-3-shingle MinHash (32 perms) → 16 bands × 2 rows →
    ``groupby(band_key)`` candidate pairs → exact
    ``SequenceMatcher.ratio() > 0.85`` + ``servers_are_similar``
    verification inside the block (difflib exactly — SURVEY.md §7 hard
    part (d)) → connected components → per-component sequential
    first-wins drop in canonical order (matching the reference's
    "drop if fuzzy-matches an earlier kept record; no metadata merge",
    deduplication.py:136-138 + 279-280).

  phase-2 cross-registry merge (deduplication.py:323-373):
    same LSH blocks (the s-curve at b=16, r=2 catches name-Jaccard
    ≳0.25, far below the ratio ≈0.75 the 0.9 score threshold implies) →
    ``are_highly_similar`` verification → components → per-component
    reproduction of the reference's star-grouping scan with
    completeness-max base selection (merge.merge_multiple).

Pair verification happens entirely within the band shuffle — no join
back to the full table. Below ``_PAYLOAD_MAX`` entities the exploded
band rows are THIN (join keys only) and the verifier resolves full
records zero-copy from the materialized entity blocks in plasma
(stages/selfjoin._payload_index); above it the slim verification
fields ride inside the exploded rows — the unconditionally-scalable
shape. Component labels (tiny: only near-dup-implicated ids) are
broadcast via ``ray.put`` to tag records — the broadcast-small-side
pattern; at 10^12-doc scale with adversarial dup density this becomes
a partitioned hash join on id (same tag step, different physical
plan).
"""

from __future__ import annotations

import pyarrow as pa

from ..arrowutil import NODES_SCHEMA, sort_canonical
from ..merge import (are_highly_similar, fuzzy_name_match, merge_multiple,
                     servers_are_similar, similarity_score)
from ..minhash import band_keys, char_shingles, minhash_signature, shingle_ids
from .components import PAIR_SCHEMA, connected_components

_NUM_PERM = 32
_BANDS = 16
# author-block keys set this bit; LSH band keys stay below it, so the
# pair-ownership rule can tell the families apart from block_key alone
_AUTHOR_FLAG = 1 << 62

# Thin-row/payload-broadcast ceiling for the candidate self-join: below
# this many entities the per-worker payload index (~200 B/row) is cheap
# and the cell shuffle ships join keys only; above it full records ride
# the shuffle (the unconditionally-scalable shape). Env-overridable so
# tests can force either path.
import os as _os

_PAYLOAD_MAX = int(_os.environ.get("ASKG_NEAR_PAYLOAD_MAX", "250000"))
# verified-pair count below which near_dedup's label/semi-join plumbing
# runs on the driver (same bound as connected_components' gate: pair
# volume scales with dup density, not corpus rows; 2M thin pairs ≈ tens
# of MB). 0 forces the distributed path (tests).
_DRIVER_PAIRS_MAX = int(_os.environ.get("ASKG_NEAR_DRIVER_PAIRS_MAX",
                                        "2000000"))
# __uid = source_url: unique per RECORD even when two distinct records
# share a candidate id (selfjoin cell dedupe keys on (id, __uid))
_SLIM_COLS = ["id", "__uid", "name", "norm_name", "author", "description",
              "categories", "implementation_language", "repository",
              "registry_source"]

_SLIM_SCHEMA = pa.schema([
    ("block_key", pa.int64()),
    ("id", pa.string()),
    ("__uid", pa.string()),
    ("name", pa.string()),
    ("norm_name", pa.string()),
    ("author", pa.string()),
    ("description", pa.large_string()),
    ("categories", pa.list_(pa.string())),
    ("implementation_language", pa.string()),
    ("repository", pa.string()),
    ("registry_source", pa.string()),
])


from functools import lru_cache


@lru_cache(maxsize=1 << 18)
def _name_bands(nn: str | None) -> tuple[int, ...]:
    # char-2 shingles: SequenceMatcher-similar names (transpositions,
    # char swaps) keep much higher 2-shingle than 3-shingle Jaccard.
    # Cached per process: bands are a pure function of norm_name, and
    # names repeat heavily (duplicate clusters, 16 band rows per record)
    # — this also lets the exploded rows NOT carry the 16×int64 band
    # list (128 B/row of pure shuffle weight); consumers recompute.
    # Cache MISSES run the exact C replica when available (~125 µs of
    # per-name crc32/minhash Python otherwise — a top-3 verify-task
    # cost); equality vs this Python path is property-tested.
    nn = nn or ""
    from .._fastratio import name_bands
    from ..minhash import _coeffs
    a, b = _coeffs(_NUM_PERM, 7)
    native = name_bands(nn, a, b, _NUM_PERM, _BANDS)
    if native is not None:
        return native
    sig = minhash_signature(shingle_ids(char_shingles(nn, k=2)), _NUM_PERM)
    return tuple(band_keys(sig, _BANDS))


def _slim_view(batch: pa.Table) -> pa.Table:
    """Select the slim verification columns (renaming source_url→__uid),
    cast to the exploded-row schema minus block_key."""
    cols = [batch["source_url" if c == "__uid" else c] for c in _SLIM_COLS]
    t = pa.table(dict(zip(_SLIM_COLS, cols)))
    return t.cast(pa.schema([_SLIM_SCHEMA.field(c) for c in _SLIM_COLS]))


_THIN_COLS = ["id", "__uid", "norm_name", "registry_source"]
_THIN_SCHEMA = pa.schema([
    ("block_key", pa.int64()),
    ("id", pa.string()),
    ("__uid", pa.string()),
    ("norm_name", pa.string()),
    ("registry_source", pa.string()),
])


def _thin_view(batch: pa.Table) -> pa.Table:
    """Join-key-only projection of the exploded row (the gate needs
    norm_name; the verifier resolves full records from the payload
    refs — stages/selfjoin._payload_index)."""
    cols = [batch["source_url" if c == "__uid" else c] for c in _THIN_COLS]
    t = pa.table(dict(zip(_THIN_COLS, cols)))
    return t.cast(pa.schema([_THIN_SCHEMA.field(c) for c in _THIN_COLS]))


def _explode_bands(batch: pa.Table, thin: bool = False) -> pa.Table:
    """16 band rows per record — Arrow ``take`` replication (the old
    per-row dict loop was ~30 µs/row of pure Python, run at the narrow
    pre-selfjoin block count). Bands are computed once per UNIQUE
    norm_name (duplicate clusters share names). ``thin=True`` ships
    only the join keys through the cell shuffle (fat payload columns —
    description, categories — were ~4× the exchanged bytes)."""
    import numpy as np

    schema = _THIN_SCHEMA if thin else _SLIM_SCHEMA
    cols = _THIN_COLS if thin else _SLIM_COLS
    n = batch.num_rows
    if n == 0:
        return schema.empty_table()
    nn = np.array([s or "" for s in batch["norm_name"].to_pylist()],
                  dtype=object)
    uniq, inv = np.unique(nn, return_inverse=True)
    B = np.array([_name_bands(s) for s in uniq.tolist()], dtype=np.int64)
    bk = B[inv].reshape(-1)
    idx = np.repeat(np.arange(n, dtype=np.int64), _BANDS)
    slim = (_thin_view(batch) if thin else _slim_view(batch)).take(pa.array(idx))
    return pa.table({"block_key": pa.array(bk, pa.int64()),
                     **{c: slim[c] for c in cols}},
                    schema=schema)


def _owns_pair(r1: dict, r2: dict) -> bool:
    """Each candidate pair meets in EVERY shared LSH band plus (same
    author) the author block — up to 17 redundant verifications of one
    pair. Ownership rule: the pair belongs to its minimum shared band,
    or to the author block when the names share no band. Every unique
    pair is still verified exactly once; duplicate emissions (which the
    component pass would absorb anyway) and duplicate verify CPU — the
    measured dominant near-dedup cost — are gone."""
    bk = r1["block_key"]
    shared = set(_name_bands(r1.get("norm_name") or "")).intersection(
        _name_bands(r2.get("norm_name") or ""))
    if bk & _AUTHOR_FLAG:
        return not shared
    return bk == min(shared) if shared else False


def _pair_gate(left, right, key: str):
    """Vectorized per-cell candidate gate (selfjoin gate_fn contract:
    ``left``/``right`` are Arrow tables, id-sorted; right None for
    diagonal cells).

    Replaces ~O(n²) Python ``_owns_pair`` + cheap-out evaluations per
    cell — the measured dominant near-dedup cost (62M pair evaluations
    at the repl=24 bench corpus) — with numpy boolean masks:

      * pair ownership: band keys are index-salted (minhash.band_keys
        puts the band index in the top byte), so "this cell's key is
        the MINIMUM shared band" is exactly "no positional band match
        at any earlier index" — an int64 equality mask per prior band.
        The bands column is fixed-width (one value per band), so the
        matrix is a zero-copy flatten + reshape of the Arrow list
        column — no per-row Python lists.
      * ratio upper bound: 2·min(len)/(len₁+len₂) > 0.75 — the
        real_quick_ratio arithmetic from _name_ratio, pairwise.
      * equal-name × same-registry pairs can satisfy neither phase
        predicate (fuzzy needs distinct names, similar needs cross
        registry) — masked out.

    Returns (x, y) index pairs; the Python verifier runs only on
    survivors. Lossless: every mask is an upper bound on (or exact
    restatement of) a predicate the pair verifier applies anyway.
    """
    import numpy as np

    bk = int(key)
    diag = right is None
    rhs = left if diag else right
    nl, nr = left.num_rows, rhs.num_rows
    if nl == 0 or nr == 0:
        return []

    nnl = [s or "" for s in left["norm_name"].to_pylist()]
    nnr = nnl if diag else [s or "" for s in rhs["norm_name"].to_pylist()]
    names, codes = np.unique(
        np.array(nnl + ([] if diag else nnr), dtype=object),
        return_inverse=True)
    cl = codes[:nl]
    cr = cl if diag else codes[nl:]

    # Every name-derived mask runs at UNIQUE-NAME granularity (u×u) and
    # is expanded to record pairs at the end: bands are a pure function
    # of norm_name, so same-name records have identical band rows, and
    # a duplicate-heavy cell (the common case in a near-dup join) has
    # u ≪ n — a record-level ownership loop would pay ~limit·n²
    # regardless. Band values come from the per-process _name_bands
    # cache, not from a shipped column.
    #
    # Mask ORDER is selectivity-per-cost, and it differs by family:
    #   LSH block: ownership first (limit ≤ band-index passes; it kills
    #     the massive cross-band duplication of dup-heavy name clusters
    #     for almost nothing), then the ratio bounds.
    #   author block: ownership requires NO shared band at any of the
    #     16 positions — it keeps ~94% of pairs (dissimilar names
    #     rarely share a band), so running it first paid 16 u² passes
    #     to prune nothing (the measured #1 cost of the whole join: one
    #     12.5k-name author block = 78M candidate pairs, 85 real).
    #     Author blocks run the ratio bounds first and check ownership
    #     per-pair on the survivors (P ≈ dozens).
    u = len(names)
    BU = np.empty((u, _BANDS), dtype=np.int64)
    for k, nm in enumerate(names.tolist()):
        BU[k] = _name_bands(nm)
    is_auth = bool(bk & _AUTHOR_FLAG)
    limit = BU.shape[1] if is_auth else (bk >> 56)

    # ratio upper bound 2·min(len)/total > 0.75 per unique name pair;
    # equal names always pass (ratio = 1, incl. empty-name pairs)
    ulen = np.array([len(s) for s in names], dtype=np.float64)
    utot = ulen[:, None] + ulen[None, :]
    mask_u = 2.0 * np.minimum(ulen[:, None], ulen[None, :]) > 0.75 * utot
    np.fill_diagonal(mask_u, True)

    if is_auth:
        # same-name pairs share every band → never author-owned
        np.fill_diagonal(mask_u, False)
    else:
        owned_u = np.ones((u, u), dtype=bool)
        for j in range(limit):
            owned_u &= BU[:, j][:, None] != BU[:, j][None, :]
        # diagonal = same-name pairs: every band position matches, so
        # the loop zeroed it for limit > 0. The ownership rule sends a
        # same-name pair to its band-0 block (the minimum shared band
        # VALUE — index in the top byte makes band 0's value the
        # smallest), and never to the author block.
        np.fill_diagonal(owned_u, BU[:, 0] == bk)
        mask_u &= owned_u
    if not mask_u.any():
        return []

    # quick_ratio bound, BLAS form: difflib.quick_ratio is exactly
    # 2·Σ_c min(count₁[c], count₂[c]) / (len₁+len₂), and min(a,b) ≤
    # √a·√b pointwise, so Σ_c min ≤ ⟨√cnt₁,√cnt₂⟩ — ONE sgemm over the
    # √count matrix bounds every pair at once (the per-pair gather loop
    # it replaced was P-proportional with P ≈ u²/2 in author cells).
    # Counts in short names are almost all 0/1, where √a·√b = min — the
    # bound is near-exact; 1e-3 slack absorbs float32 GEMM rounding
    # (only ever ADMITS extra pairs). Peak temp is 2 u² float32 arrays
    # (~0.6 MB at cap 192·2 rows) — arena-sized, per the slow-first-
    # touch-page constraint of this sandbox (and of any allocator at
    # scale).
    Mc = None
    if u > 1 and int(mask_u.sum()) > 16:
        # count matrix without a per-char Python loop: utf-32 decode of
        # the joined names gives exact code points vectorized; columns
        # are the cell's distinct code points via np.unique remap
        joined = "".join(names.tolist())
        cp = np.frombuffer(joined.encode("utf-32-le"), np.uint32)
        rows = np.repeat(np.arange(u), ulen.astype(np.int64))
        _, col = np.unique(cp, return_inverse=True)
        Mc = np.zeros((u, max(int(col.max()) + 1 if len(col) else 1, 1)),
                      dtype=np.int16)
        np.add.at(Mc, (rows, col), 1)
        M = np.sqrt(Mc.astype(np.float32))
        Q2 = 2.0 * (M @ M.T)
        mask_u &= Q2 > 0.75 * utot - 1e-3
        if not mask_u.any():
            return []

    ux, uy = np.nonzero(np.triu(mask_u | mask_u.T, k=1))

    if Mc is not None and len(ux):
        # exact quick_ratio on the (small) GEMM-survivor set: the sqrt
        # bound over-admits names with repeated chars (hyphens, digits
        # — min(a,b) < √ab whenever a≠b), and every over-admitted pair
        # otherwise pays a Python SequenceMatcher construction below.
        # 2q = 2·Σ_c min — P×C gathered mins, P ≈ dozens per cell.
        q = np.minimum(Mc[ux], Mc[uy]).sum(axis=1, dtype=np.int64)
        bad = 2.0 * q <= 0.75 * (ulen[ux] + ulen[uy])
        if bad.any():
            mask_u[ux[bad], uy[bad]] = False
            mask_u[uy[bad], ux[bad]] = False
            keep = ~bad
            ux, uy = ux[keep], uy[keep]
        if not mask_u.any():
            return []

    if is_auth and len(ux):
        # deferred ownership, per surviving pair: author-owned ⟺ the
        # names share NO band position (P×16 gathered compares, not
        # 16 u² passes)
        shared = (BU[ux] == BU[uy]).any(axis=1)
        if shared.any():
            mask_u[ux[shared], uy[shared]] = False
            mask_u[uy[shared], ux[shared]] = False
            keep = ~shared
            ux, uy = ux[keep], uy[keep]
        if not mask_u.any():
            return []

    # final refinement: full SequenceMatcher ratio ONCE per surviving
    # unique name pair (lru-cached across cells); both phase predicates
    # require ratio > 0.75, so this is lossless and leaves the Python
    # verifier only genuinely similar-name pairs.
    # ratio is symmetric and names (np.unique output) are sorted, so
    # evaluating only x < y keeps one canonical argument order — the
    # lru cache key stays stable across cells and the mirrored entry is
    # patched for free.
    for x, y in zip(ux.tolist(), uy.tolist()):
        if _name_ratio(names[x], names[y], 0.75) <= 0.75:
            mask_u[x, y] = False
            mask_u[y, x] = False
    if not mask_u.any():
        return []

    # expand to record pairs: equal-name × same-registry pairs can
    # satisfy neither phase predicate (fuzzy needs distinct names,
    # similar needs cross registry) — masked out at record level.
    regs: dict = {}
    rl = np.array([regs.setdefault(r, len(regs))
                   for r in left["registry_source"].to_pylist()],
                  dtype=np.int64)
    rr = rl if diag else np.array(
        [regs.setdefault(r, len(regs))
         for r in rhs["registry_source"].to_pylist()], dtype=np.int64)
    mask = mask_u[cl[:, None], cr[None, :]]
    eq = cl[:, None] == cr[None, :]
    mask &= ~(eq & (rl[:, None] == rr[None, :]))
    if diag:
        mask &= np.tri(nl, nr, k=-1, dtype=bool).T
    xs, ys = np.nonzero(mask)
    if not len(xs):
        return []
    return np.stack([xs, ys], axis=1)


def _gated_dual_verify(r1: dict, r2: dict) -> list[dict]:
    """_dual_verify_pair_fn minus the ownership gate (the selfjoin
    gate_fn already applied it vectorized). servers_are_similar is
    shared across the two phase predicates — computed at most once."""
    out = []
    nn1, nn2 = r1.get("norm_name") or "", r2.get("norm_name") or ""
    ratio = _name_ratio(nn1, nn2, 0.75)
    ss = None
    if nn1 != nn2 and ratio > 0.85:
        ss = servers_are_similar(r1, r2)
        if ss:
            out.append({"a": r1["id"], "b": r2["id"], "kind": "f"})
    if (r1.get("registry_source") != r2.get("registry_source")
            and ratio > 0.75):
        if ss is None:
            ss = servers_are_similar(r1, r2)
        if ss and similarity_score(r1, r2) > 0.9:
            out.append({"a": r1["id"], "b": r2["id"], "kind": "s"})
    return out


from functools import lru_cache


@lru_cache(maxsize=1 << 20)
def _name_ratio(nn1: str, nn2: str, thresh: float) -> float:
    """SequenceMatcher.ratio with lossless cheap-outs: identical names
    short-circuit to 1.0; the pure-arithmetic real_quick_ratio bound
    (2·min(len)/total, an upper bound on ratio) skips SequenceMatcher
    construction entirely for length-mismatched names. lru_cached —
    pure function, and duplicate clusters re-compare the same name pair
    in every cell that owns one of its pairs.

    The quick_ratio + ratio core runs through the exact C replica in
    _fastratio when available (in-worker profiles put pure-Python
    difflib at ~45% of verify-exchange reduce time); the difflib path
    below is the verbatim fallback and the equality oracle for
    tests/test_property.py."""
    from difflib import SequenceMatcher

    if nn1 == nn2:
        return 1.0
    l1, l2 = len(nn1), len(nn2)
    if not l1 or not l2 or 2.0 * min(l1, l2) / (l1 + l2) <= thresh:
        return 0.0
    from .._fastratio import ratio_gated
    r = ratio_gated(nn1, nn2, thresh)
    if r is not None:
        return r
    sm = SequenceMatcher(None, nn1, nn2)
    if sm.quick_ratio() <= thresh:
        return 0.0
    return sm.ratio()


def _verify_pair(kind: str, r1: dict, r2: dict, owned: bool = False) -> bool:
    """Exact reference predicates behind lossless cheap gates.

    quick_ratio/the real_quick_ratio arithmetic are UPPER bounds on
    ratio, so gating on them never drops a true match; they cut ~95% of
    the SequenceMatcher cost in dense blocks. Phase-2 additionally gates
    on the algebraic bound name_sim > 0.75 (score > 0.9 requires
    name_sim*0.4 > 0.9 - 0.2 - 0.2 - 0.1 - 0.1, deduplication.py:384-426)
    and on cross-registry first (375-379, cheapest check).
    ``owned=True``: the caller (gate_fn path) already applied the
    ownership rule vectorized."""
    if not owned and not _owns_pair(r1, r2):
        return False
    nn1, nn2 = r1.get("norm_name") or "", r2.get("norm_name") or ""
    if kind == "fuzzy":
        if nn1 == nn2:
            return False
        return (_name_ratio(nn1, nn2, 0.85) > 0.85
                and servers_are_similar(r1, r2))
    if r1.get("registry_source") == r2.get("registry_source"):
        return False
    if _name_ratio(nn1, nn2, 0.75) <= 0.75:
        return False
    return are_highly_similar(r1, r2)


def _make_pair_fn(kind: str, owned: bool = False):
    """pair_fn for blocked_self_join: verified candidate (a,b) rows."""

    def fn(r1: dict, r2: dict) -> list[dict]:
        if _verify_pair(kind, r1, r2, owned=owned):
            return [{"a": r1["id"], "b": r2["id"]}]
        return []

    return fn


def _explode_author(batch: pa.Table, thin: bool = False) -> pa.Table:
    """Second candidate family: exact-author blocks. The confirming
    predicates weight author similarity 0.3 (servers_are_similar) /
    0.2 (similarity_score), so nearly every confirmable pair shares an
    author or repo org — author blocking catches what name-LSH misses
    (e.g. transposed names with low shingle overlap)."""
    import numpy as np
    import pyarrow.compute as pc
    schema = _THIN_SCHEMA if thin else _SLIM_SCHEMA
    cols = _THIN_COLS if thin else _SLIM_COLS
    valid = batch.filter(pc.is_valid(batch["author"]))
    if valid.num_rows == 0:
        return schema.empty_table()
    keys = np.array([_AUTHOR_FLAG ^ zlib_crc(f"author:{a}")
                     for a in valid["author"].to_pylist()], dtype=np.int64)
    slim = _thin_view(valid) if thin else _slim_view(valid)
    return pa.table({"block_key": pa.array(keys, pa.int64()),
                     **{c: slim[c] for c in cols}},
                    schema=schema)


def zlib_crc(s: str) -> int:
    import zlib
    return zlib.crc32(s.encode())


def _candidate_pairs(nodes, kind: str, cap: int = 192):
    """Verified candidate pairs from two block families — name-LSH bands
    plus exact-author blocks — through the grid-salted self-join, so a
    hot author (Zipf skew) is split across parallel cells instead of
    serializing one giant O(n²) verify task."""
    from .selfjoin import blocked_self_join

    # nodes is materialized by the callers (fork: LSH + author + tag);
    # the lazy repartition folds into the selfjoin's materialization so
    # the pair-verify reduce gets CPU-count tasks without a second
    # barrier (entity tables compact to a handful of 16 MB blocks)
    from ..rayutil import default_nblocks

    lsh = nodes.map_batches(_explode_bands, batch_format="pyarrow")
    auth = nodes.map_batches(_explode_author, batch_format="pyarrow")
    exploded = lsh.union(auth).repartition(default_nblocks())
    return blocked_self_join(exploded, _make_pair_fn(kind, owned=True),
                             PAIR_SCHEMA, cap=cap, gate_fn=_pair_gate,
                             salt_col="norm_name")


def _sentinel(node_id: str) -> str:
    return "\0" + node_id


def _tag_and_group(nodes, labels, group_fn, broadcast_threshold=None):
    """Attach component labels (labeljoin.attach_labels: broadcast when
    small, partitioned shuffle join when large — never an unbounded
    driver dict), then merge labeled component runs through group_fn
    (a list[dict] → list[dict] kernel; stages/runs.merge_runs does the
    bucketed grouping so singleton components never touch Python).

    Unlabeled rows get a per-row sentinel component ("\0" + id) so they
    ride the same shuffle as singleton groups — no dataset fork, no
    union, one chained groupby (singleton runs pass through)."""
    from ray.data.dataset import MaterializedDataset

    from ..rayutil import compact
    from .exchange import EXCHANGE_MAX, exchange_merge_runs
    from .labeljoin import BROADCAST_LABELS_MAX, attach_labels
    from .runs import merge_runs

    labels = compact(labels)
    n_labels = labels.count()
    if n_labels == 0:
        return nodes
    bt = (BROADCAST_LABELS_MAX if broadcast_threshold is None
          else broadcast_threshold)
    # entity-scale direct-task exchange (stages/exchange): when the
    # label map is broadcastable and nodes is materialized ≤
    # EXCHANGE_MAX, fold the tag map into the exchange split tasks —
    # no attach operator launch, no groupby sort-shuffle floor.
    n = nodes.count() if isinstance(nodes, MaterializedDataset) else None
    if n is not None and n <= EXCHANGE_MAX and n_labels < bt:
        import ray

        label_map: dict = {}
        for b in labels.iter_batches(batch_format="pyarrow"):
            label_map.update(zip(b["node"].to_pylist(),
                                 b["component"].to_pylist()))
        ref = ray.put(label_map)

        def pre(t: pa.Table) -> pa.Table:
            m = ray.get(ref)
            vals = [m.get(v, _sentinel(v)) for v in t["id"].to_pylist()]
            return t.append_column("comp", pa.array(vals, pa.string()))

        return exchange_merge_runs(nodes, "comp", group_fn, NODES_SCHEMA,
                                   pre_fn=pre)
    tagged = attach_labels(
        nodes, labels, key="id", make_default=_sentinel,
        broadcast_threshold=bt, comp_type=pa.string())
    return merge_runs(tagged, "comp", group_fn, NODES_SCHEMA)


def _phase1_group(recs: list[dict]) -> list[dict]:
    recs = sort_canonical(recs)
    kept: list[dict] = []
    for r in recs:
        if not fuzzy_name_match(r, kept):
            kept.append(r)
    return kept


def _phase2_group(recs: list[dict]) -> list[dict]:
    recs = sort_canonical(recs)
    processed: set[int] = set()
    out: list[dict] = []
    for i, r in enumerate(recs):
        if i in processed:
            continue
        sims = [j for j in range(i + 1, len(recs))
                if j not in processed and are_highly_similar(r, recs[j])]
        if sims:
            out.append(merge_multiple([r] + [recs[j] for j in sims]))
            processed.add(i)
            processed.update(sims)
        else:
            out.append(r)
            processed.add(i)
    return out


def dedup_fuzzy(nodes):
    """Phase-1 fuzzy-name drop (after exact key dedup).

    ``nodes`` must be materialized (it feeds both candidate generation
    and the tag pass) — pipelines/kg.canonical_nodes owns that."""
    pairs = _candidate_pairs(nodes, "fuzzy")
    labels = connected_components(pairs)
    return _tag_and_group(nodes, labels, _phase1_group)


def merge_similar(nodes):
    """Phase-2 cross-registry similarity merge (materialized input)."""
    pairs = _candidate_pairs(nodes, "similar")
    labels = connected_components(pairs)
    return _tag_and_group(nodes, labels, _phase2_group)


# ---- combined single-pass near-dedup ------------------------------------

_TAGGED_PAIR_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string()),
                                 ("kind", pa.string())])


def _dual_verify_pair_fn(r1: dict, r2: dict) -> list[dict]:
    """Verify BOTH phase predicates on one candidate pair, sharing the
    name-ratio work (the dominant cost). Emits tagged rows. The
    ownership gate runs first so each unique pair is verified once
    across all its shared blocks."""
    if not _owns_pair(r1, r2):
        return []
    out = []
    nn1, nn2 = r1.get("norm_name") or "", r2.get("norm_name") or ""
    ratio = _name_ratio(nn1, nn2, 0.75)
    if (nn1 != nn2 and ratio > 0.85 and servers_are_similar(r1, r2)):
        out.append({"a": r1["id"], "b": r2["id"], "kind": "f"})
    if (r1.get("registry_source") != r2.get("registry_source")
            and ratio > 0.75 and are_highly_similar(r1, r2)):
        out.append({"a": r1["id"], "b": r2["id"], "kind": "s"})
    return out


def _filter_kind(kind: str):
    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch["kind"], kind)).select(["a", "b"])

    return fn


def near_dedup(nodes, broadcast_threshold=None):
    """Fuzzy drop + cross-registry merge from ONE candidate pass.

    Valid because phase-1 fuzzy only DROPS records (no mutation,
    deduplication.py:279-280), so phase-2 predicates evaluated on the
    pre-fuzzy rows are identical for every surviving pair; pairs with a
    dropped endpoint are filtered before phase-2 components. ``nodes``
    must be materialized. Returns the final lazy survivors chain.

    Candidate pairs, component labels and the survivor filter all stay
    Datasets — connected_components / attach_labels / semi_join_keys
    each take a driver shortcut only below their documented size
    thresholds, so nothing driver-side grows with the corpus.
    """
    from ..rayutil import compact
    from .labeljoin import semi_join_keys
    from .selfjoin import blocked_self_join

    from ..rayutil import default_nblocks

    # Thin-row path: below _PAYLOAD_MAX entities the cell shuffle ships
    # ONLY join keys (block_key, id, __uid, norm_name) and the verify
    # resolves full records from the materialized entity blocks in
    # plasma (selfjoin._payload_index) — measured ~4× fewer exchanged
    # bytes at the bench corpus (description/categories dominated the
    # fat rows). Above the threshold the per-worker payload index would
    # outgrow worker heaps, so payloads ride the shuffle as before —
    # the unconditionally-correct distributed shape.
    thin = nodes.count() <= _PAYLOAD_MAX
    payload_refs = None
    if thin:
        # nodes is already materialized (caller contract) — hand its
        # own block refs to the verifier; workers apply _slim_view
        # per block on first read (selfjoin._payload_index), so no
        # extra materialization barrier and no copy in plasma.
        payload_refs = tuple(nodes.get_internal_block_refs())
    lsh = nodes.map_batches(lambda b: _explode_bands(b, thin=thin),
                            batch_format="pyarrow")
    auth = nodes.map_batches(lambda b: _explode_author(b, thin=thin),
                             batch_format="pyarrow")
    exploded = lsh.union(auth).repartition(default_nblocks())
    # tagged pairs feed both phases — pin once; hot blocks salt by
    # norm_name so a duplicate cluster's record pairs co-locate and the
    # gate's unique-name machinery collapses them in one cell
    from ..rayutil import prof
    tagged = compact(blocked_self_join(exploded, _gated_dual_verify,
                                       _TAGGED_PAIR_SCHEMA, cap=192,
                                       gate_fn=_pair_gate,
                                       salt_col="norm_name",
                                       payload_refs=payload_refs,
                                       payload_project=_slim_view))
    prof("near:candidates:pinned")

    # Small-pair fast path (same 2M gate as connected_components'
    # driver shortcut): ``tagged`` is already pinned and THIN
    # (a, b, kind) — one driver fetch serves both phases' kind filters,
    # both component passes (the vectorized in-memory kernel) and the
    # phase-2 survivor semi-join, replacing 2 filter executions, 2
    # components round-trips and 2 semi-join setups (~2 s of flat
    # per-job launch floors at any width). Above the gate every step
    # stays a Dataset exactly as before. broadcast_threshold=0 (the
    # tests' force-distributed knob) disables it, so the pytest that
    # compares forced-vs-default output now checks the fast path
    # against the fully distributed one end to end.
    if broadcast_threshold != 0 and tagged.count() <= _DRIVER_PAIRS_MAX:
        import pyarrow.compute as pc
        import ray.data as rd

        from .components import LABEL_SCHEMA, local_components

        chunks = [b for b in tagged.iter_batches(batch_format="pyarrow")
                  if b.num_rows]
        allp = (pa.concat_tables(chunks) if chunks
                else _TAGGED_PAIR_SCHEMA.empty_table())
        f_tbl = allp.filter(pc.equal(allp["kind"], "f")).select(["a", "b"])
        s_tbl = allp.filter(pc.equal(allp["kind"], "s")).select(["a", "b"])
        labels1 = rd.from_arrow(local_components(f_tbl))
        prof("near:components1")
        d2 = compact(_tag_and_group(nodes, labels1, _phase1_group,
                                    broadcast_threshold))
        prof("near:phase1:pinned")
        surv = pa.chunked_array(
            [b["id"].combine_chunks()
             for b in d2.select_columns(["id"])
             .iter_batches(batch_format="pyarrow") if b.num_rows]
            or [pa.array([], pa.string())]).combine_chunks()
        keep = pc.and_(pc.is_in(s_tbl["a"], value_set=surv),
                       pc.is_in(s_tbl["b"], value_set=surv))
        labels2 = rd.from_arrow(local_components(s_tbl.filter(keep)))
        prof("near:components2")
        return _tag_and_group(d2, labels2, _phase2_group,
                              broadcast_threshold)

    labels1 = connected_components(
        tagged.map_batches(_filter_kind("f"), batch_format="pyarrow"))
    prof("near:components1")
    d2 = compact(_tag_and_group(nodes, labels1, _phase1_group,
                                broadcast_threshold))
    prof("near:phase1:pinned")

    surv_ids = compact(d2.select_columns(["id"]))
    sim = tagged.map_batches(_filter_kind("s"), batch_format="pyarrow")
    kw = {} if broadcast_threshold is None else {
        "broadcast_threshold": broadcast_threshold}
    sim = semi_join_keys(sim, surv_ids, "a", **kw)
    sim = semi_join_keys(sim, surv_ids, "b", **kw)
    labels2 = connected_components(sim)
    prof("near:components2")
    return _tag_and_group(d2, labels2, _phase2_group, broadcast_threshold)
