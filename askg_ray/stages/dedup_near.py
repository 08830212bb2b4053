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

The slim verification fields ride inside the exploded band rows, so
pair verification happens entirely within the band shuffle — no join
back to the full table. Component labels (tiny: only near-dup-implicated
ids) are broadcast via ``ray.put`` to tag records — the broadcast-small-
side pattern; at 10^12-doc scale with adversarial dup density this
becomes a partitioned hash join on id (same tag step, different
physical plan).
"""

from __future__ import annotations

import pyarrow as pa

from ..arrowutil import NODES_SCHEMA, records_of, sort_canonical, table_of
from ..merge import are_highly_similar, fuzzy_name_match, merge_multiple, servers_are_similar
from ..minhash import band_keys, char_shingles, minhash_signature, shingle_ids
from .components import PAIR_SCHEMA, connected_components

_NUM_PERM = 32
_BANDS = 16
_SLIM_COLS = ["id", "name", "norm_name", "author", "description", "categories",
              "implementation_language", "repository", "registry_source"]

_SLIM_SCHEMA = pa.schema([
    ("block_key", pa.int64()),
    ("id", pa.string()),
    ("name", pa.string()),
    ("norm_name", pa.string()),
    ("author", pa.string()),
    ("description", pa.large_string()),
    ("categories", pa.list_(pa.string())),
    ("implementation_language", pa.string()),
    ("repository", pa.string()),
    ("registry_source", pa.string()),
])


def _explode_bands(batch: pa.Table) -> pa.Table:
    cols = {c: batch[c].to_pylist() for c in _SLIM_COLS}
    out: dict[str, list] = {"block_key": []}
    for c in _SLIM_COLS:
        out[c] = []
    for i, nn in enumerate(cols["norm_name"]):
        # char-2 shingles: SequenceMatcher-similar names (transpositions,
        # char swaps) keep much higher 2-shingle than 3-shingle Jaccard
        sig = minhash_signature(shingle_ids(char_shingles(nn or "", k=2)), _NUM_PERM)
        for bk in band_keys(sig, _BANDS):
            out["block_key"].append(bk)
            for c in _SLIM_COLS:
                out[c].append(cols[c][i])
    return table_of(
        [dict(zip(out.keys(), vals)) for vals in zip(*out.values())] if out["block_key"] else [],
        _SLIM_SCHEMA)


def _verify_pair(kind: str, r1: dict, r2: dict) -> bool:
    """Exact reference predicates behind lossless cheap gates.

    difflib quick_ratio/real_quick_ratio are UPPER bounds on ratio, so
    gating on them never drops a true match; they cut ~95% of the
    SequenceMatcher cost in dense blocks. Phase-2 additionally gates on
    the algebraic bound name_sim > 0.75 (score > 0.9 requires
    name_sim*0.4 > 0.9 - 0.2 - 0.2 - 0.1 - 0.1, deduplication.py:384-426)
    and on cross-registry first (375-379, cheapest check).
    """
    from difflib import SequenceMatcher
    nn1, nn2 = r1.get("norm_name") or "", r2.get("norm_name") or ""
    if kind == "fuzzy":
        if nn1 == nn2:
            return False
        sm = SequenceMatcher(None, nn1, nn2)
        if sm.real_quick_ratio() <= 0.85 or sm.quick_ratio() <= 0.85:
            return False
        return sm.ratio() > 0.85 and servers_are_similar(r1, r2)
    if r1.get("registry_source") == r2.get("registry_source"):
        return False
    sm = SequenceMatcher(None, nn1, nn2)
    if sm.real_quick_ratio() <= 0.75 or sm.quick_ratio() <= 0.75:
        return False
    return are_highly_similar(r1, r2)


def _make_pair_fn(kind: str):
    """pair_fn for blocked_self_join: verified candidate (a,b) rows."""

    def fn(r1: dict, r2: dict) -> list[dict]:
        if _verify_pair(kind, r1, r2):
            return [{"a": r1["id"], "b": r2["id"]}]
        return []

    return fn


def _explode_author(batch: pa.Table) -> pa.Table:
    """Second candidate family: exact-author blocks. The confirming
    predicates weight author similarity 0.3 (servers_are_similar) /
    0.2 (similarity_score), so nearly every confirmable pair shares an
    author or repo org — author blocking catches what name-LSH misses
    (e.g. transposed names with low shingle overlap)."""
    import pyarrow.compute as pc
    valid = batch.filter(pc.is_valid(batch["author"]))
    recs = records_of(valid)
    rows = []
    for r in recs:
        r = {c: r.get(c) for c in _SLIM_COLS}
        r["block_key"] = (1 << 62) ^ (zlib_crc(f"author:{r['author']}"))
        rows.append(r)
    return table_of(rows, _SLIM_SCHEMA)


def zlib_crc(s: str) -> int:
    import zlib
    return zlib.crc32(s.encode())


def _candidate_pairs(nodes, kind: str, cap: int = 192):
    """Verified candidate pairs from two block families — name-LSH bands
    plus exact-author blocks — through the grid-salted self-join, so a
    hot author (Zipf skew) is split across parallel cells instead of
    serializing one giant O(n²) verify task."""
    from .selfjoin import blocked_self_join

    # nodes is materialized by the callers (fork: LSH + author + tag)
    lsh = nodes.map_batches(_explode_bands, batch_format="pyarrow")
    auth = nodes.map_batches(_explode_author, batch_format="pyarrow")
    return blocked_self_join(lsh.union(auth), _make_pair_fn(kind),
                             PAIR_SCHEMA, cap=cap)


def _sentinel(node_id: str) -> str:
    return "\0" + node_id


def _tag_and_group(nodes, labels, group_fn, broadcast_threshold=None):
    """Attach component labels (labeljoin.attach_labels: broadcast when
    small, partitioned shuffle join when large — never an unbounded
    driver dict), then group labeled rows through group_fn.

    Unlabeled rows get a per-row sentinel component ("\0" + id) so they
    ride the same shuffle as singleton groups — no dataset fork, no
    union, one chained groupby (group_fn passes singletons through)."""
    from ..rayutil import compact
    from .labeljoin import BROADCAST_LABELS_MAX, attach_labels

    labels = compact(labels)
    if labels.count() == 0:
        return nodes
    tagged = attach_labels(
        nodes, labels, key="id", make_default=_sentinel,
        broadcast_threshold=(BROADCAST_LABELS_MAX if broadcast_threshold is None
                             else broadcast_threshold),
        comp_type=pa.string())
    return (tagged.groupby("comp")
            .map_groups(group_fn, batch_format="pyarrow"))


def _phase1_group(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return NODES_SCHEMA.empty_table()
    if batch.num_rows == 1 or batch["comp"][0].as_py().startswith("\0"):
        return batch.drop_columns(["comp"])
    recs = sort_canonical(records_of(batch.drop_columns(["comp"])))
    kept: list[dict] = []
    for r in recs:
        if not fuzzy_name_match(r, kept):
            kept.append(r)
    return table_of(kept, NODES_SCHEMA)


def _phase2_group(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return NODES_SCHEMA.empty_table()
    if batch.num_rows == 1 or batch["comp"][0].as_py().startswith("\0"):
        return batch.drop_columns(["comp"])
    recs = sort_canonical(records_of(batch.drop_columns(["comp"])))
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
    return table_of(out, NODES_SCHEMA)


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
    SequenceMatcher work (the dominant cost). Emits tagged rows."""
    from difflib import SequenceMatcher

    out = []
    nn1, nn2 = r1.get("norm_name") or "", r2.get("norm_name") or ""
    sm = SequenceMatcher(None, nn1, nn2)
    upper_ok = sm.real_quick_ratio() > 0.75 and sm.quick_ratio() > 0.75
    ratio = sm.ratio() if upper_ok else 0.0
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

    lsh = nodes.map_batches(_explode_bands, batch_format="pyarrow")
    auth = nodes.map_batches(_explode_author, batch_format="pyarrow")
    # tagged pairs feed both phases — pin once
    tagged = compact(blocked_self_join(lsh.union(auth), _dual_verify_pair_fn,
                                       _TAGGED_PAIR_SCHEMA, cap=192))

    labels1 = connected_components(
        tagged.map_batches(_filter_kind("f"), batch_format="pyarrow"))
    d2 = compact(_tag_and_group(nodes, labels1, _phase1_group,
                                broadcast_threshold))

    surv_ids = compact(d2.select_columns(["id"]))
    sim = tagged.map_batches(_filter_kind("s"), batch_format="pyarrow")
    kw = {} if broadcast_threshold is None else {
        "broadcast_threshold": broadcast_threshold}
    sim = semi_join_keys(sim, surv_ids, "a", **kw)
    sim = semi_join_keys(sim, surv_ids, "b", **kw)
    labels2 = connected_components(sim)
    return _tag_and_group(d2, labels2, _phase2_group, broadcast_threshold)
