"""Distributed connected components — iterative hash-to-min shuffles.

Implements the union-find pass SURVEY.md §2.5 mandates for transitive
merge groups: candidate-pair edges → (node, component=min reachable
node) labels, as iterative bucketed-run rounds over ``node``
(stages/runs.merge_runs; the "hash-to-min" algorithm, Rastogi et al.
2013, public) — no joins, no driver-side graph, no per-node task
overhead (singleton member-sets go through one vectorized kernel).

Each round every node v with membership set C(v):
  m = min(C(v) ∪ {v}); emit (u, m) for u ∈ C(v) and (m, u) for u ∈ C(v).
Converges to star graphs centered on component minima in O(log d)
rounds. Convergence is detected with a cheap global label checksum
(sum of crc32(node|min)), an O(1) driver scalar per round.

For provably small candidate sets (< ``driver_threshold`` edges) a
driver-side union-find shortcut is taken — the sanctioned pattern when
the pair set is tiny relative to the corpus; the distributed path is
exercised by tests either way.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

PAIR_SCHEMA = pa.schema([("a", pa.string()), ("b", pa.string())])
LABEL_SCHEMA = pa.schema([("node", pa.string()), ("component", pa.string())])
_MEMBER_SCHEMA = pa.schema([("node", pa.string()), ("member", pa.string())])


def _seed_members(batch: pa.Table) -> pa.Table:
    nodes, members = [], []
    for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
        nodes += [a, b, a, b]
        members += [b, a, a, b]
    return pa.table({"node": nodes, "member": members}, schema=_MEMBER_SCHEMA)


def _round_multi(recs: list[dict]) -> list[dict]:
    """hash-to-min round for one node's member set (≥2 rows)."""
    node = recs[0]["node"]
    members = {r["member"] for r in recs}
    members.add(node)
    m = min(members)
    out = []
    for u in members:
        out.append({"node": u, "member": m})
        if u != m:
            out.append({"node": m, "member": u})
    return out


def _round_single(t: pa.Table) -> pa.Table:
    """Vectorized hash-to-min round for all 1-member nodes of a bucket:
    m = min(node, member); emit (member, m) plus (m, member) when they
    differ — exactly _round_multi's output for a singleton set."""
    import numpy as np

    nodes = np.asarray(t["node"].to_pylist(), dtype=object)
    mem = np.asarray(t["member"].to_pylist(), dtype=object)
    m = np.minimum(nodes, mem)
    diff = mem != m
    out_nodes = np.concatenate((mem, m[diff]))
    out_members = np.concatenate((m, mem[diff]))
    return pa.table({"node": pa.array(out_nodes, pa.string()),
                     "member": pa.array(out_members, pa.string())},
                    schema=_MEMBER_SCHEMA)


def _label_checksum(batch: pa.Table) -> pa.Table:
    acc = 0
    for n, m in zip(batch["node"].to_pylist(), batch["component"].to_pylist()):
        acc = (acc + zlib.crc32(f"{n}|{m}".encode())) & 0xFFFFFFFFFFFF
    return pa.table({"h": pa.array([acc], pa.int64())})


def _min_labels(members_ds):
    from ray.data.aggregate import Min
    agg = members_ds.groupby("node").aggregate(Min("member", alias_name="component"))
    return agg


# Driver union-find is bounded by PAIR-SET memory, not corpus size:
# 2M pairs ≈ a few hundred MB of Python strings — trivially safe on the
# driver, and pair sets are already duplicate-free (band ownership) and
# proportional to dup density, not corpus rows. Beyond the threshold the
# iterative hash-to-min path takes over (forced in tests).
def connected_components(pairs, driver_threshold: int = 2_000_000, max_rounds: int = 12):
    """pairs: Dataset[(a,b)] → Dataset[(node, component)].

    Only nodes that appear in some pair get a label.
    """
    import ray.data as rd

    from ..rayutil import compact
    pairs = compact(pairs)  # consumed twice (count + seed/iterate)
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(LABEL_SCHEMA.empty_table())
    if n_pairs < driver_threshold:
        return _driver_union_find(pairs)

    from .runs import merge_runs

    members = pairs.map_batches(_seed_members, batch_format="pyarrow")
    prev_sum = None
    for _ in range(max_rounds):
        members = compact(merge_runs(members, "node", _round_multi,
                                     _MEMBER_SCHEMA, single_fn=_round_single))
        labels = _min_labels(members)
        h = sum(b["h"].to_pylist()[0] for b in labels.map_batches(
            _label_checksum, batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
        if h == prev_sum:
            break
        prev_sum = h
    return _min_labels(members)


def _driver_union_find(pairs):
    import ray.data as rd

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    all_nodes: set[str] = set()
    for batch in pairs.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            all_nodes.add(a)
            all_nodes.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # min-root union keeps labels = component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    items = sorted((n, find(n)) for n in all_nodes)
    if not items:
        return rd.from_arrow(LABEL_SCHEMA.empty_table())
    t = pa.table({"node": [n for n, _ in items],
                  "component": [c for _, c in items]}, schema=LABEL_SCHEMA)
    return rd.from_arrow(t)
