"""Distributed connected components — iterative hash-to-min shuffles.

Implements the union-find pass SURVEY.md §2.5 mandates for transitive
merge groups: candidate-pair edges → (node, component=min reachable
node) labels, as iterative ``groupby(node).map_groups`` rounds (the
"hash-to-min" algorithm, Rastogi et al. 2013, public) — no joins, no
driver-side graph.

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


def _hash_to_min_round(batch: pa.Table) -> pa.Table:
    node = batch["node"][0].as_py()
    members = set(batch["member"].to_pylist())
    members.add(node)
    m = min(members)
    out_nodes, out_members = [], []
    for u in members:
        out_nodes.append(u)
        out_members.append(m)
        if u != m:
            out_nodes.append(m)
            out_members.append(u)
    return pa.table({"node": out_nodes, "member": out_members}, schema=_MEMBER_SCHEMA)


def _label_checksum(batch: pa.Table) -> pa.Table:
    acc = 0
    for n, m in zip(batch["node"].to_pylist(), batch["component"].to_pylist()):
        acc = (acc + zlib.crc32(f"{n}|{m}".encode())) & 0xFFFFFFFFFFFF
    return pa.table({"h": pa.array([acc], pa.int64())})


def _min_labels(members_ds):
    from ray.data.aggregate import Min
    agg = members_ds.groupby("node").aggregate(Min("member", alias_name="component"))
    return agg


def connected_components(pairs, driver_threshold: int = 100_000, max_rounds: int = 12):
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

    members = pairs.map_batches(_seed_members, batch_format="pyarrow")
    prev_sum = None
    for _ in range(max_rounds):
        members = compact(members.groupby("node").map_groups(
            _hash_to_min_round, batch_format="pyarrow"))
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
