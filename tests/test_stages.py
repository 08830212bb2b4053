"""Unit tests for the distributed building blocks."""

import pyarrow as pa

from askg_ray.merge import completeness_score, merge_phase1, merge_phase2


def test_merge_phase1_rules():
    base = {"description": None, "version": "1.0", "categories": ["b"],
            "operations": ["read"], "data_types": [], "tool_names": ["t1"],
            "popularity_score": 5, "download_count": 0, "warc_ts": 1}
    dup = {"description": "d", "version": "2.0", "categories": ["a"],
           "operations": ["write"], "data_types": ["x"], "tool_names": ["t1", "t2"],
           "popularity_score": 9, "download_count": 0, "warc_ts": 2}
    m = merge_phase1(base, dup)
    assert m["description"] == "d"          # fill-empty
    assert m["version"] == "1.0"            # keep non-empty base
    assert m["categories"] == ["a", "b"]    # sorted union
    assert m["tool_names"] == ["t1", "t2"]  # union by name, base first
    assert m["popularity_score"] == 9       # max
    assert m["warc_ts"] == 2                # latest


def test_merge_phase2_no_tools_union():
    base = {"tool_names": ["t1"], "categories": [], "operations": [],
            "implementation_language": None}
    other = {"tool_names": ["t2"], "categories": [], "operations": [],
             "implementation_language": "go"}
    m = merge_phase2(base, other)
    assert m["tool_names"] == ["t1"]                 # phase-2 keeps base tools
    assert m["implementation_language"] == "go"       # phase-2 fills language


def test_completeness_score():
    assert completeness_score({}) == 0
    s = {"description": "d", "repository": "r", "tool_names": ["a", "b"],
         "categories": ["c"], "popularity_score": 1}
    assert completeness_score(s) == 2 + 2 + 2 + 1 + 1


def test_connected_components_driver_and_distributed(ray_session):
    import ray.data as rd

    from askg_ray.stages.components import connected_components

    t = pa.table({"a": ["a", "b", "x", "m"], "b": ["b", "c", "y", "m"]})
    pairs = rd.from_arrow(t)
    # driver path
    labels = {r["node"]: r["component"]
              for b in connected_components(pairs).iter_batches(batch_format="pyarrow")
              for r in b.to_pylist()}
    assert labels == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "m": "m"}
    # distributed hash-to-min path (force it)
    labels2 = {r["node"]: r["component"]
               for b in connected_components(pairs, driver_threshold=0)
               .iter_batches(batch_format="pyarrow")
               for r in b.to_pylist()}
    assert labels2 == labels


def test_blocked_self_join_matches_naive(ray_session):
    """Grid-salted pairs == naive all-pairs within each block, no dupes."""
    import ray.data as rd

    from askg_ray.stages.selfjoin import blocked_self_join

    n = 37
    rows = [{"block_key": "k" if i < 30 else "k2", "id": f"id{i:03d}", "v": i}
            for i in range(n)]
    schema = pa.schema([("block_key", pa.string()), ("id", pa.string()),
                        ("v", pa.int64())])
    t = pa.table({c: [r[c] for r in rows] for c in ("block_key", "id", "v")},
                 schema=schema)
    out_schema = pa.schema([("pair", pa.string())])

    def pair_fn(r1, r2):
        return [{"pair": f"{r1['id']}|{r2['id']}"}]

    # cap=7 → the 30-row block is split into ⌈30/7⌉=5 salt buckets
    got = [r["pair"] for b in blocked_self_join(rd.from_arrow(t), pair_fn,
                                                out_schema, cap=7)
           .iter_batches(batch_format="pyarrow") for r in b.to_pylist()]
    ids1 = sorted(r["id"] for r in rows if r["block_key"] == "k")
    ids2 = sorted(r["id"] for r in rows if r["block_key"] == "k2")
    expected = {f"{a}|{b}" for ids in (ids1, ids2)
                for i, a in enumerate(ids) for b in ids[i + 1:]}
    assert len(got) == len(expected), "duplicate or missing pairs"
    assert set(got) == expected


def test_dedup_exact_merges_key_dups(ray_session):
    import ray.data as rd

    from askg_ray.pipelines.kg import extract_entities
    from askg_ray.sources.synth import gen_pages
    from askg_ray.stages.dedup_exact import dedup_exact

    pages = rd.from_arrow(gen_pages(30, seed=3))
    ents = extract_entities(pages).materialize()
    survivors = dedup_exact(ents).materialize()
    assert survivors.count() < ents.count()
    # no two survivors share a non-null repo_key
    keys = [r["repo_key"] for b in survivors.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist() if r["repo_key"]]
    assert len(keys) == len(set(keys))


def test_global_id_suffix_uniqueness(ray_session):
    import ray.data as rd

    from askg_ray.arrowutil import NODES_SCHEMA, table_of
    from askg_ray.stages.ids import assign_global_ids

    recs = []
    for i in range(4):
        recs.append({"id": f"r{i}", "gid_candidate": "owner/repo", "gid_tier": 1,
                     "reg_prio": i % 2, "warc_ts": None, "source_url": f"u{i}",
                     "name": "n", "categories": [], "operations": [],
                     "data_types": [], "tool_names": []})
    ds = rd.from_arrow(table_of(recs, NODES_SCHEMA))
    out = [r for b in assign_global_ids(ds).iter_batches(batch_format="pyarrow")
           for r in b.to_pylist()]
    ids = sorted(r["id"] for r in out)
    assert ids == ["owner/repo", "owner/repo-1", "owner/repo-2", "owner/repo-3"]
    assert all(r["registry_id"].startswith("r") for r in out)


def test_near_dedup_equals_two_pass(ray_session):
    """The fused single-candidate-pass near_dedup must produce the same
    survivor set as the original fuzzy-then-similar composition."""
    import ray.data as rd

    from askg_ray.pipelines.kg import extract_entities
    from askg_ray.rayutil import compact
    from askg_ray.sources.synth import gen_pages
    from askg_ray.stages.dedup_exact import dedup_exact
    from askg_ray.stages.dedup_near import dedup_fuzzy, merge_similar, near_dedup

    pages = rd.from_arrow(gen_pages(50, seed=11))
    d1 = compact(dedup_exact(compact(extract_entities(pages))))

    fused = {r["id"] for b in compact(near_dedup(d1))
             .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    two_pass = {r["id"] for b in compact(merge_similar(compact(dedup_fuzzy(d1))))
                .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    assert fused == two_pass


def test_attach_labels_broadcast_equals_distributed(ray_session):
    """labeljoin.attach_labels: both physical plans, identical output."""
    import ray.data as rd

    from askg_ray.stages.labeljoin import attach_labels

    ids = rd.from_arrow(pa.table({
        "id": [f"n{i}" for i in range(12)],
        "payload": list(range(12)),
    })).materialize()
    labels = rd.from_arrow(pa.table({
        "node": ["n2", "n3", "n7"], "component": ["n2", "n2", "n2"]}))

    def default(v):
        return "\0" + v

    results = []
    for thr in (10_000, 0):  # broadcast vs partitioned shuffle join
        out = attach_labels(ids, labels, "id", default,
                            broadcast_threshold=thr, comp_type=pa.string())
        results.append(sorted(
            (r["id"], r["comp"], r["payload"])
            for b in out.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()))
    assert results[0] == results[1]
    comp = dict((i, c) for i, c, _ in results[0])
    assert comp["n2"] == comp["n3"] == comp["n7"] == "n2"
    assert comp["n0"] == "\0n0"  # sentinel default


def test_semi_join_keys_both_paths(ray_session):
    import ray.data as rd

    from askg_ray.stages.labeljoin import semi_join_keys

    pairs = rd.from_arrow(pa.table({
        "a": ["x", "y", "z", "x"], "b": ["p", "q", "r", "s"]})).materialize()
    keys = rd.from_arrow(pa.table({"id": ["x", "z"]}))
    for thr in (10_000, 0):
        got = sorted((r["a"], r["b"])
                     for b in semi_join_keys(pairs, keys, "a",
                                             broadcast_threshold=thr)
                     .iter_batches(batch_format="pyarrow")
                     for r in b.to_pylist())
        assert got == [("x", "p"), ("x", "s"), ("z", "r")]


def test_near_dedup_distributed_labels_match(ray_session):
    """Forcing the partitioned label join (threshold=0) must reproduce
    the broadcast path's survivor set exactly."""
    import ray.data as rd

    from askg_ray.pipelines.kg import extract_entities
    from askg_ray.rayutil import compact
    from askg_ray.sources.synth import gen_pages
    from askg_ray.stages.dedup_exact import dedup_exact
    from askg_ray.stages.dedup_near import near_dedup

    pages = rd.from_arrow(gen_pages(50, seed=11))
    d1 = compact(dedup_exact(compact(extract_entities(pages))))
    default = {r["id"] for b in compact(near_dedup(d1))
               .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    forced = {r["id"] for b in compact(near_dedup(d1, broadcast_threshold=0))
              .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    assert forced == default


def test_doc_dedup_distributed_labels_match(ray_session):
    """ops/dedup assignment via the partitioned label join == broadcast."""
    from askg_ray.ops.dedup import minhash_dedup

    sf = "/root/testdata/sf0.001"
    base = sorted((r["doc_id"], r["rep_id"])
                  for b in minhash_dedup(sf).iter_batches(batch_format="pyarrow")
                  for r in b.to_pylist())
    forced = sorted((r["doc_id"], r["rep_id"])
                    for b in minhash_dedup(sf, broadcast_threshold=0)
                    .iter_batches(batch_format="pyarrow")
                    for r in b.to_pylist())
    assert base == forced
    assert any(d != r for d, r in base)  # corpus does contain near-dups


def test_blocked_self_join_prunes_singletons(ray_session):
    """A singleton-heavy key space (the LSH-band regime the bloom filter
    targets) still yields exactly the pairable block's pairs."""
    import ray.data as rd

    from askg_ray.stages.selfjoin import blocked_self_join

    rows = [{"block_key": f"solo{i}", "id": f"s{i:03d}"} for i in range(200)]
    rows += [{"block_key": "dense", "id": f"d{i}"} for i in range(4)]
    t = pa.table({c: [r[c] for r in rows] for c in ("block_key", "id")})
    out_schema = pa.schema([("pair", pa.string())])

    def pair_fn(r1, r2):
        return [{"pair": f"{r1['id']}|{r2['id']}"}]

    got = sorted(r["pair"]
                 for b in blocked_self_join(rd.from_arrow(t), pair_fn,
                                            out_schema, cap=10)
                 .iter_batches(batch_format="pyarrow") for r in b.to_pylist())
    assert got == ["d0|d1", "d0|d2", "d0|d3", "d1|d2", "d1|d3", "d2|d3"]


def test_merge_phase1_tools_structs():
    """Capability structs union by name, base-first, base wins collisions
    (deduplication.py:301-307 on MCPTool objects)."""
    from askg_ray.merge import merge_phase1

    base = {"tool_names": ["t1"], "categories": [], "operations": [],
            "data_types": [],
            "tools": [{"name": "t1", "description": "base t1",
                       "parameters_json": None}],
            "raw_metadata_json": None}
    dup = {"tool_names": ["t1", "t2"], "categories": [], "operations": [],
           "data_types": [],
           "tools": [{"name": "t1", "description": "dup t1",
                      "parameters_json": "{}"},
                     {"name": "t2", "description": "d2",
                      "parameters_json": None}],
           "raw_metadata_json": '{"x": 1}'}
    m = merge_phase1(base, dup)
    assert [t["name"] for t in m["tools"]] == ["t1", "t2"]
    assert m["tools"][0]["description"] == "base t1"   # base wins collision
    assert m["raw_metadata_json"] == '{"x": 1}'        # fill-empty


def test_ontology_categories_shape():
    from askg_ray.ontology import ONTOLOGY_CATEGORIES, categories_table
    from askg_ray.vocab import CATEGORIES

    t = categories_table()
    assert t.num_rows == 7
    ids = t["id"].to_pylist()
    assert ids[0] == "database" and ids[-1] == "communication"
    # all roots (reference sets no parents, main.py:21-94)
    assert all(p is None for p in t["parent_category_id"].to_pylist())
    # overlap with the 12-value classifier vocabulary: every ontology id
    # except "filesystem" (classifier uses "file_system") is shared
    overlap = set(ids) & set(CATEGORIES)
    assert overlap == {"database", "api_integration", "development_tools",
                       "data_processing", "cloud_services", "communication"}
    assert all(c["data_domains"] for c in ONTOLOGY_CATEGORIES)


def test_tools_structs_flow_through_pipeline(ray_session):
    """tools/raw_metadata columns survive extract → dedup → merge."""
    import ray.data as rd

    from askg_ray.pipelines.kg import canonical_nodes
    from askg_ray.sources.synth import gen_pages

    nodes = canonical_nodes(rd.from_arrow(gen_pages(40, seed=5)))
    rows = [r for b in nodes.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    with_tools = [r for r in rows if r["tools"]]
    assert with_tools, "no node carried capability structs"
    for r in with_tools:
        assert [t["name"] for t in r["tools"]] == r["tool_names"]


def test_truncate_out_degree(ray_session):
    import ray.data as rd

    from askg_ray.arrowutil import EDGES_SCHEMA
    from askg_ray.stages.edges import EDGE_CREATED_AT, truncate_out_degree

    rows = []
    for d in range(5):
        rows.append({"id": f"s_x_t{d}", "src": "s", "dst": f"t{d}",
                     "rel_type": "similar_functionality",
                     "confidence": 0.1 * d, "description": "",
                     "evidence": [], "created_at": EDGE_CREATED_AT})
    rows.append({"id": "u_x_t0", "src": "u", "dst": "t0",
                 "rel_type": "same_author", "confidence": 1.0,
                 "description": "", "evidence": [],
                 "created_at": EDGE_CREATED_AT})
    t = pa.table({f.name: [r[f.name] for r in rows] for f in EDGES_SCHEMA},
                 schema=EDGES_SCHEMA)
    out = [r for b in truncate_out_degree(rd.from_arrow(t), 2)
           .iter_batches(batch_format="pyarrow") for r in b.to_pylist()]
    by_src = {}
    for r in out:
        by_src.setdefault(r["src"], []).append(r["dst"])
    # top-2 by confidence desc for the fan-out node, untouched small node
    assert sorted(by_src["s"]) == ["t3", "t4"]
    assert by_src["u"] == ["t0"]


def test_merge_runs_singletons_and_groups(ray_session):
    import ray.data as rd

    from askg_ray.stages.runs import merge_runs

    schema = pa.schema([("id", pa.string()), ("v", pa.int64())])
    t = pa.table({
        "id": [f"i{n}" for n in range(8)],
        "v": [1, 2, 3, 4, 5, 6, 7, 8],
        "k": ["a", "a", "b", "c", "c", "c", "d", "e"],
    })

    def multi(recs):
        # sum the run into one record keyed by min id
        return [{"id": min(r["id"] for r in recs),
                 "v": sum(r["v"] for r in recs)}]

    out = {r["id"]: r["v"]
           for b in merge_runs(rd.from_arrow(t), "k", multi, schema,
                               nbuckets=3)
           .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}
    # runs: a={i0,i1} -> 3; b=i2 passthrough; c={i3,i4,i5} -> 15; d,e pass
    assert out == {"i0": 3, "i2": 3, "i3": 15, "i6": 7, "i7": 8}


def test_pair_ownership_exactly_once(ray_session):
    """Every unique candidate pair is verified exactly once across the
    LSH-band and author block families — the ownership rule drops the
    redundant re-verifications without losing any pair."""
    import ray.data as rd

    from askg_ray.stages import dedup_near as dn
    from askg_ray.stages.selfjoin import blocked_self_join

    rows = []
    for i, (name, author, reg) in enumerate([
            ("alpha file server", "ann", "github"),
            ("alpha file servr", "ann", "glama.ai"),     # fuzzy variant
            ("alpha file server", "bob", "mcp.so"),      # same name, other author
            ("beta tool kit", "ann", "github"),          # same author only
            ("gamma thing", "carol", "github"),          # unrelated
    ]):
        rows.append({
            "id": f"id{i}", "source_url": f"https://x/{i}",
            "name": name, "norm_name": name.replace(" ", ""),
            "author": author, "description": f"{name} desc shared words",
            "categories": ["Database"], "implementation_language": "py",
            "repository": f"https://github.com/{author}/{name.replace(' ', '-')}",
            "registry_source": reg,
        })
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    nodes = rd.from_arrow(pa.table(cols)).materialize()
    lsh = nodes.map_batches(dn._explode_bands, batch_format="pyarrow")
    auth = nodes.map_batches(dn._explode_author, batch_format="pyarrow")
    exploded = lsh.union(auth)

    seen = []

    def count_all(r1, r2):
        return [{"a": r1["id"], "b": r2["id"], "kind": "n"}]

    def count_owned(r1, r2):
        if dn._owns_pair(r1, r2):
            return [{"a": r1["id"], "b": r2["id"], "kind": "n"}]
        return []

    def pairs_of(fn):
        t = blocked_self_join(exploded, fn, dn._TAGGED_PAIR_SCHEMA,
                              cap=16).materialize()
        out = [(r["a"], r["b"]) for b in t.iter_batches(batch_format="pyarrow")
               for r in b.to_pylist()]
        return out

    owned = pairs_of(count_owned)
    everything = pairs_of(count_all)
    # exactly once: no duplicates in the owned stream
    assert len(owned) == len(set(owned))
    # nothing lost: same unique pair set as the exhaustive stream
    assert set(owned) == set(everything)
    # and the exhaustive stream really was redundant (sanity)
    assert len(everything) > len(set(everything))


def test_blocked_self_join_distributed_counts(ray_session, monkeypatch):
    """Force the distributed hot-count + bloom path (the 100TB route)
    and check it matches the small-side driver fold."""
    import ray.data as rd

    from askg_ray.stages import selfjoin

    t = pa.table({
        "block_key": ["k1"] * 5 + ["k2"] * 2 + [f"s{n}" for n in range(6)],
        "id": [f"i{n}" for n in range(13)],
    })
    pair_schema = pa.schema([("pair", pa.string())])

    def pair_fn(r1, r2):
        return [{"pair": f"{r1['id']}|{r2['id']}"}]

    def run():
        return sorted(
            r["pair"] for b in selfjoin.blocked_self_join(
                rd.from_arrow(t), pair_fn, pair_schema, cap=3)
            .iter_batches(batch_format="pyarrow") for r in b.to_pylist())

    small = run()
    monkeypatch.setattr(selfjoin, "SMALL_EXPLODED_ROWS", 0)
    assert run() == small
    # k1 (5 rows, salted at cap=3) gives C(5,2)=10, k2 gives 1 pair
    assert len(small) == 11


def test_near_dedup_thin_fat_paths_match(ray_session, monkeypatch):
    """Thin-row (plasma payload resolution) and fat-row candidate
    shuffles must produce identical survivor sets."""
    import ray.data as rd

    from askg_ray.pipelines.kg import extract_entities
    from askg_ray.rayutil import compact
    from askg_ray.sources.synth import gen_pages
    from askg_ray.stages import dedup_near as dn
    from askg_ray.stages.dedup_exact import dedup_exact

    pages = rd.from_arrow(gen_pages(60, seed=23))
    d1 = compact(dedup_exact(compact(extract_entities(pages))))

    def survivors():
        return {r["id"] for b in compact(dn.near_dedup(d1))
                .iter_batches(batch_format="pyarrow") for r in b.to_pylist()}

    monkeypatch.setattr(dn, "_PAYLOAD_MAX", 10**9)   # force thin
    thin = survivors()
    monkeypatch.setattr(dn, "_PAYLOAD_MAX", 0)       # force fat
    fat = survivors()
    assert thin and thin == fat


def test_dedup_exact_small_and_distributed_match(ray_session):
    """The one-task cascade (small path) and the three-shuffle cascade
    must produce identical survivor tables."""
    import ray.data as rd

    from askg_ray.pipelines.kg import extract_entities
    from askg_ray.rayutil import compact
    from askg_ray.sources.synth import gen_pages
    from askg_ray.stages.dedup_exact import dedup_exact

    ents = compact(extract_entities(rd.from_arrow(gen_pages(80, seed=5))))

    def rows(ds):
        return sorted(
            tuple(sorted((k, str(v)) for k, v in r.items()))
            for b in compact(ds).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist())

    small = rows(dedup_exact(ents))                 # n ≤ default threshold
    dist = rows(dedup_exact(ents, small_max=0))     # force shuffles
    assert small and small == dist


def test_assign_ids_small_and_distributed_match(ray_session):
    """One-task suffix assignment (small path) must equal the
    groupby-shuffle path."""
    import ray.data as rd

    from askg_ray.pipelines.kg import extract_entities
    from askg_ray.rayutil import compact
    from askg_ray.sources.synth import gen_pages
    from askg_ray.stages.dedup_exact import dedup_exact
    from askg_ray.stages.ids import assign_global_ids

    d1 = compact(dedup_exact(compact(extract_entities(
        rd.from_arrow(gen_pages(70, seed=9))))))

    def rows(ds):
        return sorted(
            tuple(sorted((k, str(v)) for k, v in r.items()))
            for b in compact(ds).iter_batches(batch_format="pyarrow")
            for r in b.to_pylist())

    small = rows(assign_global_ids(d1))
    dist = rows(assign_global_ids(d1, small_max=0))
    assert small and small == dist


def test_merge_phase1_resources_prompts_structs():
    """resources union by uri / prompts union by name, base-first, base
    wins collisions — the declared-intent rule at deduplication.py:300
    applied to MCPResource/MCPPrompt (models.py:47-57)."""
    from askg_ray.merge import merge_phase1

    base = {"tool_names": [], "categories": [], "operations": [],
            "data_types": [], "tools": [],
            "resources": [{"uri": "file:///a", "name": "base-a",
                           "description": None, "mime_type": "text/plain"}],
            "prompts": [{"name": "p1", "description": "base p1",
                         "arguments_json": None}]}
    dup = {"tool_names": [], "categories": [], "operations": [],
           "data_types": [], "tools": [],
           "resources": [{"uri": "file:///a", "name": "dup-a",
                          "description": "x", "mime_type": None},
                         {"uri": "file:///b", "name": "b",
                          "description": None, "mime_type": None}],
           "prompts": [{"name": "p1", "description": "dup p1",
                        "arguments_json": "{}"},
                       {"name": "p2", "description": None,
                        "arguments_json": None}]}
    m = merge_phase1(base, dup)
    assert [r["uri"] for r in m["resources"]] == ["file:///a", "file:///b"]
    assert m["resources"][0]["name"] == "base-a"      # base wins collision
    assert [p["name"] for p in m["prompts"]] == ["p1", "p2"]
    assert m["prompts"][0]["description"] == "base p1"


def test_truncate_recompute_ids_byte_identical(ray_session):
    """Dropping the id across the truncation shuffle and rebuilding it
    must give byte-identical rows to carrying it (sound because
    infer_edges ids are pure (src, dst, tag) hashes)."""
    import ray.data as rd

    from askg_ray.pipelines.kg import canonical_nodes
    from askg_ray.sources.synth import gen_pages
    from askg_ray.stages.edges import infer_edges, truncate_out_degree

    nodes = canonical_nodes(rd.from_arrow(gen_pages(60, seed=9)))
    edges = infer_edges(nodes).materialize()

    def canon(ds):
        return sorted(
            (r["id"], r["src"], r["dst"], r["rel_type"], r["confidence"])
            for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist())

    kept = canon(truncate_out_degree(edges, 3))
    rebuilt = canon(truncate_out_degree(edges, 3, recompute_ids=True))
    assert kept and rebuilt == kept


def test_split_block_schemaless_empty_before_prefn(ray_session):
    """Ray's map_groups can hand the exchange a SCHEMA-LESS empty block
    (zero columns); pre_fns are allowed to index columns, so the split
    task must drop the block BEFORE running pre_fn (regression: the
    intermittent doc_cosine_pairs KeyError 'Field \"a\" does not
    exist')."""
    import ray

    from askg_ray.stages.exchange import _split_block

    def pack(t: pa.Table) -> pa.Table:      # indexes columns, like prod
        a = t["a"].to_numpy(zero_copy_only=False)
        return pa.table({"pk": pa.array(a, pa.int64()), "p": t["p"]})

    out = ray.get(_split_block.options(num_returns=4)
                  .remote(pa.table({}), pack, "pk", 4))
    assert list(out) == [None] * 4
    # schema-PRESENT empty block: same outcome
    empty = pa.schema([("a", pa.int64()), ("p", pa.int64())]).empty_table()
    out = ray.get(_split_block.options(num_returns=4)
                  .remote(empty, pack, "pk", 4))
    assert list(out) == [None] * 4
