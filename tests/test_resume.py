"""Checkpoint/resume: manifest-diffing skips finished stages and
re-running produces identical outputs (SURVEY.md §5 item (e))."""

import json
import os
import shutil


def _edge_set(ds):
    return {(r["src"], r["rel_type"], r["dst"])
            for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()}


def test_checkpoint_resume(ray_session, tmp_path_factory):
    from askg_ray.pipelines.runner import run_checkpointed

    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    sf = "/root/testdata/sf0.001"

    out1 = run_checkpointed(sf, ckpt)
    assert all(not s["skipped"] for s in out1["_log"])
    edges1 = _edge_set(out1["edges"])
    nodes1 = out1["nodes"].count()

    # full rerun: every stage skipped, outputs identical
    out2 = run_checkpointed(sf, ckpt)
    assert all(s["skipped"] for s in out2["_log"]), out2["_log"]
    assert _edge_set(out2["edges"]) == edges1
    assert out2["nodes"].count() == nodes1

    # simulate a killed run: edges stage lost → only it re-runs
    shutil.rmtree(os.path.join(ckpt, "edges"))
    out3 = run_checkpointed(sf, ckpt)
    skipped = {s["stage"]: s["skipped"] for s in out3["_log"]}
    assert skipped == {"entities": True, "nodes": True,
                       "edges": False, "membership": True}
    assert _edge_set(out3["edges"]) == edges1

    # manifests carry lineage + metrics
    with open(os.path.join(ckpt, "nodes", "manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] == nodes1
    from askg_ray.pipelines.runner import STAGE_VERSIONS
    assert m["stage_version"] == STAGE_VERSIONS["nodes"]
    assert m["partitions"]
    assert "build_wall_s" in m["metrics"]

    # input change invalidates everything (fingerprint chain)
    from askg_ray.state.manifest import stage_current
    assert not stage_current(os.path.join(ckpt, "nodes"), "other-fp", "v1")


def test_neo4j_bulk_export(ray_session, tmp_path):
    """The offline graph sink writes the neo4j-admin import layout:
    headerless shards + one header file per table, row counts matching
    the source Datasets, and the shards parse under the header."""
    import glob

    import pyarrow as pa
    import pyarrow.csv as pacsv
    import ray.data as rd

    from askg_ray.pipelines.export import export_neo4j_bulk
    from askg_ray.pipelines.kg import build_kg
    from askg_ray.sources.synth import gen_pages

    kg = build_kg(rd.from_arrow(gen_pages(40, seed=11)))
    out = str(tmp_path / "bulk")
    counts = export_neo4j_bulk(kg, out)
    assert counts["nodes"] > 0 and counts["membership"] > 0

    for table in ["nodes", "categories", "edges", "membership"]:
        header = open(f"{out}/{table}.header.csv").read().strip().split(",")
        files = sorted(glob.glob(f"{out}/{table}/*.csv"))
        assert files, table
        n = 0
        for f in files:
            t = pacsv.read_csv(
                f, read_options=pacsv.ReadOptions(column_names=header))
            assert t.num_columns == len(header)
            n += t.num_rows
        assert n == counts[table], table
    # import-tool contract columns
    assert open(f"{out}/edges.header.csv").read().startswith(
        ":START_ID,:END_ID,:TYPE")
    assert ":LABEL" in open(f"{out}/nodes.header.csv").read()


def test_neo4j_bulk_export_rerun_idempotent(ray_session, tmp_path):
    """Re-exporting into the same dir must not append duplicate shards
    (write_csv appends by default; the sink recreates the dir)."""
    import glob

    import ray.data as rd

    from askg_ray.pipelines.export import export_neo4j_bulk
    from askg_ray.pipelines.kg import build_kg
    from askg_ray.sources.synth import gen_pages

    kg = build_kg(rd.from_arrow(gen_pages(30, seed=3)))
    out = str(tmp_path / "bulk")
    c1 = export_neo4j_bulk(kg, out)
    n_files1 = len(glob.glob(f"{out}/*/*.csv"))
    c2 = export_neo4j_bulk(kg, out)
    n_files2 = len(glob.glob(f"{out}/*/*.csv"))
    assert c1 == c2 and n_files1 == n_files2


def test_corpus_jsonl_export_roundtrip(ray_session, tmp_path):
    """JSONL sink round-trips the documents table exactly (values and
    row count), writes a manifest that matches the shards on disk, and
    a rerun replaces rather than appends."""
    import json
    import os

    import ray.data as rd

    from askg_ray.pipelines.export import export_corpus_jsonl

    out = str(tmp_path / "jsonl")
    m1 = export_corpus_jsonl("/root/testdata/sf0.001", out)
    assert m1["n_rows"] == 500 and m1["n_shards"] >= 1
    on_disk = sorted(f for f in os.listdir(f"{out}/docs")
                     if f.endswith((".json", ".jsonl")))
    assert on_disk == m1["shards"]
    with open(f"{out}/manifest.json") as f:
        assert json.load(f) == m1

    back = rd.read_json(f"{out}/docs").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    src = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=m1["columns"]).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert back[m1["columns"]].equals(src[m1["columns"]])

    m2 = export_corpus_jsonl("/root/testdata/sf0.001", out)
    assert m2["n_rows"] == 500  # rerun replaced, not appended


def test_sorted_export_sortedness_and_resume(ray_session, tmp_path):
    """Reading the range-partitioned shards in bucket order yields a
    fully (n_chars, doc_id)-sorted corpus; a rerun skips every bucket
    (footer row counts match); a corrupted shard is rewritten."""
    import pyarrow.parquet as pq2

    from askg_ray.pipelines.export import export_sorted_parquet

    sf, out = "/root/testdata/sf0.001", str(tmp_path / "sorted")
    m1 = export_sorted_parquet(sf, out)
    shards = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(shards) == m1["n_buckets"]
    keys, total = [], 0
    for s in shards:
        t = pq2.read_table(f"{out}/{s}")
        total += t.num_rows
        keys.extend(zip(t["n_chars"].to_pylist(), t["doc_id"].to_pylist()))
    assert total == m1["n_rows"] and keys == sorted(keys)
    # bucket ranges are disjoint and ordered
    bs = m1["buckets"]
    assert all(a["max_chars"] <= b["min_chars"]
               for a, b in zip(bs, bs[1:]))
    assert all(r["skipped"] == 0 for r in bs)
    # rerun: every bucket skipped, manifest identical modulo skip flags
    m2 = export_sorted_parquet(sf, out)
    assert all(r["skipped"] == 1 for r in m2["buckets"])
    assert [r["n_rows"] for r in m2["buckets"]] == \
           [r["n_rows"] for r in m1["buckets"]]
    # corrupt one shard -> only it is rewritten
    victim = f"{out}/{shards[3]}"
    with open(victim, "wb") as f:
        f.write(b"garbage")
    m3 = export_sorted_parquet(sf, out)
    flags = {r["bucket"]: r["skipped"] for r in m3["buckets"]}
    assert flags[m1["buckets"][3]["bucket"]] == 0
    assert sum(v == 0 for v in flags.values()) == 1
    assert pq2.read_table(victim).num_rows == m1["buckets"][3]["n_rows"]


def test_pruned_range_scan(ray_session, tmp_path):
    """The file-skipping scan opens a strict subset of shards, its
    match count equals the unpruned predicate count, and the oracle
    hash-matches."""
    import duckdb

    from askg_ray.pipelines.export import (PRUNED_SCAN_ORACLE_SQL,
                                           pruned_range_scan)

    sf, out = "/root/testdata/sf0.001", str(tmp_path / "pscan")
    got = pruned_range_scan(sf, out_dir=out).to_pylist()[0]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{sf}/documents.parquet')")
    exp = con.sql(PRUNED_SCAN_ORACLE_SQL).df().iloc[0].to_dict()
    assert got == {k: int(v) for k, v in exp.items()}
    assert 0 < got["n_buckets_opened"] < got["n_buckets_total"]
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert got["rows_scanned"] < n_docs        # I/O actually avoided
    assert got["n_match"] == con.sql(
        "SELECT count(*) FROM documents WHERE n_chars BETWEEN 40 AND 60"
    ).fetchone()[0]


def test_ivf_index_sink_resume_and_pruned_query(ray_session, tmp_path):
    """The IVF sink partitions the corpus exactly (list shards union to
    every vec_id once), a rerun skips every finished list, a corrupted
    shard is rewritten, and the pruned query opens a strict subset of
    lists while meeting its recall floor — full-probe recall is 100 by
    construction."""
    import pyarrow.parquet as pq2

    from askg_ray.pipelines.export import (IVF_EXPORT_LISTS,
                                           export_ivf_index,
                                           ivf_index_query)

    sf, out = "/root/testdata/sf0.001", str(tmp_path / "ivf")
    m1 = export_ivf_index(sf, out)
    shards = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    assert len(shards) == len(m1["lists"])
    ids = []
    for s in shards:
        ids.extend(pq2.read_table(f"{out}/{s}")["vec_id"].to_pylist())
    import duckdb
    n = duckdb.sql(f"SELECT count(*), count(DISTINCT vec_id) FROM "
                   f"read_parquet('{sf}/embeddings.parquet')").fetchone()
    assert len(ids) == len(set(ids)) == n[0] == n[1] == m1["n_rows"]
    assert all(r["skipped"] == 0 for r in m1["lists"])
    m2 = export_ivf_index(sf, out)
    assert all(r["skipped"] == 1 for r in m2["lists"])
    victim = f"{out}/{shards[0]}"
    with open(victim, "wb") as f:
        f.write(b"garbage")
    m3 = export_ivf_index(sf, out)
    assert sum(r["skipped"] == 0 for r in m3["lists"]) == 1
    # pruned query: subset of lists opened, recall floor met
    got = ivf_index_query(sf, out_dir=out).to_pylist()[0]
    assert 0 < got["n_lists_opened"] <= 4 < got["n_lists_total"]
    assert got["rows_scanned"] < got["n_rows_total"]
    assert got["recall_pct"] >= 30
    # probing EVERY list is the exact scan: recall must be 100
    full = ivf_index_query(sf, out_dir=out,
                           n_probe=IVF_EXPORT_LISTS).to_pylist()[0]
    assert full["recall_pct"] == 100
    assert full["rows_scanned"] == got["n_rows_total"]


def test_incremental_partition_rebuild(ray_session, tmp_path):
    """Changed-corpus rerun re-extracts ONLY the partitions the
    content diff flags; untouched partitions load from checkpoint and
    the final output equals a from-scratch build (VERDICT r3 #8)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from askg_ray.pipelines.runner import (INCR_PARTITIONS,
                                           run_checkpointed)

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    corpus = str(tmp_path / "corpus")
    os.makedirs(corpus)
    pq.write_table(src, f"{corpus}/documents.parquet")
    ckpt = str(tmp_path / "ckpt")

    out1 = run_checkpointed(corpus, ckpt)
    ents_log = next(s for s in out1["_log"] if s["stage"] == "entities")
    assert not ents_log["skipped"]
    assert ents_log["partitions_ran"] == INCR_PARTITIONS

    # unchanged rerun: zero partitions re-extract, all stages skip
    out2 = run_checkpointed(corpus, ckpt)
    log2 = next(s for s in out2["_log"] if s["stage"] == "entities")
    assert log2["skipped"] and log2["partitions_ran"] == 0

    # mutate ONE partition: change the lang of a single doc (the render
    # input), keeping ids/rows identical
    ids = src["doc_id"].to_pylist()
    langs = src["lang"].to_pylist()
    victim = next(i for i, d in enumerate(ids)
                  if d % INCR_PARTITIONS == 3)
    langs[victim] = "zz"
    mutated = src.set_column(src.schema.get_field_index("lang"), "lang",
                             pa.array(langs, src["lang"].type))
    pq.write_table(mutated, f"{corpus}/documents.parquet")

    out3 = run_checkpointed(corpus, ckpt)
    log3 = next(s for s in out3["_log"] if s["stage"] == "entities")
    assert log3["partitions_ran"] == 1
    ran = [p["part"] for p in log3["partitions"]
           if p.get("skipped") is False]
    assert ran == [3]
    # the delta re-extraction must also be CHEAP, not merely narrow:
    # one re-extracted partition out of 16 should cost well under half
    # of the full extraction wall (VERDICT r4 #7; generous bound —
    # the measured sf0.1 ratio is recorded in BASELINE.md)
    wall1 = sum(p.get("wall_s", 0.0) for p in ents_log["partitions"])
    wall3 = sum(p.get("wall_s", 0.0)
                for p in log3["partitions"] if not p.get("skipped"))
    assert wall3 < wall1 / 2, (wall3, wall1)
    # downstream stages rebuilt (global dedup chains off the combined fp)
    assert not next(s for s in out3["_log"]
                    if s["stage"] == "nodes")["skipped"]

    # incremental output == from-scratch build on the mutated corpus
    scratch = str(tmp_path / "ckpt_scratch")
    out4 = run_checkpointed(corpus, scratch)
    assert _edge_set(out3["edges"]) == _edge_set(out4["edges"])
    n3 = sorted(r["id"] for r in out3["nodes"].select_columns(["id"])
                .take_all())
    n4 = sorted(r["id"] for r in out4["nodes"].select_columns(["id"])
                .take_all())
    assert n3 == n4
