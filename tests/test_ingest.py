"""Tests for the source-side parsing/filtering stages (ingest.py)."""

import json

import pyarrow as pa


def _rows(ds):
    return [r for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]


def test_is_mcp_relevant():
    from askg_ray.stages.ingest import is_mcp_relevant

    assert is_mcp_relevant("This is an MCP Server for files", None, None)
    assert is_mcp_relevant(None, "a Model Context Protocol tool", None)
    assert is_mcp_relevant(None, None, ["mcp"])
    assert not is_mcp_relevant("just a web app", "nothing here", ["cli"])
    # topic must match exactly (reference checks membership, not substring)
    assert not is_mcp_relevant(None, None, ["mcp-adjacent"])


def test_parse_repo_record():
    from askg_ray.stages.ingest import parse_repo_record

    repo = {
        "name": "pg-mcp", "owner": {"login": "zoe"},
        "html_url": "https://github.com/zoe/pg-mcp",
        "description": "postgres database server",
        "language": "Python", "stargazers_count": 77,
        "updated_at": "2025-02-01T10:00:00Z", "homepage": "",
        "_package_info": {"tools": [{"name": "query_db"}]},
    }
    r = parse_repo_record(repo)
    assert r["id"] == "github_zoe_pg-mcp"
    assert r["author"] == "zoe"
    assert r["homepage"] is None            # empty string → None
    assert r["last_updated"].year == 2025   # Z-normalized ISO parse
    assert "database" in r["categories"]
    assert r["operations"] == ["query"]
    assert parse_repo_record({"name": "x"}) is None  # missing fields → None


def test_parse_package_json():
    from askg_ray.stages.ingest import parse_package_json

    assert parse_package_json('{"name": "x", "tools": []}') == {"name": "x", "tools": []}
    assert parse_package_json("[project]\nname='y'") == {}   # TOML: unparsed
    assert parse_package_json(None) == {}
    assert parse_package_json("{broken") == {}


def test_extract_repo_links_and_sitemap(ray_session):
    import ray.data as rd

    from askg_ray.stages.ingest import (
        extract_repo_links_batch, extract_sitemap_urls_batch)

    md = ("Check [a](https://github.com/o1/r1) and "
          "https://github.com/o2/r2) plus https://example.com/x")
    t = pa.table({"url": ["u1"], "text": [md]})
    links = _rows(rd.from_arrow(t).map_batches(extract_repo_links_batch,
                                               batch_format="pyarrow"))
    assert [r["repo_path"] for r in links] == ["o1/r1", "o2/r2"]

    xml = ("<urlset><loc>https://mcp.so/server/a</loc>"
           "<loc>https://other.example/x</loc>"
           "<loc>https://mcp.so/server/b</loc></urlset>")
    t2 = pa.table({"url": ["s"], "text": [xml]})
    urls = _rows(rd.from_arrow(t2).map_batches(extract_sitemap_urls_batch,
                                               batch_format="pyarrow"))
    assert [r["server_url"] for r in urls] == [
        "https://mcp.so/server/a", "https://mcp.so/server/b"]


def test_relevance_and_quality_filters(ray_session):
    import ray.data as rd

    from askg_ray.stages.ingest import page_quality_filter, relevance_filter

    repos = pa.table({
        "readme": ["uses the model context protocol", "plain readme"],
        "description": [None, "web app"],
        "topics": [[], []],
    })
    kept = _rows(relevance_filter(rd.from_arrow(repos)))
    assert len(kept) == 1

    big = b"<html>" + b"x" * 2000 + b"</html>"
    checkpoint = b"<html>" + b"y" * 2000 + b" Checking your browser</html>"
    small = b"<html>tiny</html>"
    pages = pa.table({"url": ["a", "b", "c"],
                      "html": pa.array([big, checkpoint, small], pa.binary())})
    kept = _rows(page_quality_filter(rd.from_arrow(pages)))
    assert [r["url"] for r in kept] == ["a"]


def test_parse_repo_json_batch(ray_session):
    import ray.data as rd

    from askg_ray.stages.ingest import parse_repo_json_batch

    good = json.dumps({"name": "n", "owner": {"login": "o"},
                       "html_url": "https://github.com/o/n"})
    t = pa.table({"repo_json": [good, "{broken", json.dumps({"name": "x"})]})
    rows = _rows(rd.from_arrow(t).map_batches(parse_repo_json_batch,
                                              batch_format="pyarrow"))
    assert len(rows) == 1 and rows[0]["id"] == "github_o_n"


def test_parse_glama_and_marketplace():
    from askg_ray.stages.ingest import parse_api_payload, parse_glama_record

    g = parse_glama_record({"name": "Data Tool", "author": "a",
                            "tools": [{"name": "query_x"}]})
    assert g["id"] == "glama_api_data_tool"
    assert g["operations"] == ["query"]
    assert g["source_url"].endswith("/data-tool")
    assert parse_glama_record({"description": "no name"}) is None

    payload = {"items": [
        {"name": "S One", "owner": "o", "repo_url": "https://github.com/o/s1"},
        {"title": "S Two"},
        {"name": "S One"},          # per-payload name dedup
        "not-a-dict",
    ]}
    rows = parse_api_payload(payload)
    assert [r["name"] for r in rows] == ["S One", "S Two"]
    assert rows[0]["author"] == "o"
    assert rows[0]["repository"] == "https://github.com/o/s1"
    assert parse_api_payload({"nope": 1}) == []
    assert len(parse_api_payload([{"name": "L"}])) == 1   # bare-list shape


def test_extractor_registry():
    import pytest

    from askg_ray.registry import extractor_for, register_extractor

    assert extractor_for("html_page") is not None
    with pytest.raises(KeyError):
        extractor_for("nope")
    register_extractor("custom", lambda t: t)
    assert extractor_for("custom")


def test_pipeline_config(tmp_path):
    from askg_ray.config import PipelineConfig

    cfg = PipelineConfig()
    assert cfg.get("minhash_bands") == 16
    assert cfg.get("a.b", 7) == 7
    p = tmp_path / "c.yaml"
    p.write_text("selfjoin_cap: 100\ncustom_knob: 3\n")
    cfg2 = PipelineConfig.from_yaml(str(p))
    assert cfg2.selfjoin_cap == 100
    assert cfg2.get("extra.custom_knob") == 3


def test_validate_quarantine(ray_session):
    import pyarrow as pa

    from askg_ray.stages.extract import quarantined_only, valid_only, validate_batch

    t = pa.table({
        "id": ["a", None, "c"],
        "name": ["n1", "n2", "n3"],
        "registry_source": ["github", "github", "weird"],
        "popularity_score": [1, 1, 1],
        "source_url": ["u", "u", "u"],
    })
    v = validate_batch(t)
    assert v["quarantine_reason"].to_pylist() == [None, "missing_identity",
                                                  "unknown_registry"]
    assert valid_only(v).num_rows == 1
    assert quarantined_only(v).num_rows == 2


def test_read_registry_jsonl(ray_session, tmp_path):
    """The JSONL source projects glama-shaped lines through the same
    projector as the Parquet path, drops garbage lines and nameless
    records, and its output feeds the enrich stage unchanged."""
    import json

    from askg_ray.sources.jsonl import ENTITY_SCHEMA, read_registry_jsonl
    from askg_ray.stages.extract import enrich_batch
    from askg_ray.stages.ingest import parse_glama_record

    good = [
        {"name": "Data Tool", "author": "a", "description": "query db",
         "tools": [{"name": "query_database"}]},
        {"name": "File Server", "language": "Python",
         "repository": "https://github.com/o/f"},
    ]
    lines = [json.dumps(good[0]), "not json {", json.dumps({"no": "name"}),
             "", json.dumps(good[1])]
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(lines))

    ds = read_registry_jsonl(str(p))
    rows = [r for b in ds.iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()]
    assert sorted(r["id"] for r in rows) == sorted(
        parse_glama_record(g)["id"] for g in good)
    assert ds.schema().names == ENTITY_SCHEMA.names

    # pipeline-compatible: the enrich stage consumes it directly
    enriched = [r for b in ds.map_batches(enrich_batch,
                                          batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
                for r in b.to_pylist()]
    assert len(enriched) == 2
    assert all(r["content_key"] and r["gid_candidate"] for r in enriched)


def test_read_registry_csv(ray_session, tmp_path):
    """The CSV source drops nameless rows, fills defaults, and feeds
    the enrich stage unchanged."""
    p = tmp_path / "catalog.csv"
    p.write_text(
        "name,author,repository,description,implementation_language\n"
        "Data Tool,alice,https://github.com/a/d,query db,Python\n"
        ",bob,,missing name,Go\n"
        "File Server,carol,,serves files,Rust\n")

    from askg_ray.sources.csvsrc import ENTITY_SCHEMA, read_registry_csv
    from askg_ray.stages.extract import enrich_batch

    ds = read_registry_csv(str(p))
    rows = sorted((r["id"], r["author"], r["version"]) for b in
                  ds.iter_batches(batch_format="pyarrow")
                  for r in b.to_pylist())
    assert rows == [("catalog_csv_data_tool", "alice", "1.0.0"),
                    ("catalog_csv_file_server", "carol", "1.0.0")]
    assert ds.schema().names == ENTITY_SCHEMA.names
    enriched = [r for b in ds.map_batches(enrich_batch,
                                          batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")
                for r in b.to_pylist()]
    assert len(enriched) == 2 and all(r["content_key"] for r in enriched)
