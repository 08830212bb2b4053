"""Unit tests: frozen extractor + classifiers + normalizers.

Table-driven, mirroring the reference's unit style
(/root/reference/tests/test_cypher_cleaning.py:21-60)."""

from askg_ray.classify import categorize, determine_operations
from askg_ray.html_extract import extract_entity, extract_text
from askg_ray.normalize import (
    content_hash_md5,
    extract_repository_id,
    global_id_candidate,
    name_author_key,
    normalize_id,
    normalize_name,
    normalize_repository_url,
)

HTML = b"""<html><head><title>acme-tools by zoe</title>
<meta name="description" content="A database helper.">
<meta name="language" content="python"><meta name="popularity" content="42">
</head><body><h1>acme-tools by zoe</h1><p>First para.</p>
<a href="https://github.com/zoe/acme-tools">GitHub</a>
<a href="https://acme.dev">Home</a>
<span class="tag">#db</span><div class="badge">fast</div>
<span class="label">this-tag-is-way-too-long-to-keep</span>
<ul><li class="tool">get_thing</li><li class="tool">create_thing</li></ul>
<script>ignored()</script></body></html>"""


def test_extract_entity_full():
    e = extract_entity("https://mcp-so.example/server/acme-tools/zoe", HTML, "mcp.so")
    assert e["name"] == "acme-tools"
    assert e["author"] == "zoe"
    assert e["description"] == "A database helper."
    assert e["repository"] == "https://github.com/zoe/acme-tools"
    assert e["homepage"] == "https://acme.dev"
    assert e["implementation_language"] == "python"
    assert e["popularity_score"] == 42
    assert e["data_types"] == ["db", "fast"]  # long tag dropped, # stripped
    assert e["tool_names"] == ["get_thing", "create_thing"]
    assert e["id"] == "mcp_so_acme_tools"


def test_extract_text_policy():
    t = extract_text(HTML)
    assert "ignored()" not in t            # script stripped
    assert t.startswith("acme-tools by zoe")
    assert "First para." in t
    assert "\n" in t and "  " not in t      # stripped runs joined by \n


def test_url_fallback_and_none():
    # no h1/title, URL long enough → name/author from path segments
    e = extract_entity("https://glama.example/server/foo-bar/alice",
                       b"<html><body><p>x</p></body></html>", "glama")
    assert e["name"] == "foo-bar" and e["author"] == "alice"
    # short URL + no name → None
    assert extract_entity("https://glama.example/about",
                          b"<html><body><p>x</p></body></html>", "glama") is None
    # malformed bytes → None, text still defined
    assert extract_entity("https://glama.example/bad", b"\xff\xfe<ht\x00", "glama") is None
    assert isinstance(extract_text(b"\xff\xfe<ht\x00"), str)


def test_categorize_reference_semantics():
    # scrapers.py:115-138: substring match over description + " " + name
    assert categorize("pg-helper", "a postgres sql thing") == ["database"]
    assert "ai_ml" in categorize("x", "email notification ai")  # "ai" substring
    assert categorize("zzz", "nothing matches here qqq") == ["other"]
    # keyword in NAME counts too
    assert "search" in categorize("searchy", "")


def test_determine_operations_rules():
    assert determine_operations(["get_x", "create_y"]) == ["read", "write"]
    # first bucket wins per name: "create_reader" has "read" substring → read
    assert determine_operations(["create_reader"]) == ["read"]
    assert determine_operations([]) == ["read"]
    assert determine_operations(["query_db", "run_job"]) == ["query", "execute"]


def test_normalizers():
    assert normalize_repository_url("https://GitHub.com/A/B.git/") == "github.com/a/b"
    assert normalize_name("MCP-Fancy_Server") == "fancy"
    assert normalize_name("my mcp") == "my"
    assert name_author_key("x", None) is None
    assert extract_repository_id("https://www.github.com/Owner/Repo.git") == "owner/repo"
    assert extract_repository_id("https://example.com/x") is None
    assert normalize_id("Hello World_x!") == "hello-world-x"
    long = normalize_id("a" * 150)
    assert len(long) == 89 and long.startswith("a" * 80 + "-")


def test_content_hash_stability():
    h1 = content_hash_md5("A", "b", "desc", ["y", "x"], ["read"])
    h2 = content_hash_md5("A", "b", "desc", ["x", "y"], ["read"])
    assert h1 == h2  # category order irrelevant (sorted inside)


def test_global_id_tiers():
    assert global_id_candidate("n", "a", "https://github.com/o/r", "d", []) == (1, "o/r")
    assert global_id_candidate("n", "a", None, "d", []) == (2, "a/n")
    assert global_id_candidate("n", None, None, "d", []) == (3, "n")
    tier, cand = global_id_candidate(None, None, None, "d", [])
    assert tier == 4 and cand.startswith("server-") and len(cand) == 19


def test_generator_text_self_consistent(pages_small):
    for row in pages_small.to_pylist()[:50]:
        assert extract_text(row["html"]) == row["text"]
