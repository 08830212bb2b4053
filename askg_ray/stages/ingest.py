"""Source-side parsing / filtering operators (SURVEY.md §2.2 M3-M7, §2.9 F2/F4).

The reference's scrapers interleave HTTP with parsing; here the crawl
has already happened (content arrives as columns), so only the parsing
and filtering semantics remain, each as a stateless map_batches /
flat_map stage:

  is_mcp_relevant      M4/F2  readme substring indicators + topic
                              fallback (/root/reference/src/scrapers.py:309-337)
  relevance_filter            vectorized Dataset filter on the above
  parse_repo_record    M3     GitHub-repo-JSON → entity projection
                              (scrapers.py:275-307)
  parse_package_json   M5     package.json manifest → name/desc/tools
                              (scrapers.py:339-359; TOML left
                              unparsed exactly as the reference TODOs it)
  extract_repo_links   M6     markdown → owner/repo candidates, one row
                              per link (explode; scrapers.py:384)
  extract_sitemap_urls M7     sitemap XML → server-page URLs
                              (scrapers.py:533)
  page_quality_filter  F4     security-checkpoint / tiny-page drop
                              (scrapers.py:1064-1069)
"""

from __future__ import annotations

import json
import re
from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc

from ..classify import categorize, determine_operations
from ..vocab import REG_GITHUB

MCP_INDICATORS = ["mcp server", "model context protocol", "mcp-server",
                  "claude desktop", "mcp.json", "model-context-protocol"]

_GITHUB_LINK = re.compile(r"https://github\.com/([^/]+/[^/\s\)]+)")
_SITEMAP_LOC = re.compile(r"<loc>(https://mcp\.so/server/[^<]+)</loc>")
_CHECKPOINT_MARKERS = ["checking your browser", "we're verifying your browser"]
_CHECKPOINT_ATTR = "data-astro-cid-nbv56vs3"


def is_mcp_relevant(readme_text: str | None, description: str | None,
                    topics: list[str] | None) -> bool:
    """scrapers.py:309-337 — readme indicators, else topics/description."""
    if readme_text:
        lower = readme_text.lower()
        if any(ind in lower for ind in MCP_INDICATORS):
            return True
    desc = description.lower() if isinstance(description, str) else ""
    return (any(t in ("mcp", "model-context-protocol") for t in topics or [])
            or "mcp" in desc or "model context protocol" in desc)


def relevance_filter(ds, readme_col="readme", desc_col="description",
                     topics_col="topics"):
    def fn(t: pa.Table) -> pa.Table:
        readmes = t[readme_col].to_pylist() if readme_col in t.column_names else [None] * t.num_rows
        descs = t[desc_col].to_pylist() if desc_col in t.column_names else [None] * t.num_rows
        topics = t[topics_col].to_pylist() if topics_col in t.column_names else [None] * t.num_rows
        mask = pa.array([is_mcp_relevant(r, d, tp)
                         for r, d, tp in zip(readmes, descs, topics)])
        return t.filter(mask)

    return ds.map_batches(fn, batch_format="pyarrow")


def parse_repo_record(repo: dict) -> dict | None:
    """M3 (scrapers.py:275-307): repo JSON → raw entity record.

    The relevance gate is applied by the caller (relevance_filter);
    last_updated parses ISO-8601 with the Z→+00:00 normalization."""
    try:
        owner = repo["owner"]["login"]
        updated = repo.get("updated_at")
        last_updated = (datetime.fromisoformat(updated.replace("Z", "+00:00"))
                        if updated else None)
        pkg = repo.get("_package_info") or {}
        return {
            "id": f"github_{owner}_{repo['name']}",
            "name": repo["name"],
            "description": repo.get("description"),
            "author": owner,
            "homepage": repo.get("homepage") or None,
            "repository": repo["html_url"],
            "implementation_language": repo.get("language"),
            "categories": categorize(repo.get("name"), repo.get("description")),
            "operations": determine_operations(
                [t.get("name", "") for t in pkg.get("tools", [])]),
            "registry_source": REG_GITHUB,
            "source_url": repo["html_url"],
            "last_updated": last_updated,
            "popularity_score": repo.get("stargazers_count", 0),
            "raw_metadata_json": json.dumps(repo, default=str, sort_keys=True),
        }
    except (KeyError, TypeError, ValueError):
        return None


def parse_repo_json_batch(batch: pa.Table) -> pa.Table:
    """Dataset stage: column `repo_json` (string) → entity rows."""
    out = []
    for s in batch["repo_json"].to_pylist():
        try:
            rec = parse_repo_record(json.loads(s))
        except (json.JSONDecodeError, TypeError):
            rec = None
        if rec is not None:
            out.append(rec)
    if not out:
        return _REPO_SCHEMA.empty_table()
    return pa.table({f.name: [r.get(f.name) for r in out] for f in _REPO_SCHEMA},
                    schema=_REPO_SCHEMA)


_REPO_SCHEMA = pa.schema([
    ("id", pa.string()), ("name", pa.string()), ("description", pa.string()),
    ("author", pa.string()), ("homepage", pa.string()),
    ("repository", pa.string()), ("implementation_language", pa.string()),
    ("categories", pa.list_(pa.string())), ("operations", pa.list_(pa.string())),
    ("registry_source", pa.string()), ("source_url", pa.string()),
    ("last_updated", pa.timestamp("us")), ("popularity_score", pa.int64()),
    ("raw_metadata_json", pa.large_string()),
])


def parse_package_json(content: str | None) -> dict:
    """M5 (scrapers.py:339-359): only package.json parses; TOML files
    return {} exactly like the reference's TODO branch."""
    if not content:
        return {}
    stripped = content.lstrip()
    if not stripped.startswith("{"):
        return {}  # pyproject.toml / Cargo.toml — unparsed, as in the reference
    try:
        out = json.loads(content)
        return out if isinstance(out, dict) else {}
    except json.JSONDecodeError:
        return {}


def extract_repo_links_batch(batch: pa.Table) -> pa.Table:
    """M6: markdown text → one row per github owner/repo link (explode)."""
    src, repo_paths = [], []
    for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        for m in _GITHUB_LINK.findall(text or ""):
            src.append(url)
            repo_paths.append(m)
    return pa.table({"source_url": pa.array(src, pa.string()),
                     "repo_path": pa.array(repo_paths, pa.string())})


def extract_sitemap_urls_batch(batch: pa.Table) -> pa.Table:
    """M7: sitemap XML → server-page URLs (explode)."""
    src, urls = [], []
    for url, xml in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        for m in _SITEMAP_LOC.findall(xml or ""):
            src.append(url)
            urls.append(m)
    return pa.table({"sitemap_url": pa.array(src, pa.string()),
                     "server_url": pa.array(urls, pa.string())})


def parse_glama_record(server_data: dict) -> dict | None:
    """M10 (scrapers.py:832-874): Glama API JSON → raw entity record.
    Name guard; tool names drive operations; synthesized source_url."""
    if not isinstance(server_data, dict):
        return None
    name = server_data.get("name")
    if not name:
        return None
    tools = server_data.get("tools", [])
    tool_structs = [
        {"name": t.get("name", ""),
         "description": t.get("description"),
         "parameters_json": (json.dumps(t["parameters"], sort_keys=True)
                             if t.get("parameters") is not None else None)}
        for t in tools if isinstance(t, dict)
    ] if isinstance(tools, list) else []
    tool_names = [t["name"] for t in tool_structs]
    resources = server_data.get("resources", [])
    resource_structs = [
        {"uri": r.get("uri", ""), "name": r.get("name"),
         "description": r.get("description"),
         "mime_type": r.get("mime_type")}
        for r in resources if isinstance(r, dict)
    ] if isinstance(resources, list) else []
    prompts = server_data.get("prompts", [])
    prompt_structs = [
        {"name": p.get("name", ""), "description": p.get("description"),
         "arguments_json": (json.dumps(p["arguments"], sort_keys=True)
                            if p.get("arguments") is not None else None)}
        for p in prompts if isinstance(p, dict)
    ] if isinstance(prompts, list) else []
    slug = name.lower().replace(" ", "_").replace("-", "_")
    return {
        "id": f"glama_api_{slug}",
        "name": name,
        "description": server_data.get("description"),
        "author": server_data.get("author"),
        "version": server_data.get("version", "1.0.0"),
        "repository": server_data.get("repository"),
        "implementation_language": server_data.get("language"),
        "categories": categorize(name, server_data.get("description")),
        "operations": determine_operations(tool_names),
        "tool_names": tool_names,
        # capability structs + open-schema blob (scrapers.py:841-849,
        # 869-870: mcp_tools=..., raw_metadata=server_data); resources/
        # prompts mirror models.py:47-57 (MCPResource/MCPPrompt)
        "tools": tool_structs,
        "resources": resource_structs,
        "prompts": prompt_structs,
        "raw_metadata_json": json.dumps(server_data, sort_keys=True,
                                        default=str),
        "registry_source": "glama",
        "source_url": f"https://glama.ai/mcp/servers/{name.lower().replace(' ', '-')}",
    }


def parse_api_payload(data) -> list[dict]:
    """M12 (scrapers.py:1190-1237): generic marketplace API-shape
    projection — tries servers/data/items/results keys, name|title,
    author|owner, repository|repo_url; per-payload name dedup mirrors
    the reference's per-page ``seen_names`` set (scrapers.py:1125-1133)."""
    server_list = None
    if isinstance(data, dict):
        for key in ("servers", "data", "items", "results"):
            if key in data and isinstance(data[key], list):
                server_list = data[key]
                break
    elif isinstance(data, list):
        server_list = data
    out: list[dict] = []
    seen_names: set[str] = set()
    for sd in server_list or []:
        if not isinstance(sd, dict):
            continue
        name = sd.get("name") or sd.get("title")
        if not name or name in seen_names:
            continue
        seen_names.add(name)
        out.append({
            "id": f"mcpmarket_{name.lower().replace(' ', '-').replace('_', '-')}",
            "name": name,
            "description": sd.get("description"),
            "author": sd.get("author") or sd.get("owner"),
            "repository": sd.get("repository") or sd.get("repo_url"),
            "categories": categorize(name, sd.get("description")),
            "operations": determine_operations(
                [t.get("name", "") for t in sd.get("tools", [])
                 if isinstance(t, dict)]),
            "registry_source": "mcpmarket.com",
            "source_url": sd.get("url"),
        })
    return out


def page_quality_filter(pages):
    """F4 (scrapers.py:1064-1069): drop checkpoint pages and pages with
    len(html) < 1000 — vectorized length check, per-row marker scan."""
    def fn(t: pa.Table) -> pa.Table:
        lengths = pc.binary_length(t["html"])
        keep_len = pc.greater_equal(lengths, 1000)
        marks = []
        for h, ok in zip(t["html"].to_pylist(), keep_len.to_pylist()):
            if not ok:
                marks.append(False)
                continue
            try:
                s = bytes(h).decode("utf-8", errors="replace")
            except Exception:
                marks.append(False)
                continue
            low = s.lower()
            marks.append(not (any(m in low for m in _CHECKPOINT_MARKERS)
                              or _CHECKPOINT_ATTR in s))
        return t.filter(pa.array(marks))

    return pages.map_batches(fn, batch_format="pyarrow")
