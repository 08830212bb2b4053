"""Controlled vocabularies and keyword tables.

Reproduces the reference's enums and classifier keyword maps verbatim
(values, ordering) so classification parity is exact:
  - ServerCategory / OperationType / RegistrySource: /root/reference/src/models.py:8-38
  - category keyword table: /root/reference/src/scrapers.py:120-132
  - operation keyword rules: /root/reference/src/scrapers.py:140-156
Plain strings (no enum classes): these live inside Arrow list<string>
columns and map_batches workers, where pickling plain values is cheaper.
"""

from __future__ import annotations

# ServerCategory values (src/models.py:8-20)
CAT_DATABASE = "database"
CAT_FILE_SYSTEM = "file_system"
CAT_API_INTEGRATION = "api_integration"
CAT_DEVELOPMENT_TOOLS = "development_tools"
CAT_DATA_PROCESSING = "data_processing"
CAT_CLOUD_SERVICES = "cloud_services"
CAT_COMMUNICATION = "communication"
CAT_AUTHENTICATION = "authentication"
CAT_MONITORING = "monitoring"
CAT_SEARCH = "search"
CAT_AI_ML = "ai_ml"
CAT_OTHER = "other"

CATEGORIES = [
    CAT_DATABASE, CAT_FILE_SYSTEM, CAT_API_INTEGRATION, CAT_DEVELOPMENT_TOOLS,
    CAT_DATA_PROCESSING, CAT_CLOUD_SERVICES, CAT_COMMUNICATION,
    CAT_AUTHENTICATION, CAT_MONITORING, CAT_SEARCH, CAT_AI_ML, CAT_OTHER,
]

# OperationType values (src/models.py:23-32)
OP_READ = "read"
OP_WRITE = "write"
OP_QUERY = "query"
OP_EXECUTE = "execute"

OPERATIONS = [OP_READ, OP_WRITE, OP_QUERY, OP_EXECUTE,
              "transform", "analyze", "sync", "stream"]

# RegistrySource values (src/models.py:34-38)
REG_GITHUB = "github"
REG_MCP_SO = "mcp.so"
REG_GLAMA = "glama"
REG_MCP_MARKET = "mcpmarket.com"

REGISTRIES = [REG_GITHUB, REG_MCP_SO, REG_GLAMA, REG_MCP_MARKET]

# Canonical registry priority used wherever the reference relies on
# input order ("first wins" dedup, pair direction). Lower = wins.
REGISTRY_PRIORITY = {r: i for i, r in enumerate(REGISTRIES)}

# URL-domain families standing in for the four registries (FIXTURES.md §1).
REGISTRY_DOMAIN = {
    REG_GITHUB: "github-pages.example",
    REG_MCP_SO: "mcp-so.example",
    REG_GLAMA: "glama.example",
    REG_MCP_MARKET: "mcpmarket.example",
}
DOMAIN_REGISTRY = {v: k for k, v in REGISTRY_DOMAIN.items()}


def registry_for_url(url: str) -> str:
    """Map a page URL to its registry family (default: github)."""
    try:
        netloc = url.split("/", 3)[2]
    except IndexError:
        return REG_GITHUB
    return DOMAIN_REGISTRY.get(netloc, REG_GITHUB)

# Category keyword table — dict ordering matters for output category
# order parity (src/scrapers.py:120-132; dicts iterate in insert order).
CATEGORY_KEYWORDS: dict[str, list[str]] = {
    CAT_DATABASE: ["database", "sql", "postgres", "mysql", "mongodb", "redis"],
    CAT_FILE_SYSTEM: ["file", "filesystem", "directory", "folder", "storage"],
    CAT_API_INTEGRATION: ["api", "rest", "graphql", "webhook", "http"],
    CAT_DEVELOPMENT_TOOLS: ["git", "github", "code", "development", "build"],
    CAT_DATA_PROCESSING: ["data", "etl", "transform", "process", "analytics"],
    CAT_CLOUD_SERVICES: ["aws", "azure", "gcp", "cloud", "kubernetes"],
    CAT_COMMUNICATION: ["slack", "discord", "email", "notification", "message"],
    CAT_AUTHENTICATION: ["auth", "oauth", "login", "security", "jwt"],
    CAT_MONITORING: ["monitor", "metrics", "logging", "observability"],
    CAT_SEARCH: ["search", "index", "elasticsearch", "solr"],
    CAT_AI_ML: ["ai", "ml", "machine learning", "neural", "model"],
}

# Operation rules: first matching bucket wins per tool name
# (src/scrapers.py:146-153 — if/elif chain).
OPERATION_RULES: list[tuple[str, list[str]]] = [
    (OP_READ, ["get", "read", "fetch", "list"]),
    (OP_WRITE, ["create", "write", "update", "delete"]),
    (OP_QUERY, ["query", "search", "find"]),
    (OP_EXECUTE, ["execute", "run", "call"]),
]

# Relationship predicates actually emitted by the inferencer
# (src/neo4j_integration.py:569-631; vocabulary src/models.py:96-105).
REL_SAME_AUTHOR = "same_author"
REL_SIMILAR = "similar_functionality"
REL_COMPLEMENTARY = "complementary"
REL_ALTERNATIVE = "alternative_to"

RELATIONSHIP_TYPES = [REL_SAME_AUTHOR, REL_SIMILAR, REL_COMPLEMENTARY, REL_ALTERNATIVE]
