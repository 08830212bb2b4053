"""Ontology categories dimension table.

Reproduces the reference's predefined OntologyCategory set verbatim
(/root/reference/src/main.py:21-94, model /root/reference/src/models.py:125-136):
seven root categories, each with id/name/description, no parent
(parent_category_id is None for all roots in the reference), plus the
ontological property lists (data_domains / operational_patterns /
integration_patterns).

The membership edge table (pipelines/kg.membership_table) joins to this
dimension on category_id = id for the five ids that overlap the
12-value ServerCategory classifier vocabulary (vocab.CATEGORIES); the
reference keeps the same split — classifier enum vs ontology objects.
"""

from __future__ import annotations

import pyarrow as pa

CATEGORIES_SCHEMA = pa.schema([
    ("id", pa.string()),
    ("name", pa.string()),
    ("description", pa.string()),
    ("parent_category_id", pa.string()),
    ("data_domains", pa.list_(pa.string())),
    ("operational_patterns", pa.list_(pa.string())),
    ("integration_patterns", pa.list_(pa.string())),
])

# Verbatim from /root/reference/src/main.py:25-94 (order preserved).
ONTOLOGY_CATEGORIES: list[dict] = [
    {"id": "database", "name": "Database Systems",
     "description": "Servers that interact with databases and data storage systems",
     "parent_category_id": None,
     "data_domains": ["sql", "nosql", "key-value", "document", "graph"],
     "operational_patterns": ["query", "crud", "transaction", "migration"],
     "integration_patterns": ["connection-pool", "orm", "raw-sql"]},
    {"id": "filesystem", "name": "File System Operations",
     "description": "Servers that work with files, directories, and file system operations",
     "parent_category_id": None,
     "data_domains": ["text", "binary", "structured", "media"],
     "operational_patterns": ["read", "write", "search", "watch", "sync"],
     "integration_patterns": ["local-fs", "cloud-storage", "version-control"]},
    {"id": "api_integration", "name": "API Integration",
     "description": "Servers that integrate with external APIs and web services",
     "parent_category_id": None,
     "data_domains": ["rest", "graphql", "soap", "webhooks"],
     "operational_patterns": ["request", "response", "polling", "streaming"],
     "integration_patterns": ["oauth", "api-key", "jwt", "rate-limiting"]},
    {"id": "development_tools", "name": "Development Tools",
     "description": "Servers that support software development workflows",
     "parent_category_id": None,
     "data_domains": ["code", "documentation", "builds", "deployments"],
     "operational_patterns": ["analyze", "transform", "build", "test", "deploy"],
     "integration_patterns": ["git", "ci-cd", "package-managers", "ide"]},
    {"id": "data_processing", "name": "Data Processing",
     "description": "Servers that process, transform, and analyze data",
     "parent_category_id": None,
     "data_domains": ["structured", "unstructured", "streams", "batches"],
     "operational_patterns": ["extract", "transform", "load", "analyze", "aggregate"],
     "integration_patterns": ["etl-pipelines", "streaming", "batch-processing"]},
    {"id": "cloud_services", "name": "Cloud Services",
     "description": "Servers that integrate with cloud platforms and services",
     "parent_category_id": None,
     "data_domains": ["infrastructure", "compute", "storage", "networking"],
     "operational_patterns": ["provision", "scale", "monitor", "backup"],
     "integration_patterns": ["aws", "azure", "gcp", "kubernetes"]},
    {"id": "communication", "name": "Communication",
     "description": "Servers that handle messaging, notifications, and communication",
     "parent_category_id": None,
     "data_domains": ["messages", "notifications", "emails", "chats"],
     "operational_patterns": ["send", "receive", "broadcast", "queue"],
     "integration_patterns": ["slack", "discord", "email", "sms", "webhooks"]},
]


def categories_table() -> pa.Table:
    """The dimension table with real list columns (library surface)."""
    return pa.table(
        {f.name: [c[f.name] for c in ONTOLOGY_CATEGORIES]
         for f in CATEGORIES_SCHEMA},
        schema=CATEGORIES_SCHEMA)


def categories_dataset():
    import ray.data as rd

    return rd.from_arrow(categories_table())


def categories_flat():
    """SQL-comparable projection: list columns joined with ',' (the
    driver's value-hash stringifies cells, and pandas renders Arrow
    lists as numpy arrays — CSV strings compare exactly)."""
    import ray.data as rd

    rows = [{
        "id": c["id"], "name": c["name"], "description": c["description"],
        "parent_category_id": c["parent_category_id"] or "",
        "data_domains": ",".join(c["data_domains"]),
        "operational_patterns": ",".join(c["operational_patterns"]),
        "integration_patterns": ",".join(c["integration_patterns"]),
    } for c in ONTOLOGY_CATEGORIES]
    return rd.from_arrow(pa.table(
        {k: [r[k] for r in rows] for k in rows[0]}))


def categories_oracle_sql() -> str:
    """Literal VALUES oracle for the flat projection."""
    rows = []
    for c in ONTOLOGY_CATEGORIES:
        vals = (c["id"], c["name"], c["description"],
                c["parent_category_id"] or "",
                ",".join(c["data_domains"]),
                ",".join(c["operational_patterns"]),
                ",".join(c["integration_patterns"]))
        rows.append("(" + ", ".join("'" + v.replace("'", "''") + "'"
                                    for v in vals) + ")")
    return ("SELECT * FROM (VALUES " + ", ".join(rows) + ") AS t(id, name, "
            "description, parent_category_id, data_domains, "
            "operational_patterns, integration_patterns)")
