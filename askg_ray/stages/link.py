"""Mention detection / entity-link scoring — broadcast-dictionary actor pool.

The north-rule stateful stage: an alias dictionary (surface form →
canonical entity id + weight, FIXTURES.md §2) is ``ray.put`` ONCE on
the driver; each actor builds its matching automaton ONCE in
``__init__`` from the broadcast ref (the reference analog is the
keyword maps matched against text, /root/reference/src/scrapers.py:
120-132,140-156 and src/text2cypher.py:214-242 — broadcast dictionaries
in spirit). ``__call__`` scans each page's extracted text per batch.

The automaton is a single compiled alternation regex over
longest-first escaped aliases (Aho-Corasick-equivalent output for
non-overlapping longest-match semantics at these dictionary sizes;
swap in a trie automaton for multi-million-alias dictionaries).
"""

from __future__ import annotations

import re

import pyarrow as pa

MENTIONS_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("alias", pa.string()),
    ("entity_id", pa.string()),
    ("score", pa.float64()),
])


class MentionLinker:
    def __init__(self, alias_ref):
        import ray

        alias_rows = ray.get(alias_ref)  # list of (alias, entity_id, weight)
        self.lookup: dict[str, list[tuple[str, float]]] = {}
        for alias, eid, w in alias_rows:
            self.lookup.setdefault(alias.lower(), []).append((eid, float(w)))
        pats = sorted({re.escape(a.lower()) for a, _, _ in alias_rows},
                      key=len, reverse=True)
        self.automaton = re.compile(
            r"(?<![\w-])(" + "|".join(pats) + r")(?![\w-])") if pats else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, aliases, eids, scores = [], [], [], []
        if self.automaton is not None:
            for url, text in zip(batch["url"].to_pylist(),
                                 batch["text"].to_pylist()):
                seen = set()
                for m in self.automaton.finditer((text or "").lower()):
                    surface = m.group(1)
                    if surface in seen:
                        continue
                    seen.add(surface)
                    for eid, w in self.lookup[surface]:
                        urls.append(url)
                        aliases.append(surface)
                        eids.append(eid)
                        scores.append(w)
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "alias": pa.array(aliases, pa.string()),
            "entity_id": pa.array(eids, pa.string()),
            "score": pa.array(scores, pa.float64()),
        }, schema=MENTIONS_SCHEMA)


def link_mentions(texts, alias_table: pa.Table, concurrency: int = 2,
                  batch_size: int = 512):
    """texts: Dataset[(url, text)] → mentions Dataset.

    alias_table: Arrow table (alias, entity_id, weight), broadcast once.
    """
    import ray

    rows = list(zip(alias_table["alias"].to_pylist(),
                    alias_table["entity_id"].to_pylist(),
                    alias_table["weight"].to_pylist()))
    ref = ray.put(rows)
    return texts.map_batches(MentionLinker, batch_format="pyarrow",
                             concurrency=concurrency, batch_size=batch_size,
                             fn_constructor_kwargs={"alias_ref": ref})
