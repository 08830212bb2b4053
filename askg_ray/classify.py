"""Category / operation classifiers — exact reference semantics.

categorize(): /root/reference/src/scrapers.py:115-138 — lowercase
"description + ' ' + name", any-substring match per category in table
order, default [other].
determine_operations(): /root/reference/src/scrapers.py:140-156 —
first-matching if/elif bucket per tool name, set-dedup preserving
first-seen order is NOT required by the reference (it uses
list(set(...))); we emit in fixed rule order so output is
deterministic (parity is set-level).
"""

from __future__ import annotations

from .vocab import CAT_OTHER, CATEGORY_KEYWORDS, OP_READ, OPERATION_RULES


def categorize(name: str | None, description: str | None) -> list[str]:
    text = ((description or "") + " " + (name or "")).lower()
    cats = [cat for cat, kws in CATEGORY_KEYWORDS.items()
            if any(kw in text for kw in kws)]
    return cats or [CAT_OTHER]


def determine_operations(tool_names: list[str] | None) -> list[str]:
    ops: set[str] = set()
    for tool_name in tool_names or []:
        tn = (tool_name or "").lower()
        for op, kws in OPERATION_RULES:
            if any(kw in tn for kw in kws):
                ops.add(op)
                break  # if/elif chain: first bucket wins (scrapers.py:146-153)
    # deterministic order: rule order
    ordered = [op for op, _ in OPERATION_RULES if op in ops]
    return ordered or [OP_READ]
