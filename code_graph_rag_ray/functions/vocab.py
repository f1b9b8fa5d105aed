"""Token vocabularies for the documents-table extraction operators.

The driver's synthetic ``documents`` table draws from a closed ~30-word
vocabulary. We partition it into entity-like nouns, relation-like verbs and
stopwords, which gives deterministic, SQL-expressible semantics for the
mention / triple extraction operators the DuckDB oracle verifies
(``__ray_entry__.oracle_sql``). This mirrors the reference's fixed,
code-declared schema philosophy (``constants/graph.py`` — schema is a
hand-maintained constant set, not inferred).
"""

from __future__ import annotations

ENTITY_VOCAB: frozenset[str] = frozenset(
    {
        "spark",
        "customer",
        "table",
        "column",
        "row",
        "line",
        "part",
        "key",
        "order",
        "window",
        "vector",
        "batch",
        "stream",
        "data",
        "value",
        "query",
        "hash",
    }
)

RELATION_VOCAB: frozenset[str] = frozenset(
    {"join", "merge", "filter", "sort", "scan", "group", "agg", "dup"}
)

STOPWORDS: frozenset[str] = frozenset({"the", "a", "fast", "slow", "small", "big"})

# Stable sorted forms for SQL IN-lists and regex alternations.
ENTITY_VOCAB_SORTED: tuple[str, ...] = tuple(sorted(ENTITY_VOCAB))
RELATION_VOCAB_SORTED: tuple[str, ...] = tuple(sorted(RELATION_VOCAB))
STOPWORDS_SORTED: tuple[str, ...] = tuple(sorted(STOPWORDS))


def sql_in_list(words: tuple[str, ...]) -> str:
    """Render a vocabulary as a SQL IN-list literal."""
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"
