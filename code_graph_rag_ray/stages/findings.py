"""Rule-based findings tier (M12 analog).

The reference's opt-in analyzers load YAML ast-grep rules and emit typed
finding nodes (Pattern/CodeSmell/SecurityIssue) linked to the module they
fire in (``analyzers/`` ``FindingAnalyzer``, run ``graph_updater.py:785-787``).
Web-text translation: a pluggable registry of regex rules scanned
VECTORIZED over document text (one ``pc.count_substring_regex`` pass per
rule per batch — RE2, the same engine DuckDB uses, so every rule is
oracle-checkable), emitting (doc_id, rule_id, severity, n_matches) finding
rows for documents where the rule fires.

Extension surface mirrors the reference's drop-a-YAML tier
(``ast_grep_tier.py:38-62``): pass your own list of :class:`FindingRule`.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


@dataclass(frozen=True)
class FindingRule:
    rule_id: str
    pattern: str  # RE2 syntax (portable to DuckDB's regexp_* functions)
    severity: str = "info"


DEFAULT_RULES: tuple[FindingRule, ...] = (
    FindingRule("long_token", r"[a-z]{7,}", "info"),
    FindingRule("s_word", r"\bs[a-z]+\b", "info"),
    FindingRule("vowel_pair", r"[aeiou]{2}", "info"),
    FindingRule("number_run", r"[0-9]+", "warn"),
)


def scan_findings(
    ds: Dataset,
    rules: tuple[FindingRule, ...] | list[FindingRule] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """documents → (doc_id, rule_id, severity, n_matches), n_matches > 0.

    Stateless ``map_batches``; each rule is one vectorized RE2 count over
    the batch's text column (non-overlapping matches, identical semantics
    to DuckDB ``regexp_extract_all`` length).
    """
    rule_list = tuple(DEFAULT_RULES if rules is None else rules)

    def scan(b: pa.Table) -> pa.Table:
        outs = []
        for rule in rule_list:
            n = pc.count_substring_regex(b[text_col], pattern=rule.pattern)
            n = pc.cast(n, pa.int64())
            mask = pc.greater(n, 0)
            ids = b[id_col].filter(mask)
            hits = n.filter(mask) if isinstance(n, pa.ChunkedArray) else pc.filter(n, mask)
            outs.append(
                pa.table(
                    {id_col: ids,
                     "rule_id": pa.array([rule.rule_id] * len(ids), pa.string()),
                     "severity": pa.array([rule.severity] * len(ids), pa.string()),
                     "n_matches": hits}
                )
            )
        return pa.concat_tables(outs)

    return ds.map_batches(scan, batch_format="pyarrow")
