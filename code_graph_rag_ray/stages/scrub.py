"""PII / sensitive-pattern redaction (training-data curation op).

A pluggable ordered rule registry — ``(rule_id, RE2 pattern,
replacement)`` — applied as chained ``pyarrow.compute``
``replace_substring_regex`` kernels inside one stateless ``map_batches``:
fully vectorized, shuffle-free, and RE2 on both sides of the oracle
(Arrow and DuckDB both compile RE2, so match spans are identical —
the same engine-parity trick the findings tier uses).

Per-rule hit counts are taken on the pre-scrub text (rules are expected
to match disjoint span families; replacement tokens are chosen so no
rule's output can create a later rule's match).

cgr analog: the analyzers/ rule registry (M12) applied as a *rewriting*
pass rather than a reporting pass; the ordered-cascade shape mirrors the
import alias rewrite chain (import_processor.py:765-847).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Ordered default registry. Patterns are RE2 (no backrefs/lookarounds) so
# the DuckDB oracle can run the byte-identical pattern.
DEFAULT_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d-]{7,}\d", "<PHONE>"),
)


def scrub_batch(
    batch: pa.Table,
    *,
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = DEFAULT_RULES,
    out_col: str = "text_clean",
    counts: bool = True,
) -> pa.Table:
    """Redact every rule match; emit scrubbed text + per-rule hit counts.

    Counting runs on the original text (before any replacement) so each
    ``n_<rule>`` is independent of registry order.
    """
    text = batch[text_col]
    out = batch
    if counts:
        for rule_id, pattern, _ in rules:
            out = out.append_column(
                f"n_{rule_id}",
                pc.cast(pc.count_substring_regex(text, pattern=pattern), pa.int64()),
            )
    clean = text
    for _, pattern, replacement in rules:
        clean = pc.replace_substring_regex(
            clean, pattern=pattern, replacement=replacement
        )
    out = out.append_column(out_col, clean)
    return out.drop_columns([text_col])
