"""P/R/F1 scoring of emitted triple/node sets vs an oracle (A5 analog).

Mirrors the reference's eval scorer (``evals/score.py``, ``evals/cli.py``):
set-based precision/recall over hashable keys, driver-side (results are
small aggregates by the time they're scored).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class PRF:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_gold: int
    n_hit: int


def score_sets(pred: set, gold: set) -> PRF:
    hit = len(pred & gold)
    p = hit / len(pred) if pred else 1.0
    r = hit / len(gold) if gold else 1.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return PRF(p, r, f1, len(pred), len(gold), hit)
