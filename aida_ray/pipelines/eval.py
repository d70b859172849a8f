"""P/R evaluation harness: pipeline mention decisions vs gold annotations.

The reference's evaluation contract (CoNLL-YAGO testb accuracy,
README.md:313-318, getAidaNEL.py) re-expressed over our synthetic gold
table: a prediction is correct if (url, begin, len) matches a gold span
and the linked entity equals the gold entity.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa


@dataclass
class PRResult:
    precision: float
    recall: float
    f1: float
    n_pred: int
    n_gold: int
    n_correct: int


_NIL = frozenset({"--OOKBE--", "--NME--"})


def precision_recall(pred: pa.Table, gold: pa.Table) -> PRResult:
    """pred: (url, begin, len, entity[, mention...]); gold likewise.

    Standard KB-linking evaluation: gold NIL spans (--NME--/--OOKBE--)
    are excluded from the linkable-gold set, and predictions on those
    spans don't count against precision (a NIL prediction there is
    correct behavior, and a link there is unjudgeable)."""
    gold_map = {}
    for u, b, ln, e in zip(gold["url"].to_pylist(), gold["begin"].to_pylist(),
                           gold["len"].to_pylist(), gold["entity"].to_pylist()):
        gold_map[(u, b, ln)] = e
    n_pred = 0
    n_correct = 0
    for u, b, ln, e in zip(pred["url"].to_pylist(), pred["begin"].to_pylist(),
                           pred["len"].to_pylist(), pred["entity"].to_pylist()):
        if e in _NIL:
            continue
        g = gold_map.get((u, b, ln))
        if g in _NIL:
            continue
        n_pred += 1
        if g == e:
            n_correct += 1
    n_gold = sum(1 for e in gold_map.values() if e not in _NIL)
    p = n_correct / n_pred if n_pred else 0.0
    r = n_correct / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return PRResult(p, r, f1, n_pred, n_gold, n_correct)
