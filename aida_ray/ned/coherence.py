"""Entity-entity coherence measures.

References:
  - MilneWittenEntityEntitySimilarity.java:60-97
  - InlinkOverlapEntityEntitySimilarity / Jaccard variants
    (graph/similarity/measure/*, SURVEY.md §2.8 C7)
"""

from __future__ import annotations

import math

import numpy as np

from aida_ray.kb.kb import KB


def milne_witten(kb: KB, a: int, b: int) -> float:
    """1 - (log(max) - log(overlap)) / (log(N) - log(min)), clamped to 0."""
    ia = kb.inlinks.get(a)
    ib = kb.inlinks.get(b)
    if ia is None or ib is None or len(ia) == 0 or len(ib) == 0:
        return 0.0
    overlap = np.intersect1d(ia, ib, assume_unique=True).size
    if overlap == 0:
        return 0.0
    size_a, size_b = len(ia), len(ib)
    mx, mn = (size_a, size_b) if size_a >= size_b else (size_b, size_a)
    distance = (math.log(mx) - math.log(overlap)) / \
               (math.log(kb.collection_size) - math.log(mn))
    if distance > 1.0:
        return 0.0
    return 1.0 - distance


def inlink_overlap(kb: KB, a: int, b: int) -> float:
    """|A ∩ B| / min(|A|, |B|)."""
    ia = kb.inlinks.get(a)
    ib = kb.inlinks.get(b)
    if ia is None or ib is None or len(ia) == 0 or len(ib) == 0:
        return 0.0
    overlap = np.intersect1d(ia, ib, assume_unique=True).size
    return overlap / min(len(ia), len(ib))


def jaccard_inlinks(kb: KB, a: int, b: int) -> float:
    ia = kb.inlinks.get(a)
    ib = kb.inlinks.get(b)
    if ia is None or ib is None or len(ia) == 0 or len(ib) == 0:
        return 0.0
    overlap = np.intersect1d(ia, ib, assume_unique=True).size
    union = len(ia) + len(ib) - overlap
    return overlap / union if union else 0.0


_MEASURES = {
    "milnewitten": milne_witten,
    "inlink_overlap": inlink_overlap,
    "jaccard": jaccard_inlinks,
}


def ensemble_ee_similarity(kb: KB, a: int, b: int,
                           ee_sims: tuple[tuple[str, float], ...]) -> float:
    """Weighted sum (EnsembleEntityEntitySimilarity.java:18-27)."""
    return sum(_MEASURES[kind](kb, a, b) * w for kind, w in ee_sims)
