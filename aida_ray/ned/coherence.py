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
    """1 - (log(max) - log(overlap)) / (log(N) - log(min)), clamped to 0.

    Pair results are memoized per process — candidate entity pairs recur
    across the documents one actor handles."""
    key = (a, b) if a <= b else (b, a)
    cached = kb._mw_cache.get(key)
    if cached is not None:
        return cached
    ia = kb.inlink_sets.get(a)
    ib = kb.inlink_sets.get(b)
    sim = 0.0
    if ia and ib:
        overlap = len(ia & ib)
        if overlap:
            size_a, size_b = len(ia), len(ib)
            mx, mn = (size_a, size_b) if size_a >= size_b else (size_b, size_a)
            distance = (math.log(mx) - math.log(overlap)) / \
                       (math.log(kb.collection_size) - math.log(mn))
            sim = 0.0 if distance > 1.0 else 1.0 - distance
    if len(kb._mw_cache) < 2_000_000:
        kb._mw_cache[key] = sim
    return sim


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


# EntitiesContextSettings.DEFAULT_KEYPHRASE_ALPHA / DEFAULT_KEYWORD_ALPHA
_COHERENCE_ALPHA = 0.9713705285593512


def _combined_kw_weight(kb: KB, eid: int, kw: int,
                        alpha: float = _COHERENCE_ALPHA,
                        normalize: bool = False) -> float:
    """α·MI + (1-α)·IDF (FastWeightedKeyphrasesContext.java:165-170).

    ``normalize`` divides IDF by log2(collectionSize)
    (KeyphrasesContext.computeIDFweights)."""
    idf = kb.kw_idf.get(kw, 0.0)
    if normalize:
        idf /= math.log2(kb.collection_size)
    return alpha * kb.kw_mi.get(eid, {}).get(kw, 0.0) + (1.0 - alpha) * idf


def _kp_weight(kb: KB, eid: int, kp: int,
               alpha: float = _COHERENCE_ALPHA,
               normalize: bool = False) -> float:
    """Combined keyphrase weight: α·NPMI + (1-α)·IDF over keyphrase DF
    (WeightedKeyphrasesContext.java:44-48,160-189 — float division here,
    unlike the int-division keyword IDF)."""
    from aida_ray.kb.kb import compute_npmi
    e_count = kb.entity_sizes.get(eid, 0)
    kp_count = kb.kp_df.get(kp, 0)
    ic = kb.e_kp_count.get(eid, {}).get(kp, 0)
    npmi = 0.0
    if e_count and kp_count:
        npmi = compute_npmi(e_count, kp_count, ic, kb.collection_size)
    idf = math.log2(kb.collection_size / kp_count) if kp_count else 0.0
    if normalize:
        idf /= math.log2(kb.collection_size)
    return alpha * npmi + (1.0 - alpha) * idf


def kore(kb: KB, a: int, b: int,
         kp_alpha: float = _COHERENCE_ALPHA,
         kw_alpha: float = _COHERENCE_ALPHA,
         normalize: bool = False) -> float:
    """KORE keyphrase-overlap coherence: two-level weighted Jaccard
    (KOREEntityEntitySimilarityMeasure.java:30-113):
      per overlapping keyphrase pair: kpWeight · jaccard², where
      jaccard = Σ min-kw-weights over shared keywords / (sumA + sumB - shared);
      normalized by the total keyphrase weight of both entities."""
    kps_a = kb.entity_kps.get(a, [])
    kps_b = kb.entity_kps.get(b, [])
    if not kps_a or not kps_b:
        return 0.0
    kw2kp_b: dict[int, list[int]] = {}
    for kp in kps_b:
        for kw in kb.kp_tokens.get(kp, ()):
            kw2kp_b.setdefault(kw, []).append(kp)
    # overlapping keyphrase pairs via shared keywords
    overlapping: dict[int, set[int]] = {}
    for kp in kps_a:
        for kw in kb.kp_tokens.get(kp, ()):
            for kpb in kw2kp_b.get(kw, ()):
                overlapping.setdefault(kp, set()).add(kpb)
    n = 0.0
    for kp_a, kpbs in overlapping.items():
        toks_a = set(kb.kp_tokens.get(kp_a, ()))
        sum_a = sum(_combined_kw_weight(kb, a, t, kw_alpha, normalize)
                    for t in toks_a)
        for kp_b in kpbs:
            toks_b = set(kb.kp_tokens.get(kp_b, ()))
            shared = toks_a & toks_b
            psimn = sum(min(_combined_kw_weight(kb, a, t, kw_alpha, normalize),
                            _combined_kw_weight(kb, b, t, kw_alpha, normalize))
                        for t in shared)
            sum_b = sum(_combined_kw_weight(kb, b, t, kw_alpha, normalize)
                        for t in toks_b)
            psimd = sum_a + sum_b - psimn
            if psimd != 0.0:
                kp_weight = min(_kp_weight(kb, a, kp_a, kp_alpha, normalize),
                                _kp_weight(kb, b, kp_b, kp_alpha, normalize))
                n += kp_weight * (psimn / psimd) ** 2
    denom = sum(_kp_weight(kb, a, kp, kp_alpha, normalize) for kp in kps_a) + \
        sum(_kp_weight(kb, b, kp, kp_alpha, normalize) for kp in kps_b)
    return n / denom if denom > 0 else 0.0


def ngd(kb: KB, a: int, b: int) -> float:
    """Normalized-Google-Distance similarity over entity KEYPHRASE-ID
    sets (NGDSimilarityMeasure.java:23-63: getContext = eKps, max/min =
    context lengths, intersect = shared keyphrase count; the MW formula
    applied to keyphrase sets)."""
    ka = kb.entity_kps.get(a, ())
    kb_ = kb.entity_kps.get(b, ())
    if not ka or not kb_:
        return 0.0
    sa, sb = set(ka), set(kb_)
    inter = len(sa & sb)
    if inter == 0:
        return 0.0
    mx, mn = max(len(sa), len(sb)), min(len(sa), len(sb))
    dist = (math.log(mx) - math.log(inter)) / \
           (math.log(kb.collection_size) - math.log(mn))
    return 0.0 if dist > 1.0 else 1.0 - dist


def weighted_ngd(kb: KB, a: int, b: int,
                 kp_alpha: float = _COHERENCE_ALPHA) -> float:
    """NGD over combined keyphrase MI+IDF weight MASS instead of counts
    (WeightedNGDSimilarityMeasure.java:16-77: max/min = per-entity total
    keyphrase weight; intersect = avg of both entities' weights over the
    shared keyphrase ids)."""
    ka = kb.entity_kps.get(a, ())
    kb_ = kb.entity_kps.get(b, ())
    if not ka or not kb_:
        return 0.0
    wa = sum(_kp_weight(kb, a, kp, kp_alpha) for kp in ka)
    wb = sum(_kp_weight(kb, b, kp, kp_alpha) for kp in kb_)
    shared = set(ka) & set(kb_)
    inter = sum(_kp_weight(kb, a, kp, kp_alpha) +
                _kp_weight(kb, b, kp, kp_alpha) for kp in shared) / 2.0
    if inter <= 0.0:
        return 0.0
    mx, mn = max(wa, wb), min(wa, wb)
    if mx <= 0.0 or mn <= 0.0:
        return 0.0
    dist = (math.log(mx) - math.log(inter)) / \
           (math.log(kb.collection_size) - math.log(mn))
    return 0.0 if dist > 1.0 else 1.0 - dist


def weighted_jaccard_kp(kb: KB, a: int, b: int,
                        kp_alpha: float = _COHERENCE_ALPHA) -> float:
    """Weighted Jaccard over keyphrase-id sets: Σ min-weight over shared
    / Σ max-weight over union (WeightedJaccardEntityEntitySimilarity-
    Measure.java:20-77)."""
    ka = kb.entity_kps.get(a, ())
    kb_ = kb.entity_kps.get(b, ())
    if not ka or not kb_:
        return 0.0
    wa = {kp: _kp_weight(kb, a, kp, kp_alpha) for kp in ka}
    wb = {kp: _kp_weight(kb, b, kp, kp_alpha) for kp in kb_}
    inter = sum(min(wa[kp], wb[kp]) for kp in wa.keys() & wb.keys())
    union = 0.0
    for kp in wa.keys() | wb.keys():
        if kp in wa and kp in wb:
            union += max(wa[kp], wb[kp])
        else:
            union += wa.get(kp, 0.0) + wb.get(kp, 0.0)
    return inter / union if union > 0 else 0.0


def jaccard_kp(kb: KB, a: int, b: int) -> float:
    """Unweighted Jaccard over keyphrase-id sets (JaccardEntityEntity-
    SimilarityMeasure.java:25-36 with a KeyphrasesContext; term expansion
    is an identity on keyphrase ids)."""
    sa = set(kb.entity_kps.get(a, ()))
    sb = set(kb.entity_kps.get(b, ()))
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def keyword_cosine(kb: KB, a: int, b: int) -> float:
    """Cosine over combined-weight keyword vectors
    (KeywordCosineEntityEntitySimilarity, SURVEY C7)."""
    kw_a = kb.e_kw_count.get(a, {})
    kw_b = kb.e_kw_count.get(b, {})
    if not kw_a or not kw_b:
        return 0.0
    dot = sum(_combined_kw_weight(kb, a, t) * _combined_kw_weight(kb, b, t)
              for t in kw_a.keys() & kw_b.keys())
    na = math.sqrt(sum(_combined_kw_weight(kb, a, t) ** 2 for t in kw_a))
    nb = math.sqrt(sum(_combined_kw_weight(kb, b, t) ** 2 for t in kw_b))
    return dot / (na * nb) if na > 0 and nb > 0 else 0.0


_MEASURES = {
    "milnewitten": milne_witten,
    "inlink_overlap": inlink_overlap,
    "jaccard": jaccard_inlinks,
    "jaccard_kp": jaccard_kp,
    "weighted_jaccard": weighted_jaccard_kp,
    "ngd": ngd,
    "weighted_ngd": weighted_ngd,
    "kore": kore,
    "keyword_cosine": keyword_cosine,
}


def ensemble_ee_similarity(kb: KB, a: int, b: int,
                           ee_sims: tuple[tuple[str, float], ...]) -> float:
    """Weighted sum (EnsembleEntityEntitySimilarity.java:18-27)."""
    return sum(_MEASURES[kind](kb, a, b) * w for kind, w in ee_sims)
