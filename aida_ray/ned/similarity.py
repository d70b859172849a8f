"""Keyphrase-based mention-entity similarity + ensemble.

References:
  - KeyphrasesBasedMentionEntitySimilarityMeasure.java:57-224 (keyphrase
    scoring: keyword match vs inverted index, min-cover window,
    score = phraseImportance * (|matched|/minCover) * (common/all)^2)
  - UnnormalizedKeyphrasesBasedMISimilarity / ...IDFSimilarity (keyword
    weight = per-entity keyword MI / global keyword IDF)
  - EnsembleMentionEntitySimilarity.java:89-316 (per-measure global
    min-max rescale, prior switch at priorThreshold with >=20%
    candidates-with-prior check, weighted sum + weighted prior)
"""

from __future__ import annotations

import math

from aida_ray.kb.kb import KB
from aida_ray.ned.context import InvertedIndex, min_cover
from aida_ray.ned.doc import Mention, PreparedDoc
from aida_ray.ned.settings import SimilaritySettings


def log_damping(value: float, damping: float) -> float:
    """MathUtil.logDamping."""
    return math.log(value * damping + 1.0) / math.log(damping + 1.0)


def keyphrase_similarity(kb: KB, index: InvertedIndex, mention: Mention,
                         eid: int, kind: str,
                         use_distance_discount: bool = False,
                         doc_len: int = 0) -> float:
    """Sum of per-keyphrase scores for one (mention, entity) pair."""
    kps = kb.entity_kps.get(eid)
    if not kps:
        return 0.0
    if kind == "mi":
        kw_scores = kb.kw_mi.get(eid, {})

        def score_of(kw: int) -> float:
            return kw_scores.get(kw, 0.0)
    else:  # idf
        idf = kb.kw_idf

        def score_of(kw: int) -> float:
            return idf.get(kw, 0.0)

    m_start, m_end = mention.start_token, mention.end_token
    total = 0.0
    for kp in kps:
        common_lists: list[list[int]] = []
        all_score = 0.0
        common_score = 0.0
        phrase_importance = 0.0
        for kw in kb.kp_tokens.get(kp, ()):
            if kw in kb.stop_ids:
                continue
            s = score_of(kw)
            phrase_importance += s
            all_score += s
            matched = -1
            if index.contains_word(kw, m_start, m_end):
                matched = kw
            else:
                exp = kb.expand_term(kw)
                if exp and index.contains_word(exp, m_start, m_end):
                    matched = exp
            if matched != -1:
                common_lists.append(index.positions(matched, m_start, m_end))
                common_score += s
        if not common_lists:
            continue
        mc = min_cover(common_lists)
        score = 0.0
        if all_score != 0.0:
            score = (phrase_importance
                     * (len(common_lists) / mc.length)
                     * (common_score / all_score) ** 2)
        if use_distance_discount and doc_len > 0:
            # KeyphrasesBasedMentionEntitySimilarityMeasure.java:192-197
            dist = min(
                max(abs(m_start - s0), abs(m_start - e0))
                for s0, e0 in zip(mc.start_positions, mc.end_positions))
            total_len = doc_len + (m_end - m_start) + 1
            score *= (1.0 - dist / total_len) ** 2
        if math.isnan(score):
            score = 0.0
        total += max(0.0, score)  # keyphrase source weight defaults to 1.0
    return total


def _rescale(value: float, lo: float, hi: float) -> float:
    """EnsembleMentionEntitySimilarity.rescale:297-316 (min==max -> max)."""
    if value < lo:
        return lo
    if value > hi:
        return hi
    if lo == hi:
        return hi
    return (value - lo) / (hi - lo)


class EnsembleSimilarity:
    """Precomputes raw per-measure scores + global min/max for one document."""

    def __init__(self, kb: KB, doc: PreparedDoc, mentions: list[Mention],
                 settings: SimilaritySettings):
        self.kb = kb
        self.settings = settings
        self.index = InvertedIndex(doc.token_ids, kb.stop_ids)
        kinds = {k for k, _ in settings.mes_no_prior} | \
                {k for k, _ in settings.mes_with_prior}
        # raw[kind][(mention_idx, eid)] = score
        self.raw: dict[str, dict[tuple[int, int], float]] = {}
        self.minmax: dict[str, tuple[float, float]] = {}
        self.mention_index = {id(m): i for i, m in enumerate(mentions)}
        for kind in kinds:
            scores: dict[tuple[int, int], float] = {}
            lo, hi = float("inf"), 0.0   # max starts at 0.0 (java `new double[]{MAX, 0.0}`)
            for mi_, m in enumerate(mentions):
                for eid, _prior in m.candidates:
                    s = keyphrase_similarity(kb, self.index, m, eid, kind)
                    scores[(mi_, eid)] = s
                    lo = min(lo, s)
                    hi = max(hi, s)
            self.raw[kind] = scores
            self.minmax[kind] = (lo, hi)

    def _should_use_prior(self, m: Mention) -> bool:
        st = self.settings
        should_switch = st.prior_threshold > 0.0
        if not should_switch:
            return True
        best_prior = max(m.priors.values(), default=0.0)
        if best_prior <= st.prior_threshold:
            return False
        total = len(m.candidates)
        if total == 0:
            return False
        with_prior = sum(1 for eid, _ in m.candidates if m.priors.get(eid, 0.0) > 0.0)
        return with_prior / total >= 0.2

    def similarity(self, m: Mention, eid: int) -> float:
        st = self.settings
        use_prior = self._should_use_prior(m)
        mes = st.mes_with_prior if use_prior else st.mes_no_prior
        mi_ = self.mention_index[id(m)]
        sim = 0.0
        for kind, weight in mes:
            lo, hi = self.minmax[kind]
            sim += _rescale(self.raw[kind][(mi_, eid)], lo, hi) * weight
        if use_prior and st.prior_weight > 0.0:
            prior = m.priors.get(eid, 0.0)
            if st.prior_take_log:
                prior = log_damping(prior, st.prior_damping_factor)
            sim += prior * st.prior_weight
        return sim
