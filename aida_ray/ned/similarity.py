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


class KeyphraseMatch:
    """Weight-independent match structure for one (mention, entity, kp):
    the matched-keyword set, intersection size and min-cover length are
    identical for every measure kind — computed once, scored many times."""

    __slots__ = ("all_kws", "matched_kws", "isec", "mc_len",
                 "mc_starts", "mc_ends")

    def __init__(self, all_kws, matched_kws, isec, mc):
        self.all_kws = all_kws          # non-stop keyword ids of the kp
        self.matched_kws = matched_kws  # subset that matched the context
        self.isec = isec                # number of matched position lists
        self.mc_len = mc.length
        self.mc_starts = mc.start_positions
        self.mc_ends = mc.end_positions


def match_keyphrases(kb: KB, index: InvertedIndex, mention: Mention,
                     eid: int, max_kp: int = 0,
                     min_kp_weight: float = 0.0) -> list[KeyphraseMatch]:
    """All keyphrases of ``eid`` with >=1 keyword matching the context
    outside the mention span (KeyphrasesBasedMESim.java:124-175).
    ``max_kp`` / ``min_kp_weight`` apply the Fast-settings keyphrase
    pruning (top-N by weight, weight floor) before matching."""
    if max_kp or min_kp_weight > 0.0:
        kps = kb.pruned_kps(eid, max_kp, min_kp_weight)
    else:
        kps = kb.entity_kps.get(eid)
    if not kps:
        return []
    # cheap pre-filter: skip entities whose keyword universe (incl.
    # expansions) never appears in the document — safe because an
    # unmatched keyphrase always contributes 0.
    ekw = kb.entity_keywords.get(eid)
    if ekw is not None and index.word_set.isdisjoint(ekw):
        return []
    m_start, m_end = mention.start_token, mention.end_token
    out: list[KeyphraseMatch] = []
    for kp in kps:
        common_lists: list[list[int]] = []
        all_kws: list[int] = []
        matched_kws: list[int] = []
        for kw in kb.kp_tokens.get(kp, ()):
            if kw in kb.stop_ids:
                continue
            all_kws.append(kw)
            matched = -1
            if index.contains_word(kw, m_start, m_end):
                matched = kw
            else:
                exp = kb.expand_term(kw)
                if exp and index.contains_word(exp, m_start, m_end):
                    matched = exp
            if matched != -1:
                common_lists.append(index.positions(matched, m_start, m_end))
                matched_kws.append(kw)
        if common_lists:
            out.append(KeyphraseMatch(all_kws, matched_kws,
                                      len(common_lists),
                                      min_cover(common_lists)))
    return out


def score_matches(kb: KB, eid: int, matches: list[KeyphraseMatch],
                  kind: str, mention: Mention | None = None,
                  use_distance_discount: bool = False,
                  doc_len: int = 0) -> float:
    """Apply one measure kind's keyword weights to precomputed matches."""
    if not matches:
        return 0.0
    if kind == "mi":
        kw_scores = kb.kw_mi.get(eid, {})
        score_of = kw_scores.get
    else:  # idf
        score_of = kb.kw_idf.get
    total = 0.0
    for m in matches:
        all_score = 0.0
        for kw in m.all_kws:
            all_score += score_of(kw, 0.0)
        if all_score == 0.0:
            continue
        common_score = 0.0
        for kw in m.matched_kws:
            common_score += score_of(kw, 0.0)
        # phraseImportance == allKeywordsTotalScore (same accumulation
        # in the reference, KeyphrasesBasedMESim.java:132-140,178-184)
        score = all_score * (m.isec / m.mc_len) * (common_score / all_score) ** 2
        if use_distance_discount and doc_len > 0 and mention is not None:
            dist = min(
                max(abs(mention.start_token - s0), abs(mention.start_token - e0))
                for s0, e0 in zip(m.mc_starts, m.mc_ends))
            total_len = doc_len + (mention.end_token - mention.start_token) + 1
            score *= (1.0 - dist / total_len) ** 2
        if math.isnan(score):
            score = 0.0
        total += max(0.0, score)  # keyphrase source weight defaults to 1.0
    return total


def keyphrase_similarity(kb: KB, index: InvertedIndex, mention: Mention,
                         eid: int, kind: str,
                         use_distance_discount: bool = False,
                         doc_len: int = 0) -> float:
    """Sum of per-keyphrase scores for one (mention, entity) pair."""
    matches = match_keyphrases(kb, index, mention, eid)
    return score_matches(kb, eid, matches, kind, mention,
                         use_distance_discount, doc_len)


TEXT_ME_KINDS = ("tfidf_cosine", "wordcount_dot")


def entity_text_tokens(kb: KB, eid: int) -> list[int]:
    """Entity context token ids WITH multiplicity — the flattened keyword
    ids of the entity's keyphrases (TextContext.getContext analogue for
    the keyphrase-backed context)."""
    out: list[int] = []
    for kp in kb.entity_kps.get(eid, ()):
        out.extend(kb.kp_tokens.get(kp, ()))
    return out


def _count_vector(token_ids) -> dict[int, int]:
    v: dict[int, int] = {}
    for t in token_ids:
        if t == 0:            # unknown-word id — the reference's transient
            continue          # ids never collide; our 0 would match itself
        v[t] = v.get(t, 0) + 1
    return v


def _tfidf_vector(kb: KB, token_ids) -> dict[int, float]:
    """tf · log2(N/df) per term; df==0 smoothed to N ⇒ idf 0
    (TfIdfCosineSimilarityMeasure.getTfIdfVector)."""
    tf = _count_vector(token_ids)
    out: dict[int, float] = {}
    n = kb.collection_size
    for t, f in tf.items():
        df = kb.kw_df.get(t, 0) or n
        out[t] = f * (math.log2(n / df) if df else 0.0)
    return out


def tfidf_cosine(kb: KB, doc_token_ids, eid: int) -> float:
    """Cosine of tf·idf term vectors of the document context vs the
    entity context, with word-expansion cross terms
    (TfIdfCosineSimilarityMeasure.java:31-100)."""
    ctx = _tfidf_vector(kb, doc_token_ids)
    ent = _tfidf_vector(kb, entity_text_tokens(kb, eid))
    dot = 0.0
    for t, w in ent.items():
        if t in ctx:
            dot += w * ctx[t]
        exp = kb.expand_term(t)
        if exp and exp in ctx:
            dot += w * ctx[exp]
    na = math.sqrt(sum(w * w for w in ent.values()))
    nb = math.sqrt(sum(w * w for w in ctx.values()))
    return dot / (na * nb) if na * nb != 0 else 0.0


def wordcount_dot(kb: KB, doc_token_ids, eid: int) -> float:
    """Dot product of raw word-count vectors, expansion-aware
    (WordCountVectorDotProductSimilarityMeasure.java:27-70)."""
    ctx = _count_vector(doc_token_ids)
    ent = _count_vector(entity_text_tokens(kb, eid))
    dot = 0
    for t, ca in ent.items():
        cb = ctx.get(t, 0)
        exp = kb.expand_term(t)
        if exp:
            cb += ctx.get(exp, 0)
        dot += ca * cb
    return float(dot)


class DocMatcher:
    """Per-document cache of (mention, entity) keyphrase matches, shared
    by the main and coherence-robustness ensembles (4 scoring passes
    reuse 1 matching pass)."""

    def __init__(self, kb: KB, doc: PreparedDoc,
                 index: InvertedIndex | None = None,
                 max_kp: int = 0, min_kp_weight: float = 0.0):
        self.kb = kb
        # a prebuilt index (shipped in the sharded path's prepared
        # payload) saves one O(tokens) build per (doc, shard)
        self.index = index or InvertedIndex(doc.token_ids, kb.stop_ids)
        self.max_kp = max_kp
        self.min_kp_weight = min_kp_weight
        self._cache: dict[tuple[int, int], list[KeyphraseMatch]] = {}

    def matches(self, mention_idx: int, mention: Mention,
                eid: int) -> list[KeyphraseMatch]:
        key = (mention_idx, eid)
        got = self._cache.get(key)
        if got is None:
            got = match_keyphrases(self.kb, self.index, mention, eid,
                                   self.max_kp, self.min_kp_weight)
            self._cache[key] = got
        return got


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
                 settings: SimilaritySettings,
                 matcher: DocMatcher | None = None,
                 raw_scores: dict[str, dict[tuple[int, int], float]] | None = None):
        """``raw_scores`` (kind -> (mention_idx, eid) -> score) injects
        precomputed keyphrase scores — the merge point of the sharded
        scoring path (missing pairs default to 0.0, identical to an
        unmatched candidate)."""
        self.kb = kb
        self.settings = settings
        kinds = {k for k, _ in settings.mes_no_prior} | \
                {k for k, _ in settings.mes_with_prior}
        # raw[kind][(mention_idx, eid)] = score
        self.raw: dict[str, dict[tuple[int, int], float]] = {}
        self.minmax: dict[str, tuple[float, float]] = {}
        self.mention_index = {id(m): i for i, m in enumerate(mentions)}
        need_matcher = raw_scores is None and any(
            k not in TEXT_ME_KINDS for k in kinds)
        if raw_scores is None:
            if need_matcher:
                matcher = matcher or DocMatcher(
                    kb, doc,
                    max_kp=settings.max_entity_keyphrase_count,
                    min_kp_weight=settings.min_entity_keyphrase_weight)
                self.index = matcher.index
            doc_token_ids = doc.token_ids
        text_me_cache: dict[tuple[str, int], float] = {}
        for kind in kinds:
            scores: dict[tuple[int, int], float] = {}
            lo, hi = float("inf"), 0.0   # max starts at 0.0 (java `new double[]{MAX, 0.0}`)
            provided = raw_scores.get(kind, {}) if raw_scores is not None else None
            for mi_, m in enumerate(mentions):
                for eid, _prior in m.candidates:
                    if provided is not None:
                        s = provided.get((mi_, eid), 0.0)
                    elif kind in TEXT_ME_KINDS:
                        # text-vector measures depend on (kind, eid) only
                        ck = (kind, eid)
                        s = text_me_cache.get(ck)
                        if s is None:
                            fn = tfidf_cosine if kind == "tfidf_cosine" \
                                else wordcount_dot
                            s = fn(kb, doc_token_ids, eid)
                            text_me_cache[ck] = s
                    else:
                        s = score_matches(kb, eid, matcher.matches(mi_, m, eid), kind)
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

    def _importance(self, eid: int, kind: str) -> float:
        """C4: entity importance in [0,1] (importance/InlinkCountImportance
        — inlink count / collection size; rank-based = 1 - global rank)."""
        if kind == "inlink_count":
            return len(self.kb.inlinks.get(eid, ())) / self.kb.collection_size
        if kind == "rank":
            return 1.0 - self.kb.entity_rank.get(eid, 1.0)
        return 0.0

    def similarity(self, m: Mention, eid: int) -> float:
        st = self.settings
        use_prior = self._should_use_prior(m)
        mes = st.mes_with_prior if use_prior else st.mes_no_prior
        eis = st.eis_with_prior if use_prior else st.eis_no_prior
        mi_ = self.mention_index[id(m)]
        sim = 0.0
        for kind, weight in mes:
            lo, hi = self.minmax[kind]
            sim += _rescale(self.raw[kind][(mi_, eid)], lo, hi) * weight
        for kind, weight in eis:
            sim += self._importance(eid, kind) * weight
        if use_prior and st.prior_weight > 0.0:
            prior = m.priors.get(eid, 0.0)
            if st.prior_take_log:
                prior = log_damping(prior, st.prior_damping_factor)
            sim += prior * st.prior_weight
        return sim
