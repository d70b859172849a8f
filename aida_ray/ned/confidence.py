"""Graph-perturbation confidence estimation (SURVEY C12).

Reference: graph/algorithms/GraphConfidenceEstimator.java:38-618.
  - local confidences: normalized scores per mention (LOCAL type uses the
    original local sims incl. candidates dropped from the graph;
    WEIGHTED_DEGREE uses configuration-dependent weighted degrees when
    the mention kept >1 graph candidates);
  - coherence confidences: random mention flips (seeded Random(1337),
    <= 10000 iterations), counting how often each entity stays the best
    weighted-degree choice;
  - final = balance·local + (1-balance)·coherence; balance >= 1 skips
    the sampling entirely.
"""

from __future__ import annotations

import math

from aida_ray.ned.cocktail import JavaRandom
from aida_ray.ned.graph import DocGraph
from aida_ray.ned.settings import DisambiguationSettings

MAX_ITERATIONS = 10000
OUT_OF_DICTIONARY_CONFIDENCE = 1.0
SINGLE_CANDIDATE_CONFIDENCE = 1.0


def _normalize(scores: dict[int, float]) -> dict[int, float]:
    total = sum(scores.values())
    if total == 0:
        return dict(scores)
    return {k: v / total for k, v in scores.items()}


def _local_scores(g: DocGraph, mn: int) -> dict[int, float]:
    """All ORIGINAL local sims for the mention; candidates no longer in
    the graph get fresh negative ids (kept only for normalization)."""
    m_idx = g.node_data[mn]
    sims = g.local_sims.get(m_idx)
    if sims is None:
        return {}
    out: dict[int, float] = {}
    neg = -1
    for eid, s in sims.items():
        node = g.entity_nodes.get(eid)
        if node is None:
            out[neg] = s
            neg -= 1
        else:
            out[node] = s
    return out


def _weighted_degree(g: DocGraph, present: set[int], en: int) -> float:
    return sum(w for nid, w in g.succ[en].items() if nid in present)


def estimate_confidence(g: DocGraph, mapping: dict[int, int],
                        settings: DisambiguationSettings
                        ) -> dict[int, dict[int, float]]:
    """mention-node -> entity-node -> confidence."""
    solution = dict(mapping)
    present = set()
    for mn, en in solution.items():
        present.add(mn)
        present.add(en)
    local_conf: dict[int, dict[int, float]] = {}
    for mn in list(g.mention_nodes.values()):
        if settings.confidence_score_type == "local":
            scores = _local_scores(g, mn)
        else:
            succ = g.succ[mn]
            if len(succ) > 1:
                scores = {en: _weighted_degree(g, present, en) for en in succ}
            else:
                scores = _local_scores(g, mn)
        if g.is_local_mention(mn):
            if not scores:
                norm = {-1: OUT_OF_DICTIONARY_CONFIDENCE}
            elif len(scores) == 1:
                norm = {next(iter(scores)): SINGLE_CANDIDATE_CONFIDENCE}
            else:
                norm = _normalize(scores)
            solution.pop(mn, None)
        else:
            norm = _normalize(scores)
        local_conf[mn] = {k: v for k, v in norm.items() if k >= 0}

    balance = settings.confidence_balance
    if balance >= 1.0 or not solution:
        return local_conf

    # ---- coherence sampling ------------------------------------------
    rng = JavaRandom(1337)
    counts: dict[int, dict[int, int]] = {}
    total_iters = min(settings.iterations_per_mention * len(solution),
                      MAX_ITERATIONS)
    flip_candidates = sorted(mn for mn in solution if len(g.succ[mn]) > 1)
    for _ in range(total_iters):
        # random configuration: flip 1..~flip% of mentions to an
        # alternative candidate drawn by normalized edge weight
        mention_size = max(1, round(len(solution) *
                                    settings.mention_flip_percentage))
        num_flips = max(1, rng.next_int(mention_size)) if mention_size > 0 else 1
        source = list(flip_candidates)
        flipped: set[int] = set()
        for _f in range(num_flips):
            if not source:
                break
            pos = rng.next_int(len(source))
            flipped.add(source.pop(pos))
        conf_map = dict(solution)
        for mn in flipped:
            cands = {en: w for en, w in g.succ[mn].items()
                     if not g.node_is_mention[en] and en != solution.get(mn)}
            chosen = -1
            if cands:
                probs = _normalize(cands)
                r = rng.next_int(2 ** 30) / 2 ** 30
                acc = 0.0
                chosen = next(iter(probs))
                for en, p in sorted(probs.items()):
                    acc += p
                    if r < acc:
                        chosen = en
                        break
            conf_map[mn] = chosen
        conf_present = set()
        for mn, en in conf_map.items():
            conf_present.add(mn)
            conf_present.add(en)
        # best candidate per non-flipped mention by weighted degree
        wd_cache: dict[int, float] = {}
        for mn in conf_map:
            if mn in flipped:
                continue
            best_wd = -math.inf
            for en in g.succ[mn]:
                wd = wd_cache.get(en)
                if wd is None:
                    wd = _weighted_degree(g, conf_present, en)
                    wd_cache[en] = wd
                if wd > best_wd:
                    best_wd = wd
            ties = sorted(en for en in g.succ[mn] if wd_cache[en] == best_wd)
            if not ties:
                continue
            pick = ties[rng.next_int(len(ties))] if len(ties) > 1 else ties[0]
            counts.setdefault(mn, {})[pick] = counts.setdefault(mn, {}).get(pick, 0) + 1

    coherence_conf: dict[int, dict[int, float]] = {}
    for mn in solution:
        entity_conf = {en: 0.0 for en in g.succ[mn]}
        c = counts.get(mn, {})
        total = sum(c.values())
        if len(entity_conf) == 1:
            entity_conf[next(iter(entity_conf))] = SINGLE_CANDIDATE_CONFIDENCE
        elif total:
            for en, n in c.items():
                entity_conf[en] = n / total
        coherence_conf[mn] = entity_conf

    merged: dict[int, dict[int, float]] = {}
    for mn, lc in local_conf.items():
        cc = coherence_conf.get(mn)
        if cc is None:
            merged[mn] = lc
            continue
        merged[mn] = {en: balance * lc.get(en, 0.0) + (1 - balance) * cc.get(en, 0.0)
                      for en in set(lc) | set(cc)}
    return merged
