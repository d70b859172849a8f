"""Per-document disambiguation graph construction.

References:
  - GraphGenerator.java:86-264 (local sims, pre-graph heuristics,
    coherence-robustness L1 test, candidate pruning)
  - ExtractGraph.java:46-346 (EE sim computation for entities of
    different mentions, min-max rescale of both edge families,
    average-matching scale, alpha weighting at edge insert)
  - Graph.java (node/edge storage, alpha applied in addEdge)

The graph lives entirely inside one ``map_batches`` UDF call — it is a
per-document numpy/dict structure, never a distributed graph.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from aida_ray.kb.kb import KB
from aida_ray.ned.coherence import ensemble_ee_similarity
from aida_ray.ned.doc import Mention, PreparedDoc
from aida_ray.ned.settings import DisambiguationSettings
from aida_ray.ned.similarity import EnsembleSimilarity


class MaximumGraphSizeExceeded(Exception):
    """GraphGenerator.java:40-44 — candidate count above the hard cap."""


@dataclass
class DocGraph:
    alpha: float
    # node layout: mentions first (graph order), then entities.
    mention_nodes: dict[int, int] = field(default_factory=dict)   # mention idx -> node
    entity_nodes: dict[int, int] = field(default_factory=dict)    # entity id -> node
    node_data: list = field(default_factory=list)                 # mention idx | entity id
    node_is_mention: list[bool] = field(default_factory=list)
    succ: list[dict[int, float]] = field(default_factory=list)
    removed: list[bool] = field(default_factory=list)
    avg_me: float = 1.0
    avg_ee: float = 1.0
    # local similarities per mention idx (kept even when edges are dropped)
    local_sims: dict[int, dict[int, float]] = field(default_factory=dict)

    def add_mention_node(self, mention_idx: int) -> int:
        nid = len(self.node_data)
        self.mention_nodes[mention_idx] = nid
        self.node_data.append(mention_idx)
        self.node_is_mention.append(True)
        self.succ.append({})
        self.removed.append(False)
        return nid

    def add_entity_node(self, eid: int) -> int:
        nid = len(self.node_data)
        self.entity_nodes[eid] = nid
        self.node_data.append(eid)
        self.node_is_mention.append(False)
        self.succ.append({})
        self.removed.append(False)
        return nid

    def add_edge_nodes(self, n1: int, n2: int, weight: float) -> None:
        """Alpha weighting applied here (Graph.addEdgeUsingNodeId:173-193)."""
        if not self.node_is_mention[n1] and not self.node_is_mention[n2]:
            weight *= (1.0 - self.alpha)
        elif self.node_is_mention[n1] != self.node_is_mention[n2]:
            weight *= self.alpha
        self.succ[n1][n2] = weight
        self.succ[n2][n1] = weight

    @property
    def n_nodes(self) -> int:
        return len(self.node_data)

    def outdegree(self, nid: int) -> int:
        return len(self.succ[nid])

    def weighted_degree(self, nid: int) -> float:
        return sum(self.succ[nid].values())

    def is_local_mention(self, nid: int) -> bool:
        """No candidate of this mention has an entity-entity edge (Graph.java:254-263)."""
        for cand in self.succ[nid]:
            for neighbor in self.succ[cand]:
                if not self.node_is_mention[neighbor]:
                    return False
        return True

    def subgraph_without(self, nodes_to_remove: set[int]) -> "DocGraph":
        """createGraphByRemovingNodes (CocktailParty.java:504-582)."""
        if not nodes_to_remove:
            return self
        g = DocGraph(alpha=self.alpha, avg_me=self.avg_me, avg_ee=self.avg_ee,
                     local_sims=self.local_sims)
        for m_idx, nid in self.mention_nodes.items():
            if nid not in nodes_to_remove:
                g.add_mention_node(m_idx)
        for eid, nid in self.entity_nodes.items():
            if nid not in nodes_to_remove:
                g.add_entity_node(eid)
        for m_idx, nid in self.mention_nodes.items():
            if nid in nodes_to_remove:
                continue
            for cand, w in self.succ[nid].items():
                if cand in nodes_to_remove or self.node_is_mention[cand]:
                    continue
                # weight already alpha-scaled; insert raw to avoid double scaling
                n1 = g.mention_nodes[m_idx]
                n2 = g.entity_nodes[self.node_data[cand]]
                g.succ[n1][n2] = w
                g.succ[n2][n1] = w
        for eid, nid in self.entity_nodes.items():
            if nid in nodes_to_remove:
                continue
            for nb, w in self.succ[nid].items():
                if nb in nodes_to_remove or self.node_is_mention[nb]:
                    continue
                n1 = g.entity_nodes[eid]
                n2 = g.entity_nodes[self.node_data[nb]]
                g.succ[n1][n2] = w
                g.succ[n2][n1] = w
        return g


def _best_candidate(m: Mention, sims: dict[int, float]) -> int:
    best, best_sim = None, float("-inf")
    for eid, _ in m.candidates:
        s = sims.get(eid, 0.0)
        if s > best_sim:
            best_sim = s
            best = eid
    return best


def _normalize_to_sum(d: dict[int, float]) -> dict[int, float]:
    """CollectionUtils.normalizeValuesToSum (total==0 -> unchanged)."""
    total = sum(d.values())
    if total == 0:
        return d
    return {k: v / total for k, v in d.items()}


def build_graph(kb: KB, doc: PreparedDoc, mentions: list[Mention],
                settings: DisambiguationSettings,
                raw_scores: dict | None = None) -> DocGraph:
    """GraphGenerator.generateGraph + ExtractGraph.generateGraph.

    ``raw_scores`` (see EnsembleSimilarity) bypasses local keyphrase
    matching — used when scores were computed by sharded scorer actors."""
    gs = settings.graph
    all_entities: list[int] = []
    seen: set[int] = set()
    for m in mentions:
        for eid, _ in m.candidates:
            if eid not in seen:
                seen.add(eid)
                all_entities.append(eid)
    if settings.max_candidates_for_graph and \
            len(all_entities) > settings.max_candidates_for_graph:
        raise MaximumGraphSizeExceeded(str(len(all_entities)))

    # One matching pass shared by the coherence-robustness and main
    # ensembles (weights differ, matches don't) — ONLY valid while both
    # declare the same keyphrase pruning; otherwise each gets its own
    # matcher (the match sets differ under different pruning).
    matcher = None
    cohrob_matcher = None
    if raw_scores is None:
        from aida_ray.ned.similarity import DocMatcher
        main_prune = (settings.similarity.max_entity_keyphrase_count,
                      settings.similarity.min_entity_keyphrase_weight)
        matcher = DocMatcher(kb, doc, max_kp=main_prune[0],
                             min_kp_weight=main_prune[1])
        cohrob_matcher = matcher
        cs = gs.coherence_similarity
        if (cs.max_entity_keyphrase_count,
                cs.min_entity_keyphrase_weight) != main_prune:
            cohrob_matcher = DocMatcher(
                kb, doc, index=matcher.index,
                max_kp=cs.max_entity_keyphrase_count,
                min_kp_weight=cs.min_entity_keyphrase_weight)

    # Coherence-robustness L1 distances (GraphGenerator.java:354-388).
    mention_l1: dict[int, float] = {}
    if gs.use_coherence_robustness_test:
        cohrob = EnsembleSimilarity(kb, doc, mentions, gs.coherence_similarity,
                                    cohrob_matcher, raw_scores)
        for i, m in enumerate(mentions):
            priors = {eid: m.priors.get(eid, 0.0) for eid, _ in m.candidates}
            sims = _normalize_to_sum(
                {eid: cohrob.similarity(m, eid) for eid, _ in m.candidates})
            mention_l1[i] = sum(abs(p - sims.get(eid, 0.0))
                                for eid, p in priors.items())

    main = EnsembleSimilarity(kb, doc, mentions, settings.similarity, matcher,
                              raw_scores)

    local_sims: dict[int, dict[int, float]] = {}
    final_candidates: dict[int, list[int]] = {}
    graph_entities: list[int] = []
    gseen: set[int] = set()

    def add_graph_entity(eid: int) -> None:
        if eid not in gseen:
            gseen.add(eid)
            graph_entities.append(eid)

    for i, m in enumerate(mentions):
        sims = {eid: main.similarity(m, eid) for eid, _ in m.candidates}
        local_sims[i] = sims
        normalized = _normalize_to_sum(dict(sims))

        best = None
        if gs.pre_coherence_null_mapping and sims:
            if max(normalized.values(), default=0.0) < gs.pre_coherence_null_threshold:
                best = -1  # null entity
        if best is None and len(m.candidates) > 1:
            if gs.use_confidence_threshold_test and \
                    max(normalized.values(), default=0.0) > gs.confidence_test_threshold:
                best = _best_candidate(m, sims)
            if best is None and gs.use_easy_mentions_test and \
                    len(m.candidates) < gs.easy_mentions_test_threshold:
                best = _best_candidate(m, sims)
            if best is None and gs.use_coherence_robustness_test and \
                    mention_l1.get(i, 2.0) < gs.coh_robustness_threshold:
                best = _best_candidate(m, sims)
        if best is not None and best != -1:
            final_candidates[i] = [best]
            add_graph_entity(best)
        elif best == -1:
            final_candidates[i] = []
        else:
            cands = [eid for eid, _ in m.candidates]
            if gs.prune_candidate_entities and \
                    len(cands) > gs.prune_candidate_threshold:
                cands = sorted(cands, key=lambda e: -sims.get(e, 0.0)
                               )[:gs.prune_candidate_threshold]
            final_candidates[i] = cands
            for eid in cands:
                add_graph_entity(eid)

    # --- ExtractGraph ---------------------------------------------------
    # EE sims only between entities with differing mention sets
    # (ParallelEntityEntityRelatednessComputationThread.shouldCalculate:81-104),
    # pairs ordered by KB name.
    entity_mentions: dict[int, frozenset[int]] = {}
    for i, cands in final_candidates.items():
        for eid in cands:
            entity_mentions[eid] = entity_mentions.get(eid, frozenset()) | {i}
    by_name = sorted(graph_entities, key=lambda e: kb.id2entity.get(e, str(e)))
    ee_sims: dict[tuple[int, int], float] = {}
    for ai in range(len(by_name)):
        for bi in range(ai + 1, len(by_name)):
            a, b = by_name[ai], by_name[bi]
            if entity_mentions.get(a) == entity_mentions.get(b):
                continue
            s = ensemble_ee_similarity(kb, a, b, settings.similarity.ee_sims)
            ee_sims[(a, b)] = max(0.0, s)

    me_weights = {(i, eid): local_sims[i].get(eid, 0.0)
                  for i, cands in final_candidates.items() for eid in cands}

    def rescale_inplace(d: dict, skip_if_total_zero: bool) -> None:
        if len(d) <= 1:
            return
        vals = list(d.values())
        lo, hi = min(vals), max(vals)
        if lo == hi:
            return
        if skip_if_total_zero and sum(vals) == 0.0:
            return
        for k in d:
            d[k] = (d[k] - lo) / (hi - lo)

    rescale_inplace(me_weights, skip_if_total_zero=True)
    rescale_inplace(ee_sims, skip_if_total_zero=False)

    if ee_sims:
        pos_me = [v for v in me_weights.values() if v > 0.0]
        pos_ee = [v for v in ee_sims.values() if v > 0.0]
        avg_me = sum(pos_me) / len(pos_me) if pos_me else 0.0
        avg_ee = sum(pos_ee) / len(pos_ee) if pos_ee else 0.0
        if avg_me > 0.0 and avg_ee > 0.0:
            factor = avg_me / avg_ee
            if factor > 1.0:
                for k in me_weights:
                    me_weights[k] *= 1.0 / factor
            else:
                for k in ee_sims:
                    ee_sims[k] *= factor

    pos_me = [v for v in me_weights.values() if v > 0.0]
    avg_me = sum(pos_me) / len(pos_me) if pos_me else 0.0
    avg_ee = 0.0
    if ee_sims:
        pos_ee = [v for v in ee_sims.values() if v > 0.0]
        avg_ee = sum(pos_ee) / len(pos_ee) if pos_ee else 0.0

    g = DocGraph(alpha=gs.alpha, local_sims=local_sims)
    for i in range(len(mentions)):
        g.add_mention_node(i)
    for eid in graph_entities:
        g.add_entity_node(eid)
    for (i, eid), w in me_weights.items():
        g.add_edge_nodes(g.mention_nodes[i], g.entity_nodes[eid], w)
    for (a, b), s in ee_sims.items():
        if s > 0.0:
            g.add_edge_nodes(g.entity_nodes[a], g.entity_nodes[b], s)
    g.avg_me = avg_me
    g.avg_ee = avg_ee
    return g
