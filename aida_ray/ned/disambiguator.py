"""Per-document disambiguation driver.

Mirrors Disambiguator/ChunkDisambiguator
(src/mpi/aida/Disambiguator.java:89-168,
src/mpi/aida/ChunkDisambiguator.java:62-168): candidate lookup →
technique dispatch (PRIOR / LOCAL / GRAPH) → person merge → null
threshold.  Cross-chunk reconciliation follows
resultreconciliation/ResultsReconciler.java:82-130.

This module is pure Python — it is the kernel executed inside the Ray
actor-pool ``map_batches`` stage (aida_ray.pipelines.kg).
"""

from __future__ import annotations

from dataclasses import dataclass

from aida_ray.kb.kb import KB, OOKBE
from aida_ray.ned.cocktail import cocktail_party
from aida_ray.ned.doc import Mention, PreparedDoc, prepare
from aida_ray.ned.graph import MaximumGraphSizeExceeded, build_graph
from aida_ray.ned.settings import DisambiguationSettings
from aida_ray.ned.similarity import EnsembleSimilarity
from aida_ray.text.tokenizer import conflate_token


@dataclass
class ResultMention:
    mention: str
    char_offset: int
    char_length: int
    entity: str            # KB entity name or --OOKBE--
    score: float
    sentence: int = -1


def prepare_document(doc_id: str, text: str, kb: KB,
                     settings: DisambiguationSettings,
                     injected_manual=None) -> PreparedDoc:
    doc = prepare(doc_id, text, kb, detection=settings.mention_detection,
                  min_mention_occurrence=settings.min_mention_occurrence,
                  injected_manual=injected_manual,
                  detect_ood=settings.detect_ood_mentions,
                  statistical_ner=settings.statistical_ner,
                  language=settings.language)
    fill_candidates(doc.mentions, kb, settings)
    return doc


def fill_candidates(mentions: list[Mention], kb: KB,
                    settings: DisambiguationSettings) -> None:
    """EntityLookupManager.fillInCandidateEntities (EntityLookup.java:85-156);
    fuzzy LSH fallback when enabled (EntityLookup.java:159-233)."""
    fuzzy = None
    if settings.fuzzy_lookup:
        fuzzy = getattr(kb, "_fuzzy_index", None)
        if fuzzy is None:
            from aida_ray.ned.external import FuzzyLookup
            fuzzy = FuzzyLookup(kb)
            kb._fuzzy_index = fuzzy  # built once per process (A7 state)
    type_filter = frozenset(settings.type_filter) or None
    for m in mentions:
        conflated = conflate_token(m.normalized())
        m.candidates = kb.candidates(
            conflated, settings.max_entity_rank,
            settings.max_candidates_per_mention_by_prior,
            type_filter)
        m.priors = kb.priors(conflated)
        if not m.candidates and fuzzy is not None:
            m.candidates = fuzzy.lookup(m.normalized(),
                                        settings.fuzzy_min_similarity)
            m.priors = dict(m.candidates)


def _local_disambiguate(kb: KB, doc: PreparedDoc, settings: DisambiguationSettings
                        ) -> list[ResultMention]:
    """LocalDisambiguation.java:62-136."""
    ens = EnsembleSimilarity(kb, doc, doc.mentions, settings.similarity)
    results = []
    for m in doc.mentions:
        scores = {eid: ens.similarity(m, eid) for eid, _ in m.candidates}
        if settings.compute_confidence and scores:
            total = sum(scores.values())
            if total != 0:
                scores = {e: s / total for e, s in scores.items()}
        if not scores:
            score = 0.95 if settings.compute_confidence else 0.0
            results.append(ResultMention(m.mention, m.char_offset, m.char_length,
                                         OOKBE, score, m.sentence))
            continue
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kb.id2entity[kv[0]]))
        best, score = ranked[0]
        if len(scores) == 1 and settings.compute_confidence:
            score = 0.95
        results.append(ResultMention(m.mention, m.char_offset, m.char_length,
                                     kb.id2entity[best], score, m.sentence))
    return results


def _prior_disambiguate(kb: KB, doc: PreparedDoc, settings: DisambiguationSettings
                        ) -> list[ResultMention]:
    """PriorOnlyDisambiguationSettings semantics: rank by prior alone."""
    results = []
    for m in doc.mentions:
        if not m.candidates:
            results.append(ResultMention(m.mention, m.char_offset, m.char_length,
                                         OOKBE, 0.0, m.sentence))
            continue
        best, prior = max(m.candidates,
                          key=lambda ep: (ep[1], kb.id2entity[ep[0]]))
        results.append(ResultMention(m.mention, m.char_offset, m.char_length,
                                     kb.id2entity[best], prior, m.sentence))
    return results


def _graph_disambiguate(kb: KB, doc: PreparedDoc, settings: DisambiguationSettings,
                        seed: int, raw_scores: dict | None = None
                        ) -> list[ResultMention]:
    g = build_graph(kb, doc, doc.mentions, settings, raw_scores)
    size_constrained = settings.algorithm == "cocktail_party_size_constrained"
    skip_pruning = settings.algorithm == "simple_greedy"
    sol = cocktail_party(g, settings, size_constrained, seed,
                         skip_initial_pruning=skip_pruning)
    results = []
    for i, m in enumerate(doc.mentions):
        eid, score = sol.get(i, (-1, 0.0))
        name = kb.id2entity[eid] if eid != -1 else OOKBE
        results.append(ResultMention(m.mention, m.char_offset, m.char_length,
                                     name, score, m.sentence))
    return results


def person_merge(results: list[ResultMention]) -> None:
    """PersonMerger.java:31-51: mentions token-contained in a longer mention
    inherit the longer mention's entity."""
    order = sorted(range(len(results)), key=lambda i: results[i].char_length)
    token_sets = [set(results[i].mention.split(" ")) for i in order]
    for a in range(len(order)):
        for b in range(len(order) - 1, a, -1):
            if token_sets[b] >= token_sets[a]:
                ra, rb = results[order[a]], results[order[b]]
                if ra.entity != rb.entity:
                    ra.entity = rb.entity
                    ra.score = rb.score
                break


def disambiguate_document(doc_id: str, text: str, kb: KB,
                          settings: DisambiguationSettings | None = None,
                          seed: int | None = None,
                          external: tuple[dict, dict] | None = None
                          ) -> list[ResultMention]:
    """Run the configured technique over one document. Deterministic for a
    given (doc_id, text, settings) — the hill-climbing seed defaults to the
    settings seed so Ray task retries reproduce identical output.

    Multi-chunk documents (settings.chunker != "single") are split, each
    chunk disambiguated independently (the reference's chunk thread pool,
    Disambiguator.java:110-128) and merged by surface-form score
    aggregation (ResultsReconciler semantics)."""
    settings = settings or DisambiguationSettings()
    seed = settings.hill_climbing_seed if seed is None else seed
    if external is not None:
        # J5: user-supplied dictionary + keyphrases merged into a
        # per-call KB view (ExternalEntitiesContext semantics)
        from aida_ray.ned.external import kb_with_external
        kb = kb_with_external(kb, external[0], external[1] if len(external) > 1 else {})
    if settings.chunker != "single":
        from dataclasses import replace

        from aida_ray.ned.chunking import CHUNKERS
        from aida_ray.ned.doc import manual_filter
        # strip markup ONCE so chunk offsets live in cleaned-text
        # coordinates; manual mentions are re-injected per chunk
        cleaned, manual = manual_filter(text)
        chunks = CHUNKERS[settings.chunker](
            cleaned, sentences_per_chunk=settings.sentences_per_chunk)
        if len(chunks) > 1:
            sub = replace(settings, chunker="single")
            per_chunk = []
            for i, (chunk_text, offset) in enumerate(chunks):
                inj = []
                for m in manual:
                    if offset <= m.char_offset and \
                            m.char_offset + m.char_length <= offset + len(chunk_text):
                        from aida_ray.ned.doc import Mention
                        inj.append(Mention(m.mention, m.char_offset - offset,
                                           m.char_length, manual=True))
                rs = _disambiguate_single(f"{doc_id}_{i}", chunk_text, kb,
                                          sub, seed, inj)
                for r in rs:
                    r.char_offset += offset
                per_chunk.append(rs)
            return reconcile_chunks(per_chunk)
        text = cleaned  # single chunk: markup already stripped
    return _disambiguate_single(doc_id, text, kb, settings, seed)


def _disambiguate_single(doc_id: str, text: str, kb: KB,
                         settings: DisambiguationSettings, seed: int,
                         injected_manual=None,
                         raw_scores: dict | None = None) -> list[ResultMention]:
    doc = prepare_document(doc_id, text, kb, settings, injected_manual)
    return solve_prepared(doc, kb, settings, seed, raw_scores)


def solve_prepared(doc, kb: KB, settings: DisambiguationSettings, seed: int,
                   raw_scores: dict | None = None) -> list[ResultMention]:
    """Technique dispatch + post-processing over an already-prepared doc.

    The sharded path (aida_ray.pipelines.sharded) prepares each document
    exactly once in the router and ships the prepared form — this entry
    point lets the merge stage solve without re-tokenizing."""
    if settings.technique == "prior":
        results = _prior_disambiguate(kb, doc, settings)
    elif settings.technique == "local":
        results = _local_disambiguate(kb, doc, settings)
    else:
        try:
            results = _graph_disambiguate(kb, doc, settings, seed, raw_scores)
        except MaximumGraphSizeExceeded:
            # Too many candidates for joint coherence — degrade to LOCAL
            # (the reference aborts the document, GraphGenerator.java:100-103;
            # at web scale we degrade instead of dropping the page).
            results = _local_disambiguate(kb, doc, settings)
    if settings.person_merge:
        person_merge(results)
    if settings.null_mapping_threshold >= 0.0:
        for r in results:
            if r.score < settings.null_mapping_threshold:
                r.entity = OOKBE
                r.score = 0.0
    results.sort(key=lambda r: (r.char_offset, r.char_length))
    return results


def reconcile_chunks(chunk_results: list[list[ResultMention]]) -> list[ResultMention]:
    """Cross-chunk reconciliation (ResultsReconciler.java:82-130): group by
    surface form, sum scores per entity, re-rank every mention by the
    aggregated score."""
    if len(chunk_results) <= 1:
        return chunk_results[0] if chunk_results else []
    agg: dict[str, dict[str, float]] = {}
    for chunk in chunk_results:
        for r in chunk:
            agg.setdefault(r.mention, {})
            agg[r.mention][r.entity] = agg[r.mention].get(r.entity, 0.0) + r.score
    out: list[ResultMention] = []
    for chunk in chunk_results:
        for r in chunk:
            scores = agg[r.mention]
            best = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            out.append(ResultMention(r.mention, r.char_offset, r.char_length,
                                     best[0], best[1], r.sentence))
    out.sort(key=lambda r: (r.char_offset, r.char_length))
    return out
