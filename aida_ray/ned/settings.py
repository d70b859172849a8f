"""Configuration dataclasses mirroring the reference's settings objects.

References:
  - SimilaritySettings (graph/similarity/util/SimilaritySettings.java,
    properties format reference README.md:356-374)
  - GraphSettings (config/settings/GraphSettings.java)
  - DisambiguationSettings (config/settings/DisambiguationSettings.java)
  - Preconfigured: CocktailPartyDisambiguationSettings /
    LocalKeyphraseBasedDisambiguationSettings / PriorOnly
    (config/settings/disambiguation/*.java); weights from
    settings/similarity/conll/SwitchedKP.properties.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class SimilaritySettings:
    # (measure kind, weight); kind in {"mi", "idf"}.
    mes_no_prior: tuple[tuple[str, float], ...] = ()
    mes_with_prior: tuple[tuple[str, float], ...] = ()
    prior_weight: float = 0.0
    prior_threshold: float = -1.0     # > 0 enables the prior switch
    prior_take_log: bool = False
    prior_damping_factor: float = 1.0
    # (coherence kind, weight); kind in {"milnewitten", "inlink_overlap",
    # "jaccard", "kore", "keyword_cosine"}.
    ee_sims: tuple[tuple[str, float], ...] = ()
    # C4 entity importances (kind, weight); kind in {"inlink_count", "rank"}
    # — added LINEAR_COMBINATION-style (EnsembleMESim.java:190-201).
    eis_no_prior: tuple[tuple[str, float], ...] = ()
    eis_with_prior: tuple[tuple[str, float], ...] = ()


# settings/similarity/conll/SwitchedKP.properties
SWITCHED_KP = SimilaritySettings(
    mes_no_prior=(("mi", 0.58132103337), ("idf", 0.41867896662)),
    mes_with_prior=(("mi", 0.10123683065), ("idf", 0.33359024871)),
    prior_weight=0.56517292063,
    prior_threshold=0.9,
    ee_sims=(("milnewitten", 1.0),),
)

# settings/similarity/conll/SwitchedKP_cohrob.properties
SWITCHED_KP_COHROB = SimilaritySettings(
    mes_with_prior=(("mi", 0.8360808680254525), ("idf", 0.16391913197454755)),
    prior_weight=0.0,
    prior_threshold=0.0,
)


@dataclass(frozen=True)
class GraphSettings:
    alpha: float = 0.6
    use_exhaustive_search: bool = True
    use_normalized_objective: bool = True
    entities_per_mention_constraint: int = 5
    use_coherence_robustness_test: bool = True
    coh_robustness_threshold: float = 0.9
    use_easy_mentions_test: bool = False
    easy_mentions_test_threshold: int = 2**31 - 1
    use_confidence_threshold_test: bool = False
    confidence_test_threshold: float = 1.0
    prune_candidate_entities: bool = False
    prune_candidate_threshold: int = 2**31 - 1
    pre_coherence_null_mapping: bool = False
    pre_coherence_null_threshold: float = 1.0
    coherence_similarity: SimilaritySettings = SWITCHED_KP_COHROB


@dataclass(frozen=True)
class DisambiguationSettings:
    technique: str = "graph"          # "local" | "prior" | "graph"
    algorithm: str = "cocktail_party_size_constrained"  # or "cocktail_party" | "simple_greedy"
    similarity: SimilaritySettings = SWITCHED_KP
    graph: GraphSettings = GraphSettings()
    max_entity_rank: float = 1.0
    max_candidates_per_mention_by_prior: int = 0
    null_mapping_threshold: float = -1.0
    compute_confidence: bool = False
    person_merge: bool = False
    min_mention_occurrence: int = 1
    mention_detection: str = "hybrid"  # "manual" | "automatic" | "hybrid"
    detect_ood_mentions: bool = False  # capitalized-run tagger for surfaces
                                       # outside the dictionary (-> OOKBE)
    chunker: str = "single"            # "single" | "fixed" | "paragraph" (M12)
    sentences_per_chunk: int = 5
    fuzzy_lookup: bool = False         # J2: LSH fallback when no exact hit
    fuzzy_min_similarity: float = 0.7
    type_filter: tuple[str, ...] = ()  # J4: keep candidates with >=1 type
    # C12 confidence estimation (config/settings/ConfidenceSettings.java)
    confidence_balance: float = 1.0    # local vs coherence mix
    mention_flip_percentage: float = 0.66
    iterations_per_mention: int = 1000
    confidence_score_type: str = "weighted_degree"  # or "local"
    max_candidates_for_graph: int = 0  # 0 = unlimited (GraphGenerator.java:59-77)
    hill_climbing_max_exhaustive: int = 1000
    hill_climbing_seed: int = 1337     # GreedyHillClimbing.java Random(1337)


def cocktail_party_settings(**kw) -> DisambiguationSettings:
    """CocktailPartyDisambiguationSettings.java defaults."""
    return replace(DisambiguationSettings(), **kw)


def local_settings(**kw) -> DisambiguationSettings:
    """LocalKeyphraseBasedDisambiguationSettings.java."""
    return replace(DisambiguationSettings(technique="local"), **kw)


def prior_only_settings(**kw) -> DisambiguationSettings:
    """PriorOnlyDisambiguationSettings.java: rank candidates by prior alone."""
    return replace(DisambiguationSettings(technique="prior"), **kw)
