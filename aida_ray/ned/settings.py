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
    # Fast-settings keyphrase pruning (README.md:147-149,361-362):
    # keep top-N entity keyphrases by MI weight / drop below the floor.
    max_entity_keyphrase_count: int = 0        # 0 = unlimited
    min_entity_keyphrase_weight: float = 0.0


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
    language: str = "en"              # M2: tokenizer route (en | de |
                                      # anything else -> multilingual
                                      # fallback), TokenizerManager.java
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
    statistical_ner: object = None     # trained PerceptronNER (M7 ensemble
                                       # member; merged via hybrid rules)
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


# ------------------------------------------------------------ preset registry
# All 17 prebuilt configs a reference user can select (README.md:326-337,
# config/settings/disambiguation/*.java) by their Java class names.

# settings/similarity/conll/KeyphraseIDF.properties
KEYPHRASE_IDF = SimilaritySettings(
    mes_with_prior=(("idf", 1.0),),
    prior_weight=0.0,
)

_FAST_PRUNE = {"max_entity_keyphrase_count": 1000,
               "min_entity_keyphrase_weight": 0.001}


def _preset_cocktail(**kw) -> DisambiguationSettings:
    return cocktail_party_settings(**kw)


def _preset_cocktail_null(**kw) -> DisambiguationSettings:
    return cocktail_party_settings(
        compute_confidence=True, null_mapping_threshold=0.05, **kw)


def _preset_cocktail_jaccard(**kw) -> DisambiguationSettings:
    # CocktailPartyJaccardDisambiguationSettings: InlinkOverlap coherence
    return cocktail_party_settings(
        similarity=replace(SWITCHED_KP, ee_sims=(("inlink_overlap", 1.0),)),
        **kw)


def _preset_cocktail_kore(**kw) -> DisambiguationSettings:
    return cocktail_party_settings(
        similarity=replace(SWITCHED_KP, ee_sims=(("kore", 1.0),)), **kw)


def _preset_cocktail_kore_null(**kw) -> DisambiguationSettings:
    return _preset_cocktail_kore(
        compute_confidence=True, null_mapping_threshold=0.05, **kw)


def _preset_cocktail_kore_idf(**kw) -> DisambiguationSettings:
    # KeyphraseIDF similarity, KORE coherence, no coherence-robustness test
    return cocktail_party_settings(
        similarity=replace(KEYPHRASE_IDF, ee_sims=(("kore", 1.0),)),
        graph=replace(GraphSettings(), use_coherence_robustness_test=False),
        **kw)


def _preset_cocktail_kore_idf_null(**kw) -> DisambiguationSettings:
    return _preset_cocktail_kore_idf(
        compute_confidence=True, null_mapping_threshold=0.05, **kw)


def _preset_cocktail_heuristics_null(**kw) -> DisambiguationSettings:
    # CocktailPartyWithHeuristicsDisambiguationWithNullSettings.java
    return cocktail_party_settings(
        compute_confidence=True,
        null_mapping_threshold=0.075,
        graph=replace(GraphSettings(),
                      coh_robustness_threshold=1.15,
                      use_easy_mentions_test=True,
                      easy_mentions_test_threshold=5,
                      use_confidence_threshold_test=True,
                      confidence_test_threshold=0.9,
                      prune_candidate_entities=True,
                      prune_candidate_threshold=25),
        **kw)


def _preset_fast_cocktail(**kw) -> DisambiguationSettings:
    # FastCocktailPartyDisambiguationSettings: keyphrase pruning on the
    # main AND coherence-robustness similarities + candidate cap 20
    return cocktail_party_settings(
        similarity=replace(SWITCHED_KP, **_FAST_PRUNE),
        graph=replace(GraphSettings(), coherence_similarity=replace(
            SWITCHED_KP_COHROB, **_FAST_PRUNE)),
        max_candidates_per_mention_by_prior=20,
        **kw)


def _preset_fast_local(**kw) -> DisambiguationSettings:
    return local_settings(
        similarity=replace(SWITCHED_KP, **_FAST_PRUNE),
        max_candidates_per_mention_by_prior=20,
        **kw)


def _preset_fast_local_null(**kw) -> DisambiguationSettings:
    return _preset_fast_local(
        compute_confidence=True, null_mapping_threshold=0.2, **kw)


def _preset_local(**kw) -> DisambiguationSettings:
    return local_settings(**kw)


def _preset_local_null(**kw) -> DisambiguationSettings:
    return local_settings(
        compute_confidence=True, null_mapping_threshold=0.05, **kw)


def _preset_local_idf(**kw) -> DisambiguationSettings:
    return local_settings(similarity=KEYPHRASE_IDF, **kw)


def _preset_local_idf_null(**kw) -> DisambiguationSettings:
    return _preset_local_idf(
        compute_confidence=True, null_mapping_threshold=0.05, **kw)


def _preset_importance_only(**kw) -> DisambiguationSettings:
    # ImportanceOnlyDisambiguationSettings: LOCAL with AidaEntityImportance
    return local_settings(
        similarity=SimilaritySettings(eis_with_prior=(("rank", 0.5),)),
        **kw)


def _preset_prior_only(**kw) -> DisambiguationSettings:
    return prior_only_settings(**kw)


PRESETS: dict[str, object] = {
    "CocktailPartyDisambiguationSettings": _preset_cocktail,
    "CocktailPartyDisambiguationWithNullSettings": _preset_cocktail_null,
    "CocktailPartyJaccardDisambiguationSettings": _preset_cocktail_jaccard,
    "CocktailPartyKOREDisambiguationSettings": _preset_cocktail_kore,
    "CocktailPartyKOREDisambiguationWithNullSettings": _preset_cocktail_kore_null,
    "CocktailPartyKOREIDFDisambiguationSettings": _preset_cocktail_kore_idf,
    "CocktailPartyKOREIDFDisambiguationWithNullSettings": _preset_cocktail_kore_idf_null,
    "CocktailPartyWithHeuristicsDisambiguationWithNullSettings": _preset_cocktail_heuristics_null,
    "FastCocktailPartyDisambiguationSettings": _preset_fast_cocktail,
    "FastLocalKeyphraseBasedDisambiguationSettings": _preset_fast_local,
    "FastLocalKeyphraseBasedDisambiguationWithNullSettings": _preset_fast_local_null,
    "ImportanceOnlyDisambiguationSettings": _preset_importance_only,
    "LocalKeyphraseBasedDisambiguationSettings": _preset_local,
    "LocalKeyphraseBasedDisambiguationWithNullSettings": _preset_local_null,
    "LocalKeyphraseIDFBasedDisambiguationSettings": _preset_local_idf,
    "LocalKeyphraseIDFBasedDisambiguationWithNullSettings": _preset_local_idf_null,
    "PriorOnlyDisambiguationSettings": _preset_prior_only,
}


def preset(name: str, **kw) -> DisambiguationSettings:
    """Look up a prebuilt config by its reference class name."""
    try:
        return PRESETS[name](**kw)
    except KeyError:
        raise KeyError(
            f"unknown preset {name!r}; choose from {sorted(PRESETS)}") from None


# ---------------------------------------------------------- properties parser

# Java measure class name -> our ensemble kind
_ME_MEASURE_NAMES = {
    "UnnormalizedKeyphrasesBasedMISimilarity": "mi",
    "UnnormalizedKeyphrasesBasedIDFSimilarity": "idf",
    "NormalizedKeyphrasesBasedMISimilarity": "mi",
    "NormalizedKeyphrasesBasedIDFSimilarity": "idf",
    "TfIdfCosineSimilarityMeasure": "tfidf_cosine",
    "WordCountVectorDotProductSimilarityMeasure": "wordcount_dot",
}
_EE_MEASURE_NAMES = {
    "MilneWittenEntityEntitySimilarity": "milnewitten",
    "InlinkOverlapEntityEntitySimilarity": "inlink_overlap",
    "JaccardEntityEntitySimilarityMeasure": "jaccard_kp",
    "WeightedJaccardEntityEntitySimilarityMeasure": "weighted_jaccard",
    "NGDSimilarityMeasure": "ngd",
    "WeightedNGDSimilarityMeasure": "weighted_ngd",
    "KOREEntityEntitySimilarityMeasure": "kore",
    "KeywordCosineSimilarityMeasure": "keyword_cosine",
}
_EI_MEASURE_NAMES = {
    "InlinkCountImportance": "inlink_count",
    "AidaEntityImportance": "rank",
}


def similarity_settings_from_properties(text: str) -> SimilaritySettings:
    """Parse the reference's SimilaritySettings .properties format
    (SimilaritySettings.java; documented at README.md:356-374).

    ``mentionEntitySimilarities`` is a space-separated list of
    Measure:Context:weight triples; with ``priorThreshold`` set, the
    FIRST half applies below the threshold (no prior) and the SECOND
    half above it (with prior).  ``entityEntitySimilarity`` is
    Name:weight pairs.  Unknown measure class names raise — a user
    porting a properties file finds out immediately instead of silently
    losing a measure."""
    props: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, v = line.split("=", 1)
        props[k.strip()] = v.strip()

    def parse_me(v: str):
        out = []
        for triple in v.split():
            parts = triple.split(":")
            if len(parts) != 3:
                raise ValueError(f"bad mention-entity triple: {triple!r}")
            name, _context, weight = parts
            if name in _EI_MEASURE_NAMES:
                out.append(("EI", _EI_MEASURE_NAMES[name], float(weight)))
            elif name in _ME_MEASURE_NAMES:
                out.append(("ME", _ME_MEASURE_NAMES[name], float(weight)))
            else:
                raise ValueError(f"unknown mention-entity measure: {name}")
        return out

    mes = parse_me(props.get("mentionEntitySimilarities", ""))
    prior_threshold = float(props["priorThreshold"]) \
        if "priorThreshold" in props else -1.0
    if prior_threshold > 0.0:
        half = len(mes) // 2
        first, second = mes[:half], mes[half:]
    else:
        first, second = mes, mes
    ee = []
    for pair in props.get("entityEntitySimilarity", "").split():
        parts = pair.split(":")
        if len(parts) != 2:
            raise ValueError(f"bad entity-entity pair: {pair!r}")
        name, weight = parts
        if name not in _EE_MEASURE_NAMES:
            raise ValueError(f"unknown entity-entity measure: {name}")
        ee.append((_EE_MEASURE_NAMES[name], float(weight)))
    return SimilaritySettings(
        mes_no_prior=tuple((k, w) for t, k, w in first if t == "ME"),
        mes_with_prior=tuple((k, w) for t, k, w in second if t == "ME"),
        eis_no_prior=tuple((k, w) for t, k, w in first if t == "EI"),
        eis_with_prior=tuple((k, w) for t, k, w in second if t == "EI"),
        prior_weight=float(props.get("priorWeight", 0.0)),
        prior_threshold=prior_threshold,
        prior_take_log=props.get("priorTakeLog", "false").lower() == "true",
        prior_damping_factor=float(props.get("priorDampingFactor", 1.0)),
        ee_sims=tuple(ee),
    )
