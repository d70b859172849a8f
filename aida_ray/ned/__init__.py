from aida_ray.ned.settings import (  # noqa: F401
    SimilaritySettings, GraphSettings, DisambiguationSettings,
    SWITCHED_KP, SWITCHED_KP_COHROB,
    cocktail_party_settings, local_settings, prior_only_settings,
)
from aida_ray.ned.disambiguator import disambiguate_document, prepare_document  # noqa: F401
