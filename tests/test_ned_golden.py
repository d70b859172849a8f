"""End-to-end golden disambiguation tests.

Ports of test/mpi/aida/DisambiguatorTest.java:46-157 and
test/mpi/aida/graph/algorithms/CocktailPartyTest.java:38-92 against the
fixture KB — same sentence, same expected decisions and (CocktailParty)
scores to 1e-5.
"""

import pytest

from aida_ray.kb.kb import OOKBE
from aida_ray.ned.disambiguator import disambiguate_document
from aida_ray.ned.settings import (cocktail_party_settings, local_settings,
                                   prior_only_settings)

TEXT = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."


def _mapping(results):
    return {r.mention: r for r in results}


def test_page_kashmir_graph(fixture_kb):
    """DisambiguatorTest.testPageKashmir (size-constrained cocktail party)."""
    res = _mapping(disambiguate_document("d1", TEXT, fixture_kb,
                                         cocktail_party_settings()))
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Kashmir"].entity == "Kashmir_(song)"
    assert res["Knebworth"].entity == "Knebworth_Festival"
    assert res["Les Paul"].entity == OOKBE


def test_cocktail_party_golden_scores(fixture_kb):
    """CocktailPartyTest.testCocktailParty — scores asserted to 1e-5."""
    res = _mapping(disambiguate_document(
        "d1", TEXT, fixture_kb, cocktail_party_settings(algorithm="cocktail_party")))
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Page"].score == pytest.approx(0.89470, abs=1e-5)
    assert res["Kashmir"].entity == "Kashmir_(song)"
    assert res["Kashmir"].score == pytest.approx(0.55502, abs=1e-5)
    assert res["Knebworth"].entity == "Knebworth_Festival"
    assert res["Knebworth"].score == pytest.approx(0.71833, abs=1e-5)
    assert res["Les Paul"].entity == OOKBE
    assert res["Les Paul"].score == pytest.approx(0.0, abs=1e-5)


def test_cocktail_party_confidence(fixture_kb):
    """CocktailPartyTest.testCocktailPartyConfidence (confidenceBalance=1.0):
    all linked mentions 1.0, OOKBE 0.95."""
    res = _mapping(disambiguate_document(
        "d1", TEXT, fixture_kb,
        cocktail_party_settings(algorithm="cocktail_party",
                                compute_confidence=True,
                                confidence_balance=1.0)))
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Page"].score == pytest.approx(1.0, abs=1e-5)
    assert res["Kashmir"].entity == "Kashmir_(song)"
    assert res["Kashmir"].score == pytest.approx(1.0, abs=1e-5)
    assert res["Knebworth"].entity == "Knebworth_Festival"
    assert res["Knebworth"].score == pytest.approx(1.0, abs=1e-5)
    assert res["Les Paul"].entity == OOKBE
    assert res["Les Paul"].score == pytest.approx(0.95, abs=1e-5)


def test_confidence_sampling_path(fixture_kb):
    """balance < 1 exercises the graph-perturbation sampling (C12)."""
    res = _mapping(disambiguate_document(
        "d1", TEXT, fixture_kb,
        cocktail_party_settings(algorithm="cocktail_party",
                                compute_confidence=True,
                                confidence_balance=0.5)))
    assert res["Page"].entity == "Jimmy_Page"
    assert 0.0 <= res["Page"].score <= 1.0
    # deterministic across runs (seeded RNG)
    res2 = _mapping(disambiguate_document(
        "d1", TEXT, fixture_kb,
        cocktail_party_settings(algorithm="cocktail_party",
                                compute_confidence=True,
                                confidence_balance=0.5)))
    assert res["Page"].score == res2["Page"].score


def test_no_max_entity_rank(fixture_kb):
    """DisambiguatorTest.testNoMaxEntityRank: rank -0.1 -> everything OOKBE."""
    res = _mapping(disambiguate_document(
        "d2", TEXT, fixture_kb, cocktail_party_settings(max_entity_rank=-0.1)))
    for m in ["Page", "Kashmir", "Knebworth", "Les Paul"]:
        assert res[m].entity == OOKBE


def test_top_max_entity_rank(fixture_kb):
    """DisambiguatorTest.testTopMaxEntityRank: rank 0.8 drops only Knebworth."""
    res = _mapping(disambiguate_document(
        "d3", TEXT, fixture_kb, cocktail_party_settings(max_entity_rank=0.8)))
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Kashmir"].entity == "Kashmir_(song)"
    assert res["Knebworth"].entity == OOKBE
    assert res["Les Paul"].entity == OOKBE


def test_local_technique(fixture_kb):
    res = _mapping(disambiguate_document("d4", TEXT, fixture_kb, local_settings()))
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Les Paul"].entity == OOKBE


def test_prior_only(fixture_kb):
    """PriorOnly: Page -> Larry_Page (0.7), Kashmir -> Kashmir (0.9)."""
    res = _mapping(disambiguate_document("d5", TEXT, fixture_kb,
                                         prior_only_settings()))
    assert res["Page"].entity == "Larry_Page"
    assert res["Page"].score == pytest.approx(0.7)
    assert res["Kashmir"].entity == "Kashmir"
    assert res["Knebworth"].entity == "Knebworth_Festival"
    assert res["Les Paul"].entity == OOKBE


def test_manual_only_detection(fixture_kb):
    res = disambiguate_document(
        "d6", TEXT, fixture_kb, cocktail_party_settings(mention_detection="manual"))
    assert [r.mention for r in res] == ["Page"]


def test_null_mapping_threshold(fixture_kb):
    res = _mapping(disambiguate_document(
        "d7", TEXT, fixture_kb,
        cocktail_party_settings(algorithm="cocktail_party",
                                null_mapping_threshold=0.6)))
    # Kashmir scored 0.555 < 0.6 -> dropped to OOKBE
    assert res["Kashmir"].entity == OOKBE
    assert res["Page"].entity == "Jimmy_Page"


def test_determinism(fixture_kb):
    a = disambiguate_document("d8", TEXT, fixture_kb, cocktail_party_settings())
    b = disambiguate_document("d8", TEXT, fixture_kb, cocktail_party_settings())
    assert [(r.mention, r.entity, r.score) for r in a] == \
           [(r.mention, r.entity, r.score) for r in b]
