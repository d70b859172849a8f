"""All 17 prebuilt reference configs (config/settings/disambiguation/
*.java, listed README.md:326-337) run end-to-end through the preset
registry, and the Fast-settings keyphrase pruning behaves per spec."""

import pytest

from aida_ray.kb.kb import OOKBE
from aida_ray.ned.disambiguator import disambiguate_document
from aida_ray.ned.settings import (PRESETS, cocktail_party_settings, preset)

TEXT = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."


def test_registry_complete():
    assert len(PRESETS) == 17
    with pytest.raises(KeyError):
        preset("NoSuchSettings")


@pytest.mark.parametrize("name", sorted(PRESETS))
def test_every_preset_runs(fixture_kb, name):
    res = disambiguate_document("d1", TEXT, fixture_kb, preset(name))
    # every preset detects the same mentions; decisions may differ
    assert {r.mention for r in res} == {"Page", "Kashmir", "Knebworth",
                                        "Les Paul"}
    for r in res:
        assert r.entity == OOKBE or isinstance(r.entity, str)


def test_default_preset_equals_cocktail_settings(fixture_kb):
    a = disambiguate_document(
        "d1", TEXT, fixture_kb, preset("CocktailPartyDisambiguationSettings"))
    b = disambiguate_document("d1", TEXT, fixture_kb,
                              cocktail_party_settings())
    assert [(r.mention, r.entity, round(r.score, 9)) for r in a] == \
        [(r.mention, r.entity, round(r.score, 9)) for r in b]


def test_graph_preset_golden_decisions(fixture_kb):
    res = {r.mention: r for r in disambiguate_document(
        "d1", TEXT, fixture_kb,
        preset("CocktailPartyDisambiguationSettings"))}
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Kashmir"].entity == "Kashmir_(song)"


def test_fast_pruning_caps_keyphrases(fixture_kb):
    # pick an entity with >1 keyphrase; pruning to 1 must keep the
    # highest-MI-weight one and the list must be deterministic
    eid = next(e for e, kps in fixture_kb.entity_kps.items()
               if len(kps) > 1)
    full = fixture_kb.entity_kps[eid]
    top1 = fixture_kb.pruned_kps(eid, max_count=1)
    assert len(top1) == 1 and top1[0] in full
    weights = {kp: fixture_kb.kp_weight(eid, kp) for kp in full}
    assert weights[top1[0]] == max(weights.values())
    # floor above every weight empties the list
    hi = max(weights.values()) + 1.0
    assert fixture_kb.pruned_kps(eid, min_weight=hi) == []
    # memoized second call returns the same object
    assert fixture_kb.pruned_kps(eid, max_count=1) is top1


def test_fast_preset_still_links_head_entities(fixture_kb):
    res = {r.mention: r for r in disambiguate_document(
        "d1", TEXT, fixture_kb,
        preset("FastCocktailPartyDisambiguationSettings"))}
    # pruning to 1000 keyphrases is a no-op on the small fixture KB, so
    # decisions must match the unpruned graph preset exactly
    base = {r.mention: r for r in disambiguate_document(
        "d1", TEXT, fixture_kb,
        preset("CocktailPartyDisambiguationSettings"))}
    assert {m: r.entity for m, r in res.items()} == \
        {m: r.entity for m, r in base.items()}
