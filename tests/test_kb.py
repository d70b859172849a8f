"""KB fixture + weight computation tests.

Golden values from test/mpi/aida/graph/similarity/PriorProbabilityTest.java:45-57
and WeightComputation semantics.
"""

import math

import pytest

from aida_ray.kb.fixture import build_fixture_kb
from aida_ray.kb.kb import compute_mi, compute_npmi


def test_priors(fixture_kb):
    kb = fixture_kb
    page = kb.priors("PAGE")
    assert page[kb.entity2id["Jimmy_Page"]] == pytest.approx(0.3)
    assert page[kb.entity2id["Larry_Page"]] == pytest.approx(0.7)
    kashmir = kb.priors("KASHMIR")
    assert kashmir[kb.entity2id["Kashmir"]] == pytest.approx(0.9)
    assert kashmir[kb.entity2id["Kashmir_(song)"]] == pytest.approx(0.1)
    # priors per mention sum to 1 (PriorProbabilityTest invariant)
    for m in ["PAGE", "KASHMIR", "KNEBWORTH"]:
        assert sum(kb.priors(m).values()) == pytest.approx(1.0)
    assert kb.priors("LES PAUL") == {}


def test_entity_rank_filter(fixture_kb):
    kb = fixture_kb
    # ranks: offset / 7 over ORDERED_ENTITIES (DataAccessForTesting:264-279)
    assert kb.candidates("KNEBWORTH", max_entity_rank=0.8) == []
    assert len(kb.candidates("PAGE", max_entity_rank=0.8)) == 2
    assert kb.candidates("PAGE", max_entity_rank=-0.1) == []


def test_top_by_prior(fixture_kb):
    kb = fixture_kb
    top = kb.candidates("PAGE", top_by_prior=1)
    assert len(top) == 1
    assert top[0][0] == kb.entity2id["Larry_Page"]


def test_idf_uses_integer_division(fixture_kb):
    kb = fixture_kb
    # IDF = log2(collectionSize // df) (KeyphrasesContext.java:313, java int div)
    played = kb.word2id["played"]
    expected = math.log2(2651987 // 100)
    assert kb.kw_idf[played] == pytest.approx(expected, abs=1e-12)


def test_mi_npmi_bounds():
    assert compute_npmi(10, 10, 0, 100) == -1.0
    assert -1.0001 <= compute_npmi(10, 20, 5, 1000) <= 1.0001
    mi = compute_mi(10, 100, 10, 2651987, False)
    assert mi > 0
    nmi = compute_mi(10, 100, 10, 2651987, True)
    assert 0 < nmi <= 1.0001


def test_word_expansions(fixture_kb):
    kb = fixture_kb
    les = kb.word2id["Les"]
    assert kb.id2word[kb.expand_term(les)] == "LES"
    # already-uppercase words expand to themselves
    china = kb.word2id["China"]
    assert kb.id2word[kb.expand_term(china)] == "CHINA"


def test_kb_parquet_roundtrip(tmp_path):
    kb = build_fixture_kb()
    path = str(tmp_path / "kb")
    kb.save(path)
    from aida_ray.kb.kb import KB
    kb2 = KB.load(path)
    assert kb2.entity2id == kb.entity2id
    assert kb2.word2id == kb.word2id
    assert kb2.dictionary.keys() == kb.dictionary.keys()
    assert sorted(kb2.dictionary["PAGE"]) == sorted(kb.dictionary["PAGE"])
    assert kb2.dictionary["LES PAUL"] == []
    assert kb2.kw_idf == kb.kw_idf
    assert kb2.kw_mi == kb.kw_mi
    assert kb2.collection_size == kb.collection_size
    for e in kb.inlinks:
        assert list(kb2.inlinks[e]) == list(kb.inlinks[e])
