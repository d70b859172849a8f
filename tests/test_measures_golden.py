"""Golden measure values ported from the reference's measure unit tests."""

import pytest

from aida_ray.ned.coherence import kore, milne_witten


def test_milne_witten_golden(fixture_kb):
    """MilneWittenEntityEntitySimilarityTest.java:40-52 (±1e-4)."""
    kb = fixture_kb
    a = kb.entity2id["Kashmir_(song)"]
    b = kb.entity2id["Jimmy_Page"]
    c = kb.entity2id["Larry_Page"]
    d = kb.entity2id["Knebworth_Festival"]
    assert milne_witten(kb, a, b) == pytest.approx(0.9493, abs=1e-4)
    assert milne_witten(kb, b, d) == pytest.approx(0.8987, abs=1e-4)
    assert milne_witten(kb, a, d) == pytest.approx(0.9197, abs=1e-4)
    assert milne_witten(kb, c, d) == pytest.approx(0.0, abs=1e-3)
    assert milne_witten(kb, a, b) > milne_witten(kb, a, c)
    assert milne_witten(kb, a, d) < milne_witten(kb, a, b)


def test_kore_golden(fixture_kb):
    """KORETest.java:30-67: keyphraseAlpha=1, keywordAlpha=0,
    normalized weights (±1e-4)."""
    kb = fixture_kb
    a = kb.entity2id["Kashmir_(song)"]
    b = kb.entity2id["Jimmy_Page"]
    c = kb.entity2id["Larry_Page"]
    d = kb.entity2id["Knebworth_Festival"]
    kw = dict(kp_alpha=1.0, kw_alpha=0.0, normalize=True)
    assert kore(kb, a, b, **kw) == pytest.approx(0.2091, abs=1.5e-4)
    assert kore(kb, b, d, **kw) == pytest.approx(0.1125, abs=1.5e-4)
    assert kore(kb, a, d, **kw) == pytest.approx(0.1613, abs=1.5e-4)
    assert kore(kb, c, d, **kw) == pytest.approx(0.0, abs=1e-3)
    assert kore(kb, a, b, **kw) > kore(kb, a, c, **kw)


def test_ensemble_golden(fixture_kb):
    """EnsembleMentionEntitySimilarityTest.java:35-102: ALL-CAPS 'PLAYED'
    checks term expansion; switched ensemble with prior threshold 0.8."""
    from aida_ray.ned.doc import Mention, PreparedDoc
    from aida_ray.ned.settings import SimilaritySettings
    from aida_ray.ned.similarity import EnsembleSimilarity
    kb = fixture_kb
    text = "When Page PLAYED Kashmir at Knebworth , his Les Paul was uniquely tuned ."
    token_ids = [kb.word_id(w) for w in text.split(" ")]
    doc = PreparedDoc(doc_id="t", text=text, tokens=[],
                      token_ids=token_ids, mentions=[])
    m1 = Mention(mention="Page", char_offset=5, char_length=4,
                 start_token=1, end_token=1)
    m1.candidates = kb.candidates("PAGE")
    m1.priors = kb.priors("PAGE")
    m2 = Mention(mention="Kashmir", char_offset=16, char_length=7,
                 start_token=3, end_token=3)
    m2.candidates = kb.candidates("KASHMIR")
    m2.priors = kb.priors("KASHMIR")
    settings = SimilaritySettings(
        mes_no_prior=(("mi", 0.95), ("idf", 0.05)),
        mes_with_prior=(("mi", 0.475), ("idf", 0.025)),
        prior_weight=0.5,
        prior_threshold=0.8,
    )
    ens = EnsembleSimilarity(kb, doc, [m1, m2], settings)
    sim_page = ens.similarity(m1, kb.entity2id["Jimmy_Page"])
    sim_kashmir = ens.similarity(m2, kb.entity2id["Kashmir_(song)"])
    assert sim_page == pytest.approx(1.0, abs=1e-9)
    assert sim_kashmir == pytest.approx(0.12748, abs=1e-5)


def test_keyphrase_mi_similarity_golden(fixture_kb):
    """KeyphrasesBasedSimilarityTest.testCalcMISimilarity:30-66 (±1e-8):
    dummy mention (start=end=-1), MI keyword weights."""
    from aida_ray.ned.context import InvertedIndex
    from aida_ray.ned.doc import Mention
    from aida_ray.ned.similarity import keyphrase_similarity
    kb = fixture_kb
    text = "When Page played at Knebworth , his Les Paul was uniquely tuned ."
    token_ids = [kb.word_id(w) for w in text.split(" ")]
    index = InvertedIndex(token_ids, kb.stop_ids)
    dummy = Mention(mention="", char_offset=0, char_length=0,
                    start_token=-1, end_token=-1)
    sim1 = keyphrase_similarity(kb, index, dummy,
                                kb.entity2id["Kashmir"], "mi")
    sim2 = keyphrase_similarity(kb, index, dummy,
                                kb.entity2id["Kashmir_(song)"], "mi")
    sim3 = keyphrase_similarity(kb, index, dummy,
                                kb.entity2id["Jimmy_Page"], "mi")
    assert sim1 == pytest.approx(0.0, abs=1e-9)
    assert sim2 == pytest.approx(0.00001517, abs=1e-8)
    assert sim3 == pytest.approx(0.00009718, abs=1e-8)


def test_ngd_family_golden(fixture_kb):
    """C7 parity: NGD + WeightedNGD over keyphrase contexts
    (NGDSimilarityMeasure.java:23-63, WeightedNGDSimilarityMeasure.java:
    16-77).  No reference unit test exists for these — values are
    formula-exact derivations on the DataAccessForTesting fixture KB,
    pinned; orderings must track MilneWitten (same formula shape)."""
    import pytest

    from aida_ray.ned.coherence import milne_witten, ngd, weighted_ngd
    kb = fixture_kb
    a = kb.entity2id["Kashmir_(song)"]
    b = kb.entity2id["Jimmy_Page"]
    c = kb.entity2id["Larry_Page"]
    d = kb.entity2id["Knebworth_Festival"]
    assert ngd(kb, a, b) == pytest.approx(0.918042, abs=1e-6)
    assert ngd(kb, b, d) == pytest.approx(0.872904, abs=1e-6)
    assert ngd(kb, a, d) == pytest.approx(0.901665, abs=1e-6)
    assert ngd(kb, c, d) == 0.0
    assert weighted_ngd(kb, a, b) == pytest.approx(0.921765, abs=1e-6)
    assert weighted_ngd(kb, b, d) == pytest.approx(0.870941, abs=1e-6)
    assert weighted_ngd(kb, a, d) == pytest.approx(0.90056, abs=1e-6)
    assert weighted_ngd(kb, c, d) == 0.0
    # same ordering as MilneWitten on the fixture pairs
    for m in (ngd, weighted_ngd):
        assert m(kb, a, b) > m(kb, a, d) > m(kb, b, d)
    assert (milne_witten(kb, a, b) > milne_witten(kb, a, d)
            > milne_witten(kb, b, d))


def test_jaccard_kp_golden(fixture_kb):
    """C7 parity: (Weighted)Jaccard over keyphrase-id sets
    (JaccardEntityEntitySimilarityMeasure.java:25-36,
    WeightedJaccardEntityEntitySimilarityMeasure.java:20-77)."""
    import pytest

    from aida_ray.ned.coherence import jaccard_kp, weighted_jaccard_kp
    kb = fixture_kb
    a = kb.entity2id["Kashmir_(song)"]
    b = kb.entity2id["Jimmy_Page"]
    c = kb.entity2id["Larry_Page"]
    d = kb.entity2id["Knebworth_Festival"]
    assert jaccard_kp(kb, a, b) == pytest.approx(0.25, abs=1e-9)
    assert jaccard_kp(kb, b, d) == pytest.approx(1 / 7, abs=1e-9)
    assert jaccard_kp(kb, a, d) == pytest.approx(0.2, abs=1e-9)
    assert jaccard_kp(kb, c, d) == 0.0
    assert weighted_jaccard_kp(kb, a, b) == pytest.approx(0.25934, abs=1e-6)
    assert weighted_jaccard_kp(kb, b, d) == pytest.approx(0.133448, abs=1e-6)
    assert weighted_jaccard_kp(kb, a, d) == pytest.approx(0.201041, abs=1e-6)
    assert weighted_jaccard_kp(kb, c, d) == 0.0


def test_text_me_measures_golden(fixture_kb):
    """C7 parity: TfIdfCosine + WordCountVectorDotProduct mention-entity
    measures (TfIdfCosineSimilarityMeasure.java:31-100,
    WordCountVectorDotProductSimilarityMeasure.java:27-70) on the golden
    sentence — Jimmy_Page must dominate (the sentence is about him)."""
    import pytest

    from aida_ray.ned.similarity import tfidf_cosine, wordcount_dot
    kb = fixture_kb
    text = ("When Page PLAYED Kashmir at Knebworth , his Les Paul was "
            "uniquely tuned .")
    tok = [kb.word_id(w) for w in text.split(" ")]
    a = kb.entity2id["Kashmir_(song)"]
    b = kb.entity2id["Jimmy_Page"]
    c = kb.entity2id["Larry_Page"]
    d = kb.entity2id["Knebworth_Festival"]
    assert tfidf_cosine(kb, tok, b) == pytest.approx(0.4598, abs=1e-4)
    assert tfidf_cosine(kb, tok, a) == pytest.approx(0.193077, abs=1e-6)
    assert tfidf_cosine(kb, tok, c) == 0.0
    assert tfidf_cosine(kb, tok, d) == 0.0
    assert wordcount_dot(kb, tok, b) == 4.0
    assert wordcount_dot(kb, tok, a) == 1.0
    assert wordcount_dot(kb, tok, c) == 0.0
    assert tfidf_cosine(kb, tok, b) > tfidf_cosine(kb, tok, a) \
        > tfidf_cosine(kb, tok, c)


def test_text_me_in_ensemble(fixture_kb):
    """tfidf_cosine is selectable as an ensemble measure kind (the
    SimilaritySettings triple-format surface, README.md:356-374)."""
    from aida_ray.ned.doc import Mention, PreparedDoc
    from aida_ray.ned.settings import SimilaritySettings
    from aida_ray.ned.similarity import EnsembleSimilarity
    kb = fixture_kb
    text = "When Page PLAYED Kashmir at Knebworth , his Les Paul was uniquely tuned ."
    token_ids = [kb.word_id(w) for w in text.split(" ")]
    doc = PreparedDoc(doc_id="t", text=text, tokens=[],
                      token_ids=token_ids, mentions=[])
    m = Mention(mention="Page", char_offset=5, char_length=4,
                start_token=1, end_token=1)
    m.candidates = kb.candidates("PAGE")
    m.priors = kb.priors("PAGE")
    settings = SimilaritySettings(
        mes_no_prior=(("tfidf_cosine", 0.7), ("wordcount_dot", 0.3)),
        mes_with_prior=(("tfidf_cosine", 0.7), ("wordcount_dot", 0.3)),
        prior_threshold=-1.0, prior_weight=0.0)
    ens = EnsembleSimilarity(kb, doc, [m], settings)
    jp = kb.entity2id["Jimmy_Page"]
    lp = kb.entity2id["Larry_Page"]
    assert ens.similarity(m, jp) > ens.similarity(m, lp)
    # min-max rescaled over the candidate set: the winner is at 1.0
    assert ens.similarity(m, jp) == 1.0
