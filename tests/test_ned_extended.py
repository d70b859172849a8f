"""Extended NED operators: external entities (DisambiguatorTest.java:160-292),
fuzzy lookup, chunking + reconciliation, CoNLL TSV round-trip, KORE."""

import pytest

from aida_ray.kb.kb import OOKBE
from aida_ray.ned.disambiguator import disambiguate_document
from aida_ray.ned.settings import cocktail_party_settings, local_settings


def _mapping(results):
    return {r.mention: r for r in results}


def test_external_entities_dictionary(fixture_kb):
    """testExternalEntitiesDictionary: injected candidates appear."""
    text = "When [[Page]] played [[Kashmir]] at [[Knebworth]], his Les Paul was uniquely tuned."
    external = ({"Page": ["page1", "page2"], "Kashmir": ["kashmir1"]}, {})
    from aida_ray.ned.disambiguator import prepare_document
    from aida_ray.ned.external import kb_with_external
    kb = kb_with_external(fixture_kb, *external)
    s = local_settings(mention_detection="manual")
    doc = prepare_document("d", text, kb, s)
    by_mention = {m.mention: m for m in doc.mentions}
    page_names = {kb.id2entity[e] for e, _ in by_mention["Page"].candidates}
    assert {"page1", "page2"} <= page_names
    kashmir_names = {kb.id2entity[e] for e, _ in by_mention["Kashmir"].candidates}
    assert "kashmir1" in kashmir_names
    kneb_names = {kb.id2entity[e] for e, _ in by_mention["Knebworth"].candidates}
    assert not ({"page1", "page2", "kashmir1"} & kneb_names)


def test_external_entities_keyphrases(fixture_kb):
    """testExternalEntitiesKeyphrases: keyphrase-matching external wins;
    no-keyphrase candidate scores 0."""
    text = "[[AIDA]] is the entity disambiguation software by MPI, not the musical."
    external = (
        {"AIDA": ["AIDA-MPI", "AIDA-WRONG", "AIDA-NOMATCH"]},
        {"AIDA-MPI": ["Google", "entity disambiguation framework", "MPI", "software"],
         "AIDA-WRONG": ["musical"],
         "AIDA-NOMATCH": []},
    )
    s = local_settings(mention_detection="manual")
    res = disambiguate_document("d", text, fixture_kb, s, external=external)
    aida = [r for r in res if r.mention == "AIDA"]
    assert len(aida) == 1
    assert aida[0].entity == "AIDA-MPI"
    # score internals: rank all three candidates
    from aida_ray.ned.disambiguator import prepare_document
    from aida_ray.ned.external import kb_with_external
    from aida_ray.ned.similarity import EnsembleSimilarity
    kb = kb_with_external(fixture_kb, *external)
    doc = prepare_document("d", text, kb, s)
    ens = EnsembleSimilarity(kb, doc, doc.mentions, s.similarity)
    m = doc.mentions[0]
    scores = {kb.id2entity[e]: ens.similarity(m, e) for e, _ in m.candidates}
    assert scores["AIDA-MPI"] > scores["AIDA-WRONG"] > 0.0
    assert scores["AIDA-NOMATCH"] == pytest.approx(0.0, abs=1e-3)


def test_fuzzy_lookup(fixture_kb):
    from aida_ray.ned.external import FuzzyLookup
    fl = FuzzyLookup(fixture_kb)
    # trigram-similar misspelling of KNEBWORTH
    cands = fl.lookup("Knebworthe", min_similarity=0.5)
    names = {fixture_kb.id2entity[e] for e, _ in cands}
    assert "Knebworth_Festival" in names
    assert fl.lookup("Zzzzxq", min_similarity=0.5) == []


def test_fuzzy_in_pipeline(fixture_kb):
    text = "When [[Knebworthe]] hosted a festival."
    s = local_settings(mention_detection="manual", fuzzy_lookup=True,
                       fuzzy_min_similarity=0.5)
    res = _mapping(disambiguate_document("d", text, fixture_kb, s))
    assert res["Knebworthe"].entity == "Knebworth_Festival"
    s2 = local_settings(mention_detection="manual")
    res2 = _mapping(disambiguate_document("d", text, fixture_kb, s2))
    assert res2["Knebworthe"].entity == OOKBE


def test_chunked_disambiguation(fixture_kb):
    base = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."
    text = " ".join([base] * 6)   # 6 sentences -> multiple chunks
    s = cocktail_party_settings(chunker="fixed", sentences_per_chunk=2)
    res = disambiguate_document("d", text, fixture_kb, s)
    pages = [r for r in res if r.mention == "Page"]
    assert len(pages) == 6
    assert all(r.entity == "Jimmy_Page" for r in pages)
    # offsets must index into the cleaned text
    cleaned = text.replace("[[", "").replace("]]", "")
    for r in res:
        assert cleaned[r.char_offset:r.char_offset + r.char_length] == r.mention


def test_chunkers():
    from aida_ray.ned.chunking import fixed_length_chunks, paragraph_chunks
    text = "One one. Two two. Three three. Four four. Five five."
    chunks = fixed_length_chunks(text, sentences_per_chunk=2)
    assert len(chunks) == 3
    assert "".join(c for c, _ in chunks) == text
    for c, off in chunks:
        assert text[off:off + len(c)] == c
    paras = paragraph_chunks("a b\nc d\n\ne")
    assert [p for p, _ in paras] == ["a b", "c d", "e"]


def test_conll_tsv_roundtrip():
    from aida_ray.sources.conll_tsv import (parse_conll_tsv,
                                            train_dev_test_split,
                                            write_conll_tsv)
    tsv = (
        "-DOCSTART- (1 EU)\t1996-08-22\n"
        "EU\tB\tEU\t--NME--\tORG\n"
        "rejects\n"
        "German\tB\tGerman\tGermany\tMISC\n"
        "call\n"
        "to\n"
        "boycott\n"
        "British\tB\tBritish\tUnited_Kingdom\tMISC\n"
        "lamb\n"
        ".\n"
        "\n"
        "Peter\tB\tPeter Blackburn\tPeter_Blackburn\tPER\n"
        "Blackburn\tI\tPeter Blackburn\tPeter_Blackburn\tPER\n"
        "\n"
        "-DOCSTART- (2 Second)\n"
        "Hello\n"
        "world\n"
    )
    docs = parse_conll_tsv(tsv)
    assert len(docs) == 2
    d = docs[0]
    assert d.doc_id == "1 EU"
    assert d.date == "1996-08-22"
    assert d.text.split("\n")[0] == "EU rejects German call to boycott British lamb ."
    assert [(m.mention, m.gold_entity) for m in d.mentions] == [
        ("EU", "--NME--"), ("German", "Germany"), ("British", "United_Kingdom"),
        ("Peter Blackburn", "Peter_Blackburn")]
    for m in d.mentions:
        assert d.text[m.begin:m.begin + m.length] == m.mention
    # round trip
    docs2 = parse_conll_tsv(write_conll_tsv(docs))
    assert [(x.doc_id, x.text) for x in docs2] == [(x.doc_id, x.text) for x in docs]
    assert [[(m.mention, m.begin, m.gold_entity) for m in x.mentions] for x in docs2] == \
           [[(m.mention, m.begin, m.gold_entity) for m in x.mentions] for x in docs]
    split = train_dev_test_split(docs * 100)
    assert len(split["train"]) + len(split["dev"]) + len(split["testb"]) == 200


def test_kore_and_cosine(fixture_kb):
    from aida_ray.ned.coherence import keyword_cosine, kore
    kb = fixture_kb
    jp = kb.entity2id["Jimmy_Page"]
    ks = kb.entity2id["Kashmir_(song)"]
    kash = kb.entity2id["Kashmir"]
    # Jimmy_Page and Kashmir_(song) share keyphrases (Led Zeppelin,
    # Robert Plant) -> positive coherence; Kashmir (region) shares none
    assert kore(kb, jp, ks) > 0.0
    assert kore(kb, jp, kash) == 0.0
    assert keyword_cosine(kb, jp, ks) > keyword_cosine(kb, jp, kash)
    assert 0.0 <= keyword_cosine(kb, jp, ks) <= 1.0


def test_type_filter(fixture_kb):
    """J4: type semi-join restricts candidates."""
    text = "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned."
    s = local_settings(type_filter=("PERSON",))
    res = _mapping(disambiguate_document("d", text, fixture_kb, s))
    # only PERSON candidates survive: Kashmir (LOCATION/ARTIFACT) -> OOKBE
    assert res["Page"].entity in ("Jimmy_Page", "Larry_Page")
    assert res["Kashmir"].entity == OOKBE
    assert res["Knebworth"].entity == OOKBE


def test_entity_importance_term(fixture_kb):
    """C4: importance adds a rank/inlink-count term to the ensemble."""
    from dataclasses import replace
    s = local_settings()
    sim = replace(s.similarity, eis_no_prior=(("rank", 1.0),),
                  eis_with_prior=(("rank", 1.0),))
    s = replace(s, similarity=sim)
    text = "When [[Page]] visited nowhere interesting."
    res = _mapping(disambiguate_document("d", text, fixture_kb, s))
    # with no keyphrase evidence, rank importance dominates:
    # Larry_Page has global rank 0 (importance 1.0)
    assert res["Page"].entity == "Larry_Page"


def test_kb_types_roundtrip(fixture_kb, tmp_path):
    path = str(tmp_path / "kb")
    fixture_kb.save(path)
    from aida_ray.kb.kb import KB
    kb2 = KB.load(path)
    assert kb2.entity_types == fixture_kb.entity_types


def test_graph_with_kore_coherence(fixture_kb):
    from dataclasses import replace
    s = cocktail_party_settings()
    sim = replace(s.similarity, ee_sims=(("milnewitten", 0.5), ("kore", 0.5)))
    s = replace(s, similarity=sim)
    res = _mapping(disambiguate_document("d",
        "When [[Page]] played Kashmir at Knebworth, his Les Paul was uniquely tuned.",
        fixture_kb, s))
    assert res["Page"].entity == "Jimmy_Page"
    assert res["Kashmir"].entity == "Kashmir_(song)"


def test_capitalized_tag_ood(fixture_kb):
    """OOD tagger (NERManager.java:103-160 post-filter semantics):
    capitalized runs outside the dictionary become candidate-less
    mentions; single chars and sentence-case heads are dropped."""
    from aida_ray.ned.doc import capitalized_tag
    from aida_ray.text.tokenizer import tokenize
    text = ("The X ray showed nothing. Later Zorbafex Quillan met "
            "Tamberlyn in Oslo.")
    tokens = tokenize(text)
    names = [m.mention for m in capitalized_tag(text, tokens)]
    assert "Zorbafex Quillan" in names       # mid-sentence unknown name
    assert "Tamberlyn" in names
    assert "Oslo" in names
    assert "X" not in names                  # single-char filter
    assert "The" not in names                # sentence-initial filter
    assert "Later" not in names              # sentence-case head dropped,
    assert not any("Later" in n for n in names)  # rest of run kept


def test_ood_detection_end_to_end(fixture_kb):
    """detect_ood_mentions=True: unknown surfaces emit --OOKBE-- rows;
    dictionary entities still link; defaults (False) leave the pipeline
    untouched."""
    from dataclasses import replace

    from aida_ray.ned.disambiguator import disambiguate_document
    from aida_ray.ned.settings import cocktail_party_settings
    kb = fixture_kb
    text = "When Page played Kashmir at Knebworth, Zorbafex Quillan recorded it."
    base_s = cocktail_party_settings(algorithm="cocktail_party")
    base = disambiguate_document("d", text, kb, base_s)
    assert all(r.mention != "Zorbafex Quillan" for r in base)
    withood = disambiguate_document(
        "d", text, kb, replace(base_s, detect_ood_mentions=True))
    got = {r.mention: r.entity for r in withood}
    assert got["Zorbafex Quillan"] == "--OOKBE--"
    assert got["Page"] == "Jimmy_Page"
    assert got["Kashmir"] == "Kashmir_(song)"


def test_perceptron_ner_heldout():
    """M7 statistical tagger: averaged perceptron trained on the
    synthetic train split tags the held-out testb split perfectly and
    deterministically (identical weights across retrains)."""
    from aida_ray.kb.synth import synth_kb
    from aida_ray.ned.perceptron import train_from_conll
    from aida_ray.pipelines.conformance import generate_conll_corpus
    from aida_ray.sources.conll_tsv import (parse_conll_tsv,
                                            train_dev_test_split)
    kb = synth_kb(200, seed=42)
    model = train_from_conll(kb, n_docs=300, seed=42)
    docs = train_dev_test_split(
        parse_conll_tsv(generate_conll_corpus(kb, 300, 42)))["testb"]
    tp = fp = fn = 0
    for d in docs:
        pred = {(m.char_offset, m.char_length) for m in model.find_mentions(d.text)}
        gold = {(m.begin, m.length) for m in d.mentions}
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
    assert tp / (tp + fp) >= 0.95 and tp / (tp + fn) >= 0.95
    m2 = train_from_conll(kb, n_docs=300, seed=42)
    assert m2.weights == model.weights     # bit-deterministic training


def test_perceptron_ner_unseen_surfaces():
    """Generalization: the model never saw kb2's entity names, but shape
    features recover their spans (what the dictionary trie cannot do)."""
    from aida_ray.kb.synth import synth_kb
    from aida_ray.ned.perceptron import train_from_conll
    from aida_ray.pipelines.conformance import generate_conll_corpus
    from aida_ray.sources.conll_tsv import (parse_conll_tsv,
                                            train_dev_test_split)
    model = train_from_conll(synth_kb(200, seed=42), n_docs=300, seed=42)
    docs = train_dev_test_split(parse_conll_tsv(
        generate_conll_corpus(synth_kb(200, seed=777), 200, 99)))["testb"]
    tp = fp = fn = 0
    for d in docs:
        pred = {(m.char_offset, m.char_length) for m in model.find_mentions(d.text)}
        gold = {(m.begin, m.length) for m in d.mentions}
        tp += len(pred & gold)
        fp += len(pred - gold)
        fn += len(gold - pred)
    assert tp / (tp + fp) >= 0.9 and tp / (tp + fn) >= 0.9


def test_properties_parser_roundtrip():
    """SimilaritySettings .properties parser (README.md:356-374):
    reproduces the built-in SWITCHED_KP exactly; new measure names map;
    unknown names raise."""
    import pytest

    from aida_ray.ned.settings import (SWITCHED_KP,
                                       similarity_settings_from_properties)
    props = """
mentionEntitySimilarities = UnnormalizedKeyphrasesBasedMISimilarity:KeyphrasesContext:0.58132103337 UnnormalizedKeyphrasesBasedIDFSimilarity:KeyphrasesContext:0.41867896662 UnnormalizedKeyphrasesBasedMISimilarity:KeyphrasesContext:0.10123683065 UnnormalizedKeyphrasesBasedIDFSimilarity:KeyphrasesContext:0.33359024871
priorWeight = 0.56517292063
priorThreshold = 0.9
entityEntitySimilarity = MilneWittenEntityEntitySimilarity:1.0
"""
    assert similarity_settings_from_properties(props) == SWITCHED_KP
    s2 = similarity_settings_from_properties("""
mentionEntitySimilarities = TfIdfCosineSimilarityMeasure:TextContext:0.7 WordCountVectorDotProductSimilarityMeasure:TextContext:0.3
entityEntitySimilarity = NGDSimilarityMeasure:0.5 KOREEntityEntitySimilarityMeasure:0.5
""")
    assert s2.mes_no_prior == (("tfidf_cosine", 0.7), ("wordcount_dot", 0.3))
    assert s2.ee_sims == (("ngd", 0.5), ("kore", 0.5))
    with pytest.raises(ValueError, match="unknown mention-entity"):
        similarity_settings_from_properties(
            "mentionEntitySimilarities = NoSuchMeasure:Ctx:1.0")


def test_statistical_ner_in_pipeline(fixture_kb):
    """The trained perceptron plugs into DisambiguationSettings and its
    spans merge with dictionary mentions (NERManager ensemble shape)."""
    from dataclasses import replace

    from aida_ray.kb.synth import synth_kb
    from aida_ray.ned.disambiguator import disambiguate_document
    from aida_ray.ned.perceptron import train_from_conll
    from aida_ray.ned.settings import cocktail_party_settings
    model = train_from_conll(synth_kb(200, seed=42), n_docs=200, seed=42)
    kb = fixture_kb
    text = ("When Page played Kashmir at Knebworth, Zorbafex Quillan "
            "recorded it.")
    s = replace(cocktail_party_settings(algorithm="cocktail_party"),
                statistical_ner=model)
    got = {r.mention: r.entity for r in disambiguate_document("d", text, kb, s)}
    # dictionary mentions still win and link
    assert got["Page"] == "Jimmy_Page"
    assert got["Kashmir"] == "Kashmir_(song)"
    # perceptron span for the unknown name -> OOKBE row
    assert any("Zorbafex" in m for m in got), got
