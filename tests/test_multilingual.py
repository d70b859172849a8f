"""M2 language-routed tokenization tests (TokenizerManager.java parity)."""

import pyarrow as pa

from aida_ray.text.multilingual import (tokenize_de, tokenize_for_lang,
                                        tokenize_multilingual)
from aida_ray.text.tokenizer import tokenize


def test_german_abbreviation_keeps_sentence_open():
    toks = tokenize_de("Knebworth ist z.B. besser als Kashmir .")
    assert [t.sentence for t in toks] == [0] * len(toks)
    # the ENGLISH tokenizer splits at z. / B. — this asymmetry is what
    # the multilang_ned oracle leans on
    en = tokenize("Knebworth ist z.B. besser als Kashmir .")
    assert en[-2].text == "Kashmir" and en[-2].sentence == 2


def test_german_ordinal_and_named_abbreviations():
    toks = tokenize_de("Im 19. Jahrhundert lebte Dr. Faust . Er war alt .")
    by_text = {t.text: t.sentence for t in toks}
    # ordinal 19. and Dr. keep sentence 0 open; the real stop advances
    assert by_text["Jahrhundert"] == 0
    assert by_text["Faust"] == 0
    assert by_text["Er"] == 1
    assert by_text["alt"] == 1


def test_german_spaced_period_is_a_real_stop():
    toks = tokenize_de("Der Satz endet z . Danach neu .")
    by_text = {t.text: t.sentence for t in toks}
    # "z ." (non-adjoining period) must NOT be treated as abbreviation
    assert by_text["Danach"] == 1


def test_multilingual_fallback_word_runs_only():
    toks = tokenize_multilingual("¡Hola, señor! ¿Qué tal?")
    assert [t.text for t in toks] == ["Hola", "señor", "Qué", "tal"]
    assert all(t.sentence == 0 for t in toks)
    # offsets point into the original text
    assert toks[0].begin == 1 and toks[0].end == 5


def test_arabic_route():
    from aida_ray.text.multilingual import tokenize_ar
    toks = tokenize_ar("ذهب محمد إلى برلين ؟ ثم عاد .")
    by_text = {t.text: t.sentence for t in toks}
    assert by_text["برلين"] == 0       # Arabic word run is ONE token
    assert by_text["ثم"] == 1          # Arabic question mark splits
    # mixed-script mention stays intact, offsets into the original
    toks2 = tokenize_for_lang("زار Knebworth اليوم", "ar")
    assert [t.text for t in toks2] == ["زار", "Knebworth", "اليوم"]
    assert toks2[1].begin == 4 and toks2[1].end == 13


def test_route_dispatch():
    text = "A b ."
    assert [t.text for t in tokenize_for_lang(text, "en")] == ["A", "b", "."]
    assert [t.text for t in tokenize_for_lang(text, "zh")] == ["A", "b"]
    assert [t.text for t in tokenize_for_lang(text, None)] == ["A", "b"]
    assert [t.text for t in tokenize_for_lang(text, "de-DE")] == \
        ["A", "b", "."]


def test_en_route_is_byte_identical_to_legacy_tokenizer():
    text = "Dr. Smith visited Berlin. He stayed for 3 days."
    assert tokenize_for_lang(text, "en") == tokenize(text)


def test_ned_actor_routes_instead_of_dropping(ray_session):
    """de page: the co-occurrence pair exists only under German rules;
    es page: the multilingual fallback still finds both mentions."""
    import ray.data

    from aida_ray.kb.fixture import build_fixture_kb
    from aida_ray.ned.settings import DisambiguationSettings
    from aida_ray.pipelines.kg import NedActor
    from aida_ray.state.broadcast import put_kb

    pages = pa.table({
        "url": ["http://x/de", "http://x/es", "http://x/en"],
        "text": ["Knebworth ist z.B. besser als Kashmir .",
                 "Knebworth vs Kashmir",
                 "Knebworth is better than Kashmir ."],
        "lang": ["de", "es", "en"]})
    actor = NedActor(put_kb(build_fixture_kb()),
                     settings=DisambiguationSettings(technique="prior"))
    out = actor(pages).to_pandas()
    for url in pages["url"].to_pylist():
        sub = out[out["url"] == url]
        assert (sub["pred"] == "mentionedIn").sum() == 2, url
        assert (sub["pred"] == "coOccursWith").sum() == 1, url
    # the legacy filter still works when explicitly requested
    strict = NedActor(put_kb(build_fixture_kb()),
                      settings=DisambiguationSettings(technique="prior"),
                      lang_filter="en", lang_route=False)
    out2 = strict(pages).to_pandas()
    assert set(out2["url"]) == {"http://x/en"}
    # and WITHOUT routing, the German page loses its co-occurrence pair
    unrouted = NedActor(put_kb(build_fixture_kb()),
                        settings=DisambiguationSettings(technique="prior"),
                        lang_route=False)
    out3 = unrouted(pages).to_pandas()
    de = out3[out3["url"] == "http://x/de"]
    assert (de["pred"] == "coOccursWith").sum() == 0


def test_arabic_clitic_segmentation():
    from aida_ray.text.multilingual import segment_ar_clitics, tokenize_ar

    # conjunction و splits off a >=3-letter remainder
    assert segment_ar_clitics("وباريس") == [("و", 0), ("باريس", 1)]
    # preposition ب/ل/ك splits only before the definite article ال
    assert segment_ar_clitics("بالقطار") == [("ب", 0), ("القطار", 1)]
    assert segment_ar_clitics("كالكتاب") == [("ك", 0), ("الكتاب", 1)]
    # bare ب+noun stays whole (no lexicon, so no split)
    assert segment_ar_clitics("برلين") == [("برلين", 0)]
    # genuine و-initial lemma is vetoed by the exception list
    assert segment_ar_clitics("ولاية") == [("ولاية", 0)]
    # short words never split
    assert segment_ar_clitics("ولد") == [("ولد", 0)]
    # chain: conjunction then preposition+article
    assert segment_ar_clitics("وبالقطار") == [
        ("و", 0), ("ب", 1), ("القطار", 2)]
    # mixed-script words are untouched
    assert segment_ar_clitics("وKnebworth") == [("وKnebworth", 0)]

    # tokenizer emits the segmented pieces with true offsets
    text = "وباريس جميلة"
    toks = tokenize_ar(text)
    assert [t.text for t in toks] == ["و", "باريس", "جميلة"]
    for t in toks:
        assert text[t.begin:t.end] == t.text


def test_arabic_attached_terminator_splits_sentence():
    from aida_ray.text.multilingual import tokenize_ar
    # terminator ATTACHED to the word must still end the sentence
    toks = tokenize_ar("ذهب إلى لندن؟ ثم عاد")
    by_text = {t.text: t.sentence for t in toks}
    assert by_text["لندن"] == 0 and by_text["؟"] == 0
    assert by_text["ثم"] == 1


def test_arabic_clitic_mention_detection(ray_session):
    """A dictionary surface hidden behind a proclitic is found only
    under clitic segmentation (the multilang_ned ar criterion)."""
    from aida_ray.kb.fixture import build_fixture_kb
    from aida_ray.ned.disambiguator import prepare_document
    from aida_ray.ned.settings import DisambiguationSettings
    kb = build_fixture_kb()
    kb.dictionary["كنبورث"] = list(kb.dictionary["KNEBWORTH"])
    kb.dictionary["الكشمير"] = list(kb.dictionary["KASHMIR"])
    doc = prepare_document(
        "u", "وكنبورث أفضل من بالكشمير ؟", kb,
        DisambiguationSettings(technique="prior", language="ar"))
    surfaces = sorted(m.mention for m in doc.mentions)
    assert surfaces == ["الكشمير", "كنبورث"]


def test_german_compound_head():
    from aida_ray.kb.fixture import build_fixture_kb
    from aida_ray.ned.doc import _german_compound_head
    kb = build_fixture_kb()
    # plain compound, linking element, hyphenated
    assert _german_compound_head("Knebworthfestival", kb) == "Knebworth"
    assert _german_compound_head("Knebworthsfestival", kb) == "Knebworth"
    assert _german_compound_head("Knebworth-gelaende", kb) == "Knebworth"
    # no dictionary modifier / lowercase / short -> no probe
    assert _german_compound_head("Donaudampfschiff", kb) is None
    assert _german_compound_head("knebworthfest", kb) is None
    assert _german_compound_head("Knebwort", kb) is None
    # head must be lowercase (two capitalized names joined is not a
    # compound in this rule set)
    assert _german_compound_head("KnebworthFestival", kb) is None


def test_german_compound_route_gated(ray_session):
    """Compound lookup fires on the de route only; the en route over
    the same text finds no pair (the german_compound_ned criterion)."""
    from aida_ray.kb.fixture import build_fixture_kb
    from aida_ray.ned.disambiguator import prepare_document
    from aida_ray.ned.settings import DisambiguationSettings
    kb = build_fixture_kb()
    text = "Das Knebworthfestival begeisterte , Kashmir auch ."
    de = prepare_document("u", text, kb,
                          DisambiguationSettings(language="de"))
    en = prepare_document("u", text, kb,
                          DisambiguationSettings(language="en"))
    assert sorted(m.mention for m in de.mentions) == \
        ["Kashmir", "Knebworth"]
    assert [m.mention for m in en.mentions] == ["Kashmir"]
    # the compound mention's span points at the modifier segment
    kn = next(m for m in de.mentions if m.mention == "Knebworth")
    assert text[kn.char_offset:kn.char_offset + kn.char_length] == \
        "Knebworth"


def test_zh_greedy_segmentation():
    """M2 zh route (r5 item 6): greedy forward maximum-match over CJK
    runs — longest lexicon word wins, unknown chars become single
    tokens, CJK terminators split sentences."""
    from aida_ray.text.multilingual import tokenize_zh
    lex = {"南京市", "长江大桥", "大桥", "北京大学"}
    toks = tokenize_zh("他在南京市长江大桥散步。北京大学很好", lex)
    assert [t.text for t in toks] == [
        "他", "在", "南京市", "长江大桥", "散", "步", "北京大学", "很", "好"]
    assert toks[3].sentence == 0 and toks[6].sentence == 1
    # offsets are exact char spans
    assert all(t.end - t.begin == len(t.text) for t in toks)


def test_zh_mention_needs_segmentation():
    """Negative control: a KB surface INSIDE an unbroken CJK run is
    invisible to the multilingual fallback (whole run = one token) and
    resolvable only under the zh dictionary-segmentation route."""
    from aida_ray.kb.fixture import build_fixture_kb
    from aida_ray.ned.doc import prepare
    kb = build_fixture_kb()
    kb.dictionary["克奈布沃思"] = list(kb.dictionary["KNEBWORTH"])
    kb.dictionary["克什米尔"] = list(kb.dictionary["KASHMIR"])
    text = "在克奈布沃思聆听克什米尔。"
    fallback = prepare("d", text, kb, language="fr")
    assert fallback.mentions == []
    zh = prepare("d", text, kb, language="zh")
    assert sorted(m.mention for m in zh.mentions) == ["克什米尔", "克奈布沃思"]
    assert all(m.sentence == 0 for m in zh.mentions)
