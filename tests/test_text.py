"""Tokenizer / extractor / stopword unit tests."""

from aida_ray.text.extract import extract_text, wrap_text_as_html
from aida_ray.text.stopwords import is_stopword_or_symbol
from aida_ray.text.tokenizer import conflate_token, normalize_whitespace, tokenize


def test_tokenize_offsets_roundtrip():
    text = "When Page played Kashmir at Knebworth, his Les Paul was uniquely tuned."
    toks = tokenize(text)
    assert [t.text for t in toks] == [
        "When", "Page", "played", "Kashmir", "at", "Knebworth", ",", "his",
        "Les", "Paul", "was", "uniquely", "tuned", "."]
    for t in toks:
        assert text[t.begin:t.end] == t.text
    assert [t.token_id for t in toks] == list(range(len(toks)))


def test_sentence_split():
    toks = tokenize("One two. Three four! Five?")
    sents = {}
    for t in toks:
        sents.setdefault(t.sentence, []).append(t.text)
    assert sents[0] == ["One", "two", "."]
    assert sents[1] == ["Three", "four", "!"]
    assert sents[2] == ["Five", "?"]


def test_conflate_token():
    # AidaManager.conflateToken: upper-case at length >= 4
    assert conflate_token("Page") == "PAGE"
    assert conflate_token("Les") == "Les"
    assert conflate_token("Les Paul") == "LES PAUL"
    assert conflate_token("aBc") == "aBc"


def test_normalize_whitespace():
    assert normalize_whitespace("  a \t b\n c ") == "a b c"


def test_stopwords():
    for w in ["when", "When", "at", "his", "was", "and", "the", ",", "."]:
        assert is_stopword_or_symbol(w), w
    for w in ["played", "tuned", "Kashmir", "uniquely", "festival"]:
        assert not is_stopword_or_symbol(w), w


def test_extract_roundtrip_byte_identical():
    text = "EU rejects German call to boycott British lamb.\nSecond para with 5 < 7 & more."
    html = wrap_text_as_html(text)
    assert extract_text(html) == text


def test_extract_strips_script_and_entities():
    html = b"<html><body><script>if (a<b) {}</script><p>x &amp; y</p></body></html>"
    assert extract_text(html) == "x & y"
