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


def test_extract_strips_inline_tags():
    # inline tags strip without inserting whitespace (the r3 _TAG_RE
    # shadowing regression broke exactly this)
    assert extract_text(b'<p>hello <a href="/x">link</a></p>') == "hello link"
    assert extract_text(b"<p>a <b><i>nest</i></b>ed</p>") == "a nested"
    assert extract_text(b'<p><span class="k">w</span>ord</p>') == "word"


def test_wrap_text_emits_inline_tags_and_roundtrips():
    """The synthetic corpus must exercise the full tag grammar: long
    paragraphs get deterministic inline tags AND still round-trip
    byte-identically — the fixture blind spot that hid the r3
    regression from the extract_text/pages oracles."""
    texts = [
        "EU rejects German call to boycott British lamb today.",
        "The story of Ada Lovelace involves engines and notes.",
        "alpha beta gamma delta epsilon zeta eta theta",
    ]
    saw_inline = False
    for t in texts:
        h = wrap_text_as_html(t)
        assert extract_text(h) == t
        if any(m in h for m in (b"<a href", b"<b>", b"<span")):
            saw_inline = True
    assert saw_inline


def test_broken_tag_strip_is_caught_by_fixture():
    """Negative control: re-introducing the r3 bug (whole-tag strip
    regex replaced by an opening-tag-name scan) must break the
    round-trip on generator output."""
    import re as _re

    from aida_ray.text import extract as ex
    good = ex._TAG_RE
    try:
        ex._TAG_RE = _re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)")
        broken = any(
            ex.extract_text(wrap_text_as_html(t)) != t
            for t in ["The story of Ada Lovelace involves engines and notes.",
                      "alpha beta gamma delta epsilon zeta eta theta"])
    finally:
        ex._TAG_RE = good
    assert broken


def test_tag_fingerprint_counts_inline_tags():
    from aida_ray.text.extract import tag_fingerprint
    fp = tag_fingerprint(b'<p>hello <a href="/x">link</a></p>')
    assert fp["n_tags"] == 2 and fp["n_distinct_tags"] == 2


def test_extract_strips_script_and_entities():
    html = b"<html><body><script>if (a<b) {}</script><p>x &amp; y</p></body></html>"
    assert extract_text(html) == "x & y"


def test_get_ngrams_golden():
    """StringUtilsTest.testGetNgrams (padded n-grams, exact sets)."""
    from aida_ray.text.strings import get_ngrams
    assert get_ngrams("a", 2) == {"_a", "a_"}
    assert get_ngrams("a", 1) == {"a"}
    assert get_ngrams("ab", 1) == {"a", "b"}
    assert get_ngrams("ab", 2) == {"_a", "ab", "b_"}
    assert get_ngrams("abcd", 3) == {"__a", "_ab", "abc", "bcd", "cd_", "d__"}


def test_jaccard_sets_golden():
    """MathUtilTest.testComputeJaccardSimilarity."""
    import pytest

    from aida_ray.text.strings import jaccard_sets
    assert jaccard_sets({1}, {1}) == pytest.approx(1.0, abs=0.01)
    assert jaccard_sets({1}, {2}) == pytest.approx(0.0, abs=0.01)
    assert jaccard_sets({1, 2}, {2, 3}) == pytest.approx(0.33, abs=0.01)


def test_keyphrase_extractor_reference_golden():
    """KeyphraseExtractorTest.testFindNames: the five golden noun
    phrases must be found, in the reference's order (Stanford POS is
    replaced by the deterministic rule tagger — same spans here)."""
    from aida_ray.ned.keyphrases import extract_keyphrases_pos
    text = ("The World Health Organization (WHO) says there has been a "
            "decline in the spread of Ebola in Liberia, the country "
            "hardest hit in the outbreak. The WHO's Bruce Aylward said "
            "it was confident the response to the virus was now gaining "
            "the upper hand. But he warned against any suggestion that "
            "the crisis was over. He said the new number of cases "
            "globally was 13,703 and that the death toll, to be "
            "published later on Wednesday, would probably pass 5,000.")
    got = extract_keyphrases_pos(text)
    want = ["World Health Organization", "Ebola", "Liberia",
            "Bruce Aylward", "upper hand"]
    assert all(w in got for w in want)
    order = [p for p in got if p in set(want)]
    assert order == want


def test_datetime_utils_golden():
    """DateTimeUtilsTest: day range over 1980-01-01..1980-03-13 has 73
    entries (leap year), index 31 = Feb 1; midnight rounding."""
    from datetime import datetime, timezone

    from aida_ray.text.strings import get_day_range, round_to_midnight

    def ms(y, m, d, hh=0, mm=0):
        return int(datetime(y, m, d, hh, mm,
                            tzinfo=timezone.utc).timestamp() * 1000)

    start, end = ms(1980, 1, 1), ms(1980, 3, 13)
    days = get_day_range(start, end)
    assert days[0] == start and days[-1] == end
    assert len(days) == 73
    assert days[31] == ms(1980, 2, 1)
    assert days[31] != ms(1980, 2, 1, 0, 1)
    assert round_to_midnight(ms(1980, 1, 1, 11, 11)) == ms(1980, 1, 1)


def test_main_content_drops_boilerplate():
    from aida_ray.text.extract import main_content
    h = (b'<html><body>'
         b'<div><a href="/1">home</a> <a href="/2">about page</a> '
         b'<a href="/3">contact us now</a></div>'
         b'<p>tiny</p>'
         b'<p>the actual article body with plenty of characters here</p>'
         b'<div>copyright 2026 <a href="/t">terms of use</a> '
         b'<a href="/p">privacy policy</a></div>'
         b'</body></html>')
    assert main_content(h) == \
        "the actual article body with plenty of characters here"


def test_main_content_multi_block_and_entities():
    from aida_ray.text.extract import main_content
    h = (b'<p>first paragraph long enough to clear the threshold</p>'
         b'<p>second paragraph &amp; also long enough to be kept ok</p>')
    assert main_content(h) == (
        "first paragraph long enough to clear the threshold\n"
        "second paragraph & also long enough to be kept ok")


def test_main_content_link_ratio_boundary():
    from aida_ray.text.extract import main_content
    # exactly half the characters inside anchors -> kept (<= ratio)
    half = '<p><a href="/x">aaaaaaaaaaaaaaaaaaaa</a>bbbbbbbbbbbbbbbbbbbb</p>'
    assert main_content(half) == "aaaaaaaaaaaaaaaaaaaabbbbbbbbbbbbbbbbbbbb"
    # one char more of link text -> dropped
    over = '<p><a href="/x">aaaaaaaaaaaaaaaaaaaaa</a>bbbbbbbbbbbbbbbbbbbb</p>'
    assert main_content(over) == ""


def test_main_content_script_and_comment_stripped():
    from aida_ray.text.extract import main_content
    h = (b'<script>var boilerplate = "this string is very long indeed";'
         b'</script><!-- a long comment that should never survive -->'
         b'<p>real content of respectable length for the filter</p>')
    assert main_content(h) == \
        "real content of respectable length for the filter"


def test_messy_html_constructs():
    """r5 item 5: the documented construct list in text/extract.py —
    each rule pinned directly."""
    from aida_ray.text.extract import extract_text
    assert extract_text(b"a 1 < 2 and 3 > 2 b") == "a 1 < 2 and 3 > 2 b"
    assert extract_text(b"x<script>if (a<b) {}</script>y") == "xy"
    assert extract_text(b"x<style>.c{}</style>y<script>to eof") == "xy"
    assert extract_text(b"<![CDATA[keep &amp; this]]>") == "keep & this"
    assert extract_text(b"<!-- <p>tags &amp; ents</p> -->z") == "z"
    assert extract_text(b"&#72;i &#x21;") == "Hi !"
    assert extract_text(b"&amp;#72;") == "&#72;"      # double-escape
    assert extract_text(b"&#2;bad &#xD800;refs") == "&#2;bad &#xD800;refs"
    assert extract_text(b'<a href="/x" <b>w</a>') == "w"
    assert extract_text(b"<b>unclosed word") == "unclosed word"
    assert extract_text(b"a&nbsp;b &mdash; c &rsquo;") == "a b — c ’"
    assert extract_text(b"<!DOCTYPE html><p>d</p>") == "d"


def test_inline_wrap_emits_messy_constructs():
    """The generator must actually exercise the new grammar: over many
    paragraphs every style (comment/CDATA/script/numref/nbsp/broken/
    unclosed) appears at least once, and each wrapped paragraph still
    round-trips."""
    from aida_ray.text.extract import _inline_wrap, extract_text
    seen = set()
    for k in range(400):
        para = " ".join(f"w{k}x{i}" for i in range(8))
        esc = para      # plain words need no escaping
        wrapped = _inline_wrap(esc)
        assert extract_text(f"<p>{wrapped}</p>") == para
        for marker, name in [("<!--", "comment"), ("CDATA", "cdata"),
                             ("<script>", "script"), ("&#", "numref"),
                             ("&nbsp;", "nbsp"), ('<a href="/x" <b>', "broken"),
                             ("<a href=\"/w/", "anchor"), ("<span", "span")]:
            if marker in wrapped:
                seen.add(name)
    assert {"comment", "cdata", "script", "numref", "nbsp", "broken",
            "anchor", "span"} <= seen, seen
