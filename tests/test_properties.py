"""Property-based tests (hypothesis) for the deterministic kernels."""

import hypothesis.strategies as st
from hypothesis import given, settings

from aida_ray.ned.context import min_cover
from aida_ray.ned.doc import manual_filter
from aida_ray.stages.dedup import _shingle_hashes, jaccard_shingles, ngram_jaccard
from aida_ray.text.extract import extract_text, wrap_text_as_html
from aida_ray.text.tokenizer import tokenize


@given(st.text(max_size=300))
@settings(max_examples=60, deadline=None)
def test_tokenizer_offsets_always_consistent(text):
    for t in tokenize(text):
        assert text[t.begin:t.end] == t.text
        assert t.end > t.begin


@given(st.lists(st.lists(st.integers(0, 60), min_size=1, max_size=5,
                         unique=True).map(sorted),
                min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_min_cover_reference_semantics(positions):
    """The reference's MinCoverCalculator is a greedy sweep that stops as
    soon as the window reaches the symbol count — it can miss the true
    optimum on overlapping positions (e.g. [[1],[0,1]] → 2, optimum 1).
    We reproduce ITS semantics, so assert its guarantees: a valid cover,
    never better than optimal, never worse than the full span."""
    mc = min_cover(positions)
    if len(positions) == 1:
        assert mc.length == 1
        return
    import itertools
    optimal = min(max(combo) - min(combo) + 1
                  for combo in itertools.product(*positions))
    span = max(max(p) for p in positions) - min(min(p) for p in positions) + 1
    assert optimal <= mc.length <= span
    # when no position is shared between symbols, the sweep is exact
    flat = [x for p in positions for x in p]
    if len(flat) == len(set(flat)):
        assert mc.length == optimal


_PLAIN = st.text(
    alphabet=st.characters(blacklist_characters="[]", max_codepoint=0x2000),
    max_size=120)


@given(_PLAIN, st.lists(st.tuples(_PLAIN, st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll"), max_codepoint=127),
    min_size=1, max_size=10)), max_size=3))
@settings(max_examples=60, deadline=None)
def test_manual_filter_offsets_property(prefix, pieces):
    raw = prefix
    for gap, name in pieces:
        raw += f"[[{name}]]" + gap
    cleaned, mentions = manual_filter(raw)
    assert "[[" not in cleaned
    for m in mentions:
        assert cleaned[m.char_offset:m.char_offset + m.char_length] == m.mention


@given(st.lists(st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           max_codepoint=127), min_size=1, max_size=12),
    min_size=1, max_size=40))
@settings(max_examples=40, deadline=None)
def test_extract_roundtrip_property(words):
    text = " ".join(words)
    assert extract_text(wrap_text_as_html(text)) == text


@given(st.text(min_size=0, max_size=200), st.text(min_size=0, max_size=200))
@settings(max_examples=40, deadline=None)
def test_jaccard_bounds(a, b):
    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    if a and a == b:
        assert ngram_jaccard(a, a) == 1.0
    js = jaccard_shingles(a or "x", b or "y")
    assert 0.0 <= js <= 1.0


@given(st.text(min_size=1, max_size=300))
@settings(max_examples=40, deadline=None)
def test_shingle_hashes_deterministic(text):
    a = _shingle_hashes(text)
    b = _shingle_hashes(text)
    assert (a == b).all()
    assert (a >= 0).all()
