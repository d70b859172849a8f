"""Unit tests for NED components: mention detection, min-cover, coherence,
hill-climbing RNG parity."""

import pytest

from aida_ray.ned.cocktail import JavaRandom
from aida_ray.ned.coherence import milne_witten
from aida_ray.ned.context import InvertedIndex, min_cover
from aida_ray.ned.doc import dictionary_tag, hybrid_merge, manual_filter, prepare
from aida_ray.text.tokenizer import tokenize


def test_manual_filter_offsets():
    text = "When [[Page]] played [[Kashmir]] at Knebworth."
    cleaned, mentions = manual_filter(text)
    assert cleaned == "When Page played Kashmir at Knebworth."
    assert [(m.mention, m.char_offset, m.char_length) for m in mentions] == [
        ("Page", 5, 4), ("Kashmir", 17, 7)]
    for m in mentions:
        assert cleaned[m.char_offset:m.char_offset + m.char_length] == m.mention


def test_manual_filter_unclosed():
    cleaned, mentions = manual_filter("open [[tag never closes")
    assert cleaned == "open [[tag never closes"
    assert mentions == []


def test_dictionary_tag_longest_match(fixture_kb):
    text = "Les Paul met Page in Kashmir."
    toks = tokenize(text)
    found = dictionary_tag(text, toks, fixture_kb)
    assert [(m.mention, m.start_token, m.end_token) for m in found] == [
        ("Les Paul", 0, 1), ("Page", 3, 3), ("Kashmir", 5, 5)]


def test_dictionary_tag_skips_lowercase(fixture_kb):
    # 'page' lowercase conflates to 'page' (3 chars... no) — lowercase first
    # char is not name-like, so no tag.
    text = "a page about kashmir"
    found = dictionary_tag(text, tokenize(text), fixture_kb)
    assert found == []


def test_hybrid_merge_manual_wins(fixture_kb):
    text = "Page played Page."
    toks = tokenize(text)
    auto = dictionary_tag(text, toks, fixture_kb)
    manual = [auto[0]]  # pretend first is manual
    manual[0].manual = True
    merged = hybrid_merge(manual, auto)
    assert len(merged) == 2


def test_prepare_doc(fixture_kb):
    doc = prepare("d", "When [[Page]] played Kashmir.", fixture_kb)
    assert [m.mention for m in doc.mentions] == ["Page", "Kashmir"]
    assert len(doc.token_ids) == len(doc.tokens)


def test_inverted_index_mention_exclusion():
    # tokens: ids 5 1 7 5, stopword id 1
    idx = InvertedIndex([5, 1, 7, 5], frozenset({0, 1}))
    # word 5 occurs at raw 0,3 / no-stop 0,2
    assert idx.contains_word(5, 0, 0)            # occurrence at 3 outside span
    assert not idx.contains_word(1, 2, 2)        # stopword never queryable
    # positions excluding the mention at [0,0]: raw pos 3 -> no-stop 2,
    # shifted left by the mention token length (1) -> 1
    assert idx.positions(5, 0, 0) == [1]
    # mention at [3,3]: raw pos 0 kept as-is
    assert idx.positions(5, 3, 3) == [0]


def test_min_cover_single():
    mc = min_cover([[2, 9]])
    assert mc.length == 1


def test_min_cover_window():
    # symbols at {0, 10}, {1}, {2, 11} -> best window [0..2] length 3
    mc = min_cover([[0, 10], [1], [2, 11]])
    assert mc.length == 3
    assert mc.start_positions[0] == 0
    assert mc.end_positions[0] == 2


def test_min_cover_spread():
    mc = min_cover([[0], [5]])
    assert mc.length == 6


def test_milne_witten(fixture_kb):
    kb = fixture_kb
    jp = kb.entity2id["Jimmy_Page"]
    ks = kb.entity2id["Kashmir_(song)"]
    kash = kb.entity2id["Kashmir"]
    sim = milne_witten(kb, jp, ks)
    # overlap {Led_Zeppelin, Robert_Plant} = 2, sizes 4 and 3
    import math
    expected = 1 - (math.log(4) - math.log(2)) / (math.log(2651987) - math.log(3))
    assert sim == pytest.approx(expected)
    assert milne_witten(kb, jp, kash) == 0.0           # no overlap
    assert milne_witten(kb, jp, 99999) == 0.0          # unknown entity


def test_java_random_parity():
    # new java.util.Random(42).nextInt() == -1170105035 (well-known value);
    # sequences below are from the documented LCG spec.
    r = JavaRandom(42)
    v = r._next(32)
    assert v - (1 << 32) == -1170105035
    r = JavaRandom(42)
    assert [r.next_int(100) for _ in range(5)] == [30, 63, 48, 84, 70]
    r = JavaRandom(1337)
    assert [r.next_int(10) for _ in range(5)] == [1, 4, 9, 2, 9]


def test_trim_surface_len():
    """M9 mention normalizer additions (r5): possessive + adjectival
    hyphen-compound trims; legitimate hyphenated names untouched."""
    from aida_ray.ned.doc import trim_surface_len
    assert trim_surface_len("Pfizer's") == 6
    assert trim_surface_len("Page’s") == 4
    assert trim_surface_len("Munich-based") == 6
    assert trim_surface_len("state-owned") == 5
    assert trim_surface_len("Jean-Pierre") == 11     # cap tail kept
    assert trim_surface_len("Coca-Cola") == 9
    assert trim_surface_len("Tel Aviv") == 8         # no-op
    assert trim_surface_len("'s") == 2               # too short to trim


def test_capitalized_tag_temporal_filter():
    """Weekday/month runs are temporal expressions, not names; runs
    merely CONTAINING one keep it (e.g. 'May Department Stores')."""
    from aida_ray.ned.doc import capitalized_tag
    from aida_ray.text.tokenizer import tokenize
    text = "They met Tuesday in Geneva and again in June at the May Department Stores building."
    tokens = tokenize(text)
    got = {m.mention for m in capitalized_tag(text, tokens)}
    assert "Tuesday" not in got and "June" not in got
    assert "Geneva" in got
    assert "May Department Stores" in got


def test_dictionary_tag_trimmed_probe():
    """A dictionary surface glued to a possessive/hyphen tail still
    matches, with the emitted span covering only the name."""
    from types import SimpleNamespace

    from aida_ray.ned.doc import dictionary_tag
    from aida_ray.text.tokenizer import conflate_token, tokenize
    kb = SimpleNamespace(
        dictionary={conflate_token("Pfizer"): [(1, 1.0)],
                    conflate_token("Munich"): [(2, 1.0)]},
        mention_max_tokens=2)
    text = "It beat Pfizer's drug near the Munich-based lab."
    tokens = tokenize(text)
    got = {(m.mention, m.char_offset, m.char_length)
           for m in dictionary_tag(text, tokens, kb)}
    assert ("Pfizer", 8, 6) in got
    assert ("Munich", 31, 6) in got
