"""Property-based tests (hypothesis) for the byte-fidelity kernels.

The example-based suites pin known constructs; these push randomized
inputs through the same invariants the north rule depends on:
extraction round-trip, zh segmentation offset partition, multi-member
gzip reassembly, and mention-suffix trimming."""

import gzip

from hypothesis import given, settings
from hypothesis import strategies as st

# words over a crawl-ish alphabet, incl. the chars HTML escaping must
# protect and a few non-ASCII letters
_WORD = st.text(
    alphabet="abcdefgzXYZ019&<>éü'—", min_size=1, max_size=8).map(
    lambda s: s.strip()).filter(lambda s: s)
_LINE = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)
_TEXT = st.lists(_LINE, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_extract_round_trip(text):
    """wrap_text_as_html ∘ extract_text is the identity for any text
    without blank/edge whitespace — across ALL deterministic inline
    styles (comments, CDATA, scripts, numeric refs, nbsp, broken and
    unclosed tags)."""
    from aida_ray.text.extract import extract_text, wrap_text_as_html
    assert extract_text(wrap_text_as_html(text)) == text


@settings(max_examples=100, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                max_size=20))
def test_gunzip_members_round_trip(payloads):
    """Concatenated per-record gzip members reassemble exactly."""
    from aida_ray.sources.warc import _gunzip_members
    data = b"".join(gzip.compress(p, mtime=0) for p in payloads)
    assert _gunzip_members(data) == b"".join(payloads)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="的是在不了有人这上们来到时大地们为子中你"
               "ABCxyz012。！？, .", min_size=0, max_size=60),
       st.sets(st.text(alphabet="的是在不了有人这上们来", min_size=2,
                       max_size=4), max_size=8))
def test_zh_tokens_partition_their_runs(text, lexicon):
    """tokenize_zh invariants: token spans are in-order, disjoint,
    and exactly reproduce their source slices; CJK runs are fully
    covered (no character lost); every multi-char CJK token is a
    lexicon word."""
    from aida_ray.text.multilingual import _CJK_RE, tokenize_zh
    toks = tokenize_zh(text, lexicon)
    prev_end = 0
    for t in toks:
        assert t.begin >= prev_end
        assert text[t.begin:t.end] == t.text
        prev_end = t.end
        if len(t.text) > 1 and _CJK_RE.fullmatch(t.text):
            assert t.text in lexicon
    covered = sum(t.end - t.begin for t in toks)
    import re
    expected = sum(len(m.group()) for m in re.finditer(r"\w+", text))
    assert covered == expected


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="ABCabc'-’sS", min_size=1, max_size=12))
def test_trim_surface_len_bounds(surface):
    """trim never grows a surface, never empties one, and is
    idempotent."""
    from aida_ray.ned.doc import trim_surface_len
    n = trim_surface_len(surface)
    assert 0 < n <= len(surface)
    assert trim_surface_len(surface[:n]) == n
