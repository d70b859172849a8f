"""Language-routed tokenization (M2 parity).

The reference dispatches per language: ``TokenizerManager.java`` routes
``ENGLISH_TOKENS / GERMAN_TOKENS / ARABIC_TOKENS`` to per-language
Stanford pipelines and ``MULTILINGUAL`` to a Lucene ``StandardTokenizer``
(``src/mpi/tokenizer/data/TokenizerManager.java:44-70``,
``MultilingualTokenizer.java:12-33``).  This module is the Ray-native
registry: a page's ``lang`` column picks the tokenizer INSIDE the NED
actor — non-English pages are routed, not dropped.

- ``en``  → :func:`aida_ray.text.tokenizer.tokenize` (the byte-stable
  English regex tokenizer, sentence split on ``. ! ?``).
- ``de``  → :func:`tokenize_de`: same token inventory plus German
  sentence rules — a period does NOT end the sentence after a known
  abbreviation (``z.B. bzw. usw. Dr. Nr.`` …), after a single letter
  (the two halves of ``z.B.``-style abbreviations), or after a digit
  run (German ordinals: ``19. Jahrhundert``).
- anything else → :func:`tokenize_multilingual`: the
  ``StandardTokenizer`` analogue — Unicode word runs only, punctuation
  dropped, no sentence structure (Lucene emits none; the reference
  keeps every token in one stream).

All tokenizers emit the same :class:`~aida_ray.text.tokenizer.Token`
records (text, char offsets, token id, sentence id), so the whole
downstream NED stack (trie tagging, alignment, context ids) is
language-agnostic.
"""

from __future__ import annotations

import re

from aida_ray.text.tokenizer import _SENT_END, _TOKEN_RE, Token, tokenize

# German abbreviations whose trailing period must not split the
# sentence (case-sensitive match on the token BEFORE the period).
GERMAN_ABBREVIATIONS = frozenset({
    "bzw", "usw", "ca", "Dr", "Prof", "Nr", "Abs", "Abb", "Art",
    "bspw", "etc", "evtl", "ggf", "inkl", "max", "min", "sog", "St",
    "Str", "vgl", "Co", "GmbH",
})

_DIGITS_RE = re.compile(r"\d+$")


def tokenize_de(text: str) -> list[Token]:
    """German tokenizer: English token inventory + German sentence
    rules (abbreviation / single-letter / ordinal periods keep the
    sentence open).  Deterministic, locale-independent."""
    tokens: list[Token] = []
    sentence = 0
    pending_break = False
    prev_text: str | None = None
    for i, m in enumerate(_TOKEN_RE.finditer(text)):
        if pending_break:
            sentence += 1
            pending_break = False
        tok = Token(m.group(), m.start(), m.end(), i, sentence)
        tokens.append(tok)
        if tok.text in _SENT_END:
            abbrev = False
            if tok.text == "." and len(tokens) > 1 and prev_text:
                # the period must ADJOIN the abbreviation ("z.", not
                # "z ." — a spaced period is a real stop)
                adjoins = tokens[-2].end == tok.begin
                abbrev = adjoins and (
                    prev_text in GERMAN_ABBREVIATIONS
                    or (len(prev_text) == 1 and prev_text.isalpha())
                    or _DIGITS_RE.fullmatch(prev_text) is not None)
            pending_break = not abbrev
        prev_text = tok.text
    return tokens


_AR_TOKEN_RE = re.compile(
    r"[\w؀-ۿݐ-ݿ]+"      # Arabic + Latin/digit word runs
    r"|[^\s\w؀-ۿݐ-ݿ]"   # standalone symbol
)
_AR_SENT_END = frozenset({".", "!", "?", "؟", "۔", "؛"})


def tokenize_ar(text: str) -> list[Token]:
    """Arabic tokenizer (ARABIC_TOKENS route): word runs over the
    Arabic blocks + Latin/digits, sentence split on Latin AND Arabic
    terminators (``؟ ۔ ؛``).  Rule-based stand-in for the reference's
    Stanford Arabic pipeline — no clitic segmentation (documented
    seam), but mentions/offsets/sentences behave identically to the
    other routes."""
    tokens: list[Token] = []
    sentence = 0
    pending_break = False
    for i, m in enumerate(_AR_TOKEN_RE.finditer(text)):
        if pending_break:
            sentence += 1
            pending_break = False
        tok = Token(m.group(), m.start(), m.end(), i, sentence)
        tokens.append(tok)
        if tok.text in _AR_SENT_END:
            pending_break = True
    return tokens


_WORD_RE = re.compile(r"\w+", re.UNICODE)


def tokenize_multilingual(text: str) -> list[Token]:
    """Lucene-StandardTokenizer analogue: Unicode word runs only (no
    punctuation tokens), one sentence stream — the fallback route for
    languages without dedicated rules
    (``MultilingualTokenizer.java:12-33``)."""
    return [Token(m.group(), m.start(), m.end(), i, 0)
            for i, m in enumerate(_WORD_RE.finditer(text))]


TOKENIZERS = {
    "en": tokenize,
    "de": tokenize_de,
    "ar": tokenize_ar,
}


def tokenize_for_lang(text: str, lang: str | None) -> list[Token]:
    """Route by language code; unknown/missing codes take the
    multilingual fallback (TokenizerManager dispatch semantics)."""
    fn = TOKENIZERS.get((lang or "").lower()[:2], tokenize_multilingual)
    return fn(text)
