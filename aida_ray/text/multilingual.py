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


# Word-run class: \w plus the Arabic letter/diacritic/digit ranges but
# NOT the block's punctuation (؟ ؛ ، ۔ ٪ …, U+0600-060F/061B-061F/
# 066A-066D/06D4) — attached terminators must tokenize standalone so
# the sentence split sees them.
_AR_WORD = r"\wؐ-ؚؠ-٩ٮ-ۓە-ۿݐ-ݿ"
_AR_TOKEN_RE = re.compile(
    rf"[{_AR_WORD}]+"      # Arabic + Latin/digit word runs
    rf"|[^\s{_AR_WORD}]"   # standalone symbol
)
_AR_SENT_END = frozenset({".", "!", "?", "؟", "۔", "؛"})

_AR_LETTERS_RE = re.compile(r"[ء-ي]+$")
# Common genuine و/ف-initial lemmas that must NOT lose their first
# letter to the conjunction rule (the deterministic analogue of a
# statistical segmenter's lexicon veto; GERMAN_ABBREVIATIONS style).
AR_CONJ_EXCEPTIONS = frozenset({
    "ولاية", "وزير", "وزارة", "وقت", "والد", "واحد", "وسط",
    "فريق", "فرنسا", "فندق", "فكرة", "فترة",
})


def segment_ar_clitics(word: str) -> list[tuple[str, int]]:
    """Deterministic Arabic proclitic segmentation — (piece,
    relative_begin) list.  Rule-based stand-in for the reference's
    Stanford/ATB segmenter (``ArabicAnalyzer`` route):

    * conjunction ``و``/``ف`` splits off a ≥3-letter Arabic remainder
      (unless the whole word is a known genuine و/ف-initial lemma);
    * preposition ``ب``/``ل``/``ك`` splits when followed by the
      definite article ``ال`` (the ``بال/لل/كال``-pattern) — bare
      ``ب+noun`` stays whole (too many genuine ب-initial lemmas for a
      rule without a lexicon).

    Offsets are relative to the word start, so tokenizer offsets keep
    pointing into the original text (``text[t.begin:t.end] ==
    t.text`` still holds for every emitted piece)."""
    if not _AR_LETTERS_RE.fullmatch(word):
        return [(word, 0)]
    pieces: list[tuple[str, int]] = []
    rest, pos = word, 0
    if rest[0] in "وف" and len(rest) >= 4 and word not in AR_CONJ_EXCEPTIONS:
        pieces.append((rest[0], pos))
        pos += 1
        rest = rest[1:]
    if rest[0] in "بلك" and len(rest) >= 5 and rest[1:3] == "ال":
        pieces.append((rest[0], pos))
        pos += 1
        rest = rest[1:]
    pieces.append((rest, pos))
    return pieces


def tokenize_ar(text: str) -> list[Token]:
    """Arabic tokenizer (ARABIC_TOKENS route): word runs over the
    Arabic blocks + Latin/digits, proclitic segmentation
    (:func:`segment_ar_clitics` — ``و+``/``ف+`` conjunctions,
    ``ب/ل/ك+ال`` prepositions), sentence split on Latin AND Arabic
    terminators (``؟ ۔ ؛``).  Rule-based stand-in for the reference's
    Stanford Arabic pipeline; mentions/offsets/sentences behave
    identically to the other routes."""
    tokens: list[Token] = []
    sentence = 0
    pending_break = False
    i = 0
    for m in _AR_TOKEN_RE.finditer(text):
        if pending_break:
            sentence += 1
            pending_break = False
        for piece, rel in segment_ar_clitics(m.group()):
            tokens.append(Token(piece, m.start() + rel,
                                m.start() + rel + len(piece), i, sentence))
            i += 1
        if m.group() in _AR_SENT_END:
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


# ------------------------------------------------------------------ zh
_CJK_RE = re.compile(r"[㐀-鿿豈-﫿]+")
_ZH_SENT_END = frozenset("。！？!?")


def tokenize_zh(text: str, lexicon: frozenset[str] | set[str] | None
                = None, max_word: int = 8) -> list[Token]:
    """Chinese tokenizer: greedy forward maximum-match dictionary
    segmentation (the standard MM algorithm) over CJK runs, single
    characters where the lexicon has no match, and sentence splits on
    CJK terminators (。！？).

    The multilingual fallback emits each unbroken CJK run as ONE token
    (``\\w+`` — Lucene-StandardTokenizer semantics), so a dictionary
    surface INSIDE a longer run can never match; with a lexicon (the
    KB's CJK surfaces, see ned.doc.kb_cjk_lexicon) the run is split at
    known-word boundaries and multi-char surfaces become taggable
    tokens.  Deterministic; longest match wins, ties impossible."""
    tokens: list[Token] = []
    tid = 0
    sentence = 0
    last_end = 0
    lex = lexicon or frozenset()
    for m in _WORD_RE.finditer(text):
        # sentence enders between the previous token and this one
        sentence += sum(c in _ZH_SENT_END
                        for c in text[last_end:m.start()])
        last_end = m.end()
        run, base = m.group(), m.start()
        pos = 0
        for cm in _CJK_RE.finditer(run):
            # non-CJK prefix (latin digits etc.) → one token
            if cm.start() > pos:
                tokens.append(Token(run[pos:cm.start()], base + pos,
                                    base + cm.start(), tid, sentence))
                tid += 1
            seg, off = cm.group(), base + cm.start()
            i, n = 0, len(seg)
            while i < n:
                ln = 1
                for cand in range(min(max_word, n - i), 1, -1):
                    if seg[i:i + cand] in lex:
                        ln = cand
                        break
                tokens.append(Token(seg[i:i + ln], off + i,
                                    off + i + ln, tid, sentence))
                tid += 1
                i += ln
            pos = cm.end()
        if pos < len(run):
            tokens.append(Token(run[pos:], base + pos, base + len(run),
                                tid, sentence))
            tid += 1
    return tokens


TOKENIZERS = {
    "en": tokenize,
    "de": tokenize_de,
    "ar": tokenize_ar,
}


def tokenize_for_lang(text: str, lang: str | None,
                      lexicon=None) -> list[Token]:
    """Route by language code; unknown/missing codes take the
    multilingual fallback (TokenizerManager dispatch semantics).
    ``zh`` additionally takes a segmentation lexicon (the KB's CJK
    surfaces) — without one it degrades to the fallback's run-level
    tokens."""
    code = (lang or "").lower()[:2]
    if code == "zh":
        return tokenize_zh(text, lexicon)
    fn = TOKENIZERS.get(code, tokenize_multilingual)
    return fn(text)
