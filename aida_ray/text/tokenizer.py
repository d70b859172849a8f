"""Deterministic tokenizer + sentence splitter.

Replaces the reference's Stanford ``tokenize, ssplit`` pipeline
(src/mpi/tokenizer/data/Tokenizer.java:26-140) with a pure, version-free
regex tokenizer so that extracted text and token streams are byte-stable
across runs and machines (BASELINE.json per-row invariant).

Tokens carry character offsets into the ORIGINAL text, a running token
id, and a sentence id.  Words (incl. internal apostrophes/hyphens between
alphanumerics) are single tokens; every other non-space character is a
standalone symbol token.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"[A-Za-z0-9À-ɏ]+(?:['’-][A-Za-z0-9À-ɏ]+)*"  # word
    r"|\.\.\.|``|''|--"                                                   # multi-char symbols
    r"|[^\sA-Za-z0-9À-ɏ]"                                       # single symbol
)

_SENT_END = frozenset({".", "!", "?", "..."})


@dataclass
class Token:
    text: str
    begin: int          # char offset (inclusive)
    end: int            # char offset (exclusive)
    token_id: int       # running index in document
    sentence: int


def tokenize(text: str) -> list[Token]:
    """Tokenize with sentence ids. Deterministic, locale-independent."""
    tokens: list[Token] = []
    sentence = 0
    pending_break = False
    for i, m in enumerate(_TOKEN_RE.finditer(text)):
        if pending_break:
            sentence += 1
            pending_break = False
        tok = Token(m.group(), m.start(), m.end(), i, sentence)
        tokens.append(tok)
        if tok.text in _SENT_END:
            pending_break = True
    return tokens


def token_texts(tokens: list[Token]) -> list[str]:
    return [t.text for t in tokens]


def conflate_token(token: str) -> str:
    """Upper-case tokens of >= 4 chars before dictionary lookup.

    Reference: AidaManager.conflateToken (src/mpi/aida/AidaManager.java:279-285).
    """
    if len(token) >= 4:
        return token.upper()
    return token


_WS_RE = re.compile(r"\s+")


def normalize_whitespace(s: str) -> str:
    """Mention whitespace normalization (ner/normalizers/WhiteSpaceNormalizer.java)."""
    return _WS_RE.sub(" ", s).strip()
