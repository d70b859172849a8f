"""Noun-phrase keyphrase extraction (SURVEY M18).

Reference: keyphraseextraction/KeyphraseExtractor.java:28-100 — POS-regex
noun phrases + date patterns.  Without a POS tagger we use the
deterministic heuristics the patterns reduce to on news text: maximal
runs of capitalized words (allowing inner 'of/the/and'), plus number +
capitalized-month date phrases.  Pure function usable in map_batches.
"""

from __future__ import annotations

import re

from aida_ray.text.stopwords import is_stopword_or_symbol
from aida_ray.text.tokenizer import tokenize

_MONTHS = frozenset("January February March April May June July August "
                    "September October November December".split())
_INNER = frozenset({"of", "the", "and", "for", "de", "la"})
_DATE = re.compile(r"\b\d{1,2}\s+(?:" + "|".join(_MONTHS) + r")\s+\d{4}\b")


def extract_keyphrases(text: str, min_tokens: int = 1,
                       max_tokens: int = 6) -> list[str]:
    toks = tokenize(text)
    phrases: list[str] = []
    run: list[str] = []

    def flush() -> None:
        while run and run[-1].lower() in _INNER:
            run.pop()
        if min_tokens <= len(run) <= max_tokens and \
                not all(is_stopword_or_symbol(w) for w in run):
            phrase = " ".join(run)
            if any(w[0].isupper() for w in run):
                phrases.append(phrase)
        run.clear()

    for i, t in enumerate(toks):
        w = t.text
        if w[0].isupper() and not (i == 0 or toks[i - 1].text in ".!?") \
                and not is_stopword_or_symbol(w):
            run.append(w)
        elif w[0].isupper() and i == 0 and len(w) > 1:
            # sentence-initial capitalized word joins a following run only
            pass
        elif run and w.lower() in _INNER:
            run.append(w)
        else:
            flush()
    flush()
    phrases.extend(_DATE.findall(text))
    # dedup, keep order
    seen: set[str] = set()
    out = []
    for p in phrases:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out
