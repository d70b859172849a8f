"""Noun-phrase keyphrase extraction (SURVEY M18).

Reference: keyphraseextraction/KeyphraseExtractor.java:28-100 — POS-regex
noun phrases + date patterns.  Two implementations:

- ``extract_keyphrases``: the round-1 heuristic (maximal capitalized
  runs, allowing inner 'of/the/and', plus date phrases);
- ``extract_keyphrases_pos``: a faithful port of the reference's NP
  regex GRAMMAR over POS-tag strings (nounPhrase / nounPhraseIN /
  nounPhraseJJ2 / nounPhraseDT / nounPhraseTT — Justeson & Katz 1995),
  with a deterministic rule-based tagger standing in for Stanford POS
  (same deviation class as the tokenizer replacement, SURVEY §7.5).
  Matches are found on the joined tag string and mapped back to word
  indices exactly like WordSequence.TagStringPosToSequencePos.
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


# ------------------------------------------------- POS-regex grammar port

# the five patterns, verbatim from KeyphraseExtractor.java:30-52
_NOUN = r"NNS?\s?"
_ADJ = r"JJ\s"
_PREP = r"IN\s"
_NP = r"(NNP\s?){1,}(NNPS\s?){0,}(NNS\s?){0,}(NN\s?){0,}(NNP\s?){0,}(NNPS\s?){0,}(NNS\s?){0,}"
_NP_IN = r"(NNP\s){1,}(IN\s?){1}(NNP\s?){1,}"
_NP_JJ = r"(JJ\s){1}(NNP\s?){1,}"
_NP_DT = r"((?=[^A-Z])DT\s){1}(NNP\s?){1,}"
_NP_TT = (r"((" + _ADJ + "|" + _NOUN + r")+|((" + _ADJ + "|" + _NOUN +
          r")*(" + _NOUN + _PREP + r")?)(" + _ADJ + "|" + _NOUN +
          r")+)NNS?")
_NP_PATTERNS = [re.compile(p) for p in (_NP, _NP_IN, _NP_JJ, _NP_DT, _NP_TT)]

_PREPOSITIONS = frozenset(
    "of in on at for with from by to under over into through between".split())
_DETERMINERS = frozenset("a an the this that these those".split())
_ADJ_SUFFIXES = ("al", "ous", "ive", "ic", "ary", "ful", "less", "able",
                 "ible", "ish", "ent", "ant")
# closed-class non-nouns (verbs/auxiliaries/pronouns/adverbs/conjunctions)
# — the heuristic tagger's substitute for Stanford's VB*/PRP/RB tags;
# without it common verbs default to NN and noun phrases over-extend
_FUNCTION_WORDS = frozenset(
    "be is are was were been being am do does did done have has had "
    "having say says said will would can could shall should may might "
    "must it he she they them him her his their its we you i me us our "
    "your there here when where while because although though if then "
    "than as and or but nor not no yes so too very now later also just "
    "only both each any some all more most other another such what "
    "which whom whose why how gaining warned published probably "
    "against about".split())


def _pos_tag(word: str, sentence_initial: bool) -> str:
    """Deterministic heuristic tagger feeding the NP grammar (stand-in
    for Stanford ENGLISH_POS; documented deviation)."""
    if not word:
        return "."
    if not any(c.isalnum() for c in word):
        return "."
    if word[0].isdigit():
        return "CD"
    lw = word.lower()
    if lw in _DETERMINERS:
        return "DT" if word[0].islower() else "DT_CAP"
    if lw in _PREPOSITIONS and word[0].islower():
        return "IN"
    if lw in _FUNCTION_WORDS and word[0].islower():
        return "VB"          # closed-class non-noun: never inside an NP
    if word[0].isupper():
        if not sentence_initial:
            return "NNPS" if len(word) > 3 and word.endswith("s") else "NNP"
        # sentence-initial capitalization is ambiguous; treat as common
        lw_tag = "NNS" if len(word) > 3 and word.endswith("s") else "NN"
        return lw_tag
    if lw.endswith(_ADJ_SUFFIXES) and len(lw) > 4:
        return "JJ"
    if len(lw) > 3 and lw.endswith("s"):
        return "NNS"
    return "NN"


def extract_keyphrases_pos(text: str) -> list[str]:
    """Apply the reference's NP regexes over the tag string per sentence
    (gatherKeyphrases, KeyphraseExtractor.java:107-200) + date phrases."""
    toks = tokenize(text)
    # split into sentences
    sentences: list[list] = []
    cur = -1
    for t in toks:
        if t.sentence != cur:
            sentences.append([])
            cur = t.sentence
        sentences[-1].append(t)
    phrases: list[str] = []
    for sent in sentences:
        words = [t.text for t in sent]
        tags = [_pos_tag(w, i == 0) for i, w in enumerate(words)]
        # tag string with one space after each tag; char pos -> word index
        tag_str = ""
        pos2idx: dict[int, int] = {}
        for i, tag in enumerate(tags):
            pos2idx[len(tag_str)] = i
            tag_str += tag + " "
        for pat in _NP_PATTERNS:
            for m in pat.finditer(tag_str):
                start = m.start()
                if start not in pos2idx:   # mid-tag match — not a boundary
                    continue
                n_tags = len(m.group(0).split())
                w0 = pos2idx[start]
                phrase_words = words[w0:w0 + n_tags]
                # DT pattern keeps the determiner (book titles: "A Journey")
                if not phrase_words or \
                        all(is_stopword_or_symbol(w) for w in phrase_words):
                    continue
                phrases.append(" ".join(phrase_words))
    phrases.extend(_DATE.findall(text))
    seen: set[str] = set()
    out = []
    for p in phrases:
        if p not in seen:
            seen.add(p)
            out.append(p)
    return out
