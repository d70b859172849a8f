"""ReVerb-style Open Information Extraction.

Re-expresses the ReVerb extractor (Fader, Soderland & Etzioni 2011,
"Identifying Relations for Open Information Extraction") as a
deterministic Ray Data stage — the open-vocabulary companion to the
pipeline's entity-linked triples (kg.py) and the Hearst is-a
extractor (hearst.py): each sentence yields ``(arg1, rel, arg2)``
rows where ``rel`` matches ReVerb's verb-centred pattern

    V | V P | V W* P       (longest match, leftmost)

with ``V`` a verb-group token run, ``P`` a preposition/particle and
``W`` a noun/adjective/adverb/determiner/pronoun.

Because no statistical POS tagger ships in this container, tags come
from a deterministic closed-class heuristic (function-word lexicons +
morphological suffix rules) — the same honest-seam strategy as
text/tokenizer.py.  Default tag is NOUN, which subsumes adjectives
into argument noun runs (documented simplification: args are maximal
noun runs, so "green tea" stays one argument).

Constraints kept from the paper (simplified forms):
- syntactic: a relation needs a noun-run argument on BOTH sides
  within the sentence; pronouns/determiners never form arguments, so
  pronoun-subject extractions drop out (lexical-constraint analogue);
- lexical: the W* infix is capped at ``max_infix`` tokens (default 4)
  — over-specified relations are discarded rather than emitted.

Scale shape: stateless ``map_batches`` over the corpus stream
(parse-bound like hearst.py — multi-pattern FSM per sentence IS the
work); output volume tracks verb occurrences << corpus bytes; no
shuffle, no state.  Relation-phrase normalization for downstream
aggregation is ``normalize_relation`` (strip adverbs + auxiliaries,
keep head verb + particles/prepositions), a scalar transform.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data

# ---------------------------------------------------------------- POS tagging
# one char per token: V verb, P prep/particle, D det, O pronoun,
# C conj, R adverb, N noun (default), X clause boundary

_DET = {"a", "an", "the", "this", "that", "these", "those", "each",
        "every", "some", "any", "no", "its", "his", "her", "their",
        "our", "my", "your"}
_PREP = {"of", "in", "on", "at", "to", "with", "for", "from", "by",
         "as", "into", "onto", "over", "after", "before", "under",
         "between", "against", "during", "about", "through", "across",
         "within", "without", "near", "since", "until",
         # phrasal-verb particles (ReVerb folds these into P)
         "up", "out", "off", "down", "away", "back"}
_PRON = {"he", "she", "it", "they", "we", "i", "you", "him", "her",
         "them", "us", "me", "who", "whom", "which", "what", "there"}
_CONJ = {"and", "or", "but", "nor", "so", "yet"}
_AUX = {"is", "are", "was", "were", "be", "been", "being", "am",
        "has", "have", "had", "do", "does", "did", "will", "would",
        "can", "could", "may", "might", "shall", "should", "must"}
# common open-class verbs whose base/3sg forms carry no -ed/-ing marker
_VERB = {"born", "set", "put", "made", "makes", "make", "won", "wins",
         "win", "owns", "own", "runs", "run", "ran", "leads", "lead",
         "led", "left", "leave", "wrote", "write", "writes", "stars",
         "star", "sells", "sell", "sold", "gives", "give", "gave",
         "takes", "take", "took", "holds", "hold", "held", "keeps",
         "keep", "kept", "knows", "know", "knew", "says", "say",
         "said", "sees", "see", "saw", "goes", "go", "went", "comes",
         "come", "came", "gets", "get", "got", "finds", "find",
         "found", "becomes", "become", "became", "means", "mean",
         "meant", "shows", "show", "likes", "like", "plays", "play",
         "works", "work", "lives", "live", "leaves", "builds",
         "build", "built", "grows", "grow", "grew", "teaches",
         "teach", "taught", "brings", "bring", "brought", "begins",
         "begin", "began", "pays", "pay", "paid", "meets", "meet",
         "met", "loses", "lose", "lost", "sits", "sit", "sat",
         "speaks", "speak", "spoke", "stands", "stand", "stood",
         "lies", "lie", "lay", "heads", "head", "chairs", "chair",
         "helps", "help", "uses", "use", "needs", "need", "wants",
         "want", "calls", "call", "tells", "tell", "told", "asks",
         "ask", "feels", "feel", "felt", "puts", "lets", "let",
         "begets", "beget"}

_TOKEN = re.compile(r"[a-z0-9']+|[.!?]")
_BOUND = {".", "!", "?"}


def _tag(tok: str) -> str:
    """One-char POS for a lowercase token (deterministic heuristic)."""
    if tok in _BOUND:
        return "X"
    if tok in _AUX or tok in _VERB:
        return "V"
    if tok in _PREP:
        return "P"
    if tok in _DET:
        return "D"
    if tok in _PRON:
        return "O"
    if tok in _CONJ:
        return "C"
    if tok.endswith("ly") and len(tok) > 3:
        return "R"
    if tok.endswith("ed") and len(tok) > 3:
        return "V"
    if tok.endswith("ing") and len(tok) > 5:
        return "V"
    return "N"


# ReVerb pattern over the tag string: V+ optionally followed by
# W* P (W = noun/adj/adv/det/pronoun; adjectives tag N here).
_REL = re.compile(r"V+(?:[NRDO]*P)?")


def _noun_run_left(tags: str, toks: list[str], end: int) -> str | None:
    """Maximal N-run whose last token is the nearest N at or before
    ``end`` (exclusive), skipping determiners/adverbs in between."""
    j = end - 1
    while j >= 0 and tags[j] in "DR":
        j -= 1
    if j < 0 or tags[j] != "N":
        return None
    i = j
    while i > 0 and tags[i - 1] == "N":
        i -= 1
    return " ".join(toks[i:j + 1])


def _noun_run_right(tags: str, toks: list[str], start: int) -> str | None:
    j = start
    while j < len(tags) and tags[j] in "DR":
        j += 1
    if j >= len(tags) or tags[j] != "N":
        return None
    i = j
    while j + 1 < len(tags) and tags[j + 1] == "N":
        j += 1
    return " ".join(toks[i:j + 1])


def extract_openie(text: str, max_infix: int = 4
                   ) -> list[tuple[str, str, str]]:
    """(arg1, rel, arg2) triples for one document (all sentences)."""
    toks_all = _TOKEN.findall(text.lower())
    out: list[tuple[str, str, str]] = []
    sent: list[str] = []
    for tok in toks_all + ["."]:
        if tok in _BOUND:
            if sent:
                out.extend(_extract_sentence(sent, max_infix))
                sent = []
            continue
        sent.append(tok)
    return out


def _extract_sentence(toks: list[str], max_infix: int
                      ) -> list[tuple[str, str, str]]:
    tags = "".join(_tag(t) for t in toks)
    out = []
    for m in _REL.finditer(tags):
        s, e = m.span()
        # lexical constraint: cap the W* infix between last V and the P
        seg = m.group()
        n_infix = sum(1 for c in seg if c in "NRDO")
        if n_infix > max_infix:
            continue
        arg1 = _noun_run_left(tags, toks, s)
        arg2 = _noun_run_right(tags, toks, e)
        if arg1 is None or arg2 is None:
            continue
        out.append((arg1, " ".join(toks[s:e]), arg2))
    return out


_AUX_STRIP = _AUX - {"born"}


def normalize_relation(rel: str) -> str:
    """Canonical relation phrase: drop leading auxiliaries (keep at
    least one token) and adverbs — 'was quickly born in' → 'born in'."""
    toks = rel.split()
    while len(toks) > 1 and toks[0] in _AUX_STRIP:
        toks = toks[1:]
    kept = [t for t in toks if _tag(t) != "R"] or toks
    return " ".join(kept)


def openie_triples(ds: ray.data.Dataset, id_col: str = "doc_id",
                   text_col: str = "text",
                   max_infix: int = 4) -> ray.data.Dataset:
    """(doc_id, arg1, rel, rel_norm, arg2) rows via the ReVerb pattern."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        did, a1, rl, rn, a2 = [], [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for arg1, rel, arg2 in extract_openie(txt or "", max_infix):
                did.append(int(i))
                a1.append(arg1)
                rl.append(rel)
                rn.append(normalize_relation(rel))
                a2.append(arg2)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "arg1": pa.array(a1, pa.string()),
            "rel": pa.array(rl, pa.string()),
            "rel_norm": pa.array(rn, pa.string()),
            "arg2": pa.array(a2, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
