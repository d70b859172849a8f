"""Hearst-pattern is-a (hypernym) triple extraction.

The classic lexico-syntactic patterns (Hearst 1992) re-expressed as a
deterministic word-level rule set — the KG-construction companion to
the pipeline's co-occurrence triples: ``X such as A, B and C`` /
``such X as A`` / ``A or other X`` / ``A and other X`` /
``X, including A`` / ``X, especially A`` each yield
``(hyponym, isa, hypernym)`` rows.

Contract: noun phrases are single lowercase word tokens
(``[a-z][a-z0-9]*``) — the same simplification the synthetic corpus
and SQL oracle share; input text is lowercased before matching.
Patterns are compiled once at module import; matching is a stateless
``map_batches`` stage (parse-bound like text/extract.py — the per-row
regex scan IS the work, there is no vectorized alternative for
backreference-free multi-pattern extraction in Arrow).

Scale shape: stateless map over the corpus stream, output volume
tracks pattern occurrences (<< corpus bytes); no shuffle, no state.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data

_WORD = r"[a-z][a-z0-9]*"
# word list: "a", "a, b", "a, b and c", "a or b" ... — trailing and/or
# joiner optional, Oxford comma tolerated
_LIST = rf"{_WORD}(?:\s*,\s*{_WORD})*(?:\s*,?\s*(?:and|or)\s+{_WORD})?"

_PATTERNS: list[tuple[str, re.Pattern, int, int]] = [
    # (name, regex, hypernym group, hyponym-list group)
    ("such_as", re.compile(rf"\b({_WORD})\s+such\s+as\s+({_LIST})"), 1, 2),
    ("such_n_as", re.compile(rf"\bsuch\s+({_WORD})\s+as\s+({_LIST})"), 1, 2),
    ("or_other",
     re.compile(rf"\b({_LIST})\s*,?\s+or\s+other\s+({_WORD})"), 2, 1),
    ("and_other",
     re.compile(rf"\b({_LIST})\s*,?\s+and\s+other\s+({_WORD})"), 2, 1),
    ("including",
     re.compile(rf"\b({_WORD})\s*,\s*including\s+({_LIST})"), 1, 2),
    ("especially",
     re.compile(rf"\b({_WORD})\s*,\s*especially\s+({_LIST})"), 1, 2),
]

_SPLIT = re.compile(r"\s*,\s*|\s+")
_JOINERS = {"and", "or", ""}


def _extract_row(text: str) -> list[tuple[str, str, str]]:
    """(hyponym, hypernym, pattern) tuples for one document."""
    out = []
    low = text.lower()
    for name, rx, hyper_g, list_g in _PATTERNS:
        for m in rx.finditer(low):
            hyper = m.group(hyper_g)
            for hypo in _SPLIT.split(m.group(list_g)):
                if hypo not in _JOINERS:
                    out.append((hypo, hyper, name))
    return out


def hearst_isa(ds: ray.data.Dataset, id_col: str = "doc_id",
               text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, hypo, hyper, pattern) rows from Hearst patterns."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        ids_out, hypos, hypers, pats = [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for hypo, hyper, pat in _extract_row(txt or ""):
                ids_out.append(int(i))
                hypos.append(hypo)
                hypers.append(hyper)
                pats.append(pat)
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "hypo": pa.array(hypos, pa.string()),
            "hyper": pa.array(hypers, pa.string()),
            "pattern": pa.array(pats, pa.string())})

    return ds.map_batches(batch, batch_format="pyarrow")


# ------------------------------------------------------------------
# Acronym definitions — the "long form (SHORT)" convention of
# Schwartz & Hearst (PSB 2003), restricted to the initial-letters
# rule (each short-form character is the initial of the corresponding
# preceding word) so the SQL oracle can reconstruct matches exactly —
# deterministic, no model.

_PAREN_RE = re.compile(r"\(([A-Za-z][A-Za-z0-9]{1,9})\)")
_WORD_RE = re.compile(r"[A-Za-z0-9]+")


def _valid_short(short: str) -> bool:
    return 2 <= len(short) <= 10 and short[0].isalpha() and \
        any(c.isupper() for c in short)


def acronym_pairs(text: str) -> list[tuple[str, str]]:
    """(short, long) definition pairs via the initial-letters rule:
    take the |short| words before '(SHORT)'; the k-th word must start
    with the k-th character of the short form (case-insensitive).
    Simpler than full Schwartz-Hearst inner-character matching but
    exactly reconstructable in SQL — the deterministic contract."""
    out = []
    for m in _PAREN_RE.finditer(text):
        short = m.group(1)
        if not _valid_short(short):
            continue
        words = _WORD_RE.findall(text[:m.start()])
        k = len(short)
        if len(words) < k:
            continue
        cand = words[-k:]
        if all(w[0].lower() == c.lower() for w, c in zip(cand, short)):
            out.append((short, " ".join(cand)))
    return out


def acronym_definitions(ds: ray.data.Dataset, id_col: str = "doc_id",
                        text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, short, long) rows — a per-document acronym dictionary
    for mention normalization (expand 'WHO' to its in-document long
    form before candidate lookup).  Stateless parse-bound map like
    :func:`hearst_isa`."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        out_id, shorts, longs = [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for s, l in acronym_pairs(txt or ""):
                out_id.append(int(i))
                shorts.append(s)
                longs.append(l)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "short": pa.array(shorts, pa.string()),
                         "long": pa.array(longs, pa.string())})

    return ds.map_batches(batch, batch_format="pyarrow")


# ------------------------------------------------------------------
# Quotation attribution — the two canonical reported-speech frames,
# word-level deterministic like the Hearst patterns: speakers are 1-2
# capitalized tokens, quotes are double-quoted spans.

_QUOTE_AFTER = re.compile(
    r'"([^"]+)," said ((?:[A-Z][A-Za-z0-9]*)(?: [A-Z][A-Za-z0-9]*)?)')
_QUOTE_BEFORE = re.compile(
    r'((?:[A-Z][A-Za-z0-9]*)(?: [A-Z][A-Za-z0-9]*)?) said: "([^"]+)"')


def quote_attributions(text: str) -> list[tuple[str, str, str]]:
    """(speaker, quote, frame) tuples; frame is 'after' for
    '"...," said Name' and 'before' for 'Name said: "..."'."""
    out = [(m.group(2), m.group(1), "after")
           for m in _QUOTE_AFTER.finditer(text)]
    out += [(m.group(1), m.group(2), "before")
            for m in _QUOTE_BEFORE.finditer(text)]
    return out


def quotes(ds: ray.data.Dataset, id_col: str = "doc_id",
           text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, speaker, quote, frame) rows — (speaker, said, quote)
    triples for the KG.  Stateless parse-bound map."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        out_id, spk, qt, fr = [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for s, q, f in quote_attributions(txt or ""):
                out_id.append(int(i))
                spk.append(s)
                qt.append(q)
                fr.append(f)
        return pa.table({id_col: pa.array(out_id, pa.int64()),
                         "speaker": pa.array(spk, pa.string()),
                         "quote": pa.array(qt, pa.string()),
                         "frame": pa.array(fr, pa.string())})

    return ds.map_batches(batch, batch_format="pyarrow")


_DISAMBIG_HEAD = re.compile(r"^(.+?) may refer to:\s*$", re.M)
_DISAMBIG_ITEM = re.compile(r"^[-*]\s+(.+?)\s*$", re.M)


def disambiguation_pages(ds: ray.data.Dataset, id_col: str = "doc_id",
                         text_col: str = "text") -> ray.data.Dataset:
    """Disambiguation-page parsing: "X may refer to:" pages map one
    SURFACE to its ranked candidate senses — the editorial complement
    of anchor-statistics priors (links.anchor_priors); a KB bootstrap
    reads these into the mention→candidate dictionary.

    Emits (doc_id, surface, rank, candidate) with 1-based rank in
    page order; pages without the header emit nothing.

    Scale shape: stateless map_batches, two compiled-regex passes per
    page; output is list-length bounded."""

    def explode(b: pa.Table) -> pa.Table:
        ids, surf, rank, cand = [], [], [], []
        id_np = b[id_col].to_numpy(zero_copy_only=False)
        for i, t in zip(id_np, b[text_col].to_pylist()):
            if not t:
                continue
            m = _DISAMBIG_HEAD.search(t)
            if not m:
                continue
            s = m.group(1).strip()
            for k, item in enumerate(
                    _DISAMBIG_ITEM.findall(t[m.end():]), 1):
                ids.append(int(i))
                surf.append(s)
                rank.append(k)
                cand.append(item)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "surface": pa.array(surf, pa.string()),
                         "rank": pa.array(rank, pa.int64()),
                         "candidate": pa.array(cand, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")
