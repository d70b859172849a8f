"""Pronoun-antecedent resolution (coreference-lite).

The reference's EntityLookup pronoun-antecedent hook is disabled in
its own codebase (EntityLookup.java:110-112 commented out); this
stage fills that slot with a deterministic centering-style heuristic
(role parallelism + recency — the public Lappin & Leass / Centering
preference orders, stripped of parse trees):

- mentions are maximal capitalized-token runs, excluding pronouns and
  a determiner/stopword list (sentence-initial capitalization is
  ambiguous by design — documented seam, same as openie.py's POS
  heuristic);
- singular SUBJECT pronouns (he, she) resolve to the FIRST mention of
  the previous sentence (its preferred center);
- singular OBJECT pronouns (him, her) resolve to the LAST mention of
  the previous sentence (object parallelism);
- plural pronouns (they, them) resolve to EVERY mention of the
  previous sentence (one output row per member);
- it / its resolve by pure recency (nearest preceding mention,
  cross-sentence);
- when the preferred rule has no candidate, every pronoun falls back
  to the nearest preceding mention anywhere in the document;
  pronouns with no preceding mention at all emit nothing.

Scale shape: stateless ``map_batches`` over the document stream —
each doc resolves independently (coreference never crosses document
boundaries), so there is no shuffle and no state; output volume
tracks pronoun occurrences.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data

_SUBJ = {"he", "she"}
_OBJ = {"him", "her"}
_PLURAL = {"they", "them"}
_RECENCY = {"it", "its"}
_PRONOUNS = _SUBJ | _OBJ | _PLURAL | _RECENCY
_SKIP = {"the", "a", "an", "this", "that", "these", "those", "his",
         "our", "my", "your", "their", "and", "or", "but", "if",
         "when", "then", "there", "here", "i", "we", "you"}

_TOKEN = re.compile(r"[A-Za-z0-9']+|[.!?]")
_BOUND = {".", "!", "?"}
_CAP = re.compile(r"^[A-Z][A-Za-z0-9']*$")


def resolve_pronouns(text: str) -> list[tuple[int, str, str]]:
    """(sent_idx, pronoun, antecedent) rows for one document."""
    toks = _TOKEN.findall(text)
    # split into sentences of (token, is_mentionable) keeping order
    sents: list[list[str]] = [[]]
    for t in toks:
        if t in _BOUND:
            if sents[-1]:
                sents.append([])
        else:
            sents[-1].append(t)
    if sents and not sents[-1]:
        sents.pop()

    # per-sentence mention lists (maximal capitalized runs) and a
    # flat preceding-mention list for recency fallback
    sent_mentions: list[list[str]] = []
    for sent in sents:
        runs, cur = [], []
        for t in sent:
            low = t.lower()
            if _CAP.match(t) and low not in _PRONOUNS \
                    and low not in _SKIP:
                cur.append(t)
            else:
                if cur:
                    runs.append(" ".join(cur))
                    cur = []
        if cur:
            runs.append(" ".join(cur))
        sent_mentions.append(runs)

    out: list[tuple[int, str, str]] = []
    seen: list[str] = []   # mentions seen so far, document order
    for si, sent in enumerate(sents):
        prev = sent_mentions[si - 1] if si > 0 else []
        # mentions of the current sentence enter `seen` token-by-token
        # so "nearest preceding" is position-accurate
        cur_run: list[str] = []
        for t in sent:
            low = t.lower()
            is_mention_tok = (_CAP.match(t) and low not in _PRONOUNS
                              and low not in _SKIP)
            if is_mention_tok:
                cur_run.append(t)
                continue
            if cur_run:
                seen.append(" ".join(cur_run))
                cur_run = []
            if low not in _PRONOUNS:
                continue
            if low in _PLURAL:
                cands = prev if prev else (seen[-1:] if seen else [])
                for c in cands:
                    out.append((si, low, c))
            elif low in _SUBJ:
                c = prev[0] if prev else (seen[-1] if seen else None)
                if c is not None:
                    out.append((si, low, c))
            elif low in _OBJ:
                c = prev[-1] if prev else (seen[-1] if seen else None)
                if c is not None:
                    out.append((si, low, c))
            else:  # it / its — pure recency
                if seen:
                    out.append((si, low, seen[-1]))
        if cur_run:
            seen.append(" ".join(cur_run))
    return out


def pronoun_antecedents(ds: ray.data.Dataset, id_col: str = "doc_id",
                        text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, sent_idx, pronoun, antecedent) rows per document."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        did, sidx, prn, ant = [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for si, p, a in resolve_pronouns(txt or ""):
                did.append(int(i))
                sidx.append(si)
                prn.append(p)
                ant.append(a)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "sent_idx": pa.array(sidx, pa.int64()),
            "pronoun": pa.array(prn, pa.string()),
            "antecedent": pa.array(ant, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
