"""Assertion modality / polarity tagging.

Web-extracted facts are only as good as the clause asserting them:
"X did not acquire Y" and "X may acquire Y" must not enter the KG as
confident positives.  This stage tags each sentence with

- ``polarity``: 'neg' when a negation cue appears (not, never,
  cannot, denies/denied, refutes/refuted, nor), else 'pos';
- ``modality``: 'uncertain' when a hedge/modal cue appears (may,
  might, could, allegedly, reportedly, possibly, perhaps, rumored,
  reportedly, supposedly, likely, unconfirmed), else 'asserted';

plus the first trigger token of each class (empty when none) — the
cue-word methodology of the public BioScope/FactBank negation and
hedge corpora, reduced to its lexical core.  Downstream, triple
extractors (openie.py, hearst.py) filter or down-weight on these
columns before fusion (fuse.noisy_or_fuse).

Scale shape: stateless ``map_batches``; per-sentence set membership
over module-level frozensets; no shuffle.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray
import ray.data

_NEG = frozenset({"not", "never", "cannot", "denies", "denied",
                  "refutes", "refuted", "nor"})
_HEDGE = frozenset({"may", "might", "could", "allegedly",
                    "reportedly", "possibly", "perhaps", "rumored",
                    "supposedly", "likely", "unconfirmed"})

_TOKEN = re.compile(r"[a-z0-9']+|[.!?]")
_BOUND = {".", "!", "?"}


def tag_modality(sentence_tokens: list[str]) -> tuple[str, str, str, str]:
    """(polarity, neg_trigger, modality, hedge_trigger) for one
    sentence's lowercase tokens."""
    neg = next((t for t in sentence_tokens if t in _NEG), "")
    hedge = next((t for t in sentence_tokens if t in _HEDGE), "")
    return ("neg" if neg else "pos", neg,
            "uncertain" if hedge else "asserted", hedge)


def sentence_modality(ds: ray.data.Dataset, id_col: str = "doc_id",
                      text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, sent_idx, polarity, neg_trigger, modality,
    hedge_trigger) rows, one per sentence."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        did, sidx, pol, ntr, mod, htr = [], [], [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            toks = _TOKEN.findall((txt or "").lower())
            sent: list[str] = []
            si = 0
            for t in toks + ["."]:
                if t in _BOUND:
                    if sent:
                        p, nt, m, ht = tag_modality(sent)
                        did.append(int(i))
                        sidx.append(si)
                        pol.append(p)
                        ntr.append(nt)
                        mod.append(m)
                        htr.append(ht)
                        si += 1
                        sent = []
                    continue
                sent.append(t)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "sent_idx": pa.array(sidx, pa.int64()),
            "polarity": pa.array(pol, pa.string()),
            "neg_trigger": pa.array(ntr, pa.string()),
            "modality": pa.array(mod, pa.string()),
            "hedge_trigger": pa.array(htr, pa.string()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
