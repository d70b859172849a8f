"""Entity salience scoring.

Which entities is a page ABOUT?  The public salience-feature family
(Dunietz & Gillick 2014, "A New Entity Salience Task with Millions of
Training Examples") reduced to its two strongest deterministic
features — mention frequency and first-mention position:

    score = tf + 1 / (1 + first_sent_idx)

per (doc, entity): an entity mentioned three times starting in the
headline sentence outranks one mentioned three times starting late,
and every extra mention adds a full point.  Mentions are maximal
capitalized-token runs excluding pronouns/stopwords (the same
documented seam as coref.py / openie.py).

Scale shape: stateless ``map_batches`` over the document stream; the
per-doc mention tally is a dict over that doc's mentions only; no
shuffle (salience is a per-document statistic — corpus-level entity
importance is the existing pagerank/priors path).
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.coref import _BOUND, _CAP, _PRONOUNS, _SKIP, _TOKEN


def doc_salience(text: str) -> list[tuple[str, int, int, float]]:
    """(entity, tf, first_sent_idx, score) rows for one document."""
    toks = _TOKEN.findall(text)
    sent = 0
    tf: dict[str, int] = {}
    first: dict[str, int] = {}
    cur: list[str] = []

    def flush():
        if cur:
            m = " ".join(cur)
            tf[m] = tf.get(m, 0) + 1
            first.setdefault(m, sent)
            cur.clear()

    for t in toks:
        if t in _BOUND:
            flush()
            sent += 1
            continue
        low = t.lower()
        if _CAP.match(t) and low not in _PRONOUNS and low not in _SKIP:
            cur.append(t)
        else:
            flush()
    flush()
    return [(m, n, first[m], round(n + 1.0 / (1.0 + first[m]), 6))
            for m, n in tf.items()]


def entity_salience(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, entity, tf, first_sent, score) rows."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        did, ent, tfs, fs, sc = [], [], [], [], []
        for i, txt in zip(ids, b[text_col].to_pylist()):
            for m, n, f, score in doc_salience(txt or ""):
                did.append(int(i))
                ent.append(m)
                tfs.append(n)
                fs.append(f)
                sc.append(score)
        return pa.table({
            "doc_id": pa.array(did, pa.int64()),
            "entity": pa.array(ent, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "first_sent": pa.array(fs, pa.int64()),
            "score": pa.array(sc, pa.float64()),
        })

    return ds.map_batches(batch, batch_format="pyarrow")
