"""Bigram-LM scoring vs a pure-python reference (incl. short docs)."""

import math
import re

import numpy as np
import pyarrow as pa

import ray.data as rd


def _py_lm_scores(docs):
    toks = {i: [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
            for i, t in docs.items()}
    uni, big = {}, {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for x, y in zip(ts, ts[1:]):
            big[(x, y)] = big.get((x, y), 0) + 1
    v = len(uni)
    out = {}
    for i, ts in toks.items():
        nlls = [-math.log((big.get((x, y), 0) + 1) / (uni[x] + v))
                for x, y in zip(ts, ts[1:])]
        out[i] = (len(nlls),
                  round(sum(nlls) / len(nlls), 6) if nlls else 0.0)
    return out


def test_bigram_lm_matches_reference(ray_session):
    from aida_ray.stages.lm import bigram_lm_scores
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(20)]
    docs = {i: " ".join(rng.choice(vocab, rng.integers(2, 50)))
            for i in range(40)}
    docs[40] = "solo"          # one token -> 0 bigrams, avg_nll 0.0
    docs[41] = ""              # empty doc
    ids = sorted(docs)
    ds = rd.from_arrow(pa.table({
        "doc_id": np.array(ids, dtype="int64"),
        "text": [docs[i] for i in ids]})).repartition(4)
    out = bigram_lm_scores(ds).to_pandas().set_index("doc_id")
    ref = _py_lm_scores(docs)
    assert len(out) == len(ref)
    for i, (n, nll) in ref.items():
        assert out.loc[i, "n_bigrams"] == n
        assert abs(out.loc[i, "avg_nll"] - nll) < 1e-9
    assert out.loc[40, "n_bigrams"] == 0
    assert out.loc[41, "avg_nll"] == 0.0
