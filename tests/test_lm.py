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


def test_bigram_pmi_matches_bruteforce(ray_session):
    import math

    import pyarrow as pa
    import ray.data
    from aida_ray.stages.lm import bigram_pmi
    docs = {
        0: "strong coffee strong coffee strong coffee",
        1: "strong tea weak tea strong coffee",
        2: "coffee strong coffee strong coffee plain",
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string())})).repartition(2)
    out = bigram_pmi(ds, min_count=2, k=5).to_pandas()
    # brute force
    toks = {d: t.split() for d, t in docs.items()}
    uni, bi = {}, {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    nu = sum(uni.values())
    nb = sum(bi.values())
    want = []
    for (a, b), nab in bi.items():
        if nab >= 2:
            pmi = round(math.log(nab * nu * nu / (nb * uni[a] * uni[b])), 6)
            want.append((pmi, a, b, nab))
    want.sort(key=lambda r: (-r[0], r[1], r[2]))
    got = [(r.pmi, r.t1, r.t2, r.nab) for r in out.itertuples()]
    assert got == [(p, a, b, n) for p, a, b, n in want[:5]]
