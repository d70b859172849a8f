"""Dunning G^2 collocations + Yule's K vs pure-python references."""

import math
import re

import numpy as np
import pyarrow as pa

import ray.data as rd


def _tokens(text):
    return [x for x in re.split(r"[^a-z0-9]+", text.lower()) if x]


def _py_llr(docs, min_count):
    big = {}
    for t in docs.values():
        ts = _tokens(t)
        for x, y in zip(ts, ts[1:]):
            big[(x, y)] = big.get((x, y), 0) + 1
    nn = float(sum(big.values()))
    n1, n2 = {}, {}
    for (x, y), c in big.items():
        n1[x] = n1.get(x, 0) + c
        n2[y] = n2.get(y, 0) + c

    def xlx(k, e):
        return k * math.log(k / e) if k > 0 else 0.0

    out = {}
    for (x, y), c in big.items():
        if c < min_count:
            continue
        a, b = float(n1[x]), float(n2[y])
        g2 = 2.0 * (xlx(c, a * b / nn)
                    + xlx(a - c, a * (nn - b) / nn)
                    + xlx(b - c, (nn - a) * b / nn)
                    + xlx(nn - a - b + c, (nn - a) * (nn - b) / nn))
        out[(x, y)] = round(g2, 6)
    return out


def test_bigram_llr_matches_reference(ray_session):
    from aida_ray.stages.lm import bigram_llr
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = {i: " ".join(rng.choice(vocab, rng.integers(5, 60)))
            for i in range(30)}
    # a strongly-associated planted pair should rank near the top
    for i in range(10):
        docs[100 + i] = "alpha beta " * 8
    ids = sorted(docs)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([docs[i] for i in ids])}))
    got = bigram_llr(ds, min_count=3, k=15).to_pandas()
    ref = _py_llr(docs, 3)
    for r in got.itertuples():
        assert ref[(r.t1, r.t2)] == r.llr
    # ranking matches the reference's top-15 by (llr desc, t1, t2)
    top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r.t1, r.t2) for r in got.itertuples()] == \
        [k for k, _ in top]
    assert (got.t1[0], got.t2[0]) in {("alpha", "beta"),
                                      ("beta", "alpha")}


def test_bigram_llr_empty_and_tiny(ray_session):
    from aida_ray.stages.lm import bigram_llr
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["solo", ""])}))
    got = bigram_llr(ds, min_count=1, k=5).to_pandas()
    assert len(got) == 0


def test_yules_k_reference_values(ray_session):
    from aida_ray.stages.textstats import yules_k_batch
    b = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a a a a",              # N=4, s2=16 -> K = 1e4*12/16 = 7500
            "a b c d",              # all hapax -> K = 0
            "",                     # empty -> 0s
            "x x y",                # N=3, s2=5 -> 1e4*2/9
        ])})
    got = yules_k_batch(b).to_pandas().set_index("doc_id")
    assert got.loc[0].n_tokens == 4 and got.loc[0].n_types == 1
    assert got.loc[0].yules_k == 7500.0
    assert got.loc[1].yules_k == 0.0 and got.loc[1].n_types == 4
    assert got.loc[2].n_tokens == 0 and got.loc[2].yules_k == 0.0
    assert got.loc[3].yules_k == round(1e4 * 2 / 9, 6)


def test_yules_k_distributed_matches_local(ray_session):
    from aida_ray.stages.textstats import yules_k_batch
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(9)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 40)))
             for _ in range(50)]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(texts)})
    local = yules_k_batch(t).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    dist = rd.from_arrow(t).repartition(7) \
        .map_batches(yules_k_batch, batch_format="pyarrow") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert dist.equals(local)
