"""Tests for the generic fuzzy string join."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_fuzzy_join_recall_and_precision(ray_session):
    from aida_ray.stages.fuzzy_join import _trigrams, fuzzy_join
    right = pa.table({
        "rid": list(range(4)),
        "name": ["International Business Machines", "Monaco Grand Prix",
                 "University of Washington", "zzz unrelated zzz"]})
    # typo'd probes: one char dropped
    left = rd.from_arrow(pa.table({
        "lid": [10, 11, 12, 13],
        "q": ["Internationl Business Machines", "Monaco Grnd Prix",
              "University of Wshington", "totally different string"]}))
    out = fuzzy_join(left, right, "lid", "q", "rid", "name",
                     minsim=0.5).to_pandas()
    got = dict(zip(out.lid, out.rid))
    assert got == {10: 0, 11: 1, 12: 2}   # typos match, unrelated doesn't
    # sims are the exact trigram Jaccard (re-verify one pair)
    a = _trigrams("Monaco Grnd Prix")
    b = _trigrams("Monaco Grand Prix")
    inter = np.intersect1d(a, b).size
    expect = round(inter / (len(a) + len(b) - inter), 6)
    assert out[out.lid == 11].sim.iloc[0] == expect
