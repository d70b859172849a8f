"""Unit tests: skipgram_pairs, snapshot_drift, anchor_term_index."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_skipgram_pairs_window(ray_session):
    from aida_ray.stages.community import skipgram_pairs
    # one walk 0->1->2->3, window 1: adjacent ordered pairs only
    w = _ds(pa.table({"walk_id": [0, 0, 0, 0],
                      "step": [0, 1, 2, 3],
                      "node": [10, 11, 12, 13]}))
    got = skipgram_pairs(w, window=1).to_pandas() \
        .sort_values(["center", "context"]).reset_index(drop=True)
    want = {(10, 11), (11, 10), (11, 12), (12, 11), (12, 13), (13, 12)}
    assert set(map(tuple, got[["center", "context"]].to_numpy())) == want
    assert (got["n"] == 1).all()


def test_skipgram_counts_accumulate(ray_session):
    from aida_ray.stages.community import skipgram_pairs
    # two walks produce the same (1,2) pair; window 2 reaches step+-2
    w = _ds(pa.table({"walk_id": [0, 0, 1, 1],
                      "step": [0, 1, 0, 1],
                      "node": [1, 2, 1, 2]}))
    got = skipgram_pairs(w, window=2).to_pandas()
    m = got.set_index(["center", "context"])["n"]
    assert m[(1, 2)] == 2 and m[(2, 1)] == 2


def test_snapshot_drift_jaccard(ray_session):
    from aida_ray.stages.webstats import snapshot_drift
    t = _ds(pa.table({
        "url_id": [0, 0, 1, 1, 2],
        "version": [0, 1, 0, 1, 0],
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["alpha beta gamma", "alpha beta delta",   # 2/4
                 "same same words", "same words",          # identical sets
                 "only old version"]}))                    # unpaired
    got = snapshot_drift(t).to_pandas().set_index("url_id")
    assert got.loc[0, "inter"] == 2 and got.loc[0, "union_size"] == 4
    assert abs(got.loc[0, "sim"] - 0.5) < 1e-9
    assert bool(got.loc[0, "changed"])
    assert got.loc[1, "sim"] == 1.0 and not bool(got.loc[1, "changed"])
    assert got.loc[2, "n_new"] == 0 and got.loc[2, "sim"] == 0.0
    assert bool(got.loc[2, "changed"])


def test_anchor_term_index_topk(ray_session):
    from aida_ray.stages.links import anchor_term_index
    html = (b'<a href="T1">big fish</a><a href="T1">big whale</a>'
            b'<a href="T1">tiny fish</a><a href="T2">solo</a>')
    pages = _ds(pa.table({"html": pa.array([html], pa.binary())}))
    got = anchor_term_index(pages, k=2).to_pandas()
    t1 = got[got["target"] == "T1"].sort_values("rank_idx")
    # counts: big=2, fish=2, tiny=1, whale=1 -> top2 = big, fish
    assert t1["term"].tolist() == ["big", "fish"]
    assert t1["n"].tolist() == [2, 2]
    t2 = got[got["target"] == "T2"]
    assert t2["term"].tolist() == ["solo"]
    assert t2["rank_idx"].tolist() == [1]
