"""Unit tests: numeric_consensus, entity_timeline, allen_relations."""

import numpy as np
import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_numeric_consensus_outliers(ray_session):
    from aida_ray.stages.truth import numeric_consensus
    # slot A: median 10, MAD 1, one far outlier (100)
    vals = [9.0, 10.0, 11.0, 10.0, 100.0]
    t = _ds(pa.table({"subj": ["A"] * 5 + ["B"] * 3,
                      "pred": ["p"] * 8,
                      "value": vals + [5.0, 5.0, 5.0]}))
    got = numeric_consensus(t).to_pandas().set_index("subj")
    a = got.loc["A"]
    assert a["n"] == 5 and a["med"] == 10.0 and a["mad"] == 1.0
    assert a["n_outliers"] == 1
    # slot B: MAD = 0, all equal -> zero outliers
    b = got.loc["B"]
    assert b["mad"] == 0.0 and b["n_outliers"] == 0


def test_numeric_consensus_mad_zero_disagreement(ray_session):
    from aida_ray.stages.truth import numeric_consensus
    # MAD 0 (3 of 5 equal) but two claims differ -> both are outliers
    t = _ds(pa.table({"subj": ["C"] * 5, "pred": ["p"] * 5,
                      "value": [7.0, 7.0, 7.0, 8.0, 6.0]}))
    got = numeric_consensus(t).to_pandas().iloc[0]
    assert got["med"] == 7.0 and got["mad"] == 0.0
    assert got["n_outliers"] == 2


def test_entity_timeline_order_and_gaps(ray_session):
    from aida_ray.stages.temporal import entity_timeline
    t = _ds(pa.table({"subj": ["x", "x", "x", "y"],
                      "ts": [30, 10, 10, 5],
                      "event": ["c", "b", "a", "z"]}))
    got = entity_timeline(t).to_pandas().sort_values(
        ["subj", "seq"]).reset_index(drop=True)
    x = got[got.subj == "x"]
    # ties on ts break by event string: a before b
    assert list(x["event"]) == ["a", "b", "c"]
    assert list(x["seq"]) == [1, 2, 3]
    assert list(x["gap"]) == [0, 0, 20]
    y = got[got.subj == "y"].iloc[0]
    assert y["seq"] == 1 and y["gap"] == 0


def test_allen_relations_all_seven(ray_session):
    from aida_ray.stages.temporal import allen_relations
    # consecutive sorted pairs crafted to hit each forward relation
    iv = [  # (obj, start, end)
        ("a", 0, 2), ("b", 5, 8),      # precedes
        ("c", 8, 12),                  # meets (b..c)
        ("d", 10, 20),                 # overlaps (c..d)
        ("e", 12, 20),                 # finished_by (d..e: 10<12, 20=20)
        ("f", 13, 15),                 # contains (e..f)
        ("g", 13, 18),                 # starts (f..g: 13=13, 15<18)
        ("h", 13, 18),                 # equals (g..h)
    ]
    t = _ds(pa.table({"subj": ["s"] * len(iv),
                      "obj": [o for o, *_ in iv],
                      "start": [s for _, s, _ in iv],
                      "end": [e for *_, e in iv]}))
    got = allen_relations(t).to_pandas()
    rels = dict(zip(zip(got.obj_a, got.obj_b), got.rel))
    assert rels[("a", "b")] == "precedes"
    assert rels[("b", "c")] == "meets"
    assert rels[("c", "d")] == "overlaps"
    assert rels[("d", "e")] == "finished_by"
    assert rels[("e", "f")] == "contains"
    assert rels[("f", "g")] == "starts"
    assert rels[("g", "h")] == "equals"
    assert len(got) == len(iv) - 1


def test_allen_single_interval_empty(ray_session):
    from aida_ray.stages.temporal import allen_relations
    t = _ds(pa.table({"subj": ["s"], "obj": ["a"],
                      "start": [0], "end": [1]}))
    assert allen_relations(t).count() == 0
