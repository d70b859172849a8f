import pyarrow as pa
import pytest

from aida_ray.stages.kgqa import rdfs_type_entailment
from aida_ray.stages.temporal import validity_intervals


def test_validity_intervals_islands(ray_session):
    import ray.data
    # e1/worksAt: o1@[1,2], o2@[3], o1 AGAIN @[4,5] -> three intervals
    t = pa.table({
        "subj": pa.array(["e1"] * 5 + ["e2"], pa.string()),
        "pred": pa.array(["worksAt"] * 6, pa.string()),
        "obj": pa.array(["o1", "o1", "o2", "o1", "o1", "oz"], pa.string()),
        "ts": pa.array([1, 2, 3, 4, 5, 9], pa.int64())})
    out = validity_intervals(ray.data.from_arrow(t).repartition(3)) \
        .to_pandas().sort_values(["subj", "start_ts"]).reset_index(drop=True)
    got = [tuple(r) for r in
           out[["subj", "obj", "start_ts", "end_ts", "n_obs"]].itertuples(
               index=False)]
    assert got == [("e1", "o1", 1, 2, 2), ("e1", "o2", 3, 3, 1),
                   ("e1", "o1", 4, 5, 2), ("e2", "oz", 9, 9, 1)]


def test_validity_intervals_unordered_input(ray_session):
    import ray.data
    t = pa.table({
        "subj": pa.array(["s"] * 4, pa.string()),
        "pred": pa.array(["p"] * 4, pa.string()),
        "obj": pa.array(["b", "a", "b", "a"], pa.string()),
        "ts": pa.array([4, 1, 3, 2], pa.int64())})
    out = validity_intervals(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("start_ts").reset_index(drop=True)
    # ts order: a@1, a@2, b@3, b@4 -> two intervals
    assert list(out.obj) == ["a", "b"]
    assert list(out.start_ts) == [1, 3]
    assert list(out.end_ts) == [2, 4]


def test_validity_intervals_hot_group_guard(ray_session):
    import ray.data
    t = pa.table({
        "subj": pa.array(["s"] * 5, pa.string()),
        "pred": pa.array(["p"] * 5, pa.string()),
        "obj": pa.array(["a"] * 5, pa.string()),
        "ts": pa.array(range(5), pa.int64())})
    with pytest.raises(Exception, match="hot fact"):
        validity_intervals(ray.data.from_arrow(t),
                           group_size_limit=3).to_pandas()


def _entail_brute(types, edges):
    parent = dict(edges)
    out = set()
    for e, c in types:
        cur = c
        out.add((e, c))
        while cur in parent:
            cur = parent[cur]
            out.add((e, cur))
    return out


def test_rdfs_entailment_routes(ray_session):
    import ray.data
    types = [("e1", 4), ("e2", 2), ("e3", 1), ("e4", 4)]
    edges = [(2, 1), (3, 1), (4, 2), (5, 2)]
    tds = ray.data.from_arrow(pa.table({
        "entity": pa.array([t[0] for t in types], pa.string()),
        "cls": pa.array([t[1] for t in types], pa.int64())})).repartition(2)
    sds = ray.data.from_arrow(pa.table({
        "child": pa.array([e[0] for e in edges], pa.int64()),
        "parent": pa.array([e[1] for e in edges], pa.int64())}))
    want = _entail_brute(types, edges)
    small = rdfs_type_entailment(tds, sds).to_pandas()
    assert {(r.entity, int(r.cls)) for r in small.itertuples()} == want
    big = rdfs_type_entailment(tds, sds, broadcast_rows=1).to_pandas()
    assert {(r.entity, int(r.cls)) for r in big.itertuples()} == want
    # e1: 4 -> 2 -> 1 inferred; duplicates collapsed
    assert len(small) == len(want)


def test_burst_windows(ray_session):
    import numpy as np
    import ray.data
    from aida_ray.stages.timeseries import burst_windows
    # key A: windows 0 (2 events), 1 (6 events), 3 (1 event — window 2
    # empty and absent); key B: single window
    us = lambda w, off: w * 100 + off
    t = pa.table({
        "event_type": pa.array(["A"] * 9 + ["B"], pa.string()),
        "ts": pa.array([us(0, 1), us(0, 2)] + [us(1, i) for i in range(6)]
                       + [us(3, 0), us(0, 5)],
                       pa.timestamp("us"))})
    out = burst_windows(ray.data.from_arrow(t).repartition(3),
                        window_us=100).to_pandas() \
        .sort_values(["event_type", "w"]).reset_index(drop=True)
    a = out[out.event_type == "A"]
    assert list(a.w) == [0, 1, 3]
    assert list(a.n) == [2, 6, 1]
    assert list(a.prev) == [0, 2, 6]
    assert list(a.burst) == [round(2 / 1.0, 6),
                             round(4 / np.sqrt(3.0), 6),
                             round(-5 / np.sqrt(7.0), 6)]
    b = out[out.event_type == "B"]
    assert list(b.n) == [1] and list(b.prev) == [0]
