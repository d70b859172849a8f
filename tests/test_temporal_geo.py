"""Interval conflicts + nearest-site geo join."""

import pyarrow as pa

import ray.data

from aida_ray.stages.geo import nearest_site
from aida_ray.stages.temporal import interval_conflicts


def _intervals(rows):
    s, p, o, st, en = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "subj": pa.array(list(s), pa.string()),
        "pred": pa.array(list(p), pa.string()),
        "obj": pa.array(list(o), pa.string()),
        "start": pa.array(list(st), pa.int64()),
        "end": pa.array(list(en), pa.int64())}))


def test_conflicts_overlap_and_canonical_order(ray_session):
    t = _intervals([
        ("x", "ledBy", "b", 10, 25),
        ("x", "ledBy", "a", 20, 35),     # overlaps the first
        ("x", "ledBy", "c", 40, 50),     # disjoint from both
        ("y", "ledBy", "a", 0, 5)])      # different slot
    out = interval_conflicts(t).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["obj_a"], r["obj_b"]) == ("a", "b")
    assert (r["overlap_start"], r["overlap_end"]) == (20, 25)


def test_conflicts_same_object_not_flagged(ray_session):
    t = _intervals([("x", "p", "a", 0, 10), ("x", "p", "a", 5, 15)])
    assert interval_conflicts(t).to_pandas().empty


def test_conflicts_touching_endpoints_count(ray_session):
    # closed intervals: e1 == s2 overlaps at a point
    t = _intervals([("x", "p", "a", 0, 10), ("x", "p", "b", 10, 20)])
    out = interval_conflicts(t).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["overlap_start"],
            out.iloc[0]["overlap_end"]) == (10, 10)


def test_nearest_site_and_tie_break(ray_session):
    sites = pa.table({
        "site": pa.array([2, 0, 1], pa.int64()),
        "x": pa.array([0, 10, 20], pa.int64()),
        "y": pa.array([0, 0, 0], pa.int64())})
    pts = ray.data.from_arrow(pa.table({
        "x": pa.array([1, 19, 5], pa.int64()),
        "y": pa.array([0, 0, 0], pa.int64())}))
    out = nearest_site(pts, sites).to_pandas()
    assert list(out["site"]) == [2, 1, 0]   # midpoint 5: tie 2 vs 0 -> 0?
    assert list(out["d2"]) == [1, 1, 25]


def test_nearest_site_tie_prefers_smaller_id(ray_session):
    sites = pa.table({
        "site": pa.array([7, 3], pa.int64()),
        "x": pa.array([0, 10], pa.int64()),
        "y": pa.array([0, 0], pa.int64())})
    pts = ray.data.from_arrow(pa.table({
        "x": pa.array([5], pa.int64()),
        "y": pa.array([0], pa.int64())}))
    out = nearest_site(pts, sites).to_pandas()
    assert out.iloc[0]["site"] == 3
