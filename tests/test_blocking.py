"""Sorted-neighborhood blocking + Fellegi-Sunter scoring."""

import pyarrow as pa

import ray.data

from aida_ray.stages.blocking import linkage_scores, sorted_neighborhood


def test_snm_window_pairs(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "key": pa.array(["b", "a", "a", "c", "b", "a"], pa.string()),
        "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64())}))
    out = sorted_neighborhood(ds, "key", window=2).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    # sort order by (key, id): 1 2 5 0 4 3
    assert got == {(1, 2), (1, 5), (2, 5), (2, 0), (5, 0), (5, 4),
                   (0, 4), (0, 3), (4, 3)}


def test_snm_cross_bucket_replication(ray_session):
    # > W rows forces multi-bucket pairing; zero-padded keys make the
    # sort order equal to id order
    n = 2100
    ds = ray.data.from_arrow(pa.table({
        "key": pa.array([f"k{i:05d}" for i in range(n)], pa.string()),
        "id": pa.array(list(range(n)), pa.int64())})).repartition(8)
    out = sorted_neighborhood(ds, "key", window=2).to_pandas()
    assert len(out) == 2 * n - 3
    got = set(zip(out["id_a"], out["id_b"]))
    # bucket boundary at W = 1024: the cross-boundary pairs exist
    assert (1023, 1024) in got and (1022, 1024) in got
    assert (1023, 1025) in got


def test_linkage_scores_and_decisions(ray_session):
    pairs = ray.data.from_arrow(pa.table({
        "id_a": pa.array([1, 2, 3], pa.int64()),
        "id_b": pa.array([4, 5, 6], pa.int64()),
        "name_a": pa.array(["x", "x", "x"]),
        "name_b": pa.array(["x", "x", "y"]),
        "city_a": pa.array(["p", "q", "p"]),
        "city_b": pa.array(["p", "r", "r"])}))
    out = linkage_scores(
        pairs, {"name": (3.0, -2.0), "city": (2.0, -1.0)},
        upper=4.0, lower=1.0).to_pandas()
    assert list(out["score"]) == [5.0, 2.0, -3.0]
    assert list(out["decision"]) == ["match", "possible", "nonmatch"]
