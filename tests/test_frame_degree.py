"""Unit tests for the ROWS-frame sliding aggregate and the bipartite
degree-distribution plan: pandas parity + blocking invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _events(n=500, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 20, n),
        "event_type": rng.choice(["a", "b", "c", "d"], n),
        "ts": pa.array(
            [np.datetime64("2024-01-01", "us")
             + np.timedelta64(int(s), "s")
             for s in rng.integers(0, 100_000, n)], pa.timestamp("us")),
        "value": np.round(rng.uniform(-50, 150, n), 2),
    })


def test_sliding_frame_matches_pandas(ray_session):
    from aida_ray.stages.windows import sliding_frame_sum
    ev = _events()
    out = sliding_frame_sum(rd.from_arrow(ev).repartition(4),
                            frame=3) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    df = ev.to_pandas()
    df["cents"] = (np.floor(np.abs(df.value) * 100 + 0.5)
                   * np.sign(df.value)).astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"])
    ref = df.groupby("user_id", group_keys=False).apply(
        lambda g: pd.DataFrame({
            "event_id": g.event_id,
            "frame_sum_cents": g.cents.rolling(3, min_periods=1).sum()
            .astype("int64"),
            "frame_n": g.cents.rolling(3, min_periods=1).count()
            .astype("int64")}), include_groups=False) \
        .sort_values("event_id").reset_index(drop=True)
    assert out.frame_sum_cents.tolist() == ref.frame_sum_cents.tolist()
    assert out.frame_n.tolist() == ref.frame_n.tolist()


def test_sliding_frame_blocking_invariant(ray_session):
    from aida_ray.stages.windows import sliding_frame_sum
    ev = _events(200, seed=9)
    outs = []
    for parts in (1, 7):
        t = sliding_frame_sum(rd.from_arrow(ev).repartition(parts),
                              frame=5).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        outs.append(t)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_degree_distribution_matches_pandas(ray_session):
    from aida_ray.stages.graphs import degree_distribution
    ev = _events(300, seed=5)
    types = {s: i for i, s in enumerate("abcd")}
    out = degree_distribution(
        rd.from_arrow(ev).repartition(5), "user_id", "event_type",
        neighbor_ids=types).to_pandas() \
        .sort_values("deg").reset_index(drop=True)
    df = ev.to_pandas()
    per = df.groupby("user_id").event_type.nunique()
    ref = per.value_counts().sort_index()
    assert dict(zip(out.deg, out.n_keys)) == ref.to_dict()
    assert out.n_keys.sum() == df.user_id.nunique()


def test_degree_distribution_int_neighbors(ray_session):
    from aida_ray.stages.graphs import degree_distribution
    tbl = pa.table({"k": [1, 1, 1, 2, 2, 3],
                    "v": [10, 10, 11, 12, 13, 14]})
    out = degree_distribution(rd.from_arrow(tbl).repartition(3),
                              "k", "v").to_pandas() \
        .sort_values("deg").reset_index(drop=True)
    # degrees: k1 -> {10, 11} = 2, k2 -> {12, 13} = 2, k3 -> {14} = 1
    assert dict(zip(out.deg, out.n_keys)) == {1: 1, 2: 2}
