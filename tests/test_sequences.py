"""Ordered-sequence analytics: pandas parity + blocking invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from aida_ray.stages.sequences import (collapse_repeats,
                                       event_transitions,
                                       retention_cohorts)


def _events(n=400, seed=11):
    rng = np.random.default_rng(seed)
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 30 * 86_400_000_000, n)
    ts[5:15] = ts[5]                       # equal-timestamp ties
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(ts, unit="us"),
        "user_id": rng.integers(0, 25, n),
        "event_type": rng.choice(["view", "click", "buy"], n)})


def test_event_transitions_matches_pandas(ray_session):
    df = _events()
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = event_transitions(ds).to_pandas() \
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    d = df.assign(t=df.ts.astype("int64")) \
        .sort_values(["user_id", "t", "event_id"])
    d["nxt"] = d.groupby("user_id").event_type.shift(-1)
    ref = d.dropna(subset=["nxt"]) \
        .groupby(["event_type", "nxt"]).size().rename("n") \
        .reset_index().rename(columns={"event_type": "from_type",
                                       "nxt": "to_type"}) \
        .sort_values(["from_type", "to_type"]).reset_index(drop=True)
    assert (got.n.to_numpy() == ref.n.to_numpy()).all()
    assert list(got.from_type) == list(ref.from_type)


def test_collapse_repeats_matches_pandas(ray_session):
    df = _events(seed=12)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = collapse_repeats(ds).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    d = df.assign(t=df.ts.astype("int64")) \
        .sort_values(["user_id", "t", "event_id"])
    d["prev"] = d.groupby("user_id").event_type.shift(1)
    ref = d[(d.prev.isna()) | (d.prev != d.event_type)] \
        .groupby("user_id").size().rename("n_kept").reset_index()
    assert (got.n_kept.to_numpy() == ref.n_kept.to_numpy()).all()


def test_retention_cohorts_blocking_invariant(ray_session):
    df = _events(seed=13)
    tbl = pa.Table.from_pandas(df)
    outs = []
    for parts in (1, 4, 8):
        ds = rd.from_arrow(tbl).repartition(parts)
        o = retention_cohorts(ds).to_pandas() \
            .sort_values(["cohort_week", "week_offset"]) \
            .reset_index(drop=True)
        outs.append(o)
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    # every user appears exactly once at offset 0 of their own cohort
    total_offset0 = outs[0][outs[0].week_offset == 0].n_users.sum()
    assert total_offset0 == df.user_id.nunique()


def test_audit_table_detects_issues(ray_session):
    from aida_ray.stages.metrics import audit_table
    df = pd.DataFrame({
        "k": [1, 2, 2, 3, 4, 4, 4],                  # 3 dup rows
        "fk": [10, 10, 11, 99, 10, 11, 98],          # 2 violations
        "v": ["a", None, "b", None, "c", "d", "e"]})  # 2 nulls
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    out = audit_table(ds, key_col="k", fk_col="fk", null_col="v",
                      dim_keys=pa.array([10, 11], pa.int64()))
    row = out.to_pylist()[0]
    assert row == {"n_rows": 7, "n_null": 2, "n_dup_key": 3,
                   "n_fk_violations": 2}


def test_weighted_sample_blocking_invariant_and_biased(ray_session):
    from aida_ray.stages.sampling import weighted_sample
    n = 400
    ids = np.arange(n, dtype="int64")
    w = np.where(ids < 40, 1000.0, 1.0)          # 40 heavy docs
    tbl = pa.table({"doc_id": ids, "n_chars": w})
    outs = []
    for parts in (1, 4, 8):
        ds = rd.from_arrow(tbl).repartition(parts)
        t = weighted_sample(ds, "n_chars", k=30).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(t)
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    # 1000x-weighted rows dominate the sample
    assert (outs[0].doc_id < 40).mean() > 0.8


def test_rolling_active_matches_pandas(ray_session):
    from aida_ray.stages.sequences import rolling_active_users
    df = _events(n=500, seed=21)
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = rolling_active_users(ds, window_days=7).to_pandas() \
        .sort_values("day").reset_index(drop=True)
    d = df.assign(day=df.ts.astype("int64") // 86_400_000_000_000)
    # ns epoch // ns-per-day
    ud = d[["user_id", "day"]].drop_duplicates()
    act = sorted(ud.day.unique())
    ref = {a: ud[(ud.day >= a - 6) & (ud.day <= a)].user_id.nunique()
           for a in act}
    assert list(got.active_users) == [ref[a] for a in act]


def test_attribution_no_prior_touch(ray_session):
    from aida_ray.stages.sequences import last_touch_attribution
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts": pd.to_datetime([100, 200, 300], unit="s"),
        "user_id": [7, 7, 8],
        "event_type": ["purchase", "view", "purchase"]})
    out = last_touch_attribution(
        rd.from_arrow(pa.Table.from_pandas(df))).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # user 7's purchase precedes its view; user 8 never views
    assert list(out.event_id) == [1, 3]
    assert list(out.touch_id) == [-1, -1]
    assert list(out.latency_us) == [-1, -1]


def test_event_paths_matches_pandas(ray_session):
    from aida_ray.stages.sequences import event_paths
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(12)
    n = 400
    ev = pa.table({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 25, n),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts": pa.array(
            [np.datetime64("2024-01-01", "us")
             + np.timedelta64(int(s), "s")
             for s in rng.integers(0, 9999, n)], pa.timestamp("us")),
    })
    df = ev.to_pandas().sort_values(["user_id", "ts", "event_id"])
    ref = df.groupby("user_id")["event_type"].agg(",".join) \
        .rename("seq").reset_index()
    for parts in (1, 6):
        out = event_paths(rd.from_arrow(ev).repartition(parts)) \
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, ref, check_dtype=False)
