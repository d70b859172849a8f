"""Unit tests for SQL window functions (partitioned + global rank)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_partitioned_window_reference(ray_session):
    from aida_ray.stages.windows import partitioned_window
    ev = pa.table({
        "user_id": [1, 1, 1, 2, 2],
        "event_id": [10, 11, 12, 20, 21],
        "ts": pd.to_datetime(
            ["2024-01-01 00:00", "2024-01-01 00:05", "2024-01-01 00:01",
             "2024-01-02 00:00", "2024-01-01 23:59"]),
        "value": [1.0, 2.005, 3.0, 10.0, -0.5],
    })
    out = partitioned_window(rd.from_arrow(ev).repartition(3)) \
        .to_pandas().sort_values(["user_id", "rn"]).reset_index(drop=True)
    # user 1 order by ts: e10(1.0), e12(3.0), e11(2.005)
    u1 = out[out.user_id == 1]
    assert u1.event_id.tolist() == [10, 12, 11]
    assert u1.rn.tolist() == [1, 2, 3]
    assert u1.cum_cents.tolist() == [100, 400, 400 + 201]  # 2.005→201
    assert pd.isna(u1.prev_cents.iloc[0]) and u1.prev_cents.tolist()[1:] == [100, 300]
    # user 2 order by ts: e21(-0.5) then e20(10.0)
    u2 = out[out.user_id == 2]
    assert u2.event_id.tolist() == [21, 20]
    assert u2.cum_cents.tolist() == [-50, 950]
    assert pd.isna(u2.next_cents.iloc[-1])


def test_global_rank_with_ties(ray_session):
    from aida_ray.stages.windows import global_rank
    x = pa.table({"id": list(range(7)),
                  "v": [5.0, 1.0, 5.0, 2.0, 1.0, 9.0, 1.0]})
    out = global_rank(rd.from_arrow(x).repartition(4), "v",
                      keep_cols=("id",)).to_pandas().sort_values("id")
    ref = pd.DataFrame({"v": [5.0, 1.0, 5.0, 2.0, 1.0, 9.0, 1.0]})
    ref["rank"] = ref.v.rank(method="min").astype(int)
    ref["dense_rank"] = ref.v.rank(method="dense").astype(int)
    assert out["rank"].tolist() == ref["rank"].tolist()
    assert out["dense_rank"].tolist() == ref["dense_rank"].tolist()


def test_window_ntile_pct_first_last(ray_session):
    import pandas as pd
    from aida_ray.stages.windows import partitioned_window
    ev = pa.table({
        "user_id": [1] * 6,
        "event_id": list(range(6)),
        "ts": pd.to_datetime([f"2024-01-0{i+1}" for i in range(6)]),
        "value": [float(i) for i in range(6)],
    })
    out = partitioned_window(rd.from_arrow(ev).repartition(3)) \
        .to_pandas().sort_values("rn").reset_index(drop=True)
    # NTILE(4) over 6 rows: sizes 2,2,1,1
    assert out.ntile4.tolist() == [1, 1, 2, 2, 3, 4]
    assert out.pct_rank.tolist() == [i / 5 for i in range(6)]
    assert out.first_cents.tolist() == [0] * 6
    assert out.last_cents.tolist() == [500] * 6


def test_peak_concurrency_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    from aida_ray.stages.sessions import peak_concurrency
    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-01-01").value // 1000  # us
    ts_us = base + rng.integers(0, 3_000_000_000, 400)
    ts_us[::50] = ts_us[0]          # planted exact ties
    ev = rd.from_arrow(pa.table({
        "ts": pa.array(ts_us, pa.timestamp("us"))})).repartition(6)
    for dur in (60, 1800):
        mx, at = peak_concurrency(ev, duration_s=dur, partitions=7)
        # brute force sweep
        d_us = dur * 1_000_000
        pts = sorted([(int(t), 1) for t in ts_us]
                     + [(int(t) + d_us, -1) for t in ts_us])
        # collapse (t, d) ties like the operator/oracle
        agg = {}
        for t, d in pts:
            agg[(t, d)] = agg.get((t, d), 0) + d
        run, best, best_t = 0, None, None
        for (t, d) in sorted(agg):
            run += agg[(t, d)]
            if best is None or run > best:
                best, best_t = run, t
        assert (mx, at) == (best, best_t)
