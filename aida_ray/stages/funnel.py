"""Ordered event-funnel analysis (first-touch semantics).

For a funnel ``[s0, s1, ..., sK]``: a user reaches stage 0 at their
earliest ``s0`` event, and stage j at their earliest ``s_j`` event
STRICTLY after their stage j-1 time.  Strict ordering makes the result
independent of within-timestamp event ordering, so it is deterministic
at any parallelism (two events sharing a timestamp never count as a
progression in either order).

Scale shape: the event log is pruned map-side to the funnel's event
types and three columns (the shuffle ships only funnel events), then
ONE hash shuffle groups each user; per-user depth is K tiny vectorized
scans (K = funnel length); the per-user output is a single (user,
depth) row, reduced to a K-row histogram via per-batch partials + a
tiny groupby-sum.  Per-group state is one user's funnel events — the
same bounded-key assumption as sessionization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def funnel_depths(events: ray.data.Dataset, stages: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> ray.data.Dataset:
    """Per-user funnel depth: 0 = never entered, K = completed.
    Returns one (user, depth) row per user with >=1 funnel event."""
    n_stages = len(stages)
    stage_set = pa.array(stages)

    def prune(b: pa.Table) -> pa.Table:
        sidx = pc.index_in(b[type_col], value_set=stage_set)
        t = pa.table({user_col: b[user_col], "ts": b[ts_col],
                      "sidx": pc.cast(sidx, pa.int32())})
        return t.filter(pc.is_valid(t["sidx"]))

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy()
        si = g["sidx"].to_numpy()
        t = None
        depth = 0
        for j in range(n_stages):
            m = si == j
            if t is not None:
                m &= ts > t
            if not m.any():
                break
            t = ts[m].min()
            depth = j + 1
        return pd.DataFrame({user_col: [g[user_col].iloc[0]],
                             "depth": [depth]})

    return events.map_batches(prune, batch_format="pyarrow") \
        .groupby(user_col).map_groups(per_user, batch_format="pandas")


def funnel_counts(events: ray.data.Dataset, stages: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> pa.Table:
    """Funnel conversion table: (stage_idx, stage, users) where
    ``users`` counts users reaching at least that stage."""
    from ray.data.aggregate import Sum

    depths = funnel_depths(events, stages, user_col, ts_col, type_col)

    def partial(b: pa.Table) -> pa.Table:
        vc = b["depth"].combine_chunks().value_counts()
        return pa.table({"depth": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    hist = depths.map_batches(partial, batch_format="pyarrow") \
        .groupby("depth").aggregate(Sum("n")).to_pandas()
    counts = np.zeros(len(stages) + 1, dtype="int64")
    for d, n in zip(hist["depth"], hist["sum(n)"]):
        counts[int(d)] = n
    # users reaching >= stage j = suffix sum of exact depths
    reach = np.cumsum(counts[::-1])[::-1]
    return pa.table({
        "stage_idx": pa.array(np.arange(1, len(stages) + 1), pa.int64()),
        "stage": pa.array(stages),
        "users": pa.array(reach[1:], pa.int64()),
    })
