"""Time-series regularization: per-key gap-fill resampling with
forward fill.

Each key's irregular event history becomes a regular grid from its
first to last observation (step in microseconds), every grid point
carrying the latest observation at-or-before it.  Duplicate
timestamps within a key are pre-collapsed to ``MAX(value)`` — an
as-of match against raw duplicate-timestamp rows would be
nondeterministic under reordering, and determinism at any parallelism
is the house rule.

Scale shape: map-side column prune + timestamp→int64 cast, ONE hash
shuffle by key, then per-group vectorized numpy (dedup → grid via
``np.arange`` → ``searchsorted`` forward-fill).  Per-group state is
one key's distinct timestamps plus its grid — bound the step so
span/step stays in memory (the same bounded-group assumption as
sessionization; pre-split hot keys by coarse time bucket otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DAY_US = 86_400_000_000


def gap_fill_ffill(events: ray.data.Dataset, key: str = "user_id",
                   ts_col: str = "ts", val_col: str = "value",
                   step_us: int = DAY_US) -> ray.data.Dataset:
    """Per-key regular grid (epoch-microsecond ticks) with
    forward-filled values.  Output: (key, gt, value)."""

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({key: b[key],
                         "t": pc.cast(b[ts_col], pa.int64()),
                         "v": b[val_col]})

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("t")["v"].max()          # sorted by t
        ts = agg.index.to_numpy()
        vals = agg.to_numpy()
        grid = np.arange(ts[0], ts[-1] + 1, step_us)
        idx = np.searchsorted(ts, grid, side="right") - 1
        return pd.DataFrame({key: g[key].iloc[0], "gt": grid,
                             "value": vals[idx]})

    return events.map_batches(prep, batch_format="pyarrow") \
        .groupby(key).map_groups(per_key, batch_format="pandas")
