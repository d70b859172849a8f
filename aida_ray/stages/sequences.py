"""Per-key ordered-sequence analytics over event logs.

Three classic log-pipeline shapes, all sharing one plan: ONE hash
shuffle co-locates each key's events, the per-key work is vectorized
numpy/pandas over the (ts, event_id) TOTAL order (equal timestamps
never make answers depend on block order), and only tiny aggregate
rows leave the group stage.

- :func:`event_transitions` — Markov transition counts between
  consecutive event types per user, summed globally.  The per-key
  stage emits local (from, to, n) partials, so the final shuffle
  ships the |types|² transition matrix, not the log.
- :func:`retention_cohorts` — users per (first-seen week, week
  offset): the cohort-retention triangle.  Per-key output is that
  user's distinct active-week offsets (bounded by weeks, not events);
  the finishing groupby counts users per cell.
- :func:`collapse_repeats` — per-user count of events surviving
  consecutive-duplicate collapse (an event is dropped when its type
  equals the immediately preceding event's type) — the standard
  log-cleaning dedup; one row per user out.

Per-group state is one key's events (the same bounded-group
assumption as sessionize; pre-split pathological keys by coarse time
bucket otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

WEEK_US = 7 * 86_400_000_000
DAY_US = 86_400_000_000
# 1970-01-01 was a Thursday; shifting by 3 days makes Monday the week
# origin — the same truncation as SQL date_trunc('week').
_MONDAY_SHIFT_DAYS = 3


def _prep(events: ray.data.Dataset, key: str, ts_col: str,
          cols: dict[str, str]) -> ray.data.Dataset:
    def f(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        out = {key: b[key], "t": pc.cast(ts, pa.int64())}
        for name, src in cols.items():
            out[name] = b[src]
        return pa.table(out)

    return events.map_batches(f, batch_format="pyarrow")


def event_transitions(events: ray.data.Dataset, key: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> ray.data.Dataset:
    """Global (from_type, to_type, n) counts of consecutive event-type
    transitions within each key's (ts, event_id)-ordered history."""
    from ray.data.aggregate import Sum

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "eid"])
        et = g.et.to_numpy()
        if len(et) < 2:
            return pd.DataFrame({"from_type": [], "to_type": [],
                                 "n": []})
        out = pd.DataFrame({"from_type": et[:-1], "to_type": et[1:]}) \
            .groupby(["from_type", "to_type"], sort=False) \
            .size().rename("n").reset_index()
        return out

    partials = _prep(events, key, ts_col,
                     {"et": type_col, "eid": id_col}) \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    agg = partials.groupby(["from_type", "to_type"]).aggregate(Sum("n"))
    return agg.map_batches(lambda b: pa.table({
        "from_type": b["from_type"], "to_type": b["to_type"],
        "n": pc.cast(b["sum(n)"], pa.int64())}), batch_format="pyarrow")


def _week_start_day(t_us: np.ndarray) -> np.ndarray:
    days = t_us // DAY_US
    return days - (days + _MONDAY_SHIFT_DAYS) % 7


def retention_cohorts(events: ray.data.Dataset, key: str = "user_id",
                      ts_col: str = "ts") -> ray.data.Dataset:
    """(cohort_week, week_offset, n_users): how many users first seen
    in cohort_week were active week_offset weeks later."""
    from ray.data.aggregate import Sum

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        wk = _week_start_day(g.t.to_numpy())        # week-start day no.
        cohort = int(wk.min())
        offs = np.unique((wk - cohort) // 7)
        return pd.DataFrame({
            "cohort_day": np.full(len(offs), cohort, dtype="int64"),
            "week_offset": offs.astype("int64"),
            "n": np.ones(len(offs), dtype="int64")})

    partials = _prep(events, key, ts_col, {}) \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    agg = partials.groupby(["cohort_day", "week_offset"]) \
        .aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        day = b["cohort_day"].to_numpy(zero_copy_only=False)
        label = pc.strftime(pc.cast(
            pa.array(day * DAY_US, pa.int64()), pa.timestamp("us")),
            format="%Y-%m-%d")
        return pa.table({
            "cohort_week": label,
            "week_offset": pc.cast(b["week_offset"], pa.int64()),
            "n_users": pc.cast(b["sum(n)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def collapse_repeats(events: ray.data.Dataset, key: str = "user_id",
                     ts_col: str = "ts", type_col: str = "event_type",
                     id_col: str = "event_id") -> ray.data.Dataset:
    """Per-key count of events surviving consecutive-duplicate-type
    collapse over the (ts, event_id) order.  Output: (key, n_kept)."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "eid"])
        et = g.et.to_numpy()
        kept = 1 + int((et[1:] != et[:-1]).sum()) if len(et) else 0
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_kept": [kept]})

    out = _prep(events, key, ts_col, {"et": type_col, "eid": id_col}) \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    return out.map_batches(lambda b: pa.table({
        key: pc.cast(b[key], pa.int64()),
        "n_kept": pc.cast(b["n_kept"], pa.int64())}),
        batch_format="pyarrow")
