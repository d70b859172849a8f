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

import math

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
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):   # normalize ns/ms inputs
            ts = pc.cast(ts, pa.timestamp("us"))
        return pa.table({key: b[key],
                         "t": pc.cast(ts, pa.int64()),
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


HOUR_US = 3_600_000_000


def ohlc_bars(events: ray.data.Dataset, key: str = "event_type",
              ts_col: str = "ts", val_col: str = "value",
              id_col: str = "event_id",
              bucket_us: int = HOUR_US) -> ray.data.Dataset:
    """Per-(key, time bucket) OHLC bars: open / high / low / close of
    the value plus the row count — the classic market-data downsample.

    Open/close are picked by the TOTAL order (ts, event_id), so equal
    timestamps never make the answer depend on block order.  Every
    per-bar statistic is MERGEABLE: each batch emits one partial row
    per (key, bucket) it sees (its own open/close candidates with
    their order keys, min, max, count), and the finishing merge runs
    over |keys × buckets × blocks| partial rows — the raw event log
    never crosses the shuffle.  Values pass through min/max/first/last
    untouched (no float arithmetic), so the oracle hash-matches
    exactly."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):   # normalize ns/ms inputs
            ts = pc.cast(ts, pa.timestamp("us"))
        t = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "k": b[key].to_pandas(),
            "bucket": (t // bucket_us) * bucket_us,
            "t": t,
            "eid": b[id_col].to_numpy(zero_copy_only=False),
            "v": b[val_col].to_numpy(zero_copy_only=False)})
        df = df.sort_values(["k", "bucket", "t", "eid"])
        g = df.groupby(["k", "bucket"], sort=False).agg(
            open_t=("t", "first"), open_eid=("eid", "first"),
            open=("v", "first"),
            close_t=("t", "last"), close_eid=("eid", "last"),
            close=("v", "last"),
            high=("v", "max"), low=("v", "min"), n=("v", "size"))
        return pa.Table.from_pandas(g.reset_index(),
                                    preserve_index=False)

    def merge_frame(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL partial rows: open = first row
        # per (k, bucket) after an (open_t, open_eid) sort; close =
        # last after a (close_t, close_eid) sort; min/max/sum plain
        o = df.sort_values(["k", "bucket", "open_t", "open_eid"],
                           kind="mergesort") \
            .groupby(["k", "bucket"], sort=False).first()["open"]
        c = df.sort_values(["k", "bucket", "close_t", "close_eid"],
                           kind="mergesort") \
            .groupby(["k", "bucket"], sort=False).last()["close"]
        rest = df.groupby(["k", "bucket"], sort=False).agg(
            high=("high", "max"), low=("low", "min"), n=("n", "sum"))
        out = rest.join(o).join(c).reset_index()
        return out[["k", "bucket", "open", "high", "low", "close",
                    "n"]]

    partials = events.map_batches(partial, batch_format="pyarrow") \
        .materialize()

    if partials.count() <= 20_000_000:
        # (keys × buckets) × blocks fits ONE task — no per-group
        # pandas dispatch (3,600 map_groups calls dominated the wall)
        from aida_ray.stages.dedup import _concat_blocks

        @ray.remote
        def merge_task(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema(
                [("k", pa.string()), ("bucket", pa.int64()),
                 ("open_t", pa.int64()), ("open_eid", pa.int64()),
                 ("open", pa.float64()), ("close_t", pa.int64()),
                 ("close_eid", pa.int64()), ("close", pa.float64()),
                 ("high", pa.float64()), ("low", pa.float64()),
                 ("n", pa.int64())]))
            return pa.Table.from_pandas(merge_frame(t.to_pandas()),
                                        preserve_index=False)

        out = ray.data.from_arrow_refs(
            [merge_task.remote(*partials.to_arrow_refs())])
    else:
        # above the gate: bucket whole (k, bucket) groups by hash % P
        # and run P vectorized merges — per-group map_groups dispatch
        # is exactly what the gated branch's lesson rules out
        nb = 64

        def tag(b: pa.Table) -> pa.Table:
            df = pa.table({"k": b["k"],
                           "bucket": b["bucket"]}).to_pandas()
            h = pd.util.hash_pandas_object(df, index=False) \
                .to_numpy(dtype="uint64")
            return b.append_column(
                "_b", pa.array((h % nb).astype("int64")))

        out = partials.map_batches(tag, batch_format="pyarrow") \
            .groupby("_b").map_groups(merge_frame,
                                      batch_format="pandas")
    return out.map_batches(lambda b: pa.table({
        "k": b["k"], "bucket": pc.cast(b["bucket"], pa.int64()),
        "open": pc.cast(b["open"], pa.float64()),
        "high": pc.cast(b["high"], pa.float64()),
        "low": pc.cast(b["low"], pa.float64()),
        "close": pc.cast(b["close"], pa.float64()),
        "n": pc.cast(b["n"], pa.int64())}), batch_format="pyarrow")


def burst_windows(events: ray.data.Dataset, key: str = "event_type",
                  ts_col: str = "ts",
                  window_us: int = 3_600_000_000) -> ray.data.Dataset:
    """Burst detection per (key, time window): count events in fixed
    windows and score each window against its PREDECESSOR window of
    the same key, ``burst = (n - prev) / sqrt(prev + 1)`` (the
    Poisson-surprise normalization of Kleinberg-style burst scoring,
    simplified to a deterministic one-lag rule).  Windows with zero
    events are absent on both sides of the comparison (LAG over
    existing windows), prev defaults to 0 for a key's first window.

    Scale shape: per-batch (key, window) partial counts (volume =
    distinct windows per block, not events), one groupby-sum, then a
    per-key vectorized shift — per-key state is its WINDOW COUNT
    (span/window), not its events.  Scores round to 6 decimals.
    """
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        w = us // window_us
        df = pd.DataFrame({key: b[key].to_pandas(), "w": w})
        g = df.groupby([key, "w"], sort=False).size().rename("n") \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = events.map_batches(partial, batch_format="pyarrow") \
        .groupby([key, "w"]).aggregate(Sum("n"))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("w").reset_index(drop=True)
        n = g["sum(n)"].to_numpy(dtype=np.int64)
        prev = np.concatenate(([0], n[:-1]))
        burst = np.round((n - prev) / np.sqrt(prev + 1.0), 6)
        return pd.DataFrame({key: g[key], "w": g["w"].astype(np.int64),
                             "n": n, "prev": prev, "burst": burst})

    return counts.groupby(key).map_groups(per_key, batch_format="pandas")


def decayed_counts(events: ray.data.Dataset, key: str = "user_id",
                   ts_col: str = "ts",
                   half_life_days: float = 7.0) -> ray.data.Dataset:
    """Per-key exponentially time-decayed activity score — the
    freshness/recency signal used for crawl re-visit prioritization
    and host reputation: ``score = sum_i exp(-lambda * (T - t_i))``
    with ``lambda = ln(2) / half_life`` and T the global max event
    timestamp (so the newest event contributes exactly 1.0).

    Scale shape: one tiny max-timestamp pass, then map-side partial
    sums per (key) within each block — the groupby-sum shuffle ships
    one (key, partial_score, partial_n) row per key per block, volume
    tracks the KEY SPACE, never the event count.  Scores round to 6
    decimals (sum-order float drift is ~1e-10 at any realistic group
    size, far inside the rounding).
    """
    from ray.data.aggregate import Sum

    t_max = events.max(ts_col)
    t_max_us = int(pa.scalar(t_max, pa.timestamp("us")).cast(
        pa.int64()).as_py())
    lam = math.log(2.0) / (half_life_days * float(DAY_US))

    def partial(b: pa.Table) -> pa.Table:
        t = pc.cast(b[ts_col].combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        wts = np.exp(-lam * (float(t_max_us) - t))
        g = pd.DataFrame({key: b[key].to_numpy(zero_copy_only=False),
                          "s": wts}) \
            .groupby(key, sort=False) \
            .agg(s=("s", "sum"), n=("s", "size")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = events.select_columns([key, ts_col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(Sum("s"), Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            key: b[key],
            "n_events": pc.cast(b["sum(n)"], pa.int64()),
            "decayed_score": pa.array(
                np.round(b["sum(s)"].to_numpy(zero_copy_only=False), 6),
                pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")
