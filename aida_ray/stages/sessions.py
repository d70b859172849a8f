"""Session windows over an event log (streaming-shaped workload).

The reference is strictly batch (SURVEY §2.10), but a web-scale
training-data pipeline needs log sessionization; Ray Data's shape for it
(per the batch/streaming-batch model): treat events as a partitioned
log — ``groupby(key).map_groups`` with the group sorted by time, gap
threshold splits sessions.  Ordering assumption: all events of one key
fit one group (Ray guarantees per-key grouping); within the group we
sort by (ts, event_id) for deterministic ties.

Hot-key bound: a single key's events must fit one worker's memory (a
bot user with 10^9 events would not).  At that scale pre-split the key
by coarse time bucket (e.g. day), sessionize per (key, bucket), then
stitch boundary sessions whose gap spans buckets in a second tiny pass
over per-bucket first/last sessions — same two-phase shape as the
salted canonicalization.  Not implemented here because the synthetic
events table has no such key; the assumption is asserted per group at
runtime instead (group_size_limit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def sessionize(events: ray.data.Dataset, gap_minutes: int = 30,
               key: str = "user_id",
               group_size_limit: int = 50_000_000) -> ray.data.Dataset:
    """Gap-based sessions: (key, session_id, n_events, start_s, end_s,
    value_sum); session_id counts from 0 per key in time order."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > group_size_limit:
            raise ValueError(
                f"hot key {group[key].iloc[0]!r}: {len(group)} events "
                "exceed the per-group bound — pre-split by time bucket "
                "(see module docstring)")
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        new_session = (g["ts"].diff() > gap).fillna(False).astype(int)
        g["session_id"] = new_session.cumsum()
        out = g.groupby("session_id").agg(
            n_events=("event_id", "size"),
            start_s=("ts", "min"),
            end_s=("ts", "max"),
            value_sum=("value", "sum")).reset_index()
        out[key] = g[key].iloc[0]
        out["start_s"] = out["start_s"].astype("datetime64[s]").astype("int64")
        out["end_s"] = out["end_s"].astype("datetime64[s]").astype("int64")
        return out[[key, "session_id", "n_events", "start_s", "end_s",
                    "value_sum"]]

    return events.groupby(key).map_groups(per_key, batch_format="pandas")


def peak_concurrency(events: ray.data.Dataset, duration_s: int,
                     ts_col: str = "ts",
                     partitions: int = 64) -> tuple[int, int]:
    """Sweep-line maximum interval overlap: treating each event as a
    half-open interval [ts, ts + duration), the peak number of
    simultaneously open intervals and the earliest microsecond it is
    reached — a DISTRIBUTED PREFIX SCAN:

    1. each batch emits ±1 boundary points (map-only);
    2. points range-partition by a monotone time-bucket id (pure
       arithmetic on the global [tmin, tmax] span — no sampling, so
       the partitioning is deterministic);
    3. each bucket sorts ITS OWN points, collapses (t, d) ties and
       local-cumsums — emitting only (bucket, total, local_max,
       t_at_max): O(1) rows per bucket;
    4. the driver prefix-sums the per-bucket totals (a
       partitions-sized array) and offsets each local max.

    Counts are integers, so the result is exact at any parallelism.
    All-events-equal-timestamp degenerates to one hot bucket — the
    per-bucket sweep is then a single sort of that bucket, the
    documented bound (same assumption as sessionize's hot key)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    dur_us = duration_s * 1_000_000

    def bounds(b: pa.Table) -> pa.Table:
        t = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([t.min()], pa.int64()),
                         "hi": pa.array([t.max()], pa.int64())})

    mm = events.select_columns([ts_col]) \
        .map_batches(bounds, batch_format="pyarrow").to_pandas()
    if mm.empty:
        return 0, 0
    tmin, tmax = int(mm.lo.min()), int(mm.hi.max()) + dur_us
    span = max(tmax - tmin + 1, 1)

    def points(b: pa.Table) -> pa.Table:
        t = pc.cast(b[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        ts = np.concatenate([t, t + dur_us])
        d = np.concatenate([np.ones(len(t), dtype="int64"),
                            np.full(len(t), -1, dtype="int64")])
        pid = (ts - tmin) * partitions // span
        return pa.table({"pid": pa.array(pid, pa.int64()),
                         "t": pa.array(ts, pa.int64()),
                         "d": pa.array(d, pa.int64())})

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        # collapse (t, d) ties, end (-1) before start (+1) at equal t
        c = g.groupby(["t", "d"], sort=True)["d"].sum().rename("dd") \
            .reset_index().sort_values(["t", "d"])
        run = c.dd.cumsum().to_numpy()
        i = int(run.argmax())
        return pd.DataFrame({
            "pid": [g.pid.iloc[0]],
            "total": [int(run[-1])],
            "local_max": [int(run[i])],
            "t_at": [int(c.t.iloc[i])]})

    per = events.select_columns([ts_col]) \
        .map_batches(points, batch_format="pyarrow") \
        .groupby("pid").map_groups(sweep, batch_format="pandas") \
        .to_pandas().sort_values("pid").reset_index(drop=True)
    # vectorized prefix-sum merge of per-partition maxima (partition
    # count is bounded, but no reason to loop rows)
    offsets = np.concatenate([[0], per["total"].to_numpy()[:-1].cumsum()])
    vals = offsets + per["local_max"].to_numpy()
    i = int(vals.argmax())
    return int(vals[i]), int(per["t_at"].iloc[i])


def watermark_late(events: ray.data.Dataset,
                   lateness_us: int,
                   ts_col: str = "ts",
                   arrival_col: str = "arr",
                   id_col: str = "event_id",
                   partitions: int = 64) -> ray.data.Dataset:
    """Streaming watermark late-event detection: processing the stream
    in ``(arrival, id)`` order, the watermark before each event is the
    running max event-time of everything EARLIER IN THAT TOTAL ORDER —
    i.e. ties on arrival are broken by ``id_col``, and a same-arrival
    row with a smaller id IS included in the prefix (the SQL-window
    ``ORDER BY arr, id ROWS ... 1 PRECEDING`` convention, which the
    oracle encodes too; a true strictly-earlier-ARRIVAL semantics
    would segment the prefix max by distinct arrival value instead).
    An event whose own event-time trails that watermark by more than
    ``lateness_us`` is late (the allowed-lateness drop rule of
    Beam/Flink-style streaming).  Returns (id, late_us) for the late
    events.

    Same two-pass distributed prefix-scan shape as
    :func:`peak_concurrency` — a running max is a prefix reduction:

    1. arrival range-partitions by a monotone bucket id (pure
       arithmetic on [arr_min, arr_max]; ties share a value so they
       share a bucket);
    2. pass 1: per-batch (bucket, max_ts) partials — the driver
       exclusive-prefix-maxes a ``partitions``-sized array;
    3. pass 2: each bucket sorts ITSELF by (arrival, id), seeds its
       local running max with the incoming watermark, and emits only
       its late rows.

    Integer microsecond comparisons throughout — exact at any
    parallelism.  A single hot arrival value degenerates to one
    bucket's local sort (the documented sessionize/peak bound).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # materialized once: both the bounds scan and the tag pass read it,
    # so the upstream plan (source read + arrival derivation) runs once
    cols = events.select_columns([id_col, ts_col, arrival_col]).materialize()

    def bounds(b: pa.Table) -> pa.Table:
        a = pc.cast(b[arrival_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"lo": pa.array([a.min()], pa.int64()),
                         "hi": pa.array([a.max()], pa.int64())})

    mm = cols.map_batches(bounds, batch_format="pyarrow").to_pandas()
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "late_us": pa.array([], pa.int64())})
    if mm.empty:
        return ray.data.from_arrow(empty)
    amin, amax = int(mm.lo.min()), int(mm.hi.max())
    span = max(amax - amin + 1, 1)

    def tag(b: pa.Table) -> pa.Table:
        a = pc.cast(b[arrival_col], pa.int64()).to_numpy(zero_copy_only=False)
        # float bucketing: (a-amin)*partitions can wrap int64 for
        # full-range arrival domains; x*c is monotone in IEEE for
        # positive c, so float keeps buckets ordered (ties only merge)
        pid = np.clip(((a - amin).astype(np.float64) * partitions
                       / span).astype(np.int64), 0, partitions - 1)
        return pa.table({
            "pid": pa.array(pid, pa.int64()),
            id_col: pc.cast(b[id_col], pa.int64()),
            "t": pc.cast(b[ts_col], pa.int64()),
            "a": pa.array(a, pa.int64())})

    tagged = cols.map_batches(tag, batch_format="pyarrow").materialize()

    def maxes(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"pid": b["pid"].to_numpy(zero_copy_only=False),
                           "t": b["t"].to_numpy(zero_copy_only=False)})
        g = df.groupby("pid")["t"].max()
        return pa.table({"pid": pa.array(g.index.to_numpy(), pa.int64()),
                         "mx": pa.array(g.to_numpy(), pa.int64())})

    per = tagged.map_batches(maxes, batch_format="pyarrow").to_pandas()
    bucket_max = np.full(partitions, np.iinfo(np.int64).min, np.int64)
    for pid, mx in zip(per["pid"], per["mx"]):
        bucket_max[pid] = max(bucket_max[pid], mx)
    # exclusive prefix max: watermark ENTERING each bucket
    incoming = np.full(partitions, np.iinfo(np.int64).min, np.int64)
    incoming[1:] = np.maximum.accumulate(bucket_max)[:-1]
    SEED = int(np.iinfo(np.int64).min)

    def sweep(g):
        import pandas as pd
        g = g.sort_values(["a", id_col], kind="stable")
        t = g["t"].to_numpy()
        wm = np.empty(len(t), np.int64)
        wm[0] = incoming[int(g["pid"].iloc[0])]
        if len(t) > 1:
            np.maximum(np.maximum.accumulate(t[:-1]), wm[0], out=wm[1:])
        valid = wm != SEED
        late = valid & (wm - np.where(valid, t, 0) > lateness_us)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy()[late],
            "late_us": (wm - t)[late]})

    return tagged.groupby("pid").map_groups(sweep, batch_format="pandas")
