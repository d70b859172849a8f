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
