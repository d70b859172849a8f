"""Pipeline counters / metrics (SURVEY G8).

The reference keeps JVM-global synchronized counters
(util/Counter.java, util/timing/RunningTimer.java).  The Ray-native
shape: stages emit a metrics side-table (one partial-count row per
counter per batch) which aggregates with one tiny groupby; per-partition
metrics land in the sink manifests (north-rule "per-partition
lineage + metrics").
"""

from __future__ import annotations

import time
from collections import Counter
from contextlib import contextmanager

import pyarrow as pa

import ray
import ray.data


class StageMetrics:
    """Per-actor/task counter bag; cheap, merged downstream."""

    def __init__(self):
        self.counts: Counter = Counter()
        self.timers: dict[str, float] = {}

    def inc(self, name: str, n: int = 1) -> None:
        self.counts[name] += n

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timers[name] = self.timers.get(name, 0.0) + (time.perf_counter() - t0)

    def to_table(self) -> pa.Table:
        names = list(self.counts) + [f"time_ms:{k}" for k in self.timers]
        values = [float(v) for v in self.counts.values()] + \
            [round(v * 1000, 3) for v in self.timers.values()]
        return pa.table({"metric": pa.array(names, pa.string()),
                         "value": pa.array(values, pa.float64())})

    def snapshot_and_reset(self) -> pa.Table:
        t = self.to_table()
        self.counts.clear()
        self.timers.clear()
        return t


def aggregate_metrics(metrics_ds: ray.data.Dataset) -> dict[str, float]:
    """Merge all emitted metric rows into one dict (sum per metric)."""
    agg = metrics_ds.groupby("metric").sum(["value"])
    out: dict[str, float] = {}
    for t in (ray.get(r) for r in agg.to_arrow_refs()):
        t = t.rename_columns(["metric", "value"])
        for m, v in zip(t["metric"].to_pylist(), t["value"].to_pylist()):
            out[m] = out.get(m, 0.0) + v
    return out


def merge_metric_tables(tables: list[pa.Table]) -> dict[str, float]:
    out: Counter = Counter()
    for t in tables:
        for m, v in zip(t["metric"].to_pylist(), t["value"].to_pylist()):
            out[m] += v
    return dict(out)
