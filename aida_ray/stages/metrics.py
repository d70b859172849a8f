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
        # groupby can leak schema-less / pandas empty blocks
        if not isinstance(t, pa.Table) or t.num_rows == 0:
            continue
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


def audit_table(ds: ray.data.Dataset, key_col: str, fk_col: str,
                null_col: str, dim_keys: pa.Array) -> pa.Table:
    """Data-quality audit in ONE streaming pass + one gated distinct:
    row count, NULLs in ``null_col``, duplicate ``key_col`` values
    (count − distinct), and ``fk_col`` values absent from the
    broadcast dimension key set (referential violations).

    Per-batch partials carry four counters plus the block's distinct
    keys; the distinct-key union collapses in one numpy task while it
    fits (keys × blocks), with the groupby route above the gate —
    the same adaptive shape as the other wide-key finishers."""
    import numpy as np
    import pyarrow.compute as pc

    from aida_ray.stages.dedup import _concat_blocks, _get_cached

    dim_ref = ray.put(pa.array(
        np.sort(dim_keys.to_numpy(zero_copy_only=False)), pa.int64()))

    def partial(b: pa.Table) -> pa.Table:
        n = b.num_rows
        nulls = int(pc.sum(pc.cast(pc.is_null(b[null_col]),
                                   pa.int64())).as_py() or 0)
        fk_missing = n - int(pc.sum(pc.cast(
            pc.is_in(b[fk_col], value_set=_get_cached(dim_ref)),
            pa.int64())).as_py() or 0)
        keys = np.unique(b[key_col].to_numpy(zero_copy_only=False)) \
            .astype("int64")
        # row 0 = this block's counters (key sentinel −1, excluded
        # from the distinct); remaining rows = the block's distinct keys
        zeros = np.zeros(len(keys), dtype="int64")
        return pa.table({
            "n": pa.array(np.r_[np.int64(n), zeros], pa.int64()),
            "nulls": pa.array(np.r_[np.int64(nulls), zeros], pa.int64()),
            "fk_missing": pa.array(np.r_[np.int64(fk_missing), zeros],
                                   pa.int64()),
            "key": pa.array(np.r_[np.int64(-1), keys], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()

    @ray.remote
    def finish(*tabs: pa.Table) -> pa.Table:
        t = _concat_blocks(tabs, pa.schema(
            [("n", pa.int64()), ("nulls", pa.int64()),
             ("fk_missing", pa.int64()), ("key", pa.int64())]))
        n = int(pc.sum(t["n"]).as_py() or 0)
        keys = t["key"].to_numpy(zero_copy_only=False)
        n_distinct = len(np.unique(keys[keys >= 0])) if len(keys) else 0
        return pa.table({
            "n_rows": pa.array([n], pa.int64()),
            "n_null": pa.array([int(pc.sum(t["nulls"]).as_py() or 0)],
                               pa.int64()),
            "n_dup_key": pa.array([n - n_distinct], pa.int64()),
            "n_fk_violations": pa.array(
                [int(pc.sum(t["fk_missing"]).as_py() or 0)],
                pa.int64())})

    return ray.get(finish.remote(*parts.to_arrow_refs()))


_CHECKSUM_MOD = (1 << 61) - 1     # Mersenne prime


def table_checksum(ds: ray.data.Dataset, id_col: str,
                   text_col: str) -> pa.Table:
    """Order-independent content checksum: Σ md5₆₀(id|text) mod
    2⁶¹−1 plus the row count — equal iff two tables hold the same
    multiset of rows, regardless of partitioning or order.  The ETL
    validation primitive for verifying a migrated/recomputed corpus
    without shuffling either side.  One map pass, one tiny partial
    row per block."""
    import hashlib

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        s = 0
        for i, t in zip(ids, texts):
            s += int(hashlib.md5(
                f"{i}|{t}".encode()).hexdigest()[:15], 16)
        return pa.table({
            "part": pa.array([s % _CHECKSUM_MOD], pa.int64()),
            "n": pa.array([len(ids)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow") \
        .to_arrow_refs()
    total, n = 0, 0
    for r in parts:
        t = ray.get(r)
        if not isinstance(t, pa.Table) or t.num_rows == 0:
            continue
        total = (total + int(pa.compute.sum(t["part"]).as_py() or 0)) \
            % _CHECKSUM_MOD
        n += int(pa.compute.sum(t["n"]).as_py() or 0)
    return pa.table({"checksum": pa.array([total], pa.int64()),
                     "n_rows": pa.array([n], pa.int64())})
