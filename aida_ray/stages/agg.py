"""Bucketed distributive aggregation for UNBOUNDED key spaces.

Ray Data's sort-based ``groupby().aggregate()`` executes the reduce
per key in Python — fine at 10-1000 keys, ruinous at 10^5+ (PERF.md,
"wide-key-aggregate lesson").  The repo's gated single-task finishers
cover key spaces that fit one task; this module is the route ABOVE
that gate:

1. tag every partial row with ``bucket = hash(key) % P`` (map-only);
2. one ``groupby(bucket).map_groups`` — exactly P Python calls, each
   combining its whole bucket with a pandas groupby (hash-based, C).

Correct for any distributive aggregate (sum/min/max/count); each
bucket holds ~(keys × blocks)/P rows, so P scales with the cluster
and no single reducer sees the whole key space.  This is the shuffle
a hash-partitioned combiner would do — with the per-key Python cost
replaced by P vectorized calls.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_AGG_FNS = {"sum", "min", "max"}   # count of partials is NOT a
# valid combine of partial counts — sum them instead


def bucket_reduce(partials: ray.data.Dataset, key_cols: list[str],
                  aggs: dict[str, str | tuple[str, str]],
                  num_buckets: int | None = None) -> ray.data.Dataset:
    """Combine partial rows by ``key_cols`` with the distributive
    aggregates in ``aggs``: ``{out_col: fn}`` applies ``fn`` to
    ``out_col`` itself, ``{out_col: (src_col, fn)}`` renames — so the
    same source column can feed several aggregates.  Output: one row
    per distinct key, columns = key_cols + aggs keys."""
    spec = {out: (v if isinstance(v, tuple) else (out, v))
            for out, v in aggs.items()}
    for _, fn in spec.values():
        if fn not in _AGG_FNS:
            raise ValueError(f"non-distributive aggregate: {fn}")
    if num_buckets is None:
        try:
            import ray
            num_buckets = max(
                8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:  # noqa: BLE001
            num_buckets = 16

    def tag(b: pa.Table) -> pa.Table:
        df = pa.table({c: b[c] for c in key_cols}).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False) \
            .to_numpy(dtype="uint64")
        return b.append_column(
            "_b", pa.array((h % num_buckets).astype("int64")))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_cols, sort=False, dropna=False).agg(
            **{out_c: (src, fn)
               for out_c, (src, fn) in spec.items()}).reset_index()
        return out

    return partials.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(combine, batch_format="pandas")


def gated_count(rows: ray.data.Dataset, key: str,
                min_count: int | None = None,
                max_count: int | None = None, out: str = "n",
                task_gate_rows: int = 20_000_000) -> ray.data.Dataset:
    """COUNT(*) per int64 ``key`` — the wide-key replacement for
    ``Dataset.groupby(key).count()``: per-block ``np.unique`` partials,
    then ONE sorted-reduceat task below ``task_gate_rows`` surviving
    partial rows or :func:`bucket_reduce` above it.  Optional
    ``min_count``/``max_count`` filter inside the combine (the common
    df-band / hot-bucket use).  Output: (key, out) rows."""
    import numpy as np

    import ray

    from aida_ray.stages.dedup import _concat_blocks

    def count_partial(b: pa.Table) -> pa.Table:
        k, c = np.unique(b[key].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({key: pa.array(k, pa.int64()),
                         "c": pa.array(c.astype("int64"))})

    counts = rows.map_batches(count_partial,
                              batch_format="pyarrow").materialize()
    lo = 1 if min_count is None else min_count
    hi = max_count
    if counts.count() <= task_gate_rows:
        @ray.remote
        def combine_task(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema(
                [(key, pa.int64()), ("c", pa.int64())]))
            k = t[key].to_numpy(zero_copy_only=False)
            c = t["c"].to_numpy(zero_copy_only=False)
            o = np.argsort(k, kind="stable")
            k, c = k[o], c[o]
            st = np.flatnonzero(np.r_[True, k[1:] != k[:-1]]) \
                if len(k) else np.empty(0, dtype="int64")
            tot = np.add.reduceat(c, st) if len(st) \
                else np.empty(0, dtype="int64")
            keep = tot >= lo
            if hi is not None:
                keep &= tot <= hi
            return pa.table({key: pa.array(k[st][keep], pa.int64()),
                             out: pa.array(tot[keep], pa.int64())})

        return ray.data.from_arrow_refs(
            [combine_task.remote(*counts.to_arrow_refs())]).materialize()
    red = bucket_reduce(counts, [key], {out: ("c", "sum")})
    if hi is not None:
        red = red.filter(expr=f"{out} >= {lo} and {out} <= {hi}")
    elif lo > 1:
        red = red.filter(expr=f"{out} >= {lo}")
    return red.map_batches(lambda b: pa.table({
        key: pc.cast(b[key], pa.int64()),
        out: pc.cast(b[out], pa.int64())}),
        batch_format="pyarrow").materialize()
