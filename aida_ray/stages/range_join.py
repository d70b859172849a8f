"""Range (interval) join — points to containing intervals, per key.

Composition: tag sides, align schemas, UNION, one hash shuffle by the
join key, then per-group vectorized matching: intervals sorted by
start; for each point, candidate intervals are those with
start <= ts (searchsorted prefix), filtered by end >= ts.  A point can
match several intervals (all emitted), exactly like the SQL
``l.ts BETWEEN r.start AND r.end`` inequality join.

Per-group cost is O(P × overlap + (P+I) log I).  Partitioning
assumption: one key's intervals + points fit one group (same caveat as
sessionization / as-of join — cap or time-split adversarially hot
keys).  For UNKEYED range joins broadcast the interval table instead
(it is the small side in every crawl use case: blocklists, outage
windows, campaign ranges).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def range_join(points: ray.data.Dataset, intervals: ray.data.Dataset,
               key: str, ts_col: str, start_col: str, end_col: str,
               interval_cols: list[str]) -> ray.data.Dataset:
    """Inner join: each point row × every same-key interval containing
    its ts (inclusive bounds)."""
    pschema = points.schema()
    ischema = intervals.schema()
    point_cols = list(pschema.names)
    ptype = dict(zip(pschema.names, pschema.types))
    itype = dict(zip(ischema.names, ischema.types))

    def tag_points(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array([0] * len(b), pa.int8()))
        for c in (start_col, end_col, *interval_cols):
            b = b.append_column(c, pa.nulls(len(b), itype[c]))
        return b

    def tag_intervals(b: pa.Table) -> pa.Table:
        out = {key: b[key]}
        for c in point_cols:
            if c != key:
                out[c] = pa.nulls(len(b), ptype[c])
        t = pa.table(out)
        t = t.append_column("_side", pa.array([1] * len(b), pa.int8()))
        for c in (start_col, end_col, *interval_cols):
            t = t.append_column(c, b[c])
        return t

    pt = points.map_batches(tag_points, batch_format="pyarrow")
    cols = pt.schema().names
    it = intervals.map_batches(tag_intervals, batch_format="pyarrow") \
        .map_batches(lambda b: b.select(cols), batch_format="pyarrow")

    # arrow end-to-end: typed nulls never pass through pandas float64
    # (which silently corrupts 64-bit ids above 2^53)
    def per_key(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        p = g.filter(pa.array(side == 0))
        iv = g.filter(pa.array(side == 1))
        if not p.num_rows or not iv.num_rows:
            return p.slice(0, 0).drop_columns(["_side"])
        starts = iv[start_col].to_numpy(zero_copy_only=False)
        order = np.argsort(starts, kind="stable")
        iv = iv.take(pa.array(order, pa.int64()))
        starts = starts[order]
        ends = iv[end_col].to_numpy(zero_copy_only=False)
        ts = p[ts_col].to_numpy(zero_copy_only=False)
        hi = np.searchsorted(starts, ts, side="right")
        out_p, out_i = [], []
        for row_i in range(p.num_rows):
            cand = np.nonzero(ends[:hi[row_i]] >= ts[row_i])[0]
            out_p.extend([row_i] * len(cand))
            out_i.extend(cand.tolist())
        res = p.take(pa.array(out_p, pa.int64())).drop_columns(["_side"])
        take_i = pa.array(out_i, pa.int64())
        for c in (start_col, end_col, *interval_cols):
            res = res.set_column(res.schema.get_field_index(c), c,
                                 iv[c].take(take_i))
        return res

    return pt.union(it).groupby(key).map_groups(per_key,
                                                batch_format="pyarrow")


def broadcast_range_join(points: ray.data.Dataset, intervals: pa.Table,
                         ts_col: str, start_col: str, end_col: str,
                         interval_cols: list[str]) -> ray.data.Dataset:
    """UNKEYED range join: each point row × every interval containing its
    ts (inclusive bounds), with the interval table BROADCAST.

    The small side (blocklists, outage windows, campaign ranges — the
    unkeyed case in every crawl use) is sorted by start once on the
    driver and shipped via ``ray.put``; each point batch then matches
    fully vectorized (searchsorted prefix + end mask, no per-point
    Python loop) with zero shuffle — the point side streams.
    """
    order = pc.sort_indices(intervals, sort_keys=[(start_col, "ascending")])
    iv = intervals.take(order).combine_chunks()
    iv_ref = ray.put(iv)

    def match(b: pa.Table) -> pa.Table:
        ivt = _get_cached_iv(iv_ref)
        starts = ivt[start_col].to_numpy(zero_copy_only=False)
        ends = ivt[end_col].to_numpy(zero_copy_only=False)
        ts = b[ts_col].to_numpy(zero_copy_only=False)
        hi = np.searchsorted(starts, ts, side="right")
        total = int(hi.sum())
        if not total:
            res = b.slice(0, 0)
            for c in (start_col, end_col, *interval_cols):
                res = res.append_column(c, ivt[c].slice(0, 0))
            return res
        p_idx = np.repeat(np.arange(len(ts)), hi)
        offsets = np.cumsum(hi) - hi
        i_idx = np.arange(total) - np.repeat(offsets, hi)
        mask = ends[i_idx] >= ts[p_idx]
        p_idx, i_idx = p_idx[mask], i_idx[mask]
        res = b.take(pa.array(p_idx, pa.int64()))
        take_i = pa.array(i_idx, pa.int64())
        for c in (start_col, end_col, *interval_cols):
            res = res.append_column(c, ivt[c].take(take_i))
        return res

    return points.map_batches(match, batch_format="pyarrow")


_IV_CACHE: dict = {}


def _get_cached_iv(ref):
    """Memoize the broadcast interval table once per worker process."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _IV_CACHE:
        _IV_CACHE.clear()
        _IV_CACHE[key] = ray.get(ref)
    return _IV_CACHE[key]
