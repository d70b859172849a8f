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


def stream_interval_join(left: ray.data.Dataset,
                         right: ray.data.Dataset,
                         key: str, ts_col: str, id_col: str,
                         delta_us: int,
                         partitions: int = 32,
                         _max_composite: int = (1 << 63) - 1
                         ) -> ray.data.Dataset:
    """Stream-stream interval (bounded-time) equi-join: every (l, r)
    pair sharing ``key`` with |ts_l - ts_r| <= ``delta_us`` — the
    Flink `l.ts BETWEEN r.ts - d AND r.ts + d` intervalJoin / the
    sensor-correlation join.  Emits (key, left id, right id, dt_us)
    with dt_us = ts_r - ts_l.

    Plan (the wide-key-safe shape — NO per-key Python): tag sides,
    union, ONE shuffle by hash(key) % ``partitions``, then each bucket
    sorts BOTH sides once by a composite (key, ts-offset) int64 and
    matches every left row against its right-side window with two
    vectorized searchsorted calls.  Clipping the probe window to the
    key's own ts range keeps composite probes inside the key's
    segment, so thousands of keys ride one numpy call.  Pair volume
    per key is activity x window density — the join's intrinsic
    output, nothing larger is materialized.
    """
    import pandas as pd

    def tag(side: int):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({
                key: pc.cast(b[key], pa.int64()),
                "_id": pc.cast(b[id_col], pa.int64()),
                "_t": pc.cast(b[ts_col], pa.int64()),
                "_side": pa.array(np.full(b.num_rows, side, np.int8)),
            })
        return f

    both = left.map_batches(tag(0), batch_format="pyarrow") \
        .union(right.map_batches(tag(1), batch_format="pyarrow"))

    def bucketize(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        return b.append_column(
            "_b", pa.array((k * 2654435761) % partitions, pa.int64()))

    def _emit(k, ids, t, L, lo, hi, rid_r, t_r, empty):
        cnt = hi - lo
        total = int(cnt.sum())
        if not total:
            return empty
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        ridx = np.repeat(lo, cnt) + offs
        lsel = np.repeat(np.arange(len(lo)), cnt)
        return pd.DataFrame({
            key: k[L][lsel],
            "l_id": ids[L][lsel],
            "r_id": rid_r[ridx],
            "dt_us": t_r[ridx] - t[L][lsel]})

    def solve(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({key: pd.Series([], dtype=np.int64),
                              "l_id": pd.Series([], dtype=np.int64),
                              "r_id": pd.Series([], dtype=np.int64),
                              "dt_us": pd.Series([], dtype=np.int64)})
        k = g[key].to_numpy()
        t = g["_t"].to_numpy()
        side = g["_side"].to_numpy()
        ids = g["_id"].to_numpy()
        tmin = t.min()
        toff = t - tmin
        C = int(toff.max()) + 1
        uk, rank = np.unique(k, return_inverse=True)
        L, R = side == 0, side == 1
        if not R.any() or not L.any():
            return empty
        # fast route: dense-ranked composite (rank * C + toff) — valid
        # only while (n_keys-1)*C + C-1 fits int64 (exact Python-int
        # check; a year-scale microsecond span times ~300k in-bucket
        # keys WOULD wrap, so this is a real gate, not paranoia)
        if (len(uk) - 1) * C + (C - 1) <= _max_composite:
            comp = rank.astype(np.int64) * C + toff
            order_r = np.argsort(comp[R], kind="stable")
            comp_r = comp[R][order_r]
            rid_r = ids[R][order_r]
            t_r = t[R][order_r]
            base = rank[L].astype(np.int64) * C
            lo = np.searchsorted(
                comp_r, base + np.clip(toff[L] - delta_us, 0, C - 1),
                side="left")
            hi = np.searchsorted(
                comp_r, base + np.clip(toff[L] + delta_us, 0, C - 1),
                side="right")
            return _emit(k, ids, t, L, lo, hi, rid_r, t_r, empty)
        # overflow-safe route: right side sorted (rank, toff) once,
        # per-key segments probed individually — O(distinct keys)
        # Python steps, each fully vectorized
        r_rank, r_toff = rank[R], toff[R]
        order_r = np.lexsort((ids[R], r_toff, r_rank))
        rr, rt = r_rank[order_r], r_toff[order_r]
        rid_r, t_r = ids[R][order_r], t[R][order_r]
        seg_lo = np.searchsorted(rr, np.arange(len(uk)), side="left")
        seg_hi = np.searchsorted(rr, np.arange(len(uk)), side="right")
        l_rank, l_toff = rank[L], toff[L]
        lo = np.zeros(len(l_rank), np.int64)
        hi = np.zeros(len(l_rank), np.int64)
        for kr in np.unique(l_rank):
            sel = l_rank == kr
            sl, sh = int(seg_lo[kr]), int(seg_hi[kr])
            seg = rt[sl:sh]
            lo[sel] = sl + np.searchsorted(seg, l_toff[sel] - delta_us,
                                           side="left")
            hi[sel] = sl + np.searchsorted(seg, l_toff[sel] + delta_us,
                                           side="right")
        return _emit(k, ids, t, L, lo, hi, rid_r, t_r, empty)

    return both.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("_b").map_groups(solve, batch_format="pandas")
