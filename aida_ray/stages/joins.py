"""As-of (most-recent-prior) join — a custom operator Ray Data lacks.

Composition: tag both sides, align schemas, UNION, one hash shuffle by
the join key (`groupby(key).map_groups`), then a per-group vectorized
numpy ``searchsorted`` match: each left row picks the right row with
the greatest ``ts`` <= its own (inclusive, DuckDB ASOF semantics).
Per-group cost is O((L+R) log R) with no Python row loop.

Partitioning assumption (document per the brief): one group = one join
key's full history, so a pathologically hot key (one user with a
billion events) is a straggler — cap or pre-split by time range if the
key distribution is adversarial; normal user/session keys are fine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset,
              key: str, ts_col: str,
              right_cols: list[str]) -> ray.data.Dataset:
    """For each left row, attach `right_cols` from the right row with
    the largest ts <= left ts (same key); unmatched left rows drop
    (inner as-of).  The right side's ts is emitted as ``<ts_col>_r``."""
    lschema = left.schema()
    rschema = right.schema()
    left_cols = [c for c in lschema.names if c != "_side"]
    ltype = dict(zip(lschema.names, lschema.types))
    rtype = dict(zip(rschema.names, rschema.types))

    def tag_left(b: pa.Table) -> pa.Table:
        b = b.append_column("_side", pa.array([0] * len(b), pa.int8()))
        for c in right_cols:
            b = b.append_column(c, pa.nulls(len(b), rtype[c]))
        return b

    def tag_right(b: pa.Table) -> pa.Table:
        out = {key: b[key], ts_col: b[ts_col]}
        for c in left_cols:
            if c not in out:
                out[c] = pa.nulls(len(b), ltype[c])
        t = pa.table(out)
        t = t.append_column("_side", pa.array([1] * len(b), pa.int8()))
        for c in right_cols:
            t = t.append_column(c, b[c])
        return t

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    # align column order for union
    cols = lt.schema().names
    rt = rt.map_batches(lambda b: b.select(cols), batch_format="pyarrow")

    # group function works on ARROW tables end-to-end: the tagged-union
    # nulls stay typed (a pandas group would coerce int64-with-null to
    # float64 and silently corrupt 64-bit ids above 2^53)
    def per_key(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        l = g.filter(pa.array(side == 0))
        r = g.filter(pa.array(side == 1))
        if not l.num_rows or not r.num_rows:
            empty = l.slice(0, 0).drop_columns(["_side"])
            return empty.append_column(
                ts_col + "_r", pa.nulls(0, ltype[ts_col]))
        r_ts = r[ts_col].to_numpy(zero_copy_only=False)
        order = np.argsort(r_ts, kind="stable")
        r = r.take(pa.array(order, pa.int64()))
        r_ts = r_ts[order]
        idx = np.searchsorted(r_ts, l[ts_col].to_numpy(zero_copy_only=False),
                              side="right") - 1
        keep = idx >= 0
        l = l.filter(pa.array(keep))
        take = pa.array(idx[keep], pa.int64())
        out = l.drop_columns(["_side"])
        for c in right_cols:
            out = out.set_column(out.schema.get_field_index(c), c,
                                 r[c].take(take))
        return out.append_column(ts_col + "_r", r[ts_col].take(take))

    return lt.union(rt).groupby(key).map_groups(per_key,
                                                batch_format="pyarrow")
