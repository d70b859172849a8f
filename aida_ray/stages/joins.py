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
import pandas as pd
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

    int_cols = [c for c, t in {**ltype, **rtype}.items()
                if pa.types.is_integer(t)]
    if pa.types.is_integer(ltype[ts_col]):
        int_cols.append(ts_col + "_r")

    def _fix_int_dtypes(df: pd.DataFrame) -> pd.DataFrame:
        # the tagged union carries nulls, so pandas groups coerce int
        # columns to float64 — restore the declared integer dtypes so
        # every group block (and the empty block) has one schema
        for c in int_cols:
            if c in df.columns:
                df[c] = df[c].astype("int64")
        return df

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["_side"] == 0]
        r = g[g["_side"] == 1].sort_values(ts_col, kind="mergesort")
        if not len(l) or not len(r):
            out = l.iloc[0:0].drop(columns=["_side"]).copy()
            out[ts_col + "_r"] = pd.Series([], dtype="int64")
            return _fix_int_dtypes(out)
        r_ts = r[ts_col].to_numpy()
        idx = np.searchsorted(r_ts, l[ts_col].to_numpy(), side="right") - 1
        keep = idx >= 0
        l = l[keep].copy()
        idx = idx[keep]
        for c in right_cols:
            l[c] = r[c].to_numpy()[idx]
        l[ts_col + "_r"] = r_ts[idx]
        return _fix_int_dtypes(l.drop(columns=["_side"]))

    return lt.union(rt).groupby(key).map_groups(per_key,
                                                batch_format="pandas")
