"""Temporal scoping of KG assertions (validity intervals).

YAGO2 attaches time scopes to facts; a crawl-built KG derives them
from observation snapshots: the same (subj, pred) observed at many
timestamps with possibly-changing objects yields one VALIDITY
INTERVAL per maximal run of consecutive equal objects (the
gaps-and-islands problem).

Scale shape: one groupby((subj, pred)).map_groups — the shuffle is
keyed by fact identity, never the corpus; per-group work is a
vectorized sort + run-break cumsum over that fact's observation
history (politeness-bounded like the window operators — a single
fact's history is crawl-frequency-sized, guarded by
``group_size_limit``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def validity_intervals(ds: ray.data.Dataset, s: str = "subj",
                       p: str = "pred", o: str = "obj", ts: str = "ts",
                       group_size_limit: int = 2_000_000
                       ) -> ray.data.Dataset:
    """(subj, pred, obj, start_ts, end_ts, n_obs) per maximal run of
    equal objects in the (subj, pred) observation history ordered by
    ts.  A re-asserted object after an interruption starts a NEW
    interval (islands semantics)."""

    def per_fact(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot fact {g[s].iloc[0]!r}/{g[p].iloc[0]!r}: {len(g)} "
                "observations exceed the per-group bound")
        g = g.sort_values(ts, kind="mergesort").reset_index(drop=True)
        run = (g[o] != g[o].shift()).cumsum()
        out = g.groupby(run, sort=True).agg(
            subj=(s, "first"), pred=(p, "first"), obj=(o, "first"),
            start_ts=(ts, "min"), end_ts=(ts, "max"),
            n_obs=(o, "size")).reset_index(drop=True)
        out["n_obs"] = out["n_obs"].astype(np.int64)
        return out

    return ds.groupby([s, p]).map_groups(per_fact, batch_format="pandas")


def interval_conflicts(ds: ray.data.Dataset, s: str = "subj",
                       p: str = "pred", o: str = "obj",
                       start: str = "start", end: str = "end",
                       group_size_limit: int = 100_000
                       ) -> ray.data.Dataset:
    """Temporal functional-property violations: pairs of intervals on
    the same (subj, pred) slot that OVERLAP while asserting DIFFERENT
    objects — "X ledBy A [10, 25]" and "X ledBy B [20, 35]" cannot
    both hold.  The time-scoped refinement of
    kgqa.functional_violations (which flags multi-object slots with
    no time axis at all).

    Emits one row per conflicting pair with the canonical ordering
    obj_a < obj_b and the overlap window
    [max(starts), min(ends)] (closed-interval semantics:
    s1 <= e2 AND s2 <= e1 counts as overlap).

    Scale shape: one groupby((subj, pred)).map_groups keyed by fact
    identity; per-group pairing is quadratic in that SLOT's interval
    count — interval histories are revision-bounded (guarded by
    ``group_size_limit``), never corpus-sized.
    """

    def per_slot(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot slot {g[s].iloc[0]!r}/{g[p].iloc[0]!r}: "
                f"{len(g)} intervals exceed the per-group bound")
        sv = g[start].to_numpy()
        ev = g[end].to_numpy()
        ov = g[o].to_numpy()
        i, j = np.triu_indices(len(g), k=1)
        keep = (ov[i] != ov[j]) & (sv[i] <= ev[j]) & (sv[j] <= ev[i])
        i, j = i[keep], j[keep]
        # canonical ordering: obj_a < obj_b
        swap = ov[i] > ov[j]
        i2 = np.where(swap, j, i)
        j2 = np.where(swap, i, j)
        return pd.DataFrame({
            s: np.repeat(g[s].iloc[0], len(i2)),
            p: np.repeat(g[p].iloc[0], len(i2)),
            "obj_a": ov[i2], "obj_b": ov[j2],
            "overlap_start": np.maximum(sv[i2], sv[j2]).astype(
                np.int64),
            "overlap_end": np.minimum(ev[i2], ev[j2]).astype(
                np.int64)})

    return ds.groupby([s, p]).map_groups(per_slot,
                                         batch_format="pandas")
