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


def entity_timeline(ds: ray.data.Dataset, s: str = "subj",
                    ts: str = "ts", ev: str = "event",
                    group_size_limit: int = 2_000_000
                    ) -> ray.data.Dataset:
    """Per-entity timeline assembly: order each subject's dated events
    by (ts, event) and emit a 1-based ordinal plus the gap to the
    previous event (0 for the first) — the downstream shape for
    biography / company-history style KG views.

    Scale shape: one groupby(subj).map_groups keyed by entity — the
    shuffle moves each subject's events once; per-group work is a
    vectorized mergesort + diff (an entity's event history is
    assertion-bounded, guarded by ``group_size_limit``)."""

    def per_subj(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot subject {g[s].iloc[0]!r}: {len(g)} events "
                "exceed the per-group bound")
        g = g.sort_values([ts, ev], kind="mergesort").reset_index(
            drop=True)
        t = g[ts].to_numpy(dtype=np.int64)
        gap = np.diff(t, prepend=t[:1])
        if len(t):
            gap[0] = 0
        return pd.DataFrame({
            s: g[s], ts: t, ev: g[ev],
            "seq": np.arange(1, len(g) + 1, dtype=np.int64),
            "gap": gap.astype(np.int64)})

    return ds.groupby([s]).map_groups(per_subj, batch_format="pandas")


# Allen's 7 forward relations under the (start, end, obj) sort order:
# the earlier interval a never starts after b, so the inverse
# relations (preceded_by, met_by, overlapped_by, during, started_by)
# cannot occur between consecutive sorted intervals.
def _allen_rel(as_, ae, bs, be):
    # vectorized classification; inputs int64 arrays with as_ <= bs
    rel = np.empty(len(as_), dtype=object)
    rel[ae < bs] = "precedes"
    rel[ae == bs] = "meets"
    rel[(as_ < bs) & (ae > bs) & (ae < be)] = "overlaps"
    rel[(as_ < bs) & (ae == be)] = "finished_by"
    rel[(as_ < bs) & (ae > be)] = "contains"
    rel[(as_ == bs) & (ae < be)] = "starts"
    rel[(as_ == bs) & (ae == be)] = "equals"
    return rel


def allen_relations(ds: ray.data.Dataset, s: str = "subj",
                    o: str = "obj", start: str = "start",
                    end: str = "end",
                    group_size_limit: int = 2_000_000
                    ) -> ray.data.Dataset:
    """Allen interval-algebra relation between CONSECUTIVE intervals
    per subject (sorted by (start, end, obj)) — the event-ordering
    primitive for timeline construction.  Because the pair is taken
    in sort order, only the 7 forward relations occur (precedes,
    meets, overlaps, finished_by, contains, starts, equals); inverse
    relations are their mirror and never emitted.

    Emits (subj, obj_a, obj_b, rel) for each consecutive pair.

    Scale shape: one groupby(subj).map_groups; per-group work is one
    mergesort + vectorized comparisons over shifted arrays — linear
    in that subject's interval count (never the quadratic all-pairs
    of interval_conflicts), guarded by ``group_size_limit``."""

    def per_subj(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot subject {g[s].iloc[0]!r}: {len(g)} intervals "
                "exceed the per-group bound")
        g = g.sort_values([start, end, o],
                          kind="mergesort").reset_index(drop=True)
        if len(g) < 2:
            return pd.DataFrame({s: [], "obj_a": [], "obj_b": [],
                                 "rel": []})
        sv = g[start].to_numpy(dtype=np.int64)
        ev = g[end].to_numpy(dtype=np.int64)
        ov = g[o].to_numpy()
        rel = _allen_rel(sv[:-1], ev[:-1], sv[1:], ev[1:])
        return pd.DataFrame({
            s: np.repeat(g[s].iloc[0], len(rel)),
            "obj_a": ov[:-1], "obj_b": ov[1:], "rel": rel})

    return ds.groupby([s]).map_groups(per_subj, batch_format="pandas")


def latest_slot(ds: ray.data.Dataset, s: str = "subj",
                p: str = "pred", o: str = "obj", ts: str = "ts",
                group_size_limit: int = 2_000_000
                ) -> ray.data.Dataset:
    """Most-recent-wins slot resolution: per (subj, pred) the object
    observed at the LATEST timestamp (ties break to the smallest
    object string) — the freshness-based counterpart of slot_fill's
    majority vote, the right rule for volatile slots (price, title,
    employer).

    Emits (subj, pred, obj, ts).

    Scale shape: one groupby((subj, pred)).map_groups keyed by fact
    identity; per-group work is one vectorized argmax over that
    slot's observation history (assertion-bounded, guarded by
    ``group_size_limit``)."""

    def per_slot(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot slot {g[s].iloc[0]!r}/{g[p].iloc[0]!r}: "
                f"{len(g)} observations exceed the per-group bound")
        t = g[ts].to_numpy(dtype=np.int64)
        mx = t.max()
        cand = g[g[ts] == mx]
        obj = cand[o].astype(str).min()
        return pd.DataFrame({s: [g[s].iloc[0]], p: [g[p].iloc[0]],
                             o: [obj],
                             ts: np.array([mx], dtype=np.int64)})

    return ds.groupby([s, p]).map_groups(per_slot,
                                         batch_format="pandas")
