"""Per-key ordered-sequence analytics over event logs.

Three classic log-pipeline shapes, all sharing one plan: ONE hash
shuffle co-locates each key's events, the per-key work is vectorized
numpy/pandas over the (ts, event_id) TOTAL order (equal timestamps
never make answers depend on block order), and only tiny aggregate
rows leave the group stage.

- :func:`event_transitions` — Markov transition counts between
  consecutive event types per user, summed globally.  The per-key
  stage emits local (from, to, n) partials, so the final shuffle
  ships the |types|² transition matrix, not the log.
- :func:`retention_cohorts` — users per (first-seen week, week
  offset): the cohort-retention triangle.  Per-key output is that
  user's distinct active-week offsets (bounded by weeks, not events);
  the finishing groupby counts users per cell.
- :func:`collapse_repeats` — per-user count of events surviving
  consecutive-duplicate collapse (an event is dropped when its type
  equals the immediately preceding event's type) — the standard
  log-cleaning dedup; one row per user out.

Per-group state is one key's events (the same bounded-group
assumption as sessionize; pre-split pathological keys by coarse time
bucket otherwise).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

WEEK_US = 7 * 86_400_000_000
DAY_US = 86_400_000_000
# 1970-01-01 was a Thursday; shifting by 3 days makes Monday the week
# origin — the same truncation as SQL date_trunc('week').
_MONDAY_SHIFT_DAYS = 3


def _prep(events: ray.data.Dataset, key: str, ts_col: str,
          cols: dict[str, str]) -> ray.data.Dataset:
    def f(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        out = {key: b[key], "t": pc.cast(ts, pa.int64())}
        for name, src in cols.items():
            out[name] = b[src]
        return pa.table(out)

    return events.map_batches(f, batch_format="pyarrow")


def event_transitions(events: ray.data.Dataset, key: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      id_col: str = "event_id") -> ray.data.Dataset:
    """Global (from_type, to_type, n) counts of consecutive event-type
    transitions within each key's (ts, event_id)-ordered history.

    Plan: ONE range sort on (key, t, eid) co-locates and orders every
    key's history, each batch counts the transitions of its fully
    contained keys in one vectorized pass (per-key ``map_groups`` paid
    ~ms of pandas overhead × thousands of keys — that overhead, not
    the pair math, dominated the old plan), and the ≤ 2 boundary keys
    per batch close in one small task — the same plan as
    ``graphs.cooccurrence_edges``."""
    from ray.data.aggregate import Sum

    srt = _prep(events, key, ts_col,
                {"et": type_col, "eid": id_col}) \
        .sort([key, "t", "eid"]).materialize()

    def count_pairs(k: np.ndarray, et: np.ndarray) -> pd.DataFrame:
        if len(k) < 2:
            return pd.DataFrame({"from_type": pd.Series(dtype=object),
                                 "to_type": pd.Series(dtype=object),
                                 "n": pd.Series(dtype="int64")})
        same = k[1:] == k[:-1]
        return pd.DataFrame({"from_type": et[:-1][same],
                             "to_type": et[1:][same]}) \
            .groupby(["from_type", "to_type"], sort=False) \
            .size().rename("n").reset_index()

    def inner(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        et = b["et"].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"from_type": pa.array([], pa.string()),
                             "to_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        keep = (k != k[0]) & (k != k[-1])
        return pa.Table.from_pandas(count_pairs(k[keep], et[keep]),
                                    preserve_index=False)

    def boundary(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "eid": pa.array([], pa.int64()),
                             "et": pa.array([], pa.string())})
        keep = (k == k[0]) | (k == k[-1])
        return pa.table({
            key: pa.array(k[keep]),
            "t": pc.array_filter(b["t"].combine_chunks(),
                                 pa.array(keep)),
            "eid": pc.array_filter(b["eid"].combine_chunks(),
                                   pa.array(keep)),
            "et": pc.array_filter(b["et"].combine_chunks(),
                                  pa.array(keep))})

    @ray.remote
    def close_boundaries(*tabs: pa.Table) -> pa.Table:
        from aida_ray.stages.dedup import _concat_blocks
        t = _concat_blocks(tabs, pa.schema(
            [(key, pa.int64()), ("t", pa.int64()),
             ("eid", pa.int64()), ("et", pa.string())]))
        k = t[key].to_numpy(zero_copy_only=False)
        o = np.lexsort((t["eid"].to_numpy(zero_copy_only=False),
                        t["t"].to_numpy(zero_copy_only=False), k))
        return pa.Table.from_pandas(count_pairs(
            k[o], t["et"].to_numpy(zero_copy_only=False)[o]),
            preserve_index=False)

    brefs = srt.map_batches(boundary,
                            batch_format="pyarrow").to_arrow_refs()
    bpart = ray.data.from_arrow_refs([close_boundaries.remote(*brefs)]) \
        if brefs else ray.data.from_arrow(pa.table(
            {"from_type": pa.array([], pa.string()),
             "to_type": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}))
    partials = srt.map_batches(inner, batch_format="pyarrow") \
        .union(bpart)
    agg = partials.groupby(["from_type", "to_type"]).aggregate(Sum("n"))
    return agg.map_batches(lambda b: pa.table({
        "from_type": b["from_type"], "to_type": b["to_type"],
        "n": pc.cast(b["sum(n)"], pa.int64())}), batch_format="pyarrow")


def _week_start_day(t_us: np.ndarray) -> np.ndarray:
    days = t_us // DAY_US
    return days - (days + _MONDAY_SHIFT_DAYS) % 7


def retention_cohorts(events: ray.data.Dataset, key: str = "user_id",
                      ts_col: str = "ts") -> ray.data.Dataset:
    """(cohort_week, week_offset, n_users): how many users first seen
    in cohort_week were active week_offset weeks later."""
    from ray.data.aggregate import Sum

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        wk = _week_start_day(g.t.to_numpy())        # week-start day no.
        cohort = int(wk.min())
        offs = np.unique((wk - cohort) // 7)
        return pd.DataFrame({
            "cohort_day": np.full(len(offs), cohort, dtype="int64"),
            "week_offset": offs.astype("int64"),
            "n": np.ones(len(offs), dtype="int64")})

    partials = _prep(events, key, ts_col, {}) \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    agg = partials.groupby(["cohort_day", "week_offset"]) \
        .aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        day = b["cohort_day"].to_numpy(zero_copy_only=False)
        label = pc.strftime(pc.cast(
            pa.array(day * DAY_US, pa.int64()), pa.timestamp("us")),
            format="%Y-%m-%d")
        return pa.table({
            "cohort_week": label,
            "week_offset": pc.cast(b["week_offset"], pa.int64()),
            "n_users": pc.cast(b["sum(n)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def collapse_repeats(events: ray.data.Dataset, key: str = "user_id",
                     ts_col: str = "ts", type_col: str = "event_type",
                     id_col: str = "event_id") -> ray.data.Dataset:
    """Per-key count of events surviving consecutive-duplicate-type
    collapse over the (ts, event_id) order.  Output: (key, n_kept)."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "eid"])
        et = g.et.to_numpy()
        kept = 1 + int((et[1:] != et[:-1]).sum()) if len(et) else 0
        return pd.DataFrame({key: [g[key].iloc[0]],
                             "n_kept": [kept]})

    out = _prep(events, key, ts_col, {"et": type_col, "eid": id_col}) \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    return out.map_batches(lambda b: pa.table({
        key: pc.cast(b[key], pa.int64()),
        "n_kept": pc.cast(b["n_kept"], pa.int64())}),
        batch_format="pyarrow")


def rolling_active_users(events: ray.data.Dataset,
                         key: str = "user_id", ts_col: str = "ts",
                         window_days: int = 7) -> ray.data.Dataset:
    """Rolling distinct-user count (WAU-style): for every calendar day
    with activity, the number of distinct users active in the trailing
    ``window_days``-day window.

    Plan: per-batch distinct (user, day) rows (map-only), each fanned
    out to the ``window_days`` window-end days it supports — volume =
    W × |user-days|, never the event log — then one distinct+count
    per (window_day, user).  Days with no activity emit no row."""
    def fan_out(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        day = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False) \
            // DAY_US
        uid = b[key].to_numpy(zero_copy_only=False).astype("int64")
        # block-local distinct (user, day); epoch day numbers fit 20
        # bits until year ~4840, user ids the remaining 43
        u = np.unique((uid << 20) | day) \
            if len(uid) else np.empty(0, dtype="int64")
        uu, dd = u >> 20, u & ((1 << 20) - 1)
        w = np.arange(window_days, dtype="int64")
        wday = (dd[:, None] + w[None, :]).ravel()
        wuid = np.repeat(uu, window_days)
        return pa.table({"wday": pa.array(wday, pa.int64()),
                         "uid": pa.array(wuid, pa.int64())})

    # activity days: only emit windows ending on a day with activity
    def active_days(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        day = pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False) \
            // DAY_US
        return pa.table({"day": pa.array(np.unique(day), pa.int64())})

    days = events.select_columns([ts_col]) \
        .map_batches(active_days, batch_format="pyarrow")
    day_blocks = [t["day"].to_numpy(zero_copy_only=False)
                  for t in [ray.get(r) for r in days.to_arrow_refs()]
                  if isinstance(t, pa.Table) and t.num_rows]
    days_set = np.unique(np.concatenate(day_blocks)) if day_blocks \
        else np.empty(0, dtype="int64")
    days_ref = ray.put(pa.array(days_set, pa.int64()))

    def keep_active(b: pa.Table) -> pa.Table:
        from aida_ray.stages.dedup import _get_cached
        return b.filter(pc.is_in(b["wday"],
                                 value_set=_get_cached(days_ref)))

    pairs = events.select_columns([key, ts_col]) \
        .map_batches(fan_out, batch_format="pyarrow") \
        .map_batches(keep_active, batch_format="pyarrow")

    # distinct (wday, uid) then count per wday: block-local distinct
    # first, then one groupby on the packed pair, then a day count
    def local_distinct(b: pa.Table) -> pa.Table:
        p = np.unique((b["uid"].to_numpy(zero_copy_only=False) << 20)
                      | b["wday"].to_numpy(zero_copy_only=False))
        return pa.table({"p": pa.array(p, pa.int64())})

    from aida_ray.stages.agg import gated_count
    distinct = gated_count(pairs.map_batches(
        local_distinct, batch_format="pyarrow"), "p")

    def day_partial(b: pa.Table) -> pa.Table:
        d, n = np.unique(b["p"].to_numpy(zero_copy_only=False)
                         & ((1 << 20) - 1), return_counts=True)
        return pa.table({"day": pa.array(d, pa.int64()),
                         "n": pa.array(n.astype("int64"))})

    from ray.data.aggregate import Sum
    out = distinct.map_batches(day_partial, batch_format="pyarrow") \
        .groupby("day").aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        day = b["day"].to_numpy(zero_copy_only=False)
        label = pc.strftime(pc.cast(pa.array(day * DAY_US, pa.int64()),
                                    pa.timestamp("us")),
                            format="%Y-%m-%d")
        return pa.table({"day": label,
                         "active_users": pc.cast(b["sum(n)"],
                                                 pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow")


def prior_window_counts(events: ray.data.Dataset,
                        key: str = "user_id", ts_col: str = "ts",
                        id_col: str = "event_id",
                        window_s: int = 3600) -> ray.data.Dataset:
    """Velocity features: for every event, how many events the same
    key produced in the strictly-prior ``window_s`` window
    [t − W, t) — the classic fraud/abuse rate signal.

    One key shuffle, then per-key the counts are TWO vectorized
    ``searchsorted`` calls over that key's sorted timestamps (same-
    timestamp events never count each other, so the result is
    deterministic under any ordering of ties).  Output:
    (event_id, n_prior)."""
    win_us = window_s * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "eid"])
        t = g.t.to_numpy()
        lo = np.searchsorted(t, t - win_us, side="left")
        hi = np.searchsorted(t, t, side="left")
        return pd.DataFrame({"event_id": g.eid.to_numpy(),
                             "n_prior": (hi - lo).astype("int64")})

    out = _prep(events, key, ts_col, {"eid": id_col}) \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    return out.map_batches(lambda b: pa.table({
        "event_id": pc.cast(b["event_id"], pa.int64()),
        "n_prior": pc.cast(b["n_prior"], pa.int64())}),
        batch_format="pyarrow")


def last_touch_attribution(events: ray.data.Dataset,
                           key: str = "user_id", ts_col: str = "ts",
                           id_col: str = "event_id",
                           type_col: str = "event_type",
                           convert_type: str = "purchase",
                           touch_type: str = "view"
                           ) -> ray.data.Dataset:
    """Last-touch attribution: for every conversion event, the id of
    the same key's most recent STRICTLY prior touch event and the
    latency to it — a self as-of join expressed as one key shuffle +
    per-key vectorized searchsorted.  Conversions with no prior touch
    report touch_id −1, latency −1.  Ties on touch timestamps resolve
    to the largest event id (the (ts, event_id) total order)."""
    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["t", "eid"])
        conv = g[g.et == convert_type]
        touch = g[g.et == touch_type]
        if conv.empty:
            return pd.DataFrame({"event_id": [], "touch_id": [],
                                 "latency_us": []})
        tt = touch.t.to_numpy()
        tid = touch.eid.to_numpy()
        if len(tt) == 0:
            touch_id = np.full(len(conv), -1, dtype="int64")
            latency = np.full(len(conv), -1, dtype="int64")
        else:
            idx = np.searchsorted(tt, conv.t.to_numpy(),
                                  side="left") - 1
            has = idx >= 0
            safe = np.where(has, idx, 0)
            touch_id = np.where(has, tid[safe], -1)
            latency = np.where(has, conv.t.to_numpy() - tt[safe], -1)
        return pd.DataFrame({
            "event_id": conv.eid.to_numpy().astype("int64"),
            "touch_id": touch_id.astype("int64"),
            "latency_us": latency.astype("int64")})

    out = _prep(events, key, ts_col,
                {"eid": id_col, "et": type_col}) \
        .groupby(key).map_groups(per_key, batch_format="pandas")
    return out.map_batches(lambda b: pa.table({
        "event_id": pc.cast(b["event_id"], pa.int64()),
        "touch_id": pc.cast(b["touch_id"], pa.int64()),
        "latency_us": pc.cast(b["latency_us"], pa.int64())}),
        batch_format="pyarrow")


def _ntile(rank0: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k): the first n%k buckets get one extra row."""
    small = n // k
    n_big = n % k
    big_span = n_big * (small + 1)
    in_big = rank0 < big_span
    out = np.where(
        in_big, rank0 // (small + 1),
        n_big + (np.maximum(rank0 - big_span, 0)
                 // max(small, 1)))
    return (out + 1).astype("int64")


def rfm_segments(events: ray.data.Dataset, key: str = "user_id",
                 ts_col: str = "ts", val_col: str = "value",
                 k: int = 4) -> pa.Table:
    """RFM segmentation: per user, Recency (last-seen ts), Frequency
    (event count), Monetary (exact 1e-6-unit integer sum of value),
    each bucketed into NTILE(k) with the deterministic (metric DESC,
    user_id) order, plus the combined ``rfm = 100·r + 10·f + m`` code.

    Plan: per-batch partial (user, max_t, n, Σv) rows → one groupby
    over users (partial volume = users × blocks) → a single finishing
    task computes the three rank-based bucketings (the per-USER
    aggregate is assumed driver-bounded; at 10^9 users the finisher
    becomes the distributed sort + broadcast-histogram rank pattern
    of rank_global)."""
    from ray.data.aggregate import Max, Sum

    def partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        v6 = pc.cast(pc.round(pc.multiply(b[val_col], 1e6),
                              round_mode="half_towards_infinity"),
                     pa.int64())
        g = pa.table({key: b[key], "t": pc.cast(ts, pa.int64()),
                      "v6": v6}).to_pandas() \
            .groupby(key, sort=False) \
            .agg(max_t=("t", "max"), n=("t", "size"),
                 v6=("v6", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = events.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(Max("max_t"), Sum("n"), Sum("v6"))

    from aida_ray.state.collect import collect_table
    t = collect_table(agg, schema=pa.schema(
        [(key, pa.string()), ("max(max_t)", pa.int64()),
         ("sum(n)", pa.int64()), ("sum(v6)", pa.int64())]))
    users = np.asarray(t[key].to_pylist(), dtype=object)
    max_t = t["max(max_t)"].to_numpy(zero_copy_only=False)
    n_ev = t["sum(n)"].to_numpy(zero_copy_only=False).astype("int64")
    v6 = t["sum(v6)"].to_numpy(zero_copy_only=False).astype("int64")
    n = len(users)

    def score(metric: np.ndarray) -> np.ndarray:
        # rank by (metric DESC, user_id ASC) — a total order
        order = np.lexsort((users, -metric))
        rank0 = np.empty(n, dtype="int64")
        rank0[order] = np.arange(n)
        return _ntile(rank0, n, k)

    r_s, f_s, m_s = score(max_t), score(n_ev), score(v6)
    out = pa.table({
        key: pa.array(list(users)),
        "recency_us": pa.array(max_t, pa.int64()),
        "frequency": pa.array(n_ev, pa.int64()),
        "monetary_1e6": pa.array(v6, pa.int64()),
        "r_score": pa.array(r_s, pa.int64()),
        "f_score": pa.array(f_s, pa.int64()),
        "m_score": pa.array(m_s, pa.int64()),
        "rfm": pa.array(100 * r_s + 10 * f_s + m_s, pa.int64())})
    idx = pc.sort_indices(out, sort_keys=[(key, "ascending")])
    return out.take(idx)


def activity_islands(events: ray.data.Dataset, key: str = "user_id",
                     ts_col: str = "ts") -> ray.data.Dataset:
    """Gaps-and-islands: per key, maximal runs of CONSECUTIVE active
    days — (key, island start day, island length).

    Per-batch distinct (key, day) partials shrink the shuffle to
    active-day pairs; the per-key stage is a sorted-diff split over
    that key's distinct days (bounded by the calendar, not by
    events).  Matches the SQL row_number-difference idiom."""
    def day_partial(b: pa.Table) -> pa.Table:
        ts = b[ts_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        df = pa.table({
            key: b[key],
            "day": pc.divide(pc.cast(ts, pa.int64()),
                             DAY_US)}).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        days = np.unique(g["day"].to_numpy(dtype="int64"))
        if not len(days):
            return pd.DataFrame({key: [], "start_day": [],
                                 "n_days": []})
        cut = np.flatnonzero(np.diff(days) > 1) + 1
        starts = np.concatenate([[0], cut])
        ends = np.concatenate([cut, [len(days)]])
        return pd.DataFrame({
            key: [g[key].iloc[0]] * len(starts),
            "start_day": days[starts].astype("int64"),
            "n_days": (ends - starts).astype("int64")})

    return events.map_batches(day_partial, batch_format="pyarrow") \
        .groupby(key).map_groups(per_key, batch_format="pandas")


def event_paths(events: ray.data.Dataset, key: str = "user_id",
                ts_col: str = "ts", type_col: str = "event_type",
                id_col: str = "event_id") -> ray.data.Dataset:
    """Per-key ordered event-type path — the SQL
    ``STRING_AGG(type, ',' ORDER BY ts, id) GROUP BY key``.

    Same plan as :func:`event_transitions`: ONE range sort on
    (key, t, eid) orders every key's history, each batch joins the
    paths of its fully contained keys in one pass, and the ≤2 boundary
    keys per batch close in one small task.  Each key is emitted by
    exactly one of the two routes, so no final merge is needed."""

    srt = _prep(events, key, ts_col,
                {"et": type_col, "eid": id_col}) \
        .sort([key, "t", "eid"]).materialize()

    def paths(k: np.ndarray, et: np.ndarray) -> pa.Table:
        if not len(k):
            return pa.table({key: pa.array([], pa.int64()),
                             "seq": pa.array([], pa.string())})
        g = pd.DataFrame({key: k, "et": et}) \
            .groupby(key, sort=False)["et"] \
            .agg(",".join).rename("seq").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def inner(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "seq": pa.array([], pa.string())})
        keep = (k != k[0]) & (k != k[-1])
        return paths(k[keep],
                     b["et"].to_numpy(zero_copy_only=False)[keep])

    def boundary(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({key: pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "eid": pa.array([], pa.int64()),
                             "et": pa.array([], pa.string())})
        keep = (k == k[0]) | (k == k[-1])
        return pa.table({
            key: pa.array(k[keep]),
            "t": pc.array_filter(b["t"].combine_chunks(),
                                 pa.array(keep)),
            "eid": pc.array_filter(b["eid"].combine_chunks(),
                                   pa.array(keep)),
            "et": pc.array_filter(b["et"].combine_chunks(),
                                  pa.array(keep))})

    @ray.remote
    def close_boundaries(*tabs: pa.Table) -> pa.Table:
        from aida_ray.stages.dedup import _concat_blocks
        t = _concat_blocks(tabs, pa.schema(
            [(key, pa.int64()), ("t", pa.int64()),
             ("eid", pa.int64()), ("et", pa.string())]))
        k = t[key].to_numpy(zero_copy_only=False)
        o = np.lexsort((t["eid"].to_numpy(zero_copy_only=False),
                        t["t"].to_numpy(zero_copy_only=False), k))
        return paths(k[o],
                     t["et"].to_numpy(zero_copy_only=False)[o])

    brefs = srt.map_batches(boundary,
                            batch_format="pyarrow").to_arrow_refs()
    bpart = ray.data.from_arrow_refs([close_boundaries.remote(*brefs)])
    return srt.map_batches(inner, batch_format="pyarrow").union(bpart)
