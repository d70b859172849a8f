"""SQL window functions, Ray-Data-shaped.

Two distribution patterns cover the standard window-function surface:

- :func:`partitioned_window` — ``PARTITION BY key ORDER BY ts``
  functions (LAG / LEAD / ROW_NUMBER / running sum): one hash shuffle
  groups each key, then a vectorized in-group computation.  Same
  partitioning assumption as :mod:`aida_ray.stages.sessions` — one
  key's history fits one worker (pre-split hot keys by time bucket
  otherwise); running sums use int64 cents so the result is bit-exact
  regardless of DuckDB's segment-tree addition order.

- :func:`global_rank` — ``RANK() / DENSE_RANK() OVER (ORDER BY x)``
  with NO partition key: a total order normally means a global sort,
  but rank-of-value only needs the count of smaller values.  We build
  the distributed value histogram (shuffle volume = distinct values),
  broadcast the sorted cumulative counts once via ``ray.put``, and
  assign ranks in a stateless ``map_batches`` — the fact table itself
  is never shuffled or sorted.  Scale assumption: distinct-value volume
  fits a broadcast blob (price-like columns); for continuous columns at
  10^12 rows, substitute the mergeable quantile sketch
  (`sketches.quantile_sketch`) for approximate ranks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached


def partitioned_window(events: ray.data.Dataset, key: str = "user_id",
                       ts_col: str = "ts", val_col: str = "value",
                       id_col: str = "event_id",
                       group_size_limit: int = 50_000_000
                       ) -> ray.data.Dataset:
    """Per-key windowed columns over an event log, ordered by
    (ts, id) for deterministic ties:

    - ``rn`` — ROW_NUMBER() (1-based),
    - ``prev_cents`` / ``next_cents`` — LAG/LEAD of the value in int64
      cents (null → arrow null at the partition edges),
    - ``cum_cents`` — running sum in int64 cents.
    """

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > group_size_limit:
            raise ValueError(
                f"hot key {group[key].iloc[0]!r}: {len(group)} rows "
                "exceed the per-group bound — pre-split by time bucket")
        g = group.sort_values([ts_col, id_col]).reset_index(drop=True)
        cents = np.floor(np.abs(g[val_col].to_numpy()) * 100 + 0.5) \
            * np.sign(g[val_col].to_numpy())
        cents = cents.astype("int64")
        n = len(g)
        # NTILE(4): first n%4 buckets get ceil(n/4) rows (SQL exact)
        q, r = divmod(n, 4)
        sizes = np.full(4, q, dtype="int64")
        sizes[:r] += 1
        ntile = np.repeat(np.arange(1, 5, dtype="int64"), sizes)[:n]
        idx0 = np.arange(n, dtype="int64")
        pct = idx0 / (n - 1) if n > 1 else np.zeros(n)
        out = pd.DataFrame({
            key: g[key],
            id_col: g[id_col],
            "rn": idx0 + 1,
            "prev_cents": pd.array(np.roll(cents, 1), dtype="Int64"),
            "next_cents": pd.array(np.roll(cents, -1), dtype="Int64"),
            "cum_cents": np.cumsum(cents),
            "ntile4": ntile,
            "pct_rank": pct,
            "first_cents": np.full(n, cents[0] if n else 0),
            "last_cents": np.full(n, cents[-1] if n else 0),
        })
        if len(out):
            out.loc[0, "prev_cents"] = pd.NA
            out.loc[len(out) - 1, "next_cents"] = pd.NA
        return out

    return events.groupby(key).map_groups(per_key, batch_format="pandas")


def global_rank(ds: ray.data.Dataset, col: str,
                keep_cols: tuple[str, ...] = ()) -> ray.data.Dataset:
    """RANK and DENSE_RANK over a total value order without sorting or
    shuffling the fact table: histogram → broadcast cumulative counts →
    stateless rank assignment per batch."""
    from aida_ray.stages.sketches import value_histogram

    hist = value_histogram(ds, col).to_pandas().sort_values(col)
    values = hist[col].to_numpy()
    counts = hist["n"].to_numpy(dtype="int64")
    # RANK of value v = (#rows with smaller value) + 1
    smaller = np.concatenate([[0], np.cumsum(counts)[:-1]])
    lookup_ref = ray.put((values, smaller))

    def assign(b: pa.Table) -> pa.Table:
        vals, small = _get_cached(lookup_ref)
        x = b[col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(vals, x)
        cols = {c: b[c] for c in keep_cols}
        cols[col] = b[col]
        cols["rank"] = pa.array(small[idx] + 1, pa.int64())
        cols["dense_rank"] = pa.array(idx + 1, pa.int64())
        return pa.table(cols)

    return ds.map_batches(assign, batch_format="pyarrow")


def sliding_frame_sum(events: ray.data.Dataset, key: str = "user_id",
                      ts_col: str = "ts", val_col: str = "value",
                      id_col: str = "event_id", frame: int = 7,
                      group_size_limit: int = 50_000_000
                      ) -> ray.data.Dataset:
    """Per-key ROWS-frame moving aggregate — the SQL
    ``SUM/COUNT(...) OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``.

    One shuffle (the per-key groupby); inside each group the sliding
    sum is a cumsum difference, not a Python window loop.  Values ride
    int64 cents so the moving sums are reduction-order-free and the
    DuckDB oracle hash-matches.  Same per-group bound caveat as
    `partitioned_window`: a single hot key is one group."""

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > group_size_limit:
            raise ValueError(
                f"hot key {group[key].iloc[0]!r}: {len(group)} rows "
                "exceed the per-group bound — pre-split by time bucket")
        from aida_ray.stages.relational import _cents
        g = group.sort_values([ts_col, id_col]).reset_index(drop=True)
        cents = _cents(pa.chunked_array(
            [pa.array(g[val_col].to_numpy())])) \
            .to_numpy(zero_copy_only=False)
        n = len(g)
        cum = np.concatenate([[0], np.cumsum(cents)])
        lo = np.maximum(np.arange(n) - frame + 1, 0)
        return pd.DataFrame({
            key: g[key],
            id_col: g[id_col],
            "frame_sum_cents": cum[np.arange(n) + 1] - cum[lo],
            "frame_n": np.arange(n) - lo + 1,
        })

    return events.groupby(key).map_groups(per_key,
                                          batch_format="pandas")


def sliding_frame_median(events: ray.data.Dataset, key: str = "user_id",
                         ts_col: str = "ts", val_col: str = "value",
                         id_col: str = "event_id", frame: int = 7,
                         group_size_limit: int = 50_000_000
                         ) -> ray.data.Dataset:
    """Per-key ROWS-frame moving EXACT median — the SQL
    ``MEDIAN(...) OVER (PARTITION BY key ORDER BY ts, id
    ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``.

    Same one-shuffle shape as `sliding_frame_sum`; inside each group
    the full windows are ONE numpy sliding_window_view + median over
    axis 1 (no Python window loop); only the first frame-1 expanding
    rows loop, bounded by the frame constant.  Output rides
    ``frame_median_cents_x2`` (2x the cent median is always an exact
    int64 for any frame parity) so the oracle comparison never touches
    float."""

    def per_key(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) > group_size_limit:
            raise ValueError(
                f"hot key {group[key].iloc[0]!r}: {len(group)} rows "
                "exceed the per-group bound — pre-split by time bucket")
        from aida_ray.stages.relational import _cents
        g = group.sort_values([ts_col, id_col]).reset_index(drop=True)
        cents = _cents(pa.chunked_array(
            [pa.array(g[val_col].to_numpy())])) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        med2 = np.empty(n, np.int64)
        head = min(frame - 1, n)
        for i in range(head):                 # bounded by the frame
            w = np.sort(cents[:i + 1])
            m = len(w)
            med2[i] = int(w[m // 2] * 2) if m % 2 \
                else int(w[m // 2 - 1] + w[m // 2])
        if n >= frame:
            wins = np.lib.stride_tricks.sliding_window_view(cents, frame)
            sw = np.sort(wins, axis=1)
            if frame % 2:
                med2[frame - 1:] = sw[:, frame // 2] * 2
            else:
                med2[frame - 1:] = sw[:, frame // 2 - 1] + sw[:, frame // 2]
        return pd.DataFrame({
            key: g[key],
            id_col: g[id_col],
            "frame_median_cents_x2": med2,
        })

    return events.groupby(key).map_groups(per_key,
                                          batch_format="pandas")
