"""Entity-resolution blocking + Fellegi-Sunter pair scoring.

Two public record-linkage primitives (Fellegi & Sunter 1969;
sorted-neighborhood blocking from Hernandez & Stolfo 1995):

- :func:`sorted_neighborhood` — candidate generation: sort records by
  a blocking key and pair every record with its ``window`` successors
  in the global sort order.  Linear candidate volume (n * window)
  instead of the quadratic all-pairs join.
- :func:`linkage_scores` — agreement scoring: per candidate pair,
  sum a fixed per-field weight (agree / disagree) over exact field
  equality and bucket the total into match / possible / nonmatch.
  Weights are caller-supplied constants (log-likelihood ratios in
  the classic model) — pass exact binary fractions (multiples of
  0.25) when bit-stable scores matter.

Scale shape:

- sorted_neighborhood: total sort-order ranks are assigned WITHOUT a
  global sort — a distributed histogram of the blocking KEY
  (vocabulary-bounded, broadcast once) gives each key its base
  offset, and one key-partitioned groupby assigns base + local
  position (ties ordered by id).  The pairing pass is a second,
  bucket-keyed groupby; cross-bucket windows are handled by
  REPLICATION, not another shuffle: each row goes to bucket
  rank // W, rows within ``window`` of a bucket's left edge also go
  to the previous bucket, and a pair is emitted only by the bucket
  that OWNS its left member — every pair exactly once, no dedup
  pass.  W >> window keeps replication at window/W, a few percent.
- linkage_scores: stateless vectorized map over the pair stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def sorted_neighborhood(ds: ray.data.Dataset, key_col: str,
                        id_col: str = "id",
                        window: int = 3) -> ray.data.Dataset:
    """(id_a, id_b) candidate pairs within ``window`` positions of the
    (key, id) sort order; id_a is the sort-order predecessor."""
    from aida_ray.stages.dedup import _get_cached
    from aida_ray.stages.sketches import value_histogram

    hist = value_histogram(ds.select_columns([key_col]),
                           key_col).to_pandas().sort_values(key_col)
    values = hist[key_col].to_numpy()
    counts = hist["n"].to_numpy(dtype="int64")
    smaller = np.concatenate([[0], np.cumsum(counts)[:-1]])
    base_ref = ray.put((values, smaller))

    W = max(window * 64, 1024)

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        vals, small = _get_cached(base_ref)
        df = df.sort_values(id_col).reset_index(drop=True)
        base = int(small[np.searchsorted(vals, df[key_col].iloc[0])])
        df["rn"] = base + np.arange(len(df), dtype=np.int64)
        return df

    ranked = ds.select_columns([key_col, id_col]) \
        .groupby(key_col).map_groups(per_key, batch_format="pandas")

    def bucket(b: pa.Table) -> pa.Table:
        rn = b["rn"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        bk = rn // W
        dup = (rn % W) < window
        out_bk = np.concatenate([bk, bk[dup] - 1])
        out_rn = np.concatenate([rn, rn[dup]])
        out_id = np.concatenate([ids, ids[dup]])
        keep = out_bk >= 0
        return pa.table({
            "bk": pa.array(out_bk[keep], pa.int64()),
            "rn": pa.array(out_rn[keep], pa.int64()),
            id_col: pa.array(out_id[keep])})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("rn").reset_index(drop=True)
        bk = int(df["bk"].iloc[0])
        rn = df["rn"].to_numpy()
        ids = df[id_col].to_numpy()
        a_idx, b_idx = [], []
        for i in range(len(df)):
            if rn[i] // W != bk:        # replicated row: not owned
                continue
            for j in range(i + 1, len(df)):
                if rn[j] - rn[i] > window:
                    break
                a_idx.append(i)
                b_idx.append(j)
        return pd.DataFrame({"id_a": ids[a_idx], "id_b": ids[b_idx]})

    return ranked.map_batches(bucket, batch_format="pyarrow") \
        .groupby("bk").map_groups(pairs, batch_format="pandas")


def linkage_scores(pairs: ray.data.Dataset,
                   field_weights: dict[str, tuple[float, float]],
                   upper: float, lower: float,
                   a_suffix: str = "_a",
                   b_suffix: str = "_b") -> ray.data.Dataset:
    """Append (score, decision) to candidate-pair rows carrying
    ``<field>_a`` / ``<field>_b`` columns.  score = sum over fields of
    w_agree / w_disagree by exact equality (summed in the dict's field
    order); decision = match (score >= upper) / possible (>= lower) /
    nonmatch."""

    def batch(b: pa.Table) -> pa.Table:
        n = b.num_rows
        score = np.zeros(n, dtype=np.float64)
        for f, (wa, wd) in field_weights.items():
            av = b[f + a_suffix].to_pandas().to_numpy()
            bv = b[f + b_suffix].to_pandas().to_numpy()
            score = score + np.where(av == bv, wa, wd)
        decision = np.where(score >= upper, "match",
                            np.where(score >= lower, "possible",
                                     "nonmatch"))
        return b.append_column(
            "score", pa.array(score, pa.float64())).append_column(
            "decision", pa.array(decision.tolist(), pa.string()))

    return pairs.map_batches(batch, batch_format="pyarrow")
