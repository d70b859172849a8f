"""Top-k rows per group — distributed with map-side pruning.

Phase 1 prunes each batch to its own per-group top-k (vectorized
pandas sort + groupby.head — no row loop), so the shuffle ships at
most k rows per (group, input block); phase 2 is the same prune per
group after one hash shuffle.  At 10^12 rows the shuffle volume is
bounded by k × groups × blocks, independent of corpus size.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data


def top_k_per_group(ds: ray.data.Dataset, group_col: str, order_col: str,
                    k: int, tie_col: str | None = None,
                    descending: bool = True) -> ray.data.Dataset:
    """k rows per group by ``order_col`` (desc by default), ties broken
    by ``tie_col`` ascending — fully deterministic when (order, tie) is
    unique per group."""
    by = [order_col] + ([tie_col] if tie_col else [])
    asc = [not descending] + ([True] if tie_col else [])

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(by, ascending=asc, kind="mergesort") \
            .groupby(group_col, sort=False).head(k)

    partial = ds.map_batches(prune, batch_format="pandas")
    return partial.groupby(group_col).map_groups(prune,
                                                 batch_format="pandas")
