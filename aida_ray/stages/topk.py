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


def bottom_k_sample_per_group(ds: ray.data.Dataset, group_col: str,
                              id_col: str, k: int,
                              seed: int = 1) -> ray.data.Dataset:
    """Deterministic k-row uniform sample per group via BOTTOM-K hashing
    (a.k.a. min-wise sampling): keep the k rows with the smallest
    ``h(id)`` per group, h = the same Knuth multiplicative hash used by
    ``stages/sampling.py`` over ``id + seed``.

    Distribution-equivalent to a seeded reservoir sample, but with no
    sequential state, so it composes with map-side pruning exactly like
    :func:`top_k_per_group` (shuffle volume ≤ k × groups × blocks, not
    corpus size) and is reproducible from SQL:
    ``((id + seed) * 2654435761) % 2147483648``.  Output carries a
    ``sample_rank`` column (0-based ascending hash order) so downstream
    code can take prefixes for nested samples.
    """
    from aida_ray.stages.sampling import id_hash

    def add_hash(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        shifted = pc.add(pc.cast(b[id_col], pa.int64()), seed)
        return b.append_column("_h", id_hash(shifted))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["_h", id_col], kind="mergesort") \
            .groupby(group_col, sort=False).head(k)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_h", id_col], kind="mergesort").head(k).copy()
        df["sample_rank"] = range(len(df))
        return df.drop(columns=["_h"])

    partial = hashed.map_batches(prune, batch_format="pandas")
    return partial.groupby(group_col).map_groups(finish,
                                                 batch_format="pandas")
