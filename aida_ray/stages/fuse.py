"""Provenance-weighted triple fusion (noisy-OR).

KG construction emits the same (subj, pred, obj) assertion from many
sources with per-source confidences; the standard fusion rule treats
sources as independent witnesses: ``fused = 1 - prod(1 - conf_i)``
(the noisy-OR of knowledge-fusion literature, e.g. Dong et al.,
"Knowledge Vault", KDD'14 — public method).

Scale shape: per-batch partials collapse each block's duplicate
triples to one (subj, pred, obj, sum_log_q, n, max_conf) row — the
groupby shuffle ships one row per DISTINCT triple per block, never
the assertion stream.  The product rides as a sum of ``ln(1-conf)``
terms (mergeable across any blocking); the finish pass exponentiates
once.  Fused values round to 6 decimals so cross-block summation
order cannot leak into comparisons.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def noisy_or_fuse(triples: ray.data.Dataset, s: str = "subj",
                  p: str = "pred", o: str = "obj",
                  conf: str = "conf") -> ray.data.Dataset:
    """(subj, pred, obj, n_src, max_conf, fused) per distinct triple.

    ``conf`` must be in [0, 1); a 1.0 witness would send ln(1-c) to
    -inf — exp(-inf) = 0 still fuses to exactly 1.0, so it is allowed
    but documented.  ``fused``/``max_conf`` are rounded to 6 decimals.
    """
    from ray.data.aggregate import Max, Sum

    keys = [s, p, o]

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            s: b[s].to_pandas(), p: b[p].to_pandas(),
            o: b[o].to_pandas(),
            "c": b[conf].to_numpy(zero_copy_only=False)
                .astype(np.float64)})
        with np.errstate(divide="ignore"):      # conf == 1.0 -> -inf ok
            df["logq"] = np.log(1.0 - df["c"])
        g = df.groupby(keys, sort=False).agg(
            logq=("logq", "sum"), n=("c", "size"), mx=("c", "max"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = triples.map_batches(partial, batch_format="pyarrow") \
        .groupby(keys).aggregate(Sum("logq"), Sum("n"), Max("mx"))

    def finish(b: pa.Table) -> pa.Table:
        logq = b["sum(logq)"].to_numpy(zero_copy_only=False)
        fused = np.round(1.0 - np.exp(logq), 6)
        return pa.table({
            s: b[s], p: b[p], o: b[o],
            "n_src": pc.cast(b["sum(n)"], pa.int64()),
            "max_conf": pa.array(
                np.round(b["max(mx)"].to_numpy(zero_copy_only=False), 6),
                pa.float64()),
            "fused": pa.array(fused, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def best_assertion(triples: ray.data.Dataset, s: str = "subj",
                   p: str = "pred", o: str = "obj",
                   weight: str = "n_src",
                   group_size_limit: int = 2_000_000
                   ) -> ray.data.Dataset:
    """Support-weighted slot resolution: per (subj, pred) keep the
    object with the highest ``weight`` (ties break to the smallest
    object string) — the publish-time argmax consuming
    sameas_rewrite's merged counts or noisy_or_fuse's fused scores.

    Emits (subj, pred, obj, <weight>).

    Scale shape: one groupby((subj, pred)).map_groups keyed by fact
    identity; per-group work is one vectorized argmax
    (candidate-bounded, guarded by ``group_size_limit``)."""

    def per_slot(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) > group_size_limit:
            raise ValueError(
                f"hot slot {g[s].iloc[0]!r}/{g[p].iloc[0]!r}: "
                f"{len(g)} candidates exceed the per-group bound")
        w = g[weight].to_numpy()
        mx = w.max()
        cand = g[w == mx]
        obj = cand[o].astype(str).min()
        return pd.DataFrame({s: [g[s].iloc[0]], p: [g[p].iloc[0]],
                             o: [obj], weight: [mx]})

    return triples.groupby([s, p]).map_groups(per_slot,
                                              batch_format="pandas")
