"""Distributed training of a linear quality classifier.

The CCNet/Gopher-style pipeline step: train a small classifier on
per-document features (quality signals, embeddings) and score the whole
corpus with it.  Shape:

- :func:`logreg_train` — full-batch gradient descent with the weight
  vector BROADCAST each step and per-batch gradient PARTIALS (d+1
  floats per block) summed back — the same mergeable-statistics
  pattern as `ml.kmeans`; nothing corpus-sized ever concentrates.
  Deterministic: fixed init, fixed step count, order-free partial sums
  (float-assoc tolerance only).
- :func:`logreg_score` — stateless broadcast scoring
  (sigmoid(w·x + b) per row).

For 10^12 rows one full-batch pass per step is the *correct* plan: a
linear model on ≤100 features converges in tens of passes, and each
pass is embarrassingly parallel; SGD's sequential dependence is the
thing that does NOT distribute.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached
from aida_ray.stages.ml import _batch_matrix


def logreg_train(ds: ray.data.Dataset, feat_col: str, label_col: str,
                 iters: int = 50, lr: float = 0.5,
                 l2: float = 1e-4) -> tuple[np.ndarray, float]:
    """Returns (weights, bias) after ``iters`` full-batch GD steps with
    per-step gradient normalization by n (so lr is scale-free)."""
    # pin the (pruned) input once — each GD step re-streams these
    # blocks instead of re-executing the read pipeline per pass
    ds = ds.select_columns([feat_col, label_col]).materialize()
    first = ds.take_batch(1, batch_format="pyarrow")
    d = len(first[feat_col][0])
    w = np.zeros(d)
    b = 0.0
    n_total = ds.count()

    for _ in range(iters):
        wref = ray.put((w, b))

        def grad(batch: pa.Table) -> pa.Table:
            ww, bb = _get_cached(wref)
            x = _batch_matrix(batch, feat_col)
            y = batch[label_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            p = 1.0 / (1.0 + np.exp(-(x @ ww + bb)))
            err = p - y
            return pa.table({
                "gw": pa.array([x.T @ err]),
                "gb": pa.array([float(err.sum())]),
                "loss": pa.array([float(
                    -(y * np.log(np.clip(p, 1e-12, 1)) +
                      (1 - y) * np.log(np.clip(1 - p, 1e-12, 1))).sum())]),
            })

        parts = ds.map_batches(grad, batch_format="pyarrow").to_pandas()
        gw = np.sum(np.stack(parts["gw"].to_numpy()), axis=0) / n_total
        gb = parts["gb"].sum() / n_total
        w = w - lr * (gw + l2 * w)
        b = b - lr * gb
    return w, b


def logreg_score(ds: ray.data.Dataset, feat_col: str, id_col: str,
                 w: np.ndarray, b: float) -> ray.data.Dataset:
    """(id, score) for every row — stateless broadcast scoring."""
    wref = ray.put((w, b))

    def score(batch: pa.Table) -> pa.Table:
        ww, bb = _get_cached(wref)
        x = _batch_matrix(batch, feat_col)
        p = 1.0 / (1.0 + np.exp(-(x @ ww + bb)))
        return pa.table({id_col: batch[id_col],
                         "score": pa.array(p, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")
