"""Tests for distributed logistic regression vs a dense numpy
reference (identical GD trajectory)."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _data(seed=41, n=800, d=6):
    rng = np.random.default_rng(seed)
    w_true = rng.normal(0, 2, d)
    x = rng.normal(0, 1, (n, d))
    p = 1 / (1 + np.exp(-(x @ w_true + 0.3)))
    y = (rng.uniform(0, 1, n) < p).astype("int64")
    return x, y, w_true


def _ref_gd(x, y, iters, lr, l2):
    w = np.zeros(x.shape[1]); b = 0.0; n = len(x)
    for _ in range(iters):
        p = 1 / (1 + np.exp(-(x @ w + b)))
        err = p - y
        w = w - lr * (x.T @ err / n + l2 * w)
        b = b - lr * err.sum() / n
    return w, b


def test_logreg_matches_reference_and_blocking(ray_session):
    from aida_ray.stages.classifier import logreg_score, logreg_train
    x, y, w_true = _data()
    tbl = pa.table({"vec_id": np.arange(len(x)),
                    "feats": list(x.astype(np.float32).astype(np.float64)),
                    "label": y})
    ds5 = rd.from_arrow(tbl).repartition(5)
    w, b = logreg_train(ds5, "feats", "label", iters=30, lr=0.5, l2=1e-4)
    wr, br = _ref_gd(x.astype(np.float32).astype(np.float64), y,
                     30, 0.5, 1e-4)
    assert np.allclose(w, wr, atol=1e-8) and abs(b - br) < 1e-8
    # blocking invariance
    w2, b2 = logreg_train(rd.from_arrow(tbl).repartition(11),
                          "feats", "label", iters=30, lr=0.5, l2=1e-4)
    assert np.allclose(w, w2, atol=1e-8) and abs(b - b2) < 1e-8
    # learned direction correlates with the generator
    cos = w @ w_true / (np.linalg.norm(w) * np.linalg.norm(w_true))
    assert cos > 0.95
    # scoring separates classes
    s = logreg_score(ds5, "feats", "vec_id", w, b).to_pandas() \
        .sort_values("vec_id").score.to_numpy()
    assert s[y == 1].mean() > s[y == 0].mean() + 0.2
