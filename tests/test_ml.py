"""Tests for distributed k-means and PCA vs dense numpy references."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _blobs(seed=31, n=600, d=8, k=3, spread=0.15):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (k, d)) * 4
    x = np.concatenate([
        centers[i] + rng.normal(0, spread, (n // k, d))
        for i in range(k)])
    ids = np.arange(len(x))
    return x, ids, centers


def _ds(x, ids, parts=6):
    return rd.from_arrow(pa.table({
        "vec_id": ids, "embedding": list(x.astype(np.float32))})) \
        .repartition(parts)


def test_kmeans_recovers_blobs_and_blocking_invariant(ray_session):
    from aida_ray.stages.ml import assign_clusters, kmeans
    x, ids, centers = _blobs()
    c1 = kmeans(_ds(x, ids, 6), "embedding", "vec_id", k=3, iters=8)
    c2 = kmeans(_ds(x, ids, 11), "embedding", "vec_id", k=3, iters=8)
    # blocking must not change the result (deterministic seeding +
    # order-free partial sums up to float assoc — tolerance)
    assert np.allclose(np.sort(c1, axis=0), np.sort(c2, axis=0),
                       atol=1e-8)
    # each true center has a centroid within the blob spread
    for t in centers:
        assert np.min(np.linalg.norm(c1 - t, axis=1)) < 0.1
    # assignments put same-blob points together
    a = assign_clusters(_ds(x, ids), "embedding", "vec_id", c1) \
        .to_pandas().sort_values("vec_id").cluster.to_numpy()
    for i in range(3):
        blob = a[i * 200:(i + 1) * 200]
        assert len(np.unique(blob)) == 1


def test_pca_matches_numpy(ray_session):
    from aida_ray.stages.ml import pca_fit, pca_project
    rng = np.random.default_rng(12)
    # anisotropic cloud: variance concentrated in 2 directions
    basis = rng.normal(0, 1, (4, 16))
    x = rng.normal(0, 1, (500, 4)) @ (basis * [[8], [4], [0.5], [0.1]])
    x = x.astype(np.float32).astype(np.float64)
    ids = np.arange(len(x))
    mean, comps = pca_fit(_ds(x, ids), "embedding", 2)
    xc = x - x.mean(axis=0)
    cov = xc.T @ xc / len(x)
    w, v = np.linalg.eigh(cov)
    ref = v[:, ::-1][:, :2].T
    assert np.allclose(mean, x.mean(axis=0), atol=1e-6)
    for i in range(2):   # same subspace up to sign
        assert abs(abs(ref[i] @ comps[i]) - 1) < 1e-6
    # projection variance = top eigenvalues
    z = pca_project(_ds(x, ids), "embedding", "vec_id", mean, comps) \
        .to_pandas()
    zz = np.stack(z.sort_values("vec_id").proj.to_numpy())
    assert np.allclose(zz.var(axis=0), w[::-1][:2], rtol=1e-6)
