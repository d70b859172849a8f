"""Distributed ML primitives over embedding columns — k-means and PCA.

Both follow the mergeable-sufficient-statistics pattern (the only
communication shape that survives 10^12 rows):

- :func:`kmeans` — Lloyd's iterations with centroids BROADCAST
  (``ray.put`` per round) and per-batch partial sums: each batch emits
  (cluster, vec-sum, count) — k×d floats — merged by one tiny
  groupby-free driver reduction.  The fact table streams every round;
  nothing is ever gathered.  Deterministic: k-means++-style seeding from
  a fixed-seed sample (`sketches`-style bottom-k hashing picks the
  sample independently of blocking).
- :func:`pca_fit` — covariance from per-block partials (Σx, Σxxᵀ, n —
  d×d floats per block), eigendecomposition on the driver (d ≪ rows);
  :func:`pca_project` broadcasts the component matrix and projects
  statelessly.

Error/equivalence bounds are tested against dense numpy references in
``tests/test_ml.py``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached


def _compact(ds: ray.data.Dataset,
             rows_per_block: int = 8192) -> ray.data.Dataset:
    """Coalesce tiny blocks before an ITERATED scan: each Lloyd/label
    round pays per-task dispatch per block, so a narrow fact table
    spread over reader-sized blocks turns fixed latency x iters into
    the wall.  Width still scales with data (rows/8k blocks), only the
    tiny-block tail is folded.  Already-materialized inputs skip the
    first materialize but are still defragmented if needed — calling
    this twice is cheap, not a second full copy."""
    from ray.data.dataset import MaterializedDataset
    mat = ds if isinstance(ds, MaterializedDataset) else ds.materialize()
    target = max(1, mat.count() // rows_per_block)
    if mat.num_blocks() > target * 2:
        mat = mat.repartition(target).materialize()
    return mat


def _batch_matrix(b: pa.Table, col: str) -> np.ndarray:
    arr = b[col].combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    return flat.reshape(n, -1).astype(np.float64, copy=False)


def _seed_sample(ds: ray.data.Dataset, col: str, id_col: str,
                 n_sample: int) -> np.ndarray:
    """Blocking-invariant deterministic sample: bottom-``n_sample``
    rows by a stable per-id hash (same trick as
    `sampling.bottomk_sample`)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            pd.Series(b[id_col].to_numpy(zero_copy_only=False)),
            index=False).to_numpy(dtype=np.uint64)
        order = np.argsort(h, kind="stable")[:n_sample]
        return pa.table({
            "h": pa.array(h[order].astype(np.int64)),
            "vec": pa.array(list(_batch_matrix(b, col)[order])),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values("h", kind="stable").head(n_sample)
    if not len(rows):
        raise ValueError("kmeans: empty input dataset")
    return np.stack(rows["vec"].to_numpy())


def kmeans(ds: ray.data.Dataset, col: str, id_col: str, k: int,
           iters: int = 10, sample: int = 1024) -> np.ndarray:
    """Returns the (k, d) centroid matrix after ``iters`` Lloyd
    rounds.  Seeding: greedy farthest-point (k-means++ without
    randomness) over a deterministic bottom-k-hash sample."""
    from ray.data.dataset import MaterializedDataset
    if isinstance(ds, MaterializedDataset) \
            and set(ds.schema().names) == {id_col, col}:
        # pre-materialized caller (semdedup): no projection copy, but
        # still defragment — _compact is cheap on compacted inputs
        ds = _compact(ds)
    else:
        ds = _compact(ds.select_columns([id_col, col]))   # reused per round
    S = _seed_sample(ds, col, id_col, sample)
    cents = [S[0]]
    d2 = np.sum((S - cents[0]) ** 2, axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(d2))
        cents.append(S[nxt])
        d2 = np.minimum(d2, np.sum((S - S[nxt]) ** 2, axis=1))
    centroids = np.stack(cents)

    for _ in range(iters):
        cref = ray.put(centroids)

        def partial(b: pa.Table) -> pa.Table:
            c = _get_cached(cref)
            x = _batch_matrix(b, col)
            # ||x-c||² = ||x||² - 2 x·cᵀ + ||c||²; argmin over c
            assign = np.argmin(
                -2 * x @ c.T + np.sum(c * c, axis=1), axis=1)
            kk, dd = c.shape
            # emit only clusters OBSERVED in this block — partial size
            # is min(k, block rows), so web-scale k (SemDeDup uses
            # 100k clusters) doesn't ship k x d floats per block
            seen = np.unique(assign)
            idx = np.searchsorted(seen, assign)
            sums = np.zeros((len(seen), dd))
            np.add.at(sums, idx, x)
            counts = np.bincount(idx, minlength=len(seen)) \
                .astype(np.float64)
            return pa.table({
                "cluster": pa.array(seen.astype(np.int64)),
                "vec_sum": pa.array(list(sums)),
                "n": pa.array(counts),
            })

        parts = ds.map_batches(partial,
                               batch_format="pyarrow").to_pandas()
        sums = np.zeros_like(centroids)
        counts = np.zeros(len(centroids))
        if len(parts):
            cl = parts["cluster"].to_numpy()
            np.add.at(sums, cl, np.stack(parts["vec_sum"].to_numpy()))
            np.add.at(counts, cl, parts["n"].to_numpy())
        nz = counts > 0
        centroids = centroids.copy()
        centroids[nz] = sums[nz] / counts[nz, None]
    return centroids


def assign_clusters(ds: ray.data.Dataset, col: str, id_col: str,
                    centroids: np.ndarray) -> ray.data.Dataset:
    """(id, cluster) for every row — stateless broadcast assignment."""
    cref = ray.put(centroids)

    def assign(b: pa.Table) -> pa.Table:
        c = _get_cached(cref)
        x = _batch_matrix(b, col)
        a = np.argmin(-2 * x @ c.T + np.sum(c * c, axis=1), axis=1)
        return pa.table({id_col: b[id_col],
                         "cluster": pa.array(a, pa.int64())})

    return ds.map_batches(assign, batch_format="pyarrow")


def pca_fit(ds: ray.data.Dataset, col: str,
            n_components: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact PCA from one distributed pass of (n, Σx, Σxxᵀ) partials.
    Returns (mean, components) with components rows = top eigenvectors
    (sign-normalized: largest-|coord| entry positive)."""
    def partial(b: pa.Table) -> pa.Table:
        x = _batch_matrix(b, col)
        return pa.table({
            "n": pa.array([float(len(x))]),
            "sx": pa.array([x.sum(axis=0)]),
            "sxx": pa.array([(x.T @ x).ravel()]),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = parts["n"].sum()
    sx = np.sum(np.stack(parts["sx"].to_numpy()), axis=0)
    d = len(sx)
    sxx = np.sum(np.stack(parts["sxx"].to_numpy()), axis=0).reshape(d, d)
    mean = sx / n
    cov = sxx / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    comps = v[:, ::-1][:, :n_components].T
    # deterministic sign: largest-|coordinate| positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps


def pca_project(ds: ray.data.Dataset, col: str, id_col: str,
                mean: np.ndarray, comps: np.ndarray) -> ray.data.Dataset:
    """Stateless projection onto the fitted components."""
    pref = ray.put((mean, comps))

    def project(b: pa.Table) -> pa.Table:
        m, c = _get_cached(pref)
        x = _batch_matrix(b, col) - m
        z = x @ c.T
        return pa.table({id_col: b[id_col],
                         "proj": pa.array(list(z))})

    return ds.map_batches(project, batch_format="pyarrow")


def label_centroids(ds: ray.data.Dataset, col: str = "embedding",
                    label_col: str = "label") -> ray.data.Dataset:
    """Per-label embedding centroid (elementwise mean) in long form —
    the list-column aggregation shape (class prototypes / bootstrap
    centroids for IVF routing).

    Exactness: elements are scaled to int64 micro-units BEFORE
    summing (float sums depend on block reduction order; integer sums
    do not), and the centroid is one double division of the final
    sums — so a SQL oracle over unnested elements hash-matches at any
    parallelism.  Partial volume is labels × dim × blocks."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        mat = _batch_matrix(b, col).astype(np.float64)
        m6 = np.round(mat * 1e6)
        # round half away from zero, matching DuckDB ROUND
        frac_half = np.abs(mat * 1e6) % 1 == 0.5
        if frac_half.any():
            m6 = np.where(frac_half,
                          np.trunc(mat * 1e6)
                          + np.sign(mat * 1e6), m6)
        m6 = m6.astype("int64")
        labels = b[label_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"label": labels})
        g = df.groupby("label", sort=False)
        dim = mat.shape[1]
        rows_l, rows_p, rows_s, rows_n = [], [], [], []
        for lv, idx in g.groups.items():
            sums = m6[np.asarray(idx)].sum(axis=0)
            rows_l.extend([lv] * dim)
            rows_p.extend(range(1, dim + 1))
            rows_s.extend(sums.tolist())
            rows_n.extend([len(idx)] * dim)
        return pa.table({
            label_col: pa.array(rows_l, pa.int64()),
            "pos": pa.array(rows_p, pa.int64()),
            "sum_1e6": pa.array(rows_s, pa.int64()),
            "n_vecs": pa.array(rows_n, pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([label_col, "pos"]).aggregate(Sum("sum_1e6"),
                                               Sum("n_vecs"))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = pc.cast(b["sum(sum_1e6)"], pa.int64())
        n = pc.cast(b["sum(n_vecs)"], pa.int64())
        return pa.table({
            label_col: pc.cast(b[label_col], pa.int64()),
            "pos": pc.cast(b["pos"], pa.int64()),
            "sum_1e6": s, "n_vecs": n,
            "centroid": pc.divide(pc.cast(s, pa.float64()),
                                  pc.cast(n, pa.float64()))})

    return agg.map_batches(finish, batch_format="pyarrow")
