"""Similarity search over an embedding column.

Baseline: brute-force cosine top-k — one numpy matmul per batch against
a broadcast query matrix (``ray.put`` once, pinned per actor), partial
top-k per batch, merged at the driver.  Scale path: IVF-style routing —
k-means-ish centroids (deterministic sample), batches only score
queries whose nearest centroid matches the row bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from aida_ray.state.broadcast import resolve


def _as_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    return m / norms[:, None]


class BruteForceTopK:
    """Actor stage: per-batch cosine scores vs broadcast queries, local top-k."""

    def __init__(self, queries_ref, k: int = 10, vec_col: str = "embedding",
                 id_col: str = "vec_id"):
        q = resolve(queries_ref)  # (n_queries, dim) float64
        self.q = _normalize(np.asarray(q, dtype=np.float64))
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch[self.vec_col]))
        ids = np.asarray(batch[self.id_col].to_pylist(), dtype=np.int64)
        sims = vecs @ self.q.T                      # (batch, n_queries)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            top = np.argpartition(-col, k - 1)[:k] if k < len(ids) else np.arange(len(ids))
            for t in top:
                out_q.append(qi)
                out_id.append(int(ids[t]))
                out_sim.append(float(col[t]))
        return pa.table({
            "query": pa.array(out_q, pa.int32()),
            self.id_col: pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_sim, pa.float64()),
        })


def knn_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             concurrency: int = 2) -> pa.Table:
    """Global top-k per query: per-batch partial top-k → tiny driver merge.

    The merge touches concurrency × k rows per query, never the corpus.
    """
    q_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partial = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": q_ref, "k": k,
                               "vec_col": vec_col, "id_col": id_col},
        batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency, num_cpus=1)
    t = partial.to_arrow_refs()
    merged = pa.concat_tables([ray.get(r) for r in t])
    df = merged.to_pandas()
    out = (df.sort_values(["query", "cosine", id_col],
                          ascending=[True, False, True])
             .groupby("query").head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def ivf_topk(ds: ray.data.Dataset, queries: np.ndarray, k: int = 10,
             n_cells: int = 16, n_probe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id",
             seed: int = 42, concurrency: int = 2) -> pa.Table:
    """IVF-bucketed ANN: centroids from a seeded random sample; rows are
    routed to their nearest cell; queries probe the n_probe nearest cells.

    Approximate (recall < 1) but each batch scores only rows in probed
    cells — the 100 TB path.
    """
    # seeded random sample across ALL blocks — ds.limit() would take the
    # first blocks only, biasing centroids under sorted/clustered input
    target = max(1000, n_cells * 20)
    n_rows = ds.count()
    frac = min(1.0, (target * 1.2) / max(1, n_rows))
    sampled = ds.random_sample(frac, seed=seed) if frac < 1.0 else ds
    sample = _normalize(_as_matrix(
        pa.concat_tables([ray.get(r) for r in
                          sampled.limit(target).to_arrow_refs()])[vec_col]))
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=min(n_cells, len(sample)),
                                  replace=False)]
    for _ in range(5):  # few Lloyd iterations on the sample
        assign = (sample @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    cent_ref = ray.put(centroids)
    probe_ref = ray.put(probes)
    q_ref = ray.put(qn)

    class CellTopK:
        def __init__(self):
            self.cent = resolve(cent_ref)
            self.probes = resolve(probe_ref)
            self.q = resolve(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_as_matrix(batch[vec_col]))
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            cells = (vecs @ self.cent.T).argmax(axis=1)
            out_q, out_id, out_sim = [], [], []
            for qi in range(self.q.shape[0]):
                mask = np.isin(cells, self.probes[qi])
                if not mask.any():
                    continue
                sub = vecs[mask]
                sub_ids = ids[mask]
                col = sub @ self.q[qi]
                kk = min(k, len(sub_ids))
                top = np.argpartition(-col, kk - 1)[:kk] if kk < len(sub_ids) \
                    else np.arange(len(sub_ids))
                for t in top:
                    out_q.append(qi)
                    out_id.append(int(sub_ids[t]))
                    out_sim.append(float(col[t]))
            return pa.table({
                "query": pa.array(out_q, pa.int32()),
                id_col: pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            })

    partial = ds.map_batches(CellTopK, batch_format="pyarrow", batch_size=4096,
                             concurrency=concurrency, num_cpus=1)
    merged = pa.concat_tables([ray.get(r) for r in partial.to_arrow_refs()])
    df = merged.to_pandas()
    out = (df.sort_values(["query", "cosine", id_col],
                          ascending=[True, False, True])
             .groupby("query").head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)
