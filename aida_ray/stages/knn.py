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
from aida_ray.state.collect import collect_table


def _topk_schema(id_col: str, score: str,
                 qtype=pa.int32()) -> pa.Schema:
    return pa.schema([("query", qtype), (id_col, pa.int64()),
                      (score, pa.float64())])


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix; zero-copy reshape of
    the flat value buffer when the layout allows (fixed-size lists or
    equal-width lists with no nulls), ``to_pylist`` fallback otherwise."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        if pa.types.is_fixed_size_list(col.type):
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), col.type.list_size) \
                .astype(np.float64, copy=False)
        if (pa.types.is_list(col.type) or pa.types.is_large_list(col.type)) \
                and col.null_count == 0 and len(col):
            widths = np.diff(col.offsets.to_numpy(zero_copy_only=False))
            if (widths == widths[0]).all() and widths[0] > 0:
                flat = col.flatten().to_numpy(zero_copy_only=False)
                return flat.reshape(len(col), int(widths[0])) \
                    .astype(np.float64, copy=False)
    except (pa.ArrowInvalid, ValueError):
        pass
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
    merged = collect_table(partial, schema=_topk_schema(id_col, "cosine"))
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
        collect_table(sampled.limit(target))[vec_col]))
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
    merged = collect_table(partial, schema=_topk_schema(id_col, "cosine"))
    df = merged.to_pandas()
    out = (df.sort_values(["query", "cosine", id_col],
                          ascending=[True, False, True])
             .groupby("query").head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------------ product quantization

def pq_train(ds: ray.data.Dataset, m: int, ks,
             vec_col: str = "embedding", id_col: str = "vec_id",
             iters: int = 4) -> list[np.ndarray]:
    """Product-quantization codebooks (Jégou et al. 2011): the vector
    splits into ``m`` contiguous subspaces, each quantized by its own
    k-means codebook — compressed-domain ANN's standard memory path
    (d floats → m small codes per vector).

    All ``m`` codebooks train in ONE distributed Lloyd loop: each block
    emits sparse (subspace, code, vec_sum, n) partials for every
    subspace at once (volume ≤ Σk_s × dsub per block), so the corpus
    streams ``iters`` times total, not ``m × iters``.  Deterministic
    farthest-point seeding per subspace over the blocking-invariant
    bottom-k-hash sample (same scheme as `ml.kmeans`)."""
    from aida_ray.stages.dedup import _get_cached
    from aida_ray.stages.ml import _batch_matrix, _compact, _seed_sample

    ds = _compact(ds.select_columns([id_col, vec_col]))
    S = _seed_sample(ds, vec_col, id_col, 1024)
    d = S.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    if isinstance(ks, int):
        ks = [ks] * m

    books = []
    for s in range(m):
        sub = S[:, s * dsub:(s + 1) * dsub]
        cents = [sub[0]]
        d2 = ((sub - cents[0]) ** 2).sum(axis=1)
        for _ in range(1, ks[s]):
            nxt = int(d2.argmax())
            cents.append(sub[nxt])
            d2 = np.minimum(d2, ((sub - sub[nxt]) ** 2).sum(axis=1))
        books.append(np.stack(cents))

    for _ in range(iters):
        bref = ray.put(books)

        def partial(b: pa.Table) -> pa.Table:
            bs = _get_cached(bref)
            x = _batch_matrix(b, vec_col)
            o_sub, o_code, o_sum, o_n = [], [], [], []
            for s, cb in enumerate(bs):
                xs = x[:, s * dsub:(s + 1) * dsub]
                a = np.argmin(-2 * xs @ cb.T + (cb * cb).sum(axis=1),
                              axis=1)
                seen = np.unique(a)
                idx = np.searchsorted(seen, a)
                sums = np.zeros((len(seen), dsub))
                np.add.at(sums, idx, xs)
                cnt = np.bincount(idx, minlength=len(seen))
                o_sub.extend([s] * len(seen))
                o_code.extend(seen.tolist())
                o_sum.extend(list(sums))
                o_n.extend(cnt.astype(np.float64).tolist())
            return pa.table({
                "sub": pa.array(o_sub, pa.int64()),
                "code": pa.array(o_code, pa.int64()),
                "vec_sum": pa.array(o_sum),
                "n": pa.array(o_n, pa.float64())})

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = [np.zeros_like(b) for b in books]
        counts = [np.zeros(len(b)) for b in books]
        for _, r in parts.iterrows():
            sums[int(r["sub"])][int(r["code"])] += np.asarray(r["vec_sum"])
            counts[int(r["sub"])][int(r["code"])] += r["n"]
        books = [b.copy() for b in books]
        for s in range(m):
            nz = counts[s] > 0
            books[s][nz] = sums[s][nz] / counts[s][nz, None]
    return books


def pq_encode(ds: ray.data.Dataset, books: list[np.ndarray],
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> ray.data.Dataset:
    """(id, codes) — stateless broadcast encoding; codes is the m-long
    per-subspace nearest-codeword index list."""
    from aida_ray.stages.dedup import _get_cached
    from aida_ray.stages.ml import _batch_matrix
    bref = ray.put(books)
    dsub = books[0].shape[1]

    def enc(b: pa.Table) -> pa.Table:
        bs = _get_cached(bref)
        x = _batch_matrix(b, vec_col)
        codes = np.stack([
            np.argmin(-2 * x[:, s * dsub:(s + 1) * dsub] @ cb.T
                      + (cb * cb).sum(axis=1), axis=1)
            for s, cb in enumerate(bs)], axis=1).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "codes": pa.array(list(codes))})

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(codes_ds: ray.data.Dataset, books: list[np.ndarray],
            queries: np.ndarray, k: int = 1,
            id_col: str = "vec_id") -> pa.Table:
    """Asymmetric-distance (ADC) top-k over the ENCODED corpus: each
    query precomputes one (m, k_s) subspace distance table, every
    batch scores its rows with m table lookups + a sum — no original
    vectors are ever read at query time.  Per-block partial top-k →
    tiny driver merge (concurrency × k rows per query); exactly-equal
    distances (identical codes) tie-break by min id at both levels."""
    from aida_ray.stages.dedup import _get_cached
    dsub = books[0].shape[1]
    qref = ray.put((books, np.asarray(queries, dtype=np.float64)))

    def score(b: pa.Table) -> pa.Table:
        bs, Q = _get_cached(qref)
        codes = np.array(b["codes"].to_pylist(), dtype=np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        o_q, o_id, o_d = [], [], []
        for qi in range(len(Q)):
            dist = np.zeros(n)
            for s, cb in enumerate(bs):
                tab = ((cb - Q[qi, s * dsub:(s + 1) * dsub]) ** 2) \
                    .sum(axis=1)
                dist += tab[codes[:, s]]
            kk = min(k, n)
            top = np.lexsort((ids, dist))[:kk]
            o_q.extend([qi] * kk)
            o_id.extend(ids[top].tolist())
            o_d.extend(dist[top].tolist())
        return pa.table({"query": pa.array(o_q, pa.int64()),
                         id_col: pa.array(o_id, pa.int64()),
                         "adc_dist": pa.array(o_d, pa.float64())})

    parts = codes_ds.map_batches(score, batch_format="pyarrow")
    merged = collect_table(
        parts, schema=_topk_schema(id_col, "adc_dist", pa.int64())).to_pandas()
    out = (merged.sort_values(["query", "adc_dist", id_col],
                              ascending=[True, True, True])
           .groupby("query").head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------------------------------------------- IVF-PQ

def ivfpq_build(ds: ray.data.Dataset, n_cells: int, m: int, ks,
                vec_col: str = "embedding", id_col: str = "vec_id",
                iters: int = 4):
    """IVF-PQ index build (the FAISS-style composition): a coarse
    k-means partitions the corpus into ``n_cells`` inverted lists and
    every vector additionally stores its product-quantization codes —
    queries then score ONLY the probed cells, in the compressed
    domain.  This is the no-residual variant (codes quantize the raw
    vector, not x − centroid): exact-duplicate vectors provably share
    both cell and codes, which the `ivfpq_top1` oracle exploits.

    Returns (coarse_centroids, codebooks, encoded) where encoded is
    the (id, cell, codes) Dataset — the only per-row state the index
    keeps; original vectors never travel at query time."""
    from aida_ray.stages.dedup import _get_cached
    from aida_ray.stages.ml import _batch_matrix, _compact, kmeans

    ds = _compact(ds.select_columns([id_col, vec_col]))
    cents = kmeans(ds, vec_col, id_col, k=n_cells, iters=iters)
    books = pq_train(ds, m, ks, vec_col=vec_col, id_col=id_col,
                     iters=iters)
    dsub = books[0].shape[1]
    ref = ray.put((cents, books))

    def enc(b: pa.Table) -> pa.Table:
        c, bs = _get_cached(ref)
        x = _batch_matrix(b, vec_col)
        cell = np.argmin(-2 * x @ c.T + np.sum(c * c, axis=1), axis=1)
        codes = np.stack([
            np.argmin(-2 * x[:, s * dsub:(s + 1) * dsub] @ cb.T
                      + (cb * cb).sum(axis=1), axis=1)
            for s, cb in enumerate(bs)], axis=1).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "cell": pa.array(cell, pa.int64()),
                         "codes": pa.array(list(codes))})

    return cents, books, ds.map_batches(enc, batch_format="pyarrow")


def ivfpq_topk(encoded: ray.data.Dataset, cents: np.ndarray,
               books: list[np.ndarray], queries: np.ndarray,
               k: int = 1, n_probe: int = 1,
               id_col: str = "vec_id") -> pa.Table:
    """ADC top-k over the probed cells only: each query routes to its
    ``n_probe`` nearest coarse cells and scores just those rows with
    the PQ table lookups — per batch the untouched cells cost one
    vectorized membership mask.  Same partial-top-k / min-id
    tie-break merge as :func:`pq_topk`."""
    from aida_ray.stages.dedup import _get_cached
    dsub = books[0].shape[1]
    Q = np.asarray(queries, dtype=np.float64)
    d2 = -2 * Q @ cents.T + np.sum(cents * cents, axis=1)
    probe = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
    qref = ray.put((books, Q, probe))

    def score(b: pa.Table) -> pa.Table:
        bs, Qv, pr = _get_cached(qref)
        codes = np.array(b["codes"].to_pylist(), dtype=np.int64)
        cell = b["cell"].to_numpy(zero_copy_only=False)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        o_q, o_id, o_d = [], [], []
        for qi in range(len(Qv)):
            sel = np.isin(cell, pr[qi])
            if not sel.any():
                continue
            cs, sid = codes[sel], ids[sel]
            dist = np.zeros(len(sid))
            for s, cb in enumerate(bs):
                tab = ((cb - Qv[qi, s * dsub:(s + 1) * dsub]) ** 2) \
                    .sum(axis=1)
                dist += tab[cs[:, s]]
            kk = min(k, len(sid))
            top = np.lexsort((sid, dist))[:kk]
            o_q.extend([qi] * kk)
            o_id.extend(sid[top].tolist())
            o_d.extend(dist[top].tolist())
        return pa.table({"query": pa.array(o_q, pa.int64()),
                         id_col: pa.array(o_id, pa.int64()),
                         "adc_dist": pa.array(o_d, pa.float64())})

    parts = encoded.map_batches(score, batch_format="pyarrow")
    merged = collect_table(
        parts, schema=_topk_schema(id_col, "adc_dist", pa.int64())).to_pandas()
    out = (merged.sort_values(["query", "adc_dist", id_col],
                              ascending=[True, True, True])
           .groupby("query").head(k).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)
