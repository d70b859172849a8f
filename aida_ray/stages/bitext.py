"""Margin-based bitext mining (Artetxe & Schwenk 2019, ratio margin).

A large-scale training-data pipeline mines parallel text by embedding
both language sides and pairing each source with the target whose
cosine stands out from both items' k-NN neighborhoods:

    margin(x, y) = cos(x, y) / ((knn_k(x) + knn_k(y)) / 2)

where ``knn_k(v)`` is the mean cosine of v's k nearest neighbors on
the OTHER side.  Pairs are accepted when the best-margin target
exceeds a threshold (classic value ~1.05-1.06).

Ray-Data shape (documented partitioning assumptions):

* the TARGET side is the broadcast index (`ray.put` of an (n_t, d)
  float32 matrix + ids) — the standard mining setup streams the large
  crawl side against the smaller curated side; for two web-scale
  sides, swap the matmul for the persisted IVF index (stages/knn.py),
  the margins are index-agnostic;
* pass A streams source batches: one matmul per batch gives all
  cosines; per-source k-NN means come out of the same matrix, and the
  per-TARGET k-NN statistic is reduced distributively — each batch
  ships only its per-target top-k candidate rows (k rows per target
  per batch, NOT the full n_s × n_t cosine matrix) into a
  groupby(tgt) top-k merge;
* pass B re-streams the source with the tiny per-target mean vector
  broadcast back and emits the best-margin pair per source above the
  threshold.

Everything is deterministic: ties break by ascending target id, both
in the k-NN ordering and the best-pair choice, matching the SQL
oracle's ROW_NUMBER ordering exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _to_matrix(batch: pa.Table, vec_col: str, id_col: str):
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    return ids, vecs / norms[:, None]


def _topk_mean_desc(cos_rows: np.ndarray, tids: np.ndarray, k: int
                    ) -> np.ndarray:
    """Row-wise mean of the k largest cosines, ties broken by
    ascending target id (the oracle's ORDER BY cos DESC, tid)."""
    order = np.lexsort((tids[None, :].repeat(len(cos_rows), 0),
                        -cos_rows), axis=1)
    top = np.take_along_axis(cos_rows, order[:, :k], axis=1)
    return top.mean(axis=1)


def mine_bitext(embeddings: ray.data.Dataset, *, vec_col: str = "embedding",
                id_col: str = "vec_id", k: int = 4,
                threshold: float = 1.05) -> ray.data.Dataset:
    """(src_id, tgt_id, margin) — best ratio-margin pair per source
    above ``threshold``.  Sides split by id parity (even = source
    stream, odd = target index) — callers with real language columns
    pass pre-filtered datasets through the same machinery."""
    import pyarrow.compute as pc

    def _parity(want: int):
        def f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(
                pc.bit_wise_and(b[id_col], 1), want))
        return f

    src = embeddings.map_batches(_parity(0), batch_format="pyarrow")
    tgt_tbl = pa.concat_tables(
        [t for t in ray.get(
            embeddings.map_batches(_parity(1), batch_format="pyarrow")
            .to_arrow_refs()) if t.num_columns])
    t_ids, t_mat = _to_matrix(tgt_tbl, vec_col, id_col)
    t_order = np.argsort(t_ids, kind="stable")
    t_ids, t_mat = t_ids[t_order], t_mat[t_order]
    tgt_ref = ray.put((t_ids, t_mat))

    # ---- pass A: per-target top-k candidates (k rows/target/batch)
    def tgt_candidates(batch: pa.Table) -> pa.Table:
        tids, tmat = ray.get(tgt_ref)
        _sids, smat = _to_matrix(batch, vec_col, id_col)
        cos = smat @ tmat.T                      # (b, n_t)
        kk = min(k, cos.shape[0])
        part = np.argpartition(-cos, kk - 1, axis=0)[:kk]  # per target
        return pa.table({
            "tid": pa.array(np.repeat(tids, kk), pa.int64()),
            "cos": pa.array(
                np.take_along_axis(cos, part, axis=0).T.ravel(),
                pa.float64()),
        })

    def merge_topk(df):
        import pandas as pd
        tid = df["tid"].iloc[0]
        top = df["cos"].nlargest(k)
        return pd.DataFrame({"tid": [tid], "knn_mean": [top.mean()]})

    tgt_knn = src.map_batches(tgt_candidates, batch_format="pyarrow") \
        .groupby("tid").map_groups(merge_topk, batch_format="pandas")
    knn_tbl = pa.concat_tables(
        [t for t in ray.get(tgt_knn.to_arrow_refs()) if t.num_columns])
    knn_map = dict(zip(knn_tbl["tid"].to_pylist(),
                       knn_tbl["knn_mean"].to_pylist()))
    knn_y = np.array([knn_map[int(t)] for t in t_ids], dtype=np.float64)
    knn_ref = ray.put(knn_y)

    # ---- pass B: best margin per source
    def best_pairs(batch: pa.Table) -> pa.Table:
        tids, tmat = ray.get(tgt_ref)
        ky = ray.get(knn_ref)
        sids, smat = _to_matrix(batch, vec_col, id_col)
        cos = smat @ tmat.T
        kx = _topk_mean_desc(cos, tids, k)
        margins = cos / ((kx[:, None] + ky[None, :]) / 2.0)
        # ties: highest margin, then LOWEST tid (tids sorted asc, and
        # argmax returns the first occurrence)
        best = np.argmax(margins, axis=1)
        bm = margins[np.arange(len(sids)), best]
        keep = bm > threshold
        return pa.table({
            "src_id": pa.array(sids[keep], pa.int64()),
            "tgt_id": pa.array(tids[best[keep]], pa.int64()),
            "margin": pa.array(np.round(bm[keep], 4), pa.float64()),
        })

    return src.map_batches(best_pairs, batch_format="pyarrow")
