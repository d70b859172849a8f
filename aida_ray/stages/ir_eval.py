"""IR evaluation metrics over retrieval runs — nDCG@k, MRR@k, AP@k.

The retrieval family (stages/retrieval.py: BM25 scan + persisted
inverted index) needs its evaluation counterpart: given a RUN table
(query_id, rank, doc_id, score) and a relevance-judgment set
``qrels`` (query_id, doc_id, rel — graded), compute per-query

* nDCG@k  — DCG with the standard (2^rel - 1) / log2(rank + 1) gain,
  normalized by the ideal DCG over the query's judged documents;
* MRR@k   — reciprocal rank of the first rel>0 hit (0 if none);
* AP@k    — mean of precision@i over the rel>0 hits within k,
  divided by R = the query's TOTAL number of rel>0 judgments
  (the trec_eval convention — misses below k still count in R).

Scale shape: the run is bounded (|Q| x k rows — queries are always a
small side) and rides a ``ray.put`` broadcast; the QRELS side scales
with the corpus and is scanned ONCE by map_batches, emitting only
(a) rel values for (query, doc) pairs present in the run — at most
|run| rows total, (b) per-block top-k rel partials for the ideal DCG
— at most |Q| x k rows per block, and (c) per-query rel>0 partial
counts.  The driver merges |Q|-bounded partials; nothing
corpus-sized leaves the workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.state.collect import collect_table


def ir_metrics(run: pa.Table, qrels: ray.data.Dataset, k: int = 10,
               query_col: str = "query_id", doc_col: str = "doc_id",
               rel_col: str = "rel") -> pa.Table:
    """(query_id, n_rel, ndcg_1e6, mrr_1e6, ap_1e6) per query in the
    run (integer-quantized to 6 decimals for exact comparison)."""
    run_df = run.to_pandas()
    run_pairs = set(zip(run_df[query_col].astype(int),
                        run_df[doc_col].astype(int)))
    qids = sorted(run_df[query_col].astype(int).unique())
    rref = ray.put((run_pairs, set(qids), k))

    def partial(b: pa.Table) -> pa.Table:
        pairs, qs, kk = ray.get(rref)
        df = pd.DataFrame({
            "q": b[query_col].to_numpy(zero_copy_only=False).astype(int),
            "d": b[doc_col].to_numpy(zero_copy_only=False).astype(int),
            "r": b[rel_col].to_numpy(zero_copy_only=False).astype(int)})
        df = df[df.q.isin(qs)]
        # (a) judged rel for run pairs
        hit = df[[(q, d) in pairs for q, d in zip(df.q, df.d)]]
        # (b) per-query top-k rels (ideal-DCG partial) + (c) rel counts
        pos = df[df.r > 0]
        top = pos.sort_values(["q", "r"], ascending=[True, False]) \
            .groupby("q", sort=False).head(kk)
        cnt = pos.groupby("q", sort=False).size().reset_index(name="n")
        return pa.table({
            "kind": pa.array(["hit"] * len(hit) + ["top"] * len(top)
                             + ["cnt"] * len(cnt), pa.string()),
            "q": pa.array(np.concatenate([hit.q, top.q, cnt.q])
                          .astype(np.int64)),
            "d": pa.array(np.concatenate(
                [hit.d, top.d, np.zeros(len(cnt))]).astype(np.int64)),
            "v": pa.array(np.concatenate(
                [hit.r, top.r, cnt.n]).astype(np.int64)),
        })

    parts = collect_table(
        qrels.map_batches(partial, batch_format="pyarrow"),
        pa.schema([("kind", pa.string()), ("q", pa.int64()),
                   ("d", pa.int64()), ("v", pa.int64())])).to_pandas()

    hits = parts[parts.kind == "hit"]
    rel_of = dict(zip(zip(hits.q, hits.d), hits.v))
    tops = parts[parts.kind == "top"]
    n_rel = parts[parts.kind == "cnt"].groupby("q")["v"].sum()

    rows = {"query_id": [], "n_rel": [], "ndcg_1e6": [], "mrr_1e6": [],
            "ap_1e6": []}
    disc = 1.0 / np.log2(np.arange(1, k + 1) + 1)
    for q in qids:
        sub = run_df[run_df[query_col] == q].sort_values("rank").head(k)
        rels = np.array([rel_of.get((q, int(d)), 0)
                         for d in sub[doc_col]], dtype=np.int64)
        gains = (2.0 ** rels - 1.0) * disc[:len(rels)]
        # ideal: merge the per-block top-k partials for this query
        ideal = np.sort(tops[tops.q == q].v.to_numpy())[::-1][:k] \
            .astype(np.float64)
        idcg = float((((2.0 ** ideal) - 1.0)
                      * disc[:len(ideal)]).sum())
        ndcg = float(gains.sum()) / idcg if idcg > 0 else 0.0
        pos = np.flatnonzero(rels > 0)
        mrr = 1.0 / (pos[0] + 1) if len(pos) else 0.0
        r_total = int(n_rel.get(q, 0))
        if r_total > 0 and len(pos):
            prec_at = (np.arange(1, len(rels) + 1))
            ap = float(((np.cumsum(rels > 0) / prec_at)[pos]).sum()) \
                / r_total
        else:
            ap = 0.0
        rows["query_id"].append(q)
        rows["n_rel"].append(r_total)
        rows["ndcg_1e6"].append(round(ndcg * 1e6))
        rows["mrr_1e6"].append(round(mrr * 1e6))
        rows["ap_1e6"].append(round(ap * 1e6))
    return pa.table({
        "query_id": pa.array(rows["query_id"], pa.int64()),
        "n_rel": pa.array(rows["n_rel"], pa.int64()),
        "ndcg_1e6": pa.array(rows["ndcg_1e6"], pa.int64()),
        "mrr_1e6": pa.array(rows["mrr_1e6"], pa.int64()),
        "ap_1e6": pa.array(rows["ap_1e6"], pa.int64()),
    })
