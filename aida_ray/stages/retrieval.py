"""Distributed BM25 top-k retrieval over a document corpus.

Reference parity note: the reference ranks entity keyphrases with
IDF/MI weights (mpi/aida keyphrase-based similarity); this module is
the corpus-retrieval counterpart a training-data pipeline needs —
score every document against a small set of term queries with BM25
(Robertson/Spärck Jones) and keep the top-k per query.

Scale shape (the 100-TB plan):

- ONE stats pass: each batch tokenizes its docs (Arrow RE2 kernels,
  shared with :mod:`aida_ray.stages.tfidf`) and emits per-batch
  partials ONLY for the query terms (the query vocabulary is tiny,
  so shuffle volume is ``O(query_terms x blocks)``), plus a sentinel
  row carrying (doc_count, token_count) partials — corpus size and
  average document length ride the same tiny shuffle.
- The resolved stats (df per query term, N, avgdl) are a handful of
  floats broadcast to the scoring pass via closure capture — no
  join, no second shuffle.
- ONE scoring pass: each batch scores its own docs against all
  queries locally and emits only its LOCAL top-k rows per query;
  the driver merges ``blocks x k x n_queries`` rows (the knn_topk
  merge shape) — never the corpus.

Determinism: scores are rounded to 6 decimals and ranked by
``(score_r DESC, doc_id ASC)`` so rank never depends on sub-round
float noise; the same rounding/tie order is used by the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.tfidf import TOKEN_SPLIT, _doc_terms
from aida_ray.state.collect import collect_table

# sentinel term for the (doc_count, token_count) partial row; real
# tokens never contain a NUL byte (the tokenizer splits on [^a-z0-9]+)
_SENTINEL = "\x00corpus"


def _corpus_stats(ds: ray.data.Dataset, terms: list[str],
                  id_col: str, text_col: str) -> tuple[dict, int, float]:
    """(df per query term, N docs, avg doc length) in one pass.

    Per-batch partials are filtered to the query vocabulary before the
    shuffle; the sentinel row reuses the same (term, df, tf) shape with
    df=doc_count and tf=token_count.
    """
    from ray.data.aggregate import Sum

    term_set = set(terms)

    def partial(b: pa.Table) -> pa.Table:
        dt = _doc_terms(b, id_col, text_col)
        n_docs = b.num_rows
        n_toks = len(dt)
        dt = dt[dt.term.isin(term_set)]
        df = dt.drop_duplicates().groupby("term", sort=False) \
            .size().rename("df")
        tf = dt.groupby("term", sort=False).size().rename("tf")
        out = pd.concat([df, tf], axis=1).reset_index()
        out.loc[len(out)] = [_SENTINEL, n_docs, n_toks]
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = collect_table(
        ds.map_batches(partial, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("df"), Sum("tf"))).to_pandas()
    sent = agg[agg.term == _SENTINEL]
    n = int(sent["sum(df)"].iloc[0])
    total_tokens = int(sent["sum(tf)"].iloc[0])
    dfs = dict(zip(agg[agg.term != _SENTINEL].term,
                   agg[agg.term != _SENTINEL]["sum(df)"].astype(int)))
    return dfs, n, total_tokens / max(1, n)


def bm25_topk(ds: ray.data.Dataset, queries: list[tuple[int, list[str]]],
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id",
              text_col: str = "text") -> pa.Table:
    """Top-k documents per query under BM25.

    ``queries`` is a small list of (query_id, [terms]) — broadcast by
    closure capture (bytes, not a join side).  Returns a table
    (query_id, rank, doc_id, score) with score rounded to 6 decimals
    and rank dense by (score DESC, doc_id ASC).
    """
    all_terms = sorted({t for _, ts in queries for t in ts})
    dfs, n, avgdl = _corpus_stats(ds, all_terms, id_col, text_col)
    # Robertson-style smoothed idf; terms absent from the corpus score 0
    idf = {t: float(np.log(1.0 + (n - dfs.get(t, 0) + 0.5)
                           / (dfs.get(t, 0) + 0.5)))
           for t in all_terms}
    qlist = [(int(qid), sorted(ts)) for qid, ts in queries]

    def score_block(bt: pa.Table) -> pa.Table:
        dt = _doc_terms(bt, id_col, text_col)
        dl = dt.groupby("doc_id", sort=False).size()
        rows = {"query_id": [], "doc_id": [], "score": []}
        in_q = dt[dt.term.isin(set(all_terms))]
        if len(in_q):
            tf = in_q.groupby(["doc_id", "term"], sort=False).size()
            tf = tf.reset_index(name="tf")
            for qid, terms in qlist:
                sub = tf[tf.term.isin(terms)]
                if not len(sub):
                    continue
                dls = dl.loc[sub.doc_id].to_numpy(dtype=np.float64)
                tfs = sub.tf.to_numpy(dtype=np.float64)
                idfs = sub.term.map(idf).to_numpy(dtype=np.float64)
                contrib = idfs * tfs * (k1 + 1.0) \
                    / (tfs + k1 * (1.0 - b + b * dls / avgdl))
                per_doc = pd.Series(contrib).groupby(
                    sub.doc_id.to_numpy()).sum()
                top = per_doc.round(6).to_frame("score_r")
                top["score"] = per_doc
                top = top.reset_index(names="doc_id") \
                    .sort_values(["score_r", "doc_id"],
                                 ascending=[False, True]).head(k)
                rows["query_id"] += [qid] * len(top)
                rows["doc_id"] += [int(d) for d in top.doc_id]
                rows["score"] += [float(s) for s in top.score]
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "doc_id": pa.array(rows["doc_id"], pa.int64()),
                         "score": pa.array(rows["score"], pa.float64())})

    parts = collect_table(
        ds.map_batches(score_block, batch_format="pyarrow")).to_pandas()
    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, _ in qlist:
        sub = parts[parts.query_id == qid].copy()
        sub["score_r"] = sub.score.round(6)
        sub = sub.sort_values(["score_r", "doc_id"],
                              ascending=[False, True]).head(k)
        out["query_id"] += [qid] * len(sub)
        out["rank"] += list(range(1, len(sub) + 1))
        out["doc_id"] += [int(d) for d in sub.doc_id]
        out["score"] += [float(s) for s in sub.score_r]
    return pa.table({"query_id": pa.array(out["query_id"], pa.int64()),
                     "rank": pa.array(out["rank"], pa.int64()),
                     "doc_id": pa.array(out["doc_id"], pa.int64()),
                     "score": pa.array(out["score"], pa.float64())})
