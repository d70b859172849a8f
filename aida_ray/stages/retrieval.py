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

import re

from aida_ray.stages.tfidf import TOKEN_SPLIT, _doc_terms
from aida_ray.state.collect import collect_table

_SNIP_RE = re.compile(TOKEN_SPLIT)

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
    if agg.empty or "term" not in agg.columns:   # zero-block corpus
        return {}, 0, 0.0
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
        if parts.empty or "query_id" not in parts.columns:
            break
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


def rm3_expansion(ds: ray.data.Dataset,
                  queries: list[tuple[int, list[str]]],
                  k_docs: int = 10, k_terms: int = 8,
                  mix: float = 0.5,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """RM3 pseudo-relevance-feedback query expansion (Lavrenko &
    Croft relevance models; the Abdul-Jaleel et al. RM3 interpolation)
    over the BM25 top-``k_docs``:

        P(w|R) = Σ_{d ∈ top-k}  (tf(w,d) / |d|) · (s(q,d) / Σ_d s)
        P'(w)  = mix · P_orig(w) + (1 - mix) · P(w|R)

    with ``P_orig`` uniform over the original query terms.  Returns
    (query_id, term, weight_1e6, is_new) — the top-``k_terms`` terms
    by (weight DESC, term ASC), ``is_new`` marking terms outside the
    original query.

    Scale shape: the feedback doc-id set (|Q| × k_docs) broadcasts;
    ONE pass over the corpus emits per-(query, term) partial
    relevance mass only for feedback docs (bounded by feedback-doc
    lengths per block); the driver merges query-vocabulary-bounded
    partials.  Nothing corpus-sized leaves the workers.
    """
    run = bm25_topk(ds, queries, k=k_docs, id_col=id_col,
                    text_col=text_col).to_pandas()
    # P(d|q): normalized scores over the feedback set
    pdq: dict[tuple[int, int], float] = {}
    for qid, sub in run.groupby("query_id"):
        tot = float(sub.score.sum())
        if tot <= 0:
            continue
        for d, s in zip(sub.doc_id, sub.score):
            pdq[(int(qid), int(d))] = float(s) / tot
    fb_docs: dict[int, list[int]] = {}
    for (qid, d) in pdq:
        fb_docs.setdefault(d, []).append(qid)
    ref = ray.put((fb_docs, pdq))

    def partial(b: pa.Table) -> pa.Table:
        fdocs, pd_q = ray.get(ref)
        dt = _doc_terms(b, id_col, text_col)
        dt = dt[dt.doc_id.isin(fdocs)]
        if not len(dt):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "mass": pa.array([], pa.float64())})
        dl = dt.groupby("doc_id", sort=False).size()
        tf = dt.groupby(["doc_id", "term"], sort=False).size() \
            .reset_index(name="tf")
        tf["pwd"] = tf.tf / dl.loc[tf.doc_id].to_numpy()
        rows = {"query_id": [], "term": [], "mass": []}
        for d, sub in tf.groupby("doc_id", sort=False):
            for qid in fdocs[int(d)]:
                w = pd_q[(qid, int(d))]
                rows["query_id"] += [qid] * len(sub)
                rows["term"] += list(sub.term)
                rows["mass"] += list(sub.pwd * w)
        df = pd.DataFrame(rows).groupby(
            ["query_id", "term"], sort=False)["mass"].sum().reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow"),
        pa.schema([("query_id", pa.int64()), ("term", pa.string()),
                   ("mass", pa.float64())])).to_pandas()
    rm = parts.groupby(["query_id", "term"])["mass"].sum() \
        if len(parts) else pd.Series(dtype=float)

    out = {"query_id": [], "term": [], "weight_1e6": [], "is_new": []}
    for qid, terms in [(int(q), sorted(ts)) for q, ts in queries]:
        orig = 1.0 / len(terms) if terms else 0.0
        weights: dict[str, float] = {}
        if len(parts):
            for (q, t), m in rm.items():
                if q == qid:
                    weights[t] = (1.0 - mix) * float(m)
        for t in terms:
            weights[t] = weights.get(t, 0.0) + mix * orig
        # rank by the ROUNDED weight so both this and the SQL twin
        # break near-ties identically (full-precision float sums are
        # order-dependent across partition counts)
        top = sorted(weights.items(),
                     key=lambda kv: (-round(kv[1] * 1e6), kv[0]))
        top = top[:k_terms]
        for t, w in top:
            out["query_id"].append(qid)
            out["term"].append(t)
            out["weight_1e6"].append(round(w * 1e6))
            out["is_new"].append(t not in terms)
    return pa.table({
        "query_id": pa.array(out["query_id"], pa.int64()),
        "term": pa.array(out["term"], pa.string()),
        "weight_1e6": pa.array(out["weight_1e6"], pa.int64()),
        "is_new": pa.array(out["is_new"], pa.bool_()),
    })


def best_snippets(ds: ray.data.Dataset,
                  queries: list[tuple[int, list[str]]],
                  run: pa.Table | None = None,
                  window: int = 12, k_docs: int = 5,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Query-biased snippet extraction for the BM25 top-``k_docs``:
    per (query, doc), the best ``window``-token window by

        (distinct query terms in window DESC,
         total query-term hits DESC, start position ASC)

    — the deterministic core of a search-result snippeter.  Returns
    (query_id, doc_id, start_tok, n_distinct, n_hits, snippet).

    Scale shape: the (query, doc) feedback set is |Q| × k_docs and
    broadcasts; each corpus block snippets only its own feedback docs
    (a sliding-window count over the doc's term-hit positions —
    O(tokens) via prefix sums), emitting one row per (query, doc).
    """
    if run is None:
        run = bm25_topk(ds, queries, k=k_docs, id_col=id_col,
                        text_col=text_col)
    rdf = run.to_pandas()
    rdf = rdf[rdf["rank"] <= k_docs]
    want: dict[int, list[int]] = {}
    for qid, d in zip(rdf.query_id, rdf.doc_id):
        want.setdefault(int(d), []).append(int(qid))
    qterms = {int(q): sorted(set(ts)) for q, ts in queries}
    ref = ray.put((want, qterms))

    def partial(b: pa.Table) -> pa.Table:
        wnt, qts = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_pylist()
        rows = {"query_id": [], "doc_id": [], "start_tok": [],
                "n_distinct": [], "n_hits": [], "snippet": []}
        for did, text in zip(ids, texts):
            did = int(did)
            if did not in wnt:
                continue
            toks = [t for t in _SNIP_RE.split(text.lower()) if t]
            n = len(toks)
            for qid in wnt[did]:
                terms = qts[qid]
                # hit matrix per term -> prefix sums per window
                best = (-1, -1, 0)  # (n_distinct, n_hits, -start)
                best_start = 0
                hits = [np.fromiter((t == qt for t in toks), dtype=np.int64,
                                    count=n) for qt in terms]
                pre = [np.concatenate([[0], h.cumsum()]) for h in hits]
                w = min(window, n) if n else 0
                for s in range(0, max(1, n - w + 1)):
                    cnts = [p[s + w] - p[s] for p in pre]
                    nd = sum(1 for c in cnts if c > 0)
                    nh = int(sum(cnts))
                    key = (nd, nh, -s)
                    if key > best:
                        best, best_start = key, s
                rows["query_id"].append(qid)
                rows["doc_id"].append(did)
                rows["start_tok"].append(best_start)
                rows["n_distinct"].append(max(best[0], 0))
                rows["n_hits"].append(max(best[1], 0))
                rows["snippet"].append(
                    " ".join(toks[best_start:best_start + w]))
        return pa.table({
            "query_id": pa.array(rows["query_id"], pa.int64()),
            "doc_id": pa.array(rows["doc_id"], pa.int64()),
            "start_tok": pa.array(rows["start_tok"], pa.int64()),
            "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
            "n_hits": pa.array(rows["n_hits"], pa.int64()),
            "snippet": pa.array(rows["snippet"], pa.string())})

    return collect_table(
        ds.map_batches(partial, batch_format="pyarrow"),
        pa.schema([("query_id", pa.int64()), ("doc_id", pa.int64()),
                   ("start_tok", pa.int64()), ("n_distinct", pa.int64()),
                   ("n_hits", pa.int64()), ("snippet", pa.string())]))


# ------------------------------------------------------------------
# Persisted inverted index — the 100-TB query path.  A full-corpus
# scan per query wave (bm25_topk) is the right shape for ad-hoc
# queries over a stream; a SERVED index must prune I/O instead:
# postings are written hive-partitioned by term-hash bucket
# (pbucket=N/), so a query reads ONLY its terms' buckets — the same
# structural pruning as knn.ivf_index_write (stats prove unprobed
# partitions are never opened).  Doc length rides denormalized on
# each posting row (no join at query time); per-term df lives in a
# parallel df/pbucket=N/ table (vocabulary-sized, same pruning); N
# and avgdl are scalars in _meta.npz.

import os


def _term_bucket(terms, n_buckets: int) -> np.ndarray:
    """Stable term -> bucket id, identical at build and query time."""
    from aida_ray.stages.dedup import _string_hashes_vec
    h1, _ = _string_hashes_vec(terms)
    return (h1 % np.int64(n_buckets)).astype(np.int64)


def bm25_index_write(ds: ray.data.Dataset, path: str,
                     n_buckets: int = 32, id_col: str = "doc_id",
                     text_col: str = "text") -> dict:
    """Build + persist the inverted index.  Idempotent on config match
    (resume).  Returns {"n": N, "avgdl": float}."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.knn import (_index_finalize, _index_meta_read,
                                     _index_meta_write, _index_tmp_swap,
                                     index_exists)

    cfg = {"kind": "bm25", "n_buckets": n_buckets, "id_col": id_col,
           "text_col": text_col}
    if index_exists(path, cfg):
        _, arrays = _index_meta_read(path)
        return {"n": int(arrays["n"][0]), "avgdl": float(arrays["avgdl"][0])}

    def postings(b: pa.Table) -> pa.Table:
        dt = _doc_terms(b, id_col, text_col)
        dl = dt.groupby("doc_id", sort=False).size()
        tf = dt.groupby(["doc_id", "term"], sort=False).size() \
            .reset_index(name="tf")
        tf["dl"] = dl.loc[tf.doc_id].to_numpy()
        tf["pbucket"] = _term_bucket(tf.term.tolist(), n_buckets)
        return pa.Table.from_pandas(tf, preserve_index=False)

    tmp = _index_tmp_swap(path)
    post = ds.map_batches(postings, batch_format="pyarrow").materialize()
    post.write_parquet(os.path.join(tmp, "postings"),
                       partition_cols=["pbucket"])

    # df per term (postings are per-(doc, term) rows, so df = row
    # count per term) + corpus scalars off the same materialized pass
    def df_partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"term": b["term"].to_pandas()})
        g = df.groupby("term", sort=False).size().rename("df").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    dfagg = post.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df"))

    def df_finish(b: pa.Table) -> pa.Table:
        terms = b["term"].to_pandas().tolist()
        return pa.table({
            "term": b["term"],
            "df": pc.cast(b["sum(df)"], pa.int64()),
            "pbucket": pa.array(_term_bucket(terms, n_buckets)
                                if terms else
                                np.array([], dtype=np.int64), pa.int64())})

    dfagg.map_batches(df_finish, batch_format="pyarrow") \
        .write_parquet(os.path.join(tmp, "df"), partition_cols=["pbucket"])

    # corpus scalars: one doc appears in exactly one block, so
    # (distinct docs, total tokens) partial-sum cleanly
    def scal(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"doc_id": b["doc_id"].to_pandas(),
                           "dl": b["dl"].to_numpy(zero_copy_only=False)})
        per_doc = df.drop_duplicates("doc_id")
        return pa.table({"n": pa.array([len(per_doc)], pa.int64()),
                         "toks": pa.array([int(per_doc.dl.sum())],
                                          pa.int64())})

    sc = collect_table(post.map_batches(scal, batch_format="pyarrow"),
                       schema=pa.schema([("n", pa.int64()),
                                         ("toks", pa.int64())])).to_pandas()
    n = int(sc.n.sum())
    avgdl = float(sc.toks.sum()) / max(1, n)
    _index_meta_write(tmp, cfg, n=np.array([n], dtype=np.int64),
                      avgdl=np.array([avgdl], dtype=np.float64))
    _index_finalize(path)
    return {"n": n, "avgdl": avgdl}


def _bucket_files(root: str, buckets: list[int]) -> tuple[list, dict]:
    """Parquet file list restricted to the probed pbucket dirs."""
    all_b = sorted(int(d.split("=", 1)[1]) for d in os.listdir(root)
                   if d.startswith("pbucket="))
    hit = [b for b in buckets if b in set(all_b)]

    def files(b):
        d = os.path.join(root, f"pbucket={b}")
        return sorted(os.path.join(d, f) for f in os.listdir(d)
                      if f.endswith(".parquet"))

    flist = [f for b in hit for f in files(b)]
    stats = {"buckets_total": len(all_b), "buckets_read": len(hit),
             "files_read": len(flist),
             "files_total": sum(len(files(b)) for b in all_b)}
    return flist, stats


def bm25_index_topk(path: str, queries: list[tuple[int, list[str]]],
                    k: int = 10, k1: float = 1.2,
                    b: float = 0.75) -> tuple[pa.Table, dict]:
    """Query the persisted index reading ONLY the query terms' buckets.
    Returns (top-k table in bm25_topk's shape, read stats)."""
    from aida_ray.stages.dedup import _get_cached
    from aida_ray.stages.knn import _index_meta_read

    _, arrays = _index_meta_read(path)
    n = int(arrays["n"][0])
    avgdl = float(arrays["avgdl"][0])
    all_terms = sorted({t for _, ts in queries for t in ts})
    want = sorted(set(int(x) for x in _term_bucket(
        all_terms, _n_buckets_on_disk(path))))
    post_files, stats = _bucket_files(os.path.join(path, "postings"), want)
    df_files, _ = _bucket_files(os.path.join(path, "df"), want)

    # per-term df: vocabulary-bounded read over probed buckets only
    dfs: dict[str, int] = {}
    if df_files:
        dft = pq_read_filtered(df_files, all_terms)
        dfs = dict(zip(dft["term"].to_pylist(),
                       (int(x) for x in dft["df"].to_pylist())))
    idf = {t: float(np.log(1.0 + (n - dfs.get(t, 0) + 0.5)
                           / (dfs.get(t, 0) + 0.5))) for t in all_terms}
    qlist = [(int(qid), sorted(ts)) for qid, ts in queries]

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64()),
                      "score": pa.array([], pa.float64())})
    if not post_files:
        return empty, stats

    ds = ray.data.read_parquet(post_files,
                               columns=["term", "doc_id", "tf", "dl"])
    qref = ray.put((qlist, idf, set(all_terms)))

    def score(bt: pa.Table) -> pa.Table:
        ql, idfs, termset = _get_cached(qref)
        df = pd.DataFrame({
            "term": bt["term"].to_pandas(),
            "doc_id": bt["doc_id"].to_numpy(zero_copy_only=False),
            "tf": bt["tf"].to_numpy(zero_copy_only=False)
                .astype(np.float64),
            "dl": bt["dl"].to_numpy(zero_copy_only=False)
                .astype(np.float64)})
        df = df[df.term.isin(termset)]
        rows = {"query_id": [], "doc_id": [], "score": []}
        for qid, terms in ql:
            sub = df[df.term.isin(terms)]
            if not len(sub):
                continue
            contrib = sub.term.map(idfs).to_numpy() * sub.tf.to_numpy() \
                * (k1 + 1.0) / (sub.tf.to_numpy()
                                + k1 * (1.0 - b + b * sub.dl.to_numpy()
                                        / avgdl))
            # NO local top-k here: a doc's score for a multi-term query
            # splits across buckets/blocks, so blocks emit full partial
            # per-doc sums (bounded by the postings actually read) and
            # the merge groupby-sums before ranking
            per_doc = pd.Series(contrib).groupby(
                sub.doc_id.to_numpy()).sum()
            rows["query_id"] += [qid] * len(per_doc)
            rows["doc_id"] += [int(d) for d in per_doc.index]
            rows["score"] += [float(s) for s in per_doc.to_numpy()]
        return pa.table({"query_id": pa.array(rows["query_id"], pa.int64()),
                         "doc_id": pa.array(rows["doc_id"], pa.int64()),
                         "score": pa.array(rows["score"], pa.float64())})

    parts = collect_table(
        ds.map_batches(score, batch_format="pyarrow")).to_pandas()
    out = {"query_id": [], "rank": [], "doc_id": [], "score": []}
    for qid, _ in qlist:
        sub = parts[parts.query_id == qid].copy()
        if not len(sub):
            continue
        # postings for one doc+term live in exactly one bucket, but a
        # multi-term query's doc scores may split across buckets/blocks
        sub = sub.groupby("doc_id", as_index=False)["score"].sum()
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
                     "score": pa.array(out["score"], pa.float64())}), stats


def _n_buckets_on_disk(path: str) -> int:
    import json
    with open(os.path.join(path, "_meta.json")) as f:
        return int(json.load(f)["n_buckets"])


def pq_read_filtered(files: list[str], terms: list[str]) -> pa.Table:
    """Small filtered read of the df sidecar (vocabulary-bounded)."""
    import pyarrow.dataset as pads
    dset = pads.dataset(files)
    return dset.to_table(filter=pads.field("term").isin(terms),
                         columns=["term", "df"])


def rrf_fusion(rankings: ray.data.Dataset, list_col: str = "list_id",
               item_col: str = "item", rank_col: str = "rank",
               k: int = 60) -> ray.data.Dataset:
    """Reciprocal-rank fusion (Cormack et al., public method): fuse k
    rankers' lists into one score per item,
    ``score = sum over lists of 1 / (k + rank)`` — the standard
    training-free ensemble for hybrid retrieval (BM25 + dense + ...).

    Duplicate (list, item) rows collapse to the item's BEST (minimum)
    rank in that list before fusing.  Emits (item, n_lists, score)
    with score rounded to 6.

    Scale shape: one (list, item) min-groupby (candidate-vocabulary
    bounded), then per-batch partial sums into a per-item groupby —
    shuffles ship candidate rows, never corpora."""
    from ray.data.aggregate import Min, Sum

    best = rankings.groupby([list_col, item_col]) \
        .aggregate(Min(rank_col))

    def partial(b: pa.Table) -> pa.Table:
        col = f"min({rank_col})"
        if col not in b.column_names:
            return pa.table({"item": pa.array([], pa.string()),
                             "l": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        r = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "item": b[item_col],
            "l": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "s": pa.array(1.0 / (k + r), pa.float64())})

    agg = best.map_batches(partial, batch_format="pyarrow") \
        .groupby("item").aggregate(Sum("l"), Sum("s"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(l)" not in b.column_names:
            return pa.table({"item": pa.array([], pa.string()),
                             "n_lists": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        return pa.table({
            "item": b["item"],
            "n_lists": b["sum(l)"].cast(pa.int64()),
            "score": pa.array(np.round(
                b["sum(s)"].to_numpy(zero_copy_only=False), 6),
                pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")
