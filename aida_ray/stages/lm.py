"""Count-based bigram language model: distributed training + perplexity
scoring — the CCNet-style "score every document against a corpus LM"
quality signal for training-data pipelines.

Training is two vocabulary-bounded aggregations (unigram counts, bigram
counts): map-side partials per batch, one groupby-sum each — shuffle
volume tracks the VOCABULARY (and bigram vocabulary), never the corpus.
The finished model (unigram counts, bigram counts, |V|) is broadcast
once via ``ray.put`` and every batch scores its own documents locally —
the scoring pass is map-only, zero shuffle.

Scoring: add-one (Laplace) smoothed conditional likelihood

    nll(w_{i-1} w_i) = -ln( (B(w_{i-1}, w_i) + 1) / (U(w_{i-1}) + |V|) )

averaged over a document's bigram positions; documents with < 2 tokens
score 0.0 with n_bigrams = 0.  Tokenization matches the TF-IDF stage
(lower → RE2 split on ``[^a-z0-9]+``) so a DuckDB oracle reproduces it
exactly; the average is rounded to 6 decimals on both sides.

Scale note: the broadcast assumes the bigram table ≪ corpus (true for
natural language: bigram vocabulary grows sub-linearly and is further
boundable with a min-count cutoff).  For open token spaces substitute a
hash join of the position pairs against the bigram table on a packed
(t1, t2) key — the scoring formula is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached
from aida_ray.stages.tfidf import _doc_terms


def _doc_bigrams(b: pa.Table, id_col: str,
                 text_col: str) -> pd.DataFrame:
    """(doc_id, t1, t2) rows for every adjacent token pair per doc."""
    dt = _doc_terms(b, id_col, text_col).reset_index(drop=True)
    if dt.empty:
        return pd.DataFrame({"doc_id": [], "t1": [], "t2": []})
    ids = dt.doc_id.to_numpy()
    same = ids[:-1] == ids[1:]
    terms = dt.term.to_numpy()
    return pd.DataFrame({"doc_id": ids[:-1][same],
                         "t1": terms[:-1][same],
                         "t2": terms[1:][same]})


def train_bigram_lm(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text"):
    """Two vocabulary-bounded aggregations → (uni_counts: dict,
    bigram_counts: dict keyed by "t1 t2", vocab_size)."""
    from ray.data.aggregate import Sum

    def uni_partial(b: pa.Table) -> pa.Table:
        dt = _doc_terms(b, id_col, text_col)
        g = dt.groupby("term", sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    uni = ds.map_batches(uni_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n")).to_pandas()

    def big_partial(b: pa.Table) -> pa.Table:
        bg = _doc_bigrams(b, id_col, text_col)
        if bg.empty:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        key = bg.t1 + " " + bg.t2
        g = key.value_counts().rename("n").reset_index()
        g.columns = ["bigram", "n"]
        return pa.Table.from_pandas(g, preserve_index=False)

    big = ds.map_batches(big_partial, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("n")).to_pandas()

    uni_map = dict(zip(uni.term, uni["sum(n)"].astype("int64")))
    big_map = dict(zip(big.bigram, big["sum(n)"].astype("int64")))
    return uni_map, big_map, len(uni_map)


def bigram_lm_scores(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text") -> ray.data.Dataset:
    """Per-document add-one-smoothed bigram negative log-likelihood:
    (doc_id, n_bigrams, avg_nll)."""
    uni_map, big_map, vocab = train_bigram_lm(ds, id_col, text_col)
    model_ref = ray.put((uni_map, big_map, vocab))

    def score(b: pa.Table) -> pa.Table:
        uni, big, v = _get_cached(model_ref)
        all_ids = b[id_col].to_numpy(zero_copy_only=False)
        bg = _doc_bigrams(b, id_col, text_col)
        if bg.empty:
            return pa.table({
                "doc_id": pa.array(all_ids, pa.int64()),
                "n_bigrams": pa.array(np.zeros(len(all_ids), "int64")),
                "avg_nll": pa.array(np.zeros(len(all_ids)), pa.float64()),
            })
        bc = (bg.t1 + " " + bg.t2).map(big).fillna(0).to_numpy("float64")
        uc = bg.t1.map(uni).to_numpy(dtype="float64")
        bg["nll"] = -np.log((bc + 1.0) / (uc + float(v)))
        g = bg.groupby("doc_id", sort=False)["nll"] \
            .agg(["count", "mean"]).reset_index()
        out = pd.DataFrame({"doc_id": all_ids}).merge(
            g, on="doc_id", how="left")
        return pa.table({
            "doc_id": pa.array(out.doc_id.to_numpy(), pa.int64()),
            "n_bigrams": pa.array(
                out["count"].fillna(0).to_numpy("int64")),
            "avg_nll": pa.array(
                np.round(out["mean"].fillna(0.0).to_numpy("float64"), 6),
                pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def bigram_pmi(ds: ray.data.Dataset, min_count: int = 5, k: int = 20,
               id_col: str = "doc_id",
               text_col: str = "text") -> pa.Table:
    """Top-k collocations by pointwise mutual information,
    ``pmi = ln(n_ab * N_uni^2 / (N_bi * n_a * n_b))`` (Church & Hanks
    1990) over adjacent-token bigrams with ``n_ab >= min_count``.

    Scale shape: two vocabulary-bounded counting aggregations (bigram
    + unigram partials per block — shuffle tracks vocabulary, never
    the corpus); unigram counts broadcast once via ``ray.put`` and the
    bigram-count stream scores itself map-side, emitting per-block
    local top-k; the driver merges blocks x k rows.  Ranking is
    (round(pmi, 6) DESC, t1, t2) — deterministic under float noise.
    """
    from ray.data.aggregate import Sum

    from aida_ray.state.collect import collect_table

    def bi_partial(b: pa.Table) -> pa.Table:
        bg = _doc_bigrams(b, id_col, text_col)
        g = bg.groupby(["t1", "t2"], sort=False).size().rename("n") \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def uni_partial(b: pa.Table) -> pa.Table:
        dt = _doc_terms(b, id_col, text_col)
        g = dt.groupby("term", sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    uni = collect_table(
        ds.map_batches(uni_partial, batch_format="pyarrow")
          .groupby("term").aggregate(Sum("n"))).to_pandas()
    n_uni = float(uni["sum(n)"].sum())
    uni_map = dict(zip(uni.term, uni["sum(n)"].astype(float)))
    bi = ds.map_batches(bi_partial, batch_format="pyarrow") \
        .groupby(["t1", "t2"]).aggregate(Sum("n")).materialize()
    n_bi = float(bi.sum("sum(n)") or 0)
    uref = ray.put(uni_map)

    def score(b: pa.Table) -> pa.Table:
        um = _get_cached(uref)
        df = pd.DataFrame({"t1": b["t1"].to_pandas(),
                           "t2": b["t2"].to_pandas(),
                           "nab": b["sum(n)"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
        df = df[df.nab >= min_count]
        if not len(df):
            return pa.table({"t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string()),
                             "nab": pa.array([], pa.int64()),
                             "pmi": pa.array([], pa.float64())})
        na = df.t1.map(um).to_numpy(dtype=np.float64)
        nb = df.t2.map(um).to_numpy(dtype=np.float64)
        pmi = np.log(df.nab.to_numpy(dtype=np.float64) * n_uni * n_uni
                     / (n_bi * na * nb))
        df["pmi"] = np.round(pmi, 6)
        df = df.sort_values(["pmi", "t1", "t2"],
                            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = collect_table(
        bi.map_batches(score, batch_format="pyarrow")).to_pandas()
    parts = parts.sort_values(["pmi", "t1", "t2"],
                              ascending=[False, True, True]).head(k) \
        .reset_index(drop=True)
    return pa.Table.from_pandas(parts, preserve_index=False)


def bigram_llr(ds: ray.data.Dataset, min_count: int = 5, k: int = 20,
               id_col: str = "doc_id",
               text_col: str = "text") -> pa.Table:
    """Top-k collocations by Dunning's log-likelihood ratio (G^2,
    Dunning 1993 "Accurate Methods for the Statistics of Surprise and
    Coincidence") over adjacent-token bigrams with ``n_ab >=
    min_count`` — the classic significance-aware alternative to PMI
    (PMI over-ranks rare pairs; G^2 does not).

    Contingency table per bigram (t1, t2) over BIGRAM positions:
    k11 = n_ab, k12 = n1 - n_ab, k21 = n2 - n_ab,
    k22 = N - n1 - n2 + n_ab, with n1/n2 the left/right marginals and
    N the total bigram count; G^2 = 2 * sum kij * ln(kij / eij) with
    eij the independence expectation and 0·ln(0) = 0.

    Scale shape: ONE vocabulary-bounded counting aggregation (bigram
    partials per block, groupby-sum — shuffle tracks bigram
    vocabulary, never the corpus); both marginals derive from the
    bigram table itself (two tiny aggregations over the bigram vocab)
    and broadcast once via ``ray.put``; the bigram-count stream then
    scores itself map-side with per-block local top-k and the driver
    merges blocks x k rows.  Ranking is (round(llr, 6) DESC, t1, t2).
    """
    from ray.data.aggregate import Sum

    from aida_ray.state.collect import collect_table

    def bi_partial(b: pa.Table) -> pa.Table:
        bg = _doc_bigrams(b, id_col, text_col)
        g = bg.groupby(["t1", "t2"], sort=False).size().rename("n") \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    empty = pa.table({"t1": pa.array([], pa.string()),
                      "t2": pa.array([], pa.string()),
                      "nab": pa.array([], pa.int64()),
                      "llr": pa.array([], pa.float64())})
    bi = ds.map_batches(bi_partial, batch_format="pyarrow") \
        .groupby(["t1", "t2"]).aggregate(Sum("n")).materialize()
    n_total = float(bi.sum("sum(n)") or 0)
    if n_total == 0:
        return empty
    left = collect_table(bi.groupby("t1").aggregate(Sum("sum(n)"))) \
        .to_pandas()
    right = collect_table(bi.groupby("t2").aggregate(Sum("sum(n)"))) \
        .to_pandas()
    mref = ray.put((dict(zip(left.t1, left["sum(sum(n))"].astype(float))),
                    dict(zip(right.t2,
                             right["sum(sum(n))"].astype(float)))))

    def _xlx(kij: np.ndarray, eij: np.ndarray) -> np.ndarray:
        out = np.zeros_like(eij)
        pos = kij > 0
        out[pos] = kij[pos] * np.log(kij[pos] / eij[pos])
        return out

    def score(b: pa.Table) -> pa.Table:
        lm_, rm_ = _get_cached(mref)
        df = pd.DataFrame({"t1": b["t1"].to_pandas(),
                           "t2": b["t2"].to_pandas(),
                           "nab": b["sum(n)"].to_numpy(
                               zero_copy_only=False).astype(np.int64)})
        df = df[df.nab >= min_count]
        if not len(df):
            return pa.table({"t1": pa.array([], pa.string()),
                             "t2": pa.array([], pa.string()),
                             "nab": pa.array([], pa.int64()),
                             "llr": pa.array([], pa.float64())})
        n1 = df.t1.map(lm_).to_numpy(dtype=np.float64)
        n2 = df.t2.map(rm_).to_numpy(dtype=np.float64)
        k11 = df.nab.to_numpy(dtype=np.float64)
        k12, k21 = n1 - k11, n2 - k11
        k22 = n_total - n1 - n2 + k11
        nn = n_total
        g2 = 2.0 * (_xlx(k11, n1 * n2 / nn)
                    + _xlx(k12, n1 * (nn - n2) / nn)
                    + _xlx(k21, (nn - n1) * n2 / nn)
                    + _xlx(k22, (nn - n1) * (nn - n2) / nn))
        df["llr"] = np.round(g2, 6)
        df = df.sort_values(["llr", "t1", "t2"],
                            ascending=[False, True, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    parts = collect_table(
        bi.map_batches(score, batch_format="pyarrow")).to_pandas()
    parts = parts.sort_values(["llr", "t1", "t2"],
                              ascending=[False, True, True]).head(k) \
        .reset_index(drop=True)
    return pa.Table.from_pandas(parts, preserve_index=False)
