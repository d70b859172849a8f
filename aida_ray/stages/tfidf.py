"""Distributed inverted-index statistics and TF-IDF term scoring.

Tokenization is ``lower → RE2 split on [^a-z0-9]+`` via Arrow kernels
(``pc.utf8_lower`` + ``pc.split_pattern_regex``) — the exact pattern a
DuckDB oracle can run with ``regexp_split_to_array`` (both engines are
RE2), so results are hash-comparable.

Scale shape:

- :func:`term_stats` — per-batch partials: each doc appears in exactly
  one row, so per-batch distinct (doc, term) pairs give globally
  correct document frequencies; the groupby shuffle ships one (term,
  df_partial, tf_partial) row per term per block — volume tracks the
  VOCABULARY, never the corpus.
- :func:`tfidf_top_terms` — the df table is broadcast once via
  ``ray.put`` (natural-language vocabularies are small relative to the
  corpus; for unbounded token spaces substitute a hash join on term),
  and each batch scores + selects its own docs' top-k locally — no
  shuffle of the corpus at all.

Top-k selection ranks by (tf DESC, df ASC, term ASC): an
integer-deterministic order (ties never depend on float libm
differences), with the float tf-idf score ``tf * ln(N/df)`` emitted as
an output column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached

TOKEN_SPLIT = "[^a-z0-9]+"


def _doc_terms(b: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    """(doc_id, term) rows for one batch — flatten the RE2 split lists
    with doc ids repeated by list length; drops empty boundary tokens."""
    lists = pc.split_pattern_regex(
        pc.utf8_lower(b[text_col].combine_chunks()), pattern=TOKEN_SPLIT)
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), lengths)
    terms = lists.flatten()
    df = pd.DataFrame({"doc_id": ids, "term": terms.to_pandas()})
    return df[df.term != ""]


def term_stats(ds: ray.data.Dataset, id_col: str = "doc_id",
               text_col: str = "text") -> ray.data.Dataset:
    """Inverted-index statistics (term, df, tf): document frequency and
    total term frequency over the corpus."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        dt = _doc_terms(b, id_col, text_col)
        tf = dt.groupby("term", sort=False).size().rename("tf")
        df = dt.drop_duplicates().groupby("term", sort=False) \
            .size().rename("df")
        out = pd.concat([df, tf], axis=1).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("df"), Sum("tf"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"term": b["term"],
                         "df": pc.cast(b["sum(df)"], pa.int64()),
                         "tf": pc.cast(b["sum(tf)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def tfidf_top_terms(ds: ray.data.Dataset, k: int = 5,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> ray.data.Dataset:
    """Per-document top-k TF-IDF terms: (doc_id, term, tf, df, tfidf)
    ranked by (tf DESC, df ASC, term ASC)."""
    n_docs = ds.count()
    df_tbl = term_stats(ds, id_col, text_col).to_pandas()
    df_ref = ray.put(dict(zip(df_tbl.term, df_tbl.df.astype("int64"))))

    def score(b: pa.Table) -> pa.Table:
        df_map = _get_cached(df_ref)
        dt = _doc_terms(b, id_col, text_col)
        g = dt.groupby(["doc_id", "term"], sort=False).size() \
            .rename("tf").reset_index()
        g["df"] = g.term.map(df_map).astype("int64")
        g["tfidf"] = g.tf.to_numpy(dtype="float64") \
            * np.log(float(n_docs) / g.df.to_numpy(dtype="float64"))
        g = g.sort_values(["doc_id", "tf", "df", "term"],
                          ascending=[True, False, True, True])
        top = g.groupby("doc_id", sort=False).head(k)
        return pa.Table.from_pandas(top.reset_index(drop=True),
                                    preserve_index=False)

    return ds.map_batches(score, batch_format="pyarrow")


def _doc_ngrams(b: pa.Table, id_col: str, text_col: str,
                n: int) -> pd.DataFrame:
    """Distinct (doc_id, gram) rows per batch — word n-grams joined
    with single spaces.  Per-batch distinct is globally distinct
    because every document lives in exactly one row."""
    dt = _doc_terms(b, id_col, text_col)
    if dt.empty:
        return pd.DataFrame({"doc_id": [], "gram": []})
    ids = dt.doc_id.to_numpy()
    terms = dt.term.to_numpy()
    if len(terms) < n:
        return pd.DataFrame({"doc_id": [], "gram": []})
    same = np.ones(len(ids) - n + 1, dtype=bool)
    gram = terms[: len(terms) - n + 1].astype(object)
    for k in range(1, n):
        same &= ids[: len(ids) - n + 1] == ids[k: len(ids) - n + 1 + k]
        gram = gram + " " + terms[k: len(terms) - n + 1 + k]
    out = pd.DataFrame({"doc_id": ids[: len(ids) - n + 1][same],
                        "gram": gram[same]})
    return out.drop_duplicates()


def rare_gram_doc_pairs(ds: ray.data.Dataset, n: int = 4,
                        df_min: int = 2, df_max: int = 20,
                        min_shared: int = 2,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> ray.data.Dataset:
    """Sparse document-similarity join via the RARE-term inverted
    index: documents sharing ≥ ``min_shared`` word ``n``-grams whose
    document frequency is in [df_min, df_max].  Output (a, b,
    n_shared) with a < b.

    The classic prefix-filtered similarity-join shape: common grams
    (df > df_max) can never discriminate and are dropped BEFORE pair
    generation, so per-gram group size — and hence the quadratic pair
    fan-out — is bounded by df_max.  Stages: per-batch distinct
    (doc, gram) → one groupby on gram emits each qualifying posting
    list's C(df, 2) pairs (vectorized ``np.triu_indices``) → pairs
    dedup/count on a packed ``a<<32|b`` key → threshold filter.  All
    shuffle volume tracks postings of RARE grams, never the corpus."""
    def partial(b: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_doc_ngrams(b, id_col, text_col, n),
                                    preserve_index=False)

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        docs = np.unique(g.doc_id.to_numpy())
        if not (df_min <= len(docs) <= df_max):
            return pd.DataFrame({"ab": np.empty(0, dtype="int64")})
        iu, ju = np.triu_indices(len(docs), k=1)
        return pd.DataFrame(
            {"ab": (docs[iu].astype("int64") << 32) | docs[ju]})

    def local_count(b: pa.Table) -> pa.Table:
        # normalize map_groups' pandas blocks back to Arrow (empty
        # pandas blocks otherwise leak through the groupby) and
        # pre-count block-locally so the shuffle ships distinct pairs
        ab, n = np.unique(b["ab"].to_numpy(zero_copy_only=False),
                          return_counts=True)
        return pa.table({"ab": pa.array(ab, pa.int64()),
                         "n": pa.array(n.astype("int64"))})

    from ray.data.aggregate import Sum
    pairs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("gram").map_groups(per_gram, batch_format="pandas") \
        .map_batches(local_count, batch_format="pyarrow") \
        .groupby("ab").aggregate(Sum("n"))

    def unpack(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["sum(n)"],
                                      pa.scalar(min_shared)))
        ab = t["ab"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(ab >> 32, pa.int64()),
                         "b": pa.array(ab & 0xFFFFFFFF, pa.int64()),
                         "n_shared": pc.cast(t["sum(n)"], pa.int64())})

    return pairs.map_batches(unpack, batch_format="pyarrow")
