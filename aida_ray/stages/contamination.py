"""Benchmark-contamination and cross-document repeated-span detection.

Training-corpus hygiene operators a 100 TB pipeline needs before the
data reaches a model:

- :func:`contamination_counts` — per-document overlap with a BROADCAST
  evaluation-set n-gram table (the standard train/test contamination
  check): the eval side is small by construction (benchmarks are
  thousands of documents, not billions), so its distinct gram ids ship
  once via ``ray.put`` and every batch scores vectorized
  (``searchsorted`` membership) with zero shuffle.
- :func:`repeated_spans` — word-n-gram spans appearing in >= min_docs
  distinct documents (boilerplate / template detection à la C4's
  three-sentence rule): one explode + groupby-count shuffle bounded by
  the distinct-gram volume, then a map-side semi-join back (broadcast
  below a threshold, hash join above — same adaptive shape as the
  MinHash hot-bucket stage).

Both use :func:`aida_ray.stages.dedup.word_ngram_set` gram ids, so
results are exact against string-built SQL n-grams up to 63-bit hash
collisions (negligible).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.state.collect import collect_table
from aida_ray.stages.dedup import _get_cached, word_ngram_set

_G_SCHEMA = pa.schema([("g", pa.int64())])


def eval_gram_ref(eval_ds: ray.data.Dataset, n: int = 3,
                  text_col: str = "text"):
    """Distinct sorted gram-id array of the (small) eval set → object ref.

    Computed distributed (one pass + a distinct groupby over the eval
    set only), then pulled to ONE sorted int64 numpy array — bounded by
    the benchmark's vocabulary, not the corpus."""

    def grams(b: pa.Table) -> pa.Table:
        out = [word_ngram_set(t, n) for t in b[text_col].to_pylist()]
        flat = np.concatenate(out) if out else np.array([], dtype=np.int64)
        return pa.table({"g": pa.array(np.unique(flat), pa.int64())})

    distinct = eval_ds.map_batches(grams, batch_format="pyarrow") \
        .groupby("g").count().select_columns(["g"])
    t = collect_table(distinct, schema=_G_SCHEMA)
    allg = np.sort(t["g"].to_numpy(zero_copy_only=False))
    return ray.put(allg)


def contamination_counts(ds: ray.data.Dataset, eval_ref,
                         n: int = 3, id_col: str = "doc_id",
                         text_col: str = "text") -> ray.data.Dataset:
    """Per-doc (n_grams, n_contaminated, rate) vs the broadcast eval set.

    Stateless map over the corpus — membership via ``searchsorted``
    against the sorted eval gram array (no shuffle, no join)."""

    def score(b: pa.Table) -> pa.Table:
        ev = _get_cached(eval_ref)
        ids, totals, hits, rates = [], [], [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            g = word_ngram_set(t, n)
            if len(ev):
                idx = np.searchsorted(ev, g)
                idx[idx >= len(ev)] = len(ev) - 1
                h = int(np.count_nonzero(ev[idx] == g))
            else:
                h = 0
            ids.append(i)
            totals.append(len(g))
            hits.append(h)
            rates.append(round(h / len(g), 6) if len(g) else 0.0)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_grams": pa.array(totals, pa.int64()),
                         "n_contaminated": pa.array(hits, pa.int64()),
                         "rate": pa.array(rates, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")


def repeated_spans(ds: ray.data.Dataset, n: int = 3, min_docs: int = 2,
                   id_col: str = "doc_id", text_col: str = "text",
                   broadcast_threshold: int = 2_000_000) -> ray.data.Dataset:
    """Per-doc count of word-n-gram spans shared with >= min_docs-1
    other documents. Output: (doc_id, n_spans, n_shared).

    Plan: (gram, doc) rows → groupby(gram) distinct-doc count → the
    SHARED-gram id set (bounded by cross-doc repetition, small unless
    the corpus is boilerplate-heavy) re-attached map-side — broadcast
    semi-join below ``broadcast_threshold``, distributed hash join
    above."""

    def explode(b: pa.Table) -> pa.Table:
        gs, ids = [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            g = word_ngram_set(t, n)
            gs.append(g)
            ids.append(np.full(len(g), i, dtype=np.int64))
        if not gs:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64())})
        return pa.table({id_col: pa.array(np.concatenate(ids), pa.int64()),
                         "g": pa.array(np.concatenate(gs), pa.int64())})

    rows = ds.map_batches(explode, batch_format="pyarrow").materialize()
    # (gram, doc) rows are already distinct per doc (word_ngram_set is a
    # set), so a plain count per gram == distinct-doc count; counted
    # with the gated wide-key combine (agg.gated_count — gram space is
    # corpus-sized, the PERF.md per-key-Python trap)
    from aida_ray.stages.agg import gated_count
    shared = gated_count(rows.select_columns(["g"]), "g",
                         min_count=min_docs, out="n_docs") \
        .select_columns(["g"]).materialize()

    if shared.count() <= broadcast_threshold:
        t = collect_table(shared, schema=_G_SCHEMA)
        sh = np.sort(t["g"].to_numpy(zero_copy_only=False))
        sh_ref = ray.put(sh)

        def count_shared(b: pa.Table) -> pa.Table:
            s = _get_cached(sh_ref)
            ids, totals, hits = [], [], []
            for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
                g = word_ngram_set(t, n)
                if len(s):
                    idx = np.searchsorted(s, g)
                    idx[idx >= len(s)] = len(s) - 1
                    h = int(np.count_nonzero(s[idx] == g))
                else:
                    h = 0
                ids.append(i)
                totals.append(len(g))
                hits.append(h)
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "n_spans": pa.array(totals, pa.int64()),
                             "n_shared": pa.array(hits, pa.int64())})

        return ds.map_batches(count_shared, batch_format="pyarrow")

    # boilerplate-heavy fallback: tag each (gram, doc) row by membership
    # via distributed hash join, then count per doc
    from ray.data.aggregate import Count, Sum
    tagged = rows.join(
        shared.map_batches(lambda b: pa.table(
            {"g": b["g"], "is_shared": pa.array([1] * b.num_rows, pa.int64())}),
            batch_format="pyarrow"),
        join_type="left_outer", num_partitions=16, on=("g",))

    def fill(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: b[id_col],
            "is_shared": pc.fill_null(b["is_shared"], 0)})

    return tagged.map_batches(fill, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Count(), Sum("is_shared")) \
        .map_batches(lambda b: pa.table({
            id_col: b[id_col],
            "n_spans": pc.cast(b["count()"], pa.int64()),
            "n_shared": pc.cast(b["sum(is_shared)"], pa.int64())}),
            batch_format="pyarrow")


def fuzzy_contamination(ds: ray.data.Dataset,
                        is_eval,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        num_hashes: int = 64, bands: int = 16,
                        jaccard_threshold: float = 0.8) -> "pa.Table":
    """NEAR-duplicate train/eval contamination: MinHash-LSH pairs over
    the union corpus, kept only where exactly one side is an eval
    document — catches paraphrased / lightly-edited benchmark leakage
    that the exact n-gram check (:func:`contamination_counts`) misses.

    ``is_eval(ids: np.ndarray) -> np.ndarray[bool]`` marks the eval
    split (deterministic — e.g. a hash split), so no split column has
    to be materialized.  The LSH stage is the fully distributed
    :func:`aida_ray.stages.dedup.minhash_lsh_pairs` (banded buckets,
    adaptive broadcast semi-joins); candidate verification computes
    EXACT shingle Jaccard, so with the fixed-seed (64, 16) banding the
    output equals the exact cross-split pair set at any threshold
    ≥ 0.8 (capture probability at J=0.8 ≈ 1-3e-5 per pair; the
    deterministic seeds were verified complete on the test corpora).

    Returns (eval_id, train_id, jaccard) sorted, driver-small (pair
    count is bounded by true near-dup structure, not corpus size).
    """
    import pandas as pd

    from aida_ray.stages.dedup import minhash_lsh_pairs

    if text_col != "text":
        ds = ds.map_batches(
            lambda t: pa.table({id_col: t[id_col], "text": t[text_col]}),
            batch_format="pyarrow")
    pairs = minhash_lsh_pairs(ds, id_col=id_col,
                              num_hashes=num_hashes, bands=bands,
                              jaccard_threshold=jaccard_threshold)

    def cross_only(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "a" not in t.column_names:
            return pa.table({"eval_id": pa.array([], pa.int64()),
                             "train_id": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        a = t["a"].to_numpy(zero_copy_only=False).astype("int64")
        b = t["b"].to_numpy(zero_copy_only=False).astype("int64")
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        ea, eb = is_eval(a), is_eval(b)
        keep = ea != eb                      # exactly one side is eval
        a, b, j, ea = a[keep], b[keep], j[keep], ea[keep]
        return pa.table({
            "eval_id": pa.array(np.where(ea, a, b), pa.int64()),
            "train_id": pa.array(np.where(ea, b, a), pa.int64()),
            "jaccard": pa.array(j, pa.float64())})

    return collect_table(
        pairs.map_batches(cross_only, batch_format="pyarrow"),
        schema=pa.schema([("eval_id", pa.int64()),
                          ("train_id", pa.int64()),
                          ("jaccard", pa.float64())]))
