"""DSIR-style data-selection importance weights (Xie et al. 2023,
arXiv:2302.03169 "Data Selection for Language Models via Importance
Resampling").

Each document is scored by the log-likelihood ratio of a TARGET
distribution (here: the in-corpus slice ``target_col == target_value``,
e.g. English pages) against the RAW corpus distribution, both estimated
over hashed n-gram features (word unigrams + bigrams folded into
``n_buckets`` buckets — the hashing bounds the vocabulary, so the
sufficient statistics are two fixed-size integer vectors no matter the
corpus size).  High-weight documents "look like" the target slice;
:func:`aida_ray.stages.sampling.weighted_sample` over the weights is
the resampling half of the paper.

Scale shape (10^12 docs):

- Pass 1 (distributions): per-block bucket counts are MERGEABLE
  sufficient statistics — each block emits two ``n_buckets``-long int64
  vectors, reduced on the driver exactly like ``ml.pca_fit``'s
  covariance partials.  No shuffle, no per-corpus state.
- The log-ratio table is quantized to int64 micro-units (round half
  away from zero, DuckDB ``ROUND`` semantics) BEFORE any per-document
  sum, so document weights are pure integer sums — bit-identical at
  any block structure / parallelism, and expressible as plain SQL
  (the ``dsir`` CORRECTNESS row hash-matches a self-contained DuckDB
  twin: regexp tokenization, md5-prefix bucketing, the same +1/(T+B)
  smoothing).
- Pass 2 (scoring): stateless ``map_batches`` with the lr table
  broadcast once via ``ray.put``; token->bucket md5 work is memoized
  per worker process with a bounded ``lru_cache``.

Tokenization is the deliberately ASCII-explicit ``[^A-Za-z0-9]+`` split
(identical bytes-in/bytes-out under Python ``re`` and DuckDB RE2 —
unicode word classes differ between the engines).
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached

_WORD_RE = re.compile(r"[^A-Za-z0-9]+")


@lru_cache(maxsize=1 << 20)
def _bucket(tok: str, n_buckets: int) -> int:
    """md5-prefix bucket — 15 hex chars (< 2^60, sign-safe) so the SQL
    twin is CAST(CONCAT('0x', SUBSTRING(md5(tok),1,15)) AS BIGINT) % B."""
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets


def _doc_buckets(text: str, n_buckets: int) -> np.ndarray:
    toks = [t for t in _WORD_RE.split(text) if t]
    grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
    if not grams:
        return np.empty(0, np.int64)
    return np.fromiter((_bucket(g, n_buckets) for g in grams),
                       np.int64, len(grams))


def ngram_distributions(ds: ray.data.Dataset,
                        text_col: str,
                        target_col: str,
                        target_value: str,
                        n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(raw_counts, target_counts) — two B-long int64 vectors from one
    streamed pass of per-block partials."""

    def partial(b: pa.Table) -> pa.Table:
        raw = np.zeros(n_buckets, np.int64)
        tgt = np.zeros(n_buckets, np.int64)
        labels = b[target_col].to_pylist()
        for text, lab in zip(b[text_col].to_pylist(), labels):
            bs = _doc_buckets(text or "", n_buckets)
            if not len(bs):
                continue
            cnt = np.bincount(bs, minlength=n_buckets)
            raw += cnt
            if lab == target_value:
                tgt += cnt
        return pa.table({"raw": pa.array([raw]), "tgt": pa.array([tgt])})

    raw = np.zeros(n_buckets, np.int64)
    tgt = np.zeros(n_buckets, np.int64)
    for r in ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs():
        t = ray.get(r)
        if not isinstance(t, pa.Table) or t.num_rows == 0:
            continue
        for i in range(t.num_rows):
            raw += np.asarray(t["raw"][i].as_py(), np.int64)
            tgt += np.asarray(t["tgt"][i].as_py(), np.int64)
    return raw, tgt


def log_ratio_table(raw: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """int64 micro-unit quantized log-likelihood ratios with add-one
    smoothing: round(1e6 * (ln((tgt+1)/(T+B)) - ln((raw+1)/(R+B)))),
    half away from zero (DuckDB ROUND parity)."""
    B = len(raw)
    x = 1e6 * (np.log((tgt + 1.0) / (tgt.sum() + B))
               - np.log((raw + 1.0) / (raw.sum() + B)))
    out = np.round(x)
    half = np.abs(x) % 1 == 0.5
    if half.any():
        out = np.where(half, np.trunc(x) + np.sign(x), out)
    return out.astype(np.int64)


def dsir_weights(ds: ray.data.Dataset,
                 text_col: str = "text",
                 id_col: str = "doc_id",
                 target_col: str = "lang",
                 target_value: str = "en",
                 n_buckets: int = 4096) -> ray.data.Dataset:
    """(id, weight6, n_grams, weight) per document.  ``weight6`` is the
    exact int64 micro-unit log-likelihood-ratio sum; ``weight`` is the
    one float division weight6/1e6 (identical IEEE op in SQL)."""
    # both passes (distributions, scoring) read the same narrow
    # projection — materialize once so the upstream plan runs once
    ds = ds.select_columns([id_col, text_col, target_col]).materialize()
    raw, tgt = ngram_distributions(ds, text_col, target_col,
                                   target_value, n_buckets)
    lref = ray.put(log_ratio_table(raw, tgt))

    def score(b: pa.Table) -> pa.Table:
        lr6 = _get_cached(lref)
        w6 = np.zeros(b.num_rows, np.int64)
        ng = np.zeros(b.num_rows, np.int64)
        for i, text in enumerate(b[text_col].to_pylist()):
            bs = _doc_buckets(text or "", n_buckets)
            ng[i] = len(bs)
            if len(bs):
                w6[i] = int(lr6[bs].sum())
        return pa.table({
            id_col: b[id_col],
            "weight6": pa.array(w6),
            "n_grams": pa.array(ng),
            "weight": pa.array(w6 / 1e6, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow")
