"""Repetition / quality filter rules for web-text training corpora
(Gopher- / C4-style heuristics, from the published rule lists in
Rae et al. 2021 §A1.1 and Raffel et al. 2020 §2.2 — public knowledge).

Per document: token count, mean word length, most-frequent-token
fraction, most-frequent-bigram fraction, and a ``keep`` flag from
fixed thresholds.  Everything is computed on an EXPLODED arrow/pandas
frame per batch (C-level groupbys over (row, token) pairs — no Python
loop over rows), so a batch of thousands of documents costs a handful
of vectorized kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# fixed, documented thresholds (Gopher-flavored, adapted to short docs)
MIN_TOKENS = 5
MAX_TOKENS = 100_000
MAX_TOP_TOKEN_FRAC = 0.20
MAX_TOP_BIGRAM_FRAC = 0.15
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0


def quality_rules_batch(batch: pa.Table, text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    toks = pc.split_pattern(batch[text_col], " ")
    lens = pc.list_value_length(toks).to_numpy()
    flat = pc.list_flatten(toks).to_pandas()
    row = np.repeat(np.arange(len(batch)), lens)

    df = pd.DataFrame({"row": row, "tok": flat})
    n_tokens = pd.Series(lens, index=np.arange(len(batch)))
    # mean word length over all tokens of the doc
    df["wlen"] = df["tok"].str.len()
    mean_len = df.groupby("row")["wlen"].mean().reindex(
        np.arange(len(batch)), fill_value=0.0)
    # most-frequent unigram count per doc
    uni = df.groupby(["row", "tok"]).size().groupby("row").max().reindex(
        np.arange(len(batch)), fill_value=0)
    # most-frequent bigram count per doc (join token i with token i+1)
    df["nxt"] = df["tok"].shift(-1)
    df["nrow"] = df["row"].shift(-1)
    bi = df[df["row"] == df["nrow"]]
    big = bi.groupby(["row", "tok", "nxt"]).size().groupby("row").max() \
        .reindex(np.arange(len(batch)), fill_value=0)

    n = n_tokens.to_numpy().astype(np.int64)
    top_tok = np.where(n > 0, uni.to_numpy() / np.maximum(n, 1), 0.0)
    nbi = np.maximum(n - 1, 0)
    top_big = np.where(nbi > 0, big.to_numpy() / np.maximum(nbi, 1), 0.0)
    ml = mean_len.to_numpy()
    keep = ((n >= MIN_TOKENS) & (n <= MAX_TOKENS)
            & (top_tok <= MAX_TOP_TOKEN_FRAC)
            & (top_big <= MAX_TOP_BIGRAM_FRAC)
            & (ml >= MIN_MEAN_WORD_LEN) & (ml <= MAX_MEAN_WORD_LEN))
    return pa.table({
        id_col: batch[id_col],
        "n_tokens": pa.array(n, pa.int64()),
        "mean_word_len": pa.array(np.round(ml, 6), pa.float64()),
        "top_token_frac": pa.array(np.round(top_tok, 6), pa.float64()),
        "top_bigram_frac": pa.array(np.round(top_big, 6), pa.float64()),
        "keep": pa.array(keep, pa.bool_()),
    })


def quality_rules(ds: ray.data.Dataset, text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Streaming per-doc repetition/quality metrics + keep flag."""
    return ds.map_batches(
        lambda b: quality_rules_batch(b, text_col, id_col),
        batch_format="pyarrow")
