"""Sequence packing for LLM pre-training (concat-and-cut layout).

Documents are concatenated in a deterministic order and cut into
fixed-length token windows (the standard GPT-style packing: no padding,
documents may straddle a window boundary).  To make the layout
independent of Ray's block boundaries — and resumable — packing is
namespaced by a fixed-size ID BUCKET: bucket = doc_id // bucket_size.
Each bucket packs its own documents in doc_id order, and global
sequence ids are (bucket, local_seq).  Buckets are independent, so the
operator is one ``groupby(bucket).map_groups`` whose per-group work is
a numpy cumsum — at 10^12 docs the buckets shard the corpus into
uniform, skew-free groups of exactly ``bucket_size`` ids.

Output: one row per document — (doc_id, bucket, n_tokens, seq_start,
seq_end, offset) where seq_* are the first/last window indices the
document's tokens land in and offset is the position of its first token
within seq_start.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def pack_sequences(ds: ray.data.Dataset, seq_len: int = 512,
                   bucket_size: int = 1000,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> ray.data.Dataset:
    """Deterministic concat-and-cut packing layout per id bucket."""

    def count_tokens(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(pc.split_pattern(b[text_col], " "))
        bucket = pc.divide(pc.cast(b[id_col], pa.int64()), bucket_size)
        return pa.table({id_col: b[id_col],
                         "bucket": pc.cast(bucket, pa.int64()),
                         "n_tokens": pc.cast(n, pa.int64())})

    def pack(g):
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        start = np.concatenate([[0], np.cumsum(n)[:-1]])
        end = start + np.maximum(n, 1) - 1  # empty doc occupies its slot pos
        g["seq_start"] = start // seq_len
        g["seq_end"] = end // seq_len
        g["tok_offset"] = start % seq_len
        return g

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")
    return counted.groupby("bucket").map_groups(pack, batch_format="pandas")


def chunk_documents(ds: ray.data.Dataset, chunk_size: int = 32,
                    stride: int = 24, text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Sliding-window document chunking for training (RAG/pre-training
    prep): each document yields token windows of ``chunk_size`` every
    ``stride`` tokens — ``1 + ceil(max(n − chunk_size, 0)/stride)``
    chunks, the last one shorter.  A pure flat_map: no state, no
    shuffle, embarrassingly parallel at any corpus size.

    Tokenization is whitespace split (the corpus is already
    single-space normalized); chunk boundaries are deterministic
    functions of the token count, so the DuckDB oracle reproduces the
    exact same windows with ``string_split`` + ``generate_series``."""
    assert stride >= 1 and chunk_size >= 1

    def explode(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b[text_col], " ").combine_chunks()
        lengths = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype("int64")
        n_chunks = 1 + (np.maximum(lengths - chunk_size, 0)
                        + stride - 1) // stride
        doc_idx = np.repeat(np.arange(len(b)), n_chunks)
        chunk_idx = np.concatenate(
            [np.arange(k) for k in n_chunks]) if len(b) else \
            np.empty(0, np.int64)
        ids = b[id_col].to_numpy(zero_copy_only=False)[doc_idx]
        starts = chunk_idx * stride
        ends = np.minimum(starts + chunk_size, lengths[doc_idx])
        tok_lists = toks.to_pylist()
        texts = [" ".join(tok_lists[d][s:e])
                 for d, s, e in zip(doc_idx, starts, ends)]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "chunk_text": pa.array(texts, pa.string()),
            "n_chunk_tokens": pa.array(ends - starts, pa.int64())})

    return ds.map_batches(explode, batch_format="pyarrow")
