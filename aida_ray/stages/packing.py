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
