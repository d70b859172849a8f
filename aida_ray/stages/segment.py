"""Topic segmentation and readability over the document stream.

- :func:`text_tiles` — TextTiling reduced to its deterministic core
  (Hearst, CL 1997: compare adjacent fixed-width token blocks, mark
  boundaries at low-similarity gaps).  Block similarity here is
  JACCARD over distinct block vocabularies (integer set math instead
  of the paper's cosine — no float threshold can flip across
  engines: the boundary rule is ``10 * inter < union``).  Stateless
  vectorized ``map_batches``: each document's text arrives whole in
  its row, so all blocks of a doc live in one batch — no shuffle.

- :func:`readability_scores` — Flesch reading-ease with a
  deterministic syllable proxy (count of ``[aeiouy]+`` groups — the
  standard public heuristic) and sentences = non-empty ``[.!?]+``
  segments (min 1).  Same stateless shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.tfidf import _doc_terms


def text_tiles(docs: ray.data.Dataset, w: int = 10,
               id_col: str = "doc_id",
               text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, gap_idx, inter, union_size, sim, is_boundary) per gap
    between consecutive ``w``-token blocks.  ``gap_idx`` g separates
    block g (tokens [g*w, (g+1)*w)) from block g+1; the final partial
    block participates.  ``sim`` = Jaccard of the two blocks' distinct
    vocabularies, rounded to 6; boundary when 10*inter < union."""

    def batch(b: pa.Table) -> pa.Table:
        df = _doc_terms(b, id_col, text_col)
        if not len(df):
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "gap_idx": pa.array([], pa.int64()),
                "inter": pa.array([], pa.int64()),
                "union_size": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
                "is_boundary": pa.array([], pa.bool_())})
        ids = df[id_col].to_numpy()
        # in-doc token position: cumcount within each contiguous run
        pos = np.arange(len(ids))
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        pos = pos - np.repeat(pos[starts],
                              np.diff(np.r_[starts, len(ids)]))
        df = df.assign(block=pos // w).drop_duplicates(
            [id_col, "block", "term"])
        sizes = df.groupby([id_col, "block"], sort=False) \
            .size().rename("n").reset_index()
        right = df.assign(block=df["block"] - 1)
        inter = df.merge(right, on=[id_col, "block", "term"]) \
            .groupby([id_col, "block"], sort=False) \
            .size().rename("i").reset_index()
        g = sizes.merge(sizes.assign(block=sizes["block"] - 1),
                        on=[id_col, "block"], suffixes=("_a", "_b"))
        g = g.merge(inter, on=[id_col, "block"], how="left")
        g["i"] = g["i"].fillna(0).astype("int64")
        g["u"] = g["n_a"] + g["n_b"] - g["i"]
        return pa.table({
            "doc_id": pa.array(g[id_col].to_numpy(), pa.int64()),
            "gap_idx": pa.array(g["block"].to_numpy(), pa.int64()),
            "inter": pa.array(g["i"].to_numpy(), pa.int64()),
            "union_size": pa.array(g["u"].to_numpy(), pa.int64()),
            "sim": pa.array(
                np.round(g["i"].to_numpy() / g["u"].to_numpy(), 6),
                pa.float64()),
            "is_boundary": pa.array(
                10 * g["i"].to_numpy() < g["u"].to_numpy(), pa.bool_())})

    return docs.map_batches(batch, batch_format="pyarrow")


_VOWEL_GROUPS = r"[aeiouy]+"
# one match per content-bearing sentence segment: starts at the first
# alnum after a [.!?] run, greedily consumes to the next delimiter
_SENT_RE = r"[a-z0-9][^.!?]*"


def readability_scores(docs: ray.data.Dataset, id_col: str = "doc_id",
                       text_col: str = "text") -> ray.data.Dataset:
    """(doc_id, n_sents, n_words, n_syllables, flesch) per document.
    flesch = 206.835 - 1.015*(words/sents) - 84.6*(syll/words),
    rounded to 6; docs with zero words emit flesch = 0.0 and
    n_sents = 1 (the min-1 sentence floor)."""

    def batch(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype("int64")
        low = pd.Series(
            pc.utf8_lower(b[text_col].combine_chunks()).to_pandas())
        # sentences: content-bearing [.!?]+ segments, floor 1
        n_sents = low.str.count(_SENT_RE).clip(lower=1)
        df = _doc_terms(b, id_col, text_col)
        if len(df):
            df = df.assign(
                syl=df["term"].str.count(_VOWEL_GROUPS))
            agg = df.groupby(id_col, sort=False).agg(
                n_words=("term", "size"), n_syl=("syl", "sum")) \
                .reindex(ids, fill_value=0)
        else:
            agg = pd.DataFrame(0, index=ids,
                               columns=["n_words", "n_syl"])
        nw = agg["n_words"].to_numpy(dtype="int64")
        ns = agg["n_syl"].to_numpy(dtype="int64")
        st = n_sents.to_numpy(dtype="int64")
        wz = nw > 0
        nwf = np.where(wz, nw, 1).astype("float64")
        flesch = np.where(
            wz,
            np.round(206.835 - 1.015 * (nwf / st) - 84.6 * (ns / nwf),
                     6),
            0.0)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_sents": pa.array(st, pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
            "n_syllables": pa.array(ns, pa.int64()),
            "flesch": pa.array(flesch, pa.float64())})

    return docs.map_batches(batch, batch_format="pyarrow")
