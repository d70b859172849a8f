"""CCNet/RefinedWeb-style line-level deduplication.

Web corpora carry boilerplate LINES (nav bars, cookie banners, footers)
repeated across many pages; removing every line whose exact text occurs
``min_count``-or-more times corpus-wide is the classic pre-training
hygiene step (CCNet does it with paragraph hashes over the whole
Common-Crawl snapshot).  The synthetic ``documents`` table has no
newline structure, so a "line" here is a deterministic K-token chunk —
the shape of the computation (corpus-wide line-hash counts, then a
per-doc rebuild) is identical.

Plan (two streaming scans, no per-row Python):

1. line rows: ``pc.split_pattern`` tokenizes each doc, offset
   arithmetic regroups the flat token stream into K-token lines, ONE
   ``pc.binary_join`` materializes line strings, and the two-lane
   vectorized polynomial hash (:func:`dedup.hash_strings62`) keys them;
   each block emits pre-aggregated ``(line_hash, count)`` partials;
2. global counts: gated single-task reduceat sum below
   ``task_gate_rows``, :func:`agg.bucket_reduce` above it (distinct
   lines are unbounded — same adaptive shape as
   ``substring._dup_start_rows``);
3. the duplicated-line set (count >= min_count, i.e. the boilerplate
   vocabulary — far smaller than the corpus) broadcasts once via
   ``ray.put`` + per-batch sorted-array membership; a hash-join
   semi-join is the above-gate fallback;
4. the second scan rebuilds each doc from its kept lines with another
   ``pc.binary_join`` — streaming, nothing corpus-sized on the driver.

At 100 TB both scans stream; the only shuffle is the line-count
combine, bounded by the distinct-line vocabulary, and the rebuilt
corpus never co-locates by anything (map-only).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _concat_blocks, _get_cached, \
    hash_strings62


def _line_arrays(b: pa.Table, id_col: str, text_col: str, k: int):
    """Vectorized doc→K-token-line explosion for one block.  Returns
    ``(doc_ids, line_idx, line_strings, lines_per_doc)`` where the
    first three are parallel per-line arrays."""
    txt = b[text_col]
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    if not pa.types.is_string(txt.type):
        txt = pc.cast(txt, pa.string())
    toks = pc.split_pattern(txt, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n = len(toks)
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    nt = offs[1:] - offs[:-1]                     # tokens per doc
    nl = (nt + k - 1) // k                        # lines per doc
    total = int(nl.sum())
    doc_rep = np.repeat(np.arange(n, dtype=np.int64), nl)
    first = np.zeros(n, dtype=np.int64)
    np.cumsum(nl[:-1], out=first[1:])
    within = np.arange(total, dtype=np.int64) - np.repeat(first, nl)
    starts = offs[:-1][doc_rep] + within * k
    # contiguous line offsets over the shared flat token values: each
    # line ends where the next starts; the final line ends the corpus
    lo = np.concatenate([starts, offs[-1:]])
    lines = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(lo, pa.int32()), toks.values),
        " ")
    ids = b[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    ids = ids.to_numpy(zero_copy_only=False)
    return ids[doc_rep], within, lines, nl


def _dup_line_hashes(ds: ray.data.Dataset, id_col: str, text_col: str,
                     k: int, min_count: int,
                     task_gate_rows: int) -> ray.data.Dataset:
    """Dataset of the line hashes occurring >= min_count times."""

    def count_partial(b: pa.Table) -> pa.Table:
        _, _, lines, _ = _line_arrays(b, id_col, text_col, k)
        h, c = np.unique(hash_strings62(lines), return_counts=True)
        return pa.table({"lh": pa.array(h, pa.int64()),
                         "n": pa.array(c.astype("int64"))})

    counts = ds.map_batches(count_partial,
                            batch_format="pyarrow").materialize()
    if counts.count() <= task_gate_rows:
        @ray.remote
        def sum_task(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema(
                [("lh", pa.int64()), ("n", pa.int64())]))
            lh = t["lh"].to_numpy(zero_copy_only=False)
            c = t["n"].to_numpy(zero_copy_only=False)
            o = np.argsort(lh, kind="stable")
            lh, c = lh[o], c[o]
            st = np.flatnonzero(np.r_[True, lh[1:] != lh[:-1]]) \
                if len(lh) else np.empty(0, dtype="int64")
            tot = np.add.reduceat(c, st) if len(st) \
                else np.empty(0, dtype="int64")
            keep = tot >= min_count
            return pa.table({"lh": pa.array(lh[st][keep], pa.int64())})

        return ray.data.from_arrow_refs(
            [sum_task.remote(*counts.to_arrow_refs())]).materialize()
    from aida_ray.stages.agg import bucket_reduce
    return bucket_reduce(counts, ["lh"], {"n": "sum"}) \
        .filter(expr=f"n >= {min_count}") \
        .map_batches(lambda t: pa.table(
            {"lh": pc.cast(t["lh"], pa.int64())}),
            batch_format="pyarrow").materialize()


def line_dedup(ds: ray.data.Dataset, id_col: str = "doc_id",
               text_col: str = "text", tokens_per_line: int = 6,
               min_count: int = 2, broadcast_rows: int = 2_000_000,
               task_gate_rows: int = 20_000_000) -> ray.data.Dataset:
    """Remove every K-token line whose exact text occurs >= min_count
    times corpus-wide; returns one row per doc with
    ``(id_col, n_lines, kept_lines, text_out)`` where ``text_out`` is
    the document rebuilt from its kept lines in original order."""
    k = tokens_per_line
    dup = _dup_line_hashes(ds, id_col, text_col, k, min_count,
                           task_gate_rows)

    if dup.count() <= broadcast_rows:
        dup_tbl = _concat_blocks([ray.get(r) for r in
                                  dup.to_arrow_refs()],
                                 pa.schema([("lh", pa.int64())]))
        dup_ref = ray.put(np.sort(
            dup_tbl["lh"].to_numpy(zero_copy_only=False)))

        def rebuild(b: pa.Table) -> pa.Table:
            want = _get_cached(dup_ref)
            ids, _, lines, nl = _line_arrays(b, id_col, text_col, k)
            h = hash_strings62(lines)
            if len(want):
                # sorted-array membership: no per-batch hash-set build
                pos = np.searchsorted(want, h)
                pos[pos == len(want)] = 0
                keep = want[pos] != h
            else:
                keep = np.ones(len(h), dtype=bool)
            n_docs = len(nl)
            doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), nl)
            kept_per_doc = np.bincount(doc_rep[keep], minlength=n_docs)
            ko = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(kept_per_doc, out=ko[1:])
            kept_lines = lines.filter(pa.array(keep))
            text_out = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(ko, pa.int32()),
                                         kept_lines), " ")
            uid = b[id_col]
            if isinstance(uid, pa.ChunkedArray):
                uid = uid.combine_chunks()
            return pa.table({
                id_col: uid,
                "n_lines": pa.array(nl, pa.int64()),
                "kept_lines": pa.array(kept_per_doc.astype("int64")),
                "text_out": text_out})

        return ds.map_batches(rebuild, batch_format="pyarrow")

    # above-gate fallback: the boilerplate vocabulary itself is too big
    # to broadcast — anti-join line rows against it, then regroup by doc
    from aida_ray.stages.shuffle_join import hash_join

    def line_rows(b: pa.Table) -> pa.Table:
        ids, li, lines, nl = _line_arrays(b, id_col, text_col, k)
        doc_rep_nl = np.repeat(nl, nl)   # n_lines rides every line row
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "li": pa.array(li, pa.int64()),
            "line": lines,
            "n_lines": pa.array(doc_rep_nl, pa.int64()),
            "lh": pa.array(hash_strings62(lines), pa.int64())})

    rows = ds.map_batches(line_rows, batch_format="pyarrow")
    kept = hash_join(rows, dup, on=("lh",), join_type="left_anti")

    def per_doc(g) -> "object":
        import pandas as pd
        g = g.sort_values("li")
        return pd.DataFrame({
            id_col: [g[id_col].iloc[0]],
            "n_lines": [int(g["n_lines"].iloc[0])],
            "kept_lines": [len(g)],
            "text_out": [" ".join(g["line"])]})

    # NOTE: docs whose every line was boilerplate drop out of the
    # anti-join entirely; the broadcast route keeps them with
    # kept_lines=0 / text_out="".  Callers above the gate re-attach
    # them with a left join against the doc ids if they need the
    # all-dropped rows (documented deviation; at-scale corpora do not
    # fit the all-lines-duplicated shape for entire partitions).
    return kept.groupby(id_col).map_groups(per_doc,
                                           batch_format="pandas")
