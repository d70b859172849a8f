"""Exact substring (duplicated k-gram span) dedup coverage.

The training-data signal from "Deduplicating Training Data Makes
Language Models Better" (Lee et al., 2022): for every document, how
many token positions are covered by a word k-gram that occurs ≥ 2
times in the corpus (ExactSubstr).  Pipelines drop or trim documents
whose covered fraction is high.

Scale shape — nothing is ever per-row Python and nothing doc-bounded
is materialized on the driver:

1. **occurrences** (map-only): Arrow ``split_pattern`` tokenizes each
   batch, token hashes come from one vectorized pass, and k-gram
   hashes are k shifted uint64 multiply-adds over the FLAT token-hash
   array (positions whose gram would straddle a document boundary are
   masked out) — O(k) numpy ops per batch regardless of row count.
2. **gram counts**: per-batch partial ``np.unique`` counts, then one
   groupby-Sum whose shuffle ships distinct gram hashes per block —
   vocabulary-of-grams volume, not corpus volume.
3. **duplicated-gram semi-join**: the (count ≥ min_count) gram-hash
   set re-attaches by broadcast ``pc.is_in`` when it fits the
   broadcast budget, by a distributed hash join above it.
4. **interval-union coverage**: dup-gram start rows range-shuffle by
   ``sort(doc_id)``; every batch unions the intervals of its fully
   contained docs in ONE vectorized pass (packed (doc, pos) keys +
   ``np.add.reduceat`` — no per-doc Python), and the ≤ 2 boundary
   docs per batch close in one small task (same plan as
   ``graphs.cooccurrence_edges``).
5. per-doc token counts union in and one groupby-Sum emits
   (doc_id, n_tokens, dup_covered) — zero-coverage docs included.

Grams compare by a 64-bit rolling hash of token hashes (collisions
~ |grams|²/2⁶⁴ — negligible; swap the string gram in if exactness at
10¹⁰ distinct grams matters).  Positions pack into the low 20 bits of
an int64 alongside the doc id, bounding documents at 2^20 tokens and
doc ids at 2^43 — both documented, both far above web-page reality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _concat_blocks, _get_cached

_POS_BITS = 20
_POS_MASK = (1 << _POS_BITS) - 1
_HASH_MULT = np.uint64(0x9E3779B97F4A7C15)


def _tokenize_flat(b: pa.Table, id_col: str, text_col: str):
    """Flat token-hash array + per-token (doc id, in-doc position,
    doc length) — all vectorized.  Tokenization is a plain
    single-space split (``string_split(text, ' ')`` in the oracle)."""
    lists = pc.split_pattern(b[text_col].combine_chunks(), pattern=" ")
    lengths = pc.list_value_length(lists).to_numpy(zero_copy_only=False) \
        .astype("int64")
    ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), lengths)
    h = pd.util.hash_pandas_object(lists.flatten().to_pandas(),
                                   index=False).to_numpy(dtype="uint64")
    doc_start = np.repeat(np.cumsum(lengths) - lengths, lengths)
    pos = np.arange(len(h), dtype="int64") - doc_start
    doclen = np.repeat(lengths, lengths)
    return ids, pos, doclen, h, lengths


def _coverage_batch(d: np.ndarray, p: np.ndarray, k: int):
    """Per-doc union length of the intervals [p, p+k) — one vectorized
    pass over packed (doc << 20 | pos) keys.  ``d`` need not be
    sorted; duplicates fine."""
    if len(d) == 0:
        return np.empty(0, "int64"), np.empty(0, "int64")
    u = np.unique((d.astype("int64") << _POS_BITS) | p)
    du, pu = u >> _POS_BITS, u & _POS_MASK
    # contribution of each start: gap to next start in the same doc,
    # capped at k; the doc's last start contributes k
    same = du[1:] == du[:-1]
    contrib = np.full(len(u), k, dtype="int64")
    contrib[:-1][same] = np.minimum(np.diff(pu)[same], k)
    starts = np.flatnonzero(np.r_[True, ~same])
    return du[starts], np.add.reduceat(contrib, starts)


def _dup_start_rows(ds: ray.data.Dataset, k: int, min_count: int,
                    id_col: str, text_col: str, broadcast_rows: int,
                    task_gate_rows: int = 20_000_000
                    ) -> ray.data.Dataset:
    """(id, pos) rows of every position starting a corpus-duplicated
    word k-gram — steps 1-3 of the module plan, shared by the coverage
    signal and the trim action."""
    from ray.data.aggregate import Sum

    def occurrences(b: pa.Table) -> pa.Table:
        ids, pos, doclen, h, _ = _tokenize_flat(b, id_col, text_col)
        gh = np.zeros(len(h), dtype="uint64")
        mult = np.uint64(1)
        for j in range(k):
            m = max(len(h) - j, 0)      # blocks shorter than k grams
            gh[:m] += h[j:j + m] * mult
            mult = mult * _HASH_MULT
        keep = pos + k <= doclen
        return pa.table({
            id_col: pa.array(ids[keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int64()),
            "gh": pa.array(gh[keep].view("int64"), pa.int64())})

    occ = ds.map_batches(occurrences, batch_format="pyarrow") \
        .materialize()                     # reused: counts + semi-join

    def count_partial(b: pa.Table) -> pa.Table:
        gh, n = np.unique(b["gh"].to_numpy(zero_copy_only=False),
                          return_counts=True)
        return pa.table({"gh": pa.array(gh, pa.int64()),
                         "n": pa.array(n.astype("int64"))})

    counts = occ.map_batches(count_partial,
                             batch_format="pyarrow").materialize()
    if counts.count() <= task_gate_rows:
        # gram-vocabulary × blocks fits one task: sorted reduceat sum
        # (Ray's sort-based Aggregate pays Python-per-key — ruinous at
        # 10^5+ distinct grams); the groupby route runs above the gate
        @ray.remote
        def sum_task(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema(
                [("gh", pa.int64()), ("n", pa.int64())]))
            gh = t["gh"].to_numpy(zero_copy_only=False)
            n = t["n"].to_numpy(zero_copy_only=False)
            o = np.argsort(gh, kind="stable")
            gh, n = gh[o], n[o]
            starts = np.flatnonzero(np.r_[True, gh[1:] != gh[:-1]]) \
                if len(gh) else np.empty(0, dtype="int64")
            tot = np.add.reduceat(n, starts) if len(starts) \
                else np.empty(0, dtype="int64")
            keep = tot >= min_count
            return pa.table({"gh": pa.array(gh[starts][keep],
                                            pa.int64())})

        dup = ray.data.from_arrow_refs(
            [sum_task.remote(*counts.to_arrow_refs())]).materialize()
    else:
        # unbounded gram space: bucketed combine (P vectorized calls,
        # no per-key Python — stages/agg.py)
        from aida_ray.stages.agg import bucket_reduce
        dup = bucket_reduce(counts, ["gh"], {"n": "sum"}) \
            .map_batches(lambda t: pa.table({
                "gh": pc.cast(t["gh"], pa.int64()),
                "n": pc.cast(t["n"], pa.int64())}),
                batch_format="pyarrow") \
            .filter(expr=f"n >= {min_count}") \
            .select_columns(["gh"]).materialize()

    if dup.count() <= broadcast_rows:
        dup_tbl = _concat_blocks(
            [ray.get(r) for r in dup.to_arrow_refs()],
            pa.schema([("gh", pa.int64())]))
        dup_ref = ray.put(pa.array(dup_tbl["gh"].to_numpy(
            zero_copy_only=False), pa.int64()))

        def keep_dup(b: pa.Table) -> pa.Table:
            want = _get_cached(dup_ref)
            return b.filter(pc.is_in(b["gh"], value_set=want)) \
                .select([id_col, "pos"])

        starts = occ.map_batches(keep_dup, batch_format="pyarrow")
    else:
        from aida_ray.stages.shuffle_join import hash_join
        starts = hash_join(occ, dup, on=("gh",),
                           join_type="left_semi") \
            .select_columns([id_col, "pos"])
    return starts


def dup_span_coverage(ds: ray.data.Dataset, k: int = 4,
                      min_count: int = 2, id_col: str = "doc_id",
                      text_col: str = "text",
                      broadcast_rows: int = 8_000_000,
                      task_gate_rows: int = 20_000_000
                      ) -> ray.data.Dataset:
    """(doc_id, n_tokens, dup_covered): token positions covered by a
    word ``k``-gram occurring ≥ ``min_count`` times corpus-wide."""
    from ray.data.aggregate import Sum

    starts = _dup_start_rows(ds, k, min_count, id_col, text_col,
                             broadcast_rows, task_gate_rows)
    srt = starts.sort(id_col).materialize()

    def inner_cov(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False)
        p = b["pos"].to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "covered": pa.array([], pa.int64())})
        keep = (d != d[0]) & (d != d[-1])
        docs, cov = _coverage_batch(d[keep], p[keep], k)
        return pa.table({id_col: pa.array(docs, pa.int64()),
                         "covered": pa.array(cov, pa.int64())})

    def boundary(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False)
        p = b["pos"].to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        keep = (d == d[0]) | (d == d[-1])
        return pa.table({id_col: pa.array(d[keep].astype("int64")),
                         "pos": pa.array(p[keep].astype("int64"))})

    @ray.remote
    def close_boundaries(*tabs: pa.Table) -> pa.Table:
        t = _concat_blocks(tabs, pa.schema(
            [(id_col, pa.int64()), ("pos", pa.int64())]))
        docs, cov = _coverage_batch(
            t[id_col].to_numpy(zero_copy_only=False),
            t["pos"].to_numpy(zero_copy_only=False), k)
        return pa.table({id_col: pa.array(docs, pa.int64()),
                         "covered": pa.array(cov, pa.int64())})

    inner = srt.map_batches(inner_cov, batch_format="pyarrow")
    brefs = srt.map_batches(boundary,
                            batch_format="pyarrow").to_arrow_refs()
    bcov = ray.data.from_arrow_refs([close_boundaries.remote(*brefs)]) \
        if brefs else ray.data.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()),
                      "covered": pa.array([], pa.int64())}))

    def tok_counts(b: pa.Table) -> pa.Table:
        lists = pc.split_pattern(b[text_col].combine_chunks(),
                                 pattern=" ")
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "n_tokens": pc.cast(pc.list_value_length(lists), pa.int64()),
            "covered": pa.array(np.zeros(b.num_rows, dtype="int64"))})

    def pad(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "n_tokens": pa.array(np.zeros(b.num_rows, dtype="int64")),
            "covered": pc.cast(b["covered"], pa.int64())})

    both = ds.map_batches(tok_counts, batch_format="pyarrow") \
        .union(inner.union(bcov).map_batches(pad,
                                             batch_format="pyarrow")) \
        .materialize()

    if both.count() <= task_gate_rows:
        # docs × blocks fits one task — same gated finisher as the
        # gram counts (per-key Python in the groupby dominates here)
        @ray.remote
        def merge_task(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema(
                [(id_col, pa.int64()), ("n_tokens", pa.int64()),
                 ("covered", pa.int64())]))
            d = t[id_col].to_numpy(zero_copy_only=False)
            nt = t["n_tokens"].to_numpy(zero_copy_only=False)
            cv = t["covered"].to_numpy(zero_copy_only=False)
            o = np.argsort(d, kind="stable")
            d, nt, cv = d[o], nt[o], cv[o]
            starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]]) \
                if len(d) else np.empty(0, dtype="int64")
            return pa.table({
                id_col: pa.array(d[starts].astype("int64")),
                "n_tokens": pa.array(np.add.reduceat(nt, starts)
                                     if len(starts) else nt,
                                     pa.int64()),
                "dup_covered": pa.array(np.add.reduceat(cv, starts)
                                        if len(starts) else cv,
                                        pa.int64())})

        return ray.data.from_arrow_refs(
            [merge_task.remote(*both.to_arrow_refs())])

    from aida_ray.stages.agg import bucket_reduce
    agg = bucket_reduce(both, [id_col],
                        {"n_tokens": "sum", "covered": "sum"})

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "n_tokens": pc.cast(b["n_tokens"], pa.int64()),
            "dup_covered": pc.cast(b["covered"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def dup_span_trim(ds: ray.data.Dataset, k: int = 4,
                  min_count: int = 2, id_col: str = "doc_id",
                  text_col: str = "text",
                  broadcast_rows: int = 8_000_000,
                  task_gate_rows: int = 20_000_000) -> ray.data.Dataset:
    """ExactSubstr dedup as an ACTION: remove every token covered by a
    corpus-duplicated word k-gram and re-emit the trimmed text —
    (doc_id, text_kept, n_removed).

    Each document's text must meet its duplicated-span starts once:
    text rows (pos = −1, payload = text) and start rows union and
    range-shuffle by ``sort((doc_id, pos))`` — a doc's run therefore
    begins with its text row.  Each batch rebuilds its fully contained
    docs in one pass (per-doc cover marking is a vectorized ±1
    difference array + cumsum; per-doc map_groups dispatch is the
    pathology PERF.md rules out), and the ≤ 2 boundary docs per batch
    close in one small task — the module's standard plan.  Shuffle
    volume = corpus text once + dup starts — the same bill exact_dedup
    pays to recover representative text."""
    starts = _dup_start_rows(ds, k, min_count, id_col, text_col,
                             broadcast_rows, task_gate_rows)

    def text_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "pos": pa.array(np.full(b.num_rows, -1, dtype="int64")),
            "payload": b[text_col]})

    def start_rows(b: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pc.cast(b[id_col], pa.int64()),
            "pos": pc.cast(b["pos"], pa.int64()),
            "payload": pa.array([""] * b.num_rows)})

    srt = ds.map_batches(text_rows, batch_format="pyarrow") \
        .union(starts.map_batches(start_rows, batch_format="pyarrow")) \
        .sort([id_col, "pos"]).materialize()

    def rebuild_runs(d: np.ndarray, p: np.ndarray,
                     pay: np.ndarray) -> pa.Table:
        ids, texts, removed = [], [], []
        if len(d):
            run_starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
            run_ends = np.r_[run_starts[1:], len(d)]
            for s, e in zip(run_starts, run_ends):
                # sorted by pos → the doc's text row (pos −1) is first
                toks = np.array(pay[s].split(" "), dtype=object)
                n = len(toks)
                sp = p[s + 1:e]
                diff = np.zeros(n + 1, dtype="int64")
                np.add.at(diff, sp, 1)
                np.add.at(diff, np.minimum(sp + k, n), -1)
                covered = np.cumsum(diff[:-1]) > 0
                ids.append(int(d[s]))
                texts.append(" ".join(toks[~covered]))
                removed.append(int(covered.sum()))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "text_kept": pa.array(texts, pa.string()),
            "n_removed": pa.array(removed, pa.int64())})

    def inner(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return rebuild_runs(d, d, d)
        keep = (d != d[0]) & (d != d[-1])
        return rebuild_runs(
            d[keep], b["pos"].to_numpy(zero_copy_only=False)[keep],
            np.asarray(b["payload"].to_pylist(), dtype=object)[keep])

    def boundary(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "payload": pa.array([], pa.string())})
        keep = (d == d[0]) | (d == d[-1])
        mask = pa.array(keep)
        return pa.table({
            id_col: pa.array(d[keep], pa.int64()),
            "pos": pc.array_filter(b["pos"].combine_chunks(), mask),
            "payload": pc.array_filter(b["payload"].combine_chunks(),
                                       mask)})

    @ray.remote
    def close_boundaries(*tabs: pa.Table) -> pa.Table:
        t = _concat_blocks(tabs, pa.schema(
            [(id_col, pa.int64()), ("pos", pa.int64()),
             ("payload", pa.string())]))
        d = t[id_col].to_numpy(zero_copy_only=False)
        p = t["pos"].to_numpy(zero_copy_only=False)
        o = np.lexsort((p, d))
        return rebuild_runs(
            d[o], p[o],
            np.asarray(t["payload"].to_pylist(), dtype=object)[o])

    brefs = srt.map_batches(boundary,
                            batch_format="pyarrow").to_arrow_refs()
    bpart = ray.data.from_arrow_refs(
        [close_boundaries.remote(*brefs)]) if brefs \
        else ray.data.from_arrow(pa.table(
            {id_col: pa.array([], pa.int64()),
             "text_kept": pa.array([], pa.string()),
             "n_removed": pa.array([], pa.int64())}))
    return srt.map_batches(inner, batch_format="pyarrow").union(bpart)
