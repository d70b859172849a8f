"""DIPRE/Snowball-style relation bootstrapping.

The classic pattern-induction loop (Brin's DIPRE, Agichtein &
Gravano's Snowball — public methodology): a handful of seed entity
PAIRS find the textual patterns that connect them ("X works at Y"),
and the mined patterns then extract NEW pairs from the rest of the
corpus — KG construction's cheapest relation extractor when no
trained model exists.

Both halves are deterministic here (exact middle-string patterns,
regex entity recognizer) so results are oracle-comparable; a
production loop adds confidence weighting and iteration, which
compose from these two stages plus fuse.noisy_or_fuse.

Scale shape: seeds and mined patterns broadcast (both tiny by
construction); each half is one stateless map_batches scan over the
corpus with per-batch partial counts, so shuffles ship pattern / pair
vocabulary rows, never documents.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

DEFAULT_ENTITY_RE = r"[A-Z][A-Za-z0-9]*Q"


def _norm_ws(s: str) -> str:
    return re.sub(r"\s+", " ", s).strip()


def mine_patterns(docs: ray.data.Dataset,
                  seeds: list[tuple[str, str]],
                  id_col: str = "doc_id", text_col: str = "text",
                  max_gap: int = 60) -> ray.data.Dataset:
    """(pattern, n_support) — the whitespace-normalized middle string
    between a seed pair's mentions (x before y, gap <= ``max_gap``
    chars), counted over every occurrence in the corpus."""
    from ray.data.aggregate import Sum

    ref = ray.put(list(seeds))
    from aida_ray.stages.dedup import _get_cached

    def partial(b: pa.Table) -> pa.Table:
        sds = _get_cached(ref)
        counts: dict[str, int] = {}
        for t in b[text_col].to_pylist():
            if not t:
                continue
            for x, y in sds:
                start = 0
                while True:
                    i = t.find(x, start)
                    if i < 0:
                        break
                    j = t.find(y, i + len(x))
                    if 0 <= j - (i + len(x)) <= max_gap:
                        pat = _norm_ws(t[i + len(x):j])
                        if pat:
                            counts[pat] = counts.get(pat, 0) + 1
                    start = i + 1
        ks = sorted(counts)
        return pa.table({
            "pattern": pa.array(ks, pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby("pattern").aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({"pattern": pa.array([], pa.string()),
                             "n_support": pa.array([], pa.int64())})
        return pa.table({"pattern": b["pattern"],
                         "n_support": b["sum(n)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def apply_patterns(docs: ray.data.Dataset, patterns: list[str],
                   seeds: list[tuple[str, str]] | None = None,
                   id_col: str = "doc_id", text_col: str = "text",
                   entity_re: str = DEFAULT_ENTITY_RE
                   ) -> ray.data.Dataset:
    """(x, pattern, y, n) — NEW entity pairs connected by a mined
    pattern ("<entity> <pattern> <entity>"), seed pairs excluded,
    counted over occurrences.  ``entity_re`` recognizes mention
    spans (default: the capitalized-token-with-Q-marker grammar the
    tests plant; swap in the NER mention table for prose)."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.dedup import _get_cached

    pats = [p for p in patterns if p]
    regs = [re.compile(
        "(" + entity_re + r")\s+" + re.escape(p) + r"\s+("
        + entity_re + ")") for p in pats]
    ref = ray.put((pats, regs, set(seeds or ())))

    def partial(b: pa.Table) -> pa.Table:
        ps, rs, sds = _get_cached(ref)
        counts: dict[tuple[str, str, str], int] = {}
        for t in b[text_col].to_pylist():
            if not t:
                continue
            for p, rgx in zip(ps, rs):
                for m in rgx.finditer(t):
                    key = (m.group(1), p, m.group(2))
                    if (key[0], key[2]) in sds:
                        continue
                    counts[key] = counts.get(key, 0) + 1
        ks = sorted(counts)
        return pa.table({
            "x": pa.array([k[0] for k in ks], pa.string()),
            "pattern": pa.array([k[1] for k in ks], pa.string()),
            "y": pa.array([k[2] for k in ks], pa.string()),
            "n": pa.array([counts[k] for k in ks], pa.int64())})

    agg = docs.map_batches(partial, batch_format="pyarrow") \
        .groupby(["x", "pattern", "y"]).aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        if "sum(n)" not in b.column_names:
            return pa.table({"x": pa.array([], pa.string()),
                             "pattern": pa.array([], pa.string()),
                             "y": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"x": b["x"], "pattern": b["pattern"],
                         "y": b["y"],
                         "n": b["sum(n)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
