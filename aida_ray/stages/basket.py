"""Market-basket analytics: association rules and "also bought".

Pair supports come from the same range-partitioned batch-local basket
sweep as ``graphs.cooccurrence_edges`` (one ``sort(group)`` shuffle,
``np.triu_indices`` per fully-contained basket, a boundary-sliver
closer task) — but COUNTED per pair across baskets rather than
deduplicated.  Pair counts finish through the gated adaptive combine:
one numpy task below the volume gate, :func:`agg.bucket_reduce`
above.  Item supports and the basket count ride the same distinct
(basket, item) table.  Rules attach supports via a broadcast
(item-bounded) lookup — confidence and lift are computed map-side
with zero extra shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _concat_blocks, _get_cached

_ITEM_BITS = 21
_ITEM_MASK = (1 << _ITEM_BITS) - 1


def _distinct_basket_items(ds: ray.data.Dataset, group_col: str,
                           item_col: str,
                           max_item: int | None) -> ray.data.Dataset:
    """Globally distinct (basket, item) rows as packed int64 keys —
    block-local distinct then one groupby dedups across blocks."""
    def pack(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False).astype("int64")
        i = b[item_col].to_numpy(zero_copy_only=False).astype("int64")
        if max_item is not None:
            keep = i < max_item
            g, i = g[keep], i[keep]
        # packing bounds: items < 2^21 and non-negative (−1 is the
        # support sentinel), baskets < 2^42 — silent bit overlap would
        # corrupt pairs/supports otherwise
        assert i.min(initial=0) >= 0 \
            and i.max(initial=0) < (1 << _ITEM_BITS) \
            and g.max(initial=0) < (1 << (63 - _ITEM_BITS))
        return pa.table({"p": pa.array(
            np.unique((g << _ITEM_BITS) | i), pa.int64())})

    from aida_ray.stages.agg import gated_count
    return gated_count(ds.map_batches(pack, batch_format="pyarrow"),
                       "p").select_columns(["p"])


def market_basket_rules(ds: ray.data.Dataset, group_col: str,
                        item_col: str, max_item: int | None = None,
                        min_support: int = 3,
                        task_gate_rows: int = 20_000_000
                        ) -> ray.data.Dataset:
    """(a, b, n_ab, conf_ab, lift) for item pairs co-occurring in ≥
    ``min_support`` baskets (a < b); conf_ab = P(b|a), lift =
    N·n_ab/(n_a·n_b) over the distinct-basket universe N."""
    bi = _distinct_basket_items(ds, group_col, item_col, max_item) \
        .materialize()

    # item supports + basket count from the packed table (map partials
    # + one tiny groupby — item space is bounded)
    def sup_partial(b: pa.Table) -> pa.Table:
        p = b["p"].to_numpy(zero_copy_only=False)
        items, n = np.unique(p & _ITEM_MASK, return_counts=True)
        baskets = np.unique(p >> _ITEM_BITS)
        return pa.table({
            "i": pa.array(np.r_[items, [-1]], pa.int64()),
            "n": pa.array(np.r_[n.astype("int64"),
                                [len(baskets)]], pa.int64())})

    from ray.data.aggregate import Sum
    sup = _concat_blocks(
        [ray.get(r) for r in bi.map_batches(
            sup_partial, batch_format="pyarrow").to_arrow_refs()],
        pa.schema([("i", pa.int64()), ("n", pa.int64())]))
    si = sup["i"].to_numpy(zero_copy_only=False)
    sn = sup["n"].to_numpy(zero_copy_only=False)
    order = np.argsort(si, kind="stable")
    si, sn = si[order], sn[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    item_ids = si[starts]
    item_n = np.add.reduceat(sn, starts)
    # the basket partial (-1 rows) OVERCOUNTS baskets split across
    # blocks — recount exactly from the distinct basket ids
    def basket_partial(b: pa.Table) -> pa.Table:
        return pa.table({"b": pa.array(np.unique(
            b["p"].to_numpy(zero_copy_only=False) >> _ITEM_BITS),
            pa.int64())})

    from aida_ray.stages.agg import gated_count
    n_baskets = gated_count(
        bi.map_batches(basket_partial, batch_format="pyarrow"),
        "b").count()
    item_ids, item_n = item_ids[item_ids >= 0], item_n[item_ids >= 0]
    sup_ref = ray.put((item_ids, item_n))

    # pair counts: sort by basket, batch-local triu per contained
    # basket, boundary closer; then gated count combine
    srt = bi.map_batches(lambda b: pa.table({
        "g": pa.array(b["p"].to_numpy(zero_copy_only=False)
                      >> _ITEM_BITS, pa.int64()),
        "i": pa.array(b["p"].to_numpy(zero_copy_only=False)
                      & _ITEM_MASK, pa.int64())}),
        batch_format="pyarrow").sort("g").materialize()

    def pairs_of(g: np.ndarray, it: np.ndarray) -> np.ndarray:
        if len(g) == 0:
            return np.empty(0, dtype="int64")
        starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
        ends = np.r_[starts[1:], len(g)]
        out = []
        for s, e in zip(starts, ends):
            items = np.unique(it[s:e])
            if len(items) >= 2:
                iu, ju = np.triu_indices(len(items), k=1)
                out.append((items[iu] << _ITEM_BITS) | items[ju])
        return np.concatenate(out) if out \
            else np.empty(0, dtype="int64")

    def inner_pairs(b: pa.Table) -> pa.Table:
        g = b["g"].to_numpy(zero_copy_only=False)
        it = b["i"].to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return pa.table({"ab": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        keep = (g != g[0]) & (g != g[-1])
        ab, n = np.unique(pairs_of(g[keep], it[keep]),
                          return_counts=True)
        return pa.table({"ab": pa.array(ab, pa.int64()),
                         "n": pa.array(n.astype("int64"))})

    def boundary(b: pa.Table) -> pa.Table:
        g = b["g"].to_numpy(zero_copy_only=False)
        it = b["i"].to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64())})
        keep = (g == g[0]) | (g == g[-1])
        return pa.table({"g": pa.array(g[keep], pa.int64()),
                         "i": pa.array(it[keep], pa.int64())})

    @ray.remote
    def close_boundaries(*tabs: pa.Table) -> pa.Table:
        t = _concat_blocks(tabs, pa.schema(
            [("g", pa.int64()), ("i", pa.int64())]))
        g = t["g"].to_numpy(zero_copy_only=False)
        o = np.argsort(g, kind="stable")
        ab, n = np.unique(pairs_of(
            g[o], t["i"].to_numpy(zero_copy_only=False)[o]),
            return_counts=True)
        return pa.table({"ab": pa.array(ab, pa.int64()),
                         "n": pa.array(n.astype("int64"))})

    inner = srt.map_batches(inner_pairs, batch_format="pyarrow")
    brefs = srt.map_batches(boundary,
                            batch_format="pyarrow").to_arrow_refs()
    bcounts = ray.data.from_arrow_refs(
        [close_boundaries.remote(*brefs)]) if brefs \
        else ray.data.from_arrow(pa.table(
            {"ab": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}))
    counts = inner.union(bcounts).materialize()

    if counts.count() <= task_gate_rows:
        @ray.remote
        def combine(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema(
                [("ab", pa.int64()), ("n", pa.int64())]))
            ab = t["ab"].to_numpy(zero_copy_only=False)
            n = t["n"].to_numpy(zero_copy_only=False)
            o = np.argsort(ab, kind="stable")
            ab, n = ab[o], n[o]
            starts = np.flatnonzero(np.r_[True, ab[1:] != ab[:-1]]) \
                if len(ab) else np.empty(0, dtype="int64")
            tot = np.add.reduceat(n, starts) if len(starts) \
                else np.empty(0, dtype="int64")
            return pa.table({"ab": pa.array(ab[starts], pa.int64()),
                             "n_ab": pa.array(tot, pa.int64())})

        pair_counts = ray.data.from_arrow_refs(
            [combine.remote(*counts.to_arrow_refs())])
    else:
        from aida_ray.stages.agg import bucket_reduce
        pair_counts = bucket_reduce(counts, ["ab"], {"n": "sum"}) \
            .map_batches(lambda t: pa.table({
                "ab": pc.cast(t["ab"], pa.int64()),
                "n_ab": pc.cast(t["n"], pa.int64())}),
                batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        ids, n_items = _get_cached(sup_ref)
        t = b.filter(pc.greater_equal(b["n_ab"],
                                      pa.scalar(min_support)))
        ab = t["ab"].to_numpy(zero_copy_only=False)
        n_ab = t["n_ab"].to_numpy(zero_copy_only=False) \
            .astype("float64")
        a, bb = ab >> _ITEM_BITS, ab & _ITEM_MASK
        na = n_items[np.searchsorted(ids, a)].astype("float64")
        nb = n_items[np.searchsorted(ids, bb)].astype("float64")
        return pa.table({
            "a": pa.array(a, pa.int64()),
            "b": pa.array(bb, pa.int64()),
            "n_ab": pa.array(n_ab.astype("int64")),
            "conf_ab": pa.array(np.round(n_ab / na, 6), pa.float64()),
            "lift": pa.array(np.round(n_baskets * n_ab / (na * nb), 6),
                             pa.float64())})

    return pair_counts.map_batches(finish, batch_format="pyarrow")
