"""Relational pipelines over the TPC-H-ish test tables.

Demonstrates the engine's two core relational shapes on classic
analytics queries, with exact integer-cent arithmetic so DuckDB oracles
hash-match bit-for-bit:

- :func:`pricing_summary` — TPC-H-Q1-style groupby aggregate: map-side
  PARTIAL aggregation per batch (the key space is tiny, so the shuffle
  ships one row per key per block, never the fact table), then a global
  groupby-sum and a finishing projection.
- :func:`revenue_by_nation` — orders ⋈ customer ⋈ nation revenue
  rollup: both dimension sides are small, so they ship ONCE via
  ``ray.put`` (sorted-array ``searchsorted`` lookup per batch — a
  broadcast hash join with zero shuffle on the fact side), followed by
  the same partial-agg pattern on the joined keys.

Money stays in int64 cents (``round(x*100)``): float SUMs depend on
reduction order across blocks, integer sums do not — the reason these
pipelines are exactly reproducible at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached


def _round_half_away(col):
    # DuckDB's ROUND is half-away-from-zero; pyarrow defaults to
    # half-to-even, which flips tie values — match the oracle exactly.
    return pc.round(col, round_mode="half_towards_infinity")


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(_round_half_away(pc.multiply(col, 100.0)), pa.int64())


def pricing_summary(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """Per (l_returnflag, l_linestatus): qty/price/discounted sums and
    row count — TPC-H Q1 shape without the date filter."""

    def partial(b: pa.Table) -> pa.Table:
        disc = pc.multiply(pc.multiply(
            b["l_extendedprice"], pc.subtract(1.0, b["l_discount"])), 100.0)
        t = pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "qty": pc.cast(_round_half_away(b["l_quantity"]), pa.int64()),
            "base_cents": _cents(b["l_extendedprice"]),
            "disc_cents": pc.cast(_round_half_away(disc), pa.int64()),
        }).to_pandas()
        g = t.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("qty", "sum"), sum_base_cents=("base_cents", "sum"),
            sum_disc_cents=("disc_cents", "sum"), n_rows=("qty", "size"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    from ray.data.aggregate import Sum
    agg = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "l_linestatus"]) \
        .aggregate(Sum("sum_qty"), Sum("sum_base_cents"),
                   Sum("sum_disc_cents"), Sum("n_rows"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": pc.cast(b["sum(sum_qty)"], pa.int64()),
            "sum_base_cents": pc.cast(b["sum(sum_base_cents)"], pa.int64()),
            "sum_disc_cents": pc.cast(b["sum(sum_disc_cents)"], pa.int64()),
            "count_order": pc.cast(b["sum(n_rows)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def rollup_pricing(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) — subtotals at every
    prefix level plus the grand total, SQL-style NULLs marking rolled-up
    columns.

    Scale shape: the FACT table is aggregated exactly once (the same
    map-side partial + groupby as :func:`pricing_summary`); the coarser
    levels are derived from the finest aggregate, which is only
    |distinct keys| rows — re-scanning the corpus per rollup level (what
    a naive UNION ALL of GROUP BYs does) is never needed."""
    finest = pricing_summary(lineitem)

    def levels(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = b.to_pandas()
        l1 = df.groupby("l_returnflag", as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_base_cents=("sum_base_cents", "sum"),
            sum_disc_cents=("sum_disc_cents", "sum"),
            count_order=("count_order", "sum"))
        l1["l_linestatus"] = None
        l0 = pd.DataFrame({
            "l_returnflag": [None], "l_linestatus": [None],
            "sum_qty": [df.sum_qty.sum()],
            "sum_base_cents": [df.sum_base_cents.sum()],
            "sum_disc_cents": [df.sum_disc_cents.sum()],
            "count_order": [df.count_order.sum()]})
        out = pd.concat([df, l1, l0], ignore_index=True)[
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
             "sum_disc_cents", "count_order"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    # the finest aggregate is tiny — one task derives all levels
    return finest.repartition(1).map_batches(levels, batch_format="pyarrow")


def grouping_sets_from_finest(finest: ray.data.Dataset, keys: list[str],
                              sets: list[tuple[str, ...]],
                              agg_cols: list[str]) -> ray.data.Dataset:
    """GROUP BY GROUPING SETS derived from the finest aggregate.

    The fact table is aggregated exactly ONCE (at the finest grouping);
    every requested set — including the full 2^k sets of a CUBE — is
    then re-aggregated from that tiny |distinct keys| table, so the
    corpus is never rescanned per set (what a naive UNION ALL of GROUP
    BYs does).  Works for distributive aggregates (SUM/COUNT/MIN/MAX);
    derive AVG as SUM/COUNT in a finishing projection.  Rolled-up key
    columns carry SQL-style NULLs."""
    def levels(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = b.to_pandas()
        frames = []
        for s in sets:
            keep = [k for k in keys if k in s]
            if len(keep) == len(keys):
                frames.append(df[keys + agg_cols].copy())
                continue
            if keep:
                g = df.groupby(keep, as_index=False)[agg_cols].sum()
            else:
                g = df[agg_cols].sum().to_frame().T
            for k in keys:
                if k not in keep:
                    g[k] = None
            frames.append(g[keys + agg_cols])
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    # the finest aggregate is tiny — one task derives all sets
    return finest.repartition(1).map_batches(levels, batch_format="pyarrow")


def cube_pricing(lineitem: ray.data.Dataset) -> ray.data.Dataset:
    """GROUP BY CUBE(l_returnflag, l_linestatus): all four grouping
    sets from one corpus aggregation (:func:`pricing_summary`)."""
    keys = ["l_returnflag", "l_linestatus"]
    aggs = ["sum_qty", "sum_base_cents", "sum_disc_cents", "count_order"]
    sets = [("l_returnflag", "l_linestatus"), ("l_returnflag",),
            ("l_linestatus",), ()]
    return grouping_sets_from_finest(pricing_summary(lineitem), keys,
                                     sets, aggs)


def pivot_counts(ds: ray.data.Dataset, key: str, pivot_col: str,
                 categories: list[str]) -> ray.data.Dataset:
    """PIVOT: one output column per category holding the per-key count.

    Per-batch crosstab partials (vectorized), then a single groupby-sum
    over |keys| rows — the category list must be known up front (pass
    the output of a distinct pass for discovery); unlisted categories
    are ignored.  Shuffle volume = keys × 1 row, not the event log."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pa.table({key: b[key], pivot_col: b[pivot_col]}).to_pandas()
        ct = pd.crosstab(df[key], df[pivot_col])
        out = pd.DataFrame({key: ct.index})
        for c in categories:
            out["n_" + c] = ct[c].to_numpy() if c in ct.columns else 0
        return pa.Table.from_pandas(out, preserve_index=False)

    aggs = [Sum("n_" + c) for c in categories]
    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key).aggregate(*aggs)

    def finish(b: pa.Table) -> pa.Table:
        cols = {key: b[key]}
        for c in categories:
            cols["n_" + c] = pc.cast(b[f"sum(n_{c})"], pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


def unpivot_counts(pivoted: ray.data.Dataset, key: str,
                   categories: list[str],
                   prefix: str = "n_") -> ray.data.Dataset:
    """UNPIVOT/melt — inverse of :func:`pivot_counts`: each input row
    explodes into one (key, category, n) row per category column.
    Stateless per-batch, no shuffle."""
    def melt(b: pa.Table) -> pa.Table:
        n = len(b)
        keys, cats, vals = [], [], []
        for c in categories:
            keys.append(b[key])
            cats.append(pa.array([c] * n))
            vals.append(pc.cast(b[prefix + c], pa.int64()))
        return pa.table({
            key: pa.concat_arrays([k.combine_chunks() for k in keys]),
            "category": pa.concat_arrays(cats),
            "n": pa.concat_arrays([v.combine_chunks() for v in vals]),
        })

    return pivoted.map_batches(melt, batch_format="pyarrow")


def group_quantiles(ds: ray.data.Dataset, key: str, col: str,
                    qs: list[float]) -> ray.data.Dataset:
    """Per-group exact discrete quantiles (``quantile_disc`` semantics)
    over the distributed per-(key, value) histogram — the shuffle and
    the per-group state track DISTINCT values per key, never row
    counts, so a billion-row group with bounded value precision is
    fine."""
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pa.table({key: b[key], col: b[col]}).to_pandas()
        g = df.groupby([key, col], sort=False).size().rename("n") \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def quantiles_from_hist(g) -> "object":
        # g: per-key histogram frame with columns [key, col, n]
        import pandas as pd
        g = g.sort_values(col)
        counts = g["n"].to_numpy(dtype="int64")
        values = g[col].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        rows = {key: [], "q": [], "value": []}
        for q in qs:
            idx = max(0, math.ceil(q * n) - 1)
            pos = int(np.searchsorted(cum, idx + 1))
            rows[key].append(g[key].iloc[0])
            rows["q"].append(q)
            rows["value"].append(values[min(pos, len(values) - 1)])
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()

    # the partial volume is (keys × distinct values × blocks) — when it
    # fits one task, combine + all per-key quantiles there: two chained
    # shuffles (Aggregate + map_groups) cost seconds of fixed latency
    # at ANY size (PERF.md wide-key lesson)
    if partials.count() <= 20_000_000:
        import ray as _ray
        hist_schema = pa.schema(
            [(f.name, f.type) for f in partials.schema().base_schema])

        @_ray.remote
        def finish_task(*tabs: pa.Table) -> pa.Table:
            import pandas as pd

            from aida_ray.stages.dedup import _concat_blocks
            t = _concat_blocks(tabs, hist_schema)
            df = t.to_pandas().groupby([key, col], sort=False) \
                .agg(n=("n", "sum")).reset_index()
            out = pd.concat([quantiles_from_hist(g)
                             for _, g in df.groupby(key, sort=True)],
                            ignore_index=True)
            return pa.Table.from_pandas(out, preserve_index=False)

        return ray.data.from_arrow_refs(
            [finish_task.remote(*partials.to_arrow_refs())])

    hist = partials.groupby([key, col]).aggregate(Sum("n"))

    def per_key(group) -> "object":
        return quantiles_from_hist(group.rename(
            columns={"sum(n)": "n"}))

    return hist.groupby(key).map_groups(per_key, batch_format="pandas")


def correlation(ds: ray.data.Dataset, x: str, y: str) -> float:
    """Pearson correlation via mergeable sufficient statistics
    (n, Σx, Σy, Σx², Σy², Σxy) — one tiny row per block, summed
    distributively; no shuffle of the fact table."""
    def partial(b: pa.Table) -> pa.Table:
        xv = b[x].to_numpy(zero_copy_only=False).astype(np.float64)
        yv = b[y].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "n": pa.array([float(len(xv))]),
            "sx": pa.array([xv.sum()]), "sy": pa.array([yv.sum()]),
            "sxx": pa.array([(xv * xv).sum()]),
            "syy": pa.array([(yv * yv).sum()]),
            "sxy": pa.array([(xv * yv).sum()]),
        })

    stats = ds.select_columns([x, y]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n = stats["n"]
    cov = stats["sxy"] - stats["sx"] * stats["sy"] / n
    vx = stats["sxx"] - stats["sx"] ** 2 / n
    vy = stats["syy"] - stats["sy"] ** 2 / n
    return float(cov / np.sqrt(vx * vy))


def left_join_urgent_counts(customer: ray.data.Dataset,
                            orders: ray.data.Dataset) -> ray.data.Dataset:
    """LEFT OUTER shuffle join: every customer row survives; urgent
    orders attach where they exist; count non-null matches per
    customer.  Exercises Dataset.join(left_outer) + null-aware
    aggregation."""
    from aida_ray.stages.shuffle_join import hash_join
    urgent = orders.filter(expr="o_orderpriority == '1-URGENT'") \
        .select_columns(["o_custkey", "o_orderkey"])
    joined = hash_join(customer.select_columns(["c_custkey"]), urgent,
                       on=("c_custkey",), right_on=("o_custkey",),
                       join_type="left_outer")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pa.table({
            "c_custkey": b["c_custkey"],
            "hit": pc.cast(pc.is_valid(b["o_orderkey"]), pa.int64()),
        }).to_pandas()
        g = df.groupby("c_custkey", sort=False).agg(
            n_urgent=("hit", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum
    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("n_urgent"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": b["c_custkey"],
                         "n_urgent": pc.cast(b["sum(n_urgent)"],
                                             pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def monthly_revenue(orders: ray.data.Dataset) -> ray.data.Dataset:
    """Calendar rollup: revenue + order count per month
    (``date_trunc('month')`` semantics, emitted as 'YYYY-MM' strings so
    the comparison is representation-stable).  Same partial-agg shape
    as :func:`pricing_summary` — the shuffle ships months, not orders."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        month = pc.strftime(b["o_orderdate"], format="%Y-%m")
        t = pa.table({"month": month,
                      "cents": _cents(b["o_totalprice"])}).to_pandas()
        g = t.groupby("month", sort=False).agg(
            revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    agg = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("month").aggregate(Sum("revenue_cents"), Sum("n_orders"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "month": b["month"],
            "revenue_cents": pc.cast(b["sum(revenue_cents)"], pa.int64()),
            "n_orders": pc.cast(b["sum(n_orders)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def unnest_list(ds: ray.data.Dataset, id_col: str,
                list_col: str) -> ray.data.Dataset:
    """UNNEST a list column with 1-based ordinality — fully vectorized
    per batch (flatten + repeat by list length), stateless, no
    shuffle.  Output: (id, pos, val)."""
    def explode(b: pa.Table) -> pa.Table:
        arr = b[list_col].combine_chunks()
        lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
        flat = arr.flatten()
        ids = np.repeat(b[id_col].to_numpy(zero_copy_only=False), lengths)
        starts = np.repeat(np.cumsum(lengths) - lengths, lengths)
        pos = np.arange(len(flat), dtype=np.int64) - starts + 1
        return pa.table({
            id_col: pa.array(ids),
            "pos": pa.array(pos, pa.int64()),
            "val": pc.cast(flat, pa.float64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def _skyline_sweep(price: np.ndarray, qty: np.ndarray):
    """Pareto frontier (minimize price, maximize qty) of distinct
    points via the O(n log n) sort-sweep: after sorting by (price asc,
    qty desc), a point survives iff it is the qty-max of its price
    group AND beats the running qty max of all cheaper points."""
    pts = np.unique(np.stack([price, -qty], axis=1), axis=0)
    p, q = pts[:, 0], -pts[:, 1]
    first_of_price = np.ones(len(p), dtype=bool)
    first_of_price[1:] = p[1:] != p[:-1]
    best = np.maximum.accumulate(np.where(first_of_price, q, -np.inf))
    prev_best = np.concatenate([[-np.inf], best[:-1]])
    keep = first_of_price & (q > prev_best)
    return p[keep], q[keep]


def skyline(ds: ray.data.Dataset, price_col: str,
            qty_col: str) -> pa.Table:
    """Distributed skyline (Pareto-frontier) query: points not
    dominated by any other on (price minimized, qty maximized).

    Block-local skylines are a CORRECT prune — a globally
    non-dominated point is non-dominated within its block — so each
    block ships only its own frontier (typically O(log) of the block)
    and the driver sweeps the tiny candidate union.  No shuffle of the
    fact table; deterministic under any blocking."""
    def local(b: pa.Table) -> pa.Table:
        p, q = _skyline_sweep(
            b[price_col].to_numpy(zero_copy_only=False).astype("float64"),
            b[qty_col].to_numpy(zero_copy_only=False).astype("float64"))
        return pa.table({"price": pa.array(p, pa.float64()),
                         "qty": pa.array(q, pa.float64())})

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    p, q = _skyline_sweep(cand.price.to_numpy(), cand.qty.to_numpy())
    return pa.table({"price": pa.array(p, pa.float64()),
                     "qty": pa.array(q, pa.float64())})


def group_mode_concat(ds: ray.data.Dataset, key: str,
                      val: str) -> ray.data.Dataset:
    """Per-group MODE (most frequent value, lexicographic tie-break)
    and ordered STRING_AGG of the distinct values.

    Map-side (key, val) partial counts make the shuffle track the
    (key × value-domain) space, never the fact table; the per-group
    finish is a tiny sort over that group's distinct values."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pd.DataFrame({
            "k": b[key].to_numpy(zero_copy_only=False),
            "v": b[val].to_pandas()}).groupby(["k", "v"], sort=False) \
            .size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()

    def finish_frame(df) -> pa.Table:
        import pandas as pd
        c = df.groupby(["k", "v"], sort=False)["n"].sum() \
            .reset_index().sort_values(["k", "v"])
        # mode with lexicographic tie-break: stable sort by count desc
        # within the value order, take first per key
        top = c.sort_values(["k", "n"], ascending=[True, False],
                            kind="mergesort") \
            .groupby("k", sort=False).head(1)
        alls = c.groupby("k", sort=False)["v"].agg(",".join) \
            .rename("all_vals").reset_index()
        out = top.merge(alls, on="k") \
            .rename(columns={"k": key, "v": "mode_val",
                             "n": "mode_n"})
        return pa.Table.from_pandas(
            out[[key, "mode_val", "mode_n", "all_vals"]],
            preserve_index=False)

    if partials.count() <= 20_000_000:
        # (key × value-domain) × blocks fits ONE task — both the
        # per-key Python of Ray's aggregate AND the per-key
        # map_groups dispatch disappear
        from aida_ray.stages.dedup import _concat_blocks

        @ray.remote
        def finish_task(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema(
                [("k", pa.int64()), ("v", pa.string()),
                 ("n", pa.int64())]))
            return finish_frame(t.to_pandas())

        out = ray.data.from_arrow_refs(
            [finish_task.remote(*partials.to_arrow_refs())])
    else:
        from aida_ray.stages.agg import bucket_reduce
        # combine counts without per-key Python, then co-locate whole
        # keys with one hash shuffle for the per-key finish
        counts = bucket_reduce(partials, ["k", "v"], {"n": "sum"})
        out = counts.groupby("k").map_groups(
            lambda g: finish_frame(g).to_pandas(),
            batch_format="pandas")

    return out.map_batches(
        lambda t: pa.table({key: pc.cast(t[key], pa.int64()),
                            "mode_val": t["mode_val"],
                            "mode_n": pc.cast(t["mode_n"], pa.int64()),
                            "all_vals": t["all_vals"]}),
        batch_format="pyarrow")


def revenue_by_nation(orders: ray.data.Dataset, customer: pa.Table,
                      nation: pa.Table) -> ray.data.Dataset:
    """Total order revenue (int cents) + order count per nation name.

    The customer and nation dimensions are broadcast once; the orders
    fact table streams through a stateless map — no shuffle until the
    (tiny) per-nation partial rows."""
    ckeys = customer["c_custkey"].to_numpy()
    cnation = customer["c_nationkey"].to_numpy()
    order_c = np.argsort(ckeys, kind="stable")
    nkeys = nation["n_nationkey"].to_numpy()
    nnames = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    order_n = np.argsort(nkeys, kind="stable")
    dim_ref = ray.put((ckeys[order_c], cnation[order_c],
                       nkeys[order_n], nnames[order_n]))

    def partial(b: pa.Table) -> pa.Table:
        ck, cn, nk, nm = _get_cached(dim_ref)
        cust = b["o_custkey"].to_numpy()
        idx = np.searchsorted(ck, cust)
        idx[idx >= len(ck)] = len(ck) - 1 if len(ck) else 0
        # inner-join semantics: drop orders with no customer row
        hit = ck[idx] == cust if len(ck) else np.zeros(len(cust), bool)
        nat = cn[idx[hit]]
        nidx = np.searchsorted(nk, nat)
        names = nm[nidx]
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)[hit]
        import pandas as pd
        g = pd.DataFrame({"n_name": names, "cents": cents}) \
            .groupby("n_name", sort=False) \
            .agg(revenue_cents=("cents", "sum"), n_orders=("cents", "size"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    from ray.data.aggregate import Sum
    agg = orders.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("revenue_cents"), Sum("n_orders"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": b["n_name"],
            "revenue_cents": pc.cast(b["sum(revenue_cents)"], pa.int64()),
            "n_orders": pc.cast(b["sum(n_orders)"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def shipping_priority(lineitem: ray.data.Dataset,
                      orders: ray.data.Dataset, customer: pa.Table,
                      segment: str = "BUILDING",
                      cutoff: str = "1998-06-01",
                      limit: int = 10) -> pa.Table:
    """TPC-H-Q3-style shipping priority: top unshipped orders by
    revenue for one market segment.

    The multi-way join plan, Ray-Data-first:

    - the CUSTOMER side is filtered to the segment FIRST and only the
      surviving custkey set broadcasts (``ray.put`` + ``pc.is_in``
      semi-join inside the orders map) — the classic
      filter-then-broadcast dimension reduction;
    - ORDERS filters on date at the Arrow kernel level and semi-joins
      the broadcast custkeys;
    - the orders⋈lineitem join is ADAPTIVE: while the filtered orders
      side fits the broadcast budget it ships once via ``ray.put``
      and each lineitem batch joins + partial-aggregates in ONE
      map-only pass (revenue keyed by order INDEX, so the shuffle is
      an int-keyed groupby over qualifying orders); above the budget
      the genuine large-large hash SHUFFLE join runs with the same
      per-batch partial aggregation.

    Money is exact int64 centi-cents (price_cents × (100 − disc_pct)),
    so the DuckDB oracle hash-matches at any parallelism; final order
    (revenue DESC, o_orderdate, l_orderkey) is total, making the
    LIMIT deterministic."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    ck = customer.filter(pc.equal(customer["c_mktsegment"],
                                  pa.scalar(segment)))["c_custkey"] \
        .to_numpy(zero_copy_only=False)
    ck_ref = ray.put(pa.array(np.sort(ck), pa.int64()))
    cut = pa.scalar(np.datetime64(cutoff + "T00:00:00", "us"),
                    pa.timestamp("us"))

    def orders_side(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.less(b["o_orderdate"], cut),
                       pc.is_in(b["o_custkey"],
                                value_set=_get_cached(ck_ref)))
        t = b.filter(keep)
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": pc.strftime(t["o_orderdate"],
                                       format="%Y-%m-%d"),
            "o_orderpriority": t["o_orderpriority"]})

    def lineitem_side(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater(b["l_shipdate"], cut))
        disc_pct = pc.cast(_round_half_away(
            pc.multiply(t["l_discount"], 100.0)), pa.int64())
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "rev": pc.multiply(_cents(t["l_extendedprice"]),
                               pc.subtract(pa.scalar(100, pa.int64()),
                                           disc_pct))})

    o = orders.map_batches(orders_side, batch_format="pyarrow") \
        .materialize()
    li = lineitem.map_batches(lineitem_side, batch_format="pyarrow")

    broadcast_rows = 8_000_000       # ~200 MB of key+date+priority
    if o.count() <= broadcast_rows:
        from aida_ray.state.collect import collect_table
        ot = collect_table(o)
        okey = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(okey, kind="stable")
        oref = ray.put(pa.array(okey[order], pa.int64()))

        def join_partial(b: pa.Table) -> pa.Table:
            import pandas as pd
            ok = _get_cached(oref).to_numpy(zero_copy_only=False)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            i = np.searchsorted(ok, lk)
            hit = (i < len(ok)) \
                & (ok[np.minimum(i, len(ok) - 1)] == lk)
            g = pd.DataFrame({
                "oi": i[hit],
                "rev": b["rev"].to_numpy(zero_copy_only=False)[hit]}) \
                .groupby("oi", sort=False).agg(
                    rev=("rev", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = li.map_batches(join_partial, batch_format="pyarrow") \
            .groupby("oi").aggregate(Sum("rev"))
        meta_ref = ray.put((
            okey[order],
            np.asarray(ot["o_orderdate"].to_pylist(), dtype=object)[order],
            np.asarray(ot["o_orderpriority"].to_pylist(),
                       dtype=object)[order]))

        def attach(b: pa.Table) -> pa.Table:
            okey_s, odate, oprio = _get_cached(meta_ref)
            oi = b["oi"].to_numpy(zero_copy_only=False)
            return pa.table({
                "l_orderkey": pa.array(okey_s[oi], pa.int64()),
                "o_orderdate": pa.array(list(odate[oi])),
                "o_orderpriority": pa.array(list(oprio[oi])),
                "revenue_cc": pc.cast(b["sum(rev)"], pa.int64())})

        top = agg.map_batches(attach, batch_format="pyarrow") \
            .sort(["revenue_cc", "o_orderdate", "l_orderkey"],
                  descending=[True, False, False]).limit(limit)
        from aida_ray.state.collect import collect_table
        return collect_table(top)

    joined = hash_join(li, o, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pa.table({
            "l_orderkey": b["l_orderkey"],
            "o_orderdate": b["o_orderdate"],
            "o_orderpriority": b["o_orderpriority"],
            "rev": b["rev"]}).to_pandas() \
            .groupby(["l_orderkey", "o_orderdate", "o_orderpriority"],
                     sort=False).agg(rev=("rev", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_orderkey", "o_orderdate", "o_orderpriority"]) \
        .aggregate(Sum("rev"))
    top = agg.map_batches(lambda b: pa.table({
        "l_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
        "o_orderdate": b["o_orderdate"],
        "o_orderpriority": b["o_orderpriority"],
        "revenue_cc": pc.cast(b["sum(rev)"], pa.int64())}),
        batch_format="pyarrow") \
        .sort(["revenue_cc", "o_orderdate", "l_orderkey"],
              descending=[True, False, False]).limit(limit)
    from aida_ray.state.collect import collect_table
    return collect_table(top)


def cheapest_supplier(lineitem: ray.data.Dataset,
                      task_gate_rows: int = 20_000_000
                      ) -> ray.data.Dataset:
    """Per part: the minimum extended price ever quoted and the
    supplier quoting it (lowest suppkey on price ties) — the TPC-H-Q2
    "min-cost supplier" correlated subquery as ONE groupby.

    The argmin rides a PACKED int64 key (price_cents << 20 | suppkey):
    ``Min`` over the packed key is simultaneously the price argmin and
    the deterministic tie-break, so there is no join-back against the
    aggregate.  Bounds: price_cents < 2^43, suppkey < 2^20
    (assert-guarded).

    Finishing is GATED on the partial volume (keys × blocks): below
    the gate ONE numpy task sorts the partial rows and takes the
    per-key min (Ray's sort-based Aggregate pays Python-per-key — at
    20k keys that costs seconds per block); above it the hash groupby
    runs, shipping keys × blocks rows."""
    from ray.data.aggregate import Min

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        cents = _cents(b["l_extendedprice"]).to_numpy(
            zero_copy_only=False)
        supp = b["l_suppkey"].to_numpy(zero_copy_only=False)
        assert cents.max(initial=0) < (1 << 43) \
            and supp.max(initial=0) < (1 << 20)
        g = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
            "packed": (cents.astype("int64") << 20) | supp}) \
            .groupby("l_partkey", sort=False).agg(
                packed=("packed", "min")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = lineitem.map_batches(partial, batch_format="pyarrow") \
        .materialize()

    def _unpack(key: np.ndarray, packed: np.ndarray) -> pa.Table:
        return pa.table({
            "l_partkey": pa.array(key, pa.int64()),
            "min_price_cents": pa.array(packed >> 20, pa.int64()),
            "best_suppkey": pa.array(packed & ((1 << 20) - 1),
                                     pa.int64())})

    if partials.count() <= task_gate_rows:
        @ray.remote
        def min_task(*tabs: pa.Table) -> pa.Table:
            from aida_ray.stages.dedup import _concat_blocks
            t = _concat_blocks(tabs, pa.schema(
                [("l_partkey", pa.int64()), ("packed", pa.int64())]))
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            p = t["packed"].to_numpy(zero_copy_only=False)
            o = np.lexsort((p, k))
            k, p = k[o], p[o]
            first = np.r_[True, k[1:] != k[:-1]] if len(k) \
                else np.empty(0, bool)
            return _unpack(k[first].astype("int64"), p[first])

        refs = partials.to_arrow_refs()
        return ray.data.from_arrow_refs([min_task.remote(*refs)])

    from aida_ray.stages.agg import bucket_reduce
    agg = bucket_reduce(partials, ["l_partkey"], {"packed": "min"})
    return agg.map_batches(lambda b: _unpack(
        b["l_partkey"].to_numpy(zero_copy_only=False).astype("int64"),
        b["packed"].to_numpy(zero_copy_only=False)),
        batch_format="pyarrow")


def price_histogram(lineitem: ray.data.Dataset,
                    bin_cents: int = 500_000) -> ray.data.Dataset:
    """Fixed-width histogram of l_extendedprice: per bin (floor
    division on int cents), row count and exact cent sum.  Map-side
    partials make the shuffle ship one row per bin per block."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        cents = _cents(b["l_extendedprice"]).to_numpy(
            zero_copy_only=False)
        g = pd.DataFrame({"bin": cents // bin_cents, "cents": cents}) \
            .groupby("bin", sort=False).agg(
                n=("cents", "size"), sum_cents=("cents", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("bin").aggregate(Sum("n"), Sum("sum_cents"))
    return agg.map_batches(lambda b: pa.table({
        "bin": pc.cast(b["bin"], pa.int64()),
        "n": pc.cast(b["sum(n)"], pa.int64()),
        "sum_cents": pc.cast(b["sum(sum_cents)"], pa.int64())}),
        batch_format="pyarrow")


def group_moments(ds: ray.data.Dataset, key: str,
                  col: str) -> ray.data.Dataset:
    """Per-group count / mean / sample variance / stddev from
    MERGEABLE sufficient statistics (n, Σx, Σx²) — one tiny partial
    row per group per block crosses the shuffle, never the fact
    table.  The same shape as :func:`correlation`, keyed."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({
            "k": b[key].to_pandas(),
            "x": b[col].to_numpy(zero_copy_only=False)
            .astype("float64")})
        df["xx"] = df.x * df.x
        g = df.groupby("k", sort=False).agg(
            n=("x", "size"), s=("x", "sum"), ss=("xx", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n"), Sum("s"), Sum("ss"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["sum(n)"].to_numpy(zero_copy_only=False) \
            .astype("float64")
        s = b["sum(s)"].to_numpy(zero_copy_only=False)
        ss = b["sum(ss)"].to_numpy(zero_copy_only=False)
        mean = s / n
        var = np.where(n > 1, (ss - s * s / n) / (n - 1), 0.0)
        var = np.maximum(var, 0.0)           # cancellation guard
        return pa.table({
            key: b["k"],
            "n": pa.array(n.astype("int64")),
            "mean": pa.array(np.round(mean, 6), pa.float64()),
            "var_samp": pa.array(np.round(var, 6), pa.float64()),
            "stddev": pa.array(np.round(np.sqrt(var), 6),
                               pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def group_regression(ds: ray.data.Dataset, key: str, x_col: str,
                     y_col: str,
                     x_center_us: int = 1_704_067_200_000_000
                     ) -> ray.data.Dataset:
    """Per-group OLS slope/intercept of y against TIME from mergeable
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) — the distributed
    trend detector.  x is centered at a fixed epoch and scaled to
    seconds BEFORE accumulation so the normal-equation cancellation
    stays benign and the oracle (same centering, same formula)
    hash-matches at 6 decimals."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        ts = b[x_col]
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.timestamp("us"))
        x = (pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)
             - x_center_us) / 1e6
        y = b[y_col].to_numpy(zero_copy_only=False).astype("float64")
        df = pd.DataFrame({"k": b[key].to_pandas(), "x": x, "y": y})
        df["xy"] = df.x * df.y
        df["xx"] = df.x * df.x
        g = df.groupby("k", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n"), Sum("sx"), Sum("sy"),
                                Sum("sxy"), Sum("sxx"))

    def finish(b: pa.Table) -> pa.Table:
        n = b["sum(n)"].to_numpy(zero_copy_only=False) \
            .astype("float64")
        sx = b["sum(sx)"].to_numpy(zero_copy_only=False)
        sy = b["sum(sy)"].to_numpy(zero_copy_only=False)
        sxy = b["sum(sxy)"].to_numpy(zero_copy_only=False)
        sxx = b["sum(sxx)"].to_numpy(zero_copy_only=False)
        slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        intercept = sy / n - slope * sx / n
        return pa.table({
            key: b["k"],
            "n": pa.array(n.astype("int64")),
            "slope": pa.array(np.round(slope, 6), pa.float64()),
            "intercept": pa.array(np.round(intercept, 6),
                                  pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def local_supplier_volume(lineitem: ray.data.Dataset,
                          orders: ray.data.Dataset, customer: pa.Table,
                          supplier: pa.Table, nation: pa.Table,
                          region: pa.Table, region_name: str = "ASIA"
                          ) -> ray.data.Dataset:
    """TPC-H-Q5-style local supplier volume: revenue per nation from
    line items where the SUPPLIER'S nation equals the CUSTOMER'S
    nation, customers restricted to one region.

    The six-table plan, Ray-Data-first: region→nation→customer and
    supplier→nation are pure dimension chains, so they collapse into
    two broadcast lookup arrays (custkey→nationkey within the region,
    suppkey→nationkey) shipped once; ORDERS semi-joins the region's
    customers map-side and carries o_orderkey→c_nationkey through the
    ONE genuine large-large hash shuffle join against LINEITEM; the
    supplier-nation equality is then a map-side filter and the final
    rollup a |nations|-sized groupby.  Exact int64 centi-cents."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    rkey = region.filter(pc.equal(region["r_name"],
                                  pa.scalar(region_name)))["r_regionkey"]
    nat = nation.filter(pc.is_in(nation["n_regionkey"],
                                 value_set=rkey.combine_chunks()))
    nkeys = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    nnames = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    norder = np.argsort(nkeys, kind="stable")
    cust = customer.filter(pc.is_in(
        customer["c_nationkey"],
        value_set=pa.array(nkeys, customer["c_nationkey"].type)))
    ck = cust["c_custkey"].to_numpy(zero_copy_only=False)
    cn = cust["c_nationkey"].to_numpy(zero_copy_only=False)
    corder = np.argsort(ck, kind="stable")
    sk = supplier["s_suppkey"].to_numpy(zero_copy_only=False)
    sn = supplier["s_nationkey"].to_numpy(zero_copy_only=False)
    sorder = np.argsort(sk, kind="stable")
    dims_ref = ray.put((ck[corder], cn[corder], sk[sorder], sn[sorder],
                        nkeys[norder], nnames[norder]))

    def orders_side(b: pa.Table) -> pa.Table:
        ck_, cn_, *_ = _get_cached(dims_ref)
        cust_k = b["o_custkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(ck_, cust_k)
        hit = (i < len(ck_)) \
            & (ck_[np.minimum(i, len(ck_) - 1)] == cust_k)
        return pa.table({
            "o_orderkey": pa.array(
                b["o_orderkey"].to_numpy(zero_copy_only=False)[hit],
                pa.int64()),
            "c_nat": pa.array(cn_[i[hit]].astype("int64"), pa.int64())})

    def li_side(b: pa.Table) -> pa.Table:
        disc_pct = pc.cast(_round_half_away(
            pc.multiply(b["l_discount"], 100.0)), pa.int64())
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "rev": pc.multiply(_cents(b["l_extendedprice"]),
                               pc.subtract(pa.scalar(100, pa.int64()),
                                           disc_pct))})

    o = orders.map_batches(orders_side, batch_format="pyarrow")
    li = lineitem.map_batches(li_side, batch_format="pyarrow")
    joined = hash_join(li, o, on=("l_orderkey",),
                       right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        _, _, sk_, sn_, nk_, _ = _get_cached(dims_ref)
        supp = b["l_suppkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(sk_, supp)
        hit = (i < len(sk_)) \
            & (sk_[np.minimum(i, len(sk_) - 1)] == supp)
        snat = np.full(len(supp), -1, dtype="int64")
        snat[hit] = sn_[i[hit]]
        cnat = b["c_nat"].to_numpy(zero_copy_only=False)
        keep = snat == cnat
        g = pd.DataFrame({
            "nat": cnat[keep],
            "rev": b["rev"].to_numpy(zero_copy_only=False)[keep]}) \
            .groupby("nat", sort=False).agg(rev=("rev", "sum")) \
            .reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("nat").aggregate(Sum("rev"))

    def finish(b: pa.Table) -> pa.Table:
        _, _, _, _, nk_, nm_ = _get_cached(dims_ref)
        nat = b["nat"].to_numpy(zero_copy_only=False)
        names = nm_[np.searchsorted(nk_, nat)]
        return pa.table({
            "n_name": pa.array(list(names), pa.string()),
            "revenue_cc": pc.cast(b["sum(rev)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def group_zscore_outliers(ds: ray.data.Dataset, key: str, col: str,
                          id_col: str, k: int = 2) -> ray.data.Dataset:
    """Rows more than ``k`` sample standard deviations from their
    group's mean — outlier detection with the comparison evaluated in
    EXACT integer arithmetic, so no float mean/variance ever exists
    and block order cannot flip a borderline row:

        (v·n − Σ)² · (n−1)  >  k² · n · (n·Q − Σ²)

    over ``v = round(col·100)`` cents (Σ, Q = group sum and sum of
    squares).  Two passes: tiny per-group sufficient statistics
    (groups × blocks partial rows) broadcast back over the fact
    stream.  Arithmetic: the squared products can reach ~2^84 even
    under the input asserts (|v| < 2^21, group rows < 2^20), so each
    batch checks its ACTUAL magnitudes and takes the vectorized int64
    path only when every term provably fits; otherwise it promotes to
    object-dtype Python ints — still exact, never a silent wrap."""
    from ray.data.aggregate import Sum

    def stat_partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        v = _cents(b[col]).to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "k": b[key].to_numpy(zero_copy_only=False),
            "n": np.ones(len(v), np.int64), "s": v, "q": v * v}) \
            .groupby("k", sort=False) \
            .agg(n=("n", "sum"), s=("s", "sum"),
                 q=("q", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = ds.map_batches(stat_partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("n"), Sum("s"), Sum("q"))
    from aida_ray.state.collect import collect_table
    st = collect_table(agg)
    if st.num_rows == 0:
        # empty input: no groups, nothing can be an outlier
        return ds.map_batches(
            lambda b: pa.table({id_col: b[id_col], key: b[key],
                                col: b[col]}).slice(0, 0),
            batch_format="pyarrow")
    keys = st["k"].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    n_arr = st["sum(n)"].to_numpy(zero_copy_only=False)[order] \
        .astype("int64")
    s_arr = st["sum(s)"].to_numpy(zero_copy_only=False)[order] \
        .astype("int64")
    q_arr = st["sum(q)"].to_numpy(zero_copy_only=False)[order] \
        .astype("int64")
    assert n_arr.max(initial=0) < (1 << 20)
    stats_ref = ray.put((keys[order], n_arr, s_arr, q_arr))

    def flag(b: pa.Table) -> pa.Table:
        ks, n, s, q = _get_cached(stats_ref)
        kv = b[key].to_numpy(zero_copy_only=False)
        i = np.searchsorted(ks, kv)
        v = _cents(b[col]).to_numpy(zero_copy_only=False)
        assert np.abs(v).max(initial=0) < (1 << 21)
        ni, si, qi = n[i], s[i], q[i]
        A = v * ni - si                  # |A| <= 2^42: int64-safe
        # int64 only when the ACTUAL squared products fit (conservative
        # 2^61 cap absorbs the float-estimate rounding); otherwise
        # promote to object-dtype Python ints — exact at any magnitude
        a_mx = float(np.abs(A).max(initial=0))
        n_mx = float(ni.max(initial=0))
        q_mx = float(qi.max(initial=0))
        s_mx = float(np.abs(si).max(initial=0))
        LIM = float(1 << 61)
        if (a_mx * a_mx * n_mx < LIM
                and n_mx * q_mx < LIM and s_mx * s_mx < LIM
                and k * k * n_mx * (n_mx * q_mx + s_mx * s_mx) < LIM):
            lhs = A * A * (ni - 1)
            rhs = k * k * ni * (ni * qi - si * si)
        else:
            Ao, no = A.astype(object), ni.astype(object)
            lhs = Ao * Ao * (no - 1)
            rhs = (k * k * no
                   * (no * qi.astype(object) - si.astype(object) ** 2))
        keep = (ni >= 2) & np.asarray(lhs > rhs, dtype=bool)
        t = b.filter(pa.array(keep))
        return pa.table({
            id_col: t[id_col], key: t[key],
            col: t[col]})

    return ds.map_batches(flag, batch_format="pyarrow")



def aligned_union(*parts: ray.data.Dataset,
                  schema: "pa.Schema | None" = None) -> ray.data.Dataset:
    """Schema-evolution union: combine shard generations whose schemas
    drifted (a column added later is missing from old shards) by
    aligning every batch to the union schema, null-filling absent
    columns — the ingest-time answer to "the crawler added a field
    last month".

    The alignment is a stateless per-batch map (no shuffle); pass
    ``schema`` to pin the target explicitly, otherwise it is the
    unified schema of the inputs (names meeting in both must agree on
    type)."""
    import pyarrow as pa

    if schema is None:
        schema = pa.unify_schemas([p.schema().base_schema
                                   for p in parts])

    def align(b: pa.Table) -> pa.Table:
        cols = {}
        for f in schema:
            if f.name in b.column_names:
                cols[f.name] = pc.cast(b[f.name], f.type)
            else:
                cols[f.name] = pa.nulls(b.num_rows, f.type)
        return pa.table(cols)

    aligned = [p.map_batches(align, batch_format="pyarrow")
               for p in parts]
    ds = aligned[0]
    if len(aligned) > 1:
        ds = ds.union(*aligned[1:])
    return ds
