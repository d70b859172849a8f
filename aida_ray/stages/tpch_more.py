"""More TPC-H-style relational plans (Q12/Q14/Q17/Q18/Q22 shapes).

Each function is one classic analytics pattern the engine must cover,
expressed with the repo's scale conventions:

- **Conditional aggregation over a shuffle join** (`priority_counts_by
  _shipmonth`, Q12): lineitem ⋈ orders is large-large, so it runs
  through the sized hash SHUFFLE join; the CASE-WHEN counts are
  partial-aggregated per batch so only (month × blocks) rows reach the
  final groupby.
- **Broadcast dimension + ratio-of-sums** (`promo_revenue_by_month`,
  Q14): the part dimension ships once via ``ray.put``; the promo share
  is a single double division of two exact int64 centi-cent sums, so
  the DuckDB oracle matches bit-for-bit.
- **Correlated-average subquery as two passes** (`small_qty_revenue`,
  Q17): pass 1 aggregates per-part (Σqty, count); pass 2 re-streams
  lineitem against the broadcast aggregate.  The predicate
  ``qty < 0.2·avg`` is evaluated in EXACT integer arithmetic
  (``qty·5·cnt < Σqty``) — no float average ever exists, so block
  order cannot flip a borderline row.
- **HAVING-filtered groupby with join-back** (`big_orders`, Q18): the
  per-order quantity sums use the gated wide-key finisher (orders are
  corpus-scale keys); the qualifying set is small BY CONSTRUCTION
  (that is what HAVING > threshold means), so the join-back to orders
  and customer is a broadcast semi-join, never a second shuffle.
- **Anti join against a global-average filter** (`idle_high_balance`,
  Q22): the global positive-balance average is two partial scalars;
  the "no recent orders" predicate is a distributed left_anti hash
  join (both sides corpus-scale); the final rollup groups by nation
  (bounded keys).

Money stays in int64 cents / centi-cents throughout (the repo rule:
integer sums are reduction-order-free, float sums are not).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _concat_blocks, _get_cached
from aida_ray.stages.relational import _cents, _round_half_away


def _ship_month(col) -> pa.ChunkedArray:
    return pc.strftime(col, format="%Y-%m")


def priority_counts_by_shipmonth(lineitem: ray.data.Dataset,
                                 orders: ray.data.Dataset
                                 ) -> ray.data.Dataset:
    """TPC-H-Q12 shape: per ship month, how many lineitems belong to
    high-priority (1-URGENT / 2-HIGH) vs other orders.

    lineitem ⋈ orders on orderkey is genuinely large-large → hash
    shuffle join; the conditional counts partial-aggregate per joined
    batch so the final groupby sees (months × blocks) tiny rows."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    def li_side(b: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": b["l_orderkey"],
                         "ship_month": _ship_month(b["l_shipdate"])})

    def o_side(b: pa.Table) -> pa.Table:
        high = pc.is_in(b["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "is_high": high})

    o = orders.map_batches(o_side, batch_format="pyarrow") \
        .materialize()

    # adaptive: the projected orders side is (key, bool) — while it
    # fits the broadcast budget, ship it once and fold the join into
    # the lineitem map (the shuffle join's aggregator pool costs
    # seconds of fixed latency; see q3_shipping / PERF.md).  Above the
    # budget the genuine large-large hash shuffle join runs.
    broadcast_rows = 8_000_000
    if o.count() <= broadcast_rows:
        from aida_ray.state.collect import collect_table
        ot = collect_table(o)
        okey = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(okey, kind="stable")
        ohigh = ot["is_high"].to_numpy(zero_copy_only=False)[order]
        oref = ray.put((okey[order], ohigh))

        def bcast_partial(b: pa.Table) -> pa.Table:
            import pandas as pd
            ok, hi_flag = _get_cached(oref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            i = np.searchsorted(ok, lk)
            i_clip = np.minimum(i, len(ok) - 1) if len(ok) \
                else np.zeros(len(lk), np.int64)
            hit = ok[i_clip] == lk if len(ok) \
                else np.zeros(len(lk), bool)
            months = np.asarray(
                _ship_month(b["l_shipdate"]).to_pylist(),
                dtype=object)[hit]
            hi = hi_flag[i_clip[hit]].astype("int64")
            g = pd.DataFrame({"ship_month": months,
                              "high_count": hi, "low_count": 1 - hi}) \
                .groupby("ship_month", sort=False) \
                .agg(high_count=("high_count", "sum"),
                     low_count=("low_count", "sum")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = lineitem.map_batches(bcast_partial,
                                   batch_format="pyarrow") \
            .groupby("ship_month").aggregate(Sum("high_count"),
                                             Sum("low_count"))
        return agg.map_batches(lambda b: pa.table({
            "ship_month": b["ship_month"],
            "high_count": pc.cast(b["sum(high_count)"], pa.int64()),
            "low_count": pc.cast(b["sum(low_count)"], pa.int64())}),
            batch_format="pyarrow")

    joined = hash_join(
        lineitem.map_batches(li_side, batch_format="pyarrow"),
        o, on=("l_orderkey",), right_on=("o_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        hi = b["is_high"].to_numpy(zero_copy_only=False).astype("int64")
        g = pd.DataFrame({"ship_month": b["ship_month"].to_pandas(),
                          "high_count": hi, "low_count": 1 - hi}) \
            .groupby("ship_month", sort=False) \
            .agg(high_count=("high_count", "sum"),
                 low_count=("low_count", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("ship_month").aggregate(Sum("high_count"),
                                         Sum("low_count"))
    return agg.map_batches(lambda b: pa.table({
        "ship_month": b["ship_month"],
        "high_count": pc.cast(b["sum(high_count)"], pa.int64()),
        "low_count": pc.cast(b["sum(low_count)"], pa.int64())}),
        batch_format="pyarrow")


def promo_revenue_by_month(lineitem: ray.data.Dataset,
                           part: pa.Table) -> ray.data.Dataset:
    """TPC-H-Q14 shape: per ship month, discounted revenue from PROMO
    parts vs total, and the promo share.

    The part dimension broadcasts once (sorted partkey + bool mask,
    searchsorted per batch); revenue is exact int64 centi-cents
    (price_cents × (100 − disc_pct)); the share is ONE double division
    of the two final sums — deterministic at any parallelism."""
    from ray.data.aggregate import Sum

    pk = part["p_partkey"].to_numpy()
    promo = pc.equal(part["p_type"], pa.scalar("PROMO")).to_numpy(
        zero_copy_only=False)
    order = np.argsort(pk, kind="stable")
    dim_ref = ray.put((pk[order], promo[order]))

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        pkeys, pflag = _get_cached(dim_ref)
        lp = b["l_partkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(pkeys, lp)
        i_clip = np.minimum(i, len(pkeys) - 1) if len(pkeys) \
            else np.zeros(len(lp), np.int64)
        hit = pkeys[i_clip] == lp if len(pkeys) \
            else np.zeros(len(lp), bool)
        disc_pct = pc.cast(_round_half_away(
            pc.multiply(b["l_discount"], 100.0)), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rev = _cents(b["l_extendedprice"]).to_numpy(
            zero_copy_only=False) * (100 - disc_pct)
        is_promo = np.zeros(len(lp), bool)
        is_promo[hit] = pflag[i_clip[hit]]
        months = np.asarray(
            _ship_month(b["l_shipdate"]).to_pylist(), dtype=object)
        g = pd.DataFrame({
            "ship_month": months[hit],
            "promo_cc": np.where(is_promo, rev, 0)[hit],
            "total_cc": rev[hit]}) \
            .groupby("ship_month", sort=False) \
            .agg(promo_cc=("promo_cc", "sum"),
                 total_cc=("total_cc", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = lineitem.map_batches(partial, batch_format="pyarrow") \
        .groupby("ship_month").aggregate(Sum("promo_cc"),
                                         Sum("total_cc"))

    def finish(b: pa.Table) -> pa.Table:
        promo_cc = pc.cast(b["sum(promo_cc)"], pa.int64())
        total_cc = pc.cast(b["sum(total_cc)"], pa.int64())
        share = pc.divide(pc.cast(promo_cc, pa.float64()),
                          pc.cast(total_cc, pa.float64()))
        return pa.table({"ship_month": b["ship_month"],
                         "promo_cc": promo_cc, "total_cc": total_cc,
                         "promo_share": share})

    return agg.map_batches(finish, batch_format="pyarrow")


def _sum_count_by_key(partials: ray.data.Dataset, key: str,
                      sum_col: str, cnt_col: str,
                      task_gate_rows: int = 20_000_000
                      ) -> ray.data.Dataset:
    """Combine (key, Σ, count) partial rows: one numpy lexsort+reduceat
    task below the gate (Ray's sort-based aggregate pays Python per
    key), the bucketed hash combine above it."""
    schema = pa.schema([(key, pa.int64()), (sum_col, pa.int64()),
                        (cnt_col, pa.int64())])

    if partials.count() <= task_gate_rows:
        @ray.remote
        def reduce_task(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, schema)
            k = t[key].to_numpy(zero_copy_only=False)
            if not len(k):
                return schema.empty_table()
            o = np.argsort(k, kind="stable")
            k = k[o]
            s = t[sum_col].to_numpy(zero_copy_only=False)[o]
            c = t[cnt_col].to_numpy(zero_copy_only=False)[o]
            first = np.r_[True, k[1:] != k[:-1]]
            idx = np.flatnonzero(first)
            return pa.table({
                key: pa.array(k[first].astype("int64")),
                sum_col: pa.array(np.add.reduceat(s, idx), pa.int64()),
                cnt_col: pa.array(np.add.reduceat(c, idx), pa.int64())})

        refs = partials.to_arrow_refs()
        return ray.data.from_arrow_refs([reduce_task.remote(*refs)])

    from aida_ray.stages.agg import bucket_reduce
    return bucket_reduce(partials, [key],
                         {sum_col: "sum", cnt_col: "sum"})


def small_qty_revenue(lineitem: ray.data.Dataset) -> pa.Table:
    """TPC-H-Q17 shape: total revenue (int cents) and row count of
    lineitems whose quantity is below 20% of their part's average
    quantity — the classic correlated-average subquery.

    Two passes over lineitem, never a self-join: pass 1 builds the
    per-part (Σqty, count) aggregate (wide key → gated finisher);
    pass 2 broadcasts it and filters each batch with EXACT integer
    arithmetic: ``qty < Σqty/(5·cnt)  ⇔  qty·5·cnt < Σqty``."""
    def qty_partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        q = pc.cast(_round_half_away(b["l_quantity"]), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(zero_copy_only=False),
            "tot_qty": q, "cnt": np.ones(len(q), np.int64)}) \
            .groupby("l_partkey", sort=False) \
            .agg(tot_qty=("tot_qty", "sum"),
                 cnt=("cnt", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_part = _sum_count_by_key(
        lineitem.map_batches(qty_partial, batch_format="pyarrow")
        .materialize(), "l_partkey", "tot_qty", "cnt")
    from aida_ray.state.collect import collect_table
    pt = collect_table(per_part, schema=pa.schema(
        [("l_partkey", pa.int64()), ("tot_qty", pa.int64()),
         ("cnt", pa.int64())]))
    pk = pt["l_partkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(pk, kind="stable")
    agg_ref = ray.put((
        pk[order],
        pt["tot_qty"].to_numpy(zero_copy_only=False)[order],
        pt["cnt"].to_numpy(zero_copy_only=False)[order]))

    def filter_partial(b: pa.Table) -> pa.Table:
        pkeys, tot, cnt = _get_cached(agg_ref)
        lp = b["l_partkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(pkeys, lp)
        # every lineitem partkey is in the pass-1 aggregate by
        # construction (same table), so the lookup always hits
        q = pc.cast(_round_half_away(b["l_quantity"]), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        keep = q * 5 * cnt[i] < tot[i]
        cents = _cents(b["l_extendedprice"]).to_numpy(
            zero_copy_only=False)[keep]
        return pa.table({
            "revenue_cents": pa.array([int(cents.sum())], pa.int64()),
            "n_rows": pa.array([int(keep.sum())], pa.int64())})

    from aida_ray.state.collect import collect_table
    parts = collect_table(
        lineitem.map_batches(filter_partial, batch_format="pyarrow"),
        schema=pa.schema([("revenue_cents", pa.int64()),
                          ("n_rows", pa.int64())]))
    return pa.table({
        "revenue_cents": pa.array(
            [int(pc.sum(parts["revenue_cents"]).as_py() or 0)],
            pa.int64()),
        "n_rows": pa.array([int(pc.sum(parts["n_rows"]).as_py() or 0)],
                           pa.int64())})


def big_orders(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
               customer: pa.Table, min_qty: int = 300
               ) -> pa.Table:
    """TPC-H-Q18 shape: orders whose total lineitem quantity exceeds
    ``min_qty``, with their customer — a HAVING-filtered groupby whose
    qualifying set is then joined back.

    The per-order quantity sum is the wide-key aggregate (orderkeys
    are corpus-scale) → gated finisher / bucketed combine; the
    qualifying set is small by construction, so the join-back is a
    broadcast semi-join inside the orders map, and the customer
    dimension broadcasts the same way.  Returns a driver-side table
    (the result is HAVING-bounded)."""
    def qty_partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        q = pc.cast(_round_half_away(b["l_quantity"]), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        g = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(zero_copy_only=False),
            "tot_qty": q, "cnt": np.ones(len(q), np.int64)}) \
            .groupby("l_orderkey", sort=False) \
            .agg(tot_qty=("tot_qty", "sum"),
                 cnt=("cnt", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_order = _sum_count_by_key(
        lineitem.map_batches(qty_partial, batch_format="pyarrow")
        .materialize(), "l_orderkey", "tot_qty", "cnt")
    qual = per_order.filter(expr=f"tot_qty > {min_qty}")
    from aida_ray.state.collect import collect_table
    qt = collect_table(qual)
    qk = qt["l_orderkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(qk, kind="stable")
    qual_ref = ray.put((qk[order],
                        qt["tot_qty"].to_numpy(
                            zero_copy_only=False)[order]))

    ck = customer["c_custkey"].to_numpy()
    cnames = np.asarray(customer["c_name"].to_pylist(), dtype=object)
    c_order = np.argsort(ck, kind="stable")
    cust_ref = ray.put((ck[c_order], cnames[c_order]))

    def attach(b: pa.Table) -> pa.Table:
        okeys, oqty = _get_cached(qual_ref)
        ok = b["o_orderkey"].to_numpy(zero_copy_only=False)
        i = np.searchsorted(okeys, ok)
        i_clip = np.minimum(i, len(okeys) - 1) if len(okeys) \
            else np.zeros(len(ok), np.int64)
        hit = okeys[i_clip] == ok if len(okeys) \
            else np.zeros(len(ok), bool)
        t = b.filter(pa.array(hit))
        qty_hit = oqty[i_clip[hit]]
        ckeys, cnm = _get_cached(cust_ref)
        cu = t["o_custkey"].to_numpy(zero_copy_only=False)
        # guarded probe (tpch_wide._probe convention): an o_custkey
        # missing from the customer dimension must drop the row, not
        # IndexError past max(ckeys) or alias a neighbouring name
        ci = np.searchsorted(ckeys, cu)
        ci_clip = np.minimum(ci, len(ckeys) - 1) if len(ckeys) \
            else np.zeros(len(cu), np.int64)
        chit = ckeys[ci_clip] == cu if len(ckeys) \
            else np.zeros(len(cu), bool)
        t = t.filter(pa.array(chit))
        return pa.table({
            "c_name": pa.array(list(cnm[ci_clip[chit]])),
            "c_custkey": t["o_custkey"],
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": pc.strftime(t["o_orderdate"],
                                       format="%Y-%m-%d"),
            "total_price_cents": _cents(t["o_totalprice"]),
            "sum_qty": pa.array(qty_hit[chit], pa.int64())})

    out = orders.map_batches(attach, batch_format="pyarrow")
    from aida_ray.state.collect import collect_table
    t = collect_table(out).combine_chunks()
    idx = pc.sort_indices(t, sort_keys=[("sum_qty", "descending"),
                                        ("o_orderkey", "ascending")])
    return t.take(idx)


def idle_high_balance(customer: ray.data.Dataset,
                      orders: ray.data.Dataset,
                      cutoff: str = "2000-01-01") -> ray.data.Dataset:
    """TPC-H-Q22 shape: per nation, count + total balance of customers
    whose account balance is above the global positive-balance average
    and who placed NO order since ``cutoff``.

    The global average is two partial scalars (Σ positive cents, n);
    the above-average test is exact integer (``bal·n > Σ``); the
    "no recent orders" predicate is a distributed left_anti hash join
    (both sides corpus-scale at 100 TB — a broadcast of all recent
    custkeys would not hold); the final rollup has bounded keys."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"]).to_numpy(zero_copy_only=False)
        pos = cents[cents > 0]
        return pa.table({"s": pa.array([int(pos.sum())], pa.int64()),
                         "n": pa.array([len(pos)], pa.int64())})

    parts = pa.concat_tables([ray.get(r) for r in customer.map_batches(
        bal_partial, batch_format="pyarrow").to_arrow_refs()])
    s = int(pc.sum(parts["s"]).as_py() or 0)
    n = int(pc.sum(parts["n"]).as_py() or 0)

    def above_avg(b: pa.Table) -> pa.Table:
        cents = _cents(b["c_acctbal"])
        keep = pc.greater(pc.multiply(cents, pa.scalar(n, pa.int64())),
                          pa.scalar(s, pa.int64()))
        t = b.filter(keep)
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "bal_cents": _cents(t["c_acctbal"])})

    rich = customer.map_batches(above_avg, batch_format="pyarrow")
    cut = pa.scalar(np.datetime64(cutoff + "T00:00:00", "us"),
                    pa.timestamp("us"))

    def recent(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["o_orderdate"], cut))
        return pa.table({"o_custkey": t["o_custkey"]})

    idle = hash_join(rich,
                     orders.map_batches(recent, batch_format="pyarrow"),
                     on=("c_custkey",), right_on=("o_custkey",),
                     join_type="left_anti")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pa.table({"c_nationkey": b["c_nationkey"],
                      "bal_cents": b["bal_cents"]}).to_pandas() \
            .groupby("c_nationkey", sort=False) \
            .agg(n_custs=("bal_cents", "size"),
                 total_bal_cents=("bal_cents", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = idle.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_nationkey").aggregate(Sum("n_custs"),
                                          Sum("total_bal_cents"))
    return agg.map_batches(lambda b: pa.table({
        "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
        "n_custs": pc.cast(b["sum(n_custs)"], pa.int64()),
        "total_bal_cents": pc.cast(b["sum(total_bal_cents)"],
                                   pa.int64())}),
        batch_format="pyarrow")


def late_only_suppliers(lineitem: ray.data.Dataset,
                        orders: ray.data.Dataset,
                        late_days: int = 90,
                        limit: int = 20) -> pa.Table:
    """TPC-H-Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order — per supplier, the count of such orders.

    Plan (two bucketed distinct-aggregation levels, no per-key
    Python):

    1. lineitem ⋈ orders (large-large hash shuffle) attaches the order
       date; ``late = l_shipdate > o_orderdate + late_days``;
    2. level 1: distinct (orderkey, suppkey) with OR-combined late
       flag — per-batch pandas dedup, then ``bucket_reduce`` max;
    3. level 2: per orderkey — supplier count, late-supplier count and
       ``max((sk+1)·late)`` (when exactly one supplier is late, the
       max IS that supplier; +1 keeps suppkey 0 distinguishable);
    4. qualifying orders (≥2 suppliers, exactly 1 late) groupby the
       guilty supplier — bounded by the supplier dimension.

    Ties break on (numwait DESC, s_suppkey) — a total order, so the
    LIMIT is deterministic."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from aida_ray.stages.agg import bucket_reduce
    from aida_ray.stages.shuffle_join import hash_join

    def li_side(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "ship_us": pc.cast(pc.cast(b["l_shipdate"],
                                       pa.timestamp("us")), pa.int64())})

    def o_side(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "odate_us": pc.cast(pc.cast(b["o_orderdate"],
                                        pa.timestamp("us")), pa.int64())})

    late_us = late_days * 86_400_000_000
    o = orders.map_batches(o_side, batch_format="pyarrow") \
        .materialize()

    # adaptive: (orderkey, date) broadcasts while it fits the budget —
    # the late flag then computes inside the lineitem map with no
    # shuffle join at all; above the budget the hash shuffle join runs
    broadcast_rows = 8_000_000
    if o.count() <= broadcast_rows:
        from aida_ray.state.collect import collect_table
        ot = collect_table(o)
        okey = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(okey, kind="stable")
        odate = ot["odate_us"].to_numpy(zero_copy_only=False)[order]
        oref = ray.put((okey[order], odate))

        def bcast_pairs(b: pa.Table) -> pa.Table:
            ok_s, od = _get_cached(oref)
            lk = b["l_orderkey"].to_numpy(zero_copy_only=False)
            i = np.searchsorted(ok_s, lk)
            i_clip = np.minimum(i, len(ok_s) - 1) if len(ok_s) \
                else np.zeros(len(lk), np.int64)
            hit = ok_s[i_clip] == lk if len(ok_s) \
                else np.zeros(len(lk), bool)
            ship = pc.cast(pc.cast(b["l_shipdate"],
                                   pa.timestamp("us")),
                           pa.int64()).to_numpy(
                zero_copy_only=False)[hit]
            late = (ship > od[i_clip[hit]] + late_us).astype("int64")
            g = pd.DataFrame({
                "ok": lk[hit],
                "sk": b["l_suppkey"].to_numpy(
                    zero_copy_only=False)[hit],
                "late": late}) \
                .groupby(["ok", "sk"], sort=False) \
                .agg(late=("late", "max")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        pair_partials = lineitem.map_batches(bcast_pairs,
                                             batch_format="pyarrow")
    else:
        joined = hash_join(
            lineitem.map_batches(li_side, batch_format="pyarrow"),
            o, on=("l_orderkey",), right_on=("o_orderkey",))

        def pair_partial(b: pa.Table) -> pa.Table:
            late = (b["ship_us"].to_numpy(zero_copy_only=False)
                    > b["odate_us"].to_numpy(zero_copy_only=False)
                    + late_us).astype("int64")
            g = pd.DataFrame({
                "ok": b["l_orderkey"].to_numpy(zero_copy_only=False),
                "sk": b["l_suppkey"].to_numpy(zero_copy_only=False),
                "late": late}) \
                .groupby(["ok", "sk"], sort=False) \
                .agg(late=("late", "max")).reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        pair_partials = joined.map_batches(pair_partial,
                                           batch_format="pyarrow")

    pairs = bucket_reduce(pair_partials, ["ok", "sk"], {"late": "max"})

    def order_partial(b: pa.Table) -> pa.Table:
        if not isinstance(b, pa.Table):
            b = pa.Table.from_pandas(b, preserve_index=False)
        sk = b["sk"].to_numpy(zero_copy_only=False).astype("int64")
        late = b["late"].to_numpy(zero_copy_only=False).astype("int64")
        g = pd.DataFrame({
            "ok": b["ok"].to_numpy(zero_copy_only=False),
            "one": np.ones(len(sk), np.int64), "late": late,
            "m": (sk + 1) * late}) \
            .groupby("ok", sort=False) \
            .agg(n=("one", "sum"), n_late=("late", "sum"),
                 m=("m", "max")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_order = bucket_reduce(
        pairs.map_batches(order_partial, batch_format="pyarrow"),
        ["ok"], {"n": "sum", "n_late": "sum", "m": "max"})

    def qualify(b: pa.Table) -> pa.Table:
        if not isinstance(b, pa.Table):
            b = pa.Table.from_pandas(b, preserve_index=False)
        keep = pc.and_(pc.greater_equal(b["n"], pa.scalar(2)),
                       pc.equal(b["n_late"], pa.scalar(1)))
        t = b.filter(keep)
        sk = pc.subtract(pc.cast(t["m"], pa.int64()),
                         pa.scalar(1, pa.int64()))
        g = pd.DataFrame({"s_suppkey": sk.to_numpy(
            zero_copy_only=False),
            "numwait": np.ones(len(t), np.int64)}) \
            .groupby("s_suppkey", sort=False) \
            .agg(numwait=("numwait", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = per_order.map_batches(qualify, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Sum("numwait"))
    top = agg.map_batches(lambda b: pa.table({
        "s_suppkey": pc.cast(b["s_suppkey"], pa.int64()),
        "numwait": pc.cast(b["sum(numwait)"], pa.int64())}),
        batch_format="pyarrow") \
        .sort(["numwait", "s_suppkey"], descending=[True, False]) \
        .limit(limit)
    from aida_ray.state.collect import collect_table
    return collect_table(top)
