"""The remaining classic TPC-H plan shapes (Q4/Q7/Q8/Q9/Q10/Q13/Q15/
Q16/Q19/Q20) plus the correlated above-average filter, adapted to the
synthetic schema (no partsupp table, no commit/receipt dates — each
docstring states its deviation).

Scale conventions (same as `relational.py` / `tpch_more.py`):

- money is EXACT int64 cents / centi-cents (`_cents`, disc as int pct)
  so sums are reduction-order-free and the DuckDB oracle hash-matches;
- true dimensions (nation / region / supplier / customer / part) ride
  `ray.put` broadcasts with sorted-key `searchsorted` probes;
- fact⋈fact joins go through `adaptive_fact_join`: while the projected
  build side fits the broadcast budget it ships ONCE and the join folds
  into the probe map (a Ray hash shuffle join spins an aggregator actor
  pool with seconds of fixed latency — see PERF.md); above the budget
  the genuine sized hash SHUFFLE join runs;
- per-batch partial aggregation ahead of every groupby, so the shuffle
  carries (keys × blocks) rows, never the fact table.

Reference parity: these are the query shapes the reference's relational
surface is exercised with (SURVEY.md §2.5/§2.6 aggregation + top-k
families); the NED-side provenance lives in the modules they reuse.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _concat_blocks, _get_cached
from aida_ray.stages.relational import _cents, _round_half_away

BROADCAST_ROWS = 8_000_000


def _gather(ds: ray.data.Dataset,
            schema: "pa.Schema | None" = None) -> pa.Table:
    """Driver-side gather of a SMALL dataset (callers gate on row
    counts).  Guards the two to_arrow_refs quirks: raw pandas blocks
    (empty map_groups outputs leak through groupbys unconverted) and
    zero-block datasets."""
    from aida_ray.state.collect import collect_table
    return collect_table(ds, schema)


def _col_np(col, dtype=None):
    """Column → numpy; strings come back as object arrays."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return np.asarray(col.to_pylist(), dtype=object)
    a = col.to_numpy(zero_copy_only=False)
    return a.astype(dtype) if dtype is not None else a


def _sorted_dim(table: pa.Table, key: str, cols: list[str]):
    """Broadcast a dimension as (sorted int64 keys, {col: aligned
    values}); probe with `_probe` inside map_batches."""
    k = _col_np(table[key]).astype("int64")
    order = np.argsort(k, kind="stable")
    vals = {c: _col_np(table[c])[order] for c in cols}
    return ray.put((k[order], vals))


def _probe(sorted_keys: np.ndarray, probe: np.ndarray):
    """searchsorted lookup → (index, hit-mask) with inner-join
    semantics (missing probe keys are dropped by the caller)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(probe), np.int64), np.zeros(len(probe), bool)
    i = np.searchsorted(sorted_keys, probe)
    i = np.minimum(i, len(sorted_keys) - 1)
    return i, sorted_keys[i] == probe


def _disc_pct(col) -> np.ndarray:
    return pc.cast(_round_half_away(pc.multiply(col, 100.0)),
                   pa.int64()).to_numpy(zero_copy_only=False)


def _qty_int(col) -> np.ndarray:
    return pc.cast(_round_half_away(col), pa.int64()) \
        .to_numpy(zero_copy_only=False)


def _distinct_int64(partials: ray.data.Dataset, col: str,
                    task_gate_rows: int = 20_000_000
                    ) -> ray.data.Dataset:
    """Global distinct of an int64 column whose per-block partials are
    already deduped (so volume is bounded by keys × blocks): ONE numpy
    unique task below the gate (Ray's sort-based Aggregate pays Python
    per key — ruinous at 10^4+ keys, see PERF.md), the int-keyed
    groupby above it."""
    p = partials.materialize()
    if p.count() <= task_gate_rows:
        @ray.remote
        def uniq(*tabs: pa.Table) -> pa.Table:
            t = _concat_blocks(tabs, pa.schema([(col, pa.int64())]))
            k = np.unique(t[col].to_numpy(zero_copy_only=False))
            return pa.table({col: pa.array(k, pa.int64())})

        return ray.data.from_arrow_refs([uniq.remote(*p.to_arrow_refs())])
    return p.groupby(col).count().map_batches(
        lambda b: pa.table({col: b[col]}), batch_format="pyarrow")


def adaptive_fact_join(left: ray.data.Dataset, right: ray.data.Dataset,
                       lkey: str, rkey: str,
                       broadcast_rows: int = BROADCAST_ROWS
                       ) -> ray.data.Dataset:
    """Inner equi-join of a streaming fact (`left`) with a PROJECTED
    fact (`right`, already column-pruned/filtered).

    While the projected right side fits the broadcast budget it ships
    once via ``ray.put`` and the join is a map-side sorted-array probe
    (no shuffle, no aggregator pool); above the budget both sides run
    through the sized hash shuffle join.  Output schema in both routes:
    left columns + right columns minus ``rkey``.

    CONTRACT: ``rkey`` must be UNIQUE on the right side (a projected
    fact keyed by its primary key — every call site here joins on
    o_orderkey).  The broadcast probe attaches exactly one build row
    per probe row, so duplicate build keys would silently diverge
    from the shuffle route's join multiplicity; the broadcast route
    assert-guards it."""
    from aida_ray.stages.shuffle_join import hash_join

    r = right.materialize()
    if r.count() <= broadcast_rows:
        rt = _gather(r)
        rcols = [c for c in rt.column_names if c != rkey]
        # pin the attached columns' Arrow types: an EMPTY build side
        # must not degrade string columns to null-typed arrays
        rtypes = {c: rt.schema.field(c).type for c in rcols}
        ks = np.sort(_col_np(rt[rkey]).astype("int64"))
        assert not (ks[1:] == ks[:-1]).any(), \
            "adaptive_fact_join: right-side key must be unique"
        ref = _sorted_dim(rt, rkey, rcols)

        def joinb(b: pa.Table) -> pa.Table:
            keys, vals = _get_cached(ref)
            i, hit = _probe(keys, _col_np(b[lkey]).astype("int64"))
            t = b.filter(pa.array(hit))
            out = {c: t[c] for c in t.column_names}
            for c in rcols:
                v = vals[c][i[hit]]
                out[c] = pa.array(list(v), type=rtypes[c]) \
                    if v.dtype == object else pa.array(v)
            return pa.table(out)

        return left.map_batches(joinb, batch_format="pyarrow")
    return hash_join(left, r, on=(lkey,), right_on=(rkey,))


# ---------------------------------------------------------------- Q4


def exists_priority_counts(orders: ray.data.Dataset,
                           lineitem: ray.data.Dataset,
                           qty_threshold: float = 45.0
                           ) -> ray.data.Dataset:
    """TPC-H-Q4 shape: order counts per priority for orders where
    EXISTS a lineitem above a quantity threshold (the schema has no
    commitdate, so the reference's "late delivery" EXISTS predicate is
    adapted to quantity — the plan shape is identical: uncorrelated
    EXISTS ⇒ distinct-key semi-join).

    Qualifying orderkeys are deduped per batch, made globally distinct
    by the gated unique finisher, then the semi-join against orders is
    ADAPTIVE: broadcast `is_in` below the budget, hash left_semi join
    above it."""
    from ray.data.aggregate import Sum

    from aida_ray.stages.shuffle_join import hash_join

    def pk(b: pa.Table) -> pa.Table:
        q = b["l_quantity"].to_numpy(zero_copy_only=False)
        k = b["l_orderkey"].to_numpy(zero_copy_only=False)[
            q > qty_threshold]
        return pa.table({"k": pa.array(np.unique(k), pa.int64())})

    keys = _distinct_int64(
        lineitem.map_batches(pk, batch_format="pyarrow"), "k") \
        .materialize()

    if keys.count() <= BROADCAST_ROWS:
        arr = np.sort(_gather(keys)["k"].to_numpy(zero_copy_only=False))
        kref = ray.put(arr)

        def partial(b: pa.Table) -> pa.Table:
            import pandas as pd
            # searchsorted membership: pc.is_in rebuilds its value-set
            # hash memo per kernel call — O(|set|) per batch at 8M keys
            _, hit = _probe(_get_cached(kref),
                            _col_np(b["o_orderkey"]).astype("int64"))
            prio = np.asarray(
                b.filter(pa.array(hit))["o_orderpriority"].to_pylist(),
                dtype=object)
            g = pd.DataFrame({"o_orderpriority": prio}) \
                .groupby("o_orderpriority", sort=False) \
                .size().rename("n").reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = orders.map_batches(partial, batch_format="pyarrow") \
            .groupby("o_orderpriority").aggregate(Sum("n"))
    else:
        proj = orders.map_batches(
            lambda b: pa.table({"o_orderkey": b["o_orderkey"],
                                "o_orderpriority": b["o_orderpriority"]}),
            batch_format="pyarrow")
        semi = hash_join(proj, keys, on=("o_orderkey",),
                         right_on=("k",), join_type="left_semi")

        def partial2(b: pa.Table) -> pa.Table:
            import pandas as pd
            g = pd.DataFrame({"o_orderpriority": np.asarray(
                b["o_orderpriority"].to_pylist(), dtype=object)}) \
                .groupby("o_orderpriority", sort=False) \
                .size().rename("n").reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        agg = semi.map_batches(partial2, batch_format="pyarrow") \
            .groupby("o_orderpriority").aggregate(Sum("n"))

    return agg.map_batches(lambda b: pa.table({
        "o_orderpriority": b["o_orderpriority"],
        "order_count": pc.cast(b["sum(n)"], pa.int64())}),
        batch_format="pyarrow")


# ---------------------------------------------------------------- Q7


def nation_pair_volume(lineitem: ray.data.Dataset,
                       orders: ray.data.Dataset,
                       customer: pa.Table, supplier: pa.Table,
                       nation: pa.Table,
                       nation_a: str = "NATION_3",
                       nation_b: str = "NATION_15",
                       lo: str = "1996-01-01", hi: str = "1998-01-01"
                       ) -> ray.data.Dataset:
    """TPC-H-Q7 shape: cross-border revenue between two nations by
    (supplier nation, customer nation, ship year).

    Both nation filters push DOWN: the customer side filters to the
    two nations BEFORE the orders projection (so the orders build side
    of the fact join shrinks to the two nations' orders), and the
    supplier filter is applied map-side in the lineitem pass.  Revenue
    is exact int64 centi-cents."""
    from ray.data.aggregate import Sum

    nk = _col_np(nation["n_nationkey"]).astype("int64")
    nm = _col_np(nation["n_name"])
    key_of = {n: int(nk[list(nm).index(n)]) for n in (nation_a, nation_b)}
    name_of = {v: k for k, v in key_of.items()}

    ck = _col_np(customer["c_custkey"]).astype("int64")
    cn = _col_np(customer["c_nationkey"]).astype("int64")
    ckeep = np.isin(cn, list(key_of.values()))
    c_order = np.argsort(ck[ckeep], kind="stable")
    cref = ray.put((ck[ckeep][c_order], cn[ckeep][c_order]))

    sk = _col_np(supplier["s_suppkey"]).astype("int64")
    sn = _col_np(supplier["s_nationkey"]).astype("int64")
    s_order = np.argsort(sk, kind="stable")
    sref = ray.put((sk[s_order], sn[s_order]))

    def o_side(b: pa.Table) -> pa.Table:
        cks, cns = _get_cached(cref)
        i, hit = _probe(cks, _col_np(b["o_custkey"]).astype("int64"))
        return pa.table({
            "o_orderkey": b["o_orderkey"].filter(pa.array(hit)),
            "cust_nk": pa.array(cns[i[hit]], pa.int64())})

    lo_ts = pa.scalar(np.datetime64(lo + "T00:00:00", "us"),
                      pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi + "T00:00:00", "us"),
                      pa.timestamp("us"))

    def li_side(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["l_shipdate"], lo_ts),
                       pc.less(b["l_shipdate"], hi_ts))
        t = b.filter(keep)
        sks, sns = _get_cached(sref)
        i, hit = _probe(sks, _col_np(t["l_suppkey"]).astype("int64"))
        snk = sns[i]
        hit &= np.isin(snk, list(name_of.keys()))
        t = t.filter(pa.array(hit))
        rev = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False) * (100 - _disc_pct(t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "supp_nk": pa.array(snk[hit], pa.int64()),
            "l_year": pc.year(t["l_shipdate"]),
            "volume_cc": pa.array(rev, pa.int64())})

    o = orders.map_batches(o_side, batch_format="pyarrow")
    li = lineitem.map_batches(li_side, batch_format="pyarrow")
    joined = adaptive_fact_join(li, o, "l_orderkey", "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        snk = _col_np(b["supp_nk"]).astype("int64")
        cnk = _col_np(b["cust_nk"]).astype("int64")
        keep = snk != cnk        # cross-border only
        g = pd.DataFrame({
            "supp_nk": snk[keep], "cust_nk": cnk[keep],
            "l_year": _col_np(b["l_year"]).astype("int64")[keep],
            "volume_cc": _col_np(b["volume_cc"])[keep]}) \
            .groupby(["supp_nk", "cust_nk", "l_year"], sort=False) \
            .agg(volume_cc=("volume_cc", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby(["supp_nk", "cust_nk", "l_year"]) \
        .aggregate(Sum("volume_cc"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "supp_nation": pa.array(
                [name_of[int(x)] for x in b["supp_nk"].to_pylist()]),
            "cust_nation": pa.array(
                [name_of[int(x)] for x in b["cust_nk"].to_pylist()]),
            "l_year": pc.cast(b["l_year"], pa.int64()),
            "revenue_cc": pc.cast(b["sum(volume_cc)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------- Q8


def market_share(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                 customer: pa.Table, supplier: pa.Table,
                 part: pa.Table, nation: pa.Table, region: pa.Table,
                 target_nation: str = "NATION_12",
                 region_name: str = "ASIA",
                 p_type: str = "STANDARD",
                 lo: str = "1996-01-01", hi: str = "1998-01-01"
                 ) -> ray.data.Dataset:
    """TPC-H-Q8 shape: the target nation's share of a regional market
    (one part type, customers in one region) per order year.

    Every dimension filter pushes into a broadcast set; the only
    fact⋈fact edge is lineitem⋈orders via `adaptive_fact_join`.  The
    share is ONE double division of two exact int64 sums per year, so
    DuckDB reproduces it bit-for-bit."""
    from ray.data.aggregate import Sum

    rk = _col_np(region["r_regionkey"]).astype("int64")[
        list(_col_np(region["r_name"])).index(region_name)]
    nk = _col_np(nation["n_nationkey"]).astype("int64")
    region_nations = set(nk[_col_np(
        nation["n_regionkey"]).astype("int64") == rk].tolist())
    target_nk = int(nk[list(_col_np(nation["n_name"])).index(
        target_nation)])

    ck = _col_np(customer["c_custkey"]).astype("int64")
    cn = _col_np(customer["c_nationkey"]).astype("int64")
    in_region = np.isin(cn, list(region_nations))
    c_order = np.argsort(ck[in_region], kind="stable")
    cref = ray.put(ck[in_region][c_order])

    pk = _col_np(part["p_partkey"]).astype("int64")
    pkeep = np.sort(pk[_col_np(part["p_type"]) == p_type])

    sk = _col_np(supplier["s_suppkey"]).astype("int64")
    sn = _col_np(supplier["s_nationkey"]).astype("int64")
    s_order = np.argsort(sk, kind="stable")
    # ONE ref for everything li_side probes: the worker-side
    # _get_cached memo holds a single slot, so two refs fetched per
    # batch would evict each other every call
    li_ref = ray.put((pkeep, sk[s_order], sn[s_order]))

    lo_ts = pa.scalar(np.datetime64(lo + "T00:00:00", "us"),
                      pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi + "T00:00:00", "us"),
                      pa.timestamp("us"))

    def o_side(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], lo_ts),
                       pc.less(b["o_orderdate"], hi_ts))
        t = b.filter(keep)
        cks = _get_cached(cref)
        i, hit = _probe(cks, _col_np(t["o_custkey"]).astype("int64"))
        t = t.filter(pa.array(hit))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_year": pc.year(t["o_orderdate"])})

    def li_side(b: pa.Table) -> pa.Table:
        pkeys, sks, sns = _get_cached(li_ref)
        _, pkhit = _probe(pkeys, _col_np(b["l_partkey"]).astype("int64"))
        t = b.filter(pa.array(pkhit))
        i, hit = _probe(sks, _col_np(t["l_suppkey"]).astype("int64"))
        t = t.filter(pa.array(hit))
        is_target = (sns[i[hit]] == target_nk)
        rev = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False) * (100 - _disc_pct(t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "volume_cc": pa.array(rev, pa.int64()),
            "target_cc": pa.array(np.where(is_target, rev, 0),
                                  pa.int64())})

    o = orders.map_batches(o_side, batch_format="pyarrow")
    li = lineitem.map_batches(li_side, batch_format="pyarrow")
    joined = adaptive_fact_join(li, o, "l_orderkey", "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pd.DataFrame({
            "o_year": _col_np(b["o_year"]).astype("int64"),
            "volume_cc": _col_np(b["volume_cc"]),
            "target_cc": _col_np(b["target_cc"])}) \
            .groupby("o_year", sort=False) \
            .agg(volume_cc=("volume_cc", "sum"),
                 target_cc=("target_cc", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_year").aggregate(Sum("volume_cc"), Sum("target_cc"))

    def finish(b: pa.Table) -> pa.Table:
        tot = _col_np(b["sum(volume_cc)"]).astype("int64")
        tgt = _col_np(b["sum(target_cc)"]).astype("int64")
        return pa.table({
            "o_year": pc.cast(b["o_year"], pa.int64()),
            "total_cc": pa.array(tot, pa.int64()),
            "target_cc": pa.array(tgt, pa.int64()),
            "mkt_share": pa.array(
                tgt.astype("float64") / tot.astype("float64"),
                pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------- Q9


def product_profit(lineitem: ray.data.Dataset, orders: ray.data.Dataset,
                   supplier: pa.Table, part: pa.Table, nation: pa.Table,
                   name_substr: str = "widget") -> ray.data.Dataset:
    """TPC-H-Q9 shape: profit per (supplier nation, order year) for
    parts whose name contains a substring.  No partsupp table in this
    schema, so supply cost is the part's retail price × quantity —
    the plan (two dimension broadcasts + one fact⋈fact year lookup +
    bounded-key groupby) is unchanged.

    amount_cc = ext_cents·(100−disc) − retail_cents·100·qty, all
    int64.  int64 headroom: per-row |amount| < 2^33 at TPC-H prices,
    so a per-(nation,year) group overflows only past ~10^9 rows per
    group — repartition years first if a 100 TB corpus concentrates in
    one year."""
    from ray.data.aggregate import Sum

    nk = _col_np(nation["n_nationkey"]).astype("int64")
    nm = _col_np(nation["n_name"])
    n_order = np.argsort(nk, kind="stable")
    nk, nm = nk[n_order], nm[n_order]

    sk = _col_np(supplier["s_suppkey"]).astype("int64")
    sn = _col_np(supplier["s_nationkey"]).astype("int64")
    s_order = np.argsort(sk, kind="stable")

    mask = pc.match_substring(part["p_name"], name_substr) \
        .to_numpy(zero_copy_only=False)
    pk = _col_np(part["p_partkey"]).astype("int64")[mask]
    retail = _cents(part["p_retailprice"]).to_numpy(
        zero_copy_only=False)[mask]
    p_order = np.argsort(pk, kind="stable")
    # ONE ref per map fn (single-slot _get_cached memo, see
    # market_share)
    li_ref = ray.put((pk[p_order], retail[p_order],
                      sk[s_order], sn[s_order]))

    def o_side(b: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": b["o_orderkey"],
                         "o_year": pc.year(b["o_orderdate"])})

    def li_side(b: pa.Table) -> pa.Table:
        pks, rtl, sks, sns = _get_cached(li_ref)
        i, hit = _probe(pks, _col_np(b["l_partkey"]).astype("int64"))
        t = b.filter(pa.array(hit))
        j, shit = _probe(sks, _col_np(t["l_suppkey"]).astype("int64"))
        t = t.filter(pa.array(shit))
        rev = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False) * (100 - _disc_pct(t["l_discount"]))
        cost = rtl[i[hit]][shit] * 100 * _qty_int(t["l_quantity"])
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "supp_nk": pa.array(sns[j[shit]], pa.int64()),
            "amount_cc": pa.array(rev - cost, pa.int64())})

    o = orders.map_batches(o_side, batch_format="pyarrow")
    li = lineitem.map_batches(li_side, batch_format="pyarrow")
    joined = adaptive_fact_join(li, o, "l_orderkey", "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pd.DataFrame({
            "supp_nk": _col_np(b["supp_nk"]).astype("int64"),
            "o_year": _col_np(b["o_year"]).astype("int64"),
            "amount_cc": _col_np(b["amount_cc"])}) \
            .groupby(["supp_nk", "o_year"], sort=False) \
            .agg(amount_cc=("amount_cc", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = joined.map_batches(partial, batch_format="pyarrow") \
        .groupby(["supp_nk", "o_year"]).aggregate(Sum("amount_cc"))

    def finish(b: pa.Table) -> pa.Table:
        i = np.searchsorted(nk, _col_np(b["supp_nk"]).astype("int64"))
        return pa.table({
            "n_name": pa.array(list(nm[i])),
            "o_year": pc.cast(b["o_year"], pa.int64()),
            "profit_cc": pc.cast(b["sum(amount_cc)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------------------------- Q10


def returned_top_customers(lineitem: ray.data.Dataset,
                           orders: ray.data.Dataset,
                           customer: pa.Table, nation: pa.Table,
                           lo: str = "1997-01-01",
                           hi: str = "1997-04-01",
                           k: int = 20) -> pa.Table:
    """TPC-H-Q10 shape: top-k customers by revenue lost to returned
    items (l_returnflag = 'R') for orders in one quarter.

    Shape: date-filtered orders projection joins map-side
    (`adaptive_fact_join`); the per-customer revenue groupby is
    bounded by the customer dimension; the top-k gathers only the
    aggregate.  Total order (revenue DESC, custkey ASC) makes the
    LIMIT deterministic."""
    from ray.data.aggregate import Sum

    lo_ts = pa.scalar(np.datetime64(lo + "T00:00:00", "us"),
                      pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi + "T00:00:00", "us"),
                      pa.timestamp("us"))

    def o_side(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["o_orderdate"], lo_ts),
                       pc.less(b["o_orderdate"], hi_ts))
        t = b.filter(keep)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    def li_side(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["l_returnflag"], pa.scalar("R")))
        rev = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False) * (100 - _disc_pct(t["l_discount"]))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_cc": pa.array(rev, pa.int64())})

    o = orders.map_batches(o_side, batch_format="pyarrow")
    li = lineitem.map_batches(li_side, batch_format="pyarrow")
    joined = adaptive_fact_join(li, o, "l_orderkey", "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pd.DataFrame({
            "c_custkey": _col_np(b["o_custkey"]).astype("int64"),
            "rev_cc": _col_np(b["rev_cc"])}) \
            .groupby("c_custkey", sort=False) \
            .agg(rev_cc=("rev_cc", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _gather(joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("c_custkey").aggregate(Sum("rev_cc")))
    cust = _col_np(agg["c_custkey"]).astype("int64")
    rev = _col_np(agg["sum(rev_cc)"]).astype("int64")
    order = np.lexsort((cust, -rev))[:k]
    cust, rev = cust[order], rev[order]

    ck = _col_np(customer["c_custkey"]).astype("int64")
    c_order = np.argsort(ck, kind="stable")
    # guarded probes (_probe convention): drop aggregate rows whose
    # custkey is absent from the dimension instead of aliasing
    i, hit = _probe(ck[c_order], cust)
    cust, rev, i = cust[hit], rev[hit], i[hit]
    names = _col_np(customer["c_name"])[c_order][i]
    cnat = _col_np(customer["c_nationkey"]).astype("int64")[c_order][i]
    nk = _col_np(nation["n_nationkey"]).astype("int64")
    nm = _col_np(nation["n_name"])
    n_order = np.argsort(nk, kind="stable")
    j, nhit = _probe(nk[n_order], cnat)
    nnames = np.where(nhit, nm[n_order][j], None)
    return pa.table({
        "c_custkey": pa.array(cust, pa.int64()),
        "c_name": pa.array(list(names)),
        "n_name": pa.array(list(nnames)),
        "revenue_cc": pa.array(rev, pa.int64())})


# --------------------------------------------------------------- Q13


def customer_order_distribution(orders: ray.data.Dataset,
                                customer: pa.Table,
                                exclude_priority: str = "4-NOT SPECIFIED"
                                ) -> pa.Table:
    """TPC-H-Q13 shape: the distribution of customers by order count
    (customers with ZERO qualifying orders included — the LEFT JOIN).

    Per-customer counts partial-aggregate map-side; the counts-of-
    counts finisher runs over the customer-bounded aggregate; the zero
    bucket is total customers minus customers seen."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        t = b.filter(pc.not_equal(b["o_orderpriority"],
                                  pa.scalar(exclude_priority)))
        g = pd.DataFrame({
            "c_custkey": _col_np(t["o_custkey"]).astype("int64")}) \
            .groupby("c_custkey", sort=False) \
            .size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    per_cust = _gather(orders.map_batches(partial,
                                          batch_format="pyarrow")
                       .groupby("c_custkey").aggregate(Sum("n")))
    # LEFT JOIN semantics FROM customer: orphan o_custkeys (no
    # customer row) contribute nothing, like the SQL oracle
    known = np.sort(_col_np(customer["c_custkey"]).astype("int64"))
    ck = _col_np(per_cust["c_custkey"]).astype("int64")
    _, hit = _probe(known, ck)
    counts = _col_np(per_cust["sum(n)"]).astype("int64")[hit]
    vals, freq = np.unique(counts, return_counts=True)
    zero = len(customer) - len(counts)
    if zero > 0:
        vals = np.r_[0, vals]
        freq = np.r_[zero, freq]
    return pa.table({"c_count": pa.array(vals, pa.int64()),
                     "custdist": pa.array(freq.astype("int64"),
                                          pa.int64())})


# --------------------------------------------------------------- Q15


def top_supplier(lineitem: ray.data.Dataset, supplier: pa.Table,
                 lo: str = "1997-01-01", hi: str = "1997-04-01"
                 ) -> pa.Table:
    """TPC-H-Q15 shape: the supplier(s) with maximum revenue in a
    quarter (the revenue view + max subquery; ties all returned).

    Per-supplier partials are supplier-bounded, so the max filter and
    name attach run over the tiny aggregate."""
    from ray.data.aggregate import Sum

    lo_ts = pa.scalar(np.datetime64(lo + "T00:00:00", "us"),
                      pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi + "T00:00:00", "us"),
                      pa.timestamp("us"))

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        keep = pc.and_(pc.greater_equal(b["l_shipdate"], lo_ts),
                       pc.less(b["l_shipdate"], hi_ts))
        t = b.filter(keep)
        rev = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False) * (100 - _disc_pct(t["l_discount"]))
        g = pd.DataFrame({
            "s_suppkey": _col_np(t["l_suppkey"]).astype("int64"),
            "rev_cc": rev}) \
            .groupby("s_suppkey", sort=False) \
            .agg(rev_cc=("rev_cc", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = _gather(lineitem.map_batches(partial, batch_format="pyarrow")
                  .groupby("s_suppkey").aggregate(Sum("rev_cc")))
    if agg.num_rows == 0:      # nothing shipped in the window
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_revenue_cc": pa.array([], pa.int64())})
    supp = _col_np(agg["s_suppkey"]).astype("int64")
    rev = _col_np(agg["sum(rev_cc)"]).astype("int64")
    best = rev == rev.max()
    supp, rev = supp[best], rev[best]
    order = np.argsort(supp, kind="stable")
    supp, rev = supp[order], rev[order]
    sk = _col_np(supplier["s_suppkey"]).astype("int64")
    s_order = np.argsort(sk, kind="stable")
    names = _col_np(supplier["s_name"])[s_order][
        np.searchsorted(sk[s_order], supp)]
    return pa.table({
        "s_suppkey": pa.array(supp, pa.int64()),
        "s_name": pa.array(list(names)),
        "total_revenue_cc": pa.array(rev, pa.int64())})


# --------------------------------------------------------------- Q16


def supplier_part_counts(lineitem: ray.data.Dataset, part: pa.Table,
                         supplier: pa.Table,
                         exclude_brand: str = "Brand#1",
                         min_acctbal: float = 1000.0
                         ) -> ray.data.Dataset:
    """TPC-H-Q16 shape: COUNT(DISTINCT supplier) per part
    (brand, type, size), excluding one brand and "complaint"
    suppliers (no comment column — adapted to an acctbal floor).

    No partsupp table: the supplier↔part relation is WITNESSED by
    lineitem.  Each batch dedupes to distinct (attr-bucket, supplier)
    pairs packed into ONE int64 (attr index << 20 | suppkey), the
    global distinct is the gated unique finisher bounded by
    (brand×type×size) × suppliers, and the counts-of-suppliers
    finisher unpacks per attr bucket."""
    bad = np.sort(_col_np(supplier["s_suppkey"]).astype("int64")[
        _col_np(supplier["s_acctbal"]) < min_acctbal])

    keep_mask = _col_np(part["p_brand"]) != exclude_brand
    pk = _col_np(part["p_partkey"]).astype("int64")[keep_mask]
    brand = _col_np(part["p_brand"])[keep_mask]
    ptype = _col_np(part["p_type"])[keep_mask]
    psize = _col_np(part["p_size"]).astype("int64")[keep_mask]
    # attr bucket index over the distinct (brand, type, size) triples
    trip = np.array([f"{b}|{t}|{s}"
                     for b, t, s in zip(brand, ptype, psize)],
                    dtype=object)
    uniq, attr_idx = np.unique(trip, return_inverse=True)
    first = np.zeros(len(uniq), np.int64)
    first[attr_idx[::-1]] = np.arange(len(trip))[::-1]
    attrs = (brand[first], ptype[first], psize[first])
    p_order = np.argsort(pk, kind="stable")
    # ONE ref per map fn (single-slot _get_cached memo)
    pref = ray.put((pk[p_order], attr_idx[p_order].astype("int64"),
                    bad))
    assert len(uniq) < (1 << 42)

    def pairs(b: pa.Table) -> pa.Table:
        pks, ai, bad_supp = _get_cached(pref)
        i, hit = _probe(pks, _col_np(b["l_partkey"]).astype("int64"))
        supp = _col_np(b["l_suppkey"]).astype("int64")
        hit &= ~np.isin(supp, bad_supp)
        assert supp.max(initial=0) < (1 << 20)
        packed = (ai[i[hit]] << 20) | supp[hit]
        return pa.table({"p": pa.array(np.unique(packed), pa.int64())})

    distinct = _distinct_int64(
        lineitem.map_batches(pairs, batch_format="pyarrow"), "p")

    def finish(b: pa.Table) -> pa.Table:
        import pandas as pd
        p = _col_np(b["p"]).astype("int64")
        g = pd.DataFrame({"a": p >> 20}).groupby("a", sort=False) \
            .size().rename("supplier_cnt").reset_index()
        a = g["a"].to_numpy(dtype="int64")
        return pa.table({
            "p_brand": pa.array(list(attrs[0][a])),
            "p_type": pa.array(list(attrs[1][a])),
            "p_size": pa.array(attrs[2][a], pa.int64()),
            "supplier_cnt": pa.array(
                g["supplier_cnt"].to_numpy(dtype="int64"), pa.int64())})

    # per-attr-bucket partial counts, then one more tiny groupby —
    # the attr space is bounded (brands × types × sizes)
    from ray.data.aggregate import Sum
    per_block = distinct.map_batches(finish, batch_format="pyarrow") \
        .groupby(["p_brand", "p_type", "p_size"]) \
        .aggregate(Sum("supplier_cnt"))
    return per_block.map_batches(lambda b: pa.table({
        "p_brand": b["p_brand"], "p_type": b["p_type"],
        "p_size": pc.cast(b["p_size"], pa.int64()),
        "supplier_cnt": pc.cast(b["sum(supplier_cnt)"], pa.int64())}),
        batch_format="pyarrow")


# --------------------------------------------------------------- Q19


def bracket_revenue(lineitem: ray.data.Dataset, part: pa.Table,
                    brackets: list[dict] | None = None) -> pa.Table:
    """TPC-H-Q19 shape: revenue matching an OR of brand/quantity/size
    conjunction brackets — the classic multi-predicate pushdown.

    The part attributes broadcast once; every bracket evaluates as a
    vectorized mask; the result is one exact int64 scalar."""
    if brackets is None:
        brackets = [
            {"brand": "Brand#12", "qty_lo": 1, "qty_hi": 11,
             "size_lo": 1, "size_hi": 5},
            {"brand": "Brand#23", "qty_lo": 10, "qty_hi": 20,
             "size_lo": 1, "size_hi": 10},
            {"brand": "Brand#5", "qty_lo": 20, "qty_hi": 30,
             "size_lo": 1, "size_hi": 15},
        ]
    pk = _col_np(part["p_partkey"]).astype("int64")
    p_order = np.argsort(pk, kind="stable")
    pref = ray.put((pk[p_order], _col_np(part["p_brand"])[p_order],
                    _col_np(part["p_size"]).astype("int64")[p_order]))

    def partial(b: pa.Table) -> pa.Table:
        pks, pbrand, psize = _get_cached(pref)
        i, hit = _probe(pks, _col_np(b["l_partkey"]).astype("int64"))
        qty = _qty_int(b["l_quantity"])
        brand, size = pbrand[i], psize[i]
        keep = np.zeros(len(qty), bool)
        for br in brackets:
            keep |= ((brand == br["brand"])
                     & (qty >= br["qty_lo"]) & (qty <= br["qty_hi"])
                     & (size >= br["size_lo"]) & (size <= br["size_hi"]))
        keep &= hit
        t = b.filter(pa.array(keep))
        rev = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False) * (100 - _disc_pct(t["l_discount"]))
        return pa.table({
            "revenue_cc": pa.array([int(rev.sum())], pa.int64()),
            "n_rows": pa.array([len(rev)], pa.int64())})

    parts = _gather(lineitem.map_batches(partial,
                                         batch_format="pyarrow"),
                    pa.schema([("revenue_cc", pa.int64()),
                               ("n_rows", pa.int64())]))
    return pa.table({
        "revenue_cc": pa.array(
            [int(pc.sum(parts["revenue_cc"]).as_py() or 0)], pa.int64()),
        "n_rows": pa.array([int(pc.sum(parts["n_rows"]).as_py() or 0)],
                           pa.int64())})


# --------------------------------------------------------------- Q20


def heavy_shippers(lineitem: ray.data.Dataset, supplier: pa.Table,
                   part: pa.Table, nation: pa.Table,
                   name_substr: str = "rod",
                   qty_threshold: int = 45,
                   lo: str = "1996-01-01", hi: str = "1998-01-01"
                   ) -> pa.Table:
    """TPC-H-Q20 shape: suppliers who shipped more than a threshold
    quantity of ANY single matching part in a window (no partsupp
    availqty in this schema, so the reference's 50%-of-availqty
    predicate becomes an absolute per-(supplier, part) floor — the
    plan shape, a HAVING-filtered wide-key aggregate feeding a
    supplier semi-join, is unchanged).

    The (suppkey, partkey) pair rides ONE packed int64 through the
    bucketed distributive combine (`bucket_reduce` — pair keys scale
    with suppliers × parts, unbounded); qualifying suppliers are
    bounded by the supplier dimension."""
    from aida_ray.stages.agg import bucket_reduce

    mask = pc.match_substring(part["p_name"], name_substr) \
        .to_numpy(zero_copy_only=False)
    pref = ray.put(pa.array(np.sort(
        _col_np(part["p_partkey"]).astype("int64")[mask]), pa.int64()))
    lo_ts = pa.scalar(np.datetime64(lo + "T00:00:00", "us"),
                      pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi + "T00:00:00", "us"),
                      pa.timestamp("us"))

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        keep = pc.and_(
            pc.is_in(b["l_partkey"], value_set=_get_cached(pref)),
            pc.and_(pc.greater_equal(b["l_shipdate"], lo_ts),
                    pc.less(b["l_shipdate"], hi_ts)))
        t = b.filter(keep)
        supp = _col_np(t["l_suppkey"]).astype("int64")
        partk = _col_np(t["l_partkey"]).astype("int64")
        assert supp.max(initial=0) < (1 << 20) \
            and partk.max(initial=0) < (1 << 42)
        g = pd.DataFrame({"pair": (partk << 20) | supp,
                          "qty": _qty_int(t["l_quantity"])}) \
            .groupby("pair", sort=False) \
            .agg(qty=("qty", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = lineitem.map_batches(partial, batch_format="pyarrow")
    per_pair = bucket_reduce(partials, ["pair"], {"qty": "sum"})

    def survivors(b: pa.Table) -> pa.Table:
        q = _col_np(b["qty"]).astype("int64")
        pair = _col_np(b["pair"]).astype("int64")[q > qty_threshold]
        supp, n = np.unique(pair & ((1 << 20) - 1), return_counts=True)
        return pa.table({"s": pa.array(supp, pa.int64()),
                         "n": pa.array(n.astype("int64"), pa.int64())})

    agg = _gather(per_pair.map_batches(survivors,
                                       batch_format="pyarrow"))
    import pandas as pd
    g = agg.to_pandas().groupby("s", sort=True) \
        .agg(n=("n", "sum")).reset_index()
    supp_ids = g["s"].to_numpy(dtype="int64")
    n_heavy = g["n"].to_numpy(dtype="int64")
    sk = _col_np(supplier["s_suppkey"]).astype("int64")
    s_order = np.argsort(sk, kind="stable")
    # guarded probes (_probe convention): a suppkey absent from the
    # dimension drops the row instead of aliasing a neighbour
    i, hit = _probe(sk[s_order], supp_ids)
    supp_ids, n_heavy, i = supp_ids[hit], n_heavy[hit], i[hit]
    names = _col_np(supplier["s_name"])[s_order][i]
    snk = _col_np(supplier["s_nationkey"]).astype("int64")[s_order][i]
    nk = _col_np(nation["n_nationkey"]).astype("int64")
    nm = _col_np(nation["n_name"])
    n_order = np.argsort(nk, kind="stable")
    j, nhit = _probe(nk[n_order], snk)
    nnames = np.where(nhit, nm[n_order][j], None)
    return pa.table({
        "s_suppkey": pa.array(supp_ids, pa.int64()),
        "s_name": pa.array(list(names)),
        "n_name": pa.array(list(nnames)),
        "n_heavy_parts": pa.array(n_heavy, pa.int64())})


# ------------------------------------------- correlated above-average


def above_avg_orders(orders: ray.data.Dataset,
                     num: int = 3, den: int = 2) -> ray.data.Dataset:
    """Correlated-subquery filter: orders whose total price exceeds
    (num/den)× their OWN customer's average order price.

    Two passes, never a self-join (same pattern as Q17's
    `small_qty_revenue`): pass 1 builds the per-customer
    (Σcents, count) aggregate (customer-bounded); pass 2 broadcasts it
    and filters with EXACT integer arithmetic —
    ``price > (num/den)·Σ/cnt  ⇔  den·price·cnt > num·Σ`` — so no
    float average ever exists and block order cannot flip a
    borderline row."""
    def pass1(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pd.DataFrame({
            "c": _col_np(b["o_custkey"]).astype("int64"),
            "s": _cents(b["o_totalprice"]).to_numpy(
                zero_copy_only=False),
            "n": np.ones(b.num_rows, np.int64)}) \
            .groupby("c", sort=False) \
            .agg(s=("s", "sum"), n=("n", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from aida_ray.stages.tpch_more import _sum_count_by_key
    agg = _gather(_sum_count_by_key(
        orders.map_batches(pass1, batch_format="pyarrow")
        .materialize(), "c", "s", "n"))
    ck = _col_np(agg["c"]).astype("int64")
    order = np.argsort(ck, kind="stable")
    ref = ray.put((ck[order],
                   _col_np(agg["s"]).astype("int64")[order],
                   _col_np(agg["n"]).astype("int64")[order]))

    def pass2(b: pa.Table) -> pa.Table:
        cks, tot, cnt = _get_cached(ref)
        cust = _col_np(b["o_custkey"]).astype("int64")
        i = np.searchsorted(cks, cust)   # always hits (same table)
        cents = _cents(b["o_totalprice"]).to_numpy(zero_copy_only=False)
        keep = den * cents * cnt[i] > num * tot[i]
        t = b.filter(pa.array(keep))
        return pa.table({
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            "o_custkey": pc.cast(t["o_custkey"], pa.int64()),
            "price_cents": pa.array(cents[keep], pa.int64())})

    return orders.map_batches(pass2, batch_format="pyarrow")


# ---------------------------------------------------------------- Q6


def filtered_revenue(lineitem: ray.data.Dataset,
                     lo: str = "1997-01-01", hi: str = "1998-01-01",
                     disc_lo: int = 5, disc_hi: int = 7,
                     qty_max: int = 24) -> pa.Table:
    """TPC-H-Q6 shape: forecast-revenue-change — SUM(extendedprice *
    discount) under a shipdate/discount/quantity bracket.

    Pure map + scalar sum: each batch filters vectorized and emits one
    (revenue_cc, n_rows) partial row; no shuffle at any scale.  Money
    is exact int64 centi-cents (price cents × discount pct) so the
    DuckDB oracle hash-matches bit-for-bit."""
    lo_ts = pa.scalar(np.datetime64(lo + "T00:00:00", "us"),
                      pa.timestamp("us"))
    hi_ts = pa.scalar(np.datetime64(hi + "T00:00:00", "us"),
                      pa.timestamp("us"))

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["l_shipdate"], lo_ts),
                       pc.less(b["l_shipdate"], hi_ts))
        t = b.filter(keep)
        disc = _disc_pct(t["l_discount"])
        qty = _qty_int(t["l_quantity"])
        m = (disc >= disc_lo) & (disc <= disc_hi) & (qty < qty_max)
        rev = _cents(t["l_extendedprice"]).to_numpy(
            zero_copy_only=False)[m] * disc[m]
        return pa.table({
            "revenue_cc": pa.array([int(rev.sum())], pa.int64()),
            "n_rows": pa.array([int(m.sum())], pa.int64())})

    parts = _gather(lineitem.map_batches(partial, batch_format="pyarrow"))
    empty = "revenue_cc" not in parts.column_names   # zero input blocks
    return pa.table({
        "revenue_cc": pa.array(
            [0 if empty else
             int(pc.sum(parts["revenue_cc"]).as_py() or 0)], pa.int64()),
        "n_rows": pa.array(
            [0 if empty else int(pc.sum(parts["n_rows"]).as_py() or 0)],
            pa.int64())})


# --------------------------------------------------------------- Q11


def important_parts(lineitem: ray.data.Dataset,
                    mult_num: int = 2, mult_den: int = 1
                    ) -> pa.Table:
    """TPC-H-Q11 shape: parts whose total lineitem value exceeds
    ``mult_num/mult_den`` × the MEAN per-part value (the HAVING >
    fraction-of-global-sum plan; the mean-relative threshold keeps the
    predicate scale-invariant where Q11's fixed corpus fraction
    degenerates as the part count grows).  No partsupp table: value is
    witnessed by lineitem extendedprice (deviation documented).

    Per-batch partials bound the shuffle at (partkeys × blocks); the
    global total and part count are a second sum over the SAME small
    aggregate, and the HAVING predicate is exact integer
    (value × n_parts × den > total × num) so float never enters.
    Output: (l_partkey, value_cents) sorted by value desc, partkey
    asc."""

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        g = pd.DataFrame({
            "k": _col_np(b["l_partkey"]).astype("int64"),
            "s": _cents(b["l_extendedprice"]).to_numpy(
                zero_copy_only=False),
            "n": np.ones(b.num_rows, np.int64)}) \
            .groupby("k", sort=False) \
            .agg(s=("s", "sum"), n=("n", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    from aida_ray.stages.tpch_more import _sum_count_by_key
    agg = _sum_count_by_key(
        lineitem.map_batches(partial, batch_format="pyarrow")
        .materialize(), "k", "s", "n").materialize()
    scal = _gather(agg.map_batches(
        lambda b: pa.table({
            "t": pa.array(
                [int(b["s"].to_numpy(zero_copy_only=False).sum())
                 if b.num_rows else 0], pa.int64()),
            "np": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow"))
    total = int(scal["t"].to_numpy().sum())
    n_parts = int(scal["np"].to_numpy().sum())
    # v·n_parts·den > total·num  ⟺  v ≥ floor(total·num / (n_parts·den)) + 1
    # — the threshold folds to ONE int64 (Python bigints do the product,
    # so v·n_parts can never overflow at any corpus scale)
    thr = (total * mult_num) // max(1, n_parts * mult_den) + 1

    def having(b: pa.Table) -> pa.Table:
        v = b["s"].to_numpy(zero_copy_only=False)
        keep = v >= thr
        t = b.filter(pa.array(keep))
        return pa.table({
            "l_partkey": pc.cast(t["k"], pa.int64()),
            "value_cents": pc.cast(t["s"], pa.int64())})

    out = _gather(agg.map_batches(having, batch_format="pyarrow"))
    v = out["value_cents"].to_numpy(zero_copy_only=False)
    k = out["l_partkey"].to_numpy(zero_copy_only=False)
    order = np.lexsort((k, -v))
    return pa.table({"l_partkey": pa.array(k[order], pa.int64()),
                     "value_cents": pa.array(v[order], pa.int64())})
