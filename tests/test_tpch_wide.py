"""Unit tests for the Q4/Q7/Q8/Q9/Q10/Q13/Q15/Q16/Q19/Q20-style plans
and the correlated above-average filter: pandas parity on synthetic
frames plus blocking invariance (every distributed path is run
repartitioned)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _tables(n=400, seed=7):
    rng = np.random.default_rng(seed)
    n_orders, n_parts, n_supp, n_cust, n_nat = 60, 20, 8, 15, 5
    li = pa.table({
        "l_orderkey": rng.integers(0, n_orders, n),
        "l_partkey": rng.integers(0, n_parts, n),
        "l_suppkey": rng.integers(0, n_supp, n),
        "l_quantity": rng.integers(1, 50, n).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 9000, n), 2),
        "l_discount": np.round(rng.choice([0.0, 0.05, 0.1], n), 2),
        "l_returnflag": rng.choice(["N", "A", "R"], n),
        "l_shipdate": pa.array(
            [np.datetime64("1996-01-01", "us")
             + np.timedelta64(int(d), "D")
             for d in rng.integers(0, 700, n)], pa.timestamp("us")),
    })
    orders = pa.table({
        "o_orderkey": np.arange(n_orders),
        "o_custkey": rng.integers(0, n_cust, n_orders),
        "o_totalprice": np.round(rng.uniform(1000, 90000, n_orders), 2),
        "o_orderpriority": rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"],
            n_orders),
        "o_orderdate": pa.array(
            [np.datetime64("1996-01-01", "us")
             + np.timedelta64(int(d), "D")
             for d in rng.integers(0, 700, n_orders)],
            pa.timestamp("us")),
    })
    part = pa.table({
        "p_partkey": np.arange(n_parts),
        "p_name": [f"{a} {b}" for a, b in zip(
            rng.choice(["red", "blue", "cold"], n_parts),
            rng.choice(["rod", "widget", "bolt"], n_parts))],
        "p_brand": rng.choice(["Brand#12", "Brand#23", "Brand#5"],
                              n_parts),
        "p_type": rng.choice(["STANDARD", "PROMO"], n_parts),
        "p_size": rng.integers(1, 16, n_parts),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_parts), 2),
    })
    supplier = pa.table({
        "s_suppkey": np.arange(n_supp),
        "s_name": [f"S_{i}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, n_nat, n_supp),
        "s_acctbal": np.round(rng.uniform(-500, 5000, n_supp), 2),
    })
    customer = pa.table({
        "c_custkey": np.arange(n_cust),
        "c_name": [f"C_{i}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, n_nat, n_cust),
    })
    nation = pa.table({
        "n_nationkey": np.arange(n_nat),
        "n_name": [f"NATION_{i}" for i in range(n_nat)],
        "n_regionkey": np.arange(n_nat) % 2,
    })
    region = pa.table({
        "r_regionkey": np.arange(2),
        "r_name": ["ASIA", "EUROPE"],
    })
    return li, orders, part, supplier, customer, nation, region


def _cents(x):
    return np.round(np.asarray(x) * 100).astype("int64")


def _rev_cc(df):
    return _cents(df.l_extendedprice) * (100 - _cents(df.l_discount)
                                         // 1)


def _join_frames(li, orders):
    df = li.to_pandas()
    o = orders.to_pandas()
    return df.merge(o, left_on="l_orderkey", right_on="o_orderkey")


def test_q4_exists_counts(ray_session):
    from aida_ray.stages.tpch_wide import exists_priority_counts
    li, orders, *_ = _tables()
    out = exists_priority_counts(
        rd.from_arrow(orders).repartition(4),
        rd.from_arrow(li).repartition(5), qty_threshold=40.0) \
        .to_pandas().sort_values("o_orderpriority") \
        .reset_index(drop=True)
    df, o = li.to_pandas(), orders.to_pandas()
    quals = set(df.loc[df.l_quantity > 40, "l_orderkey"])
    ref = o[o.o_orderkey.isin(quals)].groupby("o_orderpriority") \
        .size().rename("order_count").reset_index()
    pd.testing.assert_frame_equal(
        out, ref.sort_values("o_orderpriority").reset_index(drop=True),
        check_dtype=False)


def test_q7_nation_pair(ray_session):
    from aida_ray.stages.tpch_wide import nation_pair_volume
    li, orders, part, supplier, customer, nation, region = _tables()
    out = nation_pair_volume(
        rd.from_arrow(li).repartition(5),
        rd.from_arrow(orders).repartition(3),
        customer, supplier, nation,
        nation_a="NATION_0", nation_b="NATION_1",
        lo="1996-01-01", hi="1998-01-01") \
        .to_pandas().sort_values(
            ["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)
    df = _join_frames(li, orders)
    snat = dict(zip(supplier["s_suppkey"].to_pylist(),
                    supplier["s_nationkey"].to_pylist()))
    cnat = dict(zip(customer["c_custkey"].to_pylist(),
                    customer["c_nationkey"].to_pylist()))
    df["sn"] = df.l_suppkey.map(snat)
    df["cn"] = df.o_custkey.map(cnat)
    df = df[(df.l_shipdate < np.datetime64("1998-01-01"))
            & df.sn.isin([0, 1]) & df.cn.isin([0, 1])
            & (df.sn != df.cn)]
    df["revenue_cc"] = _cents(df.l_extendedprice) \
        * (100 - _cents(df.l_discount))
    df["l_year"] = df.l_shipdate.dt.year.astype("int64")
    df["supp_nation"] = "NATION_" + df.sn.astype(str)
    df["cust_nation"] = "NATION_" + df.cn.astype(str)
    ref = df.groupby(["supp_nation", "cust_nation", "l_year"]) \
        .agg(revenue_cc=("revenue_cc", "sum")).reset_index() \
        .sort_values(["supp_nation", "cust_nation", "l_year"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_q8_share_sums_to_subset(ray_session):
    from aida_ray.stages.tpch_wide import market_share
    li, orders, part, supplier, customer, nation, region = _tables()
    out = market_share(
        rd.from_arrow(li).repartition(4),
        rd.from_arrow(orders).repartition(3),
        customer, supplier, part, nation, region,
        target_nation="NATION_2", region_name="ASIA",
        p_type="STANDARD").to_pandas()
    assert ((out.target_cc <= out.total_cc).all()
            and (out.mkt_share >= 0).all()
            and (out.mkt_share <= 1).all())
    np.testing.assert_allclose(
        out.mkt_share, out.target_cc / out.total_cc)


def test_q9_profit_matches_pandas(ray_session):
    from aida_ray.stages.tpch_wide import product_profit
    li, orders, part, supplier, customer, nation, region = _tables()
    out = product_profit(
        rd.from_arrow(li).repartition(5),
        rd.from_arrow(orders).repartition(3),
        supplier, part, nation, name_substr="rod") \
        .to_pandas().sort_values(["n_name", "o_year"]) \
        .reset_index(drop=True)
    df = _join_frames(li, orders)
    p = part.to_pandas().set_index("p_partkey")
    df = df[df.l_partkey.map(p.p_name).str.contains("rod")]
    snat = dict(zip(supplier["s_suppkey"].to_pylist(),
                    supplier["s_nationkey"].to_pylist()))
    df["profit_cc"] = (_cents(df.l_extendedprice)
                       * (100 - _cents(df.l_discount))
                       - _cents(df.l_partkey.map(p.p_retailprice))
                       * 100 * df.l_quantity.astype("int64"))
    df["n_name"] = "NATION_" + df.l_suppkey.map(snat).astype(str)
    df["o_year"] = df.o_orderdate.dt.year.astype("int64")
    ref = df.groupby(["n_name", "o_year"]) \
        .agg(profit_cc=("profit_cc", "sum")).reset_index() \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_q10_top_returned(ray_session):
    from aida_ray.stages.tpch_wide import returned_top_customers
    li, orders, part, supplier, customer, nation, region = _tables()
    out = returned_top_customers(
        rd.from_arrow(li).repartition(4),
        rd.from_arrow(orders).repartition(3),
        customer, nation, lo="1996-01-01", hi="1998-01-01", k=5) \
        .to_pandas()
    df = _join_frames(li, orders)
    df = df[df.l_returnflag == "R"]
    df["rev"] = _cents(df.l_extendedprice) * (100 - _cents(df.l_discount))
    ref = df.groupby("o_custkey").agg(rev=("rev", "sum")) \
        .reset_index().sort_values(["rev", "o_custkey"],
                                   ascending=[False, True]).head(5)
    assert out.c_custkey.tolist() == ref.o_custkey.tolist()
    assert out.revenue_cc.tolist() == ref.rev.tolist()


def test_q13_zero_bucket(ray_session):
    from aida_ray.stages.tpch_wide import customer_order_distribution
    li, orders, part, supplier, customer, nation, region = _tables()
    out = customer_order_distribution(
        rd.from_arrow(orders).repartition(3), customer).to_pandas()
    o = orders.to_pandas()
    o = o[o.o_orderpriority != "4-NOT SPECIFIED"]
    per = o.groupby("o_custkey").size()
    full = per.reindex(range(len(customer)), fill_value=0)
    ref = full.value_counts().sort_index()
    assert dict(zip(out.c_count, out.custdist)) == ref.to_dict()
    assert out.custdist.sum() == len(customer)


def test_q15_ties_all_returned(ray_session):
    from aida_ray.stages.tpch_wide import top_supplier
    li = pa.table({
        "l_suppkey": [1, 2, 2, 3],
        "l_extendedprice": [100.0, 40.0, 60.0, 99.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0],
        "l_shipdate": pa.array(
            [np.datetime64("1997-02-01", "us")] * 4,
            pa.timestamp("us"))})
    supplier = pa.table({"s_suppkey": [1, 2, 3],
                         "s_name": ["a", "b", "c"]})
    out = top_supplier(rd.from_arrow(li).repartition(2), supplier)
    assert out["s_suppkey"].to_pylist() == [1, 2]   # tie at 100.00
    assert out["total_revenue_cc"].to_pylist() == [1000000, 1000000]


def test_q16_distinct_suppliers(ray_session):
    from aida_ray.stages.tpch_wide import supplier_part_counts
    li, orders, part, supplier, customer, nation, region = _tables()
    out = supplier_part_counts(
        rd.from_arrow(li).repartition(5), part, supplier,
        exclude_brand="Brand#12", min_acctbal=0.0).to_pandas()
    df = li.to_pandas()
    p = part.to_pandas().set_index("p_partkey")
    bad = set(supplier.to_pandas().query("s_acctbal < 0").s_suppkey)
    df = df[~df.l_suppkey.isin(bad)]
    df["p_brand"] = df.l_partkey.map(p.p_brand)
    df["p_type"] = df.l_partkey.map(p.p_type)
    df["p_size"] = df.l_partkey.map(p.p_size)
    df = df[df.p_brand != "Brand#12"]
    ref = df.groupby(["p_brand", "p_type", "p_size"]) \
        .agg(supplier_cnt=("l_suppkey", "nunique")).reset_index()
    out = out.sort_values(["p_brand", "p_type", "p_size"]) \
        .reset_index(drop=True)
    ref = ref.sort_values(["p_brand", "p_type", "p_size"]) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_q19_brackets_match_pandas(ray_session):
    from aida_ray.stages.tpch_wide import bracket_revenue
    li, orders, part, supplier, customer, nation, region = _tables()
    brackets = [{"brand": "Brand#23", "qty_lo": 5, "qty_hi": 30,
                 "size_lo": 1, "size_hi": 10}]
    out = bracket_revenue(rd.from_arrow(li).repartition(4), part,
                          brackets)
    df = li.to_pandas()
    p = part.to_pandas().set_index("p_partkey")
    df["brand"] = df.l_partkey.map(p.p_brand)
    df["size"] = df.l_partkey.map(p.p_size)
    keep = ((df.brand == "Brand#23") & (df.l_quantity >= 5)
            & (df.l_quantity <= 30) & (df["size"] >= 1)
            & (df["size"] <= 10))
    ref = (_cents(df.l_extendedprice[keep])
           * (100 - _cents(df.l_discount[keep]))).sum()
    assert out["revenue_cc"].to_pylist() == [int(ref)]
    assert out["n_rows"].to_pylist() == [int(keep.sum())]


def test_q20_heavy_pairs(ray_session):
    from aida_ray.stages.tpch_wide import heavy_shippers
    li, orders, part, supplier, customer, nation, region = _tables()
    out = heavy_shippers(
        rd.from_arrow(li).repartition(5), supplier, part, nation,
        name_substr="rod", qty_threshold=40,
        lo="1996-01-01", hi="1998-01-01").to_pandas()
    df = li.to_pandas()
    p = part.to_pandas().set_index("p_partkey")
    df = df[df.l_partkey.map(p.p_name).str.contains("rod")
            & (df.l_shipdate < np.datetime64("1998-01-01"))]
    per = df.groupby(["l_suppkey", "l_partkey"]) \
        .agg(q=("l_quantity", "sum")).reset_index()
    heavy = per[per.q > 40].groupby("l_suppkey").size()
    assert dict(zip(out.s_suppkey, out.n_heavy_parts)) \
        == heavy.to_dict()


def test_above_avg_exact_boundary(ray_session):
    from aida_ray.stages.tpch_wide import above_avg_orders
    # customer 1: prices 100, 200 → avg 150, 1.5x = 225 → none qualify
    # (200·2·2 = 800 ≤ 3·300·100?  den·price·cnt = 2·20000·2 = 80000,
    #  num·sum = 3·30000 = 90000 → excluded, exact boundary honored)
    # customer 2: prices 100, 500 → 1.5·avg = 450 → only 500 qualifies
    orders = pa.table({
        "o_orderkey": [1, 2, 3, 4],
        "o_custkey": [1, 1, 2, 2],
        "o_totalprice": [100.0, 200.0, 100.0, 500.0]})
    out = above_avg_orders(rd.from_arrow(orders).repartition(2)) \
        .to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    assert out.o_orderkey.tolist() == [4]
    assert out.price_cents.tolist() == [50000]


def test_adaptive_join_empty_build_side(ray_session):
    """An empty (fully filtered) build side must keep the attached
    columns' Arrow types — not degrade them to null arrays."""
    import ray.data as rd
    from aida_ray.stages.tpch_wide import adaptive_fact_join
    left = pa.table({"k": [1, 2, 3], "x": [10.0, 20.0, 30.0]})
    right = pa.table({"rk": pa.array([], pa.int64()),
                      "name": pa.array([], pa.string())})
    import ray
    out = adaptive_fact_join(rd.from_arrow(left).repartition(2),
                             rd.from_arrow(right), "k", "rk")
    tabs = [ray.get(r) for r in out.to_arrow_refs()]
    assert sum(t.num_rows for t in tabs) == 0
    for t in tabs:
        assert t.schema.field("name").type == pa.string()
        assert set(t.column_names) == {"k", "x", "name"}
