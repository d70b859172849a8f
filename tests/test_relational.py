"""Unit tests for the relational pipelines (pricing summary, broadcast
dimension join): exact cent arithmetic, blocking invariance, inner-join
drop semantics."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _lineitem(n=200, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "l_returnflag": rng.choice(["A", "N", "R"], n).tolist(),
        "l_linestatus": rng.choice(["F", "O"], n).tolist(),
        "l_quantity": rng.integers(1, 50, n).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n), 2),
        "l_discount": np.round(rng.choice([0.0, 0.05, 0.1], n), 2),
    })


def test_pricing_summary_matches_pandas_and_blocking(ray_session):
    from aida_ray.stages.relational import pricing_summary
    tbl = _lineitem()
    out = pricing_summary(rd.from_arrow(tbl)).to_pandas() \
        .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    # independent reference in plain numpy (half-away rounding)
    import pandas as pd
    df = tbl.to_pandas()

    def away(x):
        return np.floor(np.abs(x) + 0.5) * np.sign(x)

    df["qty"] = away(df.l_quantity).astype("int64")
    df["base"] = away(df.l_extendedprice * 100).astype("int64")
    df["disc"] = away(
        df.l_extendedprice * (1 - df.l_discount) * 100).astype("int64")
    ref = df.groupby(["l_returnflag", "l_linestatus"]).agg(
        sum_qty=("qty", "sum"), sum_base_cents=("base", "sum"),
        sum_disc_cents=("disc", "sum"), count_order=("qty", "size")) \
        .reset_index()
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)

    # blocking invariance: same answer at a different partitioning
    out13 = pricing_summary(rd.from_arrow(tbl).repartition(13)).to_pandas() \
        .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out13)


def test_revenue_by_nation_inner_join_drops_orphans(ray_session):
    from aida_ray.stages.relational import revenue_by_nation
    orders = rd.from_arrow(pa.table({
        "o_custkey": [1, 2, 2, 3, 99],       # 99 has no customer row
        "o_totalprice": [10.005, 20.0, 30.0, 40.0, 1000.0],
    }))
    customer = pa.table({"c_custkey": [3, 1, 2],
                         "c_nationkey": [0, 0, 1]})
    nation = pa.table({"n_nationkey": [1, 0],
                       "n_name": ["B", "A"]})
    out = revenue_by_nation(orders, customer, nation).to_pandas() \
        .sort_values("n_name").reset_index(drop=True)
    assert out.n_name.tolist() == ["A", "B"]
    # 10.005 → 1001 cents (half away from zero), plus 40.0
    assert out.revenue_cents.tolist() == [1001 + 4000, 2000 + 3000]
    assert out.n_orders.tolist() == [2, 2]


def test_rollup_levels(ray_session):
    from aida_ray.stages.relational import rollup_pricing
    tbl = _lineitem(n=120, seed=9)
    out = rollup_pricing(rd.from_arrow(tbl).repartition(6)).to_pandas()
    finest = out.dropna(subset=["l_returnflag", "l_linestatus"])
    mid = out[out.l_returnflag.notna() & out.l_linestatus.isna()]
    total = out[out.l_returnflag.isna()]
    assert len(total) == 1
    assert total.count_order.iloc[0] == 120
    assert finest.count_order.sum() == 120
    assert mid.count_order.sum() == 120
    # each mid row equals the sum of its finest children
    for _, r in mid.iterrows():
        kids = finest[finest.l_returnflag == r.l_returnflag]
        assert r.sum_disc_cents == kids.sum_disc_cents.sum()


def test_pivot_counts(ray_session):
    from aida_ray.stages.relational import pivot_counts
    ev = pa.table({"user_id": [1, 1, 1, 2, 2, 3],
                   "event_type": ["a", "b", "a", "b", "b", "zzz"]})
    out = pivot_counts(rd.from_arrow(ev).repartition(3), "user_id",
                       "event_type", ["a", "b"]).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    assert out.n_a.tolist() == [2, 0, 0]
    assert out.n_b.tolist() == [1, 2, 0]


def test_unpivot_roundtrip(ray_session):
    from aida_ray.stages.relational import pivot_counts, unpivot_counts
    ev = pa.table({"user_id": [1, 1, 2], "event_type": ["a", "a", "b"]})
    melted = unpivot_counts(
        pivot_counts(rd.from_arrow(ev), "user_id", "event_type",
                     ["a", "b"]),
        "user_id", ["a", "b"]).to_pandas() \
        .sort_values(["user_id", "category"]).reset_index(drop=True)
    assert melted.n.tolist() == [2, 0, 0, 1]


def test_group_quantiles_matches_duckdb(ray_session):
    import duckdb
    from aida_ray.stages.relational import group_quantiles
    rng = np.random.default_rng(4)
    tbl = pa.table({"g": rng.choice(["x", "y"], 500).tolist(),
                    "v": rng.integers(0, 40, 500).astype("float64")})
    out = group_quantiles(rd.from_arrow(tbl).repartition(6), "g", "v",
                          [0.5, 0.9]).to_pandas()
    con = duckdb.connect(); con.register("t", tbl)
    for _, r in out.iterrows():
        ref = con.execute(
            f"SELECT quantile_disc(v, {r.q}) FROM t WHERE g = '{r.g}'"
        ).fetchone()[0]
        assert r.value == ref


def test_correlation_matches_numpy(ray_session):
    from aida_ray.stages.relational import correlation
    rng = np.random.default_rng(8)
    x = rng.normal(0, 1, 2000)
    y = 3 * x + rng.normal(0, 0.5, 2000)
    tbl = pa.table({"x": x, "y": y})
    r = correlation(rd.from_arrow(tbl).repartition(9), "x", "y")
    assert abs(r - np.corrcoef(x, y)[0, 1]) < 1e-9


def test_left_join_zero_rows_survive(ray_session):
    from aida_ray.stages.relational import left_join_urgent_counts
    cust = rd.from_arrow(pa.table({"c_custkey": [1, 2, 3]}))
    orders = rd.from_arrow(pa.table({
        "o_custkey": [1, 1, 2],
        "o_orderkey": [100, 101, 102],
        "o_orderpriority": ["1-URGENT", "5-LOW", "1-URGENT"]}))
    out = left_join_urgent_counts(cust, orders).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    assert out.c_custkey.tolist() == [1, 2, 3]
    assert out.n_urgent.tolist() == [1, 1, 0]


def test_unnest_list_layout(ray_session):
    from aida_ray.stages.relational import unnest_list
    tbl = pa.table({"id": [1, 2, 3],
                    "xs": [[1.0, 2.0], [], [5.0]]})
    out = unnest_list(rd.from_arrow(tbl).repartition(2), "id", "xs") \
        .to_pandas().sort_values(["id", "pos"]).reset_index(drop=True)
    assert out.id.tolist() == [1, 1, 3]
    assert out.pos.tolist() == [1, 2, 1]
    assert out.val.tolist() == [1.0, 2.0, 5.0]


def test_monthly_revenue_buckets(ray_session):
    import pandas as pd
    from aida_ray.stages.relational import monthly_revenue
    o = pa.table({
        "o_orderdate": pd.to_datetime(
            ["2024-01-15", "2024-01-31 23:59:59", "2024-02-01"],
            format="mixed"),
        "o_totalprice": [10.0, 20.0, 40.0]})
    out = monthly_revenue(rd.from_arrow(o).repartition(2)).to_pandas() \
        .sort_values("month").reset_index(drop=True)
    assert out.month.tolist() == ["2024-01", "2024-02"]
    assert out.revenue_cents.tolist() == [3000, 4000]
    assert out.n_orders.tolist() == [2, 1]


def test_cube_matches_duckdb(ray_session):
    from aida_ray.stages.relational import cube_pricing
    import duckdb
    tbl = _lineitem(n=150, seed=11)
    out = cube_pricing(rd.from_arrow(tbl)).to_pandas()
    ref = duckdb.connect().execute("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                   AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                   AS BIGINT) AS sum_base_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                   * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               COUNT(*) AS count_order
        FROM tbl GROUP BY CUBE(l_returnflag, l_linestatus)
    """).df()
    import pandas as pd
    key = ["l_returnflag", "l_linestatus"]
    out = out.sort_values(key, na_position="last").reset_index(drop=True)
    ref = ref.sort_values(key, na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    # 4 grouping sets: finest + 2 one-key sets + grand total
    assert (out.l_returnflag.isna() & out.l_linestatus.isna()).sum() == 1


def test_skyline_bruteforce(ray_session):
    from aida_ray.stages.relational import skyline
    rng = np.random.default_rng(5)
    price = rng.uniform(1, 100, 800).round(1)
    qty = rng.integers(1, 50, 800).astype("float64")
    ds = rd.from_arrow(pa.table({"p": price, "q": qty})).repartition(6)
    out = skyline(ds, "p", "q")
    got = set(zip(out["price"].to_pylist(), out["qty"].to_pylist()))
    pts = set(zip(price, qty))
    ref = {(p, q) for p, q in pts
           if not any(op <= p and oq >= q and (op < p or oq > q)
                      for op, oq in pts)}
    assert got == ref and len(ref) > 1


def test_group_mode_concat_pandas(ray_session):
    from aida_ray.stages.relational import group_mode_concat
    rng = np.random.default_rng(9)
    k = rng.integers(0, 12, 600)
    v = rng.choice(["aa", "bb", "cc", "dd"], 600)
    ds = rd.from_arrow(pa.table({"user_id": k, "event_type": v})) \
        .repartition(5)
    out = group_mode_concat(ds, "user_id", "event_type").to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    import pandas as pd
    df = pd.DataFrame({"k": k, "v": v})
    for _, r in out.iterrows():
        vc = df[df.k == r.user_id].v.value_counts()
        best = vc[vc == vc.max()].index.min()   # lexicographic tie-break
        assert r.mode_val == best
        assert r.mode_n == vc.max()
        assert r.all_vals == ",".join(sorted(df[df.k == r.user_id]
                                             .v.unique()))
    assert set(out.user_id) == set(np.unique(k))


def test_cheapest_supplier_matches_pandas(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from aida_ray.stages.relational import cheapest_supplier
    rng = np.random.default_rng(3)
    n = 500
    df = pd.DataFrame({
        "l_partkey": rng.integers(0, 40, n),
        "l_suppkey": rng.integers(0, 9, n),
        "l_extendedprice": rng.integers(100, 5000, n) / 100.0})
    out = cheapest_supplier(
        rd.from_arrow(pa.Table.from_pandas(df)).repartition(4)) \
        .to_pandas().sort_values("l_partkey").reset_index(drop=True)
    cents = (df.l_extendedprice * 100).round().astype("int64")
    ref = df.assign(c=cents).sort_values(["c", "l_suppkey"]) \
        .groupby("l_partkey").first().reset_index()
    assert (out.min_price_cents.to_numpy()
            == ref.sort_values("l_partkey").c.to_numpy()).all()
    assert (out.best_suppkey.to_numpy()
            == ref.sort_values("l_partkey").l_suppkey.to_numpy()).all()


def test_ohlc_bars_blocking_invariant_and_ties(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from aida_ray.stages.timeseries import ohlc_bars
    rng = np.random.default_rng(5)
    n = 300
    base = 1_700_000_000_000_000
    ts = base + rng.integers(0, 4 * 3_600_000_000, n)
    ts[10:20] = ts[10]          # equal-timestamp ties
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "ts": pd.to_datetime(ts, unit="us"),
        "event_type": rng.choice(["a", "b"], n),
        "value": rng.normal(size=n)})
    outs = []
    for parts in (1, 4, 8):
        ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(parts)
        o = ohlc_bars(ds).to_pandas() \
            .sort_values(["k", "bucket"]).reset_index(drop=True)
        outs.append(o)
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
    # reference: pandas on the total (ts, event_id) order
    d2 = df.assign(t=ts, bucket=(ts // 3_600_000_000) * 3_600_000_000) \
        .sort_values(["t", "event_id"])
    ref = d2.groupby(["event_type", "bucket"]).agg(
        open=("value", "first"), high=("value", "max"),
        low=("value", "min"), close=("value", "last"),
        n=("value", "size")).reset_index() \
        .sort_values(["event_type", "bucket"]).reset_index(drop=True)
    got = outs[0]
    assert np.allclose(got[["open", "high", "low", "close"]].to_numpy(),
                       ref[["open", "high", "low", "close"]].to_numpy())
    assert (got.n.to_numpy() == ref.n.to_numpy()).all()


def test_aligned_union_null_fills_missing(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from aida_ray.stages.relational import aligned_union
    old = pa.table({"id": [1, 2], "a": ["x", "y"]})
    new = pa.table({"id": [3], "a": ["z"], "b": [5.0]})
    out = aligned_union(rd.from_arrow(old).repartition(2),
                        rd.from_arrow(new)).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert list(out.columns) == ["id", "a", "b"]
    assert out.b.isna().tolist() == [True, True, False]
    assert out.b.iloc[2] == 5.0
