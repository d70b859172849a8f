"""Tests for distributed cardinality/quantile statistics: exact routes
against numpy/pandas references, sketches against error bounds."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_count_distinct_exact(ray_session):
    from aida_ray.stages.sketches import count_distinct
    rng = np.random.default_rng(11)
    x = rng.integers(0, 1000, 5000)
    ds = rd.from_arrow(pa.table({"x": x})).repartition(9)
    assert count_distinct(ds, "x") == len(np.unique(x))


def test_exact_quantiles_duckdb_semantics(ray_session):
    from aida_ray.stages.sketches import exact_quantiles
    import duckdb
    rng = np.random.default_rng(5)
    x = rng.integers(0, 200, 3000).astype("float64")
    ds = rd.from_arrow(pa.table({"x": x})).repartition(7)
    qs = [0.0, 0.25, 0.5, 0.75, 0.9, 1.0]
    mine = exact_quantiles(ds, "x", qs).to_pandas()
    con = duckdb.connect()
    con.register("t", pa.table({"x": x}))
    for q, v in zip(mine.q, mine.value):
        ref = con.execute(
            f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
        assert v == ref, (q, v, ref)


def test_hll_error_bound(ray_session):
    from aida_ray.stages.sketches import hll_count
    for true_n in (500, 20000):
        x = np.arange(true_n)
        ds = rd.from_arrow(pa.table({"x": x})).repartition(8)
        est = hll_count(ds, "x", p=12)
        # standard error 1.04/sqrt(4096) ≈ 1.6%; allow 4 sigma
        assert abs(est - true_n) / true_n < 0.07, (true_n, est)


def test_quantile_sketch_rank_error(ray_session):
    from aida_ray.stages.sketches import quantile_sketch
    rng = np.random.default_rng(2)
    x = np.concatenate([rng.normal(0, 1, 30000),
                        rng.exponential(5, 10000)])
    ds = rd.from_arrow(pa.table({"x": x})).repartition(11)
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    out = quantile_sketch(ds, "x", qs, k=512).to_pandas()
    xs = np.sort(x)
    for q, v in zip(out.q, out.value):
        rank = np.searchsorted(xs, v) / len(xs)
        assert abs(rank - q) < 0.02, (q, v, rank)


def test_count_distinct_per_group_exact(ray_session):
    import pandas as pd
    from aida_ray.stages.sketches import count_distinct_per_group
    rng = np.random.default_rng(6)
    g = rng.choice(["a", "b", "c"], 4000)
    v = rng.integers(0, 300, 4000)
    ds = rd.from_arrow(pa.table({"g": g.tolist(), "v": v})).repartition(7)
    out = count_distinct_per_group(ds, "g", "v").to_pandas() \
        .sort_values("g").reset_index(drop=True)
    ref = pd.DataFrame({"g": g, "v": v}).groupby("g").v.nunique()
    assert out.n_distinct.tolist() == [ref["a"], ref["b"], ref["c"]]


def test_hll_per_group_error(ray_session):
    from aida_ray.stages.sketches import hll_count_per_group
    gs, vs = [], []
    for gname, n in [("big", 20000), ("small", 300)]:
        gs += [gname] * n
        vs += [f"{gname}_{i}" for i in range(n)]
    ds = rd.from_arrow(pa.table({"g": gs, "v": vs})).repartition(9)
    out = hll_count_per_group(ds, "g", "v", p=12).to_pandas() \
        .set_index("g").approx_distinct
    assert abs(out["big"] - 20000) / 20000 < 0.07
    assert abs(out["small"] - 300) / 300 < 0.07


def test_interp_quantiles_duckdb_semantics(ray_session):
    from aida_ray.stages.sketches import interp_quantiles
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    rng = np.random.default_rng(3)
    vals = np.round(rng.uniform(0, 1000, 501), 2)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(7)
    qs = [0.0, 0.1, 0.33, 0.5, 0.9, 1.0]
    out = interp_quantiles(ds, "x", qs).to_pandas()
    ref = {q: duckdb.connect().execute(
        "SELECT quantile_cont(x, ?) FROM (SELECT unnest(?) AS x)",
        [q, vals.tolist()]).fetchone()[0] for q in qs}
    for q, v in zip(out.q, out.value):
        assert v == ref[q], (q, v, ref[q])
