"""Empty/degenerate-input behavior for the round-2 analytics ops."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _empty(schema_cols):
    return rd.from_arrow(pa.table(schema_cols))


def test_global_rank_single_and_all_equal(ray_session):
    from aida_ray.stages.windows import global_rank
    one = rd.from_arrow(pa.table({"v": [7.0], "id": [1]}))
    out = global_rank(one, "v", keep_cols=("id",)).to_pandas()
    assert out["rank"].tolist() == [1]
    same = rd.from_arrow(pa.table({"v": [3.0] * 5, "id": list(range(5))}))
    out = global_rank(same, "v", keep_cols=("id",)).to_pandas()
    assert out["rank"].tolist() == [1] * 5
    assert out["dense_rank"].tolist() == [1] * 5


def test_exact_quantiles_single_value(ray_session):
    from aida_ray.stages.sketches import exact_quantiles
    ds = rd.from_arrow(pa.table({"x": [42.0] * 10}))
    out = exact_quantiles(ds, "x", [0.0, 0.5, 1.0]).to_pandas()
    assert out.value.tolist() == [42.0] * 3


def test_heavy_hitters_empty(ray_session):
    from aida_ray.stages.graphs import heavy_hitters
    out = heavy_hitters(_empty({"v": pa.array([], pa.string())}), "v")
    assert len(out) == 0


def test_pagerank_empty_and_self_loops(ray_session):
    from aida_ray.stages.graphs import pagerank
    out = pagerank(_empty({"src": pa.array([], pa.int64()),
                           "dst": pa.array([], pa.int64())}))
    assert len(out) == 0
    loops = rd.from_arrow(pa.table({"src": [1, 2], "dst": [1, 2]}))
    ranks = pagerank(loops, iters=5).to_pandas()
    assert np.allclose(ranks["rank"], 0.5, atol=1e-9)


def test_pivot_empty_group_columns(ray_session):
    from aida_ray.stages.relational import pivot_counts
    ds = rd.from_arrow(pa.table({"k": [1], "c": ["x"]}))
    out = pivot_counts(ds, "k", "c", ["x", "never_seen"]).to_pandas()
    assert out.n_x.tolist() == [1]
    assert out.n_never_seen.tolist() == [0]
