"""Bucketed distributive combine: equality vs Ray groupby and vs the
gated single-task routes."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from aida_ray.stages.agg import bucket_reduce


def test_bucket_reduce_matches_ray_groupby(ray_session):
    from ray.data.aggregate import Max, Min, Sum
    rng = np.random.default_rng(9)
    n = 5000
    tbl = pa.table({
        "k": pa.array(rng.integers(0, 1200, n), pa.int64()),
        "v": pa.array(rng.integers(-50, 50, n), pa.int64())})
    ds = rd.from_arrow(tbl).repartition(6)
    got = bucket_reduce(ds, ["k"], {"v": "sum"}).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    ref = rd.from_arrow(tbl).groupby("k").aggregate(Sum("v")) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert (got.k.to_numpy() == ref.k.to_numpy()).all()
    assert (got.v.to_numpy() == ref["sum(v)"].to_numpy()).all()
    # min/max too
    gm = bucket_reduce(rd.from_arrow(tbl).repartition(6), ["k"],
                       {"v": "min"}).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    rm = rd.from_arrow(tbl).groupby("k").aggregate(Min("v"), Max("v")) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert (gm.v.to_numpy() == rm["min(v)"].to_numpy()).all()


def test_gated_routes_equal_bucketed(ray_session):
    from aida_ray.stages.relational import cheapest_supplier
    from aida_ray.stages.substring import dup_span_coverage
    rng = np.random.default_rng(10)
    n = 400
    li = pa.table({
        "l_partkey": pa.array(rng.integers(0, 50, n), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, 9, n), pa.int64()),
        "l_extendedprice": pa.array(
            rng.integers(100, 9000, n) / 100.0, pa.float64())})
    a = cheapest_supplier(rd.from_arrow(li).repartition(4)).to_pandas() \
        .sort_values("l_partkey").reset_index(drop=True)
    b = cheapest_supplier(rd.from_arrow(li).repartition(4),
                          task_gate_rows=0).to_pandas() \
        .sort_values("l_partkey").reset_index(drop=True)
    assert a.equals(b)

    texts = {d: " ".join(f"w{(d * 5 + i) % 9}" for i in range(11))
             for d in range(30)}
    docs = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[d] for d in sorted(texts)])})
    c = dup_span_coverage(rd.from_arrow(docs).repartition(4), k=4) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    d = dup_span_coverage(rd.from_arrow(docs).repartition(4), k=4,
                          task_gate_rows=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert c.equals(d)
