"""Unit tests for large-large hash shuffle joins and the salted skew
variant."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_hash_join_inner_matches_pandas(ray_session):
    from aida_ray.stages.shuffle_join import hash_join
    rng = np.random.default_rng(3)
    left = pa.table({"k": rng.integers(0, 50, 300),
                     "lv": np.arange(300)})
    right = pa.table({"k": rng.integers(0, 50, 80),
                      "rv": np.arange(80) * 10})
    out = hash_join(rd.from_arrow(left).repartition(7),
                    rd.from_arrow(right).repartition(3),
                    on=("k",), num_partitions=4).to_pandas()
    ref = left.to_pandas().merge(right.to_pandas(), on="k")
    assert len(out) == len(ref)
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].values))
    assert key(out) == key(ref)


def test_semi_anti_partition(ray_session):
    from aida_ray.stages.shuffle_join import (customers_with_orders,
                                              customers_without_orders)
    cust = rd.from_arrow(pa.table({"c_custkey": list(range(10))}))
    orders = rd.from_arrow(pa.table({"o_custkey": [1, 1, 3, 5, 5, 5, 42]}))
    semi = sorted(customers_with_orders(cust, orders).to_pandas().c_custkey)
    anti = sorted(customers_without_orders(cust, orders).to_pandas().c_custkey)
    assert semi == [1, 3, 5]
    assert set(semi) | set(anti) == set(range(10))
    assert not set(semi) & set(anti)


def test_salted_join_equals_plain_under_skew(ray_session):
    from aida_ray.stages.shuffle_join import hash_join, salted_join
    # one hot key carrying 90% of probe rows
    probe = pa.table({"k": [7] * 900 + list(range(100)),
                      "v": np.arange(1000)})
    build = pa.table({"k": list(range(100)), "w": np.arange(100) * 2})
    plain = hash_join(rd.from_arrow(probe), rd.from_arrow(build),
                      on=("k",), num_partitions=4).to_pandas()
    salted = salted_join(rd.from_arrow(probe).repartition(5),
                         rd.from_arrow(build), "k",
                         num_salts=4, num_partitions=4).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "v", "w"]].values))
    assert key(plain) == key(salted)
    assert len(salted) == 1000


def test_set_ops_semantics(ray_session):
    from aida_ray.stages.shuffle_join import table_except, table_intersect
    a = rd.from_arrow(pa.table({"k": [1, 1, 2, 3, 3, 3, 4]}))
    b = rd.from_arrow(pa.table({"k": [3, 4, 4, 5]}))
    inter = sorted(table_intersect(a, b, ["k"]).to_pandas().k)
    exc = sorted(table_except(a, b, ["k"]).to_pandas().k)
    assert inter == [3, 4]
    assert exc == [1, 2]
    # EXCEPT is directional
    exc_ba = sorted(table_except(b, a, ["k"]).to_pandas().k)
    assert exc_ba == [5]


def test_full_outer_join_keeps_both_sides(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from aida_ray.stages.shuffle_join import hash_join
    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": [10, 20, 30]}))
    right = rd.from_arrow(pa.table({"rk": [2, 3, 4], "b": [200, 300, 400]}))
    out = hash_join(left, right, on=("k",), right_on=("rk",),
                    join_type="full_outer", num_partitions=2) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    # join coalesces the key pair into the left key column
    assert out.k.tolist() == [1, 2, 3, 4]
    assert out.a.isna().tolist() == [False, False, False, True]
    assert out.b.isna().tolist() == [True, False, False, False]
