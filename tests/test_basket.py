"""Market-basket rules: brute-force parity + blocking invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from aida_ray.stages.basket import market_basket_rules


def brute_rules(df: pd.DataFrame, min_support: int):
    bi = df.drop_duplicates()
    n_baskets = bi.o.nunique()
    sup = bi.groupby("i").size().to_dict()
    from collections import Counter
    import itertools
    pair_n: Counter = Counter()
    for _, g in bi.groupby("o"):
        for a, b in itertools.combinations(sorted(g.i.unique()), 2):
            pair_n[(a, b)] += 1
    out = {}
    for (a, b), n_ab in pair_n.items():
        if n_ab >= min_support:
            out[(a, b)] = (n_ab, round(n_ab / sup[a], 6),
                           round(n_baskets * n_ab / (sup[a] * sup[b]),
                                 6))
    return out


def test_market_basket_matches_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    n = 600
    df = pd.DataFrame({"o": rng.integers(0, 80, n),
                       "i": rng.integers(0, 15, n)})
    ds = rd.from_arrow(pa.table({
        "l_orderkey": pa.array(df.o.to_numpy(), pa.int64()),
        "l_partkey": pa.array(df.i.to_numpy(), pa.int64())})) \
        .repartition(5)
    got = market_basket_rules(ds, "l_orderkey", "l_partkey",
                              min_support=3).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    ref = brute_rules(df, min_support=3)
    assert len(got) == len(ref)
    for r in got.itertuples():
        n_ab, conf, lift = ref[(int(r.a), int(r.b))]
        assert int(r.n_ab) == n_ab
        assert abs(r.conf_ab - conf) < 1e-9
        assert abs(r.lift - lift) < 1e-9


def test_market_basket_blocking_invariant(ray_session):
    rng = np.random.default_rng(18)
    n = 400
    tbl = pa.table({
        "l_orderkey": pa.array(rng.integers(0, 50, n), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 10, n), pa.int64())})
    outs = []
    for parts in (1, 4, 8):
        got = market_basket_rules(rd.from_arrow(tbl).repartition(parts),
                                  "l_orderkey", "l_partkey",
                                  min_support=2).to_pandas() \
            .sort_values(["a", "b"]).reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])
