"""k-truss and SimRank vs pure-python references + route equality."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def _py_ktruss(es, k):
    es = set(es)
    nodes = {x for e in es for x in e}
    while True:
        sup = {(x, y): sum(
            1 for w in nodes
            if (min(x, w), max(x, w)) in es
            and (min(y, w), max(y, w)) in es and w not in (x, y))
            for (x, y) in es}
        keep = {e for e in es if sup[e] >= k - 2}
        if keep == es:
            return {e: sup[e] for e in es}
        es = keep


def test_ktruss_planted(ray_session):
    from aida_ray.stages.graphs import ktruss
    # K5 clique + a lone triangle + a pendant chain
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    edges += [(10, 11), (11, 12), (10, 12), (4, 20), (20, 21)]
    t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                  "b": pa.array([e[1] for e in edges], pa.int64())})
    for k in (3, 4, 5, 6):
        got = ktruss(rd.from_arrow(t).repartition(3), k).to_pandas()
        gd = {(r.a, r.b): r.support for r in got.itertuples()}
        assert gd == _py_ktruss(edges, k)


def test_ktruss_random_vs_reference(ray_session):
    from aida_ray.stages.graphs import ktruss
    rng = np.random.default_rng(9)
    raw = {(int(min(a, b)), int(max(a, b)))
           for a, b in rng.integers(0, 30, (200, 2)) if a != b}
    edges = sorted(raw)
    t = pa.table({"a": pa.array([e[0] for e in edges], pa.int64()),
                  "b": pa.array([e[1] for e in edges], pa.int64())})
    got = ktruss(rd.from_arrow(t).repartition(5), 4).to_pandas()
    gd = {(r.a, r.b): r.support for r in got.itertuples()}
    assert gd == _py_ktruss(edges, 4)


def test_ktruss_rejects_k2(ray_session):
    import pytest

    from aida_ray.stages.graphs import ktruss
    t = pa.table({"a": pa.array([0], pa.int64()),
                  "b": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        ktruss(rd.from_arrow(t), 2)


def _py_simrank(ep, iters, c=0.8):
    nodes = sorted({x for e in ep for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    E = np.zeros((n, n))
    for a, b in ep:
        E[idx[a], idx[b]] = 1
    ind = E.sum(0)
    dnz = np.where(ind > 0, ind, 1)
    S = np.eye(n)
    for _ in range(iters):
        S = c * (E.T @ S @ E) / np.outer(dnz, dnz)
        S[ind == 0, :] = 0
        S[:, ind == 0] = 0
        np.fill_diagonal(S, 1)
    return {(nodes[i], nodes[j]): round(S[i, j], 6)
            for i in range(n) for j in range(i + 1, n)
            if round(S[i, j], 6) > 0}


def test_simrank_dense_vs_reference(ray_session):
    from aida_ray.stages.graphs import simrank
    rng = np.random.default_rng(2)
    src = rng.integers(0, 15, 40)
    dst = rng.integers(0, 15, 40)
    keep = src != dst
    ep = sorted({(int(a), int(b)) for a, b in zip(src[keep], dst[keep])})
    t = pa.table({"src": pa.array([e[0] for e in ep], pa.int64()),
                  "dst": pa.array([e[1] for e in ep], pa.int64())})
    got = simrank(rd.from_arrow(t).repartition(4), iterations=3) \
        .to_pandas()
    gd = {(r.a, r.b): r.sim for r in got.itertuples()}
    assert gd == _py_simrank(ep, 3)


def test_simrank_route_equality(ray_session):
    from aida_ray.stages.graphs import simrank
    rng = np.random.default_rng(4)
    src = rng.integers(0, 12, 30)
    dst = rng.integers(0, 12, 30)
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep], pa.int64()),
                  "dst": pa.array(dst[keep], pa.int64())})
    dense = simrank(rd.from_arrow(t), iterations=3).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    stream = simrank(rd.from_arrow(t), iterations=3, gate_nodes=0) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert dense.equals(stream)


def test_simrank_empty(ray_session):
    from aida_ray.stages.graphs import simrank
    t = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    assert simrank(rd.from_arrow(t)).num_rows == 0
