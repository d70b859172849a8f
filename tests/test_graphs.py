"""Tests for PageRank (vs dense numpy power iteration) and the
heavy-hitters sketch (coverage + bound guarantees)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _numpy_pagerank(src, dst, n, damping=0.85, iters=20):
    outd = np.bincount(src, minlength=n).astype(float)
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        share = rank / np.maximum(outd, 1.0)
        mass = np.bincount(dst, weights=share[src], minlength=n)
        dangling = rank[outd == 0].sum()
        rank = (1 - damping) / n + damping * (mass + dangling / n)
    return rank


def test_pagerank_matches_numpy(ray_session):
    from aida_ray.stages.graphs import pagerank
    rng = np.random.default_rng(17)
    n = 60
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(5)
    out = pagerank(edges, iters=15).to_pandas().set_index("node")["rank"]
    ref = _numpy_pagerank(src, dst, n, iters=15)
    present = np.unique(np.concatenate([src, dst]))
    # same node universe (nodes with no edges aren't in the table)
    assert sorted(out.index) == sorted(present)
    # ranks match the dense reference on the shared universe;
    # isolated-node absence shifts normalization by a constant factor
    sub = ref[present] / ref[present].sum()
    mine = out.loc[present].to_numpy() / out.loc[present].sum()
    assert np.allclose(mine, sub, atol=1e-9)
    assert abs(out.sum() - 1.0) < 1e-9


def test_heavy_hitters_guarantee(ray_session):
    from aida_ray.stages.graphs import heavy_hitters
    rng = np.random.default_rng(23)
    # 3 planted heavies + a long zipf tail
    tail = [f"t{i}" for i in rng.integers(0, 5000, 20000)]
    data = ["HOT_A"] * 5000 + ["HOT_B"] * 3000 + ["HOT_C"] * 1500 + tail
    rng.shuffle(data)
    ds = rd.from_arrow(pa.table({"v": data})).repartition(8)
    out = heavy_hitters(ds, "v", m=32)
    top3 = out.head(3)
    assert set(top3.value) == {"HOT_A", "HOT_B", "HOT_C"}
    truth = pd.Series(data).value_counts()
    for _, r in out.iterrows():
        t = truth[r.value]
        assert r.est <= t <= r.est + r.max_undercount, (r.value, t, r.est)


def test_pagerank_dense_equals_sparse_route(ray_session):
    import pyarrow as pa

    from aida_ray.stages.graphs import pagerank
    rng = np.random.default_rng(5)
    src = rng.integers(0, 40, 200)
    dst = rng.integers(0, 40, 200)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    dense = pagerank(edges, iters=6).to_pandas().set_index("node")
    sparse = pagerank(edges, iters=6, dense_threshold=0).to_pandas() \
        .set_index("node")
    assert np.allclose(dense["rank"], sparse.loc[dense.index, "rank"],
                       atol=1e-12)


def test_cooccurrence_edges_and_triangles(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from itertools import combinations
    from aida_ray.stages.graphs import cooccurrence_edges, triangle_count
    rng = np.random.default_rng(11)
    groups, items = [], []
    baskets = {}
    for g in range(60):
        sz = rng.integers(2, 7)
        its = rng.choice(40, sz, replace=False)
        baskets[g] = set(its.tolist())
        # duplicates within a basket must not create self/duplicate edges
        its = np.concatenate([its, its[:1]])
        groups += [g] * len(its)
        items += its.tolist()
    tbl = pa.table({"g": groups, "i": pa.array(items, pa.int64())})
    edges = cooccurrence_edges(rd.from_arrow(tbl).repartition(5), "g", "i") \
        .to_pandas()
    ref_edges = set()
    for its in baskets.values():
        for x, y in combinations(sorted(its), 2):
            ref_edges.add((x, y))
    got = set(zip(edges.a, edges.b))
    assert got == ref_edges
    # brute-force triangle reference
    adj = {}
    for x, y in ref_edges:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    ref_tri = sum(1 for x, y in ref_edges
                  for z in adj[x] & adj[y] if z > y)
    assert triangle_count(
        rd.from_arrow(pa.Table.from_pandas(edges)).repartition(4)) == ref_tri
    assert ref_tri > 0


def _py_bfs(edges, seeds, max_hops):
    from collections import deque
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] >= max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def test_bfs_dense_sparse_equal(ray_session):
    from aida_ray.stages.graphs import bfs_hops
    rng = np.random.default_rng(31)
    a = rng.integers(0, 200, 500)
    b = rng.integers(0, 200, 500)
    keep = a != b
    pairs = sorted({(min(x, y), max(x, y))
                    for x, y in zip(a[keep], b[keep])})
    edges = rd.from_arrow(pa.table({
        "a": np.array([p[0] for p in pairs], dtype="int64"),
        "b": np.array([p[1] for p in pairs], dtype="int64")})) \
        .repartition(4)
    seeds = np.array([0, 50, 100, 150, 300])  # 300 isolated: hop 0 only
    dense = bfs_hops(edges, seeds, max_hops=3, route="dense").to_pandas()
    sparse = bfs_hops(edges, seeds, max_hops=3,
                      route="sparse").to_pandas()
    ref = _py_bfs(pairs, list(seeds), 3)
    assert dict(zip(dense.node, dense.hop)) == ref
    pd.testing.assert_frame_equal(
        dense.sort_values("node").reset_index(drop=True),
        sparse.sort_values("node").reset_index(drop=True))


def test_ancestor_closure_random_forest(ray_session):
    from aida_ray.stages.graphs import ancestor_closure
    # functional forest: parent(n) = n // 3 for n >= 1 (root 0)
    n = 120
    child = np.arange(1, n, dtype="int64")
    parent = child // 3
    edges = rd.from_arrow(pa.table({"child": child,
                                    "parent": parent})).repartition(5)
    out = ancestor_closure(edges).to_pandas()
    ref = set()
    for c in child:
        anc, d = int(c) // 3, 1
        while True:
            ref.add((int(c), anc, d))
            if anc == 0:
                break
            anc, d = anc // 3, d + 1
    got = set(zip(out.node, out.anc, out.dist))
    assert got == ref
    # no duplicate (node, anc) pairs from the doubling rounds
    assert len(out) == len(out[["node", "anc"]].drop_duplicates())


def test_kcore_matches_python_peel(ray_session):
    from aida_ray.stages.graphs import kcore
    rng = np.random.default_rng(13)
    # planted clique (high core) + sparse tail
    clique = list(range(10))
    edges = {(i, j) for i in clique for j in clique if i < j}
    a = rng.integers(0, 80, 300)
    b = rng.integers(0, 80, 300)
    edges |= {(min(x, y), max(x, y)) for x, y in zip(a, b) if x != y}
    edges = sorted(edges)
    ds = rd.from_arrow(pa.table({
        "a": np.array([e[0] for e in edges], dtype="int64"),
        "b": np.array([e[1] for e in edges], dtype="int64")})) \
        .repartition(4)
    for k in (3, 6, 9):
        out = kcore(ds, k).to_pandas()
        # python peeling reference
        alive = {n for e in edges for n in e}
        while True:
            deg = {}
            for x, y in edges:
                if x in alive and y in alive:
                    deg[x] = deg.get(x, 0) + 1
                    deg[y] = deg.get(y, 0) + 1
            surv = {n for n, d in deg.items() if d >= k}
            if surv == alive or not surv:
                break
            alive = surv
        ref = deg if surv else {}
        ref = {n: d for n, d in ref.items() if n in surv}
        assert dict(zip(out.node, out.degree)) == ref
    assert set(kcore(ds, 9).to_pandas().node) >= set(clique)


def test_cheapest_paths_matches_python(ray_session):
    from aida_ray.stages.graphs import cheapest_paths
    rng = np.random.default_rng(41)
    src = rng.integers(0, 60, 250).astype("int64")
    dst = rng.integers(0, 60, 250).astype("int64")
    w = rng.integers(1, 20, 250).astype("int64")
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst, "w": w})) \
        .repartition(4)
    seeds = [0, 7]
    out = cheapest_paths(ds, np.array(seeds), max_hops=3)
    got = dict(zip(out["node"].to_pylist(), out["cost"].to_pylist()))
    # python hop-bounded Bellman-Ford (same min-plus semantics)
    INF = float("inf")
    dist = {s: 0 for s in seeds}
    for _ in range(3):
        new = dict(dist)
        for s, d, ww in zip(src, dst, w):
            c = dist.get(int(s), INF)
            if c + int(ww) < new.get(int(d), INF):
                new[int(d)] = c + int(ww)
        dist = new
    assert got == dist
