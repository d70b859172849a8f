"""Unit tests: truthfinder, lpa_communities, random_walks, wl_refine,
cocitation — each checked against a local brute-force twin."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


# ------------------------------------------------------------- truthfinder

def _truth_local(rows, iters=3, tau0=0.8, damp=0.8):
    """Brute-force TruthFinder twin over (source, key, value) rows."""
    rows = sorted(set(rows))
    sources = sorted({r[0] for r in rows})
    trust = {s: tau0 for s in sources}
    conf = {}
    for _ in range(iters):
        conf = {}
        for s, k, v in rows:
            conf.setdefault((k, v), []).append(trust[s])
        conf = {c: 1.0 - np.prod([1.0 - damp * t for t in ts])
                for c, ts in conf.items()}
        by_src = {}
        for s, k, v in rows:
            by_src.setdefault(s, []).append(conf[(k, v)])
        trust = {s: float(np.mean(cs)) for s, cs in by_src.items()}
    return conf


def test_truthfinder_matches_bruteforce(ray_session):
    from aida_ray.stages.truth import truthfinder
    rows = []
    for j in range(30):
        rows.append(("s0", f"k{j}", f"T{j}"))
        rows.append(("s1", f"k{j}", f"T{j}" if j % 2 == 0 else f"F{j}"))
        if j % 3 == 0:
            rows.append(("s2", f"k{j}", f"F{j}"))
    # duplicate mentions must collapse to distinct assertions
    rows = rows + rows[:7]
    t = _ds(pa.table({
        "source": [r[0] for r in rows],
        "key": [r[1] for r in rows],
        "value": [r[2] for r in rows]}))
    got = truthfinder(t).to_pandas().sort_values(
        ["key", "value"]).reset_index(drop=True)
    want = _truth_local([tuple(r) for r in rows])
    assert len(got) == len(want)
    for _, r in got.iterrows():
        assert abs(r["conf"] - round(want[(r["key"], r["value"])], 6)) \
            < 1e-6, (r["key"], r["value"])
    # best flag: argmax conf per key, tie -> min value
    for k, g in got.groupby("key"):
        g = g.sort_values(["conf", "value"], ascending=[False, True])
        flags = got[got["key"] == k].set_index("value")["best"]
        assert flags[g.iloc[0]["value"]]
        assert flags.sum() == 1


def test_truthfinder_join_fallback_equal(ray_session):
    from aida_ray.stages.truth import truthfinder
    rows = [("s0", f"k{j}", f"v{j % 3}") for j in range(20)] + \
           [("s1", f"k{j}", f"v{(j + 1) % 3}") for j in range(20)]
    t = pa.table({"source": [r[0] for r in rows],
                  "key": [r[1] for r in rows],
                  "value": [r[2] for r in rows]})
    a = truthfinder(_ds(t)).to_pandas() \
        .sort_values(["key", "value"]).reset_index(drop=True)
    b = truthfinder(_ds(t), claim_broadcast_rows=0).to_pandas() \
        .sort_values(["key", "value"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_truthfinder_empty(ray_session):
    from aida_ray.stages.truth import truthfinder
    t = _ds(pa.table({"source": pa.array([], pa.string()),
                      "key": pa.array([], pa.string()),
                      "value": pa.array([], pa.string())}))
    assert truthfinder(t).count() == 0


# ------------------------------------------------------------- lpa

def _lpa_local(edges, nodes, iters, symmetrize=True):
    adj = {}
    for s, d in edges:
        adj.setdefault(d, []).append(s)
        if symmetrize:
            adj.setdefault(s, []).append(d)
    lab = {v: v for v in nodes}
    for _ in range(iters):
        new = {}
        for v in nodes:
            votes = [lab[u] for u in adj.get(v, [])]
            if not votes:
                new[v] = lab[v]
                continue
            cnt = pd.Series(votes).value_counts()
            top = cnt[cnt == cnt.max()].index.min()
            new[v] = top
        lab = new
    return lab


def test_lpa_two_cliques(ray_session):
    from aida_ray.stages.community import lpa_communities
    edges = []
    for base in (0, 10):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 10))   # weak bridge
    t = _ds(pa.table({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]}))
    got = lpa_communities(t, iters=4).to_pandas()
    nodes = sorted({x for e in edges for x in e})
    want = _lpa_local(edges, nodes, 4)
    for _, r in got.iterrows():
        assert r["label"] == want[r["node"]], r["node"]
    # the two cliques end in two distinct communities
    labs = got.set_index("node")["label"]
    assert labs[1] == labs[2] == labs[3]
    assert labs[11] == labs[12] == labs[13]
    assert labs[1] != labs[11]


def test_lpa_isolated_keeps_label(ray_session):
    from aida_ray.stages.community import lpa_communities
    t = _ds(pa.table({"src": [1], "dst": [2]}))
    got = lpa_communities(t, iters=3).to_pandas().set_index("node")
    assert set(got.index) == {1, 2}


# ------------------------------------------------------------- walks

def _walks_local(edges, seeds, length):
    from aida_ray.stages.community import (_WALK_A, _WALK_B, _WALK_C,
                                           _WALK_M)
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    rows = []
    for w, node in enumerate(seeds):
        rows.append((w, 0, node))
        cur = node
        for step in range(1, length + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda nb: (
                (_WALK_A * w + _WALK_B * step + _WALK_C * nb)
                % _WALK_M, nb))
            rows.append((w, step, cur))
    return sorted(rows)


def test_random_walks_deterministic(ray_session):
    from aida_ray.stages.community import random_walks
    rng = np.random.RandomState(7)
    edges = [(int(a), int(b)) for a, b in
             rng.randint(0, 40, size=(150, 2)) if a != b]
    seeds = np.arange(0, 40, 5)
    t = _ds(pa.table({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]}))
    got = random_walks(t, seeds, length=6).to_pandas()
    rows = sorted(map(tuple, got[["walk_id", "step", "node"]]
                      .to_numpy()))
    assert rows == _walks_local(edges, list(seeds), 6)


def test_random_walks_dead_end(ray_session):
    from aida_ray.stages.community import random_walks
    t = _ds(pa.table({"src": [1, 2], "dst": [2, 3]}))
    got = random_walks(t, np.array([1]), length=5).to_pandas()
    assert len(got) == 3          # 1 -> 2 -> 3 (dead end)
    assert got.sort_values("step")["node"].tolist() == [1, 2, 3]


# ------------------------------------------------------------- wl

def _wl_local(edges, iters):
    nodes = sorted({x for e in edges for x in e})
    adj = {v: [] for v in nodes}
    for s, d in edges:
        adj[s].append(d)
        adj[d].append(s)
    lab = {v: str(len(adj[v])) for v in nodes}
    for _ in range(iters):
        lab = {v: hashlib.md5(
            (lab[v] + "|" + ",".join(sorted(lab[u] for u in adj[v])))
            .encode()).hexdigest()[:16] for v in nodes}
    return lab


def test_wl_refine_matches_local(ray_session):
    from aida_ray.stages.community import wl_refine
    edges = [(i, i // 2) for i in range(1, 20)]
    t = _ds(pa.table({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]}))
    got = wl_refine(t, iters=2).to_pandas()
    want = _wl_local(edges, 2)
    for _, r in got.iterrows():
        assert r["wl_label"] == want[r["node"]], r["node"]
    # symmetric subtrees hash equal: leaves 16..19 share a signature
    labs = got.set_index("node")["wl_label"]
    assert labs[16] == labs[17] == labs[18] == labs[19]


def test_wl_distinguishes_structure(ray_session):
    from aida_ray.stages.community import wl_refine
    # path of 4 vs star of 4 — same size, different WL signatures
    path = [(0, 1), (1, 2), (2, 3)]
    star = [(10, 11), (10, 12), (10, 13)]
    t = _ds(pa.table({"src": [e[0] for e in path + star],
                      "dst": [e[1] for e in path + star]}))
    got = wl_refine(t, iters=2).to_pandas().set_index("node")
    assert set(got.loc[[0, 1, 2, 3], "wl_label"]) != \
        set(got.loc[[10, 11, 12, 13], "wl_label"])


# ------------------------------------------------------------- cocitation

def test_cocitation_counts(ray_session):
    from aida_ray.stages.community import cocitation
    edges = []
    for s in range(12):
        edges.append((s, 100))
        edges.append((s, 101))
        if s % 2 == 0:
            edges.append((s, 102))
    t = _ds(pa.table({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]}))
    got = cocitation(t, min_count=2).to_pandas() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    want = pd.DataFrame({"a": [100, 100, 101],
                         "b": [101, 102, 102],
                         "n": [12, 6, 6]})
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  want.astype("int64"))


def test_cocitation_degree_cap(ray_session):
    from aida_ray.stages.community import cocitation
    edges = [(0, d) for d in range(10)] + [(1, 0), (1, 1), (1, 2)]
    t = _ds(pa.table({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]}))
    got = cocitation(t, min_count=1, max_out=3).to_pandas()
    # src 0 truncated to targets {0,1,2}; pairs each counted twice
    assert set(map(tuple, got[["a", "b"]].to_numpy())) == \
        {(0, 1), (0, 2), (1, 2)}
    assert (got["n"] == 2).all()
