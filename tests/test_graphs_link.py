"""Tests for HITS (vs dense numpy power iteration), Adamic-Adar link
prediction (vs brute force, incl. boundary-straddling runs), and
fuzzy (MinHash) cross-split contamination."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


def _numpy_hits(src, dst, nodes, iters):
    n = len(nodes)
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = np.bincount(di, weights=hub[si], minlength=n)
        auth = auth / auth.sum()
        hub = np.bincount(si, weights=auth[di], minlength=n)
        hub = hub / hub.sum()
    return hub, auth


def test_hits_matches_numpy(ray_session):
    from aida_ray.stages.graphs import hits
    rng = np.random.default_rng(23)
    n = 40
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    keep = src != dst
    # distinct directed edges
    packed = np.unique((src[keep].astype("int64") << 32) | dst[keep])
    src, dst = packed >> 32, packed & 0xFFFFFFFF
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})) \
        .repartition(4)
    out = hits(edges, iters=6).to_pandas().set_index("node")
    nodes = np.unique(np.concatenate([src, dst]))
    hub, auth = _numpy_hits(src, dst, nodes, iters=6)
    assert sorted(out.index) == list(nodes)
    np.testing.assert_allclose(out.loc[nodes, "hub"], hub, atol=1e-12)
    np.testing.assert_allclose(out.loc[nodes, "auth"], auth, atol=1e-12)
    assert abs(out["hub"].sum() - 1.0) < 1e-9
    assert abs(out["auth"].sum() - 1.0) < 1e-9


def test_hits_sparse_route_equal(ray_session):
    from aida_ray.stages.graphs import hits
    src = np.array([0, 0, 1, 2, 3], dtype="int64")
    dst = np.array([1, 2, 2, 3, 0], dtype="int64")
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    dense = hits(edges, iters=4).to_pandas()
    sparse = hits(edges, iters=4, dense_threshold=0).to_pandas()
    np.testing.assert_allclose(dense["hub"], sparse["hub"], atol=1e-12)
    np.testing.assert_allclose(dense["auth"], sparse["auth"], atol=1e-12)


def _brute_aa(edges, max_degree=None):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for z, nbs in adj.items():
        d = len(nbs)
        if d < 2 or (max_degree is not None and d > max_degree):
            continue
        w = 1.0 / np.log(d)
        nbs = sorted(nbs)
        for i in range(len(nbs)):
            for j in range(i + 1, len(nbs)):
                scores[(nbs[i], nbs[j])] = \
                    scores.get((nbs[i], nbs[j]), 0.0) + w
    return scores


def test_adamic_adar_matches_brute(ray_session):
    from aida_ray.stages.graphs import adamic_adar
    rng = np.random.default_rng(7)
    n = 30
    a = rng.integers(0, n, 120)
    b = rng.integers(0, n, 120)
    keep = a != b
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    packed = np.unique((lo.astype("int64") << 32) | hi)
    lo, hi = packed >> 32, packed & 0xFFFFFFFF
    # tiny blocks force boundary-straddling center runs
    edges = rd.from_arrow(pa.table({"a": lo, "b": hi})).repartition(9)
    got = adamic_adar(edges).to_pandas()
    ref = _brute_aa(list(zip(lo.tolist(), hi.tolist())))
    assert len(got) == len(ref)
    for _, r in got.iterrows():
        assert abs(ref[(r["u"], r["v"])] - r["score"]) < 1e-9


def test_adamic_adar_max_degree(ray_session):
    from aida_ray.stages.graphs import adamic_adar
    # star center 0 with 5 leaves (deg 5) + a path 10-11-12 (deg 2)
    a = np.array([0, 0, 0, 0, 0, 10, 11], dtype="int64")
    b = np.array([1, 2, 3, 4, 5, 11, 12], dtype="int64")
    edges = rd.from_arrow(pa.table({"a": a, "b": b}))
    got = adamic_adar(edges, max_degree=4).to_pandas()
    ref = _brute_aa(list(zip(a.tolist(), b.tolist())), max_degree=4)
    assert len(got) == len(ref)
    # the hub's 10 leaf pairs are skipped; 10-12 via center 11 remains
    assert (10, 12) in ref and len(ref) > 0


def test_fuzzy_contamination_plants(ray_session):
    from aida_ray.stages.contamination import fuzzy_contamination
    rng = np.random.default_rng(99)
    words = [f"w{k}" for k in range(400)]
    texts = [" ".join(rng.choice(words, 30)) for _ in range(40)]
    # doc 10 (eval) is a near-copy of doc 3 (train)
    texts[10] = texts[3] + " tail"
    ids = np.arange(40, dtype="int64")
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})) \
        .repartition(4)
    out = fuzzy_contamination(
        ds, is_eval=lambda x: x % 10 == 0,
        jaccard_threshold=0.8).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["eval_id"] == 10 and out.iloc[0]["train_id"] == 3
    assert out.iloc[0]["jaccard"] > 0.8


def test_pagerank_personalization_uniform_unchanged(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from aida_ray.stages.graphs import pagerank
    t = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                  "dst": pa.array([1, 2, 0, 0], pa.int64())})
    ds = ray.data.from_arrow(t)
    a = pagerank(ds, iters=8).to_pandas()
    b = pagerank(ds, iters=8,
                 personalization=[0, 1, 2, 3]).to_pandas()
    assert np.allclose(a["rank"], b["rank"], atol=0, rtol=0)


def test_trustrank_seeds_concentrate_mass(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from aida_ray.stages.graphs import pagerank
    # 0 -> 1 -> 2 (chain), 5 -> 6 isolated pair; trust seeded at 0
    t = pa.table({"src": pa.array([0, 1, 5], pa.int64()),
                  "dst": pa.array([1, 2, 6], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = pagerank(ds, iters=20, personalization=[0]).to_pandas() \
        .set_index("node")["rank"]
    # local numpy reference on the same 5-node graph
    nodes = np.array([0, 1, 2, 5, 6])
    outd = np.array([1.0, 1.0, 0.0, 1.0, 0.0])
    tv = np.array([1.0, 0, 0, 0, 0])
    r = tv.copy()
    for _ in range(20):
        share = r / np.maximum(outd, 1.0)
        mass = np.zeros(5)
        mass[1] += share[0]
        mass[2] += share[1]
        mass[4] += share[3]
        dang = r[outd == 0].sum()
        r = 0.15 * tv + 0.85 * (mass + dang * tv)
    for i, n in enumerate(nodes):
        assert out.loc[n] == pytest.approx(r[i], abs=1e-12)
    # untrusted component receives no mass
    assert out.loc[5] == 0.0 and out.loc[6] == 0.0


def test_trustrank_unknown_seed_raises(ray_session):
    import pyarrow as pa
    import ray.data
    from aida_ray.stages.graphs import pagerank
    t = pa.table({"src": pa.array([0], pa.int64()),
                  "dst": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="seed"):
        pagerank(ray.data.from_arrow(t), personalization=[99])
