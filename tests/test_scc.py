"""Strongly connected components: Tarjan kernel vs brute-force closure,
and the distributed peel route vs the single-task route."""

import numpy as np
import pyarrow as pa
import pytest


def _brute_scc(src, dst):
    """Reference: SCC via boolean transitive closure (tiny graphs)."""
    nodes = sorted(set(src) | set(dst))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    reach = np.eye(n, dtype=bool)
    for a, b in zip(src, dst):
        reach[idx[a], idx[b]] = True
    for _ in range(n):
        new = reach | (reach @ reach)
        if np.array_equal(new, reach):
            break
        reach = new
    mutual = reach & reach.T
    comp = {}
    for i, v in enumerate(nodes):
        comp[v] = min(nodes[j] for j in range(n) if mutual[i, j])
    return comp


def _edges_ds(ray, src, dst):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


def _run(ray, src, dst, **kw):
    from aida_ray.stages.scc import strongly_connected_components
    out = strongly_connected_components(_edges_ds(ray, src, dst), **kw) \
        .to_pandas()
    return dict(zip(out["node"], out["scc"]))


CASES = [
    # simple cycle
    ([1, 2, 3], [2, 3, 1]),
    # pure path (all singletons; exercises stranded emission distributed)
    ([1, 2, 3, 4], [2, 3, 4, 5]),
    # two cycles bridged by a DAG edge
    ([1, 2, 10, 11, 2], [2, 1, 11, 10, 10]),
    # self loop + isolated pair
    ([7, 1], [7, 2]),
    # nested: big cycle with an inner chord and a tail
    ([1, 2, 3, 4, 2, 4], [2, 3, 4, 1, 4, 9]),
]


@pytest.mark.parametrize("src,dst", CASES)
def test_scc_single_task_matches_bruteforce(ray_session, src, dst):
    got = _run(ray_session, src, dst)
    want = _brute_scc(src, dst)
    assert got == want


@pytest.mark.parametrize("src,dst", [CASES[1], CASES[2], CASES[3]])
def test_scc_distributed_matches_single(ray_session, src, dst):
    got = _run(ray_session, src, dst, broadcast_nodes=0, num_partitions=2)
    want = _brute_scc(src, dst)
    assert got == want


def test_scc_random_graphs(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(4, 14))
        m = int(rng.integers(n, 3 * n))
        src = rng.integers(0, n, size=m).tolist()
        dst = rng.integers(0, n, size=m).tolist()
        want = _brute_scc(src, dst)
        assert _run(ray_session, src, dst) == want, (trial, src, dst)
        if trial < 3:   # distributed route is slower; spot-check
            assert _run(ray_session, src, dst,
                        broadcast_nodes=0, num_partitions=2) == want


def test_scc_empty(ray_session):
    from aida_ray.stages.scc import strongly_connected_components
    ds = strongly_connected_components(_edges_ds(ray_session, [], []))
    assert ds.count() == 0
    assert ds.schema().names == ["node", "scc"]


def test_scc_refines_cc(ray_session):
    """Every SCC is inside one weak component: scc reps of nodes in the
    same weak component map consistently."""
    from aida_ray.stages.dedup import label_propagation_clusters
    src = [1, 2, 3, 10, 11]
    dst = [2, 1, 1, 11, 12]
    scc = _run(ray_session, src, dst)
    pairs = _edges_ds(ray_session, src, dst).map_batches(
        lambda b: pa.table({"a": b["src"], "b": b["dst"]}),
        batch_format="pyarrow")
    cc = label_propagation_clusters(pairs).to_pandas()
    cc_of = dict(zip(cc["doc_id"], cc["cluster"]))
    for v, rep in scc.items():
        assert cc_of[v] == cc_of[rep]


def test_scc_kernel_large_path_no_recursion(ray_session):
    """10k-node path — would blow Python recursion if Tarjan recursed."""
    n = 10_000
    src = list(range(n))
    dst = list(range(1, n + 1))
    got = _run(ray_session, src, dst)
    assert len(got) == n + 1
    assert all(got[v] == v for v in range(n + 1))
