import numpy as np
import pyarrow as pa

from aida_ray.stages.urls import _resolve_np, resolve_redirects


def _brute(edges: dict[int, int]) -> dict[int, tuple[int, int]]:
    out = {}
    for n in edges:
        cur, hops, seen = n, 0, set()
        while cur in edges:
            if cur in seen or hops > len(edges):
                cur, hops = -1, -1
                break
            seen.add(cur)
            cur = edges[cur]
            hops += 1
        out[n] = (cur, hops)
    return out


def test_resolve_np_chains_and_cycle():
    # chain 1->2->3->99 (terminal), 2-cycle 10<->11, feeder 12->10
    edges = {1: 2, 2: 3, 3: 99, 10: 11, 11: 10, 12: 10}
    nodes = np.array(list(edges), dtype=np.int64)
    ptrs = np.array([edges[n] for n in nodes], dtype=np.int64)
    final, hops = _resolve_np(nodes, ptrs)
    got = {int(n): (int(f), int(h)) for n, f, h in zip(nodes, final, hops)}
    assert got == _brute(edges)
    assert got[1] == (99, 3)
    assert got[10] == (-1, -1)
    assert got[12] == (-1, -1)


def test_resolve_np_long_chain_exact_hops():
    # 0->1->...->200 (terminal 200)
    edges = {i: i + 1 for i in range(200)}
    nodes = np.array(list(edges), dtype=np.int64)
    ptrs = nodes + 1
    final, hops = _resolve_np(nodes, ptrs)
    assert (final == 200).all()
    assert list(hops) == [200 - i for i in range(200)]


def test_resolve_np_self_loop():
    nodes = np.array([5], dtype=np.int64)
    ptrs = np.array([5], dtype=np.int64)
    final, hops = _resolve_np(nodes, ptrs)
    assert final[0] == -1 and hops[0] == -1


def test_resolve_redirects_gated_vs_iterative(ray_session):
    import ray.data
    rng = np.random.RandomState(7)
    # random functional graph over 400 nodes: some chains, some cycles
    nodes = np.arange(400, dtype=np.int64)
    ptrs = rng.randint(0, 500, size=400).astype(np.int64)
    edges = dict(zip(nodes.tolist(), ptrs.tolist()))
    t = pa.table({"src": pa.array(nodes), "dst": pa.array(ptrs)})
    ds = ray.data.from_arrow(t).repartition(4)
    want = _brute(edges)

    small = resolve_redirects(ds, broadcast_rows=8_000_000).to_pandas()
    got = {int(r.node): (int(r.final), int(r.hops))
           for r in small.itertuples()}
    assert got == want

    big = resolve_redirects(ds, broadcast_rows=10).to_pandas()
    got2 = {int(r.node): (int(r.final), int(r.hops))
            for r in big.itertuples()}
    assert got2 == want


def test_resolve_redirects_empty(ray_session):
    import ray.data
    t = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    out = resolve_redirects(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 0
    # Ray drops the schema of empty from_arrow datasets in to_pandas;
    # downstream collectors re-apply it (state/collect.py), so only
    # assert emptiness plus name correctness when columns survive
    assert list(out.columns) in ([], ["node", "final", "hops"])
