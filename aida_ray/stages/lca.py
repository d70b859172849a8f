"""Lowest common ancestor over a type taxonomy.

Given a functional parent tree (the subClassOf taxonomy — same input
family as graphs.ancestor_closure / kgqa's RDFS entailment) and a
stream of node pairs, emit each pair's LCA and the LCA's depth from
the root — the semantic-similarity primitive (Wu-Palmer / Resnik
style measures are one arithmetic step away from (depth(lca),
depth(a), depth(b))).

Scale shape: the taxonomy is dictionary-sized next to the pair
stream (a type system has 10^3-10^6 nodes, not 10^11), so the parent
map is broadcast ONCE via ``ray.put`` and each pair resolves in
O(depth) dict walks inside a stateless ``map_batches`` — no shuffle,
no per-batch rebuilds (the deserialized map is memoized per worker
via ``_get_cached``).  A forest is allowed: pairs in different trees
emit lca = -1, depth = -1.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from aida_ray.state.collect import collect_table


def lca_pairs(pairs: ray.data.Dataset, edges: ray.data.Dataset,
              a_col: str = "a", b_col: str = "b",
              child: str = "child",
              parent: str = "parent") -> ray.data.Dataset:
    """Append (lca, lca_depth) to each pair row (-1/-1 when the two
    nodes share no ancestor)."""
    from aida_ray.stages.dedup import _get_cached

    et = collect_table(edges, schema=pa.schema(
        [(child, pa.int64()), (parent, pa.int64())]))
    parent_map = dict(zip(et[child].to_pylist(),
                          et[parent].to_pylist()))
    pref = ray.put(parent_map)

    def batch(b: pa.Table) -> pa.Table:
        pm = _get_cached(pref)

        def chain(n: int) -> list[int]:
            path = [n]
            while path[-1] in pm:
                path.append(pm[path[-1]])
            return path

        lcas, depths = [], []
        for a, bb in zip(b[a_col].to_pylist(), b[b_col].to_pylist()):
            pa_chain = chain(int(a))
            pb_chain = chain(int(bb))
            # position of each ancestor on b's path (0 = b itself);
            # depth from the root is the remaining distance to b's root
            anc_b = {n: i for i, n in enumerate(pb_chain)}
            lca, depth = -1, -1
            for n in pa_chain:
                if n in anc_b:
                    lca = n
                    depth = len(pb_chain) - 1 - anc_b[n]
                    break
            lcas.append(lca)
            depths.append(depth)
        return b.append_column("lca", pa.array(lcas, pa.int64())) \
                .append_column("lca_depth", pa.array(depths, pa.int64()))

    return pairs.map_batches(batch, batch_format="pyarrow")
