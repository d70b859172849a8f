"""Strongly connected components over directed edge tables.

Completes the graph-analytics family (pagerank / connected_components /
k-core / triangles) with the directed-cycle analogue.  Reference anchor:
the NED coherence graph (`mpi.aida.graph.Graph`) is undirected, but the
link-graph family (`stages/links.py`) produces directed web graphs where
cycle detection (mutual-link cores) is the natural next operator.

Two routes, gated by edge count like `dedup.label_propagation_clusters`:

- **Single-task kernel** (≤ ``broadcast_nodes`` endpoint bound): one
  ``@ray.remote`` task runs an iterative (explicit-stack) Tarjan over
  the edge arrays.  O(V+E), off-driver, deterministic.  A Python loop —
  but a *bounded single task*, the same contract as `_cc_numpy`'s
  single-task route, not a per-batch hot path.

- **Distributed peel** (above the bound): the Orzan-style coloring
  algorithm expressed as Dataset joins —

  1. *Forward min-coloring to fixpoint*: ``color[v] = min(v, min
     color[u] over edges u→v)`` with pointer jumping (``color[v] :=
     min(color[v], color[color[v]])`` is sound because ``color[v] = r``
     witnesses that r reaches v, so anything reaching r reaches v) —
     O(log diameter) join rounds.
  2. *Backward marking within a color*: from each root (``color[v] ==
     v``) walk reversed edges restricted to equal color; marked nodes
     form exactly the SCC of their root (forward-reachable from root by
     color definition, backward-reachable by the walk).
  3. *Peel*: emit marked nodes with ``scc = color``, drop all their
     edges, repeat.  Each peel removes ≥1 SCC per color region; the
     number of peels is bounded by the depth of the SCC condensation
     DAG along min-id chains — shallow for web/dedup graphs (documented
     partitioning assumption; the bounded route has no such limit).

Output: ``(node, scc)`` with ``scc`` = min node id in the component —
the same representative convention as `connected_components`, so the
two are directly comparable (and SCC refines CC).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.state.collect import concat_blocks

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _scc_tarjan(src: np.ndarray, dst: np.ndarray):
    """Iterative Tarjan over int64 edge arrays.

    Returns (nodes, comp): sorted unique node ids and, aligned with
    them, the min node id of each node's strongly connected component.
    Explicit stack (no recursion — safe for long path graphs)."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(nodes)
    isrc, idst = inv[: len(src)], inv[len(src):]
    # CSR adjacency: out-edges of node i are adj[ptr[i]:ptr[i+1]]
    order = np.argsort(isrc, kind="stable")
    adj = idst[order]
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(ptr, isrc + 1, 1)
    np.cumsum(ptr, out=ptr)

    UNSET = -1
    index = np.full(n, UNSET, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, UNSET, dtype=np.int64)
    stack: list[int] = []
    next_index = 0

    ptr_l = ptr.tolist()
    adj_l = adj.tolist()

    for root in range(n):
        if index[root] != UNSET:
            continue
        # work stack of (node, next-edge-offset)
        work = [(root, ptr_l[root])]
        index[root] = low[root] = next_index
        next_index += 1
        stack.append(root)
        on_stack[root] = True
        while work:
            v, ei = work[-1]
            if ei < ptr_l[v + 1]:
                work[-1] = (v, ei + 1)
                w = adj_l[ei]
                if index[w] == UNSET:
                    index[w] = low[w] = next_index
                    next_index += 1
                    stack.append(w)
                    on_stack[w] = True
                    work.append((w, ptr_l[w]))
                elif on_stack[w]:
                    if index[w] < low[v]:
                        low[v] = index[w]
            else:
                work.pop()
                if work:
                    p = work[-1][0]
                    if low[v] < low[p]:
                        low[p] = low[v]
                if low[v] == index[v]:
                    # v is an SCC root: pop members, label by min node id
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack[w] = False
                        members.append(w)
                        if w == v:
                            break
                    m = np.asarray(members, dtype=np.int64)
                    comp[m] = m.min()
    # comp currently holds member-*index* mins; map to node ids
    return nodes, nodes[comp]


@ray.remote
def _scc_single(*tabs: pa.Table) -> pa.Table:
    t = concat_blocks(tabs, _EDGE_SCHEMA)
    nodes, comp = _scc_tarjan(
        t["src"].to_numpy(zero_copy_only=False),
        t["dst"].to_numpy(zero_copy_only=False))
    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "scc": pa.array(comp, pa.int64())})


def _rename(ds: ray.data.Dataset, names: list[str]) -> ray.data.Dataset:
    return ds.map_batches(lambda b: b.rename_columns(names),
                          batch_format="pyarrow")


def strongly_connected_components(
        edges: ray.data.Dataset, src: str = "src", dst: str = "dst",
        broadcast_nodes: int = 4_000_000, max_iters: int = 50,
        num_partitions: int = 16) -> ray.data.Dataset:
    """SCC of a directed (src, dst) edge Dataset → (node, scc) rows,
    ``scc`` = min node id in the component.  Nodes appearing only as
    isolated endpoints of self-loops or with no cycle membership get
    their own id (singleton SCCs), matching Tarjan semantics."""
    from ray.data.aggregate import Max, Min

    if src != "src" or dst != "dst":
        edges = edges.map_batches(
            lambda b, s=src, d=dst: pa.table(
                {"src": pc.cast(b[s], pa.int64()),
                 "dst": pc.cast(b[d], pa.int64())}),
            batch_format="pyarrow")

    n_edges = edges.count()
    if 2 * n_edges <= broadcast_nodes:
        refs = edges.to_arrow_refs()
        if n_edges == 0 or not refs:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.int64()),
                 "scc": pa.array([], pa.int64())}))
        return ray.data.from_arrow_refs([_scc_single.remote(*refs)])

    # ---------- distributed peel ----------
    edges = edges.map_batches(
        lambda b: pa.table({"src": pc.cast(b["src"], pa.int64()),
                            "dst": pc.cast(b["dst"], pa.int64())}),
        batch_format="pyarrow").materialize()
    done_parts: list[ray.data.Dataset] = []

    for _peel in range(max_iters):
        if edges.count() == 0:
            break
        # node table with initial color = own id
        nodes = edges.map_batches(
            lambda b: pa.table({"node": pa.array(np.concatenate(
                [b["src"].to_numpy(zero_copy_only=False),
                 b["dst"].to_numpy(zero_copy_only=False)]), pa.int64())}),
            batch_format="pyarrow")
        from aida_ray.stages.agg import gated_count
        nodes = gated_count(nodes, "node") \
            .map_batches(lambda b: pa.table({
                "node": pc.cast(b["node"], pa.int64()),
                "color": pc.cast(b["node"], pa.int64())}),
                batch_format="pyarrow").materialize()

        # 1. forward min-color fixpoint with pointer jumping
        colors = nodes
        prev = colors.sum("color")
        for _ in range(max_iters):
            prop = edges.join(colors, join_type="inner",
                              num_partitions=num_partitions,
                              on=("src",), right_on=("node",)) \
                .map_batches(lambda b: pa.table({
                    "node": pc.cast(b["dst"], pa.int64()),
                    "color": pc.cast(b["color"], pa.int64())}),
                    batch_format="pyarrow")
            jump = colors.join(
                _rename(colors, ["cnode", "ccolor"]),
                join_type="inner", num_partitions=num_partitions,
                on=("color",), right_on=("cnode",)) \
                .map_batches(lambda b: pa.table({
                    "node": pc.cast(b["node"], pa.int64()),
                    "color": pc.cast(b["ccolor"], pa.int64())}),
                    batch_format="pyarrow")
            colors = prop.union(jump, colors).groupby("node") \
                .aggregate(Min("color")) \
                .map_batches(lambda b: pa.table({
                    "node": pc.cast(b["node"], pa.int64()),
                    "color": pc.cast(b["min(color)"], pa.int64())}),
                    batch_format="pyarrow").materialize()
            cur = colors.sum("color")
            if cur == prev:       # colors only decrease → sum is a witness
                break
            prev = cur

        # 2. backward marking: root nodes (color == node) spread along
        # reversed, color-preserving edges.  mark ∈ {0,1}, monotone ↑.
        ce = edges.join(colors, join_type="inner",
                        num_partitions=num_partitions,
                        on=("src",), right_on=("node",))
        ce = _rename(ce.select_columns(["src", "dst", "color"]),
                     ["src", "dst", "scolor"])
        ce = ce.join(colors, join_type="inner",
                     num_partitions=num_partitions,
                     on=("dst",), right_on=("node",))
        same = ce.map_batches(
            lambda b: pa.table({
                "src": b["src"], "dst": b["dst"],
                "keep": pc.equal(b["scolor"], b["color"])}),
            batch_format="pyarrow") \
            .filter(expr="keep") \
            .select_columns(["src", "dst"]).materialize()

        marks = colors.map_batches(
            lambda b: pa.table({
                "node": b["node"], "color": b["color"],
                "mark": pc.cast(pc.equal(b["node"], b["color"]),
                                pa.int64())}),
            batch_format="pyarrow").materialize()
        prev_m = marks.sum("mark")
        for _ in range(max_iters):
            back = same.join(
                _rename(marks.select_columns(["node", "mark"]),
                        ["mnode", "mark"]),
                join_type="inner", num_partitions=num_partitions,
                on=("dst",), right_on=("mnode",)) \
                .map_batches(lambda b: pa.table({
                    "node": pc.cast(b["src"], pa.int64()),
                    "mark": pc.cast(b["mark"], pa.int64())}),
                    batch_format="pyarrow")
            newm = back.union(marks.select_columns(["node", "mark"])) \
                .groupby("node").aggregate(Max("mark"))
            newm = _rename(newm, ["node", "mark"])
            marks = newm.join(colors, join_type="inner",
                              num_partitions=num_partitions,
                              on=("node",), right_on=("node",)) \
                .materialize()
            cur_m = marks.sum("mark")
            if cur_m == prev_m:
                break
            prev_m = cur_m

        solved = marks.filter(expr="mark == 1") \
            .map_batches(lambda b: pa.table({
                "node": pc.cast(b["node"], pa.int64()),
                "scc": pc.cast(b["color"], pa.int64())}),
                batch_format="pyarrow").materialize()
        done_parts.append(solved)

        # 3. drop solved nodes' edges and re-peel the remainder
        sn = _rename(solved.select_columns(["node", "scc"]),
                     ["gone", "gscc"])
        e1 = edges.join(sn, join_type="left_outer",
                        num_partitions=num_partitions,
                        on=("src",), right_on=("gone",)) \
            .map_batches(lambda b: pa.table({
                "src": b["src"], "dst": b["dst"],
                "keep": pc.is_null(b["gscc"])}),
                batch_format="pyarrow") \
            .filter(expr="keep").select_columns(["src", "dst"])
        edges = e1.join(sn, join_type="left_outer",
                        num_partitions=num_partitions,
                        on=("dst",), right_on=("gone",)) \
            .map_batches(lambda b: pa.table({
                "src": b["src"], "dst": b["dst"],
                "keep": pc.is_null(b["gscc"])}),
                batch_format="pyarrow") \
            .filter(expr="keep").select_columns(["src", "dst"]) \
            .materialize()

        # Stranded nodes: unsolved but every incident edge touched a
        # solved SCC.  A solved SCC is complete (no unsolved member),
        # so an unsolved node left edgeless is a singleton SCC — emit
        # it now or it would vanish from the next peel's node table.
        if edges.count() == 0:
            # no edges left at all → every unsolved node is stranded
            stranded = marks.filter(expr="mark == 0") \
                .map_batches(lambda b: pa.table({
                    "node": pc.cast(b["node"], pa.int64()),
                    "scc": pc.cast(b["node"], pa.int64())}),
                    batch_format="pyarrow").materialize()
            if stranded.count() > 0:
                done_parts.append(stranded)
            break
        from aida_ray.stages.agg import gated_count
        remaining = gated_count(edges.map_batches(
            lambda b: pa.table({"rnode": pa.array(np.concatenate(
                [b["src"].to_numpy(zero_copy_only=False),
                 b["dst"].to_numpy(zero_copy_only=False)]), pa.int64())}),
            batch_format="pyarrow"), "rnode") \
            .map_batches(lambda b: pa.table({
                "rnode": pc.cast(b["rnode"], pa.int64()),
                "rseen": pa.array([1] * b.num_rows, pa.int64())}),
                batch_format="pyarrow")
        stranded = marks.filter(expr="mark == 0") \
            .select_columns(["node"]) \
            .join(remaining, join_type="left_outer",
                  num_partitions=num_partitions,
                  on=("node",), right_on=("rnode",)) \
            .map_batches(lambda b: pa.table({
                "node": pc.cast(b["node"], pa.int64()),
                "scc": pc.cast(b["node"], pa.int64()),
                "keep": pc.is_null(b["rseen"])}),
                batch_format="pyarrow") \
            .filter(expr="keep").select_columns(["node", "scc"]) \
            .materialize()
        if stranded.count() > 0:
            done_parts.append(stranded)

    if not done_parts:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "scc": pa.array([], pa.int64())}))
    out = done_parts[0]
    if len(done_parts) > 1:
        out = out.union(*done_parts[1:])
    return out
