"""Graph analytics over edge tables — PageRank and heavy hitters.

- :func:`pagerank` — power iteration with the rank vector BROADCAST
  (``ray.put`` once per iteration) and the edge table streamed: each
  batch computes its contribution partials (vectorized pandas groupby),
  one small groupby-sum per iteration collects per-node rank mass.
  Node count is the entity space (≪ corpus; YAGO2 ≈ 3M entities ≈
  24 MB of float64 rank — broadcastable), edge count is corpus-scale
  and never materializes anywhere.  Dangling mass and damping follow
  the standard formulation; deterministic for a fixed iteration count.
  Reference anchor: entity coherence graphs in the NED stack
  (`mpi.aida.graph.Graph`) are node-bounded the same way.

- :func:`heavy_hitters` — mergeable Misra-Gries-style sketch: each
  block emits its top-``m`` value counts plus the largest dropped
  count as that block's undercount bound.  Merged estimate for a value
  = sum of counts where present; its true count exceeds the reported
  lower bound (est − Σ bounds of blocks where absent).  Any value with
  true frequency > Σ bounds is guaranteed to surface.  One ``m``-row
  partial per block — no shuffle of the fact table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached
from aida_ray.stages.ml import _compact


def pagerank(edges: ray.data.Dataset, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 20,
             dense_threshold: int = 4_000_000,
             personalization=None) -> pa.Table:
    """PageRank over a (src, dst) edge Dataset.  Returns
    (node, rank) for every node, ranks summing to 1.

    ``personalization``: optional array of trusted seed node ids —
    teleport mass (both the 1-d restart and the dangling redistribution)
    flows to the seeds uniformly instead of to all nodes (TrustRank,
    Gyöngyi et al. VLDB'04; personalized PageRank).  None keeps the
    classic uniform teleport bit-for-bit."""
    from ray.data.aggregate import Sum

    # node universe + out-degrees: one aggregation pass
    def degree_partial(b: pa.Table) -> pa.Table:
        s = b[src].to_pandas()
        d = b[dst].to_pandas()
        out = s.value_counts().rename("outd").reset_index()
        out.columns = ["node", "outd"]
        dn = pd.DataFrame({"node": d.unique()})
        dn["outd"] = 0
        return pa.Table.from_pandas(pd.concat([out, dn]),
                                    preserve_index=False)

    deg = edges.map_batches(degree_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("outd")).to_pandas()
    if deg.empty:           # empty edge set → empty graph
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    nodes = deg["node"].to_numpy()
    order = np.argsort(nodes, kind="stable")
    nodes = nodes[order]
    outd = deg["sum(outd)"].to_numpy(dtype="float64")[order]
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.float64())})
    if personalization is None:
        tvec = np.full(n, 1.0 / n)
    else:
        seeds = np.unique(np.asarray(personalization))
        si = np.searchsorted(nodes, seeds)
        si = si[(si < n) & (nodes[np.clip(si, 0, n - 1)] == seeds)]
        if len(si) == 0:
            raise ValueError("no personalization seed exists in the graph")
        tvec = np.zeros(n)
        tvec[si] = 1.0 / len(si)
    rank = tvec.copy()

    edges = _compact(edges, rows_per_block=65536)  # reused every iteration
    dense = n <= dense_threshold   # dense partials ≤ 32 MB per block row
    for _ in range(iters):
        state_ref = ray.put((nodes, rank / np.maximum(outd, 1.0)))

        if dense:
            # one map-only pass: each block emits a DENSE length-n mass
            # vector (np.bincount — no shuffle at all); the driver sums
            # O(blocks) vectors.  For n beyond broadcast scale, the
            # groupby route below keeps the shuffle sparse.
            def contrib_dense(b: pa.Table) -> pa.Table:
                nd, share = _get_cached(state_ref)
                si = np.searchsorted(nd, b[src].to_numpy(
                    zero_copy_only=False))
                di = np.searchsorted(nd, b[dst].to_numpy(
                    zero_copy_only=False))
                mass = np.bincount(di, weights=share[si],
                                   minlength=len(nd))
                return pa.table({"mass": pa.array([mass.tobytes()],
                                                  pa.binary())})

            rows = edges.map_batches(contrib_dense,
                                     batch_format="pyarrow").take_all()
            mass = np.zeros(n)
            for r in rows:
                mass += np.frombuffer(r["mass"], dtype=np.float64)
        else:
            def contrib(b: pa.Table) -> pa.Table:
                nd, share = _get_cached(state_ref)
                si = np.searchsorted(nd, b[src].to_numpy(
                    zero_copy_only=False))
                df = pd.DataFrame({
                    "node": b[dst].to_numpy(zero_copy_only=False),
                    "mass": share[si],
                })
                g = df.groupby("node", sort=False).agg(
                    mass=("mass", "sum")).reset_index()
                return pa.Table.from_pandas(g, preserve_index=False)

            got = edges.map_batches(contrib, batch_format="pyarrow") \
                .groupby("node").aggregate(Sum("mass")).to_pandas()
            mass = np.zeros(n)
            gi = np.searchsorted(nodes, got["node"].to_numpy())
            mass[gi] = got["sum(mass)"].to_numpy(dtype="float64")
        dangling = rank[outd == 0].sum()
        rank = (1 - damping) * tvec + damping * (mass + dangling * tvec)

    return pa.table({"node": pa.array(nodes),
                     "rank": pa.array(rank, pa.float64())})


def _basket_pairs(g: np.ndarray, it: np.ndarray) -> np.ndarray:
    """Packed a<<32|b distinct pairs per basket run (``g`` sorted)."""
    if len(g) == 0:
        return np.empty(0, dtype="int64")
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    ends = np.r_[starts[1:], len(g)]
    out = []
    for s, e in zip(starts, ends):
        items = np.unique(it[s:e])
        if len(items) < 2:
            continue
        iu, ju = np.triu_indices(len(items), k=1)
        out.append((items[iu].astype("int64") << 32) | items[ju])
    return np.unique(np.concatenate(out)) if out \
        else np.empty(0, dtype="int64")


def cooccurrence_edges(ds: ray.data.Dataset, group_col: str,
                       item_col: str,
                       max_item: int | None = None) -> ray.data.Dataset:
    """Distinct co-occurrence edges (a < b) between items sharing a
    group — the market-basket / co-mention graph build.

    One RANGE shuffle (``sort(group_col)``) co-locates each basket,
    then every batch vectorizes ALL its fully-contained baskets in one
    numpy pass (``np.triu_indices`` per run — quadratic in BASKET
    size, not corpus size).  A per-basket ``map_groups`` here would
    pay ~ms of pandas overhead × millions of tiny baskets — that
    overhead, not pair math, dominated the old plan.  Baskets that
    straddle a batch boundary (≤ 2 basket keys per batch) are re-
    emitted raw and closed by ONE small task over the bounded
    boundary sliver.  Pairs then dedup block-locally on the packed
    ``a<<32|b`` key + one groupby on it (ships DISTINCT edges only).
    Output: (a, b) int64 edges; deterministic under any blocking."""
    def prune(b: pa.Table) -> pa.Table:
        t = pa.table({group_col: b[group_col], item_col: b[item_col]})
        if max_item is not None:
            t = t.filter(pc.less(t[item_col], pa.scalar(max_item)))
        return t

    srt = ds.map_batches(prune, batch_format="pyarrow") \
        .sort(group_col).materialize()

    def inner_pairs(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        it = b[item_col].to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return pa.table({"ab": pa.array([], pa.int64())})
        inner = (g != g[0]) & (g != g[-1])
        return pa.table({"ab": pa.array(
            _basket_pairs(g[inner], it[inner]), pa.int64())})

    def boundary(b: pa.Table) -> pa.Table:
        g = b[group_col].to_numpy(zero_copy_only=False)
        it = b[item_col].to_numpy(zero_copy_only=False)
        if len(g) == 0:
            return pa.table({"g": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64())})
        keep = (g == g[0]) | (g == g[-1])
        return pa.table({"g": pa.array(g[keep].astype("int64")),
                         "i": pa.array(it[keep].astype("int64"))})

    @ray.remote
    def close_boundaries(*tabs: pa.Table) -> pa.Table:
        t = pa.concat_tables(tabs)
        g = t["g"].to_numpy(zero_copy_only=False)
        it = t["i"].to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        return pa.table({"ab": pa.array(
            _basket_pairs(g[order], it[order]), pa.int64())})

    inner = srt.map_batches(inner_pairs, batch_format="pyarrow")
    brefs = srt.map_batches(boundary,
                            batch_format="pyarrow").to_arrow_refs()
    bpairs = ray.data.from_arrow_refs([close_boundaries.remote(*brefs)]) \
        if brefs else ray.data.from_arrow(
            pa.table({"ab": pa.array([], pa.int64())}))

    # distinct via the gated wide-key count (pair space is edge-sized)
    from aida_ray.stages.agg import gated_count
    pairs = gated_count(inner.union(bpairs), "ab")

    def unpack(b: pa.Table) -> pa.Table:
        ab = b["ab"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(ab >> 32, pa.int64()),
                         "b": pa.array(ab & 0xFFFFFFFF, pa.int64())})

    return pairs.map_batches(unpack, batch_format="pyarrow")


def triangle_count(edges: ray.data.Dataset, a: str = "a",
                   b: str = "b") -> int:
    """Exact triangle count over a distinct undirected edge set, via
    degree-ordered orientation + wedge closure:

    1. one counting aggregate gives every node's degree (node-bounded
       state, broadcast once — same assumption as :func:`pagerank`);
    2. each edge orients low→high in (degree, node) order, capping
       out-degrees at O(sqrt(m));
    3. one hash shuffle groups each node's out-neighbors; wedges
       (v, w) from ``np.triu_indices`` over the rank-sorted adjacency;
    4. wedges close against the broadcast packed oriented-edge set
       (sorted int64 ``searchsorted`` per batch — swap in a hash
       semi-join when the edge set outgrows a broadcast blob).

    Deterministic and blocking-invariant; wedge volume is the
    arboricity-bounded sum of C(outdeg, 2)."""
    from ray.data.aggregate import Sum

    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate([t[a].to_numpy(zero_copy_only=False),
                               t[b].to_numpy(zero_copy_only=False)])
        nodes, counts = np.unique(both, return_counts=True)
        return pa.table({"node": nodes, "d": counts.astype("int64")})

    deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("d")).to_pandas()
    if deg.empty:
        return 0
    nodes = deg["node"].to_numpy()
    order = np.argsort(nodes, kind="stable")
    nodes, degs = nodes[order], deg["sum(d)"].to_numpy()[order]
    # rank = position in (degree, node) lexicographic order
    rank = np.empty(len(nodes), dtype="int64")
    rank[np.lexsort((nodes, degs))] = np.arange(len(nodes))
    rank_ref = ray.put((nodes, rank))

    def orient(t: pa.Table) -> pa.Table:
        nd, rk = _get_cached(rank_ref)
        av = t[a].to_numpy(zero_copy_only=False)
        bv = t[b].to_numpy(zero_copy_only=False)
        ra, rb = rk[np.searchsorted(nd, av)], rk[np.searchsorted(nd, bv)]
        lo = np.where(ra < rb, ra, rb)
        hi = np.where(ra < rb, rb, ra)
        return pa.table({"lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64())})

    oriented = edges.map_batches(orient, batch_format="pyarrow") \
        .materialize()                      # reused: wedge pass + probe set
    packed = np.sort((oriented.to_pandas().lo.to_numpy() << 32)
                     | oriented.to_pandas().hi.to_numpy())
    edge_ref = ray.put(packed)

    def wedges_closed(g: pd.DataFrame) -> pd.DataFrame:
        nbrs = np.sort(g["hi"].to_numpy())       # rank order = closure key
        if len(nbrs) < 2:
            return pd.DataFrame({"n": [0]})
        iu, ju = np.triu_indices(len(nbrs), k=1)
        probe = (nbrs[iu] << 32) | nbrs[ju]
        es = _get_cached(edge_ref)
        idx = np.searchsorted(es, probe)
        hits = (idx < len(es)) & (es[np.minimum(idx, len(es) - 1)] == probe)
        return pd.DataFrame({"n": [int(hits.sum())]})

    counts = oriented.groupby("lo").map_groups(
        wedges_closed, batch_format="pandas").to_pandas()
    return int(counts["n"].sum())


def bfs_hops(edges: ray.data.Dataset, seeds: np.ndarray,
             max_hops: int = 4, a: str = "a", b: str = "b",
             route: str = "auto",
             dense_threshold: int = 4_000_000) -> pa.Table:
    """Multi-source BFS hop distance over an undirected edge Dataset.

    Returns (node, hop) for every node within ``max_hops`` of a seed
    (hop 0 = the seeds themselves).  Two routes, bit-equal:

    - **dense** (node-bounded graphs, same assumption as
      :func:`pagerank`): the sorted node universe is broadcast once and
      each BFS level is one map-only pass — every block emits a packed
      reached-bitmask over the CURRENT FRONTIER's neighbors, the driver
      ORs O(blocks) masks.  No shuffle at all; level latency is one
      pass over the edges.
    - **sparse** (scale path, nothing node-bounded is ever
      broadcast): the distance table is a Dataset; each level
      hash-joins the frontier against the edges and folds candidates
      in with a groupby-``Min(hop)``.  Frontier/distance volume ships
      through the shuffle, edges stream from the object store.

    Deterministic for a fixed seed set; seeds not present in the edge
    set are still reported at hop 0."""
    from ray.data.aggregate import Min

    seeds = np.unique(np.asarray(seeds, dtype="int64"))

    def und(t: pa.Table) -> pa.Table:
        av = t[a].to_numpy(zero_copy_only=False)
        bv = t[b].to_numpy(zero_copy_only=False)
        return pa.table({"s": np.concatenate([av, bv]),
                         "d": np.concatenate([bv, av])})

    # reused once per BFS level — compact the tiny-block tail so each
    # level pays O(compacted blocks) dispatches, not reader-block count
    undirected = _compact(edges.map_batches(und, batch_format="pyarrow"),
                          rows_per_block=65536)

    if route == "sparse" or (route == "auto"
                             and len(seeds) > dense_threshold):
        dist = ray.data.from_arrow(pa.table({
            "node": pa.array(seeds, pa.int64()),
            "hop": pa.array(np.zeros(len(seeds), dtype="int64"))}))
        for k in range(1, max_hops + 1):
            def front(t: pa.Table, k=k) -> pa.Table:
                return t.filter(pc.equal(t["hop"], pa.scalar(k - 1)))

            frontier = dist.map_batches(front, batch_format="pyarrow")
            if frontier.count() == 0:
                break
            from aida_ray.stages.shuffle_join import hash_join
            cand = hash_join(undirected, frontier,
                             on=("s",), right_on=("node",))

            def step(t: pa.Table, k=k) -> pa.Table:
                n = t.num_rows
                return pa.table({"node": t["d"], "hop": pa.array(
                    np.full(n, k, dtype="int64"))})

            dist = dist.union(cand.map_batches(step,
                                               batch_format="pyarrow")) \
                .groupby("node").aggregate(Min("hop"))
            dist = dist.map_batches(lambda t: pa.table({
                "node": t["node"],
                "hop": pc.cast(t["min(hop)"], pa.int64())}),
                batch_format="pyarrow") \
                .repartition(8).materialize()
            # repartition coalesces the aggregate's schema-less empty
            # blocks — they break the next round's join key resolution
        out = dist.to_pandas().sort_values("node")
        return pa.Table.from_pandas(out.reset_index(drop=True),
                                    preserve_index=False)

    # dense route: node universe broadcast, one map-only pass per level
    def node_partial(t: pa.Table) -> pa.Table:
        return pa.table({"node": np.unique(
            t["s"].to_numpy(zero_copy_only=False))})

    nd = undirected.map_batches(node_partial, batch_format="pyarrow") \
        .groupby("node").count().to_pandas()
    nodes = np.unique(np.concatenate(
        [nd["node"].to_numpy(dtype="int64"), seeds])) \
        if not nd.empty else seeds
    n = len(nodes)
    dist = np.full(n, -1, dtype="int64")
    dist[np.searchsorted(nodes, seeds)] = 0
    for k in range(1, max_hops + 1):
        frontier = nodes[dist == k - 1]
        if len(frontier) == 0:
            break
        state_ref = ray.put((nodes, frontier))

        def reach(t: pa.Table) -> pa.Table:
            nd_, fr = _get_cached(state_ref)
            sv = t["s"].to_numpy(zero_copy_only=False)
            dv = t["d"].to_numpy(zero_copy_only=False)
            fi = np.searchsorted(fr, sv)
            hit = (fi < len(fr)) & (fr[np.minimum(fi, len(fr) - 1)] == sv)
            mask = np.zeros(len(nd_), dtype=bool)
            mask[np.searchsorted(nd_, dv[hit])] = True
            return pa.table({"mask": pa.array([np.packbits(mask)
                                               .tobytes()], pa.binary())})

        rows = undirected.map_batches(reach,
                                      batch_format="pyarrow").take_all()
        reached = np.zeros(n, dtype=bool)
        for r in rows:
            reached |= np.unpackbits(
                np.frombuffer(r["mask"], dtype=np.uint8),
                count=n).astype(bool)
        dist[reached & (dist < 0)] = k
    keep = dist >= 0
    return pa.table({"node": pa.array(nodes[keep], pa.int64()),
                     "hop": pa.array(dist[keep], pa.int64())})


def ancestor_closure(edges: ray.data.Dataset, child: str = "child",
                     parent: str = "parent",
                     max_rounds: int = 48) -> ray.data.Dataset:
    """Transitive ancestor closure of a functional (≤1 parent per node)
    edge set — the type-taxonomy / category-hierarchy closure
    (reference analogue: the `type_taxonomy` table,
    `DataAccessSQL.java:78`) — by POINTER DOUBLING: O(log depth)
    distributed rounds instead of depth rounds.

    Invariant per round r: ``C`` holds exactly the pairs with
    dist ≤ 2^r, ``J`` exactly the 2^r-jump pointers.  The round is
      C ← C ∪ (C ⋈ J)   (extends every pair by exactly 2^r)
      J ← J ⋈ J         (doubles the jump)
    Outputs are disjoint by construction (dist ranges don't overlap
    and each (node, dist) has a unique ancestor in a functional
    graph), so no dedup pass is needed.  Terminates when J empties
    (depth exhausted).

    The jump table J is NODE-bounded (≤ one row per node — the graph
    is functional), so while it fits the broadcast budget each round
    is two map-only passes (``ray.put`` the sorted jn→janc arrays,
    ``searchsorted`` per batch); a hash shuffle join takes over only
    beyond that — each join spins an aggregator pool with seconds of
    fixed latency, which dominated small inputs (2 joins × log-depth
    rounds).

    Returns a Dataset (node, anc, dist), dist ≥ 1."""
    from aida_ray.stages.shuffle_join import hash_join

    def init(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({"node": pc.cast(t[child], pa.int64()),
                         "anc": pc.cast(t[parent], pa.int64()),
                         "dist": pa.array(np.ones(n, dtype="int64"))})

    c = edges.map_batches(init, batch_format="pyarrow").materialize()
    j = c
    jump = 1
    broadcast_rows = 8_000_000      # ~128 MB of int64 pointer pairs
    for _ in range(max_rounds):
        n_j = j.count()
        if n_j == 0:
            break

        if n_j <= broadcast_rows:
            from aida_ray.state.collect import collect_table
            jt = collect_table(j, schema=pa.schema(
                [("node", pa.int64()), ("anc", pa.int64()),
                 ("dist", pa.int64())]))
            jn = jt["node"].to_numpy(zero_copy_only=False)
            order = np.argsort(jn, kind="stable")
            jref = ray.put((jn[order],
                            jt["anc"].to_numpy(
                                zero_copy_only=False)[order]))

            def jump_map(t: pa.Table, jump=jump, jref=jref,
                         add_dist: bool = True) -> pa.Table:
                # follow each row's ancestor through the broadcast
                # 2^r-jump pointers; rows whose ancestor has no jump
                # (chain exhausted) drop out
                jn_, ja_ = _get_cached(jref)
                av = t["anc"].to_numpy(zero_copy_only=False)
                i = np.searchsorted(jn_, av)
                hit = (i < len(jn_)) \
                    & (jn_[np.minimum(i, len(jn_) - 1)] == av)
                dist = t["dist"].to_numpy(zero_copy_only=False)[hit] \
                    + jump if add_dist \
                    else np.zeros(int(hit.sum()), dtype="int64")
                return pa.table({
                    "node": pa.array(t["node"].to_numpy(
                        zero_copy_only=False)[hit], pa.int64()),
                    "anc": pa.array(ja_[i[hit]], pa.int64()),
                    "dist": pa.array(dist, pa.int64())})

            # union doubles the block list every round — fold the
            # tiny-block tail or later rounds pay 2^r dispatches
            c = _compact(
                c.union(c.map_batches(jump_map, batch_format="pyarrow")))
            j = _compact(j.map_batches(
                jump_map, fn_kwargs={"add_dist": False},
                batch_format="pyarrow"))
        else:
            def jr(t: pa.Table) -> pa.Table:
                return pa.table({"jn": t["node"], "janc": t["anc"]})

            jside = j.map_batches(jr, batch_format="pyarrow") \
                .materialize()
            ext = hash_join(c, jside, on=("anc",), right_on=("jn",))

            def fold(t: pa.Table, jump=jump) -> pa.Table:
                return pa.table({
                    "node": t["node"], "anc": t["janc"],
                    "dist": pc.add(t["dist"],
                                   pa.scalar(jump, pa.int64()))})

            c = _compact(
                c.union(ext.map_batches(fold, batch_format="pyarrow")))
            j2 = hash_join(j, jside, on=("anc",), right_on=("jn",))
            j = j2.map_batches(
                lambda t: pa.table({
                    "node": t["node"], "anc": t["janc"],
                    "dist": pa.array(np.zeros(t.num_rows,
                                              dtype="int64"))}),
                batch_format="pyarrow").materialize()
        jump *= 2
    return c


def cheapest_paths(edges: ray.data.Dataset, seeds: np.ndarray,
                   max_hops: int, src: str = "src", dst: str = "dst",
                   w: str = "w") -> pa.Table:
    """Hop-bounded single/multi-source cheapest paths (min-plus
    Bellman-Ford) over a DIRECTED weighted edge Dataset with INTEGER
    weights — integer path costs make every engine compute identical
    values, so the result is exactly SQL-checkable.

    After round r the table holds the exact min cost over paths of
    ≤ r edges (collapsing to the per-node min between rounds is exact
    in the min-plus semiring).  The per-round relaxation is ADAPTIVE:
    while the distance table is broadcastable it ships once via
    ``ray.put`` and each edge batch relaxes map-only (sorted-array
    ``searchsorted`` + per-batch per-node partial min), leaving one
    int-keyed groupby-``Min`` per round; beyond the broadcast budget
    the distance table hash-joins against the streaming edges —
    distance volume through the shuffle, edges never move."""
    from ray.data.aggregate import Min

    from aida_ray.stages.dedup import _get_cached
    from aida_ray.stages.shuffle_join import hash_join

    seeds = np.unique(np.asarray(seeds, dtype="int64"))
    edges = _compact(edges, rows_per_block=65536)  # reused every round
    dist = ray.data.from_arrow(pa.table({
        "node": pa.array(seeds, pa.int64()),
        "cost": pa.array(np.zeros(len(seeds), dtype="int64"))})) \
        .materialize()
    broadcast_rows = 8_000_000          # ~128 MB of (node, cost) int64
    for _ in range(max_hops):
        if dist.count() <= broadcast_rows:
            tabs = [ray.get(r) for r in dist.to_arrow_refs()]
            ne = [t for t in tabs
                  if isinstance(t, pa.Table) and t.num_rows > 0]
            dt = pa.concat_tables(ne, promote_options="default") \
                if ne else pa.table({"node": pa.array([], pa.int64()),
                                     "cost": pa.array([], pa.int64())})
            dn = dt["node"].to_numpy(zero_copy_only=False)
            order = np.argsort(dn, kind="stable")
            dref = ray.put((dn[order], dt["cost"].to_numpy(
                zero_copy_only=False)[order]))

            def relax_bc(t: pa.Table) -> pa.Table:
                dn_, dc_ = _get_cached(dref)
                sv = t[src].to_numpy(zero_copy_only=False)
                i = np.searchsorted(dn_, sv)
                hit = (i < len(dn_)) \
                    & (dn_[np.minimum(i, len(dn_) - 1)] == sv)
                node = t[dst].to_numpy(zero_copy_only=False)[hit]
                cost = dc_[i[hit]] \
                    + t[w].to_numpy(zero_copy_only=False)[hit]
                if len(node) == 0:
                    return pa.table({
                        "node": pa.array([], pa.int64()),
                        "cost": pa.array([], pa.int64())})
                # per-batch partial min per node
                o = np.lexsort((cost, node))
                node, cost = node[o], cost[o]
                first = np.r_[True, node[1:] != node[:-1]]
                return pa.table({
                    "node": pa.array(node[first], pa.int64()),
                    "cost": pa.array(cost[first], pa.int64())})

            cand = edges.map_batches(relax_bc, batch_format="pyarrow")
        else:
            cjoin = hash_join(edges, dist, on=(src,), right_on=("node",))

            def relax(t: pa.Table) -> pa.Table:
                return pa.table({
                    "node": pc.cast(t[dst], pa.int64()),
                    "cost": pc.add(pc.cast(t["cost"], pa.int64()),
                                   pc.cast(t[w], pa.int64()))})

            cand = cjoin.map_batches(relax, batch_format="pyarrow")

        dist = dist.union(cand).groupby("node").aggregate(Min("cost"))
        dist = dist.map_batches(lambda t: pa.table({
            "node": t["node"],
            "cost": pc.cast(t["min(cost)"], pa.int64())}),
            batch_format="pyarrow") \
            .repartition(8).materialize()
        # repartition coalesces the aggregate's schema-less empty
        # blocks — they break the next round's join key resolution
    out = dist.to_pandas().sort_values("node").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def kcore(edges: ray.data.Dataset, k: int, a: str = "a", b: str = "b",
          max_rounds: int = 1000) -> pa.Table:
    """k-core of an undirected distinct edge set by distributed
    peeling: each round recomputes alive-subgraph degrees with one
    counting aggregate (map-side partials — shuffle tracks the node
    space) and drops nodes below ``k``; terminates at the fixpoint.

    The alive set is node-bounded state broadcast per round (same
    assumption as :func:`pagerank`); the edge table streams and is
    never collected.  Returns (node, degree) of the surviving core —
    deterministic, blocking-invariant."""
    from ray.data.aggregate import Sum

    edges = _compact(edges, rows_per_block=65536)  # reused every peel round
    alive: np.ndarray | None = None          # None = all alive
    for _ in range(max_rounds):
        ref = ray.put(alive)

        def deg_partial(t: pa.Table) -> pa.Table:
            al = _get_cached(ref)
            av = t[a].to_numpy(zero_copy_only=False)
            bv = t[b].to_numpy(zero_copy_only=False)
            if al is not None:
                ia = np.searchsorted(al, av)
                ib = np.searchsorted(al, bv)
                ok = ((ia < len(al)) & (al[np.minimum(ia, len(al) - 1)]
                                        == av)
                      & (ib < len(al)) & (al[np.minimum(ib, len(al) - 1)]
                                          == bv))
                av, bv = av[ok], bv[ok]
            nodes, counts = np.unique(np.concatenate([av, bv]),
                                      return_counts=True)
            return pa.table({"node": nodes,
                             "d": counts.astype("int64")})

        deg = edges.map_batches(deg_partial, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("d")).to_pandas()
        if deg.empty:
            return pa.table({"node": pa.array([], pa.int64()),
                             "degree": pa.array([], pa.int64())})
        nodes = deg["node"].to_numpy(dtype="int64")
        degs = deg["sum(d)"].to_numpy(dtype="int64")
        survivors = np.sort(nodes[degs >= k])
        if alive is not None and len(survivors) == len(alive):
            order = np.argsort(nodes)
            return pa.table({
                "node": pa.array(nodes[order], pa.int64()),
                "degree": pa.array(degs[order], pa.int64())})
        alive = survivors
        if len(alive) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "degree": pa.array([], pa.int64())})
    raise RuntimeError("kcore: no fixpoint within max_rounds")


def heavy_hitters(ds: ray.data.Dataset, col: str,
                  m: int = 64) -> pd.DataFrame:
    """Approximate most-frequent values.  Returns a DataFrame
    (value, est, lower_bound) sorted by est descending; every value
    whose true count exceeds the total undercount bound is present."""
    import os as _os

    def partial(b: pa.Table) -> pa.Table:
        vc = b[col].to_pandas().value_counts()
        top = vc.iloc[:m]
        bound = int(vc.iloc[m:].max()) if len(vc) > m else 0
        # unique per batch across workers/tasks (a pid+counter scheme
        # collides when tasks re-deserialize the closure)
        bid = int.from_bytes(_os.urandom(8), "big") >> 1
        return pa.table({
            "value": pa.array(top.index.astype(str)),
            "n": pa.array(top.to_numpy(dtype="int64")),
            "block_bound": pa.array([bound] * len(top), pa.int64()),
            "block_id": pa.array([bid] * len(top), pa.int64()),
        })

    rows = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    if rows.empty:
        return pd.DataFrame(columns=["value", "est", "max_undercount"])
    total_bound = int(rows.drop_duplicates("block_id")["block_bound"]
                      .sum())
    est = rows.groupby("value").agg(est=("n", "sum"),
                                    present=("block_bound", "sum"))
    # per-block counts where present are exact; the only undercount is
    # from blocks where the value missed that block's top-m
    est["max_undercount"] = total_bound - est["present"]
    out = est.reset_index()[["value", "est", "max_undercount"]]
    return out.sort_values(["est", "value"],
                           ascending=[False, True]).reset_index(drop=True)


def degree_distribution(ds: ray.data.Dataset, key: str,
                        neighbor: str,
                        neighbor_ids: "dict[str, int] | None" = None
                        ) -> pa.Table:
    """Degree distribution of a bipartite relation: for each left key,
    the number of DISTINCT right neighbors, then the count of keys per
    degree — the two-level distinct-then-histogram plan.

    Distinct (key, neighbor) pairs ride ONE packed int64 through the
    gated unique finisher (pair keys scale with keys x neighbors —
    unbounded), the per-key degrees fall out of one run-length pass
    over the sorted distinct pairs, and the final histogram is
    degree-bounded.  ``neighbor_ids`` maps string neighbor values to
    small ints (< 2^20); int64 neighbor columns must already be
    < 2^20."""
    from aida_ray.stages.tpch_wide import _distinct_int64

    nid_ref = ray.put(neighbor_ids)

    def pairs(b: pa.Table) -> pa.Table:
        from aida_ray.stages.dedup import _get_cached
        nid = _get_cached(nid_ref)
        k = b[key].to_numpy(zero_copy_only=False).astype("int64")
        if nid is not None:
            nb = np.array([nid[x] for x in b[neighbor].to_pylist()],
                          dtype="int64")
        else:
            nb = b[neighbor].to_numpy(zero_copy_only=False) \
                .astype("int64")
        assert nb.max(initial=0) < (1 << 20) and nb.min(initial=0) >= 0
        return pa.table({"p": pa.array(np.unique((k << 20) | nb),
                                       pa.int64())})

    distinct = _distinct_int64(
        ds.map_batches(pairs, batch_format="pyarrow"), "p")

    def key_counts(b: pa.Table) -> pa.Table:
        k, n = np.unique(
            b["p"].to_numpy(zero_copy_only=False) >> 20,
            return_counts=True)
        return pa.table({"k": pa.array(k.astype("int64"), pa.int64()),
                         "n": pa.array(n.astype("int64"), pa.int64())})

    # per-key degree = sum of the per-block distinct-pair counts (a
    # key's pairs CAN split blocks on the above-gate groupby route, so
    # this must be a real sum-combine, not a per-block histogram) —
    # gated: one lexsort+reduceat task below, bucketed combine above
    partials = distinct.map_batches(key_counts,
                                    batch_format="pyarrow") \
        .materialize()
    if partials.count() <= 20_000_000:
        @ray.remote
        def sum_task(*tabs: pa.Table) -> pa.Table:
            from aida_ray.stages.dedup import _concat_blocks
            t = _concat_blocks(tabs, pa.schema(
                [("k", pa.int64()), ("n", pa.int64())]))
            k = t["k"].to_numpy(zero_copy_only=False)
            if not len(k):
                return pa.table({"k": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            o = np.argsort(k, kind="stable")
            k = k[o]
            n = t["n"].to_numpy(zero_copy_only=False)[o]
            first = np.r_[True, k[1:] != k[:-1]]
            idx = np.flatnonzero(first)
            return pa.table({
                "k": pa.array(k[first].astype("int64"), pa.int64()),
                "n": pa.array(np.add.reduceat(n, idx), pa.int64())})

        per_key = ray.data.from_arrow_refs(
            [sum_task.remote(*partials.to_arrow_refs())])
    else:
        from aida_ray.stages.agg import bucket_reduce
        per_key = bucket_reduce(partials, ["k"], {"n": "sum"})

    def hist_partial(b: pa.Table) -> pa.Table:
        deg, cnt = np.unique(b["n"].to_numpy(zero_copy_only=False),
                             return_counts=True)
        return pa.table({
            "deg": pa.array(deg.astype("int64"), pa.int64()),
            "n_keys": pa.array(cnt.astype("int64"), pa.int64())})

    from ray.data.aggregate import Sum
    import pyarrow.compute as _pc

    from aida_ray.stages.tpch_wide import _gather
    agg = per_key.map_batches(hist_partial, batch_format="pyarrow") \
        .groupby("deg").aggregate(Sum("n_keys"))
    return _gather(agg.map_batches(
        lambda b: pa.table({
            "deg": _pc.cast(b["deg"], pa.int64()),
            "n_keys": _pc.cast(b["sum(n_keys)"], pa.int64())}),
        batch_format="pyarrow"))


def hits(edges: ray.data.Dataset, src: str = "src", dst: str = "dst",
         iters: int = 5,
         dense_threshold: int = 4_000_000) -> pa.Table:
    """HITS hubs/authorities (Kleinberg) over a DIRECTED distinct edge
    Dataset — the crawl-graph companion to :func:`pagerank`.

    Power iteration with BOTH score vectors broadcast (``ray.put``
    once per half-step) and the edge table streamed: per half-step
    each block emits either a dense ``np.bincount`` mass vector
    (node space ≤ ``dense_threshold`` — no shuffle at all, the driver
    sums O(blocks) vectors) or sparse per-node partials reduced by one
    small groupby-sum.  Each half-step L1-normalizes, so the result is
    scale-free and a fixed iteration count is deterministic.  Node
    count is host/entity-bounded (≪ edge count); edges never
    materialize on the driver.

    Returns (node, hub, auth) for every node in the edge set.
    """
    from ray.data.aggregate import Sum

    def node_partial(b: pa.Table) -> pa.Table:
        u = np.union1d(b[src].to_numpy(zero_copy_only=False),
                       b[dst].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u.astype("int64"), pa.int64())})

    from aida_ray.stages.agg import gated_count
    uniq = gated_count(
        edges.map_batches(node_partial, batch_format="pyarrow"),
        "node").to_pandas()
    if uniq.empty:
        return pa.table({"node": pa.array([], pa.int64()),
                         "hub": pa.array([], pa.float64()),
                         "auth": pa.array([], pa.float64())})
    nodes = np.sort(uniq["node"].to_numpy().astype("int64"))
    n = len(nodes)
    hub = np.full(n, 1.0 / n)

    edges = _compact(edges, rows_per_block=65536)  # reused 2×iters times
    dense = n <= dense_threshold

    def _push(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """mass[to] = Σ vec[from] over edges, L1-normalized."""
        state_ref = ray.put((nodes, vec))
        if dense:
            def contrib_dense(b: pa.Table) -> pa.Table:
                nd, v = _get_cached(state_ref)
                fi = np.searchsorted(nd, b[from_col].to_numpy(
                    zero_copy_only=False))
                ti = np.searchsorted(nd, b[to_col].to_numpy(
                    zero_copy_only=False))
                mass = np.bincount(ti, weights=v[fi], minlength=len(nd))
                return pa.table({"mass": pa.array([mass.tobytes()],
                                                  pa.binary())})

            rows = edges.map_batches(contrib_dense,
                                     batch_format="pyarrow").take_all()
            mass = np.zeros(n)
            for r in rows:
                mass += np.frombuffer(r["mass"], dtype=np.float64)
        else:
            def contrib(b: pa.Table) -> pa.Table:
                nd, v = _get_cached(state_ref)
                fi = np.searchsorted(nd, b[from_col].to_numpy(
                    zero_copy_only=False))
                df = pd.DataFrame({
                    "node": b[to_col].to_numpy(zero_copy_only=False),
                    "mass": v[fi]})
                g = df.groupby("node", sort=False).agg(
                    mass=("mass", "sum")).reset_index()
                return pa.Table.from_pandas(g, preserve_index=False)

            got = edges.map_batches(contrib, batch_format="pyarrow") \
                .groupby("node").aggregate(Sum("mass")).to_pandas()
            mass = np.zeros(n)
            gi = np.searchsorted(nodes, got["node"].to_numpy())
            mass[gi] = got["sum(mass)"].to_numpy(dtype="float64")
        s = mass.sum()
        return mass / s if s > 0 else mass

    auth = np.zeros(n)
    for _ in range(iters):
        auth = _push(hub, src, dst)    # a ← Aᵀh, normalized
        hub = _push(auth, dst, src)    # h ← Aa, normalized

    return pa.table({"node": pa.array(nodes),
                     "hub": pa.array(hub, pa.float64()),
                     "auth": pa.array(auth, pa.float64())})


def adamic_adar(edges: ray.data.Dataset, a: str = "a", b: str = "b",
                max_degree: int | None = None) -> ray.data.Dataset:
    """Adamic–Adar link prediction over a distinct UNDIRECTED edge set:
    score(u,v) = Σ_z 1/ln(deg z) over common neighbors z of u,v.

    Same range-shuffle + vectorized-basket plan as
    :func:`cooccurrence_edges`: adjacency is exploded both directions,
    one ``sort`` co-locates each center node z's neighbor list, every
    batch closes its fully-contained runs in one numpy pass
    (``np.triu_indices`` per run — quadratic in DEGREE, not corpus),
    boundary-straddling runs (≤2 per batch) close in one small task,
    and a groupby-sum on the packed ``u<<32|v`` key ships only
    candidate pairs.  ``max_degree`` (standard AA practice) skips hub
    centers whose pair fan-out would be quadratic-hot — a z with
    deg(z)=10^6 contributes ~0 weight (1/ln 10^6) at 10^12-pair cost.

    Output: (u, v, score) with u < v, u/v int64 < 2^32.
    """
    from ray.data.aggregate import Sum

    def explode(t: pa.Table) -> pa.Table:
        av = t[a].to_numpy(zero_copy_only=False).astype("int64")
        bv = t[b].to_numpy(zero_copy_only=False).astype("int64")
        return pa.table({"z": pa.array(np.r_[av, bv]),
                         "nb": pa.array(np.r_[bv, av])})

    srt = edges.map_batches(explode, batch_format="pyarrow") \
        .sort("z").materialize()

    def _runs_pairs(z: np.ndarray, nb: np.ndarray) -> pa.Table:
        """(ab, w) rows for every complete center run in (z, nb)."""
        outp, outw = [], []
        if len(z):
            starts = np.flatnonzero(np.r_[True, z[1:] != z[:-1]])
            ends = np.r_[starts[1:], len(z)]
            for s, e in zip(starts, ends):
                items = np.unique(nb[s:e])
                d = len(items)
                if d < 2 or (max_degree is not None and d > max_degree):
                    continue
                iu, ju = np.triu_indices(d, k=1)
                outp.append((items[iu] << 32) | items[ju])
                outw.append(np.full(len(iu), 1.0 / np.log(d)))
        if not outp:
            return pa.table({"ab": pa.array([], pa.int64()),
                             "w": pa.array([], pa.float64())})
        return pa.table({"ab": pa.array(np.concatenate(outp), pa.int64()),
                         "w": pa.array(np.concatenate(outw), pa.float64())})

    def inner_pairs(t: pa.Table) -> pa.Table:
        z = t["z"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        if len(z) == 0:
            return _runs_pairs(z, nb)
        inner = (z != z[0]) & (z != z[-1])
        return _runs_pairs(z[inner], nb[inner])

    def boundary(t: pa.Table) -> pa.Table:
        z = t["z"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        if len(z) == 0:
            return pa.table({"z": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        keep = (z == z[0]) | (z == z[-1])
        return pa.table({"z": pa.array(z[keep].astype("int64")),
                         "nb": pa.array(nb[keep].astype("int64"))})

    @ray.remote
    def close_boundaries(*tabs: pa.Table) -> pa.Table:
        t = pa.concat_tables(tabs)
        z = t["z"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        order = np.argsort(z, kind="stable")
        return _runs_pairs(z[order], nb[order])

    inner = srt.map_batches(inner_pairs, batch_format="pyarrow")
    brefs = srt.map_batches(boundary,
                            batch_format="pyarrow").to_arrow_refs()
    bpairs = ray.data.from_arrow_refs([close_boundaries.remote(*brefs)]) \
        if brefs else ray.data.from_arrow(
            pa.table({"ab": pa.array([], pa.int64()),
                      "w": pa.array([], pa.float64())}))

    summed = inner.union(bpairs).groupby("ab").aggregate(Sum("w"))

    def unpack(t: pa.Table) -> pa.Table:
        if "ab" not in t.column_names or len(t) == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ab = t["ab"].to_numpy(zero_copy_only=False)
        return pa.table({
            "u": pa.array(ab >> 32, pa.int64()),
            "v": pa.array(ab & 0xFFFFFFFF, pa.int64()),
            "score": pc.cast(t["sum(w)"], pa.float64())})

    return summed.map_batches(unpack, batch_format="pyarrow")


def string_components(edges: ray.data.Dataset, a_col: str = "a",
                      b_col: str = "b",
                      broadcast_nodes: int = 8_000_000
                      ) -> ray.data.Dataset:
    """Connected components over STRING-keyed edges: (node, rep) with
    rep = lexicographically smallest member — the shared front-end
    for every string-id clustering (hreflang alternates, owl:sameAs,
    alias graphs) over the int64 CC machinery
    (dedup.label_propagation_clusters).

    Scale shape: the node universe is EDGE-BEARING strings only,
    collected once and gated by ``broadcast_nodes`` (beyond the gate
    substitute a groupby-assigned dense id); ids are assigned ORDERED
    BY string so the CC min-id representative IS the min-string
    representative."""
    from aida_ray.stages.dedup import (_get_cached,
                                       label_propagation_clusters)
    from aida_ray.state.collect import collect_table

    def both_ends(b: pa.Table) -> pa.Table:
        return pa.table({"u": pa.array(np.concatenate(
            [b[a_col].to_numpy(zero_copy_only=False),
             b[b_col].to_numpy(zero_copy_only=False)]), pa.string())})

    ends = collect_table(edges.map_batches(both_ends,
                                           batch_format="pyarrow"))
    nodes = (np.unique(ends["u"].to_numpy(zero_copy_only=False)
                       .astype(str))
             if ends.num_rows else np.array([], dtype=str))
    assert len(nodes) <= broadcast_nodes, \
        "string_components: node universe above broadcast gate"
    if len(nodes) == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], pa.string()),
            "rep": pa.array([], pa.string())}))
    ref = ray.put(nodes)

    def to_ids(b: pa.Table) -> pa.Table:
        u = _get_cached(ref)
        return pa.table({
            "a": pa.array(np.searchsorted(
                u, b[a_col].to_numpy(zero_copy_only=False).astype(str)),
                pa.int64()),
            "b": pa.array(np.searchsorted(
                u, b[b_col].to_numpy(zero_copy_only=False).astype(str)),
                pa.int64())})

    cc = label_propagation_clusters(
        edges.map_batches(to_ids, batch_format="pyarrow"))

    def back(b: pa.Table) -> pa.Table:
        u = _get_cached(ref)
        return pa.table({
            "node": pa.array(
                u[b["doc_id"].to_numpy(zero_copy_only=False)]),
            "rep": pa.array(
                u[b["cluster"].to_numpy(zero_copy_only=False)])})

    return cc.map_batches(back, batch_format="pyarrow")


# ----------------------------------------------------------- k-truss

def ktruss(edges: ray.data.Dataset, k: int, a: str = "a", b: str = "b",
           max_rounds: int = 100) -> pa.Table:
    """k-truss of an undirected distinct edge set: the maximal
    subgraph in which every edge participates in >= k-2 triangles
    *within the subgraph* — the cohesion filter a notch stronger than
    k-core (used to mine tightly-linked host/entity communities out of
    web graphs).  Iterative support-peel to the fixpoint.

    Each round broadcasts the alive adjacency once (CSR arrays + the
    packed sorted edge set — the same edge-bounded-state assumption
    :func:`triangle_count` makes for its probe set) and every edge
    batch computes its own supports MAP-ONLY: edge (a, b) expands by
    the smaller-degree endpoint's neighbor list (fan-out
    sum(min(deg_a, deg_b)), the optimal intersection side) and probes
    the packed set with one vectorized ``searchsorted`` — no
    per-round shuffle at all; edges below k-2 are dropped in the same
    pass.  Swap the broadcast for a hash semi-join on the packed key
    when the edge set outgrows a broadcast blob.  Returns (a, b,
    support) of surviving edges; deterministic, blocking-invariant.
    """
    from aida_ray.stages.ml import _compact
    from aida_ray.state.collect import collect_table

    if k < 3:
        raise ValueError("ktruss requires k >= 3 (zero-support edges "
                         "never enter the support pass)")

    def canon(t: pa.Table) -> pa.Table:
        av = t[a].to_numpy(zero_copy_only=False).astype(np.int64)
        bv = t[b].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(av, bv)
        hi = np.maximum(av, bv)
        keep = lo != hi
        return pa.table({"lo": pa.array(lo[keep], pa.int64()),
                         "hi": pa.array(hi[keep], pa.int64())})

    cur = _compact(edges.map_batches(canon, batch_format="pyarrow"),
                   rows_per_block=65536)
    need = k - 2
    empty = pa.table({a: pa.array([], pa.int64()),
                      b: pa.array([], pa.int64()),
                      "support": pa.array([], pa.int64())})
    n_alive = None
    for _ in range(max_rounds):
        cp = collect_table(cur).to_pandas()
        if cp.empty:
            return empty
        lo = cp.lo.to_numpy(np.int64)
        hi = cp.hi.to_numpy(np.int64)
        packed = np.sort((lo << 32) | hi)
        # CSR over the symmetrized adjacency, node ids remapped dense
        nodes = np.unique(np.concatenate([lo, hi]))
        si = np.searchsorted(nodes, np.concatenate([lo, hi]))
        di = np.concatenate([hi, lo])        # ORIGINAL ids (probe keys)
        order = np.argsort(si, kind="stable")
        so, do = si[order], di[order]
        starts = np.searchsorted(so, np.arange(len(nodes)))
        ends = np.searchsorted(so, np.arange(len(nodes)), side="right")
        deg = ends - starts
        bc = ray.put((nodes, do, starts, deg, packed))

        def support_filter(t: pa.Table) -> pa.Table:
            nd, adj, st, dg, es = _get_cached(bc)
            lo_ = t["lo"].to_numpy(zero_copy_only=False)
            hi_ = t["hi"].to_numpy(zero_copy_only=False)
            il = np.searchsorted(nd, lo_)
            ih = np.searchsorted(nd, hi_)
            # expand each edge by its smaller-degree endpoint
            use_lo = dg[il] <= dg[ih]
            src_i = np.where(use_lo, il, ih)       # expanded side
            oth = np.where(use_lo, hi_, lo_)        # probe partner
            fan = dg[src_i]
            rep = np.repeat(np.arange(len(lo_)), fan)
            off = np.arange(len(rep)) - np.repeat(
                np.concatenate([[0], np.cumsum(fan)[:-1]]), fan)
            w = adj[st[src_i][rep] + off]
            o = oth[rep]
            probe = (np.minimum(w, o) << 32) | np.maximum(w, o)
            idx = np.searchsorted(es, probe)
            hit = (idx < len(es)) & (es[np.minimum(idx, len(es) - 1)]
                                     == probe)
            # exclude the trivial w == partner closure (w == o means
            # probing the edge itself via lo==hi, impossible; w can
            # equal the expanded edge's other endpoint though)
            hit &= w != o
            sup = np.bincount(rep[hit], minlength=len(lo_)) \
                .astype(np.int64)
            keep = sup >= need
            return pa.table({
                "lo": pa.array(lo_[keep], pa.int64()),
                "hi": pa.array(hi_[keep], pa.int64()),
                "support": pa.array(sup[keep], pa.int64())})

        nxt = _compact(cur.map_batches(support_filter,
                                       batch_format="pyarrow"),
                       rows_per_block=65536).materialize()
        cnt = nxt.count()
        if cnt == 0:
            return empty
        if n_alive is not None and cnt == n_alive:
            out = collect_table(nxt).to_pandas() \
                .sort_values(["lo", "hi"]).reset_index(drop=True)
            return pa.table({
                a: pa.array(out.lo.to_numpy(np.int64), pa.int64()),
                b: pa.array(out.hi.to_numpy(np.int64), pa.int64()),
                "support": pa.array(out.support.to_numpy(np.int64),
                                    pa.int64())})
        n_alive = cnt
        cur = nxt.select_columns(["lo", "hi"])
    raise RuntimeError("ktruss: no fixpoint within max_rounds")


# ----------------------------------------------------------- SimRank

def simrank(edges: ray.data.Dataset, iterations: int = 4,
            c: float = 0.8, src: str = "src", dst: str = "dst",
            gate_nodes: int = 4000) -> pa.Table:
    """SimRank (Jeh & Widom 2002) over a directed graph:
    ``s(a, b) = c / (|I(a)||I(b)|) * sum_{i in I(a), j in I(b)}
    s(i, j)`` with ``s(a, a) = 1`` and 0 when either side has no
    in-neighbors.  Returns all pairs a < b with nonzero similarity,
    rounded to 6 decimals.

    Two routes, equality-tested: under ``gate_nodes`` the whole
    iteration runs as ONE bounded remote numpy task (S <- c * norm *
    (E^T S E), diagonal reset — n^2 floats must fit one worker);
    above it the pair table (i, j, s) streams as a Dataset and each
    iteration expands pairs through the BROADCAST out-edge lists
    (fan-out outdeg_i x outdeg_j per pair, vectorized) followed by one
    (a, b) groupby-sum — shuffle volume tracks the nonzero pair space.
    The broadcast assumes the edge list is node-bounded (swap the
    expansion for two hash joins on i and j when it is not).
    """
    from ray.data.aggregate import Sum

    from aida_ray.state.collect import collect_table

    ep = collect_table(edges.select_columns([src, dst])).to_pandas() \
        .drop_duplicates()
    sv = ep[src].to_numpy(np.int64)
    dv = ep[dst].to_numpy(np.int64)
    nodes = np.unique(np.concatenate([sv, dv]))
    n = len(nodes)
    if n == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    si = np.searchsorted(nodes, sv)
    di = np.searchsorted(nodes, dv)
    indeg = np.bincount(di, minlength=n).astype(np.float64)

    if n <= gate_nodes:
        @ray.remote(num_cpus=1)
        def _dense(si, di, indeg, n):
            S = np.eye(n)
            E = np.zeros((n, n))
            E[si, di] = 1.0
            dnz = np.where(indeg > 0, indeg, 1.0)
            for _ in range(iterations):
                raw = E.T @ S @ E
                S = c * raw / np.outer(dnz, dnz)
                S[indeg == 0, :] = 0.0
                S[:, indeg == 0] = 0.0
                np.fill_diagonal(S, 1.0)
            return S

        S = ray.get(_dense.remote(si, di, indeg, n))
        iu, ju = np.triu_indices(n, k=1)
        s = np.round(S[iu, ju], 6)
        nz = s > 0
        return pa.table({
            "a": pa.array(nodes[iu[nz]], pa.int64()),
            "b": pa.array(nodes[ju[nz]], pa.int64()),
            "sim": pa.array(s[nz], pa.float64())})

    # streaming route: pair table through broadcast out-edge lists
    order = np.argsort(si, kind="stable")
    so, do = si[order], di[order]
    starts = np.searchsorted(so, np.arange(n))
    ends = np.searchsorted(so, np.arange(n), side="right")
    bc = ray.put((so, do, starts, ends, indeg))

    pairs = ray.data.from_arrow(pa.table({
        "i": pa.array(np.arange(n), pa.int64()),
        "j": pa.array(np.arange(n), pa.int64()),
        "s": pa.array(np.ones(n), pa.float64())}))

    from aida_ray.stages.ml import _compact
    for _ in range(iterations):
        def expand(t: pa.Table) -> pa.Table:
            so_, do_, st_, en_, ind_ = _get_cached(bc)
            ii = t["i"].to_numpy(zero_copy_only=False)
            jj = t["j"].to_numpy(zero_copy_only=False)
            ss = t["s"].to_numpy(zero_copy_only=False)
            oi = en_[ii] - st_[ii]
            oj = en_[jj] - st_[jj]
            fan = oi * oj
            keep = fan > 0
            ii, jj, ss, oi, oj = (ii[keep], jj[keep], ss[keep],
                                  oi[keep], oj[keep])
            fan = fan[keep]
            if not len(ii):
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64()),
                                 "v": pa.array([], pa.float64())})
            rep = np.repeat(np.arange(len(ii)), fan)
            # enumerate the oi x oj out-neighbor cross product per pair
            off = np.arange(len(rep)) - np.repeat(
                np.concatenate([[0], np.cumsum(fan)[:-1]]), fan)
            ai = do_[st_[ii][rep] + off // oj[rep]]
            bj = do_[st_[jj][rep] + off % oj[rep]]
            return pa.table({"a": pa.array(ai, pa.int64()),
                             "b": pa.array(bj, pa.int64()),
                             "v": pa.array(ss[rep], pa.float64())})

        agg = pairs.map_batches(expand, batch_format="pyarrow") \
            .groupby(["a", "b"]).aggregate(Sum("v"))

        def finish(t: pa.Table) -> pa.Table:
            so_, do_, st_, en_, ind_ = _get_cached(bc)
            av = t["a"].to_numpy(zero_copy_only=False)
            bv = t["b"].to_numpy(zero_copy_only=False)
            vv = t["v" if "v" in t.column_names else "sum(v)"] \
                .to_numpy(zero_copy_only=False)
            dnz = np.where(ind_ > 0, ind_, 1.0)
            s = c * vv / (dnz[av] * dnz[bv])
            s = np.where(av == bv, 1.0, s)
            return pa.table({"i": pa.array(av, pa.int64()),
                             "j": pa.array(bv, pa.int64()),
                             "s": pa.array(s, pa.float64())})

        diag = ray.data.from_arrow(pa.table({
            "a": pa.array(np.arange(n), pa.int64()),
            "b": pa.array(np.arange(n), pa.int64()),
            "v": pa.array(np.zeros(n), pa.float64())}))
        merged = agg.map_batches(
            lambda t: t.rename_columns(["a", "b", "v"]),
            batch_format="pyarrow").union(diag) \
            .groupby(["a", "b"]).aggregate(Sum("v")) \
            .map_batches(lambda t: t.rename_columns(["a", "b", "v"]),
                         batch_format="pyarrow")
        pairs = _compact(merged.map_batches(finish,
                                            batch_format="pyarrow"),
                         rows_per_block=65536)

    out = collect_table(pairs).to_pandas()
    out = out[out.i < out.j]
    out["sim"] = np.round(out.s.to_numpy(), 6)
    out = out[out.sim > 0]
    return pa.table({
        "a": pa.array(nodes[out.i.to_numpy(np.int64)], pa.int64()),
        "b": pa.array(nodes[out.j.to_numpy(np.int64)], pa.int64()),
        "sim": pa.array(out.sim.to_numpy(), pa.float64())})
