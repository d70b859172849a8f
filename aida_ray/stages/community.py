"""Community / graph-structure operators over edge tables.

- :func:`lpa_communities` — synchronous label propagation (Raghavan,
  Albert & Kumara 2007) with a deterministic min-label tie-break and a
  fixed round count, so the SQL oracle can unroll the exact algorithm
  (the pagerank-oracle pattern).  Scale shape per round: one
  per-block vote pre-aggregation + ``groupby(node,label).sum`` (the
  shuffle is distinct (node,label) votes, not edges), then a packed
  int64 argmax ``groupby(node).max`` — count in the high bits,
  bit-flipped label index in the low bits, so MAX == (max count,
  min label).  Labels live in a node-bounded broadcast vector (same
  entity-space assumption as graphs.pagerank).

- :func:`random_walks` — deterministic DeepWalk-style walk corpus
  (Perozzi et al., KDD'14 uses uniform random steps; here the step
  chooses the neighbor minimizing an explicit integer hash
  ``(A*walk + B*step + C*nbr) % M`` so the walk set is reproducible
  across any blocking AND expressible in SQL).  M prime and
  node ids < M make the key injective in the neighbor, so argmin is
  unambiguous.  Each step streams the edge table once against a
  broadcast frontier; the per-walk argmin rides a packed int64 Min.
  The walk FRONTIER (seed set) is driver-held — bounded by the given
  seeds; an all-node walk corpus runs this in node-partitioned seed
  batches.

- :func:`wl_refine` — Weisfeiler-Lehman label refinement
  (Shervashidze et al., JMLR'11): iters rounds of
  ``label(v) <- md5(label(v) | sorted neighbor labels)``; the standard
  graph/neighborhood fingerprint for structural dedup.  Neighbor
  multisets are assembled by a ``groupby(node).map_groups`` sort
  (shuffle = edge endpoints with labels attached); md5 runs once per
  NODE per round, not per edge.

- :func:`cocitation` — co-citation counts (Small 1973): pairs of
  pages cited together, i.e. pairs within each citing page's
  out-neighbor set.  (Bibliographic coupling is the same operator on
  reversed edges.)  Pairs pack into one int64; counting goes through
  ``agg.gated_count``.  Out-degree is capped (hot hubs contribute
  O(deg^2) pairs — the standard truncation, parameterized).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached
from aida_ray.stages.ml import _compact

_WALK_A = 1315423
_WALK_B = 2654435
_WALK_C = 97531
_WALK_M = 1_000_000_007


def _node_universe(edges: ray.data.Dataset, src: str,
                   dst: str) -> np.ndarray:
    """Sorted distinct endpoints (node-bounded driver vector — the
    same entity-space assumption as graphs.pagerank)."""

    def partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            b[src].to_numpy(zero_copy_only=False),
            b[dst].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    t = edges.map_batches(partial, batch_format="pyarrow") \
        .groupby("node").count().to_pandas()
    return np.sort(t["node"].to_numpy()) if len(t) else \
        np.array([], dtype=np.int64)


def lpa_communities(edges: ray.data.Dataset, src: str = "src",
                    dst: str = "dst", iters: int = 4,
                    symmetrize: bool = True) -> pa.Table:
    """(node, label) after ``iters`` synchronous LPA rounds.

    Vote rule per round: a node takes the most frequent label among
    its in-neighbors (edges symmetrized first by default), ties to
    the SMALLEST label; nodes with no votes keep their label.  Labels
    start as node ids.  Node ids must fit 31 bits (the packed-argmax
    gate; remap via dense rank upstream for wider id spaces).
    """
    from ray.data.aggregate import Max, Sum

    nodes = _node_universe(edges, src, dst)
    if len(nodes) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    n = len(nodes)
    assert n < (1 << 31), "lpa_communities: node index space > 31 bits"
    labels = np.arange(n, dtype=np.int64)   # label = index into nodes

    edges = _compact(edges, rows_per_block=65536)

    for _ in range(iters):
        ref = ray.put((nodes, labels))

        def votes(b: pa.Table, _ref=ref) -> pa.Table:
            nd, lb = _get_cached(_ref)
            s = np.searchsorted(nd, b[src].to_numpy(zero_copy_only=False))
            d = np.searchsorted(nd, b[dst].to_numpy(zero_copy_only=False))
            if symmetrize:
                tgt = np.concatenate([d, s])
                lab = np.concatenate([lb[s], lb[d]])
            else:
                tgt, lab = d, lb[s]
            df = pd.DataFrame({"node": tgt, "label": lab, "c": 1})
            g = df.groupby(["node", "label"], sort=False)["c"].sum() \
                .reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        cnt = edges.map_batches(votes, batch_format="pyarrow") \
            .groupby(["node", "label"]).aggregate(Sum("c"))

        def pack(b: pa.Table) -> pa.Table:
            c = b["sum(c)"].to_numpy(zero_copy_only=False)
            lab = b["label"].to_numpy(zero_copy_only=False)
            p = (c << np.int64(31)) | (np.int64((1 << 31) - 1) - lab)
            return pa.table({"node": b["node"],
                             "p": pa.array(p, pa.int64())})

        win = cnt.map_batches(pack, batch_format="pyarrow") \
            .groupby("node").aggregate(Max("p")).to_pandas()
        new = labels.copy()
        # "node" carries node INDICES (searchsorted in votes), not ids
        ni = win["node"].to_numpy()
        new[ni] = np.int64((1 << 31) - 1) - \
            (win["max(p)"].to_numpy() & np.int64((1 << 31) - 1))
        labels = new

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "label": pa.array(nodes[labels], pa.int64())})


def random_walks(edges: ray.data.Dataset, seeds: np.ndarray,
                 length: int, src: str = "src",
                 dst: str = "dst") -> pa.Table:
    """(walk_id, step, node) rows; step 0 is the seed; a walk at a
    node with no out-edges stops early.  walk_id = seed index.
    Deterministic: step chooses argmin_{nbr} (A*walk + B*step +
    C*nbr) % M — injective in nbr for node ids < M (~1e9)."""
    from ray.data.aggregate import Min

    seeds = np.asarray(seeds, dtype=np.int64)
    assert len(seeds) <= 5_000_000, \
        "random_walks: seed set is driver-held; batch larger walk sets"
    edges = _compact(edges, rows_per_block=65536)

    out_w = [np.arange(len(seeds), dtype=np.int64)]
    out_s = [np.zeros(len(seeds), dtype=np.int64)]
    out_n = [seeds.copy()]
    frontier = pd.DataFrame({"walk": out_w[0], "node": seeds})

    for step in range(1, length + 1):
        if frontier.empty:
            break
        ref = ray.put(frontier)

        def cands(b: pa.Table, _ref=ref, _step=step) -> pa.Table:
            fr = _get_cached(_ref)
            df = pd.DataFrame({
                "node": b[src].to_numpy(zero_copy_only=False),
                "nbr": b[dst].to_numpy(zero_copy_only=False)})
            m = df.merge(fr, on="node")
            if m.empty:
                return pa.table({"walk": pa.array([], pa.int64()),
                                 "p": pa.array([], pa.int64())})
            key = (_WALK_A * m["walk"].to_numpy()
                   + _WALK_B * np.int64(_step)
                   + _WALK_C * m["nbr"].to_numpy()) % _WALK_M
            p = (key << np.int64(31)) | m["nbr"].to_numpy()
            g = pd.DataFrame({"walk": m["walk"].to_numpy(), "p": p}) \
                .groupby("walk", sort=False)["p"].min().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        got = edges.map_batches(cands, batch_format="pyarrow") \
            .groupby("walk").aggregate(Min("p")).to_pandas()
        if got.empty:
            break
        nxt = pd.DataFrame({
            "walk": got["walk"].to_numpy(),
            "node": got["min(p)"].to_numpy() & np.int64((1 << 31) - 1)})
        out_w.append(nxt["walk"].to_numpy())
        out_s.append(np.full(len(nxt), step, dtype=np.int64))
        out_n.append(nxt["node"].to_numpy())
        frontier = nxt

    t = pa.table({"walk_id": pa.array(np.concatenate(out_w), pa.int64()),
                  "step": pa.array(np.concatenate(out_s), pa.int64()),
                  "node": pa.array(np.concatenate(out_n), pa.int64())})
    return t


def skipgram_pairs(walks: ray.data.Dataset, window: int = 2,
                   walk_col: str = "walk_id", step_col: str = "step",
                   node_col: str = "node") -> ray.data.Dataset:
    """(center, context, n) skip-gram training pairs from a walk
    corpus (DeepWalk / node2vec preprocessing): for each walk, every
    ordered pair of nodes within ``window`` steps of each other.

    Scale shape: walks shuffle once by walk id
    (``groupby(walk_id).map_groups`` — a walk is a few dozen rows);
    pair counting goes through the packed-int64 ``agg.gated_count``
    (shuffle = distinct pairs, not pair instances).  Node ids must
    fit 32 bits (packing gate)."""
    from aida_ray.stages.agg import gated_count

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(step_col)
        s = g[step_col].to_numpy()
        v = g[node_col].to_numpy().astype(np.int64)
        assert v.max(initial=0) < (1 << 32), "skipgram: node > 32 bits"
        i, j = np.meshgrid(np.arange(len(s)), np.arange(len(s)),
                           indexing="ij")
        m = (i != j) & (np.abs(s[i] - s[j]) <= window)
        return pd.DataFrame({"pair": (v[i[m]] << np.int64(32))
                             | v[j[m]]})

    packed = walks.groupby(walk_col).map_groups(pairs,
                                                batch_format="pandas")
    counted = gated_count(packed, "pair")

    def unpack(b: pa.Table) -> pa.Table:
        p = b["pair"].to_numpy(zero_copy_only=False)
        return pa.table({
            "center": pa.array(p >> np.int64(32), pa.int64()),
            "context": pa.array(p & np.int64((1 << 32) - 1), pa.int64()),
            "n": b["n"]})

    return counted.map_batches(unpack, batch_format="pyarrow")


def wl_refine(edges: ray.data.Dataset, iters: int = 2,
              src: str = "src", dst: str = "dst",
              symmetrize: bool = True) -> pa.Table:
    """(node, wl_label) after ``iters`` WL rounds; wl_label is the
    16-hex-char md5 prefix.  label0 = degree (as a decimal string);
    round: md5(own || '|' || ','.join(sorted(neighbor labels)))."""
    nodes = _node_universe(edges, src, dst)
    if len(nodes) == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "wl_label": pa.array([], pa.string())})
    edges = _compact(edges, rows_per_block=65536)

    # degree (symmetrized) for label0 — one vote-style pass
    def deg_partial(b: pa.Table) -> pa.Table:
        s = b[src].to_numpy(zero_copy_only=False)
        d = b[dst].to_numpy(zero_copy_only=False)
        both = np.concatenate([s, d]) if symmetrize else d
        u, c = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype("int64"))})

    from ray.data.aggregate import Sum
    degs = edges.map_batches(deg_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("c")).to_pandas()
    dmap = np.zeros(len(nodes), dtype=np.int64)
    di = np.searchsorted(nodes, degs["node"].to_numpy())
    dmap[di] = degs["sum(c)"].to_numpy()
    labels = np.array([str(int(x)) for x in dmap], dtype=object)

    for _ in range(iters):
        ref = ray.put((nodes, labels))

        def nbr_rows(b: pa.Table, _ref=ref) -> pa.Table:
            nd, lb = _get_cached(_ref)
            s = b[src].to_numpy(zero_copy_only=False)
            d = b[dst].to_numpy(zero_copy_only=False)
            if symmetrize:
                tgt = np.concatenate([d, s])
                lab = np.concatenate([
                    lb[np.searchsorted(nd, s)],
                    lb[np.searchsorted(nd, d)]])
            else:
                tgt = d
                lab = lb[np.searchsorted(nd, s)]
            return pa.table({"node": pa.array(tgt, pa.int64()),
                             "nlbl": pa.array(lab.astype(str))})

        def relabel(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            nd, lb = _get_cached(_ref)
            node = int(g["node"].iloc[0])
            own = lb[np.searchsorted(nd, node)]
            msg = own + "|" + ",".join(sorted(g["nlbl"].tolist()))
            h = hashlib.md5(msg.encode()).hexdigest()[:16]
            return pd.DataFrame({"node": [node], "wl_label": [h]})

        got = edges.map_batches(nbr_rows, batch_format="pyarrow") \
            .groupby("node").map_groups(relabel, batch_format="pandas") \
            .to_pandas()
        new = labels.copy()
        gi = np.searchsorted(nodes, got["node"].to_numpy())
        new[gi] = got["wl_label"].to_numpy(dtype=object)
        # isolated nodes (no rows): refine over the empty multiset
        seen = np.zeros(len(nodes), dtype=bool)
        seen[gi] = True
        for i in np.nonzero(~seen)[0]:
            new[i] = hashlib.md5(
                (labels[i] + "|").encode()).hexdigest()[:16]
        labels = new

    return pa.table({"node": pa.array(nodes, pa.int64()),
                     "wl_label": pa.array(labels.astype(str))})


def cocitation(edges: ray.data.Dataset, min_count: int = 2,
               src: str = "src", dst: str = "dst",
               max_out: int = 10_000) -> ray.data.Dataset:
    """(a, b, n) pairs of co-cited targets (a < b) appearing together
    in >= ``min_count`` citing pages.  Citing pages with out-degree
    above ``max_out`` are truncated to their ``max_out`` smallest
    targets (hot hubs are O(deg^2) pairs — standard cap, documented).
    Bibliographic coupling = cocitation over reversed edges."""
    from aida_ray.stages.agg import gated_count
    from aida_ray.stages.graphs import _basket_pairs

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        it = np.unique(g[dst].to_numpy())[:max_out].astype(np.int64)
        assert it.max(initial=0) < (1 << 32), "cocitation: dst > 32 bits"
        grp = np.zeros(len(it), dtype=np.int64)
        packed = _basket_pairs(grp, it)
        return pd.DataFrame({"pair": packed})

    packed = edges.groupby(src).map_groups(pairs, batch_format="pandas")
    counted = gated_count(packed, "pair", min_count=min_count)

    def unpack(b: pa.Table) -> pa.Table:
        p = b["pair"].to_numpy(zero_copy_only=False)
        return pa.table({"a": pa.array(p >> np.int64(32), pa.int64()),
                         "b": pa.array(p & np.int64((1 << 32) - 1),
                                       pa.int64()),
                         "n": b["n"]})

    return counted.map_batches(unpack, batch_format="pyarrow")
