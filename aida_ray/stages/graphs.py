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

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached


def pagerank(edges: ray.data.Dataset, src: str = "src", dst: str = "dst",
             damping: float = 0.85, iters: int = 20,
             dense_threshold: int = 4_000_000) -> pa.Table:
    """PageRank over a (src, dst) edge Dataset.  Returns
    (node, rank) for every node, ranks summing to 1."""
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
    rank = np.full(n, 1.0 / n)

    edges = edges.materialize()           # reused every iteration
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
        rank = (1 - damping) / n + damping * (mass + dangling / n)

    return pa.table({"node": pa.array(nodes),
                     "rank": pa.array(rank, pa.float64())})


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
