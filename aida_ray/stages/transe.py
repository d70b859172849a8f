"""TransE knowledge-graph embedding training.

Distributed TransE (Bordes et al. 2013, "Translating Embeddings for
Modeling Multi-relational Data"): entities and relations embed in
R^d with the objective ||h + r - t|| small for true triples, larger
by a margin for corrupted ones.  Margin ranking loss with L2
distance, one deterministically-corrupted negative per positive
(tail swap by a Knuth-hash of (h, r, epoch) — same convention as
kgqa.negative_samples), full-batch SGD.

Per epoch (the classic broadcast-gradient loop, same shape as the
repo's kmeans / pq_train / perceptron stages):

1. driver broadcasts the current (E x d, R x d) arrays via
   ``ray.put``;
2. ``map_batches`` over the triple stream computes each block's
   margin-violating gradients VECTORIZED (numpy gather + fancy-index
   scatter-add) and emits SPARSE (kind, idx, grad-list) rows — one
   per touched embedding per block, not per triple;
3. one (kind, idx)-keyed groupby sums the sparse gradients (rows
   bounded by vocabulary x blocks, not by triples);
4. the driver applies the SGD step and re-normalizes entity rows to
   the unit ball (the paper's constraint).

Scale: the broadcast is embedding-table sized (E x d floats — at
10^8 entities x 64 dims = 25 GB you shard the table by entity
residue like kb/diskkb.py and route gradient rows the same way; the
loop structure is unchanged).  Determinism: fixed seed init via
``np.random.RandomState``, corruption is hash-based, gradients sum
in a groupby (float addition order varies by block schedule —
scores are asserted to tolerances, not bit-pinned, in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from aida_ray.state.collect import collect_table

_KNUTH = np.uint64(2654435761)


def _corrupt_tails(h: np.ndarray, r: np.ndarray, epoch: int,
                   n_ent: int) -> np.ndarray:
    """Deterministic corrupted tail per (h, r, epoch)."""
    x = (h.astype(np.uint64) * _KNUTH
         + r.astype(np.uint64) * np.uint64(40503)
         + np.uint64(epoch) * np.uint64(2246822519)) & np.uint64(
             0xFFFFFFFF)
    return (x % np.uint64(n_ent)).astype(np.int64)


def train_transe(triples: ray.data.Dataset, n_ent: int, n_rel: int,
                 dim: int = 16, epochs: int = 10, lr: float = 0.05,
                 margin: float = 1.0, seed: int = 7,
                 h: str = "h", r: str = "r", t: str = "t"
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Train and return (entity_emb [n_ent x dim], rel_emb
    [n_rel x dim]).  Triple columns are int64 ids.  The assertion
    stream is set-deduped ONCE up front (TransE trains on the fact
    set): a fact repeated by 10^4 pages must not take a 10^4-scaled
    gradient step."""
    from ray.data.aggregate import Sum

    def one(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({h: b[h].to_pandas(), r: b[r].to_pandas(),
                           t: b[t].to_pandas()}).drop_duplicates()
        df["one"] = np.int64(1)
        return pa.Table.from_pandas(df, preserve_index=False)

    triples = triples.map_batches(one, batch_format="pyarrow") \
        .groupby([h, r, t]).aggregate(Sum("one")).materialize()

    rng = np.random.RandomState(seed)
    bound = 6.0 / np.sqrt(dim)
    ent = rng.uniform(-bound, bound, (n_ent, dim))
    rel = rng.uniform(-bound, bound, (n_rel, dim))
    rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True),
                      1e-12)

    for epoch in range(epochs):
        ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True),
                          1e-12)
        ref = ray.put((ent, rel))

        def grads(b: pa.Table, epoch=epoch, ref=ref) -> pa.Table:
            from aida_ray.stages.dedup import _get_cached
            E, R = _get_cached(ref)
            hh = b[h].to_numpy(zero_copy_only=False).astype(np.int64)
            rr = b[r].to_numpy(zero_copy_only=False).astype(np.int64)
            tt = b[t].to_numpy(zero_copy_only=False).astype(np.int64)
            tc = _corrupt_tails(hh, rr, epoch, E.shape[0])
            pos = E[hh] + R[rr] - E[tt]          # n x d
            neg = E[hh] + R[rr] - E[tc]
            dpos = (pos * pos).sum(axis=1)
            dneg = (neg * neg).sum(axis=1)
            viol = (margin + dpos - dneg) > 0
            if not viol.any():
                return pa.table({
                    "kind": pa.array([], pa.int8()),
                    "idx": pa.array([], pa.int64()),
                    "grad": pa.array([], pa.list_(pa.float64()))})
            hv, rv, tv, cv = hh[viol], rr[viol], tt[viol], tc[viol]
            gp, gn = 2.0 * pos[viol], 2.0 * neg[viol]
            # dL/dh = gp - gn ; dL/dr = gp - gn ; dL/dt = -gp ;
            # dL/dt' = +gn
            acc_e = np.zeros_like(E)
            acc_r = np.zeros_like(R)
            np.add.at(acc_e, hv, gp - gn)
            np.add.at(acc_e, tv, -gp)
            np.add.at(acc_e, cv, gn)
            np.add.at(acc_r, rv, gp - gn)
            ke = np.flatnonzero(np.abs(acc_e).sum(axis=1))
            kr = np.flatnonzero(np.abs(acc_r).sum(axis=1))
            kind = np.concatenate([np.zeros(len(ke), dtype=np.int8),
                                   np.ones(len(kr), dtype=np.int8)])
            idx = np.concatenate([ke, kr]).astype(np.int64)
            grad = [row.tolist() for row in acc_e[ke]] + \
                   [row.tolist() for row in acc_r[kr]]
            return pa.table({
                "kind": pa.array(kind),
                "idx": pa.array(idx, pa.int64()),
                "grad": pa.array(grad, pa.list_(pa.float64()))})

        def reduce_grp(df: pd.DataFrame) -> pd.DataFrame:
            g = np.sum(np.stack(df["grad"].to_numpy()), axis=0)
            return pd.DataFrame({
                "kind": df["kind"].iloc[:1],
                "idx": df["idx"].iloc[:1],
                "grad": [g.tolist()]})

        summed = collect_table(
            triples.map_batches(grads, batch_format="pyarrow")
            .groupby(["kind", "idx"]).map_groups(
                reduce_grp, batch_format="pandas"),
            schema=pa.schema([("kind", pa.int8()),
                              ("idx", pa.int64()),
                              ("grad", pa.list_(pa.float64()))]))
        for kind, idx, grad in zip(summed["kind"].to_pylist(),
                                   summed["idx"].to_pylist(),
                                   summed["grad"].to_pylist()):
            if kind == 0:
                ent[idx] -= lr * np.asarray(grad)
            else:
                rel[idx] -= lr * np.asarray(grad)

    ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True),
                      1e-12)
    return ent, rel


def transe_eval(triples: ray.data.Dataset, ent: np.ndarray,
                rel: np.ndarray, h: str = "h", r: str = "r",
                t: str = "t", epoch_key: int = 10_000
                ) -> ray.data.Dataset:
    """Per-triple eval rows (h, r, t, d_pos, d_neg, better) against a
    fresh deterministic corruption (epoch_key outside the training
    range)."""
    ref = ray.put((ent, rel))

    def batch(b: pa.Table) -> pa.Table:
        from aida_ray.stages.dedup import _get_cached
        E, R = _get_cached(ref)
        hh = b[h].to_numpy(zero_copy_only=False).astype(np.int64)
        rr = b[r].to_numpy(zero_copy_only=False).astype(np.int64)
        tt = b[t].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = _corrupt_tails(hh, rr, epoch_key, E.shape[0])
        pos = E[hh] + R[rr] - E[tt]
        neg = E[hh] + R[rr] - E[tc]
        dpos = (pos * pos).sum(axis=1)
        dneg = (neg * neg).sum(axis=1)
        return pa.table({
            h: pa.array(hh, pa.int64()),
            r: pa.array(rr, pa.int64()),
            t: pa.array(tt, pa.int64()),
            "d_pos": pa.array(dpos, pa.float64()),
            "d_neg": pa.array(dneg, pa.float64()),
            "better": pa.array(
                (dpos < dneg) | (tt == tc), pa.bool_())})

    return triples.map_batches(batch, batch_format="pyarrow")
