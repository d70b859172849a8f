"""Deterministic corpus splitting and sampling for training pipelines.

All assignments derive from an arithmetic hash of the stable document
id (Knuth multiplicative hashing) — pure int64 column arithmetic, so
the same expression runs vectorized in Arrow AND as the SQL oracle,
and reruns / resumed jobs assign every document identically with no
coordination (no shuffles, no RNG state).

  - ``hash_split``: train/val/test by hash bucket (e.g. 80/10/10);
  - ``stratified_sample``: every k-th document per stratum (e.g. lang)
    in hash order — deterministic rank via a per-stratum sort inside
    ``groupby(...).map_groups`` (stratum cardinality is bounded by the
    label space, documents per stratum stream through the group).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

KNUTH = 2654435761  # 2^32 * (sqrt(5)-1)/2, classic multiplicative hash
MOD = 1 << 31


def id_hash(ids: pa.ChunkedArray | pa.Array) -> pa.Array:
    """(id * KNUTH) mod 2^31 — identical in SQL: (id * 2654435761) % 2147483648.

    Inputs must be small enough that id * KNUTH fits int64 (true for any
    per-shard doc counter; for 10^12-scale global ids, hash the shard id
    and the in-shard counter separately and combine)."""
    return pc.cast(
        pc.bit_wise_and(pc.multiply(pc.cast(ids, pa.int64()), KNUTH), MOD - 1),
        pa.int64())


def hash_split(ds: ray.data.Dataset, id_col: str = "doc_id",
               train: int = 8, val: int = 1, test: int = 1) -> ray.data.Dataset:
    """Append a deterministic ``split`` column (train/val/test)."""
    total = train + val + test

    def assign(b: pa.Table) -> pa.Table:
        h = id_hash(b[id_col])
        bucket = pc.subtract(h, pc.multiply(pc.divide(h, total), total))
        bnp = bucket.to_numpy(zero_copy_only=False)
        split = np.where(bnp < train, "train",
                         np.where(bnp < train + val, "val", "test"))
        return b.append_column("split", pa.array(split, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")


def mixture_thresholds(counts: dict[str, int],
                       weights: dict[str, int] | None = None
                       ) -> dict[str, int]:
    """Per-domain keep thresholds that rebalance the corpus toward a
    target mixture, as PURE INTEGER arithmetic (no float rates — a
    float rate times 2^31 can floor differently across engines, which
    would flip individual documents at the threshold boundary).

    Domain d with n_d docs and integer target weight w_d keeps docs
    whose id-hash < MOD * (w_d/n_d) / max_m(w_m/n_m), i.e. the most
    over-weighted-per-doc domain keeps everything and every other
    domain downsamples proportionally; expected kept counts follow the
    target weights.  With uniform weights this downsamples every
    domain to the rarest domain's size."""
    weights = weights or {d: 1 for d in counts}
    # argmax of w/n by integer cross-multiplication (no float compare)
    best = None
    for d in sorted(counts):
        if best is None or weights[d] * counts[best] > weights[best] * counts[d]:
            best = d
    return {d: (MOD * weights[d] * counts[best])
            // (counts[d] * weights[best]) for d in counts}


def mixture_sample(ds: ray.data.Dataset, domain_col: str = "source",
                   id_col: str = "doc_id",
                   weights: dict[str, int] | None = None,
                   thresholds: dict[str, int] | None = None
                   ) -> ray.data.Dataset:
    """Deterministic data-mixture rebalancing: keep each doc iff its
    id-hash clears its domain's threshold.  One tiny counting aggregate
    (shuffle volume = |domains|), then a stateless map-side filter —
    the corpus itself never shuffles, reruns select identical docs."""
    if thresholds is None:
        from aida_ray.stages.sketches import value_histogram
        hist = value_histogram(ds, domain_col).to_pandas()
        thresholds = mixture_thresholds(
            dict(zip(hist[domain_col], hist["n"].astype(int))), weights)

    def keep(b: pa.Table) -> pa.Table:
        import pandas as pd
        h = id_hash(b[id_col]).to_numpy(zero_copy_only=False)
        th = pd.Series(b[domain_col].to_pandas()) \
            .map(thresholds).fillna(0).to_numpy(dtype="int64")
        return b.filter(pa.array(h < th))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds: ray.data.Dataset, every_k: int = 10,
                      stratum_col: str = "lang",
                      id_col: str = "doc_id") -> ray.data.Dataset:
    """Every k-th document per stratum, ranked by (hash, id) — a
    deterministic ~1/k stratified sample with no RNG state."""

    def per_stratum(g):
        g = g.copy()
        ids = pa.array(g[id_col].to_numpy(), pa.int64())
        g["h"] = id_hash(ids).to_numpy(zero_copy_only=False)
        g = g.sort_values(["h", id_col], kind="mergesort").reset_index(drop=True)
        return g[g.index % every_k == 0].drop(columns=["h"])

    return ds.groupby(stratum_col).map_groups(per_stratum,
                                              batch_format="pandas")


def weighted_sample(ds: ray.data.Dataset, weight_col: str, k: int,
                    id_col: str = "doc_id") -> pa.Table:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): row i is selected iff its key
    u_i^(1/w_i) is among the global top-k, where u_i is a fixed
    multiplicative hash of the id mapped into (0, 1) — no RNG state,
    so any engine replays the draw exactly (the oracle runs the same
    arithmetic in SQL).

    Scale shape: each block ships only its own top-k candidate rows
    (k × blocks total), one small task merges — the fact table never
    shuffles.  Ties (astronomically unlikely on float keys) break by
    id for a total order."""
    import numpy as np
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype("int64")
        w = b[weight_col].to_numpy(zero_copy_only=False) \
            .astype("float64")
        u = ((ids * 2654435761) % 2147483648 + 1.0) / 2147483649.0
        key = u ** (1.0 / w)
        order = np.lexsort((ids, -key))[: min(k, len(ids))]
        return pa.table({
            id_col: pa.array(ids[order], pa.int64()),
            weight_col: pa.array(w[order], pa.float64()),
            "key": pa.array(key[order], pa.float64())})

    cands = ds.map_batches(partial, batch_format="pyarrow") \
        .materialize()
    from aida_ray.stages.dedup import _concat_blocks
    t = _concat_blocks([ray.get(r) for r in cands.to_arrow_refs()],
                       pa.schema([(id_col, pa.int64()),
                                  (weight_col, pa.float64()),
                                  ("key", pa.float64())]))
    ids = t[id_col].to_numpy(zero_copy_only=False)
    w = t[weight_col].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[: min(k, len(ids))]
    out = pa.table({id_col: pa.array(ids[order], pa.int64()),
                    weight_col: pa.array(w[order], pa.float64())})
    return out


def global_shuffle(ds: ray.data.Dataset, seed: int = 7
                   ) -> ray.data.Dataset:
    """Seeded whole-corpus random shuffle — the training-data epoch
    shuffle.  This is Ray Data's genuine all-to-all
    (``random_shuffle``): every block is re-materialized through the
    object store, so at 100 TB it is THE most expensive op in a
    training pipeline; run it once per epoch boundary, never inside a
    per-batch stage.  The invariant a pipeline can rely on is
    permutation-ness — no row lost or duplicated (the driver's
    order-insensitive hash compares the shuffled output to the plain
    table) — plus determinism for a fixed seed AND block structure
    (blocking changes the permutation, not the multiset)."""
    return ds.random_shuffle(seed=seed)


def leakage_aware_split(ds: ray.data.Dataset,
                        clusters: ray.data.Dataset,
                        id_col: str = "doc_id",
                        cluster_col: str = "cluster",
                        train: int = 8, val: int = 1, test: int = 1
                        ) -> ray.data.Dataset:
    """Deterministic split that can never leak near-duplicates across
    sides: the split decision hashes the document's near-dup CLUSTER
    representative, so every member of a cluster lands in the same
    split (the standard guard against test-set contamination through
    near-duplicate copies — a plain per-doc hash_split puts ~2·p·(1-p)
    of dup pairs across the train/test boundary).

    ``clusters`` holds (doc_id, cluster) rows for CLUSTERED docs only
    (label_propagation_clusters output); unclustered docs are their
    own singleton representative.  Returns (id, rep, split).

    Scale shape: one hash join (left side the corpus ids, right side
    the cluster map — both corpus-scale, no broadcast), then a
    stateless split map.  Same integer Knuth-hash split rule as
    hash_split, so the two schemes differ ONLY in the hashed key."""
    from aida_ray.stages.shuffle_join import hash_join
    total = train + val + test
    ids = ds.select_columns([id_col])
    cl = clusters.select_columns([id_col, cluster_col])
    j = hash_join(ids, cl, on=(id_col,), join_type="left_outer")

    def assign(b: pa.Table) -> pa.Table:
        d = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = b[cluster_col].to_pandas().fillna(-1).to_numpy(np.int64)
        rep = np.where(c >= 0, c, d)
        h = (rep * KNUTH) % MOD
        bucket = h % total
        split = np.where(bucket < train, "train",
                         np.where(bucket < train + val, "val", "test"))
        return pa.table({id_col: pa.array(d), "rep": pa.array(rep),
                         "split": pa.array(split, pa.string())})

    return j.map_batches(assign, batch_format="pyarrow")


def leakage_count(split_ds: ray.data.Dataset, pairs: ray.data.Dataset,
                  id_col: str = "doc_id") -> int:
    """Number of near-dup pairs whose endpoints sit in DIFFERENT
    splits (0 for a leakage-aware split by construction).  Two hash
    joins of the pair list against the split table; only partial
    counts reach the driver."""
    from aida_ray.stages.shuffle_join import hash_join
    s = split_ds.select_columns([id_col, "split"])

    def left_key(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["a"], "b": b["b"]})

    j1 = hash_join(pairs.map_batches(left_key, batch_format="pyarrow"),
                   s, on=(id_col,))

    def rekey(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b["b"], "split_a": b["split"]})

    j2 = hash_join(j1.map_batches(rekey, batch_format="pyarrow"),
                   s, on=(id_col,))

    def cnt(b: pa.Table) -> pa.Table:
        n = int(pc.sum(pc.cast(pc.not_equal(
            b["split_a"], b["split"]), pa.int64())).as_py() or 0)
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = j2.map_batches(cnt, batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum()) if len(parts) else 0
