"""Distributed cardinality and quantile statistics — exact paths plus
mergeable sketches for the 100 TB regime.

Exact paths (oracle-checkable against DuckDB):

- :func:`count_distinct` — per-block partial distinct, then the built-in
  key shuffle counts survivors.  Shuffle volume is the DISTINCT-key
  volume, never the corpus.
- :func:`exact_quantiles` — value-histogram route: per-block
  ``(value, n)`` partials → global groupby-sum → the (small) histogram
  is scanned for DuckDB's ``quantile_disc`` index ``ceil(q*n)-1``.
  Scale assumption (document per the brief): the DISTINCT-value volume
  of the column fits one task (true for token counts, prices in cents,
  scores with bounded precision).  For genuinely continuous columns use
  :func:`quantile_sketch` instead.

Mergeable sketches (rows-only; error bounds property-tested):

- :func:`hll_count` — HyperLogLog with 2^p registers: each block emits
  ONE register-array row (vectorized numpy), merged by elementwise max;
  the classic bias-corrected harmonic estimate with the small-range
  linear-counting correction.  Standard error ≈ 1.04/sqrt(2^p).
- :func:`quantile_sketch` — equal-weight centroid compression (a
  simplified t-digest): each block compresses its sorted values into
  ≤k (mean, weight) centroids; centroids merge associatively and
  recompress, so the reduce tree never sees more than 2k centroids per
  merge.  Rank error is O(1/k) per level; property-tested ≤2/k overall.

Both sketches ship O(blocks) tiny rows through the driver — no shuffle
at all — which is exactly the communication pattern that survives a
256-node cluster.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


# ------------------------------------------------------------- exact

def count_distinct_per_group(ds: ray.data.Dataset, key: str,
                             col: str,
                             task_gate_rows: int = 20_000_000
                             ) -> ray.data.Dataset:
    """Exact COUNT(DISTINCT col) GROUP BY key: block-local (key, value)
    dedup, then a finisher GATED on the surviving pair volume.

    Below the gate ONE pandas task dedups the pairs and counts per key
    (grouping all of one key's pairs into a single reducer — the old
    plan — made a low-key-cardinality query a single-reducer straggler:
    55 s at sf0.1 for THREE keys).  Above the gate, pairs are
    hash-bucketed on (key, value) — the same pair always lands in the
    same bucket, so a per-bucket dedup + per-key partial count is
    exact — and a tiny keys×buckets groupby-sum finishes."""
    import pandas as pd

    def local_distinct(b: pa.Table) -> pa.Table:
        df = pa.table({key: b[key], col: b[col]}).to_pandas() \
            .drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = ds.select_columns([key, col]) \
        .map_batches(local_distinct, batch_format="pyarrow") \
        .materialize()

    if pairs.count() <= task_gate_rows:
        import ray as _ray
        pair_schema = pa.schema(
            [(f.name, f.type) for f in pairs.schema().base_schema])

        @_ray.remote
        def count_task(*tabs: pa.Table) -> pa.Table:
            from aida_ray.stages.dedup import _concat_blocks
            t = _concat_blocks(tabs, pair_schema)
            g = t.to_pandas().drop_duplicates() \
                .groupby(key, sort=False).size() \
                .rename("n_distinct").reset_index()
            g["n_distinct"] = g["n_distinct"].astype("int64")
            return pa.Table.from_pandas(g, preserve_index=False)

        return ray.data.from_arrow_refs(
            [count_task.remote(*pairs.to_arrow_refs())])

    try:
        import ray as _ray
        n_buckets = max(8, int(_ray.cluster_resources()
                               .get("CPU", 8)) * 2)
    except Exception:  # noqa: BLE001
        n_buckets = 16

    def tag(b: pa.Table) -> pa.Table:
        df = pa.table({key: b[key], col: b[col]}).to_pandas()
        h = pd.util.hash_pandas_object(df, index=False) \
            .to_numpy(dtype="uint64")
        return b.append_column(
            "_b", pa.array((h % n_buckets).astype("int64")))

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        out = g[[key, col]].drop_duplicates() \
            .groupby(key, sort=False).size() \
            .rename("n_distinct").reset_index()
        return out

    from ray.data.aggregate import Sum
    partial = pairs.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(bucket_count, batch_format="pandas") \
        .groupby(key).aggregate(Sum("n_distinct"))
    return partial.map_batches(lambda b: pa.table({
        key: b[key],
        "n_distinct": pc.cast(b["sum(n_distinct)"], pa.int64())}),
        batch_format="pyarrow")


def hll_count_per_group(ds: ray.data.Dataset, key: str, col: str,
                        p: int = 12) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT) per key — one register row per
    (block, key) partial, merged by elementwise max inside a per-key
    group.  The at-scale shape when Σ|distinct per key| itself is too
    big to shuffle: the shuffle carries keys × 2^p bytes instead."""
    m = 1 << p

    def per_block(b: pa.Table) -> pa.Table:
        import pandas as pd
        ks = b[key].to_pandas()
        hs = _hash64(b[col].combine_chunks())
        rows_k, rows_r = [], []
        for kv, idx in pd.Series(range(len(ks))).groupby(ks).groups.items():
            regs = _hll_registers(hs[np.asarray(idx)], p)
            rows_k.append(kv)
            rows_r.append(regs.tobytes())
        return pa.table({key: pa.array(rows_k),
                         "regs": pa.array(rows_r, pa.binary())})

    partials = ds.select_columns([key, col]) \
        .map_batches(per_block, batch_format="pyarrow")

    def merge(group) -> "object":
        import math as _math

        import pandas as pd
        regs = np.zeros(m, dtype=np.int8)
        for r in group["regs"]:
            regs = np.maximum(regs, np.frombuffer(r, dtype=np.int8))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int(np.sum(regs == 0))
        if est <= 2.5 * m and zeros:
            est = m * _math.log(m / zeros)
        return pd.DataFrame({key: [group[key].iloc[0]],
                             "approx_distinct": [float(est)]})

    return partials.groupby(key).map_groups(merge, batch_format="pandas")

def count_distinct(ds: ray.data.Dataset, col: str) -> int:
    """Exact COUNT(DISTINCT col): block-local dedup (free, no shuffle)
    then a key shuffle over the surviving distinct values only."""
    def local_distinct(b: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(
            b[col].combine_chunks() if isinstance(b[col], pa.ChunkedArray)
            else b[col])})

    return ds.select_columns([col]) \
        .map_batches(local_distinct, batch_format="pyarrow") \
        .groupby(col).count().count()


def value_histogram(ds: ray.data.Dataset, col: str) -> ray.data.Dataset:
    """(value, n) counts — per-block partials, global sum; shuffle
    volume tracks distinct values."""
    def partial(b: pa.Table) -> pa.Table:
        vc = b[col].combine_chunks().value_counts()
        return pa.table({col: vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from ray.data.aggregate import Sum
    agg = ds.select_columns([col]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(col).aggregate(Sum("n"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({col: b[col],
                         "n": pc.cast(b["sum(n)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def exact_quantiles(ds: ray.data.Dataset, col: str,
                    qs: Sequence[float]) -> pa.Table:
    """Exact discrete quantiles (DuckDB ``quantile_disc`` semantics:
    sorted index ``ceil(q*n) - 1``) via the distributed value
    histogram.  Returns (q, value)."""
    hist = value_histogram(ds, col).to_pandas().sort_values(col)
    values = hist[col].to_numpy()
    counts = hist["n"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        pos = int(np.searchsorted(cum, idx + 1))
        out_q.append(q)
        out_v.append(values[min(pos, len(values) - 1)])
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v)})


def interp_quantiles(ds: ray.data.Dataset, col: str,
                     qs: Sequence[float]) -> pa.Table:
    """Exact continuous quantiles (DuckDB ``quantile_cont`` /
    PERCENTILE_CONT semantics: linear interpolation at sorted position
    ``q*(n-1)``) via the same distributed value histogram as
    :func:`exact_quantiles` — no global sort; shuffle and driver state
    track DISTINCT values, never row counts.  Uses DuckDB's exact
    interpolation formula ``v[lo]*(hi-p) + v[hi]*(p-lo)`` so the float
    result is bit-comparable."""
    hist = value_histogram(ds, col).to_pandas().sort_values(col)
    values = hist[col].to_numpy().astype(np.float64)
    counts = hist["n"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        pos = q * (n - 1)
        lo, hi = math.floor(pos), math.ceil(pos)
        vlo = values[int(np.searchsorted(cum, lo + 1))]
        if hi == lo:
            v = vlo
        else:
            vhi = values[int(np.searchsorted(cum, hi + 1))]
            v = vlo * (hi - pos) + vhi * (pos - lo)
        out_q.append(q)
        out_v.append(v)
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value": pa.array(out_v, pa.float64())})


# ------------------------------------------------------ HyperLogLog

def _hll_registers(hashes: np.ndarray, p: int) -> np.ndarray:
    """Vectorized register maxima for one batch of 64-bit hashes."""
    m = 1 << p
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    rest = (hashes << np.uint64(p)) | np.uint64((1 << p) - 1)
    # rank = leading zeros of the remaining 64-p bits, +1
    # via float trick: log2 of the top bit position
    nz = rest != 0
    lz = np.zeros(len(hashes), dtype=np.int64)
    lz[nz] = 63 - np.floor(np.log2(rest[nz].astype(np.float64))).astype(np.int64)
    rank = np.minimum(lz + 1, 64 - p + 1)
    regs = np.zeros(m, dtype=np.int8)
    np.maximum.at(regs, idx, rank.astype(np.int8))
    return regs


def _hash64(arr: pa.Array) -> np.ndarray:
    """Deterministic 64-bit hashes of an arrow array via pandas'
    stable row hash (xxhash-based, seed-fixed)."""
    import pandas as pd
    s = pd.Series(arr.to_pandas())
    return pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)


def hll_count(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT) — one register row per block, merged
    by elementwise max on the driver (O(blocks · 2^p) bytes total)."""
    m = 1 << p

    def per_block(b: pa.Table) -> pa.Table:
        regs = _hll_registers(_hash64(b[col].combine_chunks()), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    rows = ds.select_columns([col]) \
        .map_batches(per_block, batch_format="pyarrow") \
        .take_all()
    regs = np.zeros(m, dtype=np.int8)
    for r in rows:
        regs = np.maximum(regs, np.frombuffer(r["regs"], dtype=np.int8))
    # bias-corrected estimate
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)          # linear counting
    return float(est)


# ------------------------------------------- mergeable quantile sketch

def _compress(values: np.ndarray, weights: np.ndarray,
              k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted weighted points into ≤k equal-weight centroids."""
    if len(values) <= k:
        return values, weights
    total = weights.sum()
    bounds = np.linspace(0, total, k + 1)
    cum = np.cumsum(weights)
    # bucket of each point = which equal-weight slice its cum falls in
    bucket = np.minimum(np.searchsorted(bounds, cum, side="left"), k)
    bucket[0] = max(bucket[0], 1)
    out_v = np.zeros(k, dtype=np.float64)
    out_w = np.zeros(k, dtype=np.float64)
    np.add.at(out_w, bucket - 1, weights)
    np.add.at(out_v, bucket - 1, values * weights)
    nz = out_w > 0
    return out_v[nz] / out_w[nz], out_w[nz]


def quantile_sketch(ds: ray.data.Dataset, col: str,
                    qs: Sequence[float], k: int = 512) -> pa.Table:
    """Approximate quantiles via mergeable equal-weight centroids.
    Each block emits ≤k (mean, weight) centroid pairs as one row; the
    driver merges and recompresses — communication O(blocks · k)."""
    def per_block(b: pa.Table) -> pa.Table:
        v = np.sort(b[col].combine_chunks().to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        cv, cw = _compress(v, np.ones(len(v)), k)
        return pa.table({
            "v": pa.array([cv.tobytes()], pa.binary()),
            "w": pa.array([cw.tobytes()], pa.binary()),
        })

    rows = ds.select_columns([col]) \
        .map_batches(per_block, batch_format="pyarrow") \
        .take_all()
    vs = np.concatenate([np.frombuffer(r["v"], dtype=np.float64)
                         for r in rows]) if rows else np.array([])
    ws = np.concatenate([np.frombuffer(r["w"], dtype=np.float64)
                         for r in rows]) if rows else np.array([])
    order = np.argsort(vs, kind="stable")
    vs, ws = _compress(vs[order], ws[order], 4 * k)
    cum = np.cumsum(ws)
    total = cum[-1] if len(cum) else 0.0
    out = []
    for q in qs:
        target = q * total
        pos = int(np.searchsorted(cum, target, side="left"))
        out.append(vs[min(pos, len(vs) - 1)] if len(vs) else float("nan"))
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "value": pa.array(out, pa.float64())})


def _bloom_hashes(arr, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions by double hashing h1 + i*h2 mod m over the
    two independent 31-bit polynomial lanes (no Python per string)."""
    from aida_ray.stages.dedup import _string_hashes_vec

    h1, h2 = _string_hashes_vec(arr)
    i = np.arange(k, dtype=np.int64)
    return (h1[:, None] + i[None, :] * (h2[:, None] | 1)) % m_bits


def bloom_new_urls(visited: ray.data.Dataset,
                   candidates: ray.data.Dataset,
                   url_col: str = "url", m_bits: int = 1 << 20,
                   k: int = 4,
                   num_partitions: int = 16) -> ray.data.Dataset:
    """Frontier dedup with a Bloom prefilter: candidate urls NOT in
    the visited set.  The Bloom filter has no false negatives, so a
    candidate missing any bit is DEFINITELY new and skips the
    expensive check; only bloom HITS (true members + false positives)
    go through the exact tag-and-groupby anti-join.  Output is exact
    — the filter prunes work, never recall.

    Emits distinct (url) rows for truly-new candidates.

    Scale shape: the filter builds as per-batch m-bit partials OR-ed
    once (blocks x m/8 bytes through the driver — m is a fixed small
    budget, e.g. 2^30 bits = 128 MB for ~10^8 urls at 1% fp) and
    broadcasts; candidates stream through one stateless scan; the
    residual exact anti-join shuffles only the bloom-HIT slice, which
    at crawl scale is |visited ∩ candidates| + fp-rate x new."""
    import ray as _ray

    from ray.data.aggregate import Max

    from aida_ray.stages.dedup import _get_cached
    from aida_ray.state.collect import collect_table

    def partial_bits(b: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        col = b[url_col]
        if len(col):
            pos = _bloom_hashes(col.combine_chunks(), m_bits, k).ravel()
            np.bitwise_or.at(bits, pos >> 3,
                             np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()],
                                          pa.binary())})

    parts = collect_table(visited.map_batches(
        partial_bits, batch_format="pyarrow"))
    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    for chunk in parts["bits"].to_pylist():
        bloom |= np.frombuffer(chunk, dtype=np.uint8)
    ref = _ray.put(bloom)

    def classify(b: pa.Table) -> pa.Table:
        bl = _get_cached(ref)
        col = b[url_col].combine_chunks()
        if len(col) == 0:
            return pa.table({url_col: pa.array([], pa.string()),
                             "hit": pa.array([], pa.int64())})
        pos = _bloom_hashes(col, m_bits, k)
        member = np.all(
            (bl[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1 == 1,
            axis=1)
        urls = col.to_numpy(zero_copy_only=False).astype(str)
        df = pd.DataFrame({url_col: urls,
                           "hit": member.astype(np.int64)}) \
            .drop_duplicates(subset=[url_col])
        return pa.Table.from_pandas(df, preserve_index=False)

    cls = candidates.map_batches(classify, batch_format="pyarrow") \
        .materialize()
    misses = cls.filter(expr="hit == 0").select_columns([url_col])

    # exact anti-join for the bloom-HIT slice only: tag hit-candidates
    # and visited rows, one groupby(url) with two Max flags, keep
    # candidate-and-not-visited
    def tag_cand(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["hit"], 1))
        return pa.table({
            url_col: t[url_col],
            "is_cand": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            "is_visited": pa.array(np.zeros(t.num_rows,
                                            dtype=np.int64))})

    def tag_vis(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            url_col: b[url_col].to_numpy(zero_copy_only=False)
            .astype(str)}).drop_duplicates()
        return pa.table({
            url_col: pa.array(df[url_col], pa.string()),
            "is_cand": pa.array(np.zeros(len(df), dtype=np.int64)),
            "is_visited": pa.array(np.ones(len(df), dtype=np.int64))})

    agg = cls.map_batches(tag_cand, batch_format="pyarrow") \
        .union(visited.map_batches(tag_vis, batch_format="pyarrow")) \
        .groupby(url_col).aggregate(Max("is_cand"), Max("is_visited"))

    def keep_new(b: pa.Table) -> pa.Table:
        if "max(is_cand)" not in b.column_names:
            return pa.table({url_col: pa.array([], pa.string())})
        keep = pc.and_(pc.equal(b["max(is_cand)"], 1),
                       pc.equal(b["max(is_visited)"], 0))
        return pa.table({url_col: b.filter(keep)[url_col]})

    verified = agg.map_batches(keep_new, batch_format="pyarrow")
    return misses.union(verified)


# ------------------------------------------------- count-min sketch

def _cms_rows(hashes: np.ndarray, d: int, w: int) -> np.ndarray:
    """(n, d) column indices: d pairwise-independent-ish lanes derived
    from one 64-bit hash by odd-multiplier mixing (deterministic, no
    RNG state — resumable)."""
    mults = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5],
                     dtype=np.uint64)[:d]
    mixed = hashes[:, None] * mults[None, :]
    return ((mixed >> np.uint64(33)) % np.uint64(w)).astype(np.int64)


def cms_counts(ds: ray.data.Dataset, col: str, d: int = 4,
               w: int = 2048) -> np.ndarray:
    """Distributed count-min sketch build: each block emits its own
    d x w count matrix (one flat row, O(d*w) ints regardless of block
    size), merged by elementwise sum on the driver — O(blocks * d * w)
    bytes total, zero shuffle of the corpus."""
    def per_block(b: pa.Table) -> pa.Table:
        idx = _cms_rows(_hash64(b[col].combine_chunks()), d, w)
        mat = np.zeros((d, w), dtype=np.int64)
        for r in range(d):
            np.add.at(mat[r], idx[:, r], 1)
        return pa.table({"mat": pa.array([mat.tobytes()], pa.binary())})

    rows = ds.select_columns([col]) \
        .map_batches(per_block, batch_format="pyarrow").take_all()
    mat = np.zeros((d, w), dtype=np.int64)
    for r in rows:
        mat += np.frombuffer(r["mat"], dtype=np.int64).reshape(d, w)
    return mat


def cms_estimate(mat: np.ndarray, keys: pa.Array, d: int,
                 w: int) -> np.ndarray:
    """Point-query the sketch for each key: min over the d lanes.
    Guarantees est >= exact always and est <= exact + (e/w) * N with
    probability 1 - e^-d (Cormode & Muthukrishnan 2005)."""
    idx = _cms_rows(_hash64(keys), d, w)
    ests = np.stack([mat[r, idx[:, r]] for r in range(d)], axis=1)
    return ests.min(axis=1)
