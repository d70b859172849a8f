"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (see SURVEY.md §2.7 D4/D5 and the LSH machinery the
reference uses for fuzzy lookup, src/mpi/aida/util/lsh/LSH.java):
  - exact: vectorized content hash per batch → built-in (sort-based)
    groupby aggregate over (hash, id) partials — never per-group Python;
  - MinHash-LSH: numpy rolling-hash shingles → minhash signatures →
    (band, band_hash, id) rows → vectorized bucket counts → only HOT
    buckets (count >= 2) are shipped for pairing + Jaccard verify;
  - SimHash: 64-bit signature with a per-actor token-hash memo;
  - embedding cosine: random-hyperplane LSH buckets → in-bucket pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

_P31 = (1 << 31) - 1  # mersenne prime modulus for minhash arithmetic


def _md5_64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 1


_BROADCAST_CACHE: dict = {}


def _get_cached(ref):
    """ray.get deserializes python dicts on every call — memoize the
    broadcast object once per worker process."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE.clear()          # hold at most one broadcast
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    hashes = [_md5_64(t) for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(hashes, pa.int64()))


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Lowest-id representative + duplicate count per identical text.

    Phase 1: per-batch pandas groupby (vectorized) → (hash, min_id, n)
    partials; phase 2: built-in groupby aggregate (sort-based, no
    per-group Python); phase 3: map-side semi-join back to the original
    rows to recover the representative's text.  The broadcast rep map
    holds two ints per distinct text — at 100 TB swap phase 3 for a
    hash-partitioned join on content_hash.
    """

    def partial(batch: pa.Table) -> pa.Table:
        b = add_content_hash(batch, text_col)
        df = b.select(["content_hash", id_col]).to_pandas()
        g = df.groupby("content_hash")[id_col].agg(["min", "size"]).reset_index()
        return pa.table({"content_hash": pa.array(g["content_hash"], pa.int64()),
                         "min_id": pa.array(g["min"], pa.int64()),
                         "n": pa.array(g["size"], pa.int64())})

    from ray.data.aggregate import Min, Sum
    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("content_hash").aggregate(Min("min_id"), Sum("n"))
    rep_df = agg.to_pandas()
    rep_map = {int(h): (int(m), int(n)) for h, m, n in
               zip(rep_df["content_hash"], rep_df["min(min_id)"], rep_df["sum(n)"])}
    rep_ref = ray.put(rep_map)

    def pick_reps(batch: pa.Table) -> pa.Table:
        reps = _get_cached(rep_ref)
        b = add_content_hash(batch, text_col)
        ids = b[id_col].to_pylist()
        hs = b["content_hash"].to_pylist()
        keep, n_dups = [], []
        for i, (doc, h) in enumerate(zip(ids, hs)):
            m = reps.get(h)
            if m and m[0] == doc:
                keep.append(i)
                n_dups.append(m[1])
        out = b.take(keep)
        return out.append_column("n_dups", pa.array(n_dups, pa.int64()))

    return ds.map_batches(pick_reps, batch_format="pyarrow")


# ------------------------------------------------------------------ minhash

def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Vectorized k-char rolling polynomial hashes mod 2^31-1 (unique)."""
    t = " ".join(text.lower().split())
    b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    powers = np.power(257, np.arange(k), dtype=object)
    powers = np.array([int(p) % _P31 for p in powers], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(b, k)
    return np.unique((win @ powers) % _P31)


class MinHasher:
    """n-permutation MinHash over character shingles — all arithmetic in
    int64 below 2^62, fully vectorized."""

    def __init__(self, num_hashes: int = 128, shingle_k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _P31, size=num_hashes, dtype=np.int64)
        self.b = rng.integers(0, _P31, size=num_hashes, dtype=np.int64)
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        vals = (sh[None, :] * self.a[:, None] + self.b[:, None]) % _P31
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t).tolist() for t in batch["text"].to_pylist()]
        return batch.append_column("minhash", pa.array(sigs, pa.list_(pa.int64())))


def jaccard_shingles(a: str, b: str, k: int = 5) -> float:
    sa = _shingle_hashes(a, k)
    sb = _shingle_hashes(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 0.0


def minhash_lsh_pairs(ds: ray.data.Dataset, num_hashes: int = 128,
                      bands: int = 32, shingle_k: int = 5,
                      id_col: str = "doc_id",
                      jaccard_threshold: float = 0.8,
                      seed: int = 42) -> pa.Table:
    """Jaccard-verified near-dup pairs (a < b) via banded MinHash-LSH.

    Vectorized path: signatures per batch → (band, band_hash, id) rows →
    built-in bucket counts → only buckets with >= 2 members ("hot", a
    tiny fraction) have their member ids + texts gathered for pairwise
    verification.  The verify set is bounded by the true near-dup count,
    not the corpus.
    """
    rows_per_band = num_hashes // bands
    hasher = MinHasher(num_hashes, shingle_k, seed)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.repeat(np.asarray(batch[id_col].to_pylist(), dtype=np.int64), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
        bh = np.empty(n * bands, dtype=np.int64)
        for i, t in enumerate(batch["text"].to_pylist()):
            sig = hasher.signature(t).reshape(bands, rows_per_band)
            # order-sensitive band hash, vectorized
            mix = (sig * np.arange(1, rows_per_band + 1)).sum(axis=1)
            bh[i * bands:(i + 1) * bands] = (mix % _P31) * bands + np.arange(bands)
        return pa.table({id_col: pa.array(ids),
                         "band_hash": pa.array(bh, pa.int64())})

    # materialize: the exploded rows are consumed twice (bucket counts +
    # hot-bucket filter) and are narrow (two ints per row)
    exploded = ds.map_batches(explode, batch_format="pyarrow").materialize()
    counts = exploded.groupby("band_hash").count().to_pandas()
    hot = set(counts[counts["count()"] >= 2]["band_hash"].astype(int))
    if not hot:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    hot_ref = ray.put(hot)

    def filter_hot(batch: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        mask = [h in hs for h in batch["band_hash"].to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_()))

    cand = pa.concat_tables([
        ray.get(r) for r in
        exploded.map_batches(filter_hot, batch_format="pyarrow").to_arrow_refs()])
    cand_ids = set(cand[id_col].to_pylist())
    idr = ray.put(cand_ids)

    def gather_texts(batch: pa.Table) -> pa.Table:
        want = ray.get(idr)
        mask = [i in want for i in batch[id_col].to_pylist()]
        return batch.filter(pa.array(mask, pa.bool_())).select([id_col, "text"])

    texts_t = pa.concat_tables([
        ray.get(r) for r in
        ds.map_batches(gather_texts, batch_format="pyarrow").to_arrow_refs()])
    texts = dict(zip(texts_t[id_col].to_pylist(), texts_t["text"].to_pylist()))

    buckets: dict[int, list[int]] = {}
    for i, h in zip(cand[id_col].to_pylist(), cand["band_hash"].to_pylist()):
        buckets.setdefault(h, []).append(i)
    seen: set[tuple[int, int]] = set()
    out_a, out_b, out_j = [], [], []
    for members in buckets.values():
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                pair = (ms[x], ms[y])
                if pair in seen:
                    continue
                seen.add(pair)
                j = jaccard_shingles(texts[ms[x]], texts[ms[y]], shingle_k)
                if j >= jaccard_threshold:
                    out_a.append(pair[0]); out_b.append(pair[1]); out_j.append(j)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def minhash_dedup_clusters(pairs: pa.Table) -> dict[int, int]:
    """Union-find over verified pairs → id -> cluster-representative map."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"].to_pylist(), pairs["b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


# ------------------------------------------------------------------ simhash

class SimHasher:
    """64-bit SimHash over whitespace tokens. Token hashes memoized per
    actor (vocabulary is tiny vs corpus); bit-counting vectorized."""

    def __init__(self, bits: int = 63):
        self.bits = bits
        self._memo: dict[str, np.ndarray] = {}
        self._shifts = np.arange(bits, dtype=np.int64)

    def _token_bits(self, tok: str) -> np.ndarray:
        v = self._memo.get(tok)
        if v is None:
            h = _md5_64(tok)
            v = ((h >> self._shifts) & 1).astype(np.int64) * 2 - 1
            self._memo[tok] = v
        return v

    def signature(self, text: str) -> int:
        toks = text.lower().split()
        if not toks:
            return 0
        v = np.sum([self._token_bits(t) for t in toks], axis=0)
        bits = (v > 0).astype(np.int64)
        return int((bits << self._shifts).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return batch.append_column("simhash", pa.array(sigs, pa.int64()))


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Character n-gram Jaccard (MathUtil.computeJaccardSimilarity over
    trigrams, used by the reference's fuzzy lookup EntityLookup.java:217-221)."""
    sa = {a[i:i + k] for i in range(max(1, len(a) - k + 1))}
    sb = {b[i:i + k] for i in range(max(1, len(b) - k + 1))}
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ------------------------------------------------- embedding near-duplicates

def embedding_near_dup_pairs(ds: ray.data.Dataset,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id",
                             n_planes: int = 12,
                             cosine_threshold: float = 0.95,
                             seed: int = 42) -> ray.data.Dataset:
    """Near-dup by cosine: random-hyperplane LSH bucket → in-bucket pairs.

    Bucket count is 2^n_planes; in-bucket pairing is vectorized numpy.
    """

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((vecs.shape[1], n_planes))
        bits = (vecs @ planes) > 0
        buckets = (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "bucket": pa.array(buckets),
            vec_col: batch[vec_col],
        })

    def pairs(group):
        import pandas as pd
        ids = group[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        vecs = np.array(group[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0] = 1.0
        normed = vecs / norms[:, None]
        sims = normed @ normed.T
        iu = np.triu_indices(len(ids), k=1)
        mask = sims[iu] >= cosine_threshold
        xs, ys = iu[0][mask], iu[1][mask]
        a = np.minimum(ids[xs], ids[ys])
        b = np.maximum(ids[xs], ids[ys])
        return pd.DataFrame({"a": a, "b": b, "cosine": sims[iu][mask]})

    return ds.map_batches(bucketize, batch_format="pyarrow") \
             .groupby("bucket").map_groups(pairs, batch_format="pandas")
