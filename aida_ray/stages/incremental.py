"""Incremental ingest — dedup a new crawl increment against an
already-ingested corpus without re-shuffling either side.

The 100 TB shape: the SEEN side is summarized once into a Bloom filter
(built distributively — per-block bitmaps, OR-merged in a task tree,
never concentrated on the driver until the final ``num_bits/8`` blob),
broadcast via ``ray.put``; the NEW increment streams through a
stateless probe.  Bloom filters have no false negatives, so rows the
probe calls *definitely-new* are exactly right; the (FPR-sized)
*maybe-seen* remainder is resolved exactly with an anti-join against
the seen keys.  Total shuffle: only the maybe-seen sliver.

Sizing: ``num_bits = 16 × |seen|`` with 4 hashes gives FPR ≈ 2.4%
(k=4 is near-optimal at 16 bits/key); 10^10 seen keys → a 20 GB
filter, which at that scale you shard by key range and probe per
shard — the seam is the ``bloom_ref`` argument.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached

_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
          0x165667B19E3779F9, 0x27D4EB2F165667C5)


def _positions(values: pa.Array, num_bits: int,
               num_hashes: int) -> np.ndarray:
    """k hash positions per value (vectorized; xxhash-style mixing of
    pandas' stable 64-bit row hash)."""
    import pandas as pd
    h = pd.util.hash_pandas_object(pd.Series(values.to_pandas()),
                                   index=False).to_numpy(dtype=np.uint64)
    pos = np.empty((num_hashes, len(h)), dtype=np.int64)
    for i in range(num_hashes):
        m = (h * np.uint64(_SEEDS[i % len(_SEEDS)]) +
             np.uint64(i)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        m ^= m >> np.uint64(33)
        pos[i] = (m % np.uint64(num_bits)).astype(np.int64)
    return pos


def build_bloom(seen: ray.data.Dataset, col: str,
                num_bits: int = 1 << 22,
                num_hashes: int = 4) -> "ray.ObjectRef":
    """Distributed Bloom build: per-block bit positions → per-block
    bitmaps → pairwise OR tree.  Returns a ``ray.put``-style ref to
    (bitmap bytes, num_bits, num_hashes)."""
    nbytes = num_bits // 8

    def per_block(b: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, dtype=np.uint8)
        pos = _positions(b[col].combine_chunks(), num_bits, num_hashes)
        flat = pos.ravel()
        np.bitwise_or.at(bits, flat >> 3,
                         (np.uint8(1) << (flat & 7).astype(np.uint8)))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    refs = seen.select_columns([col]) \
        .map_batches(per_block, batch_format="pyarrow").to_arrow_refs()

    @ray.remote
    def or_merge(*tabs) -> pa.Table:
        acc = np.zeros(nbytes, dtype=np.uint8)
        for t in tabs:
            for chunk in t["bits"].to_pylist():
                acc |= np.frombuffer(chunk, dtype=np.uint8)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    # pairwise OR tree — driver never holds more than one bitmap
    while len(refs) > 1:
        refs = [or_merge.remote(*refs[i:i + 8])
                for i in range(0, len(refs), 8)]
    final = ray.get(refs[0])["bits"].to_pylist()[0] if refs else \
        b"\x00" * nbytes
    return ray.put((np.frombuffer(final, dtype=np.uint8),
                    num_bits, num_hashes))


def probe_bloom(ds: ray.data.Dataset, bloom_ref, col: str,
                keep: str = "new") -> ray.data.Dataset:
    """Stateless probe: ``keep='new'`` keeps rows DEFINITELY absent
    from the filter (no false negatives ⇒ nothing seen survives);
    ``keep='maybe'`` keeps the complement for exact follow-up."""
    def probe(b: pa.Table) -> pa.Table:
        bits, num_bits, num_hashes = _get_cached(bloom_ref)
        pos = _positions(b[col].combine_chunks(), num_bits, num_hashes)
        hit = np.ones(len(b), dtype=bool)
        for i in range(num_hashes):
            p = pos[i]
            hit &= (bits[p >> 3] >> (p & 7).astype(np.uint8)) & 1 > 0
        mask = ~hit if keep == "new" else hit
        return b.filter(pa.array(mask))

    return ds.map_batches(probe, batch_format="pyarrow")


def incremental_dedup(new: ray.data.Dataset, seen: ray.data.Dataset,
                      col: str, num_bits: int = 1 << 22) -> ray.data.Dataset:
    """Exact 'rows of `new` whose `col` was never seen': Bloom
    prefilter (no shuffle) + anti-join for the maybe-seen sliver only.
    Equivalent to ``new WHERE col NOT IN (SELECT col FROM seen)`` with
    shuffle volume ≈ FPR × |new| instead of |new| + |seen|."""
    from aida_ray.stages.shuffle_join import hash_join
    bloom_ref = build_bloom(seen, col, num_bits=num_bits)
    definitely_new = probe_bloom(new, bloom_ref, col, keep="new")
    maybe = probe_bloom(new, bloom_ref, col, keep="maybe")
    resolved = hash_join(maybe, seen.select_columns([col]),
                         on=(col,), join_type="left_anti")
    return definitely_new.union(resolved)


def snapshot_diff(old: ray.data.Dataset, new: ray.data.Dataset,
                  key: str = "url", hash_col: str = "content_hash"
                  ) -> ray.data.Dataset:
    """Crawl-snapshot diff: classify every key as added / removed /
    changed / same between two snapshots — the SCD-style maintenance
    step of an incremental crawl store.

    Both snapshots are corpus-scale, so this is a distributed FULL
    OUTER hash join on the key (only (key, content-hash) pairs are
    shuffled, never payloads), followed by a stateless classify map."""
    from aida_ray.stages.shuffle_join import hash_join

    def prep(side: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({f"{side}_{key}": b[key],
                             f"{side}_h": b[hash_col]})
        return f

    joined = hash_join(
        old.map_batches(prep("old"), batch_format="pyarrow"),
        new.map_batches(prep("new"), batch_format="pyarrow"),
        on=(f"old_{key}",), right_on=(f"new_{key}",),
        join_type="full_outer")

    def classify(b: pa.Table) -> pa.Table:
        # Dataset.join coalesces the key into the LEFT key column;
        # presence per side is read off the hash columns (non-null in
        # both inputs by construction)
        oh = b["old_h"].to_numpy(zero_copy_only=False)
        nh = b["new_h"].to_numpy(zero_copy_only=False)
        has_old = pc.is_valid(b["old_h"]).to_numpy(
            zero_copy_only=False)
        has_new = pc.is_valid(b["new_h"]).to_numpy(
            zero_copy_only=False)
        status = np.where(
            ~has_old, "added",
            np.where(~has_new, "removed",
                     np.where(oh != nh, "changed", "same")))
        return pa.table({key: b[f"old_{key}"],
                         "status": pa.array(status)})

    return joined.map_batches(classify, batch_format="pyarrow")
