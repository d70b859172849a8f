"""Edit-distance (Levenshtein <= 1) string self-join — FastSS deletion
neighborhoods.

Candidate generation has GUARANTEED recall at distance 1: two strings
a, b with lev(a,b) <= 1 always share a key in

    U(s) = {s}  ∪  {s with one character deleted}

(equal strings share s; a substitution at position i shares the
delete-at-i variant; an insert/delete pair shares the shorter string,
which is both its own identity key and a deletion variant of the
longer).  Sharing a key is NOT sufficient (``ab``/``ba`` both yield
``b``), so every candidate pair is verified with an exact distance-1
check.

Scale shape: the deletion-variant explosion is a stateless flat
``map_batches`` (one row per (variant-hash, id) — len(s)+1 rows per
string, so bound input strings to short dictionary keys: names, tokens,
hosts); candidate pairs ride the SAME hot-bucket + distinct-pair stage
as the MinHash/n-gram near-dup family (`_distinct_pairs_from_buckets`),
so pair volume is bounded by the near-match structure, never the corpus;
the verify side broadcasts the (id -> string) dictionary once via
``ray.put`` (dimension-bounded — this operator is for joining string
DICTIONARIES, not documents; for corpus-scale verify swap in the
hash-join route exactly as `_verify_pairs` does).

Reference parity: the reference's fuzzy dictionary matching is
LSH-over-trigrams (src/mpi/aida/util/lsh/LSH.java, wired through
DataAccessForTesting fuzzy lookups); this operator is the exact-
threshold complement the trigram join cannot guarantee (LSH recall is
probabilistic; deletion neighborhoods are exhaustive at d=1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import (_concat_blocks,
                                   _distinct_pairs_from_buckets,
                                   _get_cached)


def _key64(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                          "big") >> 1


def _within_one(a: str, b: str) -> bool:
    """Exact lev(a,b) <= 1 for candidate pairs (len diff already <= 1
    by construction of the deletion keys)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is the shorter: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_join(ds: ray.data.Dataset, id_col: str, str_col: str,
               max_len: int = 64,
               broadcast_threshold: int = 4_000_000
               ) -> ray.data.Dataset:
    """All distinct pairs whose strings are within Levenshtein
    distance 1 and NOT identical (exact-duplicate strings are the
    exact-dedup operator's job).  Strings longer than ``max_len`` are
    ignored (deletion-neighborhood joins are for short dictionary
    strings; document the cap rather than explode 10^4 variants).

    Output: (id_a, id_b, str_a, str_b), one row per unordered pair,
    oriented by STRING order — ``str_a < str_b`` — matching the SQL
    oracle's convention; ``id_a`` may exceed ``id_b`` when the lesser
    string happens to carry the larger id.
    """

    def explode(b: pa.Table) -> pa.Table:
        ids_out, keys = [], []
        ids = b[id_col].to_numpy(zero_copy_only=False)
        for i, s in zip(ids, b[str_col].to_pylist()):
            if s is None or len(s) > max_len:
                continue
            seen = {s}
            for j in range(len(s)):
                seen.add(s[:j] + s[j + 1:])
            for v in seen:
                ids_out.append(int(i))
                keys.append(_key64(v))
        return pa.table({id_col: pa.array(ids_out, pa.int64()),
                         "band_hash": pa.array(keys, pa.int64())})

    exploded = ds.map_batches(explode, batch_format="pyarrow") \
        .materialize()
    pairs = _distinct_pairs_from_buckets(
        exploded, id_col, num_partitions=16,
        broadcast_threshold=broadcast_threshold)

    # verify: broadcast the (id -> string) dictionary, sorted for
    # searchsorted probes (dimension-bounded input, see module doc)
    dict_tbl = _concat_blocks(
        [ray.get(r) for r in
         ds.map_batches(lambda b: pa.table({
             id_col: pa.array(b[id_col].to_numpy(
                 zero_copy_only=False).astype("int64"), pa.int64()),
             str_col: b[str_col]}), batch_format="pyarrow")
         .to_arrow_refs()],
        pa.schema([(id_col, pa.int64()), (str_col, pa.string())]))
    k = dict_tbl[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(k, kind="stable")
    ref = ray.put((k[order],
                   dict_tbl[str_col].to_numpy(zero_copy_only=False)[order]))

    def verify(b: pa.Table) -> pa.Table:
        keys, names = _get_cached(ref)
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        sa = names[np.searchsorted(keys, a)]
        sb = names[np.searchsorted(keys, bb)]
        # equal-length pairs (the bulk: substitution candidates) verify
        # as ONE vectorized per-char mismatch count over fixed-width
        # codepoint matrices; only indel candidates (length diff 1)
        # fall back to the scalar two-pointer check
        n = len(sa)
        keep = np.zeros(n, dtype=bool)
        if n:
            ua = sa.astype(f"U{max_len}")
            ub = sb.astype(f"U{max_len}")
            la = np.char.str_len(ua)
            lb = np.char.str_len(ub)
            eq = la == lb
            A = ua.view(np.uint32).reshape(n, max_len)
            B = ub.view(np.uint32).reshape(n, max_len)
            mism = (A != B).sum(axis=1)
            keep[eq] = mism[eq] == 1      # ==0 is an identical string
            rest = np.flatnonzero(~eq)
            for i in rest:
                keep[i] = sa[i] != sb[i] and _within_one(sa[i], sb[i])
        a, bb, sa, sb = a[keep], bb[keep], sa[keep], sb[keep]
        # emit in STRING order (oracle convention str_a < str_b),
        # independent of which id happened to be smaller
        swap = sa > sb
        a, bb = np.where(swap, bb, a), np.where(swap, a, bb)
        sa, sb = np.where(swap, sb, sa), np.where(swap, sa, sb)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(bb, pa.int64()),
            "str_a": pa.array(list(sa), pa.string()),
            "str_b": pa.array(list(sb), pa.string())})

    return pairs.map_batches(verify, batch_format="pyarrow")
