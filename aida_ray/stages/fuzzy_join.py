"""Generic fuzzy string join (similarity join) between two tables.

Shape: the RIGHT side (a dictionary/reference table — entity names,
canonical brands, gazetteer rows) is indexed ONCE into a char-trigram
MinHash-LSH index and broadcast via ``ray.put``; the LEFT side streams
through a stateless probe that verifies candidates with EXACT trigram
Jaccard.  Probe cost per row is O(bucket hits), independent of |right|.

Same banding math as the KB fuzzy fallback (`ned/external.FuzzyLookup`,
reference `mpi/lsh/LSH.java`) but decoupled from the KB so any two
string columns can be joined.  When BOTH sides are corpus-sized, band
both sides by the same LSH keys and verify inside
``groupby(band).map_groups`` — the machinery `stages/dedup.py` already
uses for document near-dup; this module is the broadcast (dictionary)
case.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from aida_ray.stages.dedup import _get_cached


def _hash_tri(g: str) -> int:
    import hashlib
    return int.from_bytes(hashlib.md5(g.encode()).digest()[:8],
                          "big") >> 1


def _trigrams(s: str) -> np.ndarray:
    s = s.lower()
    grams = [s] if len(s) < 3 else [s[i:i + 3] for i in range(len(s) - 2)]
    return np.unique(np.asarray([_hash_tri(g) for g in grams],
                                dtype=np.int64))


class FuzzyIndex:
    """Trigram MinHash-LSH over (key, name) rows with exact-Jaccard
    verification at query time."""

    def __init__(self, keys, names, bands: int = 16, rows: int = 4,
                 seed: int = 7):
        self.bands, self.rows = bands, rows
        n = bands * rows
        rng = np.random.default_rng(seed)
        p = (1 << 31) - 1
        self.a = rng.integers(1, p, size=n, dtype=np.int64)
        self.b = rng.integers(0, p, size=n, dtype=np.int64)
        self.p = p
        self.names = list(names)
        self.keys = list(keys)
        self.tris = [_trigrams(nm) for nm in self.names]
        self.buckets: dict[tuple[int, int], list[int]] = {}
        for i in range(len(self.names)):
            for key in self._band_keys(self.tris[i]):
                self.buckets.setdefault(key, []).append(i)

    def _band_keys(self, tri: np.ndarray):
        sig = ((tri[None, :] * self.a[:, None] + self.b[:, None])
               % self.p).min(axis=1)
        for band in range(self.bands):
            chunk = sig[band * self.rows:(band + 1) * self.rows]
            yield (band, int((chunk * np.arange(1, self.rows + 1)).sum()
                             % self.p))

    def query(self, s: str, minsim: float):
        mine = _trigrams(s)
        out, seen = [], set()
        for key in self._band_keys(mine):
            for i in self.buckets.get(key, ()):
                if i in seen:
                    continue
                seen.add(i)
                inter = np.intersect1d(mine, self.tris[i],
                                       assume_unique=True).size
                sim = inter / (len(mine) + len(self.tris[i]) - inter)
                if sim >= minsim:
                    out.append((self.keys[i], self.names[i], sim))
        return out


def fuzzy_join(left: ray.data.Dataset, right: pa.Table,
               lkey: str, lcol: str, rkey: str, rcol: str,
               minsim: float = 0.5, bands: int = 16,
               rows: int = 4) -> ray.data.Dataset:
    """Rows (lkey, lname, rkey, rname, sim) for every left string whose
    trigram Jaccard to a right string is ≥ minsim (LSH-candidate
    recall; exact-verified precision).  Size the banding to the
    threshold: recall at similarity s is 1-(1-s^rows)^bands, so a 0.6
    threshold wants wide shallow bands (e.g. 32×2 → ~1-6e-7) while the
    default 16×4 suits ~0.8+ thresholds."""
    index = FuzzyIndex(right[rkey].to_pylist(), right[rcol].to_pylist(),
                       bands=bands, rows=rows)
    iref = ray.put(index)

    def probe(b: pa.Table) -> pa.Table:
        idx = _get_cached(iref)
        lk, ln, rk, rn, sims = [], [], [], [], []
        for k, s in zip(b[lkey].to_pylist(), b[lcol].to_pylist()):
            for mk, mn, sim in idx.query(s, minsim):
                lk.append(k)
                ln.append(s)
                rk.append(mk)
                rn.append(mn)
                sims.append(round(sim, 6))
        return pa.table({
            lkey: pa.array(lk), "l_name": pa.array(ln, pa.string()),
            rkey: pa.array(rk), "r_name": pa.array(rn, pa.string()),
            "sim": pa.array(sims, pa.float64()),
        })

    return left.map_batches(probe, batch_format="pyarrow")
