"""External entities context (SURVEY J5) and fuzzy candidate lookup (J2).

References:
  - ExternalEntitiesContext.java (user-supplied dictionary + keyphrases
    merged into candidates and similarity context; transient word ids,
    MI weight 0.0, DF 1 for transient keywords —
    KeyphrasesContext.java:206-256)
  - EntityLookup.java:159-233 (fuzzy fallback: LSH-minhash candidates
    over char-trigrams + Jaccard >= minsim)
"""

from __future__ import annotations

import copy

import numpy as np

from aida_ray.kb.kb import KB
from aida_ray.text.tokenizer import conflate_token


def kb_with_external(kb: KB,
                     dictionary: dict[str, list[str]],
                     entity_keyphrases: dict[str, list[str]] | None = None) -> KB:
    """Return a shallow-extended KB view with external entities merged in.

    The broadcast KB is never mutated — extended dicts are copies.
    External keyphrase keywords get MI 0.0 and DF 1 (so IDF is maximal),
    matching the reference's transient-word handling.
    """
    entity_keyphrases = entity_keyphrases or {}
    ext = copy.copy(kb)
    ext.entity2id = dict(kb.entity2id)
    ext.id2entity = dict(kb.id2entity)
    ext.word2id = dict(kb.word2id)
    ext.id2word = dict(kb.id2word)
    ext.expansions = dict(kb.expansions)
    ext.dictionary = dict(kb.dictionary)
    ext.entity_kps = dict(kb.entity_kps)
    ext.kp_tokens = dict(kb.kp_tokens)
    ext.kw_mi = dict(kb.kw_mi)
    ext.kw_idf = dict(kb.kw_idf)

    next_eid = max(ext.id2entity, default=0) + 1
    next_wid = max(ext.id2word, default=0) + 1

    def add_entity(name: str) -> int:
        nonlocal next_eid
        if name in ext.entity2id:
            return ext.entity2id[name]
        ext.entity2id[name] = next_eid
        ext.id2entity[next_eid] = name
        next_eid += 1
        return next_eid - 1

    def add_word(w: str) -> int:
        nonlocal next_wid
        if w in ext.word2id:
            return ext.word2id[w]
        wid = next_wid
        ext.word2id[w] = wid
        ext.id2word[wid] = w
        next_wid += 1
        up = w.upper()
        if up in ext.word2id:
            up_id = ext.word2id[up]
        else:
            up_id = next_wid
            ext.word2id[up] = up_id
            ext.id2word[up_id] = up
            next_wid += 1
        ext.expansions[wid] = up_id
        return wid

    for surface, entities in dictionary.items():
        key = conflate_token(surface)
        merged = list(ext.dictionary.get(key, []))
        for name in entities:
            eid = add_entity(name)
            merged.append((eid, 0.0))   # externals carry no prior
        ext.dictionary[key] = merged

    for name, phrases in entity_keyphrases.items():
        eid = add_entity(name)
        kp_ids = list(ext.entity_kps.get(eid, []))
        kw_mi = dict(ext.kw_mi.get(eid, {}))
        for phrase in phrases:
            kp_id = add_word(phrase)
            toks = tuple(add_word(t) for t in phrase.split(" "))
            ext.kp_tokens[kp_id] = toks
            kp_ids.append(kp_id)
            for t in toks:
                kw_mi[t] = 0.0                     # transient MI = 0
                if t not in ext.kw_idf:
                    # DF 1 → idf = log2(collectionSize)
                    import math
                    ext.kw_idf[t] = math.log2(ext.collection_size)
        ext.entity_kps[eid] = kp_ids
        ext.kw_mi[eid] = kw_mi
    return ext


class FuzzyLookup:
    """MinHash-LSH index over dictionary surfaces for fuzzy fallback.

    Build once per actor (A7 state); ``lookup`` returns the union of
    candidates of surfaces with char-trigram Jaccard >= min_similarity.
    """

    def __init__(self, kb: KB, bands: int = 16, rows: int = 4, seed: int = 7):
        self.kb = kb
        self.bands = bands
        self.rows = rows
        n = bands * rows
        rng = np.random.default_rng(seed)
        p = (1 << 31) - 1
        self.a = rng.integers(1, p, size=n, dtype=np.int64)
        self.b = rng.integers(0, p, size=n, dtype=np.int64)
        self.p = p
        self.buckets: dict[tuple[int, int], list[str]] = {}
        for surface in kb.dictionary:
            for key in self._band_keys(surface):
                self.buckets.setdefault(key, []).append(surface)

    def _trigrams(self, s: str) -> np.ndarray:
        s = s.lower()
        if len(s) < 3:
            grams = [s]
        else:
            grams = [s[i:i + 3] for i in range(len(s) - 2)]
        return np.unique(np.asarray(
            [hash_trigram(g) for g in grams], dtype=np.int64))

    def _band_keys(self, surface: str):
        t = self._trigrams(surface)
        sig = ((t[None, :] * self.a[:, None] + self.b[:, None]) % self.p).min(axis=1)
        for band in range(self.bands):
            chunk = sig[band * self.rows:(band + 1) * self.rows]
            yield (band, int((chunk * np.arange(1, self.rows + 1)).sum() % self.p))

    def lookup(self, surface: str, min_similarity: float = 0.7
               ) -> list[tuple[int, float]]:
        conflated = conflate_token(surface)
        cands: dict[int, float] = {}
        seen: set[str] = set()
        mine = self._trigrams(conflated)
        for key in self._band_keys(conflated):
            for other in self.buckets.get(key, ()):
                if other in seen or other == conflated:
                    continue
                seen.add(other)
                theirs = self._trigrams(other)
                inter = np.intersect1d(mine, theirs, assume_unique=True).size
                union = mine.size + theirs.size - inter
                if union and inter / union >= min_similarity:
                    for eid, prior in self.kb.dictionary[other]:
                        cands[eid] = max(cands.get(eid, 0.0), prior)
        return sorted(cands.items())


def hash_trigram(g: str) -> int:
    import hashlib
    return int.from_bytes(hashlib.md5(g.encode()).digest()[:4], "big") % ((1 << 31) - 1)
