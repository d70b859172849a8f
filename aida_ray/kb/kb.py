"""The entity repository ("KB") — Arrow/parquet tables + an in-memory view.

Mirrors the reference's relational entity-repository schema
(reference README.md:384-460, table names in
src/mpi/aida/access/DataAccessSQL.java:60-84) as parquet tables:

    dictionary(mention, entity, prior)          -- conflated mention -> candidates
    entity_ids(entity, knowledgebase, id)
    entity_keyphrases(entity, keyphrase, count)  -- intersection counts
    keyphrase_tokens(keyphrase, token)
    word_ids(word, id)
    word_expansion(word, expansion)              -- lower id -> UPPER id
    keyphrase_counts(keyphrase, count)           -- keyphrase doc frequency
    keyword_counts(keyword, count)               -- keyword doc frequency
    entity_counts(entity, count)                 -- entity superdoc sizes
    entity_inlinks(entity, inlinks)              -- sorted int lists
    entity_rank(entity, rank)                    -- [0,1], smaller = more prominent
    meta(key, value)                             -- collection_size etc.

The in-memory ``KB`` object is the worker-side state: built once from the
parquet dir, broadcast via ``ray.put`` and pinned inside actor pools
(the analogue of DataAccessCache preloading,
src/mpi/aida/access/DataAccessCache.java:25-115).  Keyword MI and IDF
weights are precomputed here for all entities at load time — the
KB-build-time aggregation the reference computes lazily per request
(KeyphrasesContext.java:258-326, WeightComputation.java:59-176).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aida_ray.text.stopwords import stopword_ids

OOKBE = "--OOKBE--"


def _log2(x: float) -> float:
    return math.log(x) / math.log(2.0)


def compute_npmi(a: int, b: int, ab: int, total: int) -> float:
    """Normalized pointwise mutual information (WeightComputation.java:59-88)."""
    if ab == 0:
        return -1.0
    joint = ab / total
    return math.log(joint / ((a / total) * (b / total))) / -math.log(joint)


def compute_mi(a: int, b: int, ab: int, total: int, normalize: bool = False) -> float:
    """(Normalized) mutual information (WeightComputation.java:102-176).

    Keeps the reference's numerator floors (0 -> 1) exactly.
    """
    pc = float(total)
    p_d = a / pc or 1.0 / pc
    p_nd = (pc - a) / pc or 1.0 / pc
    p_k = b / pc or 1.0 / pc
    p_nk = (pc - b) / pc or 1.0 / pc

    n_dk = float(ab) if ab != 0 else 1.0
    n_ndk = float(b - ab) if (b - ab) > 0 else 1.0
    n_dnk = float(a - ab) if (a - ab) != 0 else 1.0
    n_ndnk = float(pc - (a + b - ab)) if (pc - (a + b - ab)) != 0 else 1.0

    score = 0.0
    for num, px, py in ((n_dk, p_d, p_k), (n_ndk, p_nd, p_k),
                        (n_dnk, p_d, p_nk), (n_ndnk, p_nd, p_nk)):
        p = num / pc
        if p <= 0.0:
            # java: Math.log(negative) == NaN, caught by the caller and
            # zeroed (KeyphrasesContext.computeMIweights "borked" branch)
            return float("nan")
        score += p * _log2(p / (px * py))

    if normalize:
        d_ent = -((p_d * _log2(p_d)) + (p_nd * _log2(p_nd)))
        k_ent = -((p_k * _log2(p_k)) + (p_nk * _log2(p_nk)))
        score = (2 * score) / (d_ent + k_ent)
    return score


@dataclass
class KB:
    """In-memory entity repository. Read-only once built; safe to broadcast."""

    entity2id: dict[str, int]
    id2entity: dict[int, str]
    word2id: dict[str, int]
    id2word: dict[int, str]
    expansions: dict[int, int]                    # lower word id -> UPPER word id
    dictionary: dict[str, list[tuple[int, float]]]  # conflated mention -> [(entity, prior)]
    entity_kps: dict[int, list[int]]              # entity -> keyphrase ids
    kp_tokens: dict[int, tuple[int, ...]]         # keyphrase -> token ids
    e_kp_count: dict[int, dict[int, int]]         # entity -> kp -> intersection count
    e_kw_count: dict[int, dict[int, int]]         # entity -> keyword -> intersection count
    entity_sizes: dict[int, int]                  # entity superdoc sizes
    kp_df: dict[int, int]                         # keyphrase doc frequencies
    kw_df: dict[int, int]                         # keyword doc frequencies
    inlinks: dict[int, np.ndarray]                # entity -> sorted inlink entity ids
    entity_rank: dict[int, float]
    collection_size: int
    kw_mi: dict[int, dict[int, float]] = field(default_factory=dict)   # entity -> kw -> MI
    kw_idf: dict[int, float] = field(default_factory=dict)             # kw -> IDF
    stop_ids: frozenset[int] = frozenset()
    mention_max_tokens: int = 1
    entity_keywords: dict[int, frozenset[int]] = field(default_factory=dict)
    inlink_sets: dict[int, frozenset[int]] = field(default_factory=dict)
    entity_types: dict[int, frozenset[str]] = field(default_factory=dict)
    _mw_cache: dict = field(default_factory=dict, repr=False)

    # ------------------------------------------------------------------ build
    def finalize(self) -> "KB":
        """Precompute derived weights (MI / IDF) and helper state."""
        # IDF: log2(collectionSize // df) -- the reference uses Java int
        # division (KeyphrasesContext.java:313).
        self.kw_idf = {}
        for kw, df in self.kw_df.items():
            if df <= 0:
                self.kw_idf[kw] = 0.0
            else:
                self.kw_idf[kw] = _log2(self.collection_size // df)
        # Keyword MI per entity (KeyphrasesContext via DataAccessForTesting
        # getEntityKeyphrases: computeMI(entityCount, kwCount, isec, total, False)).
        self.kw_mi = {}
        for eid, kps in self.entity_kps.items():
            e_count = self.entity_sizes.get(eid, 0)
            kw2mi: dict[int, float] = {}
            kwc = self.e_kw_count.get(eid, {})
            for kp in kps:
                for kw in self.kp_tokens.get(kp, ()):
                    if kw in kw2mi:
                        continue
                    mi = compute_mi(
                        e_count, self.kw_df.get(kw, 0), kwc.get(kw, 0),
                        self.collection_size, False)
                    kw2mi[kw] = 0.0 if math.isnan(mi) else mi
            self.kw_mi[eid] = kw2mi
        self.stop_ids = frozenset(stopword_ids(self.word2id))
        if self.dictionary:
            self.mention_max_tokens = max(
                (m.count(" ") + 1 for m in self.dictionary), default=1)
        # per-entity keyword universe (tokens + expansions, stopwords out)
        # — lets the similarity kernel skip entities/keyphrases with no
        # possible match against a document's word set
        self.entity_keywords = {}
        for eid, kps in self.entity_kps.items():
            kws: set[int] = set()
            for kp in kps:
                for t in self.kp_tokens.get(kp, ()):
                    if t in self.stop_ids:
                        continue
                    kws.add(t)
                    exp = self.expansions.get(t)
                    if exp:
                        kws.add(exp)
            self.entity_keywords[eid] = frozenset(kws)
        # small sorted inlink arrays intersect faster as python sets;
        # plus a per-process memo for pair similarities (entity pairs
        # recur across documents within an actor)
        self.inlink_sets = {e: frozenset(v.tolist()) for e, v in self.inlinks.items()}
        self._mw_cache = {}
        return self

    # ------------------------------------------------------------ accessors
    def kp_weight(self, eid: int, kp: int) -> float:
        """Keyphrase weight = MI of (entity superdoc, keyphrase df) — the
        per-keyphrase weight DataAccess orders/filters by when the Fast
        settings pass minimumEntityKeyphraseWeight / maxEntityKeyphraseCount
        (DataAccessSQL.getEntityKeyphrases; README.md:147-149,361-362)."""
        w = compute_mi(self.entity_sizes.get(eid, 0),
                       self.kp_df.get(kp, 0),
                       self.e_kp_count.get(eid, {}).get(kp, 0),
                       self.collection_size, False)
        return 0.0 if math.isnan(w) else w

    def pruned_kps(self, eid: int, max_count: int = 0,
                   min_weight: float = 0.0) -> list[int]:
        """Entity keyphrases after the Fast-settings pruning: drop
        weight < min_weight, keep the top max_count by (weight desc,
        kp id asc — deterministic tie-break).  Memoized per KB object
        (one cache per actor process)."""
        if not max_count and min_weight <= 0.0:
            return self.entity_kps.get(eid, [])
        cache = getattr(self, "_kp_prune_cache", None)
        if cache is None:
            cache = {}
            self._kp_prune_cache = cache
        key = (eid, max_count, min_weight)
        got = cache.get(key)
        if got is None:
            kps = self.entity_kps.get(eid, [])
            weighted = [(kp, self.kp_weight(eid, kp)) for kp in kps]
            weighted = [(kp, w) for kp, w in weighted if w >= min_weight]
            weighted.sort(key=lambda t: (-t[1], t[0]))
            if max_count:
                weighted = weighted[:max_count]
            got = [kp for kp, _ in weighted]
            cache[key] = got
        return got

    def word_id(self, word: str) -> int:
        return self.word2id.get(word, 0)

    def expand_term(self, word_id: int) -> int:
        return self.expansions.get(word_id, 0)

    def candidates(self, conflated_mention: str,
                   max_entity_rank: float = 1.0,
                   top_by_prior: int = 0,
                   type_filter: frozenset[str] | None = None
                   ) -> list[tuple[int, float]]:
        """Candidate lookup w/ global-rank filter, type semi-join and
        top-k by prior.

        Reference: EntityLookup.java:85-156 + DataAccessSQL.java:92-167;
        rank filter keeps entities with rank <= maxEntityRank
        (DataAccessForTesting.java:236-248 uses <=); type filter keeps
        candidates having >=1 requested type (EntityLookup.java:242-261).
        """
        cands = self.dictionary.get(conflated_mention, [])
        if max_entity_rank < 1.0:
            cands = [(e, p) for (e, p) in cands
                     if self.entity_rank.get(e, 0.0) <= max_entity_rank]
        if type_filter:
            cands = [(e, p) for (e, p) in cands
                     if self.entity_types.get(e) and
                     not type_filter.isdisjoint(self.entity_types[e])]
        if top_by_prior and len(cands) > top_by_prior:
            cands = sorted(cands, key=lambda ep: (-ep[1], ep[0]))[:top_by_prior]
        return cands

    def priors(self, conflated_mention: str) -> dict[int, float]:
        return {e: p for (e, p) in self.dictionary.get(conflated_mention, [])}

    # ------------------------------------------------------------ persistence
    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

        def w(name: str, table: pa.Table) -> None:
            pq.write_table(table, os.path.join(path, f"{name}.parquet"))

        w("entity_ids", pa.table({
            "entity": list(self.entity2id.keys()),
            "knowledgebase": ["KB"] * len(self.entity2id),
            "id": pa.array(list(self.entity2id.values()), pa.int64())}))
        w("word_ids", pa.table({
            "word": list(self.word2id.keys()),
            "id": pa.array(list(self.word2id.values()), pa.int32())}))
        w("word_expansion", pa.table({
            "word": pa.array(list(self.expansions.keys()), pa.int32()),
            "expansion": pa.array(list(self.expansions.values()), pa.int32())}))
        dm, de, dp = [], [], []
        for m, eps in self.dictionary.items():
            if not eps:
                # Known surface with no candidates (e.g. "LES PAUL" in the
                # fixture) — persist as entity=-1 so the surface survives.
                dm.append(m); de.append(-1); dp.append(0.0)
            for e, p in eps:
                dm.append(m); de.append(e); dp.append(p)
        w("dictionary", pa.table({
            "mention": dm, "entity": pa.array(de, pa.int64()),
            "prior": pa.array(dp, pa.float64())}))
        ke, kk, kc = [], [], []
        for e, kps in self.entity_kps.items():
            for kp in kps:
                ke.append(e); kk.append(kp)
                kc.append(self.e_kp_count.get(e, {}).get(kp, 0))
        w("entity_keyphrases", pa.table({
            "entity": pa.array(ke, pa.int64()),
            "keyphrase": pa.array(kk, pa.int32()),
            "count": pa.array(kc, pa.int32())}))
        tk, tt = [], []
        for kp, toks in self.kp_tokens.items():
            for t in toks:
                tk.append(kp); tt.append(t)
        w("keyphrase_tokens", pa.table({
            "keyphrase": pa.array(tk, pa.int32()), "token": pa.array(tt, pa.int32())}))
        w("keyphrase_counts", pa.table({
            "keyphrase": pa.array(list(self.kp_df.keys()), pa.int32()),
            "count": pa.array(list(self.kp_df.values()), pa.int32())}))
        w("keyword_counts", pa.table({
            "keyword": pa.array(list(self.kw_df.keys()), pa.int32()),
            "count": pa.array(list(self.kw_df.values()), pa.int32())}))
        w("entity_counts", pa.table({
            "entity": pa.array(list(self.entity_sizes.keys()), pa.int64()),
            "count": pa.array(list(self.entity_sizes.values()), pa.int32())}))
        w("entity_inlinks", pa.table({
            "entity": pa.array(list(self.inlinks.keys()), pa.int64()),
            "inlinks": pa.array([v.tolist() for v in self.inlinks.values()],
                                pa.list_(pa.int64()))}))
        w("entity_rank", pa.table({
            "entity": pa.array(list(self.entity_rank.keys()), pa.int64()),
            "rank": pa.array(list(self.entity_rank.values()), pa.float64())}))
        te, tt = [], []
        for e, types in self.entity_types.items():
            for ty in sorted(types):
                te.append(e); tt.append(ty)
        w("entity_types", pa.table({
            "entity": pa.array(te, pa.int64()), "type": pa.array(tt, pa.string())}))
        w("meta", pa.table({
            "key": ["collection_size"], "value": [str(self.collection_size)]}))

    @classmethod
    def load(cls, path: str) -> "KB":
        def r(name: str) -> pa.Table:
            return pq.read_table(os.path.join(path, f"{name}.parquet"))

        t = r("entity_ids")
        entity2id = dict(zip(t["entity"].to_pylist(), t["id"].to_pylist()))
        t = r("word_ids")
        word2id = dict(zip(t["word"].to_pylist(), t["id"].to_pylist()))
        t = r("word_expansion")
        expansions = dict(zip(t["word"].to_pylist(), t["expansion"].to_pylist()))
        t = r("dictionary")
        dictionary: dict[str, list[tuple[int, float]]] = {}
        for m, e, p in zip(t["mention"].to_pylist(), t["entity"].to_pylist(),
                           t["prior"].to_pylist()):
            lst = dictionary.setdefault(m, [])
            if e >= 0:
                lst.append((e, p))
        t = r("entity_keyphrases")
        entity_kps: dict[int, list[int]] = {}
        e_kp_count: dict[int, dict[int, int]] = {}
        for e, kp, c in zip(t["entity"].to_pylist(), t["keyphrase"].to_pylist(),
                            t["count"].to_pylist()):
            entity_kps.setdefault(e, []).append(kp)
            e_kp_count.setdefault(e, {})[kp] = c
        t = r("keyphrase_tokens")
        kp_tokens_l: dict[int, list[int]] = {}
        for kp, tok in zip(t["keyphrase"].to_pylist(), t["token"].to_pylist()):
            kp_tokens_l.setdefault(kp, []).append(tok)
        kp_tokens = {k: tuple(v) for k, v in kp_tokens_l.items()}
        # keyword intersection counts derive from keyphrase counts
        # (DataAccessForTesting.getEntityKeywordIntersectionCount:486-509 —
        # counts accumulate over keyphrases sharing a token).
        e_kw_count: dict[int, dict[int, int]] = {}
        for e, kps in entity_kps.items():
            kwc: dict[int, int] = {}
            for kp in kps:
                c = e_kp_count[e][kp]
                for tok in kp_tokens.get(kp, ()):
                    kwc[tok] = kwc.get(tok, 0) + c
            e_kw_count[e] = kwc
        t = r("keyphrase_counts")
        kp_df = dict(zip(t["keyphrase"].to_pylist(), t["count"].to_pylist()))
        t = r("keyword_counts")
        kw_df = dict(zip(t["keyword"].to_pylist(), t["count"].to_pylist()))
        t = r("entity_counts")
        entity_sizes = dict(zip(t["entity"].to_pylist(), t["count"].to_pylist()))
        t = r("entity_inlinks")
        inlinks = {e: np.asarray(v, dtype=np.int64)
                   for e, v in zip(t["entity"].to_pylist(), t["inlinks"].to_pylist())}
        t = r("entity_rank")
        entity_rank = dict(zip(t["entity"].to_pylist(), t["rank"].to_pylist()))
        entity_types: dict[int, frozenset[str]] = {}
        if os.path.exists(os.path.join(path, "entity_types.parquet")):
            t = r("entity_types")
            tmp: dict[int, set[str]] = {}
            for e, ty in zip(t["entity"].to_pylist(), t["type"].to_pylist()):
                tmp.setdefault(e, set()).add(ty)
            entity_types = {e: frozenset(v) for e, v in tmp.items()}
        t = r("meta")
        meta = dict(zip(t["key"].to_pylist(), t["value"].to_pylist()))
        kb = cls(
            entity2id=entity2id,
            id2entity={v: k for k, v in entity2id.items()},
            word2id=word2id,
            id2word={v: k for k, v in word2id.items()},
            expansions=expansions,
            dictionary=dictionary,
            entity_kps=entity_kps,
            kp_tokens=kp_tokens,
            e_kp_count=e_kp_count,
            e_kw_count=e_kw_count,
            entity_sizes=entity_sizes,
            kp_df=kp_df,
            kw_df=kw_df,
            inlinks=inlinks,
            entity_rank=entity_rank,
            entity_types=entity_types,
            collection_size=int(meta["collection_size"]),
        )
        return kb.finalize()
