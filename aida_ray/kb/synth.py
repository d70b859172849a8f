"""Deterministic synthetic KB + web-page corpus generators.

Scales the fixture KB shape (aida_ray.kb.fixture) to arbitrary entity /
page counts for benchmarks, with the skew properties the north rule
cares about: zipf-ish entity popularity (head entities for
canonicalization salting), ambiguous short surfaces with priors,
clustered inlinks so graph coherence has signal, and per-entity
keyphrases so local similarity has signal.

Everything is seeded (default 42) — same inputs, byte-identical outputs.
"""

from __future__ import annotations

import numpy as np

from aida_ray.kb.kb import KB
from aida_ray.text.tokenizer import conflate_token

_SYL_A = ["ba", "do", "fen", "gar", "hel", "jin", "kor", "lam", "mer", "nor",
          "pol", "quin", "ras", "sol", "tar", "ul", "ven", "wex", "yor", "zan"]
_SYL_B = ["bel", "cor", "dan", "eth", "fir", "gos", "hart", "ilm", "jas", "kel",
          "lor", "mond", "nex", "oth", "pike", "rold", "stein", "thorn", "vale", "wick"]


def _word(rng: np.random.Generator) -> str:
    return "".join(rng.choice(_SYL_A) for _ in range(int(rng.integers(2, 4))))


def _cap(w: str) -> str:
    return w[0].upper() + w[1:]


def synth_kb(n_entities: int = 1000, seed: int = 42) -> KB:
    rng = np.random.default_rng(seed)
    first_pool = sorted({_cap(a + b) for a in _SYL_A for b in _SYL_B})
    last_pool = sorted({_cap(b + a) + c for c in ["", "son", "man", "ber", "ton", "field", "stad"]
                        for a in _SYL_A for b in _SYL_B})
    # several entities share a last name
    n_last = min(max(20, n_entities // 4), len(last_pool))
    last_pool = last_pool[:n_last]
    vocab = sorted({_word(rng) for _ in range(max(500, n_entities * 2))})

    entity2id: dict[str, int] = {"--OOKBE--": 1}
    names: list[tuple[str, str, str]] = []     # (entity_name, first, last)
    for i in range(n_entities):
        first = first_pool[i % len(first_pool)]
        last = last_pool[int(rng.integers(0, n_last))]
        name = f"{first}_{last}_{i}"
        entity2id[name] = len(entity2id) + 1
        names.append((name, first, last))

    # zipf-ish popularity: head entities get big counts
    pop = (1.0 / (np.arange(n_entities) + 1) ** 0.8)
    pop = pop / pop.sum()
    counts = np.maximum((pop * n_entities * 100).astype(np.int64), 2)

    word2id: dict[str, int] = {}
    expansions: dict[int, int] = {}

    def add_word(w: str) -> int:
        if w in word2id:
            return word2id[w]
        wid = len(word2id) + 1
        word2id[w] = wid
        up = w.upper()
        if up in word2id:
            up_id = word2id[up]
        else:
            up_id = len(word2id) + 1
            word2id[up] = up_id
        expansions[wid] = up_id
        return wid

    entity_kps: dict[int, list[int]] = {}
    kp_tokens: dict[int, tuple[int, ...]] = {}
    e_kp_count: dict[int, dict[int, int]] = {}
    e_kw_count: dict[int, dict[int, int]] = {}
    kp_df: dict[int, int] = {}
    kw_df: dict[int, int] = {}
    entity_keyphrase_words: dict[int, list[str]] = {}   # for corpus generation

    n_clusters = max(1, n_entities // 8)
    for i, (name, first, last) in enumerate(names):
        eid = entity2id[name]
        cluster = i % n_clusters
        crng = np.random.default_rng(seed * 7919 + i)
        n_kp = int(crng.integers(4, 9))
        kp_ids: list[int] = []
        kpc: dict[int, int] = {}
        kwc: dict[int, int] = {}
        kws: list[str] = []
        for k in range(n_kp):
            n_tok = int(crng.integers(1, 4))
            # mix entity-specific words with cluster-shared words
            words = []
            for _ in range(n_tok):
                if crng.random() < 0.35:
                    words.append(vocab[(cluster * 13 + int(crng.integers(0, 5))) % len(vocab)])
                else:
                    words.append(vocab[int(crng.integers(0, len(vocab)))])
            phrase = " ".join(words)
            kp_id = add_word(phrase)
            tok_ids = tuple(add_word(w) for w in words)
            if kp_id not in kp_ids:
                kp_ids.append(kp_id)
                kp_tokens[kp_id] = tok_ids
                c = int(crng.integers(1, max(2, counts[i] // 2)))
                kpc[kp_id] = c
                for t in tok_ids:
                    kwc[t] = kwc.get(t, 0) + c
                kws.extend(words)
        entity_kps[eid] = kp_ids
        e_kp_count[eid] = kpc
        e_kw_count[eid] = kwc
        entity_keyphrase_words[eid] = kws
        for kp_id in kp_ids:
            kp_df[kp_id] = kp_df.get(kp_id, 0) + kpc[kp_id] * 3
            for t in kp_tokens[kp_id]:
                kw_df[t] = kw_df.get(t, 0) + kpc[kp_id] * 3

    # dictionary: unique full-name surface + ambiguous last-name surface
    dictionary: dict[str, list[tuple[int, float]]] = {}
    by_last: dict[str, list[int]] = {}
    for i, (name, first, last) in enumerate(names):
        eid = entity2id[name]
        full = conflate_token(f"{first} {last}")
        dictionary.setdefault(full, []).append((eid, 1.0))
        by_last.setdefault(last, []).append(i)
    for last, idxs in by_last.items():
        total = sum(counts[i] for i in idxs)
        dictionary[conflate_token(last)] = [
            (entity2id[names[i][0]], float(counts[i] / total)) for i in idxs]
    # full-name surfaces shared by several entities get priors too
    for surf, cands in dictionary.items():
        if len(cands) > 1 and abs(sum(p for _, p in cands) - 1.0) > 1e-9:
            total = sum(p for _, p in cands)
            dictionary[surf] = [(e, p / total) for e, p in cands]

    # clustered inlinks: entities in a cluster share link sources
    inlinks: dict[int, np.ndarray] = {}
    universe = np.arange(2, n_entities + 2, dtype=np.int64)
    for i, (name, _f, _l) in enumerate(names):
        eid = entity2id[name]
        cluster = i % n_clusters
        crng = np.random.default_rng(seed * 104729 + cluster)
        cluster_links = crng.choice(universe, size=min(30, len(universe)), replace=False)
        own_rng = np.random.default_rng(seed * 31 + i)
        n_links = max(2, int(pop[i] * n_entities * 3))
        n_from_cluster = min(len(cluster_links), max(2, n_links // 2))
        picks = set(cluster_links[:n_from_cluster].tolist())
        picks.update(own_rng.choice(universe, size=min(n_links, len(universe)),
                                    replace=False).tolist())
        picks.discard(eid)
        inlinks[eid] = np.asarray(sorted(picks), dtype=np.int64)

    order = np.argsort(-counts, kind="stable")
    entity_rank = {}
    for rank_pos, i in enumerate(order):
        entity_rank[entity2id[names[i][0]]] = rank_pos / n_entities

    kb = KB(
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
        entity_sizes={entity2id[n]: int(counts[i]) for i, (n, _, _) in enumerate(names)},
        kp_df=kp_df,
        kw_df=kw_df,
        inlinks=inlinks,
        entity_rank=entity_rank,
        collection_size=max(1000 * n_entities, 1_000_000),
    )
    kb.finalize()
    # corpus-generation side data (not persisted)
    kb._names = names                      # type: ignore[attr-defined]
    kb._keyphrase_words = entity_keyphrase_words  # type: ignore[attr-defined]
    return kb
