"""Test-fixture KB — a port of the reference's in-memory testing backend.

All data literals correspond 1:1 to
src/mpi/aida/access/DataAccessForTesting.java:43-105 (entities,
keyphrases + intersection counts, superdoc sizes, keyphrase document
frequencies, inlinks) and :232-279 (candidate sets, ranks) and
:420-443 (priors).  Word/entity id assignment follows the same
insertion order (:167-224) so ids line up with the reference.
"""

from __future__ import annotations

import numpy as np

from aida_ray.kb.kb import KB, OOKBE

TOTAL_ENTITY_COUNT = 2651987  # DataAccessForTesting.java:43

# entity, then (keyphrase, intersection-count) pairs.
ENTITY_KEYPHRASES: list[tuple[str, list[tuple[str, int]]]] = [
    ("Larry_Page", [("Google", 2)]),
    ("Jimmy_Page", [("played", 10), ("Les Paul", 4), ("tuned", 1),
                    ("Led Zeppelin", 5), ("Robert Plant", 9), ("Rock music", 2)]),
    ("Nomatching_Page", [("Page", 5)]),
    ("Stopword_Page", [("and the", 2)]),
    ("Kashmir", [("China", 10)]),
    ("Kashmir_(song)", [("Jimmy Page", 5), ("festival", 2),
                        ("Led Zeppelin", 3), ("Robert Plant", 5)]),
    ("Knebworth_Festival", [("festival", 1), ("Rock music", 2)]),
]

ENTITY_SIZES = {
    "Larry_Page": 20, "Jimmy_Page": 10, "Nomatching_Page": 5, "Stopword_Page": 2,
    "Kashmir": 15, "Kashmir_(song)": 5, "Knebworth_Festival": 2,
}

ORDERED_ENTITIES = ["Larry_Page", "Jimmy_Page", "Nomatching_Page", "Stopword_Page",
                    "Kashmir", "Kashmir_(song)", "Knebworth_Festival"]

KEYPHRASE_FREQUENCIES = {
    "Google": 50, "played": 100, "Les Paul": 80, "tuned": 20, "China": 200,
    "Jimmy Page": 30, "festival": 10, "Led Zeppelin": 40, "Robert Plant": 25,
    "Rock music": 30, "and the": 5,
}

INLINKS = {
    "Larry_Page": ["Google"],
    "Jimmy_Page": ["Led_Zeppelin", "Robert_Plant", "Rock", "Les_Paul"],
    "Kashmir": ["China", "India", "Pakistan"],
    "Kashmir_(song)": ["Led_Zeppelin", "Robert_Plant", "Jimmy_Page"],
    "Knebworth_Festival": ["England", "Music_Festival", "Led_Zeppelin"],
}

# conflated mention surface -> [(entity name, prior)]
# (DataAccessForTesting.java:232-262 and :420-443)
DICTIONARY = {
    "PAGE": [("Jimmy_Page", 0.3), ("Larry_Page", 0.7)],
    "KASHMIR": [("Kashmir", 0.9), ("Kashmir_(song)", 0.1)],
    "KNEBWORTH": [("Knebworth_Festival", 1.0)],
    "LES PAUL": [],
}


def build_fixture_kb() -> KB:
    entity2id: dict[str, int] = {}
    next_eid = [1]

    def add_entity(name: str) -> None:
        if name not in entity2id:
            entity2id[name] = next_eid[0]
            next_eid[0] += 1

    add_entity(OOKBE)
    for name, _ in ENTITY_KEYPHRASES:
        add_entity(name)
    for links in INLINKS.values():
        for t in links:
            add_entity(t)

    word2id: dict[str, int] = {}
    expansions: dict[int, int] = {}
    next_wid = [1]

    def add_word(word: str) -> int:
        # Mirrors DataAccessForTesting.addWord:206-224 (word then its
        # ALL-CAPS expansion get consecutive ids).
        if word in word2id:
            return word2id[word]
        wid = next_wid[0]
        next_wid[0] += 1
        word2id[word] = wid
        upper = word.upper()
        if upper in word2id:
            up_id = word2id[upper]
        else:
            up_id = next_wid[0]
            word2id[upper] = up_id
            next_wid[0] += 1
        expansions[wid] = up_id
        return wid

    entity_kps: dict[int, list[int]] = {}
    kp_tokens: dict[int, tuple[int, ...]] = {}
    e_kp_count: dict[int, dict[int, int]] = {}
    e_kw_count: dict[int, dict[int, int]] = {}
    for name, kps in ENTITY_KEYPHRASES:
        eid = entity2id[name]
        kp_ids: list[int] = []
        kpc: dict[int, int] = {}
        kwc: dict[int, int] = {}
        for kp, count in kps:
            kp_id = add_word(kp)
            tok_ids = tuple(add_word(t) for t in kp.split(" "))
            kp_tokens[kp_id] = tok_ids
            kp_ids.append(kp_id)
            kpc[kp_id] = count
            for t in tok_ids:
                kwc[t] = kwc.get(t, 0) + count
        entity_kps[eid] = kp_ids
        e_kp_count[eid] = kpc
        e_kw_count[eid] = kwc

    kp_df: dict[int, int] = {}
    kw_df: dict[int, int] = {}
    for kp, freq in KEYPHRASE_FREQUENCIES.items():
        kp_df[add_word(kp)] = freq
        for t in kp.split(" "):
            kw_df[add_word(t)] = freq

    dictionary = {
        m: [(entity2id[e], p) for (e, p) in eps] for m, eps in DICTIONARY.items()
    }
    inlinks = {
        entity2id[e]: np.asarray(sorted(entity2id[t] for t in links), dtype=np.int64)
        for e, links in INLINKS.items()
    }
    entity_rank = {
        entity2id[e]: i / len(ORDERED_ENTITIES) for i, e in enumerate(ORDERED_ENTITIES)
    }

    entity_types = {
        entity2id[e]: frozenset(ts) for e, ts in {
            "Larry_Page": ["PERSON"], "Jimmy_Page": ["PERSON"],
            "Nomatching_Page": ["PERSON"], "Stopword_Page": ["PERSON"],
            "Kashmir": ["LOCATION"], "Kashmir_(song)": ["ARTIFACT"],
            "Knebworth_Festival": ["EVENT"],
        }.items()
    }
    kb = KB(
        entity2id=entity2id,
        entity_types=entity_types,
        id2entity={v: k for k, v in entity2id.items()},
        word2id=word2id,
        id2word={v: k for k, v in word2id.items()},
        expansions=expansions,
        dictionary=dictionary,
        entity_kps=entity_kps,
        kp_tokens=kp_tokens,
        e_kp_count=e_kp_count,
        e_kw_count=e_kw_count,
        entity_sizes={entity2id[e]: s for e, s in ENTITY_SIZES.items()},
        kp_df=kp_df,
        kw_df=kw_df,
        inlinks=inlinks,
        entity_rank=entity_rank,
        collection_size=TOTAL_ENTITY_COUNT,
    )
    return kb.finalize()
