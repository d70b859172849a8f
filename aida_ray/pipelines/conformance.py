"""CoNLL-style conformance corpus + P/R gate (FIXTURES.md §3).

Generates an AIDA-collection TSV corpus from the synthetic KB (gold
entities known by construction), splits it train/dev/testb with the
CoNLL-YAGO proportions, runs the full pipeline on the testb slice, and
scores P/R of the emitted entity links against gold — the in-sandbox
realization of "P/R >= 0.95 vs reference decisions on CoNLL-YAGO
testb-style gold annotations" (BASELINE.json:metric).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from aida_ray.kb.kb import KB
from aida_ray.ned.disambiguator import disambiguate_document
from aida_ray.ned.settings import DisambiguationSettings
from aida_ray.pipelines.eval import PRResult, precision_recall
from aida_ray.sources.conll_tsv import (ConllDoc, ConllMention,
                                        parse_conll_tsv,
                                        train_dev_test_split,
                                        write_conll_tsv)


def generate_conll_corpus(kb: KB, n_docs: int, seed: int = 42) -> str:
    """Deterministic CoNLL-style TSV with token-aligned gold mentions."""
    names = kb._names                     # type: ignore[attr-defined]
    kp_words = kb._keyphrase_words        # type: ignore[attr-defined]
    n_entities = len(names)
    n_clusters = max(1, n_entities // 8)
    by_cluster: dict[int, list[int]] = {}
    for i in range(n_entities):
        by_cluster.setdefault(i % n_clusters, []).append(i)
    rng = np.random.default_rng(seed * 31337)
    docs: list[ConllDoc] = []
    for d in range(n_docs):
        cluster = int(rng.integers(0, n_clusters))
        members = by_cluster[cluster]
        k = min(len(members), int(rng.integers(2, 6)))
        chosen = rng.choice(len(members), size=k, replace=False)
        parts: list[str] = []
        mentions: list[ConllMention] = []
        pos = 0
        for j, ci in enumerate(chosen):
            i = members[int(ci)]
            name, first, last = names[i]
            eid = kb.entity2id[name]
            from aida_ray.text.tokenizer import conflate_token
            if j > 0 and rng.random() < 0.4 and conflate_token(last) in kb.dictionary:
                surface = last
            else:
                surface = f"{first} {last}"
            words = kp_words.get(eid) or ["thing"]
            ctx = words[int(rng.integers(0, len(words)))]
            prefix = "Reports about " if j == 0 else "Later "
            sent = f"{prefix}{surface} mention {ctx} ."
            if parts:
                parts.append("\n")
                pos += 1
            begin = pos + len(prefix)
            parts.append(sent)
            mentions.append(ConllMention(surface, begin, len(surface), name, "PER"))
            pos += len(sent)
        # ~20% of docs carry an out-of-KB gold mention (--NME--), like the
        # reference corpora; the NIL-aware eval must not penalize it
        if rng.random() < 0.2:
            nil_surface = f"Zyxq {int(rng.integers(0, 999))}"
            sent = f"\nAlso {nil_surface} appeared ."
            begin = pos + len("\nAlso ")
            parts.append(sent)
            mentions.append(ConllMention(nil_surface, begin, len(nil_surface),
                                         "--NME--", "MISC"))
            pos += len(sent)
        docs.append(ConllDoc(f"doc{d}", "2014-05-13", "".join(parts), mentions))
    return write_conll_tsv(docs)


def run_conformance(kb: KB, n_docs: int = 300, seed: int = 42,
                    settings: DisambiguationSettings | None = None,
                    split: str = "testb") -> tuple[PRResult, pa.Table]:
    """TSV → parse → pipeline on the requested split → P/R vs gold."""
    tsv = generate_conll_corpus(kb, n_docs, seed)
    docs = train_dev_test_split(parse_conll_tsv(tsv))[split]
    p_url, p_m, p_b, p_l, p_e = [], [], [], [], []
    g_url, g_m, g_b, g_l, g_e = [], [], [], [], []
    for d in docs:
        url = f"conll://{d.doc_id}"
        for r in disambiguate_document(url, d.text, kb, settings):
            p_url.append(url); p_m.append(r.mention)
            p_b.append(r.char_offset); p_l.append(r.char_length)
            p_e.append(r.entity)
        for m in d.mentions:
            g_url.append(url); g_m.append(m.mention)
            g_b.append(m.begin); g_l.append(m.length)
            g_e.append(m.gold_entity)
    pred = pa.table({"url": p_url, "mention": p_m, "begin": p_b,
                     "len": p_l, "entity": p_e})
    gold = pa.table({"url": g_url, "mention": g_m, "begin": g_b,
                     "len": g_l, "entity": g_e})
    return precision_recall(pred, gold), pred
