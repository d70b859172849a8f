"""Synthetic Common-Crawl-style pages corpus (input_hint shape).

Writes parquet tables:

    pages(url:string, warc_ts:timestamp[ms], html:binary, text:string, lang:string)
    gold(url:string, mention:string, begin:int32, len:int32, entity:string)

Pages are generated from a synthetic KB (aida_ray.kb.synth): each page
mentions 2-6 entities of one coherence cluster, mixing unambiguous
full-name surfaces with ambiguous last-name surfaces, and embeds the
intended entity's keyphrase words as context so the disambiguation
pipeline has signal.  ``text`` is byte-identical to
``extract_text(html)`` by construction (the per-row invariant).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aida_ray.kb.kb import KB
from aida_ray.text.extract import wrap_text_as_html
from aida_ray.text.tokenizer import conflate_token

EPOCH_MS = 1400000000000  # fixed base crawl timestamp


def generate_pages(kb: KB, n_pages: int, seed: int = 42,
                   ambiguous_ratio: float = 0.45,
                   shard: int = 0) -> tuple[pa.Table, pa.Table]:
    """Build (pages, gold) arrow tables. Deterministic per (seed, shard)."""
    names = kb._names                     # type: ignore[attr-defined]
    kp_words = kb._keyphrase_words        # type: ignore[attr-defined]
    n_entities = len(names)
    n_clusters = max(1, n_entities // 8)
    by_cluster: dict[int, list[int]] = {}
    for i in range(n_entities):
        by_cluster.setdefault(i % n_clusters, []).append(i)

    rng = np.random.default_rng(seed * 1_000_003 + shard)
    urls, texts, htmls, tss, langs = [], [], [], [], []
    g_url, g_mention, g_begin, g_len, g_entity = [], [], [], [], []

    for p in range(n_pages):
        cluster = int(rng.integers(0, n_clusters))
        members = by_cluster[cluster]
        k = min(len(members), int(rng.integers(2, 7)))
        chosen = rng.choice(len(members), size=k, replace=False)
        url = f"http://crawl.test/{shard}/{p}"
        parts: list[str] = []
        pos = 0
        gold_here: list[tuple[str, int, int, str]] = []

        def emit(s: str) -> None:
            nonlocal pos
            parts.append(s)
            pos += len(s)

        for j, ci in enumerate(chosen):
            i = members[int(ci)]
            name, first, last = names[i]
            eid = kb.entity2id[name]
            # surface: full name first time, maybe ambiguous later
            if j > 0 and rng.random() < ambiguous_ratio and \
                    conflate_token(last) in kb.dictionary:
                surface = last
            else:
                surface = f"{first} {last}"
            words = kp_words.get(eid) or ["thing"]
            ctx1 = words[int(rng.integers(0, len(words)))]
            ctx2 = words[int(rng.integers(0, len(words)))]
            if j > 0:
                emit(" ")
            sent = f"The story of {surface} involves {ctx1} and {ctx2}."
            emit(sent)
            begin = pos - len(sent) + len("The story of ")
            gold_here.append((surface, begin, len(surface), name))
        text = "".join(parts)
        urls.append(url)
        texts.append(text)
        htmls.append(wrap_text_as_html(text))
        tss.append(EPOCH_MS + (shard * 1_000_000 + p) * 1000)
        langs.append("en")
        for surface, begin, ln, ent in gold_here:
            g_url.append(url); g_mention.append(surface)
            g_begin.append(begin); g_len.append(ln); g_entity.append(ent)

    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("ms")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    gold = pa.table({
        "url": pa.array(g_url, pa.string()),
        "mention": pa.array(g_mention, pa.string()),
        "begin": pa.array(g_begin, pa.int32()),
        "len": pa.array(g_len, pa.int32()),
        "entity": pa.array(g_entity, pa.string()),
    })
    return pages, gold


def write_corpus(out_dir: str, kb: KB, n_pages: int, seed: int = 42,
                 n_shards: int = 1) -> dict[str, str]:
    """Write pages/gold parquet (one file per shard for resumable reads).

    Atomic: shards are written to a temp dir and renamed into place at
    the end, so an interrupted run never leaves a partial corpus that a
    cache check would mistake for complete.
    """
    import shutil

    pages_dir = os.path.join(out_dir, "pages")
    gold_dir = os.path.join(out_dir, "gold")
    tmp_pages, tmp_gold = pages_dir + ".tmp", gold_dir + ".tmp"
    for d in (tmp_pages, tmp_gold):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    per = n_pages // n_shards
    for s in range(n_shards):
        n = per + (n_pages - per * n_shards if s == n_shards - 1 else 0)
        pages, gold = generate_pages(kb, n, seed=seed, shard=s)
        pq.write_table(pages, os.path.join(tmp_pages, f"shard-{s:05d}.parquet"))
        pq.write_table(gold, os.path.join(tmp_gold, f"shard-{s:05d}.parquet"))
    for tmp, final in ((tmp_pages, pages_dir), (tmp_gold, gold_dir)):
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
    return {"pages": pages_dir, "gold": gold_dir}
