"""Sharded keyphrase-index scoring — the beyond-node-RAM KB path.

DESIGN.md §2: when `entity_keyphrases` outgrows actor memory, split the
keyphrase index into R shards by entity id; scorer actors each pin ONE
shard and compute raw keyphrase scores only for candidates they own;
a per-document merge reassembles the full score table and runs the
graph solver with the (small) keyphrase-free core KB.

    pages ─ map_batches(route, core KB: prepare ONCE) ─▶
        per-owning-shard rows (url, shard, prepared payload)
        + one merge row per doc (shard = -1, prepared payload)
      ─ per-shard actor pools (shard KB) ─▶ (mention_idx, eid, raw score)
        rows — NO text, NO payload echo, NO re-tokenization
      ─ groupby(url).map_groups(merge+solve, core KB) ─▶ triples

Exactness: raw scores per (mention, candidate) are computed by exactly
one shard with the same matcher semantics as the unsharded path, and
missing pairs default to 0.0 (identical to an unmatched candidate), so
decisions and scores are bit-equal to the single-KB pipeline
(tested in tests/test_sharded.py).

Scale notes: each document is tokenized + candidate-looked-up exactly
once (in the router); what ships through the shuffle is the compact
prepared form (token ids + mention spans + candidate ids — no page
text), replicated only to shards owning >= 1 candidate (typically 1-3
of R) plus one merge copy; the merge groupby's key is the url
(unskewed) and the merge kernel is vectorized numpy over the score
columns (no per-row pandas iteration).
"""

from __future__ import annotations

import copy
import pickle

import numpy as np
import pyarrow as pa

import ray
import ray.data

from aida_ray.kb.kb import OOKBE, KB
from aida_ray.ned.disambiguator import prepare_document, solve_prepared
from aida_ray.ned.doc import PreparedDoc
from aida_ray.ned.settings import DisambiguationSettings
from aida_ray.ned.similarity import DocMatcher, score_matches
from aida_ray.state.broadcast import resolve

KINDS = ("mi", "idf")


def kb_core(kb: KB) -> KB:
    """Keyphrase-free KB view: dictionary, priors, ranks, types, inlinks,
    id maps — everything the router and the graph solver need, none of
    the heavy keyphrase index."""
    core = copy.copy(kb)
    core.entity_kps = {}
    core.kp_tokens = {}
    core.e_kp_count = {}
    core.e_kw_count = {}
    core.kw_mi = {}
    core.entity_keywords = {}
    core._mw_cache = {}
    return core


def kb_shard(kb: KB, shard: int, n_shards: int) -> KB:
    """Keyphrase index restricted to entities with eid % n_shards == shard.

    The dictionary/word tables stay whole (they are the small side and
    every shard needs them for identical mention detection)."""
    sub = copy.copy(kb)
    sub.entity_kps = {e: v for e, v in kb.entity_kps.items()
                      if e % n_shards == shard}
    sub.e_kp_count = {e: v for e, v in kb.e_kp_count.items()
                      if e % n_shards == shard}
    sub.e_kw_count = {e: v for e, v in kb.e_kw_count.items()
                      if e % n_shards == shard}
    sub.kw_mi = {e: v for e, v in kb.kw_mi.items() if e % n_shards == shard}
    sub.entity_keywords = {e: v for e, v in kb.entity_keywords.items()
                           if e % n_shards == shard}
    sub._mw_cache = {}
    return sub


def _pack_doc(doc: PreparedDoc) -> bytes:
    """Compact prepared form: token ids + mentions (spans, candidates,
    priors).  Raw text and Token objects are dropped — nothing downstream
    of the router needs them (the matcher uses token_ids; the solver uses
    mention metadata)."""
    slim = PreparedDoc(doc_id=doc.doc_id, text="", tokens=[],
                       token_ids=doc.token_ids, mentions=doc.mentions)
    return pickle.dumps(slim, protocol=pickle.HIGHEST_PROTOCOL)


_SCORE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("ms")),
    ("shard", pa.int32()),
    ("mention_idx", pa.int32()),
    ("eid", pa.int64()),
    ("raw_mi", pa.float64()),
    ("raw_idf", pa.float64()),
    ("prep", pa.binary()),
])


def _route_batch(batch: pa.Table, core_ref, settings, n_shards: int) -> pa.Table:
    """Stage A: prepare each page ONCE; emit the compact prepared payload
    to every shard owning >= 1 candidate, plus one merge row (shard=-1)."""
    kb = resolve(core_ref)
    urls, texts = batch["url"].to_pylist(), batch["text"].to_pylist()
    tss = batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names \
        else [None] * len(urls)
    out = {"url": [], "warc_ts": [], "shard": [], "prep": []}
    for url, text, ts in zip(urls, texts, tss):
        doc = prepare_document(url, text, kb, settings)
        payload = _pack_doc(doc)
        shards = {eid % n_shards for m in doc.mentions
                  for eid, _ in m.candidates}
        for s in sorted(shards):
            out["url"].append(url)
            out["warc_ts"].append(ts)
            out["shard"].append(s)
            out["prep"].append(payload)
        # merge row: carries the doc to the solver even when no shard
        # owns a candidate (all-OOKBE documents)
        out["url"].append(url)
        out["warc_ts"].append(ts)
        out["shard"].append(-1)
        out["prep"].append(payload)
    return pa.table({"url": pa.array(out["url"], pa.string()),
                     "warc_ts": pa.array(out["warc_ts"], pa.timestamp("ms")),
                     "shard": pa.array(out["shard"], pa.int32()),
                     "prep": pa.array(out["prep"], pa.binary())})


class ShardScorer:
    """Stage B actor: pins one keyphrase shard; consumes prepared docs
    (no re-tokenization) and emits raw scores for the (mention,
    candidate) pairs its shard owns."""

    def __init__(self, shard_ref, settings: DisambiguationSettings,
                 shard: int, n_shards: int):
        self.kb = resolve(shard_ref)
        self.settings = settings
        self.shard = shard
        self.n_shards = n_shards

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"url": [], "warc_ts": [], "mention_idx": [],
               "eid": [], "raw_mi": [], "raw_idf": []}
        for url, ts, payload in zip(batch["url"].to_pylist(),
                                    batch["warc_ts"].to_pylist(),
                                    batch["prep"].to_pylist()):
            doc = pickle.loads(payload)
            matcher = DocMatcher(self.kb, doc)
            for mi_, m in enumerate(doc.mentions):
                for eid, _ in m.candidates:
                    if eid % self.n_shards != self.shard:
                        continue
                    matches = matcher.matches(mi_, m, eid)
                    out["url"].append(url)
                    out["warc_ts"].append(ts)
                    out["mention_idx"].append(mi_)
                    out["eid"].append(eid)
                    out["raw_mi"].append(
                        score_matches(self.kb, eid, matches, "mi"))
                    out["raw_idf"].append(
                        score_matches(self.kb, eid, matches, "idf"))
        n = len(out["url"])
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "warc_ts": pa.array(out["warc_ts"], pa.timestamp("ms")),
            "shard": pa.array([self.shard] * n, pa.int32()),
            "mention_idx": pa.array(out["mention_idx"], pa.int32()),
            "eid": pa.array(out["eid"], pa.int64()),
            "raw_mi": pa.array(out["raw_mi"], pa.float64()),
            "raw_idf": pa.array(out["raw_idf"], pa.float64()),
            "prep": pa.array([b""] * n, pa.binary()),
        }, schema=_SCORE_SCHEMA)


def link_pages_sharded(pages: ray.data.Dataset, kb: KB,
                       settings: DisambiguationSettings | None = None,
                       n_shards: int = 4,
                       concurrency: int = 2,
                       batch_size: int = 32) -> ray.data.Dataset:
    """Sharded-KB NED: returns the same triple rows as ``link_pages``."""
    settings = settings or DisambiguationSettings()
    core_ref = ray.put(kb_core(kb))
    routed = pages.map_batches(
        _route_batch, batch_format="pyarrow", batch_size=batch_size,
        fn_kwargs={"core_ref": core_ref, "settings": settings,
                   "n_shards": n_shards})
    # one actor pool per shard, each filtering its rows (at scale:
    # repartition by shard first so filters see only their blocks)
    scored_parts = []
    for s in range(n_shards):
        shard_ref = ray.put(kb_shard(kb, s, n_shards))
        part = routed.filter(expr=f"shard == {s}").map_batches(
            ShardScorer, batch_format="pyarrow", batch_size=batch_size,
            fn_constructor_kwargs={"shard_ref": shard_ref,
                                   "settings": settings,
                                   "shard": s, "n_shards": n_shards},
            concurrency=concurrency, num_cpus=1)
        scored_parts.append(part)

    def to_merge_row(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "url": b["url"], "warc_ts": b["warc_ts"], "shard": b["shard"],
            "mention_idx": pa.array([-1] * n, pa.int32()),
            "eid": pa.array([-1] * n, pa.int64()),
            "raw_mi": pa.array([0.0] * n, pa.float64()),
            "raw_idf": pa.array([0.0] * n, pa.float64()),
            "prep": b["prep"],
        }, schema=_SCORE_SCHEMA)

    merge_rows = routed.filter(expr="shard == -1").map_batches(
        to_merge_row, batch_format="pyarrow")
    scored = merge_rows.union(*scored_parts)

    def merge_and_solve(group):
        import pandas as pd
        core = resolve(core_ref)
        url = group["url"].iloc[0]
        mi_idx = group["mention_idx"].to_numpy()
        doc_rows = np.flatnonzero(mi_idx < 0)
        payload = group["prep"].iloc[doc_rows[0]]
        ts = group["warc_ts"].iloc[doc_rows[0]]
        doc = pickle.loads(payload)
        mask = mi_idx >= 0
        keys = list(zip(mi_idx[mask].tolist(),
                        group["eid"].to_numpy()[mask].tolist()))
        raw = {"mi": dict(zip(keys, group["raw_mi"].to_numpy()[mask].tolist())),
               "idf": dict(zip(keys, group["raw_idf"].to_numpy()[mask].tolist()))}
        results = solve_prepared(doc, core, settings,
                                 settings.hill_climbing_seed, raw_scores=raw)
        rows = {"subj": [], "pred": [], "obj": [], "url": [],
                "warc_ts": [], "score": []}
        linked = [r for r in results if r.entity != OOKBE]
        for r in linked:
            rows["subj"].append(r.entity)
            rows["pred"].append("mentionedIn")
            rows["obj"].append(url)
            rows["url"].append(url)
            rows["warc_ts"].append(ts)
            rows["score"].append(r.score)
        by_sentence: dict[int, list] = {}
        for r in linked:
            by_sentence.setdefault(r.sentence, []).append(r)
        seen = set()
        for _sent, rs in sorted(by_sentence.items()):
            ents = sorted({r.entity for r in rs})
            for i in range(len(ents)):
                for j in range(i + 1, len(ents)):
                    if (ents[i], ents[j]) in seen:
                        continue
                    seen.add((ents[i], ents[j]))
                    s1 = min(r.score for r in rs if r.entity == ents[i])
                    s2 = min(r.score for r in rs if r.entity == ents[j])
                    rows["subj"].append(ents[i])
                    rows["pred"].append("coOccursWith")
                    rows["obj"].append(ents[j])
                    rows["url"].append(url)
                    rows["warc_ts"].append(ts)
                    rows["score"].append(min(s1, s2))
        return pd.DataFrame(rows)

    return scored.groupby("url").map_groups(merge_and_solve,
                                            batch_format="pandas")
