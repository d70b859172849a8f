"""Sharded keyphrase-index scoring — the beyond-node-RAM KB path.

DESIGN.md §2: when `entity_keyphrases` outgrows actor memory, split the
keyphrase index into R shards by entity id; scorer actors each pin ONE
shard and compute raw keyphrase scores only for candidates they own;
a final stateless stage assembles the full score table and runs the
graph solver with the (small) keyphrase-free core KB.

    pages ─▶ ChainScorer pool (route + shard group 0) ─▶ ...
         ─▶ ChainScorer pool (shard group G-1 + solve) ─▶ triples

Topology: a CHAIN of actor pools — no shuffle, no union, no merge
groupby.  The streaming executor pipelines all stages; each batch
visits each shard group's pool exactly once.  The router (prepare
once, build the inverted index) is FOLDED into the first pool and the
graph solve into the last (``fold_endpoints``), so the prepared
payload ships G-1 times rather than G+1 and is pickled/unpickled once
rather than G+1 times; with one grouped pool it never leaves the
actor at all.  (An earlier fan-out/union/groupby(url) topology spent
more wall time in the 5-way union's tiny-block sort than in scoring;
the earlier unfolded chain spent ~40% of wall in endpoint hops.)

Exactness: raw scores per (mention, candidate) are computed by exactly
one shard with the same matcher semantics as the unsharded path, and
missing pairs default to 0.0 (identical to an unmatched candidate), so
decisions and scores are bit-equal to the single-KB pipeline
(tested in tests/test_sharded.py).

Scale notes: each document is tokenized + candidate-looked-up + indexed
exactly once (in the router); the compact prepared form (token ids +
mention spans + candidate ids + inverted index — no page text) rides
the chain, so total traffic is R+1 payload hops with no all-to-all
anywhere; chain depth = n_shards, so group several logical shards per
pool when R would exceed the cluster width.
"""

from __future__ import annotations

import copy
import pickle

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


def kb_shard(kb: KB, shard: int | tuple | frozenset, n_shards: int) -> KB:
    """Keyphrase index restricted to entities with eid % n_shards in the
    given shard (an int, or a group of logical shards for one pool —
    chain depth then shrinks to n_shards/shards_per_pool at
    proportionally larger per-actor memory).

    The dictionary/word tables stay whole (they are the small side and
    every shard needs them for identical mention detection)."""
    ss = {shard} if isinstance(shard, int) else set(shard)
    sub = copy.copy(kb)
    sub.entity_kps = {e: v for e, v in kb.entity_kps.items()
                      if e % n_shards in ss}
    sub.e_kp_count = {e: v for e, v in kb.e_kp_count.items()
                      if e % n_shards in ss}
    sub.e_kw_count = {e: v for e, v in kb.e_kw_count.items()
                      if e % n_shards in ss}
    sub.kw_mi = {e: v for e, v in kb.kw_mi.items() if e % n_shards in ss}
    sub.entity_keywords = {e: v for e, v in kb.entity_keywords.items()
                           if e % n_shards in ss}
    sub._mw_cache = {}
    return sub


def _pack_doc(doc: PreparedDoc, kb: KB) -> bytes:
    """Compact prepared form: token ids + mentions (spans, candidates,
    priors) + the prebuilt inverted index.  Raw text and Token objects
    are dropped — nothing downstream of the router needs them (the
    matcher uses the index; the solver uses mention metadata).  Shipping
    the index saves each owning shard an O(tokens) rebuild."""
    from aida_ray.ned.context import InvertedIndex
    slim = PreparedDoc(doc_id=doc.doc_id, text="", tokens=[],
                       token_ids=doc.token_ids, mentions=doc.mentions)
    index = InvertedIndex(doc.token_ids, kb.stop_ids)
    return pickle.dumps((slim, index), protocol=pickle.HIGHEST_PROTOCOL)


class ChainScorer:
    """One link of the scorer chain: pins ONE keyphrase shard, appends
    raw scores for the (mention, candidate) pairs it owns to the batch's
    accumulator list-columns, passes the batch on.  No shuffle, no
    union — the batch streams through R pools then a stateless solve.

    ``do_route`` folds the router into this (first) pool: raw pages in,
    documents prepared in-process — objects are scored directly and
    pickled ONLY if the batch must ship to a next pool.  ``do_solve``
    folds the graph solve into this (last) pool: triples out, no solve
    hop, no extra unpickle.  With both set (one pool) the payload never
    touches the object store between stages at all.  The fold removes
    two chained operators and two pickle round-trips per document vs
    the unfolded route→scorers→solve topology while computing the
    same rows (equality pinned in tests/test_sharded.py)."""

    def __init__(self, shard_ref, settings: DisambiguationSettings,
                 shard: int | tuple | frozenset, n_shards: int,
                 do_route: bool = False, do_solve: bool = False,
                 core_ref=None):
        self.kb = resolve(shard_ref)
        self.core = resolve(core_ref) if core_ref is not None else self.kb
        self.settings = settings
        self.shards = {shard} if isinstance(shard, int) else set(shard)
        self.n_shards = n_shards
        self.do_route = do_route
        self.do_solve = do_solve

    def __call__(self, batch: pa.Table) -> pa.Table:
        from aida_ray.ned.context import InvertedIndex
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        if self.do_route:
            tss = batch["warc_ts"].to_pylist() \
                if "warc_ts" in batch.column_names else [None] * n
            docs = []
            for url, text in zip(urls, batch["text"].to_pylist()):
                doc = prepare_document(url, text, self.kb, self.settings)
                docs.append((doc, InvertedIndex(doc.token_ids,
                                                self.kb.stop_ids)))
            acc = ([[] for _ in range(n)], [[] for _ in range(n)],
                   [[] for _ in range(n)], [[] for _ in range(n)])
        else:
            tss = batch["warc_ts"].to_pylist()
            docs = [pickle.loads(p) for p in batch["prep"].to_pylist()]
            acc = ([list(x) for x in batch["acc_mention_idx"].to_pylist()],
                   [list(x) for x in batch["acc_eid"].to_pylist()],
                   [list(x) for x in batch["acc_raw_mi"].to_pylist()],
                   [list(x) for x in batch["acc_raw_idf"].to_pylist()])
        mi_col, eid_col, rmi_col, ridf_col = acc
        sim = self.settings.similarity
        for row_i, (doc, index) in enumerate(docs):
            # carry the Fast-settings keyphrase pruning — the sharded
            # path must score exactly like the single-KB matcher
            matcher = DocMatcher(self.kb, doc, index=index,
                                 max_kp=sim.max_entity_keyphrase_count,
                                 min_kp_weight=sim.min_entity_keyphrase_weight)
            for mi_, m in enumerate(doc.mentions):
                for eid, _ in m.candidates:
                    if eid % self.n_shards not in self.shards:
                        continue
                    matches = matcher.matches(mi_, m, eid)
                    mi_col[row_i].append(mi_)
                    eid_col[row_i].append(eid)
                    rmi_col[row_i].append(
                        score_matches(self.kb, eid, matches, "mi"))
                    ridf_col[row_i].append(
                        score_matches(self.kb, eid, matches, "idf"))
        if self.do_solve:
            return _solve_rows(urls, tss, [d for d, _ in docs],
                               mi_col, eid_col, rmi_col, ridf_col,
                               self.core, self.settings)
        if "prep" in batch.column_names:
            preps = batch["prep"]
        else:
            # ship the SLIM form (token ids + mentions + index), never
            # raw text/Token objects — same payload the router packs
            preps = pa.array(
                [pickle.dumps(
                    (PreparedDoc(doc_id=d.doc_id, text="", tokens=[],
                                 token_ids=d.token_ids,
                                 mentions=d.mentions), idx),
                    protocol=pickle.HIGHEST_PROTOCOL)
                 for d, idx in docs], pa.binary())
        return pa.table({
            "url": batch["url"],
            "warc_ts": pa.array(tss, pa.timestamp("ms")),
            "prep": preps,
            "acc_mention_idx": pa.array(mi_col, pa.list_(pa.int32())),
            "acc_eid": pa.array(eid_col, pa.list_(pa.int64())),
            "acc_raw_mi": pa.array(rmi_col, pa.list_(pa.float64())),
            "acc_raw_idf": pa.array(ridf_col, pa.list_(pa.float64())),
        })


class DiskChainScorer(ChainScorer):
    """ChainScorer whose keyphrase shard loads from PARQUET in
    ``__init__`` (the DMap analogue, kb/diskkb.py): per-actor resident
    KB = broadcast core + |keyphrase index|/n_shards read from disk —
    the full pickled KB never ships to scorer actors."""

    def __init__(self, core_ref, kb_dir: str,
                 settings: DisambiguationSettings,
                 shard: int | tuple | frozenset, n_shards: int,
                 do_route: bool = False, do_solve: bool = False):
        from aida_ray.kb.diskkb import load_kb_shard
        group = (shard,) if isinstance(shard, int) else tuple(shard)
        kb = load_kb_shard(resolve(core_ref), kb_dir, group)
        super().__init__(kb, settings, shard, n_shards,
                         do_route=do_route, do_solve=do_solve)


def _solve_rows(urls, tss, docs, mi_col, eid_col, rmi_col, ridf_col,
                core, settings) -> pa.Table:
    """Graph solve over per-doc accumulated raw scores → triple rows
    (shared by the folded last-pool path and the standalone stage)."""
    rows = {"subj": [], "pred": [], "obj": [], "url": [],
            "warc_ts": [], "score": []}
    for row_i, doc in enumerate(docs):
        url, ts = urls[row_i], tss[row_i]
        keys = list(zip(mi_col[row_i], eid_col[row_i]))
        raw = {"mi": dict(zip(keys, rmi_col[row_i])),
               "idf": dict(zip(keys, ridf_col[row_i]))}
        results = solve_prepared(doc, core, settings,
                                 settings.hill_climbing_seed, raw_scores=raw)
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
    return pa.table({
        "subj": pa.array(rows["subj"], pa.string()),
        "pred": pa.array(rows["pred"], pa.string()),
        "obj": pa.array(rows["obj"], pa.string()),
        "url": pa.array(rows["url"], pa.string()),
        "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("ms")),
        "score": pa.array(rows["score"], pa.float64()),
    })


def _solve_batch(batch: pa.Table, core_ref, settings) -> pa.Table:
    """Final stateless stage (unfolded topology): all shards have
    appended their scores — unpickle and run the graph solver."""
    core = resolve(core_ref)
    pairs = [pickle.loads(p) for p in batch["prep"].to_pylist()]
    return _solve_rows(batch["url"].to_pylist(),
                       batch["warc_ts"].to_pylist(),
                       [d for d, _ in pairs],
                       batch["acc_mention_idx"].to_pylist(),
                       batch["acc_eid"].to_pylist(),
                       batch["acc_raw_mi"].to_pylist(),
                       batch["acc_raw_idf"].to_pylist(),
                       core, settings)


def build_shard_refs(kb: KB, n_shards: int,
                     shards_per_pool: int = 1):
    """Serialize the core KB and each shard group into the object store
    ONCE — pass the result to ``link_pages_sharded`` when running many
    pipelines over the same KB (e.g. run_kg's partition loop), instead
    of re-putting multi-GB KB subsets per pipeline."""
    groups = [tuple(range(s, min(s + shards_per_pool, n_shards)))
              for s in range(0, n_shards, shards_per_pool)]
    return (ray.put(kb_core(kb)),
            [(g, ray.put(kb_shard(kb, g, n_shards))) for g in groups])


def link_pages_sharded(pages: ray.data.Dataset, kb: KB,
                       settings: DisambiguationSettings | None = None,
                       n_shards: int = 4,
                       concurrency: int = 2,
                       batch_size: int = 32,
                       shards_per_pool: int = 1,
                       prebuilt_refs=None,
                       kb_dir: str | None = None,
                       fold_endpoints: bool = True) -> ray.data.Dataset:
    """Sharded-KB NED: returns the same triple rows as ``link_pages``.

    Topology: a CHAIN of actor pools — prepare once (router), then the
    batch streams through one pool per shard GROUP (each appending its
    raw scores to accumulator list-columns), then a stateless solve.
    No shuffle, no union, no merge groupby; the streaming executor
    pipelines all stages.

    ``shards_per_pool`` groups logical shards: chain depth becomes
    ceil(n_shards / shards_per_pool) at proportionally larger per-actor
    memory.  Fewer chain stages also means fewer operators splitting
    the executor's per-operator CPU reservation — at 50k pages / 32
    CPUs, 4 pools ran 2.2x single-KB wall while 2 grouped pools ran
    ~1.0-1.3x (`DataContext.op_resource_reservation_ratio` ~0.1 helps
    deep chains further; see bench.py).  Pick shards_per_pool so one
    group's keyphrase index still fits actor memory — that is the only
    hard constraint at 100 TB."""
    settings = settings or DisambiguationSettings()
    if kb_dir is not None:
        # disk-backed shards (DMap analogue): broadcast ONLY the core;
        # each scorer pool reads its own shard group from parquet in
        # __init__ — write_kb_shards is idempotent, so repeated
        # pipelines over the same KB pay the serialization once
        from aida_ray.kb.diskkb import write_kb_shards
        write_kb_shards(kb, kb_dir, n_shards)
        core_ref = ray.put(kb_core(kb))
        groups = [tuple(range(s, min(s + shards_per_pool, n_shards)))
                  for s in range(0, n_shards, shards_per_pool)]
        group_refs = [(g, None) for g in groups]
    elif prebuilt_refs is not None:
        core_ref, group_refs = prebuilt_refs
    else:
        core_ref, group_refs = build_shard_refs(kb, n_shards,
                                                shards_per_pool)
    if isinstance(concurrency, int):
        concurrency = (max(1, concurrency), max(1, concurrency))

    def route(batch: pa.Table) -> pa.Table:
        kb_ = resolve(core_ref)
        urls, texts = batch["url"].to_pylist(), batch["text"].to_pylist()
        tss = batch["warc_ts"].to_pylist() if "warc_ts" in batch.column_names \
            else [None] * len(urls)
        preps = []
        for url, text in zip(urls, texts):
            doc = prepare_document(url, text, kb_, settings)
            preps.append(_pack_doc(doc, kb_))
        n = len(urls)
        empty_i = pa.array([[]] * n, pa.list_(pa.int32()))
        empty_l = pa.array([[]] * n, pa.list_(pa.int64()))
        empty_f = pa.array([[]] * n, pa.list_(pa.float64()))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("ms")),
            "prep": pa.array(preps, pa.binary()),
            "acc_mention_idx": empty_i,
            "acc_eid": empty_l,
            "acc_raw_mi": empty_f,
            "acc_raw_idf": empty_f,
        })

    ds = pages
    if not fold_endpoints:
        ds = ds.map_batches(route, batch_format="pyarrow",
                            batch_size=batch_size)
    n_pools = len(group_refs)
    for gi, (group, shard_ref) in enumerate(group_refs):
        do_route = fold_endpoints and gi == 0
        do_solve = fold_endpoints and gi == n_pools - 1
        # endpoint pools carry the heavy compute (prepare / graph
        # solve) — full CPU each.  Pure middle scorers are per-batch
        # LIGHT (~0.1 ms/doc owned-candidate scoring): at a full CPU
        # each, pools of mostly-idle actors statically hold scheduler
        # slots and STARVE the busy pools (measured 2.3x wall at 50k
        # pages) — half a CPU keeps the ratio healthy.
        cpus = 1.0 if (do_route or do_solve) else 0.5
        if kb_dir is not None:
            ds = ds.map_batches(
                DiskChainScorer, batch_format="pyarrow",
                batch_size=batch_size,
                fn_constructor_kwargs={"core_ref": core_ref,
                                       "kb_dir": kb_dir,
                                       "settings": settings,
                                       "shard": group,
                                       "n_shards": n_shards,
                                       "do_route": do_route,
                                       "do_solve": do_solve},
                concurrency=concurrency, num_cpus=cpus)
        else:
            ds = ds.map_batches(
                ChainScorer, batch_format="pyarrow", batch_size=batch_size,
                fn_constructor_kwargs={"shard_ref": shard_ref,
                                       "settings": settings,
                                       "shard": group, "n_shards": n_shards,
                                       "do_route": do_route,
                                       "do_solve": do_solve,
                                       "core_ref": core_ref},
                concurrency=concurrency, num_cpus=cpus)
    if fold_endpoints:
        return ds
    return ds.map_batches(_solve_batch, batch_format="pyarrow",
                          batch_size=batch_size,
                          fn_kwargs={"core_ref": core_ref,
                                     "settings": settings})
