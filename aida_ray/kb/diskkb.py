"""Disk-backed keyphrase-index shards — the DMap analogue.

The reference ships a low-RAM access mode (``DataAccessDMap.java``,
README.md:462-526) that memory-maps the 22-GB YAGO2 stores instead of
preloading them into the JVM heap.  This module is the Ray-native
equivalent for the one KB component that actually outgrows node RAM —
the per-entity keyphrase index:

- the CORE KB (dictionary, priors, ranks, id maps, inlinks — the small
  side every stage needs) stays an eager ``ray.put`` broadcast;
- the keyphrase index is written ONCE to parquet, hive-partitioned by
  entity residue class (``shard=K/``), and each scorer actor loads ONLY
  its own shard group's partitions in ``__init__`` — per-actor resident
  KB memory is core + |index|/n_shards instead of the whole pickled KB.

Reconstruction preserves per-entity list and dict insertion order, so
the loaded shard is semantically identical to the in-memory
``kb_shard`` view and the sharded chain stays bit-equal to the
single-KB pipeline (tests/test_diskkb.py, tests/test_sharded.py).
"""

from __future__ import annotations

import copy
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from aida_ray.kb.kb import KB

_FILES = ("entity_kps", "kp_tokens", "e_kp_count", "e_kw_count",
          "kw_mi", "entity_keywords")


def write_kb_shards(kb: KB, path: str, n_shards: int) -> None:
    """Persist the keyphrase index hive-partitioned by eid % n_shards
    (atomic tmp-dir + rename; idempotent on shard-count match).

    ``kp_tokens`` is duplicated into every shard that references the
    keyphrase — shards stay independently loadable, and the dup factor
    is bounded by cross-shard keyphrase sharing, not corpus size."""
    meta = {"n_shards": n_shards, "version": 1}
    mp = os.path.join(path, "_meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            if json.load(f) == meta:
                return
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    for s in range(n_shards):
        d = os.path.join(tmp, f"shard={s}")
        os.makedirs(d, exist_ok=True)
        eids = sorted(e for e in kb.entity_kps if e % n_shards == s)
        pq.write_table(pa.table({
            "eid": pa.array(eids, pa.int64()),
            "kps": pa.array([list(kb.entity_kps[e]) for e in eids],
                            pa.list_(pa.int64()))}),
            os.path.join(d, "entity_kps.parquet"))
        kp_ids = sorted({kp for e in eids for kp in kb.entity_kps[e]
                         if kp in kb.kp_tokens})
        pq.write_table(pa.table({
            "kp": pa.array(kp_ids, pa.int64()),
            "tokens": pa.array([list(kb.kp_tokens[k]) for k in kp_ids],
                               pa.list_(pa.int64()))}),
            os.path.join(d, "kp_tokens.parquet"))
        for name, src in (("e_kp_count", kb.e_kp_count),
                          ("e_kw_count", kb.e_kw_count),
                          ("kw_mi", kb.kw_mi)):
            es, ks, vs = [], [], []
            for e in eids:
                inner = src.get(e, {})
                # write in dict insertion order so the reconstructed
                # dicts iterate identically (float-sum order safety)
                for k, v in inner.items():
                    es.append(e)
                    ks.append(k)
                    vs.append(v)
            vt = pa.float64() if name == "kw_mi" else pa.int64()
            pq.write_table(pa.table({
                "eid": pa.array(es, pa.int64()),
                "k": pa.array(ks, pa.int64()),
                "v": pa.array(vs, vt)}),
                os.path.join(d, f"{name}.parquet"))
        pq.write_table(pa.table({
            "eid": pa.array(eids, pa.int64()),
            "kws": pa.array([sorted(kb.entity_keywords.get(e, frozenset()))
                             for e in eids], pa.list_(pa.int64()))}),
            os.path.join(d, "entity_keywords.parquet"))
    with open(os.path.join(tmp, "_meta.json"), "w") as f:
        json.dump(meta, f)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


def load_kb_shard(core: KB, path: str, shards) -> KB:
    """Core KB + the keyphrase index of ONE shard group, loaded from
    parquet in actor ``__init__`` — the per-actor resident set is
    bounded by |index|/n_shards, not the full KB."""
    ss = sorted({shards} if isinstance(shards, int) else set(shards))
    kb = copy.copy(core)
    kb.entity_kps, kb.kp_tokens = {}, {}
    kb.e_kp_count, kb.e_kw_count = {}, {}
    kb.kw_mi, kb.entity_keywords = {}, {}
    kb._mw_cache = {}
    for s in ss:
        d = os.path.join(path, f"shard={s}")
        t = pq.read_table(os.path.join(d, "entity_kps.parquet"))
        for e, kps in zip(t["eid"].to_pylist(), t["kps"].to_pylist()):
            kb.entity_kps[e] = list(kps)
        t = pq.read_table(os.path.join(d, "kp_tokens.parquet"))
        for k, toks in zip(t["kp"].to_pylist(), t["tokens"].to_pylist()):
            kb.kp_tokens[k] = tuple(toks)
        for name, dst, cast in (("e_kp_count", kb.e_kp_count, int),
                                ("e_kw_count", kb.e_kw_count, int),
                                ("kw_mi", kb.kw_mi, float)):
            t = pq.read_table(os.path.join(d, f"{name}.parquet"))
            for e, k, v in zip(t["eid"].to_pylist(), t["k"].to_pylist(),
                               t["v"].to_pylist()):
                dst.setdefault(e, {})[k] = cast(v)
        t = pq.read_table(os.path.join(d, "entity_keywords.parquet"))
        for e, kws in zip(t["eid"].to_pylist(), t["kws"].to_pylist()):
            kb.entity_keywords[e] = frozenset(kws)
    return kb


def shard_bytes_on_disk(path: str, shard: int) -> int:
    d = os.path.join(path, f"shard={shard}")
    return sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d))
