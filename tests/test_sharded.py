"""Sharded-KB scoring path produces results identical to the single-KB
pipeline (DESIGN.md §2 prototype)."""

import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    from aida_ray.kb.synth import synth_kb
    from aida_ray.pipelines.corpus import write_corpus
    kb = synth_kb(120, seed=42)
    out = str(tmp_path_factory.mktemp("sharded"))
    dirs = write_corpus(out, kb, 60, n_shards=2)
    return kb, dirs


def test_kb_shard_partition(small_corpus):
    from aida_ray.pipelines.sharded import kb_core, kb_shard
    kb, _ = small_corpus
    shards = [kb_shard(kb, s, 3) for s in range(3)]
    all_eids = set()
    for s in shards:
        all_eids |= set(s.entity_kps)
    assert all_eids == set(kb.entity_kps)
    assert sum(len(s.entity_kps) for s in shards) == len(kb.entity_kps)
    core = kb_core(kb)
    assert core.entity_kps == {} and core.dictionary == kb.dictionary


def test_sharded_equals_unsharded(ray_session, small_corpus):
    import ray

    from aida_ray.pipelines.kg import link_pages, read_pages
    from aida_ray.pipelines.sharded import link_pages_sharded
    from aida_ray.state.broadcast import put_kb
    kb, dirs = small_corpus

    def collect(ds):
        t = pa.concat_tables(
            [ray.get(r) for r in ds.to_arrow_refs()])
        df = t.to_pandas().sort_values(
            ["subj", "pred", "obj", "url"]).reset_index(drop=True)
        df["score"] = df["score"].round(9)
        df["warc_ts"] = df["warc_ts"].astype(str)
        return df

    base = collect(link_pages(read_pages(dirs["pages"]), put_kb(kb),
                              emit="triples", concurrency=2, batch_size=16))
    sharded = collect(link_pages_sharded(read_pages(dirs["pages"]), kb,
                                         n_shards=3, concurrency=1,
                                         batch_size=16))
    assert len(base) == len(sharded)
    assert base.equals(sharded)
    # grouped logical shards (2 per pool, chain depth 2) — same rows
    grouped = collect(link_pages_sharded(read_pages(dirs["pages"]), kb,
                                         n_shards=3, concurrency=1,
                                         batch_size=16, shards_per_pool=2))
    assert base.equals(grouped)
    # unfolded topology (separate route/solve stages) — same rows
    unfolded = collect(link_pages_sharded(read_pages(dirs["pages"]), kb,
                                          n_shards=3, concurrency=1,
                                          batch_size=16,
                                          fold_endpoints=False))
    assert base.equals(unfolded)
