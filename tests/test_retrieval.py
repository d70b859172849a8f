import math

import numpy as np
import pyarrow as pa
import pytest


def _bm25_local(docs: dict[int, str], terms: list[str],
                k1: float = 1.2, b: float = 0.75) -> dict[int, float]:
    """Brute-force single-process BM25 for the test corpus."""
    toks = {d: [t for t in txt.lower().split() if t] for d, txt in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for d, tl in toks.items():
        s = 0.0
        for t in terms:
            tf = tl.count(t)
            if tf == 0:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * len(tl) / avgdl))
        if s:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_bruteforce(ray_session):
    import ray.data
    from aida_ray.stages.retrieval import bm25_topk
    docs = {
        0: "hash join hash join merge",
        1: "sort merge window sort",
        2: "hash scan filter group",
        3: "join join join window",
        4: "the quick brown fox",
    }
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })).repartition(3)
    out = bm25_topk(ds, queries=[(7, ["hash", "join"])], k=3)
    want = _bm25_local(docs, ["hash", "join"])
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got = out.to_pandas()
    assert list(got.query_id) == [7, 7, 7]
    assert list(got["rank"]) == [1, 2, 3]
    assert list(got.doc_id) == [d for d, _ in ranked]
    assert list(got.score) == pytest.approx([s for _, s in ranked], abs=1e-6)


def test_bm25_multi_query_and_absent_term(ray_session):
    import ray.data
    from aida_ray.stages.retrieval import bm25_topk
    docs = {10: "alpha beta", 11: "beta gamma", 12: "gamma gamma delta"}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(docs), pa.int64()),
        "text": pa.array(list(docs.values()), pa.string()),
    })).repartition(2)
    out = bm25_topk(ds, queries=[(0, ["gamma"]), (1, ["zzz"])], k=5).to_pandas()
    # query 1's term is absent from the corpus -> no rows for it
    assert set(out.query_id) == {0}
    assert list(out.doc_id)[0] == 12  # tf=2 wins
    assert set(out.doc_id) == {11, 12}


def test_bm25_k_truncation_and_blocking_invariance(ray_session):
    import ray.data
    from aida_ray.stages.retrieval import bm25_topk
    docs = {i: ("term " * (i % 4 + 1) + "pad " * (i % 3)) for i in range(20)}
    tbl = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string())})
    a = bm25_topk(ray.data.from_arrow(tbl).repartition(1),
                  queries=[(0, ["term"])], k=4).to_pandas()
    b = bm25_topk(ray.data.from_arrow(tbl).repartition(7),
                  queries=[(0, ["term"])], k=4).to_pandas()
    assert len(a) == 4
    assert a.equals(b)


def test_bm25_index_matches_fullscan_and_prunes(ray_session, tmp_path):
    import ray.data
    from aida_ray.stages.retrieval import (bm25_index_topk,
                                           bm25_index_write, bm25_topk)
    docs = {i: ("alpha " * (i % 3 + 1) + "beta " * (i % 2) + f"w{i} filler")
            for i in range(40)}
    tbl = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values()), pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(5)
    queries = [(0, ["alpha", "beta"]), (1, ["w7"])]
    full = bm25_topk(ds, queries, k=5).to_pandas()
    idx = str(tmp_path / "bm25idx")
    meta = bm25_index_write(ds, idx, n_buckets=16)
    assert meta["n"] == 40
    got, stats = bm25_index_topk(idx, queries, k=5)
    got = got.to_pandas()
    assert stats["buckets_read"] < stats["buckets_total"]
    assert stats["buckets_read"] <= 3
    assert full.equals(got)


def test_bm25_index_resume_skips_rebuild(ray_session, tmp_path):
    import os
    import ray.data
    from aida_ray.stages.retrieval import bm25_index_write
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array(["a b", "b c"], pa.string())})
    ds = ray.data.from_arrow(tbl)
    idx = str(tmp_path / "idx2")
    m1 = bm25_index_write(ds, idx, n_buckets=4)
    stamp = os.path.getmtime(os.path.join(idx, "_meta.json"))
    m2 = bm25_index_write(ds, idx, n_buckets=4)
    assert m1 == m2
    assert os.path.getmtime(os.path.join(idx, "_meta.json")) == stamp


def test_bm25_index_terms_split_across_buckets(ray_session, tmp_path):
    # force n_buckets large so the two query terms land in different
    # buckets with high probability; doc scores must still merge
    import ray.data
    from aida_ray.stages.retrieval import (_term_bucket, bm25_index_topk,
                                           bm25_index_write, bm25_topk)
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["red blue", "red red green", "blue blue"],
                         pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(3)
    b = _term_bucket(["red", "blue"], 64)
    assert b[0] != b[1]          # distinct buckets for this vocab/size
    idx = str(tmp_path / "idx3")
    bm25_index_write(ds, idx, n_buckets=64)
    queries = [(9, ["red", "blue"])]
    got, _ = bm25_index_topk(idx, queries, k=3)
    want = bm25_topk(ds, queries, k=3)
    assert got.to_pandas().equals(want.to_pandas())
