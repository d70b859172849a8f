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
