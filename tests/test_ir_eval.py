"""IR metrics (stages/ir_eval.py) — hand-computed goldens."""

import math

import pyarrow as pa
import pytest


def _run(rows):
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "rank": pa.array([r[1] for r in rows], pa.int64()),
        "doc_id": pa.array([r[2] for r in rows], pa.int64()),
        "score": pa.array([float(10 - r[1]) for r in rows], pa.float64())})


def test_ir_metrics_hand_computed(ray_session):
    import ray

    from aida_ray.stages.ir_eval import ir_metrics
    # query 0: retrieved docs 1,2,3 with rels 3,0,1; judged also doc 9
    # (rel 2, missed).  query 1: nothing relevant retrieved.
    run = _run([(0, 1, 1), (0, 2, 2), (0, 3, 3),
                (1, 1, 5), (1, 2, 6)])
    qrels = pa.table({
        "query_id": pa.array([0, 0, 0, 1], pa.int64()),
        "doc_id": pa.array([1, 3, 9, 7], pa.int64()),
        "rel": pa.array([3, 1, 2, 1], pa.int64())})
    got = ir_metrics(run, ray.data.from_arrow(qrels), k=10).to_pandas() \
        .set_index("query_id")

    d = lambda i: 1.0 / math.log2(i + 1)
    dcg0 = 7 * d(1) + 0 * d(2) + 1 * d(3)
    idcg0 = 7 * d(1) + 3 * d(2) + 1 * d(3)   # rels 3,2,1
    ap0 = (1 / 1 + 2 / 3) / 3                # R=3, hits at ranks 1,3
    assert got.loc[0, "n_rel"] == 3
    assert got.loc[0, "ndcg_1e6"] == round(dcg0 / idcg0 * 1e6)
    assert got.loc[0, "mrr_1e6"] == 1_000_000
    assert got.loc[0, "ap_1e6"] == round(ap0 * 1e6)
    # query 1: judged doc never retrieved -> all zeros except n_rel
    assert got.loc[1, "n_rel"] == 1
    assert got.loc[1, "ndcg_1e6"] == 0
    assert got.loc[1, "mrr_1e6"] == 0
    assert got.loc[1, "ap_1e6"] == 0


def test_ir_metrics_k_truncation(ray_session):
    import ray

    from aida_ray.stages.ir_eval import ir_metrics
    # relevant doc at rank 3 disappears at k=2
    run = _run([(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    qrels = pa.table({"query_id": pa.array([0], pa.int64()),
                      "doc_id": pa.array([3], pa.int64()),
                      "rel": pa.array([2], pa.int64())})
    g3 = ir_metrics(run, ray.data.from_arrow(qrels), k=3).to_pandas()
    g2 = ir_metrics(run, ray.data.from_arrow(qrels), k=2).to_pandas()
    assert g3.mrr_1e6[0] == round(1e6 / 3)
    assert g2.mrr_1e6[0] == 0 and g2.ndcg_1e6[0] == 0
    assert g2.n_rel[0] == 1     # R counts misses below k


def test_rm3_expansion_properties(ray_session):
    """RM3 over a tiny corpus: original terms keep >= mix*uniform
    weight; co-occurring terms surface as new expansion terms with
    positive relevance mass."""
    import ray

    from aida_ray.stages.retrieval import rm3_expansion
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "hash join hash partition shuffle",
            "hash join broadcast lookup",
            "merge sort external run",
            "totally unrelated text here"], pa.string())})
    t = rm3_expansion(ray.data.from_arrow(docs),
                      queries=[(0, ["hash", "join"])],
                      k_docs=2, k_terms=6, mix=0.5).to_pandas()
    w = dict(zip(t.term, t.weight_1e6))
    new = dict(zip(t.term, t.is_new))
    # originals present, weight >= 0.5 * 1/2 = 250000
    assert w["hash"] >= 250_000 and w["join"] >= 250_000
    assert not new["hash"] and not new["join"]
    # feedback-doc co-occurring terms expand with positive mass
    assert any(new[x] and w[x] > 0
               for x in ("partition", "shuffle", "broadcast", "lookup")
               if x in w)
    # a term only in non-feedback docs never appears
    assert "external" not in w and "unrelated" not in w


def test_best_snippets_window_selection(ray_session):
    """The chosen window maximizes (distinct terms, hits) and sits at
    the earliest tying start; snippet text matches the window."""
    import ray

    from aida_ray.stages.retrieval import best_snippets
    text = ("filler one two three hash alone here filler filler "
            "hash join hash together end bit")
    docs = pa.table({"doc_id": pa.array([7], pa.int64()),
                     "text": pa.array([text], pa.string())})
    run = pa.table({"query_id": pa.array([0], pa.int64()),
                    "rank": pa.array([1], pa.int64()),
                    "doc_id": pa.array([7], pa.int64()),
                    "score": pa.array([1.0], pa.float64())})
    t = best_snippets(ray.data.from_arrow(docs),
                      queries=[(0, ["hash", "join"])], run=run,
                      window=5, k_docs=5).to_pandas()
    assert len(t) == 1
    row = t.iloc[0]
    # the 5-token window covering 'hash join hash' (2 distinct, 3 hits)
    assert row.n_distinct == 2 and row.n_hits == 3
    toks = [x for x in text.lower().split(" ") if x]
    window = toks[row.start_tok:row.start_tok + 5]
    assert row.snippet == " ".join(window)
    assert "join" in window and window.count("hash") == 2


def test_best_snippets_short_doc(ray_session):
    import ray

    from aida_ray.stages.retrieval import best_snippets
    docs = pa.table({"doc_id": pa.array([1], pa.int64()),
                     "text": pa.array(["tiny hash doc"], pa.string())})
    run = pa.table({"query_id": pa.array([0], pa.int64()),
                    "rank": pa.array([1], pa.int64()),
                    "doc_id": pa.array([1], pa.int64()),
                    "score": pa.array([1.0], pa.float64())})
    t = best_snippets(ray.data.from_arrow(docs),
                      queries=[(0, ["hash"])], run=run,
                      window=12).to_pandas()
    assert t.iloc[0].snippet == "tiny hash doc"
    assert t.iloc[0].start_tok == 0 and t.iloc[0].n_hits == 1
