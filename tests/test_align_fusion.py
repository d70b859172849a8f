"""Unit tests: predicate_alignment, rrf_fusion, invariant_tokens."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_predicate_alignment_jaccard(ray_session):
    from aida_ray.stages.webtables import predicate_alignment
    e = _ds(pa.table({
        "subj": ["a", "b", "a"],
        "pred": ["col1", "col1", "col1"],   # dup fact collapses
        "obj": ["x", "y", "x"]}))
    k = _ds(pa.table({
        "subj": ["a", "b", "c"],
        "pred": ["born", "born", "born"],
        "obj": ["x", "y", "z"]}))
    got = predicate_alignment(e, k).to_pandas().iloc[0]
    assert (got["pred_e"], got["pred_k"]) == ("col1", "born")
    assert got["inter"] == 2 and got["size_e"] == 2 and got["size_k"] == 3
    assert abs(got["jaccard"] - round(2 / 3, 6)) < 1e-9


def test_predicate_alignment_disjoint_empty(ray_session):
    from aida_ray.stages.webtables import predicate_alignment
    e = _ds(pa.table({"subj": ["a"], "pred": ["p"], "obj": ["x"]}))
    k = _ds(pa.table({"subj": ["b"], "pred": ["q"], "obj": ["y"]}))
    assert predicate_alignment(e, k).count() == 0


def test_rrf_fusion_best_rank_dedup(ray_session):
    from aida_ray.stages.retrieval import rrf_fusion
    t = _ds(pa.table({
        "list_id": pa.array([0, 0, 1], pa.int64()),
        "item": ["x", "x", "x"],
        "rank": pa.array([3, 1, 2], pa.int64())}))   # list 0: best = 1
    got = rrf_fusion(t).to_pandas().iloc[0]
    assert got["n_lists"] == 2
    assert abs(got["score"] - round(1 / 61 + 1 / 62, 6)) < 1e-9


def test_invariant_tokens_intersection(ray_session):
    from aida_ray.stages.navigation import invariant_tokens
    t = _ds(pa.table({
        "cluster": ["c", "c", "d"],
        "url": ["u1", "u2", "u3"],
        "text": ["Paris capital 75", "Paris capitale 75", "solo page"]}))
    got = invariant_tokens(t).to_pandas()
    c = got[got.cluster == "c"]
    assert set(c["token"]) == {"Paris", "75"}
    d = got[got.cluster == "d"]          # single page: all its tokens
    assert set(d["token"]) == {"solo", "page"}
