"""Slot filling, provenance aggregation, taxonomy LCA."""

import pyarrow as pa

import ray.data

from aida_ray.stages.kb_slots import slot_fill, triple_provenance
from aida_ray.stages.lca import lca_pairs


def _triples(rows, with_doc=False):
    if with_doc:
        d, s, p, o = zip(*rows)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(list(d), pa.int64()),
            "subj": pa.array(list(s), pa.string()),
            "pred": pa.array(list(p), pa.string()),
            "obj": pa.array(list(o), pa.string())}))
    s, p, o = zip(*rows)
    return ray.data.from_arrow(pa.table({
        "subj": pa.array(list(s), pa.string()),
        "pred": pa.array(list(p), pa.string()),
        "obj": pa.array(list(o), pa.string())}))


def test_slot_fill_majority(ray_session):
    t = _triples([("e1", "bornIn", "c1"), ("e1", "bornIn", "c1"),
                  ("e1", "bornIn", "c2"), ("e2", "bornIn", "c3")])
    out = slot_fill(t).to_pandas().set_index("subj")
    assert out.loc["e1", "obj"] == "c1"
    assert out.loc["e1", "votes"] == 2
    assert out.loc["e1", "total"] == 3
    assert round(out.loc["e1", "agreement"], 6) == round(2 / 3, 6)
    assert out.loc["e2", "agreement"] == 1.0


def test_slot_fill_tie_breaks_lexicographic(ray_session):
    t = _triples([("e1", "p", "b"), ("e1", "p", "a")])
    out = slot_fill(t).to_pandas()
    assert out.iloc[0]["obj"] == "a"


def test_provenance_sorted_distinct(ray_session):
    t = _triples([(9, "e1", "p", "x"), (3, "e1", "p", "x"),
                  (3, "e1", "p", "x"), (5, "e2", "p", "y")],
                 with_doc=True)
    out = triple_provenance(t).to_pandas().set_index("subj")
    assert out.loc["e1", "doc_list"] == "3,9"
    assert out.loc["e1", "n_docs"] == 2
    assert out.loc["e2", "doc_list"] == "5"


def test_provenance_cap_keeps_exact_count(ray_session):
    t = _triples([(d, "e", "p", "x") for d in range(10)],
                 with_doc=True)
    out = triple_provenance(t, max_docs=3).to_pandas()
    assert out.iloc[0]["n_docs"] == 10
    assert out.iloc[0]["doc_list"] == "0,1,2"


def _tree():
    # heap-indexed binary tree over 0..6: parent(k) = (k-1)//2
    return ray.data.from_arrow(pa.table({
        "child": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "parent": pa.array([0, 0, 1, 1, 2, 2], pa.int64())}))


def test_lca_basic(ray_session):
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([3, 3, 5, 0, 4], pa.int64()),
        "b": pa.array([4, 5, 6, 6, 4], pa.int64())}))
    out = lca_pairs(pairs, _tree()).to_pandas()
    got = {(r["a"], r["b"]): (r["lca"], r["lca_depth"])
           for _, r in out.iterrows()}
    assert got[(3, 4)] == (1, 1)   # siblings under node 1
    assert got[(3, 5)] == (0, 0)   # across the root
    assert got[(5, 6)] == (2, 1)
    assert got[(0, 6)] == (0, 0)   # ancestor of the other
    assert got[(4, 4)] == (4, 2)   # self


def test_lca_forest_disjoint(ray_session):
    edges = ray.data.from_arrow(pa.table({
        "child": pa.array([1, 11], pa.int64()),
        "parent": pa.array([0, 10], pa.int64())}))
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([1], pa.int64()),
        "b": pa.array([11], pa.int64())}))
    out = lca_pairs(pairs, edges).to_pandas()
    assert (out.iloc[0]["lca"], out.iloc[0]["lca_depth"]) == (-1, -1)
