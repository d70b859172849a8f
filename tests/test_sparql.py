"""Schema induction + BGP matching (stages/sparql.py)."""

import pyarrow as pa
import pytest

import ray.data

from aida_ray.stages.sparql import bgp_match, predicate_signatures


def _triples(rows):
    s, p, o = zip(*rows) if rows else ([], [], [])
    return ray.data.from_arrow(pa.table({
        "subj": pa.array(list(s), pa.string()),
        "pred": pa.array(list(p), pa.string()),
        "obj": pa.array(list(o), pa.string())}))


def _types(pairs):
    e, t = zip(*pairs)
    return ray.data.from_arrow(pa.table({
        "entity": pa.array(list(e), pa.string()),
        "type": pa.array(list(t), pa.string())}))


def test_signatures_dominant_and_purity(ray_session):
    t = _triples([("p1", "bornIn", "c1"), ("p2", "bornIn", "c2"),
                  ("p3", "bornIn", "x9"), ("p1", "bornIn", "c1")])
    ty = _types([("p1", "Person"), ("p2", "Person"), ("p3", "Person"),
                 ("c1", "City"), ("c2", "City")])
    out = predicate_signatures(t, ty).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # 3 of 4 assertions (weighted: the duplicate counts) are
    # Person->City; x9 is unknown
    assert (r["subj_type"], r["obj_type"]) == ("Person", "City")
    assert (r["support"], r["total"]) == (3, 4)
    assert r["purity"] == 0.75


def test_signatures_tie_break_lexicographic(ray_session):
    t = _triples([("a1", "rel", "b1"), ("a2", "rel", "b2")])
    ty = _types([("a1", "Zebra"), ("a2", "Apple"),
                 ("b1", "T"), ("b2", "T")])
    out = predicate_signatures(t, ty).to_pandas()
    assert out.iloc[0]["subj_type"] == "Apple"


def test_bgp_two_hop(ray_session):
    t = _triples([("p1", "bornIn", "c1"), ("c1", "cityOf", "n1"),
                  ("p2", "bornIn", "c2"), ("c2", "cityOf", "n2"),
                  ("p1", "nationality", "n1")])
    out = bgp_match(t, [("?x", "bornIn", "?y"),
                        ("?y", "cityOf", "?z"),
                        ("?x", "nationality", "?z")]).to_pandas()
    assert sorted(out.columns) == ["x", "y", "z"]
    assert out.values.tolist() == [["p1", "c1", "n1"]]


def test_bgp_literal_positions_and_dedup(ray_session):
    t = _triples([("p1", "bornIn", "c1"), ("p1", "bornIn", "c1"),
                  ("p2", "livesIn", "c1")])
    out = bgp_match(t, [("?x", "bornIn", "c1")]).to_pandas()
    assert out.values.tolist() == [["p1"]]


def test_bgp_repeated_variable_in_pattern(ray_session):
    t = _triples([("a", "self", "a"), ("a", "self", "b")])
    out = bgp_match(t, [("?x", "self", "?x")]).to_pandas()
    assert out.values.tolist() == [["a"]]


def test_bgp_disconnected_rejected(ray_session):
    t = _triples([("a", "r", "b")])
    with pytest.raises(ValueError, match="disconnected"):
        bgp_match(t, [("?x", "r", "?y"), ("?u", "r", "?v")])
