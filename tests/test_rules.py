"""AMIE-style rule mining (stages/rules.py) — pair rules, path rules,
dup-invariance, x==z exclusion, hub guard, empty input."""

import pyarrow as pa
import pytest

import ray.data

from aida_ray.stages.rules import mine_pair_rules, mine_path_rules


def _triples(rows):
    s, p, o = zip(*rows) if rows else ([], [], [])
    return ray.data.from_arrow(pa.table({
        "subj": pa.array(list(s), pa.string()),
        "pred": pa.array(list(p), pa.string()),
        "obj": pa.array(list(o), pa.string())}))


def _rows(t: pa.Table, keys):
    return sorted(tuple(r[k] for k in keys) for r in t.to_pylist())


PAIR_KEYS = ["body_pred", "head_pred", "support", "body_size",
             "confidence"]
PATH_KEYS = ["p1", "p2", "head_pred", "support", "body_size",
             "confidence"]


def test_pair_rules_confidence(ray_session):
    t = _triples([("c1", "cityOf", "n1"), ("c2", "cityOf", "n1"),
                  ("c1", "locatedIn", "n1")])
    got = _rows(mine_pair_rules(t), PAIR_KEYS)
    assert got == [("cityOf", "locatedIn", 1, 2, 0.5),
                   ("locatedIn", "cityOf", 1, 1, 1.0)]


def test_pair_rules_min_support(ray_session):
    t = _triples([("c1", "cityOf", "n1"), ("c1", "locatedIn", "n1"),
                  ("c2", "cityOf", "n2"), ("c2", "locatedIn", "n2"),
                  ("c3", "cityOf", "n3"), ("c3", "partOf", "n3")])
    got = _rows(mine_pair_rules(t, min_support=2), PAIR_KEYS)
    assert got == [("cityOf", "locatedIn", 2, 3, round(2 / 3, 6)),
                   ("locatedIn", "cityOf", 2, 2, 1.0)]


def test_pair_rules_duplicate_assertions_ignored(ray_session):
    base = [("c1", "cityOf", "n1"), ("c1", "locatedIn", "n1")]
    once = _rows(mine_pair_rules(_triples(base)), PAIR_KEYS)
    thrice = _rows(mine_pair_rules(_triples(base * 3)), PAIR_KEYS)
    assert once == thrice


def test_path_rules_composition(ray_session):
    t = _triples([("p1", "bornIn", "c1"), ("p2", "bornIn", "c2"),
                  ("c1", "cityOf", "n1"), ("c2", "cityOf", "n1"),
                  ("p1", "nationality", "n1")])
    got = _rows(mine_path_rules(t), PATH_KEYS)
    assert ("bornIn", "cityOf", "nationality", 1, 2, 0.5) in got
    # no binding ever satisfies a bornIn head on (x, z)
    assert not any(r[2] == "bornIn" for r in got)


def test_path_rules_exclude_reflexive_binding(ray_session):
    # a -r1-> b -r2-> a binds x == z and must be excluded
    t = _triples([("a", "r1", "b"), ("b", "r2", "a")])
    got = mine_path_rules(t)
    assert got.num_rows == 0


def test_path_rules_hub_guard(ray_session):
    t = _triples([("p1", "bornIn", "c1"), ("c1", "cityOf", "n1"),
                  ("p1", "nationality", "n1")])
    # fanout through c1 is 1*1 = 1; a cap of 0 drops the hub group
    assert mine_path_rules(t, max_fanout=0).num_rows == 0
    assert mine_path_rules(t, max_fanout=1).num_rows > 0


def test_empty_input(ray_session):
    t = _triples([])
    pair = mine_pair_rules(t)
    path = mine_path_rules(t)
    assert pair.num_rows == 0 and path.num_rows == 0
    assert set(PAIR_KEYS) <= set(pair.column_names)
    assert set(PATH_KEYS) <= set(path.column_names)
