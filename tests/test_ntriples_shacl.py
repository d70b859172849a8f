"""N-Triples escaping round-trip + SHACL-lite validation unit tests."""

import pandas as pd
import pyarrow as pa

import ray.data as rd


def test_ntriples_roundtrip_nasty_literals(ray_session):
    from aida_ray.stages.ntriples import (format_ntriples_batch,
                                          parse_ntriples_batch)
    objs = ['plain', 'with "quotes"', 'back\\slash', 'new\nline',
            'tab\there', '\\n not a newline', '', 'mix\\"\n\t\\\\末']
    t = pa.table({
        "subj": pa.array([f"http://t/e{i}" for i in range(len(objs))]),
        "pred": pa.array(["http://t/p"] * len(objs)),
        "obj": pa.array(objs),
        "is_literal": pa.array([True] * len(objs))})
    back = parse_ntriples_batch(format_ntriples_batch(t))
    assert back["obj"].to_pylist() == objs
    assert all(back["is_literal"].to_pylist())


def test_ntriples_iri_vs_empty_literal(ray_session):
    from aida_ray.stages.ntriples import (format_ntriples_batch,
                                          parse_ntriples_batch)
    t = pa.table({"subj": ["http://t/a", "http://t/b"],
                  "pred": ["p", "p"],
                  "obj": ["", ""],
                  "is_literal": [True, False]})
    back = parse_ntriples_batch(format_ntriples_batch(t)).to_pandas()
    assert sorted(back.is_literal) == [False, True]
    assert (back.obj == "").all()


def test_ntriples_drops_malformed(ray_session):
    from aida_ray.stages.ntriples import parse_ntriples_batch
    b = pa.table({"line": [
        "# comment", "", "garbage",
        '<s> <p> "unterminated .',
        '<http://a> <http://p> <http://o> .',
        '  <http://a> <http://p> "x" .  ']})
    got = parse_ntriples_batch(b)
    assert got.num_rows == 2


def test_ntriples_distributed(ray_session):
    from aida_ray.stages.ntriples import from_ntriples, to_ntriples
    t = pa.table({
        "subj": pa.array([f"http://t/e{i}" for i in range(40)]),
        "pred": pa.array([f"p{i % 3}" for i in range(40)]),
        "obj": pa.array([f'v"{i}\n' if i % 2 else f"http://o/{i}"
                         for i in range(40)]),
        "is_literal": pa.array([bool(i % 2) for i in range(40)])})
    got = from_ntriples(to_ntriples(rd.from_arrow(t).repartition(5))) \
        .to_pandas().sort_values("subj").reset_index(drop=True)
    want = t.to_pandas().sort_values("subj").reset_index(drop=True)
    assert got.equals(want)


def _shapes():
    return pa.table({
        "cls": pa.array(["c0", "c1"]),
        "prop": pa.array(["name", "age"]),
        "min_count": pa.array([1, 1], pa.int64()),
        "max_count": pa.array([2, None], pa.int64()),
        "datatype": pa.array(["string", "integer"]),
        "pattern": pa.array(["^N", None])})


def test_shacl_all_violation_kinds(ray_session):
    from aida_ray.stages.shacl import validate_shapes
    types = rd.from_arrow(pa.table({
        "entity": ["e0", "e1", "e2", "e3", "e4"],
        "cls": ["c0", "c0", "c0", "c1", "c1"]}))
    rows = [
        # e0: no name at all -> min_count
        # e1: three names -> max_count, one fails pattern
        ("e1", "name", "Na", True), ("e1", "name", "Nb", True),
        ("e1", "name", "bad", True),
        # e2: one good name -> clean
        ("e2", "name", "Nc", True),
        # e3: age as IRI -> datatype; e4: age non-integer -> datatype
        ("e3", "age", "http://x", False),
        ("e4", "age", "12x", True),
        # unshaped (cls, prop) combos are ignored
        ("e3", "name", "whatever", True),
    ]
    triples = rd.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows],
        "is_literal": [r[3] for r in rows]})).repartition(3)
    got = validate_shapes(types, triples, _shapes()).to_pandas()
    got = set(zip(got.entity, got.prop, got.kind))
    assert got == {
        ("e0", "name", "min_count"),
        ("e1", "name", "max_count"),
        ("e1", "name", "pattern"),
        ("e3", "age", "datatype"),
        ("e4", "age", "datatype"),
    }


def test_shacl_clean_corpus_empty(ray_session):
    from aida_ray.stages.shacl import validate_shapes
    types = rd.from_arrow(pa.table({"entity": ["e0"], "cls": ["c0"]}))
    triples = rd.from_arrow(pa.table({
        "subj": ["e0"], "pred": ["name"], "obj": ["Nok"],
        "is_literal": [True]}))
    got = validate_shapes(types, triples, _shapes()).to_pandas()
    assert len(got) == 0
