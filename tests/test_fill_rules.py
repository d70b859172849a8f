"""Unit tests: fill_rates, apply_rules, jsonld_nested_triples."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_fill_rates_denominator(ray_session):
    from aida_ray.stages.kgprofile import fill_rates
    triples = _ds(pa.table({
        "subj": ["a", "a", "b"],          # duplicate slot collapses
        "pred": ["pop", "pop", "pop"],
        "obj": ["1", "2", "3"]}))
    types = _ds(pa.table({"entity": ["a", "b", "c", "d"],
                          "type": ["City", "City", "City", "Lake"]}))
    got = fill_rates(triples, types).to_pandas().set_index("type")
    r = got.loc["City"]
    assert r["n_filled"] == 2 and r["n_type"] == 3
    assert abs(r["rate"] - round(2 / 3, 6)) < 1e-9
    assert "Lake" not in got.index        # no filler, no row


def test_apply_rules_blocks_existing(ray_session):
    from aida_ray.stages.rules import apply_rules
    triples = _ds(pa.table({
        "subj": ["x", "x", "y"],
        "pred": ["m", "s", "m"],
        "obj": ["u", "u", "v"]}))
    got = apply_rules(triples, [("R", "m", "s")]).to_pandas()
    # (x, s, u) exists -> only y's head inferred
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["subj"], r["pred"], r["obj"], r["rule_id"]) == \
        ("y", "s", "v", "R")


def test_apply_rules_multi_rule_same_head(ray_session):
    from aida_ray.stages.rules import apply_rules
    triples = _ds(pa.table({"subj": ["x", "x"], "pred": ["m", "n"],
                            "obj": ["u", "u"]}))
    got = apply_rules(triples, [("R1", "m", "k"), ("R2", "n", "k")]) \
        .to_pandas()
    assert sorted(got["rule_id"]) == ["R1", "R2"]   # both witnesses


def test_jsonld_nested_expansion(ray_session):
    from aida_ray.stages.webtables import jsonld_nested_triples_of
    h = ('<script type="application/ld+json">'
         '{"name": "Ada", "born": {"name": "London", "in": "UK"},'
         ' "age": 36, "tags": [1, 2]}</script>')
    got = set(jsonld_nested_triples_of(h))
    assert ("Ada", "born", "London") in got
    assert ("London", "in", "UK") in got
    assert ("Ada", "age", "36") in got
    assert not any(p == "tags" for _, p, _ in got)   # lists skipped


def test_jsonld_nested_subjectless_inner(ray_session):
    from aida_ray.stages.webtables import jsonld_nested_triples_of
    h = ('<script type="application/ld+json">'
         '{"name": "Ada", "born": {"in": "UK"}}</script>')
    got = set(jsonld_nested_triples_of(h))
    # nested block without name/@id: no edge, no nested triples
    assert got == {("Ada", "name", "Ada")}


def test_best_assertion_argmax_tiebreak(ray_session):
    from aida_ray.stages.fuse import best_assertion
    t = _ds(pa.table({
        "subj": ["s", "s", "s", "t"],
        "pred": ["p"] * 4,
        "obj": ["zz", "aa", "bb", "only"],
        "n_src": pa.array([2, 2, 1, 5], pa.int64())}))
    got = best_assertion(t).to_pandas().set_index("subj")
    assert got.loc["s", "obj"] == "aa"       # max weight 2, min obj
    assert got.loc["s", "n_src"] == 2
    assert got.loc["t", "obj"] == "only"
