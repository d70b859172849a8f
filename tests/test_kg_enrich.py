"""Unit tests: selectional preference, PRA features, name aliases,
set expansion, mirror hosts."""

import math

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_selectional_preference_values(ray_session):
    from aida_ray.stages.sparql import selectional_preference
    # pA always -> T0 (selective); pB splits evenly (matches prior? no)
    triples = _ds(pa.table({
        "subj": ["s1", "s2", "s3", "s4"],
        "pred": ["pA", "pA", "pB", "pB"],
        "obj": ["x", "y", "x", "z"]}))
    types = _ds(pa.table({"entity": ["x", "y", "z"],
                          "type": ["T0", "T0", "T1"]}))
    got = selectional_preference(triples, types).to_pandas() \
        .set_index("pred")
    # priors: T0 3/4, T1 1/4
    # pA: p(T0|pA)=1 -> KL = ln(1/0.75)
    assert abs(got.loc["pA", "strength"] -
               round(math.log(1 / 0.75), 6)) < 1e-9
    # pB: 1/2 ln(.5/.75) + 1/2 ln(.5/.25)
    exp = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    assert abs(got.loc["pB", "strength"] - round(exp, 6)) < 1e-9
    assert got.loc["pA", "n_typed"] == 2


def test_selectional_preference_unknown_type(ray_session):
    from aida_ray.stages.sparql import selectional_preference
    triples = _ds(pa.table({"subj": ["s"], "pred": ["p"],
                            "obj": ["missing"]}))
    types = _ds(pa.table({"entity": ["x"], "type": ["T0"]}))
    got = selectional_preference(triples, types).to_pandas()
    assert got.iloc[0]["strength"] == 0.0     # single pred == prior


def test_pra_path_features_counts(ray_session):
    from aida_ray.stages.rules import pra_path_features
    # a -r1-> m1 -r2-> b ; a -r1-> m2 -r2-> b : 2 paths same type
    triples = _ds(pa.table({
        "subj": ["a", "a", "m1", "m2", "a"],
        "pred": ["r1", "r1", "r2", "r2", "r3"],
        "obj": ["m1", "m2", "b", "b", "b"]}))
    got = pra_path_features(triples).to_pandas()
    key = got.set_index(["src", "dst", "pred_a", "pred_b"])["n_paths"]
    assert key[("a", "b", "r1", "r2")] == 2
    assert len(got) == 1                      # r3 edge has no 2-hop


def test_pra_duplicate_facts_collapse(ray_session):
    from aida_ray.stages.rules import pra_path_features
    triples = _ds(pa.table({
        "subj": ["a", "a", "m", "m"],
        "pred": ["r", "r", "r", "r"],
        "obj": ["m", "m", "b", "b"]}))   # each fact asserted twice
    got = pra_path_features(triples).to_pandas()
    assert got.iloc[0]["n_paths"] == 1        # distinct facts only


def test_name_aliases_fold(ray_session):
    from aida_ray.stages.nil import name_aliases
    t = _ds(pa.table({"mention": pa.array(
        ["Smith, John", "John Smith", "John Smith", "Ada"])}))
    got = name_aliases(t).to_pandas().set_index("canonical")
    assert got.loc["John Smith", "n_variants"] == 2
    assert got.loc["John Smith", "n_mentions"] == 3
    assert got.loc["Ada", "n_variants"] == 1


def test_set_expansion_scores(ray_session):
    from aida_ray.stages.navigation import expand_set
    rows = [  # (doc, heading, item)
        (1, "h", "seed"), (1, "h", "cand1"), (1, "h", "cand2"),
        (2, "h", "seed"), (2, "h", "cand1"),
        (3, "h", "cand1"), (3, "h", "cand2"),   # no seed -> ignored
    ]
    t = _ds(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "heading": pa.array([r[1] for r in rows]),
        "item": pa.array([r[2] for r in rows])}))
    got = expand_set(t, ["seed"]).to_pandas().set_index("item")
    assert got.loc["cand1", "n_ctx"] == 2
    assert got.loc["cand2", "n_ctx"] == 1
    assert "seed" not in got.index


def test_mirror_hosts_threshold(ray_session):
    from aida_ray.stages.urls import mirror_hosts
    rows = [
        ("http://a.com/1", "same1"), ("http://a.com/2", "same2"),
        ("http://b.com/1", "same1"), ("http://b.com/2", "same2"),
        ("http://c.com/1", "other"),
    ]
    t = _ds(pa.table({"url": pa.array([r[0] for r in rows]),
                      "text": pa.array([r[1] for r in rows])}))
    got = mirror_hosts(t, threshold=0.5).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["host_a"], r["host_b"]) == ("a.com", "b.com")
    assert r["jaccard"] == 1.0
