"""Unit tests: domain_range_violations, pred_value_formats, schema_graph."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def _types():
    return _ds(pa.table({"entity": ["a", "b", "c"],
                         "type": ["Person", "City", "Person"]}))


def test_domain_range_why(ray_session):
    from aida_ray.stages.kgqa import domain_range_violations
    triples = _ds(pa.table({
        "subj": ["a", "b", "b", "a", "a"],
        "pred": ["bornIn", "bornIn", "bornIn", "knows", "unchecked"],
        "obj": ["b", "b", "a", "c", "zzz"]}))
    schema = {"bornIn": ("Person", "City"), "knows": ("Person", "Person")}
    got = domain_range_violations(triples, _types(), schema) \
        .to_pandas().set_index(["subj", "pred", "obj"])["why"]
    assert got[("b", "bornIn", "b")] == "domain"     # City subj
    assert got[("b", "bornIn", "a")] == "both"       # City subj, Person obj
    assert len(got) == 2                             # ok + unchecked skipped


def test_domain_range_unknown_entity(ray_session):
    from aida_ray.stages.kgqa import domain_range_violations
    triples = _ds(pa.table({"subj": ["ghost"], "pred": ["knows"],
                            "obj": ["a"]}))
    got = domain_range_violations(
        triples, _types(), {"knows": ("Person", "Person")}).to_pandas()
    assert got.iloc[0]["why"] == "domain"            # unknown != Person


def test_pred_value_formats_precedence(ray_session):
    from aida_ray.stages.kgprofile import pred_value_formats
    t = _ds(pa.table({
        "pred": ["p"] * 6,
        "obj": ["42", "3.14", "2020-01-02", "https://x", "Ada", "éé"]}))
    got = pred_value_formats(t).to_pandas()
    m = dict(zip(got["fmt"], got["n"]))
    assert m == {"int": 1, "decimal": 1, "date": 1, "url": 1,
                 "name": 1, "other": 1}


def test_schema_graph_counts(ray_session):
    from aida_ray.stages.kgprofile import schema_graph
    triples = _ds(pa.table({
        "subj": ["a", "c", "a"],
        "pred": ["bornIn", "bornIn", "knows"],
        "obj": ["b", "b", "zzz"]}))
    got = schema_graph(triples, _types()).to_pandas() \
        .set_index(["subj_type", "pred", "obj_type"])["n"]
    assert got[("Person", "bornIn", "City")] == 2
    assert got[("Person", "knows", "unknown")] == 1
