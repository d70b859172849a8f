"""Unit tests: sameas_rewrite, latest_slot, form_endpoints,
string_components."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_string_components_chain(ray_session):
    from aida_ray.stages.graphs import string_components
    e = _ds(pa.table({"a": ["b", "c"], "b": ["a", "b"]}))
    got = string_components(e).to_pandas()
    assert set(got["rep"]) == {"a"}
    assert set(got["node"]) == {"a", "b", "c"}


def test_sameas_rewrite_merge(ray_session):
    from aida_ray.stages.kgqa import sameas_rewrite
    triples = _ds(pa.table({
        "subj": ["e1", "e2", "e3", "e1"],     # last is a duplicate
        "pred": ["p", "p", "p", "p"],
        "obj": ["v", "v", "w", "v"]}))
    sameas = _ds(pa.table({"a": ["e2"], "b": ["e1"]}))
    got = sameas_rewrite(triples, sameas).to_pandas() \
        .set_index(["subj", "obj"])
    # e1/e2 merge into e1: two distinct sources collapse
    assert got.loc[("e1", "v"), "n_src"] == 2
    # e3 outside the sameAs graph keeps its id
    assert got.loc[("e3", "w"), "n_src"] == 1
    assert len(got) == 2


def test_latest_slot_tiebreak(ray_session):
    from aida_ray.stages.temporal import latest_slot
    t = _ds(pa.table({
        "subj": ["s"] * 4, "pred": ["p"] * 4,
        "obj": ["old", "zz", "aa", "mid"],
        "ts": pa.array([1, 9, 9, 5], pa.int64())}))
    got = latest_slot(t).to_pandas().iloc[0]
    assert got["ts"] == 9 and got["obj"] == "aa"   # min obj at max ts


def test_form_endpoints_defaults(ray_session):
    from aida_ray.stages.navigation import form_endpoints
    h = (b'<form action="/a" method="POST"><input><input></form>'
         b'<form><input name="q"></form>')
    t = _ds(pa.table({"doc_id": pa.array([1], pa.int64()),
                      "html": pa.array([h], pa.binary())}))
    got = form_endpoints(t).to_pandas().sort_values("action") \
        .reset_index(drop=True)
    assert list(got["action"]) == ["", "/a"]
    assert list(got["method"]) == ["get", "post"]
    assert list(got["n_inputs"]) == [1, 2]
