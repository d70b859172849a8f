"""Unit tests: wrapper_slots, disambiguation_pages, table_schema_groups."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_wrapper_slots_split(ray_session):
    from aida_ray.stages.boilerplate import wrapper_slots
    t = _ds(pa.table({
        "domain": ["a.com", "a.com", "b.com"],
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["Head\nPrice: 5\nFoot",
                 "Head\nPrice: 9\nFoot",
                 "Solo\nPage"]}))
    got = wrapper_slots(t).to_pandas()
    # a.com: pos 0/2 constant (template), pos 1 varies (slot)
    a = got[got.domain == "a.com"]
    assert set(a["pos"]) == {1}
    assert set(a["value"]) == {"Price: 5", "Price: 9"}
    # b.com has one page: no position varies, no slots
    assert (got.domain == "b.com").sum() == 0


def test_wrapper_slots_no_slots(ray_session):
    from aida_ray.stages.boilerplate import wrapper_slots
    t = _ds(pa.table({
        "domain": ["c.com", "c.com"],
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["same\nlines", "same\nlines"]}))
    assert wrapper_slots(t).count() == 0


def test_disambiguation_pages_parse(ray_session):
    from aida_ray.stages.hearst import disambiguation_pages
    txt = ("Mercury may refer to:\n"
           "- Mercury (planet)\n"
           "* Mercury (element)\n"
           "not a list item\n"
           "- Freddie Mercury\n")
    t = _ds(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": [txt, "no header here"]}))
    got = disambiguation_pages(t).to_pandas().sort_values("rank")
    assert list(got["surface"].unique()) == ["Mercury"]
    assert list(got["candidate"]) == [
        "Mercury (planet)", "Mercury (element)", "Freddie Mercury"]
    assert list(got["rank"]) == [1, 2, 3]


def test_table_schema_groups_stitch(ray_session):
    from aida_ray.stages.webtables import table_schema_groups
    h1 = (b'<table><tr><td>X</td><td>Y</td></tr>'
          b'<tr><td>1</td><td>2</td></tr></table>')
    h2 = (b'<table><tr><td>X</td><td>Y</td></tr>'
          b'<tr><td>3</td><td>4</td></tr>'
          b'<tr><td>5</td><td>6</td></tr></table>'
          b'<table><tr><td>Z</td></tr></table>')
    t = _ds(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "html": pa.array([h1, h2], pa.binary())}))
    got = table_schema_groups(t).to_pandas().set_index("schema_sig")
    assert got.loc["X|Y", "n_tables"] == 2
    assert got.loc["X|Y", "n_rows"] == 3
    assert got.loc["X|Y", "n_cols"] == 2
    assert got.loc["Z", "n_rows"] == 0   # header-only table


def test_all_markup_triples_single_pass(ray_session):
    from aida_ray.stages.webtables import all_markup_triples
    h = (b'<table><tr><td>name</td><td>p</td></tr>'
         b'<tr><td>S</td><td>V</td></tr></table>'
         b'<script type="application/ld+json">'
         b'{"name": "S", "p": "V"}</script>'
         b'<div itemscope itemtype="http://schema.org/Thing">'
         b'<span itemprop="name">S</span>'
         b'<span itemprop="p">V</span></div>')
    t = _ds(pa.table({"doc_id": pa.array([1], pa.int64()),
                      "html": pa.array([h], pa.binary())}))
    got = all_markup_triples(t).to_pandas()
    fact = got[(got.subj == "S") & (got.pred == "p") & (got.obj == "V")]
    assert sorted(fact["src"]) == ["jsonld", "microdata", "table"]


def test_noisy_or_fuse_composition(ray_session):
    import math
    from aida_ray.stages.fuse import noisy_or_fuse
    t = _ds(pa.table({
        "subj": ["S", "S", "S"], "pred": ["p"] * 3, "obj": ["V"] * 3,
        "conf": [0.6, 0.7, 0.8]}))
    got = noisy_or_fuse(t).to_pandas().iloc[0]
    assert got["n_src"] == 3
    assert got["max_conf"] == 0.8
    assert abs(got["fused"] - round(1 - 0.4 * 0.3 * 0.2, 6)) < 1e-9
