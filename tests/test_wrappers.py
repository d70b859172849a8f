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
