"""Boilerplate line detection + URL template induction."""

import pyarrow as pa

import ray.data

from aida_ray.stages.boilerplate import boilerplate_lines
from aida_ray.stages.urls import url_path_templates


def test_boilerplate_threshold(ray_session):
    pages = ray.data.from_arrow(pa.table({
        "domain": pa.array(["d1"] * 4 + ["d2"], pa.string()),
        "text": pa.array([
            "copy\nunique1", "copy\nmenu\nunique2",
            "copy\nmenu\nunique3", "copy\nunique4",
            "other\nstuff"])}))
    out = boilerplate_lines(pages, min_frac=0.5).to_pandas()
    d1 = out[out["domain"] == "d1"].set_index("line")
    assert d1.loc["copy", "n_pages"] == 4
    assert d1.loc["copy", "frac"] == 1.0
    assert d1.loc["menu", "frac"] == 0.5
    assert "unique1" not in d1.index
    d2 = out[out["domain"] == "d2"].set_index("line")
    assert set(d2.index) == {"other", "stuff"}


def test_boilerplate_duplicate_lines_in_page_count_once(ray_session):
    pages = ray.data.from_arrow(pa.table({
        "domain": pa.array(["d"] * 2, pa.string()),
        "text": pa.array(["x\nx\nx", "y"])}))
    out = boilerplate_lines(pages, min_frac=0.5).to_pandas()
    row = out.set_index("line").loc["x"]
    assert row["n_pages"] == 1
    assert row["frac"] == 0.5


def test_url_templates(ray_session):
    paths = ray.data.from_arrow(pa.table({
        "path": pa.array(["/article/12/view", "/article/7/view",
                          "/static/css/main", "/item/900",
                          "/item/4"])}))
    out = url_path_templates(paths).to_pandas().set_index("template")
    assert out.loc["/article/{n}/view", "n_urls"] == 2
    assert out.loc["/article/{n}/view", "example"] == "/article/12/view"
    assert out.loc["/item/{n}", "n_urls"] == 2
    assert out.loc["/static/css/main", "n_urls"] == 1


def test_url_templates_mixed_segment_not_collapsed(ray_session):
    paths = ray.data.from_arrow(pa.table({
        "path": pa.array(["/v2/api", "/7a/api"])}))
    out = url_path_templates(paths).to_pandas()
    assert set(out["template"]) == {"/v2/api", "/7a/api"}
