"""Sitemap source tests: urlset round-trip, sitemapindex rows,
protocol defaults, lenient malformed handling, date-only lastmod."""

import os

import pyarrow as pa

from aida_ray.sources.sitemap import (parse_sitemap_bytes, read_sitemaps,
                                      write_sitemap_file,
                                      write_sitemap_index)


def test_urlset_roundtrip(tmp_path, ray_session):
    p = str(tmp_path / "maps" / "a.xml")
    write_sitemap_file(p, ["http://x/1", "http://x/2"],
                       lastmods_s=[100, -1], priorities=[0.3, 0.8])
    t = read_sitemaps(str(tmp_path / "maps")).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(t["url"]) == ["http://x/1", "http://x/2"]
    assert list(t["lastmod_s"]) == [100, -1]
    assert list(t["priority"]) == [0.3, 0.8]
    assert not t["is_index"].any()
    assert set(t["source"]) == {"a.xml"}


def test_index_rows_flagged(tmp_path, ray_session):
    write_sitemap_index(str(tmp_path / "m" / "index.xml"),
                        ["http://x/maps/s1.xml", "http://x/maps/s2.xml"])
    t = read_sitemaps(str(tmp_path / "m")).to_pandas()
    assert t["is_index"].all() and len(t) == 2
    assert list(t["lastmod_s"]) == [-1, -1]
    assert list(t["priority"]) == [0.5, 0.5]


def test_defaults_and_date_only():
    xml = (b'<?xml version="1.0"?>'
           b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           b'<url><loc>http://x/a</loc><lastmod>2026-01-02</lastmod></url>'
           b'<url><loc>http://x/b</loc></url>'
           b'<url><lastmod>2026-01-01</lastmod></url>'   # no loc: skipped
           b'</urlset>')
    t = parse_sitemap_bytes(xml, "s.xml")
    assert t["url"].to_pylist() == ["http://x/a", "http://x/b"]
    assert t["lastmod_s"].to_pylist() == [1767312000, -1]
    assert t["priority"].to_pylist() == [0.5, 0.5]


def test_malformed_is_lenient():
    t = parse_sitemap_bytes(b"<urlset><broken", "bad.xml")
    assert len(t) == 0
    assert t.schema.names == ["url", "lastmod_s", "priority",
                              "is_index", "source"]


def test_frontier_rank_politeness(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from aida_ray.stages.urls import frontier_rank
    hosts = ["a", "a", "a", "b", "b", "c"]
    urls = [f"http://{h}/{i}" for i, h in enumerate(hosts)]
    t = frontier_rank(
        rd.from_arrow(pa.table({"host": hosts, "url": urls}))
        .repartition(3)).to_pandas()
    t = t.sort_values(["rn", "host"]).reset_index(drop=True)
    # round-robin: first wave covers every host once
    assert list(t.loc[t["rn"] == 1, "host"]) == ["a", "b", "c"]
    assert list(t.loc[t["rn"] == 2, "host"]) == ["a", "b"]
    assert list(t.loc[t["rn"] == 3, "host"]) == ["a"]
    # rn is the position in the host's sorted url list
    a = t[t["host"] == "a"].sort_values("rn")
    assert list(a["url"]) == sorted(a["url"])
