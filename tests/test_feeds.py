from aida_ray.sources.feeds import (_parse_rfc822, _parse_w3c,
                                    parse_feed_bytes, write_atom_file,
                                    write_rss_file)


def test_rfc822_dates():
    assert _parse_rfc822("Thu, 01 Jan 2026 00:00:05 GMT") == 1767225605
    assert _parse_rfc822("01 Jan 2026 00:00:05 +0000") == 1767225605
    assert _parse_rfc822("Thu, 01 Jan 2026 01:00:00 +0100") == 1767225600
    assert _parse_rfc822(None) == -1
    assert _parse_rfc822("garbage") == -1


def test_w3c_dates():
    assert _parse_w3c("2026-01-01T00:00:05Z") == 1767225605
    assert _parse_w3c("2026-01-01T00:00:05+00:00") == 1767225605
    assert _parse_w3c("bad") == -1


def test_rss_parse_and_roundtrip(tmp_path):
    p = tmp_path / "f" / "a.xml"
    write_rss_file(str(p), [("http://x/1", "One", 1767225601),
                            ("http://x/2", "Two", -1)])
    t = parse_feed_bytes(p.read_bytes(), "a.xml")
    assert t["url"].to_pylist() == ["http://x/1", "http://x/2"]
    assert t["title"].to_pylist() == ["One", "Two"]
    assert t["published_s"].to_pylist() == [1767225601, -1]
    assert t["feed_kind"].to_pylist() == ["rss", "rss"]
    assert t["source"].to_pylist() == ["a.xml", "a.xml"]


def test_atom_parse_and_roundtrip(tmp_path):
    p = tmp_path / "f" / "b.xml"
    write_atom_file(str(p), [("http://y/1", "Uno", 1767225602)])
    t = parse_feed_bytes(p.read_bytes(), "b.xml")
    assert t["url"].to_pylist() == ["http://y/1"]
    assert t["feed_kind"].to_pylist() == ["atom"]
    assert t["published_s"].to_pylist() == [1767225602]


def test_malformed_and_itemless():
    assert parse_feed_bytes(b"<not xml").num_rows == 0
    assert parse_feed_bytes(b"<rss><channel></channel></rss>").num_rows == 0
    # item without link is skipped
    t = parse_feed_bytes(
        b"<rss><channel><item><title>t</title></item>"
        b"<item><link>http://z</link></item></channel></rss>")
    assert t["url"].to_pylist() == ["http://z"]


def test_read_feeds_dataset(ray_session, tmp_path):
    from aida_ray.sources.feeds import read_feeds
    write_rss_file(str(tmp_path / "d" / "r.xml"),
                   [("http://a", "A", 1767225600)])
    write_atom_file(str(tmp_path / "d" / "s.xml"),
                    [("http://b", "B", 1767225601)])
    out = read_feeds(str(tmp_path / "d")).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert list(out.url) == ["http://a", "http://b"]
    assert list(out.feed_kind) == ["rss", "atom"]
    assert list(out.source) == ["r.xml", "s.xml"]
