"""Politeness scheduling, charset sniffing, tag fingerprints."""

import hashlib

import pyarrow as pa

import ray.data as rd


def test_politeness_schedule_orders_and_spaces(ray_session):
    from aida_ray.stages.urls import politeness_schedule
    t = pa.table({
        "host": ["a", "a", "a", "b"],
        "url": ["u3", "u1", "u2", "u9"],
        "priority": pa.array([0, 5, 5, 1], pa.int64())})
    got = politeness_schedule(rd.from_arrow(t).repartition(2),
                              delay_s=3).to_pandas()
    by = {(r.host, r.url): r.fetch_at_s for r in got.itertuples()}
    # host a: u1 (p5) first, u2 (p5, later url), u3 (p0) last
    assert by[("a", "u1")] == 0
    assert by[("a", "u2")] == 3
    assert by[("a", "u3")] == 6
    assert by[("b", "u9")] == 0


def test_sniff_charset_routes():
    from aida_ray.text.extract import sniff_charset
    assert sniff_charset(b"\xef\xbb\xbfhello") == ("utf-8-bom", "bom")
    assert sniff_charset(b"\xff\xfex\x00") == ("utf-16-le", "bom")
    assert sniff_charset(b"\xfe\xff\x00x") == ("utf-16-be", "bom")
    assert sniff_charset(b'<meta charset="ISO-8859-1">') == \
        ("iso-8859-1", "meta")
    assert sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=Windows-1251">') == \
        ("windows-1251", "http-equiv")
    assert sniff_charset(b"<html>plain") == ("utf-8", "default")
    # meta beyond the probe window falls back to the default
    far = b" " * 2000 + b'<meta charset="KOI8-R">'
    assert sniff_charset(far) == ("utf-8", "default")


def test_tag_fingerprint_template_collision():
    from aida_ray.text.extract import tag_fingerprint
    a = tag_fingerprint("<html><body><p>one</p></body></html>")
    b = tag_fingerprint("<html><body><p>completely other text"
                        "</p></body></html>")
    c = tag_fingerprint("<html><body><div>x</div></body></html>")
    assert a["fp"] == b["fp"] != c["fp"]
    assert a["n_tags"] == 3 and a["n_distinct_tags"] == 3
    # closing tags and comments don't count; case-insensitive
    d = tag_fingerprint("<HTML><BODY><P>z</P></BODY></HTML>")
    assert d["fp"] == a["fp"]
    assert tag_fingerprint("")["fp"] == \
        hashlib.md5(b"").hexdigest()
