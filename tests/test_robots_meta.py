import pyarrow as pa

from aida_ray.text.extract import extract_meta


def test_extract_meta_full_and_missing():
    h = (b'<html><head><title> A &amp; B </title>'
         b'<meta name="description" content="hello world">'
         b'<link rel="canonical" href="http://x/y"></head></html>')
    assert extract_meta(h) == {"title": "A & B",
                               "description": "hello world",
                               "canonical": "http://x/y"}
    assert extract_meta(b"<p>no head</p>") == {
        "title": "", "description": "", "canonical": ""}


def test_extract_meta_first_wins_and_comments():
    h = (b'<!-- <title>fake</title> -->'
         b'<title>real</title><title>second</title>')
    assert extract_meta(h)["title"] == "real"


def _parse(host, body, agent="*"):
    import ray.data
    from aida_ray.stages.links import parse_robots
    t = pa.table({"host": pa.array([host], pa.string()),
                  "body": pa.array([body], pa.string())})
    out = parse_robots(ray.data.from_arrow(t), agent=agent).to_pandas()
    if not len(out):          # empty datasets lose their schema in Ray
        return []
    return list(zip(out.host, out.prefix))


def test_parse_robots_groups(ray_session):
    body = ("User-agent: foo\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /b\nDisallow: /c\n")
    assert _parse("EX.com", body) == [("ex.com", "/b"), ("ex.com", "/c")]
    # named agent picks up both its group and *
    assert _parse("ex.com", body, agent="foo") == [
        ("ex.com", "/a"), ("ex.com", "/b"), ("ex.com", "/c")]


def test_parse_robots_multi_agent_group_and_noise(ray_session):
    body = ("# top comment\n"
            "User-agent: a\nUser-agent: *\n"
            "Disallow: /x # trailing comment\n"
            "Crawl-delay: 10\n"
            "Disallow:\n"
            "Disallow: /y\n")
    assert _parse("h", body) == [("h", "/x"), ("h", "/y")]


def test_parse_robots_no_matching_group(ray_session):
    body = "User-agent: nope\nDisallow: /z\n"
    assert _parse("h", body) == []
    assert _parse("h", "") == []
