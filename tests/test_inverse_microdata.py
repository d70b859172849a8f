"""Unit tests: mine_inverse_rules, microdata parsing, rel=next
parsing."""

import pyarrow as pa


def _triples(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows]}))


def test_inverse_rules_support_and_symmetry(ray_session):
    from aida_ray.stages.rules import mine_inverse_rules
    rows = [("a", "p", "b"), ("b", "q", "a"),      # p <-> q inverse
            ("c", "p", "d"),                       # p without inverse
            ("m", "s", "n"), ("n", "s", "m"),      # s symmetric
            ("z", "r", "z"),                       # self-loop: r self-inv
            ("a", "p", "b")]                       # duplicate ignored
    got = mine_inverse_rules(_triples(rows)).to_pandas() \
        .set_index(["body_pred", "head_pred"])
    assert got.loc[("p", "q"), "support"] == 1
    assert got.loc[("p", "q"), "body_size"] == 2
    assert abs(got.loc[("p", "q"), "confidence"] - 0.5) < 1e-9
    assert got.loc[("q", "p"), "confidence"] == 1.0
    # symmetric predicate: both orderings of (m, n) count
    assert got.loc[("s", "s"), "support"] == 2
    assert got.loc[("r", "r"), "support"] == 1     # self-loop once
    assert ("p", "p") not in got.index


def test_microdata_nested_fallbacks():
    from aida_ray.stages.webtables import microdata_triples_of
    h = ('<div itemscope itemtype="http://schema.org/Person">'
         '<span itemprop="name"> Ada  Lovelace </span>'
         '<span itemprop="born"><b>1815</b></span></div>'
         '<div itemscope itemtype="Thing"><i itemprop="x">v</i></div>')
    got = microdata_triples_of(h)
    assert ("Ada Lovelace", "@type", "Person") in got
    assert ("Ada Lovelace", "born", "1815") in got     # tags stripped
    assert ("Thing#1", "@type", "Thing") in got        # nameless scope
    assert ("Thing#1", "x", "v") in got
    assert microdata_triples_of("<p>none</p>") == []


def test_parse_next_links(ray_session):
    import ray.data
    from aida_ray.stages.links import parse_next_links
    pages = ray.data.from_arrow(pa.table({
        "url_id": [1, 2, 3],
        "html": pa.array(
            [b'<link rel="next" href="/p2">',
             b"<p>terminal page</p>",
             b'<link rel="prev" href="/p2">'
             b'<link rel="next" href="/p4">'], pa.binary())}))
    got = parse_next_links(pages).to_pandas().set_index("url_id")
    assert got.loc[1, "next_href"] == "/p2"
    assert got.loc[3, "next_href"] == "/p4"
    assert 2 not in got.index
