"""Unit tests: breadcrumbs, headed lists, hreflang alternate clusters."""

import pyarrow as pa


def _pages(rows, id_col="doc_id"):
    import ray.data
    return ray.data.from_arrow(pa.table({
        id_col: pa.array([r[0] for r in rows],
                         pa.int64() if id_col == "doc_id" else pa.string()),
        "html": pa.array([r[1] for r in rows], pa.binary())}))


def test_breadcrumb_trails_positions(ray_session):
    from aida_ray.stages.navigation import breadcrumb_trails
    h = (b'<nav class="breadcrumb"><a>Home</a> &gt; '
         b'<a> Books </a> &gt; <span>SciFi</span></nav>')
    got = breadcrumb_trails(_pages([(1, h), (2, b"<p>none</p>")])) \
        .to_pandas().sort_values("pos")
    assert list(got["crumb"]) == ["Home", "Books", "SciFi"]  # stripped
    assert list(got["pos"]) == [1, 2, 3]
    assert set(got["doc_id"]) == {1}


def test_breadcrumb_edges_counts(ray_session):
    from aida_ray.stages.navigation import breadcrumb_edges
    h = (b'<nav class="breadcrumb"><a>A</a><a>B</a><a>C</a></nav>')
    got = breadcrumb_edges(_pages([(1, h), (2, h)])).to_pandas()
    m = got.set_index(["parent", "child"])["n_pages"]
    assert m[("A", "B")] == 2 and m[("B", "C")] == 2
    assert len(got) == 2


def test_headed_lists_heading_scope(ray_session):
    from aida_ray.stages.navigation import headed_lists
    h = (b'<ul><li>pre</li></ul>'          # before any heading -> ''
         b'<h1>First</h1><ol><li>a</li><li>b</li></ol>'
         b'<h3>Second</h3><ul><li>c</li></ul>')
    got = headed_lists(_pages([(7, h)])).to_pandas()
    rows = {(r.heading, r.pos): r.item for r in got.itertuples()}
    assert rows[("", 1)] == "pre"
    assert rows[("First", 1)] == "a" and rows[("First", 2)] == "b"
    assert rows[("Second", 1)] == "c"


def test_hreflang_edges_attr_order(ray_session):
    from aida_ray.stages.navigation import hreflang_edges
    import ray.data
    h = (b'<link hreflang="de" href="http://x/de" rel="alternate">'
         b'<link rel="stylesheet" href="style.css">'
         b'<link rel="alternate" href="http://x/fr" hreflang="fr">')
    t = ray.data.from_arrow(pa.table({
        "url": pa.array(["http://x/en"]),
        "html": pa.array([h], pa.binary())}))
    got = hreflang_edges(t).to_pandas()
    assert set(zip(got.lang, got.alt_url)) == {
        ("de", "http://x/de"), ("fr", "http://x/fr")}


def test_alternate_clusters_chain(ray_session):
    # partial crawl: a->b, b->c edges only; all three must cluster
    from aida_ray.stages.navigation import alternate_clusters
    import ray.data
    e = ray.data.from_arrow(pa.table({
        "url": pa.array(["http://s/a", "http://s/b"]),
        "lang": pa.array(["de", "fr"]),
        "alt_url": pa.array(["http://s/b", "http://s/c"])}))
    got = alternate_clusters(e).to_pandas()
    assert set(got["rep"]) == {"http://s/a"}
    assert set(got["url"]) == {"http://s/a", "http://s/b", "http://s/c"}


def test_alternate_clusters_empty(ray_session):
    from aida_ray.stages.navigation import alternate_clusters
    import ray.data
    e = ray.data.from_arrow(pa.table({
        "url": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "alt_url": pa.array([], pa.string())}))
    assert alternate_clusters(e).count() == 0
