"""Unit tests: spam_scores, sentiment_scores, textrank_keywords,
extract_headings."""

import numpy as np
import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_spam_scores_flags(ray_session):
    from aida_ray.stages.webstats import spam_scores
    t = _ds(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["buy Buy BUY buy cheap buy pills buy now buy",  # stuffing
                 "a quiet stream of varied tokens runs here",
                 "",                                             # empty
                 "x " * 50]}))                                   # 1 distinct
    got = spam_scores(t).to_pandas().set_index("doc_id")
    # doc 0: 'buy' 7/10 tokens -> concentration .7 -> spam
    assert got.loc[0, "top_tf"] == 7 and got.loc[0, "n_tokens"] == 10
    assert bool(got.loc[0, "is_spam"])
    assert not bool(got.loc[1, "is_spam"])
    assert got.loc[2, "n_tokens"] == 0 and not bool(got.loc[2, "is_spam"])
    assert bool(got.loc[3, "is_spam"])      # 1 distinct over 50
    assert got.loc[3, "entropy"] == 0.0
    # entropy of uniform-2: ln 2
    two = spam_scores(_ds(pa.table({"doc_id": [9],
                                    "text": ["aa bb"]}))).to_pandas()
    assert abs(two["entropy"][0] - round(np.log(2), 6)) < 1e-9


def test_sentiment_labels(ray_session):
    from aida_ray.stages.webstats import sentiment_scores
    t = _ds(pa.table({
        "doc_id": [0, 1, 2],
        "text": ["good great day", "awful terrible", "nothing here"]}))
    got = sentiment_scores(t).to_pandas().set_index("doc_id")
    assert got.loc[0, "score"] == 6 and got.loc[0, "label"] == "pos"
    assert got.loc[1, "score"] == -6 and got.loc[1, "label"] == "neg"
    assert got.loc[2, "score"] == 0 and got.loc[2, "label"] == "neu"
    assert got.loc[2, "n_scored"] == 0


def test_textrank_matches_local_pagerank(ray_session):
    from aida_ray.stages.webstats import textrank_keywords
    texts = ["alpha beta gamma alpha", "beta gamma delta",
             "gamma alpha beta beta"]
    t = _ds(pa.table({"doc_id": list(range(3)), "text": texts}))
    got = textrank_keywords(t, k=10).to_pandas()
    # local power iteration over the same symmetric multigraph
    edges = []
    for txt in texts:
        toks = txt.split()
        for a, b in zip(toks, toks[1:]):
            edges += [(a, b), (b, a)]
    nodes = sorted({x for e in edges for x in e})
    idx = {w: i for i, w in enumerate(nodes)}
    n = len(nodes)
    outd = np.zeros(n)
    for a, _ in edges:
        outd[idx[a]] += 1
    r = np.full(n, 1 / n)
    for _ in range(10):
        mass = np.zeros(n)
        share = r / np.maximum(outd, 1.0)
        for a, b in edges:
            mass[idx[b]] += share[idx[a]]
        dang = r[outd == 0].sum()
        r = 0.15 / n + 0.85 * (mass + dang / n)
    want = {w: round(float(r[idx[w]]), 6) for w in nodes}
    assert len(got) == len(nodes)  # k=10 > vocab
    for _, row in got.iterrows():
        assert abs(row["rank"] - want[row["term"]]) < 2e-6, row["term"]


def test_textrank_empty(ray_session):
    from aida_ray.stages.webstats import textrank_keywords
    t = _ds(pa.table({"doc_id": [0], "text": ["solo"]}))
    # single token -> no pairs -> empty keyword table
    assert textrank_keywords(t).num_rows == 0


def test_extract_headings_nesting():
    from aida_ray.text.extract import extract_headings
    rows = extract_headings(
        "<h1>A</h1><h3>deep</h3><h2>B</h2><h1>C</h1><h6>tail</h6>")
    parents = [r["parent_idx"] for r in rows]
    assert parents == [-1, 0, 0, -1, 3]
    # normalization: entities + whitespace + attributes + case
    rows = extract_headings(
        b'<H2 class="x">  A &amp;\n B </H2><!-- <h1>no</h1> -->')
    assert rows == [{"idx": 0, "level": 2, "heading": "A & B",
                     "parent_idx": -1}]
    assert extract_headings("<p>none</p>") == []
