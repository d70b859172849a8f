"""Inverted-index stats + TF-IDF: DuckDB parity on a synthetic corpus,
blocking invariance, deterministic top-k ranking."""

import numpy as np
import pyarrow as pa

import ray.data as rd

DOCS = pa.table({
    "doc_id": [1, 2, 3, 4],
    "text": ["the cat sat on the mat",
             "the dog sat",
             "cat dog cat",
             "mat! mat, CAT?"],   # punctuation splits; case folds
})


def test_term_stats_matches_duckdb(ray_session):
    from aida_ray.stages.tfidf import term_stats
    import duckdb
    out = term_stats(rd.from_arrow(DOCS).repartition(3)).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    d = DOCS  # noqa: F841 — registered below
    ref = duckdb.connect().execute("""
        WITH terms AS (
            SELECT doc_id, unnest(regexp_split_to_array(lower(text),
                '[^a-z0-9]+')) AS term FROM d)
        SELECT term, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS tf
        FROM terms WHERE term <> '' GROUP BY term ORDER BY term
    """).df()
    import pandas as pd
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_tfidf_top_terms_ranking(ray_session):
    from aida_ray.stages.tfidf import tfidf_top_terms
    out = tfidf_top_terms(rd.from_arrow(DOCS), k=2).to_pandas()
    d3 = out[out.doc_id == 3].reset_index(drop=True)
    # doc 3: cat tf=2 ranks first; dog tf=1
    assert d3.term.tolist() == ["cat", "dog"]
    assert d3.tf.tolist() == [2, 1]
    # tfidf = tf * ln(N/df); cat df=3, dog df=2, N=4
    assert np.isclose(d3.tfidf[0], 2 * np.log(4 / 3))
    assert np.isclose(d3.tfidf[1], 1 * np.log(4 / 2))
    # blocking invariance
    out7 = tfidf_top_terms(rd.from_arrow(DOCS).repartition(4), k=2) \
        .to_pandas()
    a = out.sort_values(["doc_id", "term"]).reset_index(drop=True)
    b = out7.sort_values(["doc_id", "term"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


def test_rare_gram_doc_pairs_bruteforce(ray_session):
    import itertools
    import re

    from aida_ray.stages.tfidf import rare_gram_doc_pairs
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, rng.integers(6, 40)))
            for _ in range(60)]
    # plant a shared rare phrase in three docs
    docs[3] += " alpha beta gamma delta epsilon"
    docs[17] += " alpha beta gamma delta epsilon"
    docs[42] += " zeta alpha beta gamma delta epsilon"
    ds = rd.from_arrow(pa.table({
        "doc_id": np.arange(60, dtype="int64"),
        "text": docs})).repartition(4)
    out = rare_gram_doc_pairs(ds, n=3, df_min=2, df_max=5,
                              min_shared=2).to_pandas()
    # brute force
    def grams(t):
        w = [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    gsets = [grams(t) for t in docs]
    df = {}
    for gs in gsets:
        for g in gs:
            df[g] = df.get(g, 0) + 1
    rare = {g for g, c in df.items() if 2 <= c <= 5}
    ref = {}
    for i, j in itertools.combinations(range(60), 2):
        shared = len(gsets[i] & gsets[j] & rare)
        if shared >= 2:
            ref[(i, j)] = shared
    got = {(a, b): n for a, b, n in zip(out.a, out.b, out.n_shared)}
    assert got == ref
    assert (3, 17) in got and (3, 42) in got
