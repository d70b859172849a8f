"""Unit tests: transitive_reduction, source_agreement, doc_novelty."""

import numpy as np
import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_transitive_reduction_flags(ray_session):
    from aida_ray.stages.kgprofile import transitive_reduction
    # chain 3->2->1->0 with shortcuts 3->1 (2-path) and 3->0 (3-path)
    edges = [(3, 2), (2, 1), (1, 0), (3, 1), (3, 0), (3, 2)]  # dup edge
    t = _ds(pa.table({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]}))
    got = transitive_reduction(t, max_depth=4).to_pandas()
    m = got.set_index(["src", "dst"])["redundant"]
    assert len(got) == 5                       # dup edge collapsed
    assert not m[(3, 2)] and not m[(2, 1)] and not m[(1, 0)]
    assert m[(3, 1)] and m[(3, 0)]


def test_transitive_reduction_diamond(ray_session):
    from aida_ray.stages.kgprofile import transitive_reduction
    # diamond a->b->d, a->c->d, plus direct a->d (redundant twice over)
    edges = [(10, 8), (10, 9), (8, 7), (9, 7), (10, 7)]
    t = _ds(pa.table({"src": [e[0] for e in edges],
                      "dst": [e[1] for e in edges]}))
    got = transitive_reduction(t, max_depth=3).to_pandas()
    m = got.set_index(["src", "dst"])["redundant"]
    assert m[(10, 7)]
    assert m.sum() == 1                        # only the direct edge


def test_source_agreement_jaccard(ray_session):
    from aida_ray.stages.truth import source_agreement
    rows = [("a", "k1", "v"), ("a", "k2", "v"), ("a", "k2", "v"),
            ("b", "k1", "v"), ("b", "k3", "v"),
            ("c", "k9", "x")]
    t = _ds(pa.table({"source": [r[0] for r in rows],
                      "key": [r[1] for r in rows],
                      "value": [r[2] for r in rows]}))
    got = source_agreement(t).to_pandas() \
        .set_index(["src_a", "src_b"])
    ab = got.loc[("a", "b")]
    assert ab["inter"] == 1                    # k1 only; dup collapsed
    assert ab["size_a"] == 2 and ab["size_b"] == 2
    assert abs(ab["jaccard"] - round(1 / 3, 6)) < 1e-9
    # c shares nothing -> no row at all
    assert ("a", "c") not in got.index and ("b", "c") not in got.index


def test_doc_novelty_rare_vs_common(ray_session):
    from aida_ray.stages.tfidf import doc_novelty
    t = _ds(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["common common", "common rareword",
                 "common", ""]}))
    got = doc_novelty(t).to_pandas().set_index("doc_id")
    # df: common=3 docs, rareword=1; N=4
    idf_c, idf_r = np.log(4 / 3), np.log(4 / 1)
    assert abs(got.loc[0, "novelty"] - round(idf_c, 6)) < 1e-9
    assert abs(got.loc[1, "novelty"]
               - round((idf_c + idf_r) / 2, 6)) < 1e-9
    assert got.loc[1, "novelty"] > got.loc[0, "novelty"]
    assert got.loc[3, "n_tokens"] == 0 and got.loc[3, "novelty"] == 0.0
