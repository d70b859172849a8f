"""Unit tests: DIPRE bootstrapping and the Bloom frontier filter."""

import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_mine_patterns_gap_and_direction(ray_session):
    from aida_ray.stages.bootstrap import mine_patterns
    docs = _ds(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["XQ was born in YQ.",
                 "YQ was born in XQ.",           # reversed: no match
                 "XQ " + "pad " * 30 + "YQ"]}))  # gap > 60: no match
    got = mine_patterns(docs, [("XQ", "YQ")]).to_pandas()
    assert len(got) == 1
    assert got.iloc[0]["pattern"] == "was born in"
    assert got.iloc[0]["n_support"] == 1


def test_apply_patterns_excludes_seeds(ray_session):
    from aida_ray.stages.bootstrap import apply_patterns
    docs = _ds(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["AQ works at BQ.", "CQ works at DQ. CQ works at DQ."]}))
    got = apply_patterns(docs, ["works at"], seeds=[("AQ", "BQ")]) \
        .to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["x"], r["y"], r["n"]) == ("CQ", "DQ", 2)


def test_bloom_new_urls_exact(ray_session):
    from aida_ray.stages.sketches import bloom_new_urls
    vis = _ds(pa.table({"url": [f"u{j}" for j in range(50)
                                if j % 2 == 0]}))
    cand = _ds(pa.table({"url": [f"u{j}" for j in range(50)] +
                         ["w1", "w2", "u1"]}))   # dup candidate
    got = sorted(bloom_new_urls(vis, cand, m_bits=1 << 10)
                 .to_pandas()["url"])
    exp = sorted([f"u{j}" for j in range(50) if j % 2 == 1] +
                 ["w1", "w2"])
    assert got == exp


def test_bloom_tiny_filter_still_exact(ray_session):
    # deliberately undersized bloom -> many false positives; the
    # exact verify pass must keep the output correct anyway
    from aida_ray.stages.sketches import bloom_new_urls
    vis = _ds(pa.table({"url": [f"a{j}" for j in range(200)]}))
    cand = _ds(pa.table({"url": [f"b{j}" for j in range(200)]}))
    got = bloom_new_urls(vis, cand, m_bits=64, k=2).to_pandas()
    assert sorted(got["url"]) == sorted(f"b{j}" for j in range(200))
