"""Clustering metrics (stages/cluster_eval.py) — hand-computed goldens."""

import pyarrow as pa


def _ds(items, vals, col):
    import ray
    return ray.data.from_arrow(pa.table({
        "item": pa.array([str(i) for i in items], pa.string()),
        col: pa.array([str(v) for v in vals], pa.string())}))


def test_perfect_clustering(ray_session):
    from aida_ray.stages.cluster_eval import cluster_metrics
    items = list(range(6))
    labels = [0, 0, 1, 1, 2, 2]
    t = cluster_metrics(_ds(items, labels, "cluster"),
                        _ds(items, labels, "gold")).to_pandas()
    for c in ("bcubed_p_1e6", "bcubed_r_1e6", "bcubed_f1_1e6",
              "pair_p_1e6", "pair_r_1e6", "pair_f1_1e6", "ari_1e6"):
        assert t[c][0] == 1_000_000, c
    assert t.n_items[0] == 6


def test_hand_computed_mixed(ray_session):
    """gold = {a,b,c} + {d}; system = {a,b} + {c,d}.
    B3 P = (1+1+.5+.5)/4 = .75 ; B3 R = (2/3+2/3+1/3+1)/4 = 2/3.
    pairs: tp=1, sys=2, gold=3 -> P=.5, R=1/3, F1=.4.
    ARI = (1 - 2*3/6) / ((2+3)/2 - 2*3/6) = 0."""
    from aida_ray.stages.cluster_eval import cluster_metrics
    items = ["a", "b", "c", "d"]
    sysc = [0, 0, 1, 1]
    gold = [0, 0, 0, 1]
    t = cluster_metrics(_ds(items, sysc, "cluster"),
                        _ds(items, gold, "gold")).to_pandas()
    assert t.bcubed_p_1e6[0] == 750_000
    assert t.bcubed_r_1e6[0] == 666_667
    assert t.pair_p_1e6[0] == 500_000
    assert t.pair_r_1e6[0] == 333_333
    assert t.pair_f1_1e6[0] == 400_000
    assert t.ari_1e6[0] == 0


def test_singleton_gold_no_crash(ray_session):
    """All-singleton gold: pairwise recall undefined -> 0 by
    convention, no NaNs anywhere."""
    from aida_ray.stages.cluster_eval import cluster_metrics
    items = ["a", "b", "c"]
    t = cluster_metrics(_ds(items, [0, 0, 0], "cluster"),
                        _ds(items, [0, 1, 2], "gold")).to_pandas()
    assert t.pair_r_1e6[0] == 0 and t.pair_f1_1e6[0] == 0
    assert t.bcubed_r_1e6[0] == 1_000_000   # singletons fully recalled


def test_vocab_js_divergence_hand_computed(ray_session):
    """Two-token corpus: side0={a,a}, side1={b,b}.
    p(a)=1, q(b)=1 -> each contributes 0.5*ln(2); disjoint supports."""
    import math

    import pyarrow as pa
    import ray

    from aida_ray.stages.textstats import vocab_js_divergence
    t = pa.table({"side": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["a a", "b b"], pa.string())})
    got = vocab_js_divergence(ray.data.from_arrow(t), "side") \
        .to_pandas().set_index("term")
    half_ln2 = round(0.5 * math.log(2) * 1e9)
    assert got.loc["a", "contrib_1e9"] == half_ln2
    assert got.loc["b", "contrib_1e9"] == half_ln2
    assert got.loc["a", "p_1e9"] == 1_000_000_000
    assert got.loc["a", "q_1e9"] == 0


def test_vocab_js_divergence_identical_sides(ray_session):
    import pyarrow as pa
    import ray

    from aida_ray.stages.textstats import vocab_js_divergence
    t = pa.table({"side": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["x y z", "x y z"], pa.string())})
    got = vocab_js_divergence(ray.data.from_arrow(t), "side").to_pandas()
    assert (got.contrib_1e9 == 0).all()


def test_leakage_aware_split(ray_session):
    """Cluster members share a split; unclustered docs behave exactly
    like hash_split (same Knuth rule on their own id)."""
    import ray

    from aida_ray.stages.sampling import (hash_split, leakage_aware_split,
                                          leakage_count)
    ids = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    # pairs chain 0-1-2 and 50-51 into clusters
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([0, 1, 50], pa.int64()),
        "b": pa.array([1, 2, 51], pa.int64())}))
    clusters = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 50, 51], pa.int64()),
        "cluster": pa.array([0, 0, 0, 50, 50], pa.int64())}))
    aware = leakage_aware_split(ray.data.from_arrow(ids),
                                clusters).materialize()
    df = aware.to_pandas().set_index("doc_id")
    assert len(set(df.loc[[0, 1, 2], "split"])) == 1
    assert len(set(df.loc[[50, 51], "split"])) == 1
    assert leakage_count(aware, pairs) == 0
    naive = hash_split(ray.data.from_arrow(ids)).materialize()
    ndf = naive.to_pandas().set_index("doc_id")
    # unclustered docs: identical decision under both schemes
    free = [i for i in range(100) if i not in (0, 1, 2, 50, 51)]
    assert (df.loc[free, "split"] == ndf.loc[free, "split"]).all()


def test_unicode_clean_batch():
    import pyarrow as pa

    from aida_ray.stages.textstats import unicode_clean_batch
    b = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["é nfd", "z​w\x07ctrl", "plain\tok\n"],
                         pa.string())})
    t = unicode_clean_batch(b).to_pandas().set_index("doc_id")
    assert t.loc[1, "clean_text"] == "é nfd"      # composed
    assert bool(t.loc[1, "nfc_changed"]) is True
    assert t.loc[2, "clean_text"] == "zwctrl"
    assert t.loc[2, "n_zw"] == 1 and t.loc[2, "n_ctrl"] == 1
    # tab and newline survive the control strip
    assert t.loc[3, "clean_text"] == "plain\tok\n"
    assert not t.loc[3, "nfc_changed"]
