"""Unit tests: metapath_counts, pred_cardinality, nil_cluster_ids."""

import pyarrow as pa


def _triples(rows):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "subj": [r[0] for r in rows],
        "pred": [r[1] for r in rows],
        "obj": [r[2] for r in rows]}))


def test_metapath_counts(ray_session):
    from aida_ray.stages.kgprofile import metapath_counts
    rows = [("a", "p1", "b"), ("b", "p2", "c"), ("b", "p2", "d"),
            ("a", "p1", "b"),               # duplicate fact: ignored
            ("d", "p2", "a"),               # p2 o p1 via a
            ("c", "p3", "c")]               # self-loop composes with itself
    got = metapath_counts(_triples(rows)).to_pandas()
    m = got.set_index(["pred_a", "pred_b"])["n_paths"]
    assert m[("p1", "p2")] == 2            # a-p1-b then b-p2-{c,d}
    assert m[("p2", "p1")] == 1            # d-p2-a then a-p1-b
    assert m[("p2", "p2")] == 1            # b-p2-d then d-p2-a
    assert m[("p2", "p3")] == 1            # b-p2-c then c-p3-c
    assert m[("p3", "p3")] == 1            # c-p3-c composes with itself
    assert len(got) == 5


def test_pred_cardinality_classes(ray_session):
    from aida_ray.stages.kgprofile import pred_cardinality
    rows = [
        ("a", "one2one", "x"), ("b", "one2one", "y"),
        ("a", "one2many", "x"), ("a", "one2many", "y"),
        ("a", "many2one", "x"), ("b", "many2one", "x"),
        ("a", "many2many", "x"), ("a", "many2many", "y"),
        ("b", "many2many", "x")]
    got = pred_cardinality(_triples(rows)).to_pandas() \
        .set_index("pred")
    assert got.loc["one2one", "card"] == "1:1"
    assert got.loc["one2many", "card"] == "1:N"
    assert got.loc["many2one", "card"] == "N:1"
    assert got.loc["many2many", "card"] == "N:M"
    assert got.loc["many2many", "n_facts"] == 3
    assert got.loc["many2many", "n_subj"] == 2
    assert got.loc["many2many", "n_obj"] == 2
    assert got.loc["one2many", "max_out"] == 2
    assert got.loc["many2one", "max_in"] == 2


def test_nil_cluster_ids(ray_session):
    import ray.data
    from aida_ray.stages.nil import nil_cluster_ids
    t = ray.data.from_arrow(pa.table({
        "doc_id": [5, 1, 1, 3, 9, 9],
        "mention": ["Acme-Corp", "ACME   corp!", "Bolt", "acme corp",
                    "Bolt", "..."]}))       # "..." normalizes empty
    got = nil_cluster_ids(t).to_pandas().set_index("surface")
    assert len(got) == 2
    acme = got.loc["acme corp"]
    assert acme["n_mentions"] == 3 and acme["n_docs"] == 3
    assert acme["first_doc"] == 1
    bolt = got.loc["bolt"]
    assert bolt["n_mentions"] == 2 and bolt["n_docs"] == 2
    # both first appear in doc 1: tie broken by surface asc
    assert acme["nil_id"] == 1 and bolt["nil_id"] == 2


def test_metapath_counts_hub_product(ray_session):
    """Hub node with 40 in-edges (A) and 50 out-edges (B) must yield
    exactly 40*50 paths — the count-product identity the distributed
    shape relies on (no path-instance materialization)."""
    import pyarrow as pa
    import ray

    from aida_ray.stages.kgprofile import metapath_counts
    subj = [f"x{i}" for i in range(40)] + ["hub"] * 50
    pred = ["A"] * 40 + ["B"] * 50
    obj = ["hub"] * 40 + [f"z{i}" for i in range(50)]
    t = pa.table({"subj": subj, "pred": pred, "obj": obj})
    got = metapath_counts(ray.data.from_arrow(t)).to_pandas()
    row = got[(got.pred_a == "A") & (got.pred_b == "B")]
    assert int(row.n_paths.iloc[0]) == 2000
    assert len(got) == 1
