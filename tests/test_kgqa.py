import pyarrow as pa

from aida_ray.stages.kgqa import dangling_objects, functional_violations


def _triples(rows):
    return pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string())})


def test_functional_violations(ray_session):
    import ray.data
    rows = [
        ("a", "bornIn", "x"), ("a", "bornIn", "y"),   # violation (2 objs)
        ("a", "bornIn", "x"),                          # dup assertion
        ("b", "bornIn", "x"),                          # fine
        ("c", "linksTo", "x"), ("c", "linksTo", "y"),  # not functional
    ]
    out = functional_violations(
        ray.data.from_arrow(_triples(rows)).repartition(3),
        functional_preds=["bornIn"]).to_pandas()
    assert len(out) == 1
    assert out.subj.iloc[0] == "a"
    assert out.pred.iloc[0] == "bornIn"
    assert out.n_obj.iloc[0] == 2


def test_functional_violations_none(ray_session):
    import ray.data
    rows = [("a", "bornIn", "x"), ("b", "bornIn", "y")]
    out = functional_violations(ray.data.from_arrow(_triples(rows)),
                                functional_preds=["bornIn"]).to_pandas()
    assert len(out) == 0


def test_dangling_objects_broadcast_and_join_routes(ray_session):
    import ray.data
    rows = [("a", "p", "e1"), ("b", "p", "e9"), ("c", "p", "e9"),
            ("d", "p", "e2")]
    tr = ray.data.from_arrow(_triples(rows)).repartition(2)
    ents = ray.data.from_arrow(pa.table(
        {"entity": pa.array(["e1", "e2", "e3"], pa.string())}))
    small = dangling_objects(tr, ents).to_pandas()
    assert len(small) == 1
    assert small.obj.iloc[0] == "e9" and small.n_refs.iloc[0] == 2
    big = dangling_objects(tr, ents, broadcast_rows=1).to_pandas()
    assert small.sort_values("obj").reset_index(drop=True).equals(
        big.sort_values("obj").reset_index(drop=True))


def test_dangling_objects_all_known(ray_session):
    import ray.data
    rows = [("a", "p", "e1")]
    ents = ray.data.from_arrow(pa.table(
        {"entity": pa.array(["e1"], pa.string())}))
    out = dangling_objects(ray.data.from_arrow(_triples(rows)),
                           ents).to_pandas()
    assert len(out) == 0


def test_negative_samples_deterministic_and_noncolliding(ray_session):
    import numpy as np
    import ray.data
    from aida_ray.stages.kgqa import negative_samples
    ents = [f"e{i}" for i in range(5)]
    t = pa.table({
        "ex_id": pa.array([0, 1, 2, 3], pa.int64()),
        "subj": pa.array(["s"] * 4, pa.string()),
        "pred": pa.array(["p"] * 4, pa.string()),
        "obj": pa.array(["e1", "e2", "e3", "e4"], pa.string())})
    ds = ray.data.from_arrow(t).repartition(2)
    out = negative_samples(ds, ents, k=2).to_pandas() \
        .sort_values(["ex_id", "j"]).reset_index(drop=True)
    assert len(out) == 8
    # replay the draw locally
    K = 2654435761
    for r in out.itertuples():
        idx = (r.ex_id * K + r.j) % 5
        true_obj = {0: "e1", 1: "e2", 2: "e3", 3: "e4"}[r.ex_id]
        want = f"e{idx}"
        if want == true_obj:
            want = f"e{(idx + 1) % 5}"
        assert r.neg_obj == want
        assert r.neg_obj != true_obj
        assert r.label == 0
    # blocking invariance
    out2 = negative_samples(ray.data.from_arrow(t), ents, k=2).to_pandas() \
        .sort_values(["ex_id", "j"]).reset_index(drop=True)
    assert out.equals(out2)


def test_negative_samples_guards(ray_session):
    import pytest
    import ray.data
    from aida_ray.stages.kgqa import negative_samples
    t = pa.table({"ex_id": pa.array([1], pa.int64()),
                  "subj": pa.array(["s"], pa.string()),
                  "pred": pa.array(["p"], pa.string()),
                  "obj": pa.array(["e0"], pa.string())})
    with pytest.raises(ValueError, match="at least 2"):
        negative_samples(ray.data.from_arrow(t), ["e0"])
    big = pa.table({"ex_id": pa.array([1 << 40], pa.int64()),
                    "subj": pa.array(["s"], pa.string()),
                    "pred": pa.array(["p"], pa.string()),
                    "obj": pa.array(["e0"], pa.string())})
    with pytest.raises(Exception, match="31 bits"):
        negative_samples(ray.data.from_arrow(big),
                         ["e0", "e1"]).to_pandas()
