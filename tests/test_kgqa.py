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
