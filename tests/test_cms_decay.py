"""Count-min sketch guarantees + decayed counts vs pure-python refs."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_cms_never_underestimates_and_bounds(ray_session):
    from aida_ray.stages.sketches import cms_counts, cms_estimate
    rng = np.random.default_rng(5)
    # zipf-ish key distribution with known exact counts
    keys = rng.zipf(1.5, 20_000) % 500
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})) \
        .repartition(8)
    d, w = 4, 1024
    mat = cms_counts(ds, "k", d=d, w=w)
    assert int(mat[0].sum()) == len(keys)
    uniq, exact = np.unique(keys, return_counts=True)
    est = cms_estimate(mat, pa.array(uniq, pa.int64()), d, w)
    assert (est >= exact).all()
    assert (est <= exact + math.e / w * len(keys)).all()


def test_cms_blocking_invariant(ray_session):
    from aida_ray.stages.sketches import cms_counts
    t = pa.table({"k": pa.array(list(range(100)) * 7, pa.int64())})
    a = cms_counts(rd.from_arrow(t), "k", d=4, w=256)
    b = cms_counts(rd.from_arrow(t).repartition(13), "k", d=4, w=256)
    assert (a == b).all()


def test_decayed_counts_reference(ray_session):
    from aida_ray.stages.timeseries import decayed_counts
    base = 1_700_000_000_000_000  # us
    day = 86_400_000_000
    rows = [(1, base), (1, base - 7 * day), (2, base - 14 * day),
            (2, base - 14 * day), (3, base)]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us"))})
    got = decayed_counts(rd.from_arrow(t).repartition(3)) \
        .to_pandas().set_index("user_id").sort_index()
    lam = math.log(2) / (7 * day)
    # newest event weighs exactly 1.0; 7d old = 0.5; 14d old = 0.25
    assert got.loc[1].decayed_score == round(1.0 + 0.5, 6)
    assert got.loc[2].decayed_score == round(0.25 * 2, 6)
    assert got.loc[3].decayed_score == 1.0
    assert got.loc[1].n_events == 2 and got.loc[2].n_events == 2
    assert lam > 0
