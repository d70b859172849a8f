"""TransE training (stages/transe.py) — learning signal, gradient
locality, determinism of corruption."""

import numpy as np
import pyarrow as pa

import ray.data

from aida_ray.stages.transe import (_corrupt_tails, train_transe,
                                    transe_eval)


def _triples():
    # relation 0 translates i -> i + 10 (clean bipartite structure)
    return ray.data.from_arrow(pa.table({
        "h": pa.array(list(range(10)), pa.int64()),
        "r": pa.array([0] * 10, pa.int64()),
        "t": pa.array([i + 10 for i in range(10)], pa.int64())}))


def test_corruption_deterministic_and_in_range():
    h = np.arange(10, dtype=np.int64)
    r = np.zeros(10, dtype=np.int64)
    a = _corrupt_tails(h, r, 3, 20)
    b = _corrupt_tails(h, r, 3, 20)
    assert (a == b).all()
    assert ((a >= 0) & (a < 20)).all()
    assert (a != _corrupt_tails(h, r, 4, 20)).any()


def test_transe_learns_translation(ray_session):
    trip = _triples()
    ent0, rel0 = train_transe(trip, n_ent=20, n_rel=1, dim=8,
                              epochs=0)
    ev0 = transe_eval(trip, ent0, rel0).to_pandas()
    ent, rel = train_transe(trip, n_ent=20, n_rel=1, dim=8,
                            epochs=12, lr=0.15)
    ev = transe_eval(trip, ent, rel).to_pandas()
    # training shrinks true-triple distance and wins the ranking test
    assert ev["d_pos"].mean() < ev0["d_pos"].mean()
    assert ev["better"].mean() >= 0.8


def test_transe_shapes_and_norms(ray_session):
    ent, rel = train_transe(_triples(), n_ent=20, n_rel=1, dim=8,
                            epochs=2)
    assert ent.shape == (20, 8) and rel.shape == (1, 8)
    # entity rows re-normalized to the unit ball at the end
    assert np.allclose(np.linalg.norm(ent, axis=1), 1.0)
