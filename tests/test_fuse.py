import numpy as np
import pyarrow as pa
import pytest

from aida_ray.stages.fuse import noisy_or_fuse


def _mk(rows):
    return pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj": pa.array([r[2] for r in rows], pa.string()),
        "conf": pa.array([r[3] for r in rows], pa.float64())})


def test_noisy_or_basic(ray_session):
    import ray.data
    rows = [("a", "p", "b", 0.5), ("a", "p", "b", 0.5),
            ("a", "p", "c", 0.2), ("x", "q", "y", 0.9)]
    out = noisy_or_fuse(ray.data.from_arrow(_mk(rows)).repartition(3)) \
        .to_pandas().set_index(["subj", "pred", "obj"])
    assert out.loc[("a", "p", "b")].fused == pytest.approx(0.75)
    assert out.loc[("a", "p", "b")].n_src == 2
    assert out.loc[("a", "p", "b")].max_conf == 0.5
    assert out.loc[("a", "p", "c")].fused == pytest.approx(0.2)
    assert out.loc[("x", "q", "y")].fused == pytest.approx(0.9)


def test_noisy_or_certain_witness(ray_session):
    import ray.data
    rows = [("a", "p", "b", 1.0), ("a", "p", "b", 0.3)]
    out = noisy_or_fuse(ray.data.from_arrow(_mk(rows))).to_pandas()
    assert out.fused.iloc[0] == 1.0


def test_noisy_or_blocking_invariance(ray_session):
    import ray.data
    rng = np.random.RandomState(3)
    rows = [(f"s{i % 7}", "p", f"o{i % 5}", float(c))
            for i, c in enumerate(rng.uniform(0.05, 0.95, size=200))]
    a = noisy_or_fuse(ray.data.from_arrow(_mk(rows)).repartition(1)) \
        .to_pandas().sort_values(["subj", "pred", "obj"]) \
        .reset_index(drop=True)
    b = noisy_or_fuse(ray.data.from_arrow(_mk(rows)).repartition(9)) \
        .to_pandas().sort_values(["subj", "pred", "obj"]) \
        .reset_index(drop=True)
    assert a.equals(b)
    # brute force check of one group
    confs = [c for (s, _, o, c) in rows if s == "s0" and o == "o0"]
    want = round(1.0 - np.prod([1.0 - c for c in confs]), 6)
    got = a[(a.subj == "s0") & (a.obj == "o0")].fused.iloc[0]
    assert got == pytest.approx(want, abs=2e-6)
