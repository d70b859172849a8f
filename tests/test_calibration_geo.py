"""Unit tests: extract_coords, confidence_calibration,
quality_ensemble."""

import numpy as np
import pyarrow as pa


def _ds(tbl):
    import ray.data
    return ray.data.from_arrow(tbl)


def test_extract_coords_first_match(ray_session):
    from aida_ray.stages.geo import extract_coords
    t = _ds(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["at 12n 45e base", "no coords",
                 "7n 170e then 8n 9e"]}))
    got = extract_coords(t).to_pandas().set_index("doc_id")
    assert list(got.index) == [1, 3]
    assert got.loc[1, "x"] == 12 and got.loc[1, "y"] == 45
    assert got.loc[3, "x"] == 7 and got.loc[3, "y"] == 170


def test_confidence_calibration_bins(ray_session):
    from aida_ray.stages.kgqa import confidence_calibration
    t = _ds(pa.table({
        "fused": [0.33, 0.35, 0.71, 0.95, 0.999999],
        "verdict": ["supported", "novel", "supported", "contradicted",
                    "supported"]}))
    got = confidence_calibration(t).to_pandas().set_index("bin")
    assert got.loc[3, "n"] == 2 and got.loc[3, "n_supported"] == 1
    assert abs(got.loc[3, "accuracy"] - 0.5) < 1e-9
    assert got.loc[7, "accuracy"] == 1.0
    # 0.999999 * 10 = 9.99999 -> bin 9 (and clamps stay in range)
    assert got.loc[9, "n"] == 2 and got.loc[9, "n_supported"] == 1


def test_quality_ensemble_bits(ray_session):
    from aida_ray.stages.webstats import quality_ensemble
    long_ok = " ".join(f"w{i}" for i in range(30))
    t = _ds(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [long_ok,
                 "tiny doc",                       # short only
                 "buy " * 50,                      # spam (not short)
                 "banana oriole papaya"]}))        # dense + short
    got = quality_ensemble(t).to_pandas().set_index("doc_id")
    assert bool(got.loc[0, "keep"]) and got.loc[0, "reasons"] == 0
    # 2-token docs trip the concentration rule too (top 1/2 > 30%)
    assert got.loc[1, "reasons"] == 3               # spam + short
    assert got.loc[2, "reasons"] == 1               # 200 tokens, 1 distinct
    assert got.loc[3, "reasons"] == 7               # spam + short + dense
    assert not bool(got.loc[3, "keep"])
