"""Tests for the Bloom filter and incremental-ingest dedup."""

import numpy as np
import pyarrow as pa

import ray.data as rd


def test_bloom_no_false_negatives_and_fpr(ray_session):
    from aida_ray.stages.incremental import build_bloom, probe_bloom
    seen_vals = [f"seen_{i}" for i in range(5000)]
    new_vals = [f"new_{i}" for i in range(5000)]
    seen = rd.from_arrow(pa.table({"k": seen_vals})).repartition(6)
    bloom = build_bloom(seen, "k", num_bits=1 << 17)  # 16 bits/key
    # every seen value must be flagged maybe-seen
    seen_probe = probe_bloom(rd.from_arrow(pa.table({"k": seen_vals})),
                             bloom, "k", keep="maybe").count()
    assert seen_probe == 5000
    # FPR on fresh values near theory (≈2.4% at 16 bits/key, k=4)
    false_pos = probe_bloom(rd.from_arrow(pa.table({"k": new_vals})),
                            bloom, "k", keep="maybe").count()
    assert false_pos / 5000 < 0.06


def test_incremental_dedup_exact(ray_session):
    from aida_ray.stages.incremental import incremental_dedup
    seen = rd.from_arrow(pa.table({
        "k": [f"d{i}" for i in range(0, 600)]})).repartition(4)
    new = rd.from_arrow(pa.table({
        "k": [f"d{i}" for i in range(400, 1000)],
        "payload": list(range(400, 1000))})).repartition(5)
    out = incremental_dedup(new, seen, "k", num_bits=1 << 14).to_pandas()
    assert sorted(out.payload) == list(range(600, 1000))
    assert set(out.columns) == {"k", "payload"}
