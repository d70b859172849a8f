"""True-scale exercise of label_propagation_clusters' iterative route.

The >8M-pair join-iteration plan (dedup.label_propagation_clusters) is
covered by unit tests only via forced thresholds (broadcast_nodes=0).
This tool runs it at REAL scale — a planted 10M-pair graph (3.3M
4-node chains, 13.3M distinct nodes) generated distributed — with the
DEFAULT threshold, so the star-contraction passes run, fail to shrink
below the single-task gate (chains contract to 3 star edges each), and
the iterative join plan takes over.  Expected cluster of node v is
v - v % 4; the check aggregates violations distributed and asserts 0.

Usage: python tools/lp_scale_check.py [n_chains]   (default 3_333_334)
Prints one JSON line with wall seconds and the verification result.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

import ray
import ray.data

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 3_333_334
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from aida_ray.stages.dedup import label_propagation_clusters

    def chain_edges(b: pa.Table) -> pa.Table:
        ks = b["id"].to_numpy(zero_copy_only=False).astype("int64")
        base = ks * 4
        a = np.concatenate([base, base + 1, base + 2])
        bb = np.concatenate([base + 1, base + 2, base + 3])
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(bb, pa.int64())})

    pairs = ray.data.range(n_chains).map_batches(
        chain_edges, batch_format="pyarrow")

    t0 = time.perf_counter()
    clusters = label_propagation_clusters(pairs)   # DEFAULT thresholds

    def violations(b: pa.Table) -> pa.Table:
        node = b["doc_id"].to_numpy(zero_copy_only=False)
        got = b["cluster"].to_numpy(zero_copy_only=False)
        want = node - node % 4
        return pa.table({
            "n": pa.array([len(node)], pa.int64()),
            "bad": pa.array([int((got != want).sum())], pa.int64())})

    stats = clusters.map_batches(violations, batch_format="pyarrow") \
        .to_pandas().sum()
    wall = time.perf_counter() - t0

    out = {
        "tool": "lp_scale_check",
        "n_pairs": 3 * n_chains,
        "n_nodes": int(stats["n"]),
        "violations": int(stats["bad"]),
        "wall_s": round(wall, 2),
        "route": "iterative (default 8M-pair gate exceeded)"
        if 2 * 3 * n_chains > 8_000_000 else "single-task",
    }
    print(json.dumps(out))
    assert stats["n"] == 4 * n_chains, "node universe incomplete"
    assert stats["bad"] == 0, "cluster labels diverge from planted truth"
    ray.shutdown()


if __name__ == "__main__":
    main()
