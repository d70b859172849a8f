"""Partitioned, resumable triple sink with per-partition lineage manifests.

North-rule T1 (SURVEY.md §2.1): output is partitioned parquet — one
directory per input shard — written atomically (temp dir + rename), with
a JSON manifest per partition recording input files, row count, config
hash and wall time.  A rerun skips partitions whose manifest already
exists, making the whole pipeline idempotent without a metadata service
(per-document determinism guarantees identical re-emits).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time


def config_hash(obj) -> str:
    return hashlib.sha256(repr(obj).encode()).hexdigest()[:16]


def partition_done(out_dir: str, partition: str) -> bool:
    return os.path.exists(os.path.join(out_dir, partition, "_MANIFEST.json"))


def write_partition(ds, out_dir: str, partition: str,
                    inputs: list[str], cfg_hash: str,
                    min_rows_per_file: int = 100_000) -> dict:
    """Write one partition atomically; returns the manifest dict.

    ``ds`` is a ray.data.Dataset (already transformed, still lazy); the
    write streams it — no driver-side materialization.
    """
    final_dir = os.path.join(out_dir, partition)
    tmp_dir = final_dir + ".tmp"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir, exist_ok=True)
    t0 = time.time()
    ds.write_parquet(tmp_dir, min_rows_per_file=min_rows_per_file)
    rows = sum(
        _parquet_rows(os.path.join(tmp_dir, f))
        for f in os.listdir(tmp_dir) if f.endswith(".parquet"))
    manifest = {
        "partition": partition,
        "inputs": sorted(inputs),
        "rows": rows,
        "config_hash": cfg_hash,
        "wall_sec": round(time.time() - t0, 3),
        "files": sorted(f for f in os.listdir(tmp_dir) if f.endswith(".parquet")),
    }
    with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    os.rename(tmp_dir, final_dir)
    return manifest


def _parquet_rows(path: str) -> int:
    import pyarrow.parquet as pq
    return pq.ParquetFile(path).metadata.num_rows


def read_manifests(out_dir: str) -> list[dict]:
    out = []
    if not os.path.isdir(out_dir):
        return out
    for part in sorted(os.listdir(out_dir)):
        m = os.path.join(out_dir, part, "_MANIFEST.json")
        if os.path.exists(m):
            with open(m) as f:
                out.append(json.load(f))
    return out
