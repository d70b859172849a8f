"""Benchmark harness (driver-run per round; see BASELINE.md).

Runs the headline KG pipeline (pages → NED → triples → canonicalize)
over a synthetic corpus sized from ``$GRAFT_SF_DIR``'s documents table,
plus the main training-data operators over the sf tables, and prints ONE
JSON line:

    {"metric": "kg_pipeline_sec", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "pages": N, "triples": N, "triples_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh processes
(num_cpus=8 and num_cpus=32, same input) and reports both throughputs +
scaling efficiency — the in-sandbox evidence for the N→4N criterion.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    import ray
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)
    import __ray_entry__ as E

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # headline: flagship KG pipeline (corpus generation cached, untimed;
    # one untimed page-cache warmup read).
    kb, pages_dir, _ = E._kg_cache(sf_dir)
    import pyarrow.parquet as pq
    n_pages = sum(pq.ParquetFile(os.path.join(pages_dir, f)).metadata.num_rows
                  for f in os.listdir(pages_dir) if f.endswith(".parquet"))

    from aida_ray.pipelines.kg import (canonicalize_entities, dedup_triples,
                                       link_pages, read_pages)
    from aida_ray.state.broadcast import put_kb
    read_pages(pages_dir).count()  # warm page cache
    kb_ref = put_kb(kb)
    # leave headroom for the read/aggregate stages — an actor pool sized
    # to every CPU starves the other operators and the pipeline stalls
    pool = max(1, num_cpus * 3 // 4)
    t0 = time.time()
    # NED once; the triple set is tiny vs the input, so materializing it
    # for the two downstream aggregations is the correct plan
    triples = link_pages(read_pages(pages_dir), kb_ref,
                         concurrency=pool, batch_size=128).materialize()
    dd = dedup_triples(triples)
    canon = canonicalize_entities(triples)
    n_triples = dd.count()
    canon.count()
    headline = time.time() - t0
    timings["kg_pipeline"] = round(headline, 3)
    extras["pages"] = n_pages
    extras["triples"] = n_triples
    extras["triples_per_sec"] = round(n_triples / headline, 1)
    extras["pages_per_sec"] = round(n_pages / headline, 1)

    for name in ["dedup_exact", "minhash_pairs", "knn_bruteforce", "simhash",
                 "token_stats", "window_agg", "entity_canonical"]:
        fn = E.queries()[name]
        t0 = time.time()
        fn(sf_dir)
        timings[name] = round(time.time() - t0, 3)

    out = {
        "metric": "kg_pipeline_sec",
        "value": timings["kg_pipeline"],
        "unit": "sec",
        "queries": timings,
        "sf": sf_tag,
        "num_cpus": num_cpus,
        **extras,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    results = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        results[ncpu] = json.loads(out.stdout.strip().splitlines()[-1])
    t8 = results[8]["value"]
    t32 = results[32]["value"]
    eff = (t8 / t32) / (32 / 8)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8cpu": t8,
        "sec_32cpu": t32,
        "pages_per_sec_8cpu": results[8]["pages_per_sec"],
        "pages_per_sec_32cpu": results[32]["pages_per_sec"],
        "sf": results[32]["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
