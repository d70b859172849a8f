"""Per-operator Ray Data stats for the headline pipeline.

Usage: python tools/stats_dump.py [sf_dir]
Prints ``ds.stats()`` for the NED stage and both aggregations — the
feedback loop for batch-size / concurrency / block-count tuning
(PERF.md records representative dumps).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, log_to_driver=False)
    import __ray_entry__ as E
    from aida_ray.pipelines.kg import (canonicalize_entities, dedup_triples,
                                       link_pages, read_pages)
    from aida_ray.state.broadcast import put_kb
    kb, pages_dir, _ = E._kg_cache(sf_dir)
    pool = E._pool()
    triples = link_pages(read_pages(pages_dir), put_kb(kb),
                         concurrency=pool, batch_size=128).materialize()
    print("================ NED stage ================")
    print(triples.stats())
    dd = dedup_triples(triples).materialize()
    print("================ dedup_triples ================")
    print(dd.stats())
    cn = canonicalize_entities(triples).materialize()
    print("================ canonicalize ================")
    print(cn.stats())
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
