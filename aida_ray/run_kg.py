"""CLI entrypoint for the KG pipeline — the `ray job submit` surface.

    ray job submit -- python -m aida_ray.run_kg \
        --pages /data/pages --kb /data/kb --out /data/triples \
        [--resume/--no-resume] [--concurrency N] [--batch-size B]

Connects to the cluster Ray (or starts local), streams pages → triples
into partitioned parquet with lineage manifests, prints a JSON summary.
Reruns skip finished partitions (resume).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pages", required=True, help="pages parquet dir")
    p.add_argument("--kb", required=True,
                   help="KB parquet dir (aida_ray.kb.KB.save layout)")
    p.add_argument("--out", required=True, help="output triples dir")
    p.add_argument("--concurrency", type=int, default=0,
                   help="NED actor pool size (default: cpus - 2)")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--partition-granularity", type=int, default=1,
                   help="input files per output partition")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--kb-shards", type=int, default=0,
                   help="split the keyphrase index into N scorer shards "
                        "(for KBs larger than actor memory)")
    p.add_argument("--pipeline-parallelism", type=int, default=4,
                   help="partition pipelines in flight (capped so "
                        "pools fit the cluster)")
    p.add_argument("--preset", default=None,
                   help="named prebuilt config (reference class name, "
                        "e.g. FastCocktailPartyDisambiguationSettings); "
                        "default: CocktailParty settings")
    args = p.parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="auto" if _cluster_available() else "local",
                 include_dashboard=False, ignore_reinit_error=True)

    from aida_ray.kb.kb import KB
    from aida_ray.pipelines.kg import run_kg

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # default: split the cluster across in-flight partition pipelines
    conc = args.concurrency or max(
        2, (cpus - 2) // max(1, args.pipeline_parallelism))
    kb = KB.load(args.kb)
    settings = None
    if args.preset:
        from aida_ray.ned.settings import preset as _preset
        settings = _preset(args.preset)
    t0 = time.time()
    manifests = run_kg(args.pages, kb, args.out, settings=settings,
                       concurrency=conc, batch_size=args.batch_size,
                       partition_granularity=args.partition_granularity,
                       resume=not args.no_resume,
                       n_kb_shards=args.kb_shards,
                       pipeline_parallelism=args.pipeline_parallelism)
    wall = time.time() - t0
    rows = sum(m["rows"] for m in manifests)
    print(json.dumps({
        "partitions_written": len(manifests),
        "partitions_skipped_resume": "see manifests",
        "triples": rows,
        "wall_sec": round(wall, 2),
        "triples_per_sec": round(rows / wall, 1) if wall > 0 else None,
        "out": args.out,
    }))
    return 0


def _cluster_available() -> bool:
    import os
    return bool(os.environ.get("RAY_ADDRESS") and
                os.environ["RAY_ADDRESS"] not in ("local",))


if __name__ == "__main__":
    sys.exit(main())
