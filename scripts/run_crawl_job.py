#!/usr/bin/env python
"""Crawl job entrypoint for ``ray job submit`` (north rule: the complete
system runs as a submitted job on a fixed-size cluster and resumes exactly
after a kill).

    ray job submit --working-dir . -- \
        python scripts/run_crawl_job.py \
        --pages /data/pages_parquet --seeds /data/seed_tickers.parquet \
        --checkpoint-dir /data/ckpt --output-dir /data/facts --resume

Re-submitting with ``--resume`` after a kill restarts from the last complete
wave (frontier shards + admitted tables + wave-2 facts checkpoint) and skips
finished output partitions. Prints one JSON metrics line (pages/sec,
dedup-hit-rate, politeness, robots, per-wave timings, lineage path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages parquet path/dir")
    ap.add_argument("--seeds", required=True, help="seed_tickers parquet")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--output-dir", default=None,
                    help="ticker-partitioned facts output (resumable sink)")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-shards", type=int, default=8)
    ap.add_argument("--capacity", type=int, default=1 << 22,
                    help="total cuckoo seen-set capacity (shards split it)")
    ap.add_argument("--host-budget", type=float, default=10.0,
                    help="politeness budget, requests/sec/host")
    ap.add_argument("--live-http", action="store_true",
                    help="fetch over the stdlib urllib transport instead of "
                         "the pages parquet (implies EDGAR_RAY_LIVE_HTTP=1)")
    ap.add_argument("--live-rewrite", default=None,
                    help="url prefix rewrite 'FROM=TO' for mirrors/proxies")
    ap.add_argument("--strict-per-host", action="store_true",
                    help="serialize fetches per host (one task owns each "
                         "host's rows in scheduled_at order)")
    args = ap.parse_args()

    import pyarrow.parquet as pq
    import ray

    # under `ray job submit --working-dir .` the package ships to workers
    # automatically; standalone runs propagate it via PYTHONPATH
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 ignore_reinit_error=True,
                 runtime_env={"env_vars": {"PYTHONPATH": repo_root}})

    from edgar_ray.pipelines.crawl import crawl

    seeds = pq.read_table(args.seeds)
    live_transport = None
    if args.live_http:
        from edgar_ray.stages.fetch_http import UrllibTransport

        rewrite = (tuple(args.live_rewrite.split("=", 1))
                   if args.live_rewrite else None)
        live_transport = UrllibTransport(rewrite=rewrite)
    res = crawl(
        args.pages if live_transport is None else None, seeds,
        num_shards=args.num_shards, capacity=args.capacity,
        host_budget=args.host_budget,
        checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        output_dir=args.output_dir, consume_facts=args.output_dir is None,
        live_transport=live_transport,
        live_strict_per_host=args.strict_per_host,
    )
    lineage_path = os.path.join(args.checkpoint_dir, "lineage.parquet")
    pq.write_table(res.lineage, lineage_path)
    out = dict(res.metrics)
    out["lineage_path"] = lineage_path
    out["filings"] = res.filings_facts.count() if res.filings_facts is not None else 0
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
