#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north_rule deployment).

Cluster:
    scripts/make_pyfiles.sh                       # -> dist/crawlspark.zip
    spark-submit --master yarn --deploy-mode client \
        --num-executors 64 --executor-cores 4 \
        --py-files dist/crawlspark.zip \
        --conf spark.sql.shuffle.partitions=512 \
        scripts/run_crawl.py --fixture /data/webgraph --run-dir /data/run1 \
        --rounds 50 --resume

Sandbox (local[N] proxy for N executors — BASELINE.md evidence protocol):
    spark-submit --master 'local[8]'  --py-files dist/crawlspark.zip \
        scripts/run_crawl.py --fixture /tmp/fx --run-dir /tmp/run --rounds 6

The script never calls ``.master()`` itself — the cluster manager comes
entirely from spark-submit, so the same artifact runs at N and 4N
executors unchanged (scaling-efficiency evidence, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(description="crawlspark crawl run")
    ap.add_argument("--fixture", required=True,
                    help="dir with seeds/pages/robots/host_policy parquet")
    ap.add_argument("--run-dir", required=True,
                    help="snapshot store root (resumable)")
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="continue from the last committed snapshot")
    ap.add_argument("--config-json", default=None,
                    help="path to a CrawlConfig JSON (default: fixture's "
                         "config.json if present, else defaults)")
    ap.add_argument("--cache-dir", default=None,
                    help="X12 HTTP-cache dir shared across runs; implies "
                         "http_cache=True (re-crawl without re-fetch)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine

    spark = (SparkSession.builder.appName("crawlspark-crawl")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    cfg_path = args.config_json or f"{args.fixture}/config.json"
    try:
        with open(cfg_path) as f:
            cfg = CrawlConfig.from_dict(json.load(f))
    except FileNotFoundError:
        cfg = CrawlConfig()

    if args.cache_dir:
        cfg = CrawlConfig.from_dict({**cfg.to_dict(), "http_cache": True})
    eng = CrawlEngine(spark, args.fixture, args.run_dir, cfg,
                      cache_dir=args.cache_dir)
    t0 = time.time()
    manifest = eng.run(max_rounds=args.rounds, resume=args.resume)
    dt = time.time() - t0
    st = manifest["state"]
    print(json.dumps({
        "rounds_done": manifest["round"] + 1,
        "total_fetched": st["total_fetched"],
        "pending": st.get("pending"),
        "seconds": round(dt, 2),
        "urls_per_sec": round(st["total_fetched"] / dt, 2) if dt else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
