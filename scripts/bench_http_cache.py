#!/usr/bin/env python
"""HTTP-cache compaction read-path bench (r4, VERDICT r03 finding #2).

The scale claim under test (docs/COVERAGE.md X12): on a recurring-crawl
schedule the cache accumulates one published dir per caching round, and
`_read_cache` unions every dir and runs a latest-epoch-wins window over
it each round — without compaction that is a re-window of the whole
response corpus per round (at the design point, ~100 TB).
`httpcache_compact_every=K` folds the published dirs into ONE
latest-epoch-wins dir every K caching rounds, so reads list O(K) dirs.

Both modes run the SAME crawl (test_http_cache pins compacted ==
uncompacted == oracle); this script measures the physical read path on a
TTL re-crawl schedule (seen_ttl_rounds=2, httpcache_expiration_rounds=3)
that keeps re-fetching and re-caching, so epochs genuinely pile up:

  * published cache dirs at end + total cache files/bytes,
  * wall seconds + URLs/s for each mode,
  * identical crawl output (total_fetched) asserted across modes.

Prints one JSON line and markdown rows for BENCH/BASELINE.md.

Usage: python scripts/bench_http_cache.py [--n-pages 10000] [--rounds 16]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import build_session, crawl_config, ensure_fixture  # noqa: E402


def run_mode(spark, fx: str, compact_every: int, rounds: int) -> dict:
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine

    base = crawl_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "http_cache": True,
                         "httpcache_expiration_rounds": 3,
                         "httpcache_compact_every": compact_every,
                         "seen_ttl_rounds": 2})
    run_dir = tempfile.mkdtemp(prefix=f"hc_run_{compact_every}_")
    cache_dir = tempfile.mkdtemp(prefix=f"hc_cache_{compact_every}_")
    try:
        eng = CrawlEngine(spark, fx, run_dir, cfg, cache_dir=cache_dir)
        t0 = time.time()
        m = eng.run(max_rounds=rounds)
        dt = time.time() - t0
        fetched = m["state"]["total_fetched"]
        dirs = [d for d in os.listdir(cache_dir)
                if not d.startswith(".")]
        n_files = n_bytes = 0
        for root, _, files in os.walk(cache_dir):
            if os.path.basename(root).startswith("."):
                continue
            for f in files:
                n_files += 1
                n_bytes += os.path.getsize(os.path.join(root, f))
        return {"compact_every": compact_every, "seconds": round(dt, 2),
                "rounds": m["round"] + 1, "urls_fetched": fetched,
                "urls_per_sec": round(fetched / dt, 2),
                "cache_dirs": len(dirs), "cache_files": n_files,
                "cache_mb": round(n_bytes / 1e6, 2)}
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)
        shutil.rmtree(cache_dir, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=10000)
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--compact-every", type=int, default=4)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    fx = ensure_fixture(args.n_pages)
    spark = build_session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    run_mode(spark, fx, 0, 2)   # warmup (JIT + python workers)

    un = run_mode(spark, fx, 0, args.rounds)
    co = run_mode(spark, fx, args.compact_every, args.rounds)
    # same crawl either way — compaction is purely physical
    assert un["urls_fetched"] == co["urls_fetched"], (un, co)
    assert co["cache_dirs"] <= args.compact_every < un["cache_dirs"]

    out = {"n_pages": args.n_pages, "rounds": args.rounds,
           "cores": args.cores, "uncompacted": un, "compacted": co}
    print(json.dumps(out))
    for r in (un, co):
        label = ("no compaction" if r["compact_every"] == 0
                 else f"compact every {r['compact_every']}")
        print(f"| {label} | {r['seconds']} s | {r['urls_per_sec']} | "
              f"{r['cache_dirs']} dirs / {r['cache_files']} files / "
              f"{r['cache_mb']} MB |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
