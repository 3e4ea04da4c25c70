#!/usr/bin/env python
"""Seen-filter occupancy bench (r3): bloom vs cuckoo under the TTL
re-crawl schedule, on the large workload-pure graph.

The scale claim under test (docs/COVERAGE.md D3b): with
``seen_ttl_rounds`` on, a recurring crawl's *live* seen set is bounded by
the re-crawl window while the *all-time* set grows with every URL ever
discovered. Bloom bits can only be set, so the bloom prefilter's
occupancy (and hence its false-positive rate at fixed size) tracks the
ALL-TIME set; the cuckoo filter deletes expired tags, so its occupancy
tracks the LIVE set — the property that keeps a 10^10-URL recurring
crawl's prefilter at bounded load instead of saturating.

Both modes run the SAME crawl (oracle-exact order either way — the test
suite pins that); this script measures the filters, on snapshots the
crawl actually committed:

  * all-time distinct fingerprints vs live (within-TTL) fingerprints,
  * bloom: bits set / total bits (load factor),
  * cuckoo: tags occupied / total slots (load factor) + overflowed shards
    (expected 0), and the invariant occupancy == live set,
  * wall seconds + URLs/s for each mode (cuckoo+TTL always takes the
    distributed cogrouped shard merge; bloom uses the driver-cache fast
    path — noted so the wall delta is read as path cost, not filter cost).

Prints one JSON line and markdown rows for BENCH/BASELINE.md.

Usage: python scripts/bench_seen_filter.py [--n-pages 10000] [--rounds 12]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import build_session, crawl_config, ensure_fixture  # noqa: E402


def run_mode(spark, fx: str, seen_filter: str, ttl: int,
             rounds: int) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructType

    from crawlspark import cuckoo
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SHARDS_SCHEMA, CrawlEngine

    base = crawl_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "seen_filter": seen_filter,
                         "seen_ttl_rounds": ttl})
    run_dir = tempfile.mkdtemp(prefix=f"sf_{seen_filter}_")
    try:
        eng = CrawlEngine(spark, fx, run_dir, cfg)
        t0 = time.time()
        m = eng.run(max_rounds=rounds)
        dt = time.time() - t0
        fetched = m["state"]["total_fetched"]

        seen = eng.seen_df(m)
        alltime = seen.select("fingerprint").distinct().count()
        live = (seen.filter(F.col("seen_round") > m["round"] - ttl)
                .select("fingerprint").distinct().count())

        rows = eng.store.read(spark, m, "seen_shards",
                              StructType.fromDDL(SHARDS_SCHEMA)).collect()
        if seen_filter == "cuckoo":
            occ = sum(int((cuckoo.decode(bytes(r["bits"]), cfg)[1] != 0)
                          .sum()) for r in rows)
            total = cfg.bloom_shards * cfg.cuckoo_buckets_per_shard * 4
            overflowed = sum(bool(cuckoo.decode(bytes(r["bits"]), cfg)[0])
                             for r in rows)
        else:
            occ = sum(int(np.unpackbits(
                np.frombuffer(bytes(r["bits"]), dtype=np.uint8)).sum())
                for r in rows)
            total = cfg.bloom_shards * cfg.bloom_bits_per_shard
            overflowed = 0
        return {"filter": seen_filter, "seconds": round(dt, 2),
                "rounds": m["round"] + 1, "urls_fetched": fetched,
                "urls_per_sec": round(fetched / dt, 2),
                "seen_alltime": alltime, "seen_live": live,
                "filter_occupancy": occ,
                "filter_load_pct": round(100.0 * occ / total, 2),
                "overflowed_shards": overflowed}
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=10000)
    ap.add_argument("--rounds", type=int, default=12)
    ap.add_argument("--ttl", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    fx = ensure_fixture(args.n_pages)
    spark = build_session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    run_mode(spark, fx, "bloom", args.ttl, 2)   # warmup (JIT + workers)

    bl = run_mode(spark, fx, "bloom", args.ttl, args.rounds)
    ck = run_mode(spark, fx, "cuckoo", args.ttl, args.rounds)
    # same crawl either way — the prefilter never changes semantics
    assert (bl["urls_fetched"], bl["seen_alltime"], bl["seen_live"]) == \
        (ck["urls_fetched"], ck["seen_alltime"], ck["seen_live"])
    # the headline invariants
    assert ck["filter_occupancy"] == ck["seen_live"], \
        (ck["filter_occupancy"], ck["seen_live"])
    assert ck["overflowed_shards"] == 0

    out = {"n_pages": args.n_pages, "rounds": args.rounds,
           "seen_ttl_rounds": args.ttl, "cores": args.cores,
           "bloom": bl, "cuckoo": ck}
    print(json.dumps(out))
    for r in (bl, ck):
        tracks = ("all-time (monotone)" if r["filter"] == "bloom"
                  else "LIVE set (== occupancy)")
        print(f"| {r['filter']} | {r['seconds']} | {r['urls_per_sec']} | "
              f"{r['seen_alltime']} | {r['seen_live']} | "
              f"{r['filter_occupancy']} ({r['filter_load_pct']}%) | "
              f"{tracks} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
