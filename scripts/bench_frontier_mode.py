#!/usr/bin/env python
"""Frontier storage mode bench (VERDICT r02 item 9): full-rewrite vs
merge-on-read deltas on the large synthetic graph.

Measures, for the same crawl (same graph, same rounds, local[32]):
  * wall seconds + URLs/s,
  * frontier WRITE AMPLIFICATION: bytes written to the frontier tables
    across the run (full mode rewrites O(frontier) every round; delta
    mode appends O(round) events + periodic compacted bases).

Prints one JSON line and a markdown table row for BENCH/BASELINE.md.

Usage: python scripts/bench_frontier_mode.py [--n-pages 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from bench_scaling import build_session, crawl_config, ensure_fixture  # noqa: E402


def _tree_bytes(path: str) -> int:
    total = 0
    for r, _, fs in os.walk(path):
        for f in fs:
            try:
                total += os.path.getsize(os.path.join(r, f))
            except OSError:
                pass
    return total


def run_mode(spark, fx: str, deltas, rounds: int) -> dict:
    import shutil

    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine

    base = crawl_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "frontier_deltas": deltas})
    name = {False: "full", True: "delta", "auto": "auto"}[deltas]
    run_dir = tempfile.mkdtemp(prefix=f"fm_{name}_")
    try:
        eng = CrawlEngine(spark, fx, run_dir, cfg)
        t0 = time.time()
        m = eng.run(max_rounds=rounds)
        dt = time.time() - t0
        ded = sum(r["deduped"] for r in
                  eng.metrics_df(m).select("deduped").collect())
        fetched = m["state"]["total_fetched"]
        fbytes = _tree_bytes(os.path.join(run_dir, "data", "frontier"))
        dbytes = _tree_bytes(os.path.join(run_dir, "data", "frontier_delta"))
        return {"mode": name,
                "seconds": round(dt, 2), "rounds": m["round"] + 1,
                "urls_fetched": fetched, "urls_deduped": int(ded),
                "urls_per_sec": round((fetched + ded) / dt, 2),
                "frontier_bytes": fbytes, "delta_bytes": dbytes,
                "frontier_write_mb": round((fbytes + dbytes) / 1e6, 2),
                "pending_final": m["state"]["pending"]}
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=100000)
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    fx = ensure_fixture(args.n_pages)
    spark = build_session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup (JIT + python workers) on a short run
    run_mode(spark, fx, False, 1)

    full = run_mode(spark, fx, False, args.rounds)
    delta = run_mode(spark, fx, True, args.rounds)
    # r5 (VERDICT r04 #6): the "auto" default — per round, delta mode iff
    # round-start pending > frontier_deltas_auto_ratio * round_cap (the
    # dimensionless rewrite-vs-append cost trade; auto_rows = absolute
    # override). The row evidences that a DEFAULT config picks the
    # structurally right mode at each scale without opting in.
    auto = run_mode(spark, fx, "auto", args.rounds)
    amp = (full["frontier_write_mb"] / delta["frontier_write_mb"]
           if delta["frontier_write_mb"] else float("inf"))
    out = {"n_pages": args.n_pages, "rounds": args.rounds,
           "cores": args.cores, "full": full, "delta": delta,
           "auto": auto,
           "write_amplification_full_over_delta": round(amp, 2)}
    print(json.dumps(out))
    print(f"| full-rewrite | {full['seconds']} | {full['urls_per_sec']} | "
          f"{full['frontier_write_mb']} MB |")
    print(f"| frontier-deltas (compact every 8) | {delta['seconds']} | "
          f"{delta['urls_per_sec']} | {delta['frontier_write_mb']} MB |")
    print(f"| auto (default threshold) | {auto['seconds']} | "
          f"{auto['urls_per_sec']} | {auto['frontier_write_mb']} MB |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
