#!/usr/bin/env python
"""Fixed-cost amortization curve (BENCH/BASELINE.md "Throughput vs round
size"): run the full engine at one (n_pages, round_cap, rounds) point on
local[CORES] and print the markdown row + one JSON line.

The r1-r3 curve (3k/10k/100k pages: 15.7 -> 282 -> 1,167 URLs/s) shows
throughput ~linear in round size at fixed round count — the per-round
constant, not per-URL work, bounds sandbox numbers. VERDICT r03 item 8
asks for one more octave (~300k-1M pages); this script is that tier,
reusing bench_scaling's workload-pure fixture + fresh-session protocol.

Usage:
  taskset -c 0-31 python scripts/bench_amortization.py \
      --n-pages 300000 --round-cap 32768 --rounds 8 [--trials 2]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import build_session  # noqa: E402


def make_config(round_cap: int, rounds: int, deltas: bool = False):
    from crawlspark.config import CrawlConfig
    from crawlspark.fixtures.webgraph import MEGA_HOSTS
    return CrawlConfig(
        allowed_domains=("example-hotels.test", "example-restaurants.test",
                         *MEGA_HOSTS),
        round_cap=round_cap, default_crawl_delay_s=0.02, max_rounds=rounds,
        frontier_deltas=deltas)


def ensure_fixture(n_pages: int, cfg) -> str:
    from crawlspark.fixtures.webgraph import write_fixture
    fx = os.path.join(tempfile.gettempdir(),
                      f"crawlspark_amort_fx_v5_{n_pages}")
    # config.json is written LAST by write_fixture — its presence marks a
    # complete fixture; a bare isdir check would reuse a half-written dir
    # left by an interrupted generation
    if not os.path.isfile(os.path.join(fx, "config.json")):
        import shutil
        shutil.rmtree(fx, ignore_errors=True)
        print(f"generating {n_pages}-page workload-pure graph...",
              flush=True)
        write_fixture(fx, n_pages=n_pages, seed=42, config=cfg,
                      chain_len=0, with_cookies=False, with_nofollow=False,
                      with_sitemaps=False, with_meta=False)
    return fx


def one_trial(spark, fx: str, cfg, rounds: int) -> dict:
    import shutil
    from crawlspark.engine import CrawlEngine
    run_dir = tempfile.mkdtemp(prefix="amort_run_")
    try:
        eng = CrawlEngine(spark, fx, run_dir, cfg)
        t0 = time.time()
        m = eng.run(max_rounds=rounds)
        dt = time.time() - t0
        ded = sum(r["deduped"] for r in
                  eng.metrics_df(m).select("deduped").collect())
        fetched = m["state"]["total_fetched"]
        # delta-append rounds (evidence the auto rule actually upshifted:
        # the final manifest's frontier_delta list holds one path per
        # non-compaction round that wrote deltas since the last compaction;
        # count ALL committed manifests' delta writes instead)
        import json as _json
        dw = 0
        prev = 0
        for sn in sorted(os.listdir(eng.store.snap_dir)):
            with open(os.path.join(eng.store.snap_dir, sn)) as f:
                n = len(_json.load(f)["tables"].get("frontier_delta", []))
            dw += 1 if n > prev else 0
            prev = n
        return {"seconds": round(dt, 2), "rounds": m["round"] + 1,
                "urls_fetched": fetched, "urls_deduped": int(ded),
                "delta_rounds": dw, "pending_final": m["state"]["pending"],
                "urls_per_sec": round((fetched + ded) / dt, 2)}
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=300000)
    ap.add_argument("--round-cap", type=int, default=32768)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--frontier-deltas", action="store_true",
                    help="MOR delta frontier instead of full-rewrite: at "
                         "this tier the frontier base (~n_pages rows) is "
                         ">>1 round's events, the regime where full-rewrite "
                         "pays O(frontier) bytes per round")
    ap.add_argument("--frontier-mode", choices=["full", "deltas", "auto"],
                    default=None,
                    help="overrides --frontier-deltas; 'auto' exercises the "
                         "r5 default rule (delta mode iff round-start "
                         "pending > frontier_deltas_auto_ratio * round_cap; "
                         "frontier_deltas_auto_rows = absolute override)")
    ap.add_argument("--skip-warmup", action="store_true")
    args = ap.parse_args()

    mode = args.frontier_mode or \
        ("deltas" if args.frontier_deltas else "full")
    deltas_val = {"full": False, "deltas": True, "auto": "auto"}[mode]
    cfg = make_config(args.round_cap, args.rounds, deltas_val)
    fx = ensure_fixture(args.n_pages, cfg)
    spark = build_session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JIT codegen + python worker spawn on a 1-round run
    if not args.skip_warmup:
        one_trial(spark, fx, make_config(args.round_cap, 1), 1)

    trials = []
    for t in range(args.trials):
        r = one_trial(spark, fx, cfg, args.rounds)
        print(f"trial {t}: {r}", flush=True)
        trials.append(r)
    med = statistics.median(t["urls_per_sec"] for t in trials)
    best = max(trials, key=lambda t: t["urls_per_sec"])
    out = {"n_pages": args.n_pages, "round_cap": args.round_cap,
           "rounds": args.rounds, "cores": args.cores,
           "frontier_mode": {"full": "full-rewrite", "deltas": "deltas",
                             "auto": "auto"}[mode],
           "median_urls_per_sec": med, "trials": trials}
    print(json.dumps(out))
    print(f"| {args.n_pages:,} pages | {args.round_cap:,} | "
          f"{best['rounds']} | {best['urls_fetched'] + best['urls_deduped']:,}"
          f" | {' / '.join(str(t['seconds']) for t in trials)} s "
          f"(median of {args.trials}) | **{med}** |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
