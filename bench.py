"""Bench harness (driver contract + BASELINE.md protocol).

Prints ONE JSON line:
  {"metric": "urls_fetched_deduped_per_sec", "value": <crawl throughput>,
   "unit": "sec", "queries": {<name>: seconds, ..., "crawl": seconds},
   "sf": <sf>, ...extras}

Two workloads:
  1. the crawl engine itself on a deterministic synthetic web graph scaled
     to the SF (seed=42; the graph is the engine's native input — BASELINE.md
     metric is URLs fetched+deduped/sec with exact order/seen semantics);
  2. headline driver-contract queries at $SPARK_GRAFT_SF_DIR
     (default /root/testdata/sf0.1) — per-query wall seconds.

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32),
     CRAWLSPARK_BENCH_ROUNDS (default 6).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HEADLINE = [
    "frontier_dequeue", "frontier_topk", "pricing_summary",
    "revenue_by_nation", "window_lag", "tumbling_hourly", "seen_anti_join",
    "docs_token_stats", "docs_ngram_pairs", "docs_minhash_lsh",
    "docs_simhash", "docs_minhash_verified", "docs_dedup_clusters",
    "docs_canonical_dedup", "emb_cosine_topk", "emb_ann_lsh",
    "emb_ann_ivf", "emb_near_dup_bucketed", "dedup_clusters",
    "event_sessions",
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def bench_crawl(spark, sf: float, rounds: int, warm: bool = True) -> dict:
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.fixtures.webgraph import MEGA_HOSTS, write_fixture

    # sf-scaled web graph; host count scales with pages (n_pages/40), so
    # bigger graphs mean bigger politeness-legal rounds — the regime where
    # the per-round fixed costs amortize (BENCH/BASELINE.md)
    n_pages = max(300, int(100000 * sf))
    cfg = CrawlConfig(
        allowed_domains=("example-hotels.test", "example-restaurants.test",
                         *MEGA_HOSTS),
        round_cap=8192, default_crawl_delay_s=0.02, max_rounds=rounds)
    # v5: the bench graph disables cookie gating, nofollow demotion and
    # sitemaps so the fetch+dedup workload stays maximal and
    # round-over-round comparable (those features shrink/reshape
    # discovery; their correctness is pytest territory, not a throughput
    # workload change)
    fx_dir = os.path.join(tempfile.gettempdir(),
                          f"crawlspark_bench_fx_v5_{n_pages}")
    if not os.path.isdir(fx_dir):
        write_fixture(fx_dir, n_pages=n_pages, seed=42, config=cfg,
                      with_cookies=False, with_nofollow=False,
                      with_sitemaps=False, with_meta=False)
    # tiny rounds: AQE's per-stage replanning costs more than it saves
    # (skew is handled by explicit J6 salting); cluster deploys keep AQE on
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # JIT/codegen warmup: 2 untimed rounds on a throwaway run dir (first
    # trial only — JIT state persists in the JVM across trials)
    if warm:
        warm_dir = tempfile.mkdtemp(prefix="crawlspark_bench_warm_")
        try:
            CrawlEngine(spark, fx_dir, warm_dir, cfg).run(max_rounds=2)
        finally:
            shutil.rmtree(warm_dir, ignore_errors=True)
    run_dir = tempfile.mkdtemp(prefix="crawlspark_bench_run_")
    try:
        eng = CrawlEngine(spark, fx_dir, run_dir, cfg)
        t0 = time.time()
        manifest = eng.run(max_rounds=rounds)
        dt = time.time() - t0
        st = manifest["state"]
        deduped = sum(
            r["deduped"] for r in
            eng.metrics_df(manifest).select("deduped").collect())
        return {
            "seconds": round(dt, 2),
            "rounds": manifest["round"] + 1,
            "urls_fetched": st["total_fetched"],
            "urls_deduped": int(deduped),
            "urls_per_sec": round((st["total_fetched"] + deduped) / dt, 2),
            "n_pages": n_pages,
        }
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("CRAWLSPARK_BENCH_ROUNDS", "6"))
    n_trials = int(os.environ.get("CRAWLSPARK_BENCH_TRIALS", "3"))
    sf = sf_of(sf_dir)

    from crawlspark.queries import QUERIES
    from crawlspark.session import build_spark
    spark = build_spark("crawlspark-bench", cores=cpus,
                        shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    # untimed warmup pass: whole-stage codegen + parquet reader init are
    # one-time costs (~2.5 s) that would otherwise be charged to whichever
    # query happens to run first; the timed pass measures steady state
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        # the timer brackets fn() AND the count: queries that do eager
        # driver-side work inside fn (the label-propagation loops run
        # per-iteration counts) are charged their real cost (VERDICT r02
        # finding #3 — timing only count() flattered the cluster queries)
        t0 = time.time()
        fn(spark, sf_dir).count()   # fresh DAG — no shuffle-reuse
        timings[name] = round(time.time() - t0, 3)

    # median-of-N crawl trials: single-trial numbers on this shared host
    # swing +-40% (BENCH/BASELINE.md variance notes); the driver-recorded
    # number should corroborate the documented band, not sample the noise
    trials = [bench_crawl(spark, sf, rounds, warm=(i == 0))
              for i in range(n_trials)]
    trials.sort(key=lambda c: c["seconds"])
    crawl = trials[len(trials) // 2]
    crawl["trial_seconds"] = [c["seconds"] for c in trials]
    timings["crawl"] = crawl["seconds"]

    out = {
        "metric": "urls_fetched_deduped_per_sec",
        "value": crawl["urls_per_sec"],
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "crawl": crawl,
        "query_total_sec": round(sum(timings.values()), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
