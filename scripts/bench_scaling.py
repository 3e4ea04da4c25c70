#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.md protocol).

The north_rule criterion — throughput scaling efficiency >= 0.8 from N to 4N
executors — is evidenced in-sandbox by running the SAME job on the SAME
input at local[8] (N=8 cores) and local[32] (4N=32 cores), fresh JVM per
level, >=1 trials each (median reported):

  * kernel  — ONE scheduler-round dataflow (X7 fetch -> X8/X9 parse-extract
    mapInPandas -> D1 canonicalize -> D2 fingerprint -> D4 dedup) over a
    replicated page batch: a single compute-dominated Spark job, the
    apples-to-apples unit the criterion scales (each round IS one job).
  * crawl   — the full multi-round engine (6 rounds) on the sf-scaled
    synthetic web graph: includes the per-round fixed costs (commit
    protocol, job scheduling) that are constant per round, NOT per URL —
    they amortize away at the 10^10 design point where a round carries
    ~10^6-10^7 URLs, but dominate at sandbox round sizes (<=10^3 URLs).

Writes BENCH/scaling.json and BENCH/BASELINE.md.

Usage:  python scripts/bench_scaling.py            # orchestrate both levels
        python scripts/bench_scaling.py --worker --mode kernel --cores 8 ...
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def build_session(cores: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cores}]")
            .appName(f"crawlspark-scaling-{cores}")
            .config("spark.sql.shuffle.partitions", str(cores))
            .config("spark.default.parallelism", str(cores))
            # AQE off: replanning latency dominates at sandbox round sizes;
            # skew is handled by explicit J6 salting (see BENCH/BASELINE.md)
            .config("spark.sql.adaptive.enabled", "false")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .config("spark.driver.memory", "16g")
            .getOrCreate())


def crawl_config():
    from crawlspark.config import CrawlConfig
    from crawlspark.fixtures.webgraph import MEGA_HOSTS
    return CrawlConfig(
        allowed_domains=("example-hotels.test", "example-restaurants.test",
                         *MEGA_HOSTS),
        round_cap=4096, default_crawl_delay_s=0.02, max_rounds=6)


def ensure_fixture(n_pages: int) -> str:
    from crawlspark.fixtures.webgraph import write_fixture
    # workload-pure graph (no cookie gating / nofollow demotion / 301
    # chain): scaling measures the engine, not feature-induced changes in
    # discovery volume — same choice as bench.py
    fx = os.path.join(tempfile.gettempdir(),
                      f"crawlspark_scaling_fx_v5_{n_pages}")
    # config.json is written LAST by write_fixture — its presence marks a
    # complete fixture; a bare isdir check would reuse a half-written dir
    # left by an interrupted generation
    if not os.path.isfile(os.path.join(fx, "config.json")):
        shutil.rmtree(fx, ignore_errors=True)
        write_fixture(fx, n_pages=n_pages, seed=42, config=crawl_config(),
                      chain_len=0, with_cookies=False, with_nofollow=False,
                      with_sitemaps=False, with_meta=False)
    return fx


# ------------------------------------------------------------------ #
# worker: one (mode, cores) measurement in a fresh JVM
# ------------------------------------------------------------------ #
def _kernel_frames(spark, fx: str, rep: int):
    """Shared dataflow: pages x rep -> extract -> canonicalize ->
    fingerprint (one scheduler-round's per-URL pipeline)."""
    from pyspark.sql import functions as F
    from crawlspark.engine import SPAN_STRUCT, _extract_fn
    from pyspark.sql.types import (ArrayType, BooleanType, StringType,
                                   StructField, StructType)

    cores = spark.sparkContext.defaultParallelism
    pages = spark.read.parquet(os.path.join(fx, "pages.parquet")) \
        .select("url_canon", "body_html")
    # repartition the BASE pages (3 MB), then explode in place — never
    # shuffle the replicated bodies (that shuffle is disk-bound and flat
    # across cores, which is exactly what this measurement must avoid)
    big = (pages.repartition(cores * 3)
           .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
           .withColumn("url_canon",
                       F.concat("url_canon", F.lit("?rep="),
                                F.col("rep").cast("string"))))
    schema = StructType([StructField("url_canon", StringType()),
                         StructField("spans", ArrayType(SPAN_STRUCT)),
                         StructField("outlinks", ArrayType(StringType())),
                         StructField("outlinks_canon",
                                     ArrayType(StringType())),
                         StructField("outforms_action",
                                     ArrayType(StringType())),
                         StructField("outforms_body",
                                     ArrayType(StringType())),
                         StructField("is_sitemap", BooleanType()),
                         StructField("canonical_url", StringType())])
    extracted = big.select("url_canon", "body_html") \
        .mapInPandas(_extract_fn(["url_canon"]), schema)
    links = (extracted
             # the extractor emits canonical links (fused D1) — one python
             # stage total, like the engine's round
             .select("url_canon",
                     F.posexplode("outlinks_canon").alias("pos", "link_canon"))
             # propagate the rep suffix so the dedup/shuffle side scales
             # with the input instead of collapsing to the base graph
             .withColumn("link_canon",
                         F.concat("link_canon", F.lit("#"),
                                  F.regexp_extract("url_canon",
                                                   r"rep=(\d+)", 1)))
             .withColumn("fingerprint",
                         F.sha1(F.concat(F.lit("GET"), F.col("link_canon")))))
    return extracted, links, big


def run_kernel(spark, fx: str, rep: int) -> dict:
    """One scheduler-round dataflow over pages x rep — a single Spark job,
    INCLUDING the dedup exchange (distinct over fingerprints)."""
    _, links, big = _kernel_frames(spark, fx, rep)
    # project to the 40-byte fingerprint BEFORE the distinct shuffle
    fps = links.select("fingerprint")
    t0 = time.time()
    n = fps.distinct().count()
    dt = time.time() - t0
    n_pages_proc = big.count()
    return {"seconds": round(dt, 2), "distinct_links": n,
            "pages_parsed": n_pages_proc,
            "urls_per_sec": round(n_pages_proc / dt, 2)}


def run_compute(spark, fx: str, rep: int) -> dict:
    """The per-URL COMPUTE of one round (X8/X9 parse + D1 canonicalize + D2
    fingerprint) with a checksum aggregate instead of the dedup exchange:
    no data shuffle at all, so this isolates how the vectorized per-URL
    work itself scales with cores. (The dedup exchange's scaling is
    measured separately by the kernel mode; on a real cluster the exchange
    bandwidth also scales with executors, which a single box cannot show.)"""
    from pyspark.sql import functions as F
    _, links, big = _kernel_frames(spark, fx, rep)
    agg = links.select(F.xxhash64("fingerprint").alias("h")) \
        .agg(F.expr("bit_xor(h)").alias("checksum"),
             F.count("*").alias("n_links"))
    t0 = time.time()
    row = agg.collect()[0]
    dt = time.time() - t0
    n_pages_proc = big.count()
    return {"seconds": round(dt, 2), "n_links": row["n_links"],
            "checksum": int(row["checksum"]),
            "pages_parsed": n_pages_proc,
            "urls_per_sec": round(n_pages_proc / dt, 2)}


def run_crawl(spark, fx: str, rounds: int) -> dict:
    import shutil
    from crawlspark.engine import CrawlEngine
    cfg = crawl_config()
    warm = tempfile.mkdtemp(prefix="scal_warm_")
    CrawlEngine(spark, fx, warm, cfg).run(max_rounds=1)
    shutil.rmtree(warm, ignore_errors=True)
    run_dir = tempfile.mkdtemp(prefix="scal_run_")
    try:
        eng = CrawlEngine(spark, fx, run_dir, cfg)
        t0 = time.time()
        m = eng.run(max_rounds=rounds)
        dt = time.time() - t0
        ded = sum(r["deduped"] for r in
                  eng.metrics_df(m).select("deduped").collect())
        fetched = m["state"]["total_fetched"]
        return {"seconds": round(dt, 2), "rounds": m["round"] + 1,
                "urls_fetched": fetched, "urls_deduped": int(ded),
                "urls_per_sec": round((fetched + ded) / dt, 2)}
    finally:
        import shutil as _sh
        _sh.rmtree(run_dir, ignore_errors=True)


def worker(args) -> None:
    spark = build_session(args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    fx = ensure_fixture(args.n_pages)
    if args.mode == "kernel":
        # warmup: small run to JIT codegen + spawn python workers
        run_kernel(spark, fx, max(1, args.rep // 8))
        out = run_kernel(spark, fx, args.rep)
    elif args.mode == "compute":
        run_compute(spark, fx, max(1, args.rep // 8))
        out = run_compute(spark, fx, args.rep)
    else:
        out = run_crawl(spark, fx, args.rounds)
    print("WORKER_JSON:" + json.dumps(out))


def _burn(seconds: float) -> int:
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def _bw_burn(seconds: float) -> int:
    """Memory-bandwidth burn: bytes moved by repeated 128 MB copies."""
    import numpy as np
    src = np.frombuffer(np.random.bytes(128 * 1024 * 1024), dtype=np.uint8)
    dst = np.empty_like(src)
    t0 = time.time()
    n = 0
    while time.time() - t0 < seconds:
        np.copyto(dst, src)
        n += 1
    return n * len(src) * 2


def calibrate_bandwidth(widths: tuple[int, ...], seconds: float = 2.0,
                        trials: int = 2) -> dict[int, float]:
    """Aggregate memory bandwidth (GB/s) by process count. The tight-loop
    CPU burn is cache-resident and blind to the memory subsystem; Spark's
    parse/shuffle path is partly bandwidth-bound, so BOTH ceilings bound
    what is measurable on one box (a real cluster brings 4N x bandwidth
    with 4N executors)."""
    import multiprocessing as mp
    out = {}
    for n in widths:
        best = 0.0
        for _ in range(trials):
            with mp.Pool(n) as p:
                t0 = time.time()
                tot = sum(p.map(_bw_burn, [seconds] * n))
                best = max(best, tot / (time.time() - t0))
        out[n] = best / 1e9
    return out


def calibrate(widths: tuple[int, ...], seconds: float = 2.0,
              trials: int = 3) -> dict[int, float]:
    """Effective parallel CPU capacity of this box (pure-python burn, no
    Spark): iterations/sec by process count. This is the sandbox's hardware
    ceiling — a shared VM delivers sub-linear capacity at high widths, which
    bounds ANY engine's measurable scaling here."""
    import multiprocessing as mp

    burn = _burn
    out = {}
    for n in widths:
        best = 0.0
        for _ in range(trials):
            with mp.Pool(n) as p:
                t0 = time.time()
                tot = sum(p.map(burn, [seconds] * n))
                best = max(best, tot / (time.time() - t0))
        out[n] = best
    return out


# ------------------------------------------------------------------ #
# orchestrator
# ------------------------------------------------------------------ #
def spawn(mode: str, cores: int, n_pages: int, rep: int, rounds: int) -> dict:
    # pin the WHOLE process tree (JVM + python workers) to `cores` cpus —
    # local[N] alone under-counts: python workers are extra processes, so an
    # unpinned local[4] actually consumes ~2x4 cores and inflates the
    # small-N baseline
    cmd = ["taskset", "-c", f"0-{cores - 1}",
           sys.executable, os.path.abspath(__file__), "--worker",
           "--mode", mode, "--cores", str(cores), "--n-pages", str(n_pages),
           "--rep", str(rep), "--rounds", str(rounds)]
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith("WORKER_JSON:"):
            return json.loads(line[len("WORKER_JSON:"):])
    raise RuntimeError(f"worker failed ({mode}, {cores}):\n{p.stdout[-2000:]}"
                       f"\n{p.stderr[-2000:]}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--mode", choices=["compute", "kernel", "crawl"],
                    default="kernel")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--n-pages", type=int,
                    default=int(os.environ.get("CRAWLSPARK_SCALING_PAGES",
                                               "20000")))
    ap.add_argument("--rep", type=int,
                    default=int(os.environ.get("CRAWLSPARK_SCALING_REP",
                                               "60")))
    ap.add_argument("--rounds", type=int, default=6)
    ap.add_argument("--kernel-pages", type=int,
                    default=int(os.environ.get("CRAWLSPARK_KERNEL_PAGES",
                                               "3000")))
    ap.add_argument("--trials", type=int,
                    default=int(os.environ.get("CRAWLSPARK_SCALING_TRIALS",
                                               "3")))
    ap.add_argument("--modes", default="compute,kernel,crawl",
                    help="comma list of tiers to (re)measure; others keep "
                         "their previously recorded results")
    args = ap.parse_args()
    if args.worker:
        worker(args)
        return 0

    ensure_fixture(args.n_pages)  # build once, shared by all workers

    print("calibrating hardware ceiling (pure-python burn)...", flush=True)
    calib = calibrate((4, 8, 16, 32))
    hw_eff = {f"{lo}->{hi}": round(calib[hi] / (4 * calib[lo]), 3)
              for lo, hi in ((4, 16), (8, 32))}
    print(f"CPU ceiling (N->4N efficiency): {hw_eff}", flush=True)
    bw = calibrate_bandwidth((4, 8, 16, 32))
    bw_eff = {f"{lo}->{hi}": round(bw[hi] / (4 * bw[lo]), 3)
              for lo, hi in ((4, 16), (8, 32))}
    print(f"memory-bandwidth GB/s: { {k: round(v,1) for k,v in bw.items()} }"
          f" (N->4N efficiency: {bw_eff})", flush=True)

    # (mode, n_pages, N, 4N, trials) — trials interleaved lo/hi so host
    # drift hits both levels equally; compute/kernel use the small base
    # graph (bigger inputs make the dedup exchange disk-bound, see
    # BENCH/BASELINE.md)
    kp = args.kernel_pages
    want = set(args.modes.split(","))
    pairs = [p for p in
             [("compute", kp, 4, 16, args.trials),
              ("compute", kp, 8, 32, args.trials),
              ("kernel", kp, 4, 16, args.trials),
              ("kernel", kp, 8, 32, args.trials),
              ("crawl", args.n_pages, 8, 32, max(2, args.trials - 1))]
             if p[0] in want]
    results: dict[str, dict[int, list[dict]]] = {}
    for mode, np_, lo, hi, trials in pairs:
        res = results.setdefault(f"{mode}_{lo}to{hi}", {})
        for t in range(trials):
            for cores in (lo, hi):
                r = spawn(mode, cores, np_, args.rep, args.rounds)
                print(f"{mode} local[{cores}] trial {t}: {r}", flush=True)
                res.setdefault(cores, []).append(r)

    def med(key, cores):
        return statistics.median(
            r["urls_per_sec"] for r in results[key][cores])

    summary = {}
    for mode, np_, lo, hi, _ in pairs:
        key = f"{mode}_{lo}to{hi}"
        t_lo, t_hi = med(key, lo), med(key, hi)
        raw = t_hi / (4 * t_lo)
        ceil = calib[hi] / (4 * calib[lo])
        summary[key] = {
            f"urls_per_sec_local{lo}": t_lo,
            f"urls_per_sec_local{hi}": t_hi,
            "efficiency_raw": round(raw, 3),
            "hardware_ceiling_efficiency": round(ceil, 3),
            "efficiency_vs_ceiling": round(raw / ceil, 3),
        }
    # merge with previously recorded trials for tiers not re-measured
    prev_path = os.path.join(REPO, "BENCH", "scaling.json")
    if os.path.isfile(prev_path):
        with open(prev_path) as f:
            prev = json.load(f)
        for key, v in prev.get("summary", {}).items():
            summary.setdefault(key, v)
    out = {"n_pages": args.n_pages, "rep": args.rep,
           "calibration_iters_per_sec": {str(k): round(v) for k, v in
                                         calib.items()},
           "calibration_bandwidth_gb_s": {str(k): round(v, 1) for k, v in
                                          bw.items()},
           "summary": summary,
           "trials": {m: {str(c): rs for c, rs in cs.items()}
                      for m, cs in results.items()}}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": summary}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
