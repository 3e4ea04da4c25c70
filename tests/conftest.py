"""Shared pytest fixtures: one SparkSession, one synthetic web graph, one
full engine run + one oracle run reused by every correctness test
(SURVEY.md §5.2 test pyramid)."""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.fixtures.webgraph import default_config, write_fixture

N_PAGES = 120
SEED = 42


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[8]")
         .appName("crawlspark-tests")
         .config("spark.driver.memory", "6g")
         # AQE off for tiny test rounds: its per-stage replanning dominates
         # wall time at this scale; bench.py runs with AQE ON (session.py)
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("webgraph"))
    cfg = write_fixture(d, n_pages=N_PAGES, seed=SEED)
    return d, cfg


@pytest.fixture(scope="session")
def fixture_pdfs(fixture_dir):
    d, _ = fixture_dir
    return {n: pd.read_parquet(f"{d}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}


@pytest.fixture(scope="session")
def oracle_result(fixture_pdfs, fixture_dir):
    from crawlspark.oracle.simulator import simulate
    _, cfg = fixture_dir
    return simulate(fixture_pdfs, cfg)


@pytest.fixture(scope="session")
def engine_run(spark, fixture_dir, tmp_path_factory):
    """Full uninterrupted engine run; returns (engine, final manifest)."""
    from crawlspark.engine import CrawlEngine
    d, cfg = fixture_dir
    run_dir = str(tmp_path_factory.mktemp("run_full"))
    eng = CrawlEngine(spark, d, run_dir, cfg)
    manifest = eng.run()
    return eng, manifest
