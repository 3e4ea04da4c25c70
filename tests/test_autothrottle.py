"""A5 AutoThrottle (opt-in): engine == oracle under adaptive per-host
delays, and the adaptation actually changes scheduling vs the static
config (guards against a silently-inert flag)."""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.engine import HOST_STATE_SCHEMA, CrawlEngine
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.oracle.simulator import simulate

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "status"]


@pytest.fixture(scope="module")
def at_setup(spark, tmp_path_factory):
    base = default_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "autothrottle": True,
                         "at_start_delay_s": 2.0,
                         "at_max_delay_s": 6.0,
                         "at_target_concurrency": 2.0})
    fx = str(tmp_path_factory.mktemp("at_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg)
    run_dir = str(tmp_path_factory.mktemp("at_run"))
    eng = CrawlEngine(spark, fx, run_dir, cfg)
    manifest = eng.run()
    return eng, manifest, oracle, pdfs, cfg


def test_autothrottle_order_matches_oracle(at_setup):
    eng, manifest, oracle, _, _ = at_setup
    got = (eng.crawl_order_df(manifest).orderBy("rank").toPandas()[ORDER_COLS]
           .reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(eng.seen_df(manifest).toPandas().fingerprint) == oracle.seen


def test_autothrottle_state_adapts(at_setup):
    """Final at_delay_s must have moved off the start value for fetched
    hosts (latencies are 20-220 ms, start is 2 s -> delays shrink toward
    the per-host floor)."""
    eng, manifest, _, _, cfg = at_setup
    hs = eng.store.read(eng.spark, manifest, "host_state",
                        HOST_STATE_SCHEMA).toPandas()
    fetched_hosts = set(
        eng.crawl_order_df(manifest).toPandas().host.unique())
    moved = hs[hs.host.isin(fetched_hosts)]
    assert len(moved) > 0
    assert (moved.at_delay_s < cfg.at_start_delay_s).any()
    assert (moved.at_delay_s > 0).all()


def test_autothrottle_changes_schedule_vs_static(at_setup, spark,
                                                 tmp_path_factory):
    """Same graph, autothrottle off -> different round assignment (the
    flag is load-bearing, not cosmetic)."""
    eng, manifest, _, pdfs, cfg = at_setup
    static_cfg = CrawlConfig(**{**cfg.to_dict(),
                                "allowed_domains": cfg.allowed_domains,
                                "autothrottle": False})
    # binding start delay: budget = floor(8/8) = 1 per host until the
    # latency feedback (20-220 ms responses) pulls the delay down
    strong_cfg = CrawlConfig(**{**cfg.to_dict(),
                                "allowed_domains": cfg.allowed_domains,
                                "at_start_delay_s": 8.0,
                                "at_max_delay_s": 8.0})
    static = simulate(pdfs, static_cfg)
    at_rounds = {(r["fingerprint"], r["round"])
                 for r in simulate(pdfs, strong_cfg).crawl_order}
    st_rounds = {(r["fingerprint"], r["round"]) for r in static.crawl_order}
    assert at_rounds != st_rounds
