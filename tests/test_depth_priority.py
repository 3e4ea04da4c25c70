"""DEPTH_PRIORITY (r2): engine == oracle under depth-based priority
shaping, and the flag actually reorders the crawl (BFO shaping with
FIFO queues vs the default DFO) — guards against a silently-inert knob.
[S:scrapy/spidermiddlewares/depth.py]
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.oracle.simulator import simulate

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "status", "depth"]


@pytest.fixture(scope="module")
def dp_setup(spark, tmp_path_factory):
    base = default_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "depth_priority": 1,   # shallower-first (BFO)
                         "lifo": False})
    fx = str(tmp_path_factory.mktemp("dp_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg)
    run_dir = str(tmp_path_factory.mktemp("dp_run"))
    eng = CrawlEngine(spark, fx, run_dir, cfg)
    manifest = eng.run()
    return eng, manifest, oracle, pdfs, cfg


def test_depth_priority_order_matches_oracle(dp_setup):
    eng, manifest, oracle, _, _ = dp_setup
    got = (eng.crawl_order_df(manifest).orderBy("rank").toPandas()[ORDER_COLS]
           .reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(eng.seen_df(manifest).toPandas().fingerprint) == oracle.seen


def test_depth_priority_changes_ordering(dp_setup):
    """With shaping on, the crawl order must differ from the unshaped
    default on the same graph, and per-host dequeues must be depth-
    monotone-biased: the mean depth of early fetches <= later fetches."""
    eng, manifest, oracle, pdfs, cfg = dp_setup
    base = default_config()
    plain = simulate(pdfs, CrawlConfig(**{**base.to_dict(),
                                          "allowed_domains":
                                          base.allowed_domains,
                                          "lifo": False}))
    assert [r["fingerprint"] for r in oracle.crawl_order] != \
        [r["fingerprint"] for r in plain.crawl_order]
    co = pd.DataFrame(oracle.crawl_order)
    half = len(co) // 2
    assert co.depth[:half].mean() <= co.depth[half:].mean() + 1e-9
