"""F6 stop conditions beyond pending==0/max_rounds: page_budget
(CLOSESPIDER_PAGECOUNT), item_budget (CLOSESPIDER_ITEMCOUNT, r3) and
error_budget (CLOSESPIDER_ERRORCOUNT, r4)
[S:scrapy/extensions/closespider.py]. All are graceful closes — the
crossing round completes, so engine and oracle stop at the SAME round
and the crawl orders are rank-exact.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.oracle.simulator import simulate

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]


@pytest.mark.parametrize("knob,value", [("page_budget", 30),
                                        ("item_budget", 20),
                                        ("error_budget", 5)])
def test_budget_stop_oracle_exact(spark, tmp_path_factory, knob, value):
    base = default_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         knob: value})
    fx = str(tmp_path_factory.mktemp(f"sb_{knob}"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg)
    unbudgeted = simulate(pdfs, default_config())
    assert oracle.rounds < unbudgeted.rounds   # the budget actually bit

    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp(f"sb_run_{knob}")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    if knob == "page_budget":
        assert manifest["state"]["total_fetched"] >= value
    elif knob == "item_budget":
        assert manifest["state"]["total_items"] >= value
        assert manifest["state"]["total_items"] == len(oracle.documents)
    else:
        assert manifest["state"]["total_errors"] >= value
        m = eng.metrics_df(manifest).toPandas()
        assert manifest["state"]["total_errors"] == int(m.errors.sum())
