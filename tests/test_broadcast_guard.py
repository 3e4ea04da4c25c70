"""J1/J2/F4 join strategy guard (r5, VERDICT r04 #1 done-condition).

The per-host tables in the round-budget path (policy, robots,
host_state, host_round, cookie grants, per-IP slot map) are
broadcast-hinted only while the measured fixture bytes of the two base
tables stay under ``cfg.broadcast_host_max_bytes``; above it the engine
leaves every such join to Catalyst/AQE as a plain shuffled equi-join —
at broad-crawl host cardinality (10^7-10^8 hosts) a FORCED hint
overrides Spark's size check and OOMs the executors, the same failure
mode the r4 ``BROADCAST_EMB_MAX_ROWS`` guard closed in similarity.py.

A real mega-host fixture would need >32 MB of host rows to trip the
guard; ``broadcast_host_max_bytes=0`` is the test lever that forces the
SAME unhinted code path on a small graph. The load-bearing claim is
plan-independence: with no broadcast hint anywhere in the round, crawl
order, documents, and per-host metrics stay oracle-exact — so the
fallback the 10^10 design point relies on is the tested path, not a
dead branch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.oracle.simulator import simulate

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]


def _run_vs_oracle(spark, tmp_path_factory, fx, cfg, tag):
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp(f"bg_run_{tag}")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(eng.documents_df(manifest).toPandas().doc_id) \
        == set(oracle.documents)
    return eng, got


def test_unhinted_path_oracle_exact(spark, tmp_path_factory):
    """threshold 0 -> no broadcast hint on any per-host join; the whole
    crawl (AutoThrottle + Retry-After folding host_state through the
    unhinted joins, skewed mega-hosts exercising J6 on top) must still
    be oracle-exact AND byte-identical to the hinted run."""
    fx = str(tmp_path_factory.mktemp("bg_graph"))
    base = default_config()
    cfg_un = CrawlConfig.from_dict({**base.to_dict(),
                                    "broadcast_host_max_bytes": 0,
                                    "autothrottle": True})
    write_fixture(fx, n_pages=120, seed=11, config=cfg_un, chain_len=0)
    eng_un, got_un = _run_vs_oracle(spark, tmp_path_factory, fx, cfg_un,
                                    "unhinted")
    # the guard actually flipped: identity, not the broadcast hint
    assert eng_un._bcast_host is not F.broadcast

    cfg_h = CrawlConfig.from_dict({**base.to_dict(),
                                   "autothrottle": True})
    eng_h, got_h = _run_vs_oracle(spark, tmp_path_factory, fx, cfg_h,
                                  "hinted")
    assert eng_h._bcast_host is F.broadcast
    # plan-independence: hint on/off changes the physical join only
    pd.testing.assert_frame_equal(got_un, got_h)


def test_unhinted_per_ip_composition(spark, tmp_path_factory):
    """X18 adds one more per-host join (the slot map); the unhinted path
    must stay oracle-exact with per-IP pooling on."""
    fx = str(tmp_path_factory.mktemp("bg_graph_ip"))
    base = default_config()
    cfg = CrawlConfig.from_dict({**base.to_dict(),
                                 "broadcast_host_max_bytes": 0,
                                 "concurrent_requests_per_ip": 2})
    write_fixture(fx, n_pages=120, seed=11, config=cfg, chain_len=0)
    eng, _ = _run_vs_oracle(spark, tmp_path_factory, fx, cfg, "ip")
    assert eng._bcast_host is not F.broadcast
