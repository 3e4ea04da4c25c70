"""dont_filter re-seeding (r3, VERDICT r02 missing #6)
[S:scrapy/http/request::Request.dont_filter].

Crawl 3 rounds, then inject re-seeds: the two mega roots (crawled in
round 0) with dont_filter=True — they must be RE-fetched — plus one
already-seen URL with dont_filter=False (a no-op) and one genuinely new
URL with dont_filter=False. The resumed run must equal the oracle's
reseed model rank for rank.
"""

from __future__ import annotations

import pandas as pd

from crawlspark.engine import CrawlEngine
from crawlspark.fixtures.webgraph import (
    MEGA_HOSTS, default_config, write_fixture,
)
from crawlspark.kernels.canon import canonicalize_url, fingerprint_hex
from crawlspark.oracle.simulator import simulate

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]
K = 3   # rounds before injection


def test_dont_filter_reseed_oracle_exact(spark, tmp_path_factory):
    cfg = default_config()
    fx = str(tmp_path_factory.mktemp("df_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}

    root0 = f"https://{MEGA_HOSTS[0]}/"
    root1 = f"https://{MEGA_HOSTS[1]}/"
    # a real page NOT reachable as a seed (will be seen by then or not —
    # either way dont_filter=False dedups it correctly)
    fresh = pdfs["pages"].iloc[40].url_canon
    reseeds = [(root0, True), (root1, True),
               (root0, False),          # seen + not dont_filter -> no-op
               (fresh, False)]

    oracle = simulate(pdfs, cfg, reseed=(K, reseeds))

    run_dir = str(tmp_path_factory.mktemp("df_run"))
    eng = CrawlEngine(spark, fx, run_dir, cfg)
    eng.run(max_rounds=K)
    eng.inject_seeds(pd.DataFrame(
        [{"url": u, "dont_filter": d} for u, d in reseeds]))
    manifest = eng.run(resume=True)

    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(eng.seen_df(manifest).toPandas().fingerprint) == oracle.seen

    # the dont_filter roots really were fetched twice
    fp0 = fingerprint_hex(canonicalize_url(root0))
    fp1 = fingerprint_hex(canonicalize_url(root1))
    counts = got.fingerprint.value_counts()
    assert counts[fp0] == 2 and counts[fp1] == 2
    # rounds of the two fetches: 0 and >= K
    assert sorted(got[got.fingerprint == fp0]["round"]) [0] == 0
    assert sorted(got[got.fingerprint == fp0]["round"]) [1] >= K
    # no fingerprint is fetched twice without dont_filter — except X10
    # retries (their own dont_filter stream re-fetches after 5xx/429)
    from crawlspark.config import RETRY_CODES
    retried = set(got[got.status.isin(list(RETRY_CODES))].fingerprint)
    dupes = {fp for fp, c in counts.items() if c > 1}
    assert dupes <= {fp0, fp1} | retried


def test_dont_filter_reseed_in_delta_mode(spark, tmp_path_factory):
    """inject_seeds amends the frontier as a full rewrite that doubles as
    a delta compaction — under frontier_deltas=True the resumed run must
    still be rank-exact vs the oracle."""
    from crawlspark.config import CrawlConfig

    base = default_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "frontier_deltas": True,
                         "frontier_compact_every": 3})
    fx = str(tmp_path_factory.mktemp("dfd_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    root0 = f"https://{MEGA_HOSTS[0]}/"
    reseeds = [(root0, True)]
    oracle = simulate(pdfs, cfg, reseed=(K, reseeds))

    eng = CrawlEngine(spark, fx, str(tmp_path_factory.mktemp("dfd_run")),
                      cfg)
    eng.run(max_rounds=K)
    eng.inject_seeds(pd.DataFrame(
        [{"url": u, "dont_filter": d} for u, d in reseeds]))
    manifest = eng.run(resume=True)
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    fp0 = fingerprint_hex(canonicalize_url(root0))
    assert (got.fingerprint == fp0).sum() == 2
