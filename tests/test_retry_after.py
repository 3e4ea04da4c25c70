"""X10->F4 Retry-After coupling (r3, VERDICT r02 item 8)
[S:scrapy 2.x RetryMiddleware reads Retry-After].

A hand-built graph with one throttling host: the root links 12 pages
plus /throttle, which 429s with Retry-After: 50s (succeeds after one
retry). The round AFTER the 429 must use delay = max(delay_eff, 50) —
budget collapses to exactly 1 fetch — and the signal clears once
consumed. Engine-vs-oracle exact; a control run with
honor_retry_after=False shows the throttle actually bit. The default
session graph also carries retry_after_s on ~60% of its 429/503 pages,
so the session parity gate exercises the path continuously.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.kernels.parse import Span, render_html
from crawlspark.oracle.simulator import simulate

HOST = "a.test"
ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]


def _graph(tmpdir: str) -> dict[str, pd.DataFrame]:
    root = f"https://{HOST}/"
    leaves = [f"/p{i}" for i in range(12)]
    # /throttle rendered LAST -> highest enqueue_seq -> fetched FIRST
    # under LIFO, so its 429 lands in round 1
    hrefs = leaves + ["/throttle"]
    sp = [Span("text", "root", None, 0)]
    pages = [{
        "url_canon": root, "status": 200, "redirect_to": None,
        "succeeds_after": None, "latency_ms": 10.0,
        "body_html": render_html("root", sp, hrefs, []),
        "retry_after_s": None,
    }]
    for p in leaves:
        lsp = [Span("text", f"leaf {p}", None, 0)]
        pages.append({
            "url_canon": f"https://{HOST}{p}", "status": 200,
            "redirect_to": None, "succeeds_after": None,
            "latency_ms": 10.0,
            "body_html": render_html(p, lsp, [], []),
            "retry_after_s": None,
        })
    tsp = [Span("text", "throttled", None, 0)]
    pages.append({
        "url_canon": f"https://{HOST}/throttle", "status": 429,
        "redirect_to": None, "succeeds_after": 1, "latency_ms": 10.0,
        "body_html": render_html("/throttle", tsp, [], []),
        "retry_after_s": 50.0,
    })
    dfs = {
        "pages": pd.DataFrame(pages),
        "seeds": pd.DataFrame({"seed_id": [0], "url": [root]}),
        "robots": pd.DataFrame({
            "host": [HOST], "allow_prefixes": [["/never"]],
            "disallow_prefixes": [["/neverever"]],
            "crawl_delay_s": [0.5]}),
        "host_policy": pd.DataFrame({
            "host": [HOST], "crawl_delay_s": [0.5],
            "max_concurrency": [8], "salt_n": [1]}),
    }
    for name, df in dfs.items():
        df.to_parquet(f"{tmpdir}/{name}.parquet", index=False)
    return dfs


def _cfg(honor: bool) -> CrawlConfig:
    return CrawlConfig(allowed_domains=(HOST,), honor_retry_after=honor)


@pytest.mark.parametrize("honor", [True, False])
def test_retry_after_oracle_exact(spark, tmp_path_factory, honor):
    fx = str(tmp_path_factory.mktemp(f"ra_graph_{honor}"))
    pdfs = _graph(fx)
    cfg = _cfg(honor)
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp(f"ra_run_{honor}")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    fetched = {r: int(n) for r, n in
               got.groupby("round").size().items()}
    # round 0: the seed; round 1: budget 8 incl. the 429
    assert fetched[0] == 1 and fetched[1] == 8
    assert 429 in set(got[got["round"] == 1].status)
    if honor:
        # round 2: delay = max(0.5, 50) -> budget exactly 1
        assert fetched[2] == 1
        # round 3: one-shot consumed -> full budget again for the rest
        assert fetched.get(3, 0) > 1
    else:
        # control: without honoring, round 2 drains at normal budget
        assert fetched[2] > 1


def test_retry_after_composes_with_autothrottle(spark, tmp_path_factory):
    """Interplay pin: with BOTH AutoThrottle and Retry-After active the
    effective delay is max(clamped adaptive delay, retry_after) — engine
    and oracle must agree rank for rank, and the post-429 round must
    still collapse to one fetch (retry_after=50 dominates any AT state
    below at_max)."""
    fx = str(tmp_path_factory.mktemp("ra_at_graph"))
    _graph(fx)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    cfg = CrawlConfig(allowed_domains=(HOST,), honor_retry_after=True,
                      autothrottle=True, at_start_delay_s=0.5,
                      at_target_concurrency=4.0)
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp("ra_at_run")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    fetched = {r: int(n) for r, n in got.groupby("round").size().items()}
    assert 429 in set(got[got["round"] == 1].status)
    assert fetched[2] == 1
