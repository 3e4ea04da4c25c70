"""X17 (r5, VERDICT r04 missing #1): live robots.txt acquisition
[S:scrapy/downloadermiddlewares/robotstxt.py::RobotsTxtMiddleware
._parse_robots].

robots.txt is itself downloaded through the scheduler — lazily per host
on first contact, consuming one politeness slot and a crawl_order rank —
then PARSED into the gating rules and crawl-delay. Until a host's robots
arrives its regular requests wait in the frontier; any non-200 robots
response (404, synthetic 598, ...) records allow-all (Scrapy's no-robots
default) and is never retried. `Sitemap:` lines enqueue as ordinary
discoveries when sitemaps are on. robots_ttl_rounds re-fetches on a
schedule. Every behavior is pinned oracle-exact (crawl order, documents,
metrics).
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import ROBOTS_PRIORITY, CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.kernels.canon import fingerprint_hex
from crawlspark.kernels.parse import Span, render_html
from crawlspark.kernels.robots import render_robots_txt
from crawlspark.oracle.simulator import simulate

HOSTS = ("a.test", "b.test", "c.test")
ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]


def _page(host, path, status=200, latency=10.0, hrefs=(), body=None):
    sp = [Span("text", f"page {host}{path}", None, 0)]
    return {
        "url_canon": f"https://{host}{path}" if path != "/"
        else f"https://{host}/",
        "status": status, "redirect_to": None, "succeeds_after": None,
        "latency_ms": latency,
        "body_html": body if body is not None
        else render_html(path, sp, list(hrefs), []),
        "retry_after_s": None,
    }


def _graph(tmpdir: str) -> dict[str, pd.DataFrame]:
    """Three hosts: a.test has rules (disallow /private, crawl-delay) and
    a Sitemap: line pointing at an orphan-bearing sitemap; b.test serves
    an EMPTY robots.txt (allow-all); c.test has NO /robots.txt page at
    all (404 -> allow-all)."""
    sm_body = ("<?xml version='1.0'?><urlset>"
               "<url><loc>https://a.test/orphan</loc></url></urlset>")
    pages = [
        _page("a.test", "/", hrefs=["/one", "/private/x", "/two"]),
        _page("a.test", "/one"), _page("a.test", "/two"),
        _page("a.test", "/private/x"),
        _page("a.test", "/orphan"),
        _page("a.test", "/sitemap.xml", body=sm_body),
        _page("a.test", "/robots.txt",
              body=render_robots_txt(
                  [], ["/private"], 0.05,
                  ["https://a.test/sitemap.xml"])),
        _page("b.test", "/", hrefs=["/alpha"]),
        _page("b.test", "/alpha"),
        _page("b.test", "/robots.txt", body=render_robots_txt([], [], None)),
        _page("c.test", "/", hrefs=["/beta"]),
        _page("c.test", "/beta"),
    ]
    dfs = {
        "pages": pd.DataFrame(pages),
        "seeds": pd.DataFrame({
            "seed_id": [0, 1, 2],
            "url": [f"https://{h}/" for h in HOSTS]}),
        # the robots TABLE must be IGNORED in live mode: give it rules
        # that contradict the served robots.txt bodies
        "robots": pd.DataFrame({
            "host": list(HOSTS),
            "allow_prefixes": [[], [], []],
            "disallow_prefixes": [["/one"], ["/alpha"], ["/beta"]],
            "crawl_delay_s": [None, None, None],
            "sitemap_urls": [[], [], []]}),
        "host_policy": pd.DataFrame({
            "host": list(HOSTS), "crawl_delay_s": [0.05] * 3,
            "max_concurrency": [8] * 3, "salt_n": [1] * 3}),
    }
    for name, df in dfs.items():
        df.to_parquet(f"{tmpdir}/{name}.parquet", index=False)
    return dfs


def _run(spark, tmp_path_factory, tag, cfg, pdfs, fx):
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp(f"rf_run_{tag}")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    m = (eng.metrics_df(manifest).toPandas()
         .groupby("host")[["fetched", "ok", "errors", "robots_blocked"]]
         .sum().astype(int))
    om = (pd.DataFrame(oracle.metrics).groupby("host")[
        ["fetched", "ok", "errors", "robots_blocked"]].sum().astype(int))
    pd.testing.assert_frame_equal(m, om, check_like=True)
    docs = set(eng.documents_df(manifest).toPandas().doc_id)
    assert docs == set(oracle.documents)
    return got, docs, oracle


def test_robots_fetch_oracle_exact(spark, tmp_path_factory):
    fx = str(tmp_path_factory.mktemp("rf_graph"))
    pdfs = _graph(fx)
    cfg = CrawlConfig(allowed_domains=HOSTS, robots_fetch=True)
    got, docs, oracle = _run(spark, tmp_path_factory, "live", cfg, pdfs, fx)

    rb_urls = {f"https://{h}/robots.txt" for h in HOSTS}
    rb_rows = got[got.url_canon.isin(rb_urls)]
    # every host's robots.txt was fetched exactly once, all in round 0
    # (top priority: nothing else from the host may download first)
    assert len(rb_rows) == 3 and set(rb_rows["round"]) == {0}
    assert set(got[got["round"] == 0].url_canon) == rb_urls
    # c.test has no robots page: 404, recorded allow-all, NOT retried
    c_rb = rb_rows[rb_rows.host == "c.test"]
    assert set(c_rb.status) == {404} and len(c_rb) == 1
    crawled = set(got.url_canon)
    assert f"https://c.test/beta" in crawled            # allow-all worked
    # the PARSED rules gate (the contradictory fixture TABLE is ignored):
    # /private blocked on a.test, /one NOT blocked
    assert "https://a.test/private/x" not in crawled
    assert "https://a.test/one" in crawled
    assert "https://b.test/alpha" in crawled
    # the robots Sitemap: line was followed -> orphan reached
    assert "https://a.test/sitemap.xml" in crawled
    assert "https://a.test/orphan" in crawled
    # robots fetches and sitemap fetches produce no document
    for u in rb_urls | {"https://a.test/sitemap.xml"}:
        assert fingerprint_hex(u) not in docs
    # regular requests waited for robots: real pages start in round 1
    seeds = got[got.url_canon.isin({f"https://{h}/" for h in HOSTS})]
    assert set(seeds["round"]) == {1}


def test_robots_fetch_fixture_graph_oracle_exact(spark, tmp_path_factory):
    """Composition gate: the full generated webgraph (skew, redirects,
    retries, forms, sitemaps-in-robots, cookies) under live acquisition —
    crawl order, metrics and documents oracle-exact end-to-end."""
    from crawlspark.fixtures.webgraph import default_config, write_fixture
    base = default_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "robots_fetch": True})
    fx = str(tmp_path_factory.mktemp("rf_web"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    got, docs, oracle = _run(spark, tmp_path_factory, "web", cfg, pdfs, fx)
    assert (got.url_canon.str.endswith("/robots.txt")).sum() > 0


def test_robots_ttl_refetch_oracle_exact(spark, tmp_path_factory):
    """robots_ttl_rounds: an entry fetched at round f expires once
    rnd - f >= ttl; the host reverts to unknown, its pending requests
    wait, and robots.txt is re-fetched (one more crawl_order row) before
    crawling continues. A CYCLIC one-host chain (/ -> /a -> /b -> /c ->
    /) plus a seen-TTL re-crawl keeps requests pending long enough to
    cross the expiry — a finite acyclic graph would drain first."""
    fx = str(tmp_path_factory.mktemp("rft_graph"))
    from crawlspark.kernels.robots import render_robots_txt
    pages = [
        _page("a.test", "/", hrefs=["/a"]),
        _page("a.test", "/a", hrefs=["/b"]),
        _page("a.test", "/b", hrefs=["/c"]),
        _page("a.test", "/c", hrefs=["/"]),
        _page("a.test", "/robots.txt",
              body=render_robots_txt([], [], 0.05)),
    ]
    pdfs = {
        "pages": pd.DataFrame(pages),
        "seeds": pd.DataFrame({"seed_id": [0],
                               "url": ["https://a.test/"]}),
        "robots": pd.DataFrame({
            "host": ["a.test"], "allow_prefixes": [[]],
            "disallow_prefixes": [[]], "crawl_delay_s": [None],
            "sitemap_urls": [[]]}),
        "host_policy": pd.DataFrame({
            "host": ["a.test"], "crawl_delay_s": [0.05],
            "max_concurrency": [8], "salt_n": [1]}),
    }
    for name, df in pdfs.items():
        df.to_parquet(f"{fx}/{name}.parquet", index=False)
    cfg = CrawlConfig(allowed_domains=("a.test",), robots_fetch=True,
                      robots_ttl_rounds=3, seen_ttl_rounds=2,
                      max_rounds=12)
    got, docs, oracle = _run(spark, tmp_path_factory, "ttl", cfg, pdfs, fx)
    a_rb = got[got.url_canon == "https://a.test/robots.txt"]
    assert len(a_rb) >= 2, "robots.txt was not re-fetched after the TTL"
    rounds = sorted(a_rb["round"])
    assert rounds[1] - rounds[0] >= cfg.robots_ttl_rounds
    # the waiting round really paused the host: no regular fetch shares
    # a round with a robots re-fetch on this single-host graph
    rb_rounds = set(a_rb["round"])
    reg_rounds = set(got[~got.url_canon.str.endswith("/robots.txt")]
                     ["round"])
    assert not (rb_rounds & reg_rounds)


def test_robots_fetch_off_by_default():
    cfg = CrawlConfig()
    assert cfg.robots_fetch is False and cfg.robots_ttl_rounds == 0
    assert ROBOTS_PRIORITY > 10**6
