"""X16 (r4b): DOWNLOAD_TIMEOUT / DOWNLOAD_MAXSIZE analogues
[S:scrapy default_settings DOWNLOAD_TIMEOUT;
scrapy/core/downloader/handlers/http11.py maxsize;
scrapy/downloadermiddlewares/retry.py EXCEPTIONS_TO_RETRY includes
TimeoutError].

A hand-built graph with one host: /slow (latency 500 ms) and
/slow-redirect (301, latency 400 ms) exceed a 150 ms timeout and must
fail as TIMEOUT_STATUS (598) — retried like Scrapy's TimeoutError, with
the OBSERVED latency capped at the timeout (that is what feeds
AutoThrottle and the politeness carry, so parity would break if either
side recorded the raw latency). /big (a 200 whose body exceeds
DOWNLOAD_MAXSIZE) is cancelled as MAXSIZE_STATUS (413) — terminal, never
retried. Neither produces a document nor discovers its children, and
neither is ever written to the HTTP cache. A control run without limits
serves them all as ordinary responses.
"""

from __future__ import annotations

import pandas as pd

from crawlspark.config import (
    MAXSIZE_STATUS, TIMEOUT_STATUS, CrawlConfig,
)
from crawlspark.engine import CrawlEngine
from crawlspark.kernels.parse import Span, render_html
from crawlspark.oracle.simulator import simulate

HOST = "d.test"
ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]


def _page(path, status=200, latency=10.0, hrefs=(), text=None,
          redirect_to=None):
    sp = [Span("text", text or f"page {path}", None, 0)]
    return {
        "url_canon": f"https://{HOST}{path}" if path != "/" else
        f"https://{HOST}/",
        "status": status, "redirect_to": redirect_to,
        "succeeds_after": None, "latency_ms": latency,
        "body_html": render_html(path, sp, list(hrefs), []),
        "retry_after_s": None,
    }


def _graph(tmpdir: str) -> dict[str, pd.DataFrame]:
    pages = [
        _page("/", hrefs=["/slow", "/big", "/fast", "/slow-redirect"]),
        _page("/slow", latency=500.0, hrefs=["/slow-child"]),
        _page("/slow-child"),
        _page("/big", text="x" * 3000, hrefs=["/big-child"]),
        _page("/big-child"),
        _page("/fast"),
        _page("/slow-redirect", status=301, latency=400.0,
              redirect_to=f"https://{HOST}/redirect-target"),
        _page("/redirect-target"),
    ]
    dfs = {
        "pages": pd.DataFrame(pages),
        "seeds": pd.DataFrame({"seed_id": [0],
                               "url": [f"https://{HOST}/"]}),
        "robots": pd.DataFrame({
            "host": [HOST], "allow_prefixes": [["/never"]],
            "disallow_prefixes": [["/neverever"]],
            "crawl_delay_s": [0.05]}),
        "host_policy": pd.DataFrame({
            "host": [HOST], "crawl_delay_s": [0.05],
            "max_concurrency": [8], "salt_n": [1]}),
    }
    for name, df in dfs.items():
        df.to_parquet(f"{tmpdir}/{name}.parquet", index=False)
    return dfs


def _run(spark, tmp_path_factory, tag, cfg, pdfs, fx):
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp(f"dl_run_{tag}")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    docs = set(eng.documents_df(manifest).toPandas().doc_id)
    assert docs == set(oracle.documents)
    return got, docs, oracle


def test_download_limits_oracle_exact(spark, tmp_path_factory):
    fx = str(tmp_path_factory.mktemp("dl_graph"))
    pdfs = _graph(fx)
    # AutoThrottle ON: observed-latency parity (the 598's capped latency)
    # feeds the adaptive delay, so any engine/oracle disagreement on what
    # a timed-out fetch "took" would diverge the crawl order
    cfg = CrawlConfig(allowed_domains=(HOST,), download_timeout_ms=150.0,
                      download_maxsize_bytes=2000, autothrottle=True)
    got, docs, oracle = _run(spark, tmp_path_factory, "lim", cfg, pdfs, fx)

    by_url = got.groupby("url_canon")
    slow = by_url.get_group(f"https://{HOST}/slow")
    assert set(slow.status) == {TIMEOUT_STATUS}
    assert len(slow) == cfg.retry_times + 1          # retried like a 5xx
    slow_r = by_url.get_group(f"https://{HOST}/slow-redirect")
    assert set(slow_r.status) == {TIMEOUT_STATUS}    # overrides the 301
    big = by_url.get_group(f"https://{HOST}/big")
    assert set(big.status) == {MAXSIZE_STATUS}
    assert len(big) == 1                             # cancel is terminal
    fetched_urls = set(got.url_canon)
    # no body arrived -> no discovery from the failed pages
    assert f"https://{HOST}/slow-child" not in fetched_urls
    assert f"https://{HOST}/big-child" not in fetched_urls
    assert f"https://{HOST}/redirect-target" not in fetched_urls
    assert f"https://{HOST}/fast" in fetched_urls
    # and no documents for them
    failed_fps = set(slow.fingerprint) | set(big.fingerprint)
    assert not failed_fps & docs

    # control: the SAME graph with limits off serves everything
    got_c, docs_c, _ = _run(spark, tmp_path_factory, "ctl",
                            CrawlConfig(allowed_domains=(HOST,),
                                        autothrottle=True), pdfs, fx)
    assert set(got_c[got_c.url_canon == f"https://{HOST}/slow"].status) \
        == {200}
    assert set(got_c[got_c.url_canon == f"https://{HOST}/big"].status) \
        == {200}
    for child in ("/slow-child", "/big-child", "/redirect-target"):
        assert f"https://{HOST}{child}" in set(got_c.url_canon)
    assert len(docs_c) > len(docs)


def test_download_limits_never_cached(spark, tmp_path_factory):
    """X16 x X12: synthetic failures received no complete response, so a
    re-crawl sharing the cache must RE-ATTEMPT them (and keep failing),
    while ordinary 200s replay as hits."""
    fx = str(tmp_path_factory.mktemp("dlc_graph"))
    pdfs = _graph(fx)
    cache = str(tmp_path_factory.mktemp("dlc_cache"))
    cfg = CrawlConfig(allowed_domains=(HOST,), download_timeout_ms=150.0,
                      download_maxsize_bytes=2000, http_cache=True)
    for tag in ("first", "second"):
        eng = CrawlEngine(spark, fx,
                          str(tmp_path_factory.mktemp(f"dlc_{tag}")), cfg,
                          cache_dir=cache)
        manifest = eng.run()
        got = eng.crawl_order_df(manifest).toPandas()
        slow = got[got.url_canon == f"https://{HOST}/slow"]
        big = got[got.url_canon == f"https://{HOST}/big"]
        # both crawls hit the network for the failed pages (not cached)
        assert set(slow.status) == {TIMEOUT_STATUS} and len(slow) == 3
        assert set(big.status) == {MAXSIZE_STATUS} and len(big) == 1
    # the shared cache only ever holds completed responses
    import glob
    entries = pd.concat([pd.read_parquet(p) for p in
                         glob.glob(f"{cache}/**/*.parquet",
                                   recursive=True)])
    assert not set(entries.status) & {TIMEOUT_STATUS, MAXSIZE_STATUS}


def test_download_limits_apply_before_revalidation(spark,
                                                   tmp_path_factory):
    """X16 x X12 ordering (r5, ADVICE r04 high): download limits apply to
    the NETWORK TRANSFER itself, so an expired-entry revalidation
    candidate whose conditional GET times out (or whose live body
    oversizes) becomes a retryable 598 / terminal 413 — never a cache
    serve — exactly as the oracle orders it (simulator.py applies
    timeout/maxsize to status before the validator check). Run A fills
    the cache with validated 200s; run B expires everything (ttl=1) and
    mutates the network so /slow times out and /big oversizes while
    their validators stay unchanged; /fast revalidates normally.
    Crawl order, documents and metrics are oracle-exact."""
    fx = str(tmp_path_factory.mktemp("rvl_graph"))
    pages = [
        _page("/", hrefs=["/slow", "/big", "/fast"]),
        _page("/slow", latency=20.0),
        _page("/big", text="small"),
        _page("/fast"),
    ]
    for p in pages:
        p["validator"] = "W/" + p["url_canon"].rsplit("/", 1)[-1]
    pdfs = {
        "pages": pd.DataFrame(pages),
        "seeds": pd.DataFrame({"seed_id": [0],
                               "url": [f"https://{HOST}/"]}),
        "robots": pd.DataFrame({
            "host": [HOST], "allow_prefixes": [["/never"]],
            "disallow_prefixes": [["/neverever"]],
            "crawl_delay_s": [0.05]}),
        "host_policy": pd.DataFrame({
            "host": [HOST], "crawl_delay_s": [0.05],
            "max_concurrency": [8], "salt_n": [1]}),
    }
    for name, df in pdfs.items():
        df.to_parquet(f"{fx}/{name}.parquet", index=False)
    cache = str(tmp_path_factory.mktemp("rvl_cache"))

    cfg_a = CrawlConfig(allowed_domains=(HOST,), http_cache=True,
                        httpcache_revalidate=True)
    oracle_cache: dict = {}
    simulate(pdfs, cfg_a, cache=oracle_cache)
    eng_a = CrawlEngine(spark, fx,
                        str(tmp_path_factory.mktemp("rvl_run_a")),
                        cfg_a, cache_dir=cache)
    man_a = eng_a.run()
    docs_a = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_a.documents_df(man_a).toPandas().itertuples()}

    # run B network: /slow now exceeds the timeout, /big the maxsize;
    # validators UNCHANGED (the pre-fix engine would wrongly revalidate
    # both); bodies blanked elsewhere so a cache serve is provable
    pg = pdfs["pages"].copy()
    pg.loc[pg.url_canon.str.endswith("/slow"), "latency_ms"] = 500.0
    pg.loc[pg.url_canon.str.endswith("/big"), "body_html"] = "y" * 3000
    fx_b = str(tmp_path_factory.mktemp("rvl_graph_b"))
    pg.to_parquet(f"{fx_b}/pages.parquet", index=False)
    for name in ("seeds", "robots", "host_policy"):
        pdfs[name].to_parquet(f"{fx_b}/{name}.parquet", index=False)
    pdfs_b = {**pdfs, "pages": pg}

    cfg_b = CrawlConfig(allowed_domains=(HOST,), http_cache=True,
                        httpcache_revalidate=True,
                        httpcache_expiration_rounds=1,
                        download_timeout_ms=150.0,
                        download_maxsize_bytes=2000,
                        autothrottle=True)
    oracle_b = simulate(pdfs_b, cfg_b, cache=oracle_cache)
    eng_b = CrawlEngine(spark, fx_b,
                        str(tmp_path_factory.mktemp("rvl_run_b")),
                        cfg_b, cache_dir=cache)
    man_b = eng_b.run()
    got = (eng_b.crawl_order_df(man_b).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle_b.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    slow = got[got.url_canon == f"https://{HOST}/slow"]
    big = got[got.url_canon == f"https://{HOST}/big"]
    fast = got[got.url_canon == f"https://{HOST}/fast"]
    assert set(slow.status) == {TIMEOUT_STATUS}      # NOT a cache serve
    assert len(slow) == cfg_b.retry_times + 1        # retried like a 5xx
    assert set(big.status) == {MAXSIZE_STATUS} and len(big) == 1
    assert set(fast.status) == {200}                 # normal revalidation
    # the revalidated page served its ORIGINAL run-A spans; the limited
    # pages produced no document at all in run B
    docs_b = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_b.documents_df(man_b).toPandas().itertuples()}
    fast_fp = fast.fingerprint.iloc[0]
    assert docs_b[fast_fp] == docs_a[fast_fp]
    assert not (set(slow.fingerprint) | set(big.fingerprint)) \
        & set(docs_b)
    # oracle metrics parity (errors/cached counters see the same world)
    m = (eng_b.metrics_df(man_b).toPandas()
         .groupby("host")[["fetched", "errors", "cached"]].sum())
    om = pd.DataFrame(oracle_b.metrics).groupby("host")[
        ["fetched", "errors", "cached"]].sum()
    assert int(m.loc[HOST, "errors"]) == int(om.loc[HOST, "errors"])
    assert int(m.loc[HOST, "cached"]) == int(om.loc[HOST, "cached"])
