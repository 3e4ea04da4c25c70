"""X18 (r5): CONCURRENT_REQUESTS_PER_IP analogue
[S:scrapy/core/downloader/__init__.py::Downloader._get_slot_key —
when CONCURRENT_REQUESTS_PER_IP > 0 the download slot keys on the
resolved IP instead of the hostname, and the per-IP cap replaces the
per-domain one].

No DNS in-sandbox, so host_policy.ip is the resolver. Semantics (pinned
identically in engine and oracle): slot = ip (fallback: the host's own
name); the slot's concurrency cap is the setting itself; its crawl
delay each round is the max of member hosts' base delays present in
that round; budget/carry/AutoThrottle/Retry-After state all key on the
slot.

A hand-built graph: a.test/b.test/c.test co-host on 192.0.2.1, d.test
is alone on 192.0.2.2. With per_ip=2 the shared slot fetches exactly 2
of the 3 roots in round 1 (LIFO: c then b; a waits) while d proceeds —
the off-mode control fetches all 4. Engine-vs-oracle exact in plain,
AutoThrottle, and robots_fetch (X17) compositions, plus on the full
generated webgraph whose host_policy co-hosts small hosts 3-per-IP.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.kernels.parse import Span, render_html
from crawlspark.oracle.simulator import simulate

HOSTS = ["a.test", "b.test", "c.test", "d.test"]
IPS = {"a.test": "192.0.2.1", "b.test": "192.0.2.1",
       "c.test": "192.0.2.1", "d.test": "192.0.2.2"}
ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]


def _graph(tmpdir: str, with_ip: bool = True) -> dict[str, pd.DataFrame]:
    pages = []
    # distinct latencies per host so the AutoThrottle composition folds a
    # genuinely mixed response stream through the shared slot state
    lat = {"a.test": 100.0, "b.test": 200.0, "c.test": 400.0,
           "d.test": 50.0}
    for h in HOSTS:
        kids = [f"/p{i}" for i in range(3)]
        sp = [Span("text", f"root {h}", None, 0)]
        pages.append({
            "url_canon": f"https://{h}/", "status": 200,
            "redirect_to": None, "succeeds_after": None,
            "latency_ms": lat[h],
            "body_html": render_html("/", sp, kids, []),
            "retry_after_s": None,
        })
        for p in kids:
            lsp = [Span("text", f"leaf {h}{p}", None, 0)]
            pages.append({
                "url_canon": f"https://{h}{p}", "status": 200,
                "redirect_to": None, "succeeds_after": None,
                "latency_ms": lat[h],
                "body_html": render_html(p, lsp, [], []),
                "retry_after_s": None,
            })
    hp = {
        "host": HOSTS, "crawl_delay_s": [0.5] * 4,
        "max_concurrency": [8] * 4, "salt_n": [1] * 4,
    }
    if with_ip:
        hp["ip"] = [IPS[h] for h in HOSTS]
    dfs = {
        "pages": pd.DataFrame(pages),
        "seeds": pd.DataFrame({
            "seed_id": range(4), "url": [f"https://{h}/" for h in HOSTS]}),
        "robots": pd.DataFrame({
            "host": HOSTS, "allow_prefixes": [["/never"]] * 4,
            "disallow_prefixes": [["/neverever"]] * 4,
            "crawl_delay_s": [0.5] * 4}),
        "host_policy": pd.DataFrame(hp),
    }
    for name, df in dfs.items():
        df.to_parquet(f"{tmpdir}/{name}.parquet", index=False)
    return dfs


def _run(spark, tmp_path_factory, tag, cfg, pdfs, fx):
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp(f"ip_run_{tag}")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    docs = set(eng.documents_df(manifest).toPandas().doc_id)
    assert docs == set(oracle.documents)
    return got, oracle


@pytest.mark.parametrize("autothrottle", [False, True])
def test_per_ip_oracle_exact(spark, tmp_path_factory, autothrottle):
    fx = str(tmp_path_factory.mktemp(f"ip_graph_{autothrottle}"))
    pdfs = _graph(fx)
    cfg = CrawlConfig(allowed_domains=tuple(HOSTS),
                      concurrent_requests_per_ip=2,
                      autothrottle=autothrottle)
    got, _ = _run(spark, tmp_path_factory, f"at{autothrottle}", cfg,
                  pdfs, fx)

    # round 0: the shared slot (a/b/c) ships its LIFO-top roots up to the
    # slot budget — 2 (c then b) plain, 1 (c only) under AutoThrottle's
    # 5 s start delay (floor(8/5) = 1) — while d.test (own slot)
    # proceeds. Global order (-priority, slot_rank, seq).
    r0 = got[got["round"] == 0].sort_values("rank")
    want_r0 = ["https://c.test/", "https://d.test/"] \
        if autothrottle else \
        ["https://c.test/", "https://d.test/", "https://b.test/"]
    assert list(r0.url_canon) == want_r0
    # a.test/ fetches in a later round — pooling delayed it, never lost it
    a_rounds = got[got.url_canon == "https://a.test/"]["round"]
    assert len(a_rounds) == 1 and int(a_rounds.iloc[0]) > 0
    # every page still crawled exactly once
    assert len(got) == len(set(got.fingerprint)) == 16


def test_per_ip_off_is_per_host_control(spark, tmp_path_factory):
    fx = str(tmp_path_factory.mktemp("ip_graph_ctl"))
    pdfs = _graph(fx)
    cfg = CrawlConfig(allowed_domains=tuple(HOSTS))
    got, _ = _run(spark, tmp_path_factory, "ctl", cfg, pdfs, fx)
    # control: per-host slots -> all 4 roots fetch in round 0
    r0 = got[got["round"] == 0]
    assert set(r0.url_canon) == {f"https://{h}/" for h in HOSTS}


def test_per_ip_generated_graph_oracle_exact(spark, tmp_path_factory):
    fx = str(tmp_path_factory.mktemp("ip_webgraph"))
    base = default_config()
    cfg = CrawlConfig.from_dict(
        {**base.to_dict(), "concurrent_requests_per_ip": 2})
    write_fixture(fx, n_pages=120, seed=7, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    # small hosts co-host 3-per-IP in the generated host_policy
    assert pdfs["host_policy"].ip.nunique() < len(pdfs["host_policy"])
    _run(spark, tmp_path_factory, "gen", cfg, pdfs, fx)


def test_per_ip_with_robots_fetch_oracle_exact(spark, tmp_path_factory):
    # X17 composition: synthesized robots.txt fetches consume the SHARED
    # per-IP slot budget like any request
    fx = str(tmp_path_factory.mktemp("ip_webgraph_rb"))
    base = default_config()
    cfg = CrawlConfig.from_dict({**base.to_dict(),
                                "concurrent_requests_per_ip": 2,
                                "robots_fetch": True})
    write_fixture(fx, n_pages=120, seed=7, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    _run(spark, tmp_path_factory, "rb", cfg, pdfs, fx)


def test_per_ip_requires_ip_column(spark, tmp_path_factory):
    fx = str(tmp_path_factory.mktemp("ip_graph_noip"))
    pdfs = _graph(fx, with_ip=False)
    cfg = CrawlConfig(allowed_domains=tuple(HOSTS),
                      concurrent_requests_per_ip=2)
    with pytest.raises(ValueError, match="ip"):
        simulate(pdfs, cfg)
    with pytest.raises(ValueError, match="ip"):
        CrawlEngine(spark, fx,
                    str(tmp_path_factory.mktemp("ip_run_noip")), cfg)
