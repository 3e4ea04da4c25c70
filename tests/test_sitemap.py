"""F1 sitemap seeding (r3, VERDICT r02 item 5)
[S:scrapy/spiders/sitemap.py::SitemapSpider].

The default session graph seeds two /sitemap.xml URLs (one a
sitemapindex with two sub-sitemaps); expansion is content-sniffed, locs
enqueue in document order (R2), sitemap fetches emit no document row.
Exact parity with the oracle is covered by the session-scoped
engine-vs-oracle gate (the shared fixture now contains sitemaps); this
file pins the sitemap-specific behaviors.
"""

from __future__ import annotations

from crawlspark.kernels.canon import fingerprint_hex


def _order_pdf(engine_run):
    eng, manifest = engine_run
    return eng.crawl_order_df(manifest).toPandas()


def test_orphans_reachable_only_via_sitemap(engine_run, fixture_pdfs):
    """Orphan pages have no inbound HTML links — their presence in the
    crawl order proves sitemap expansion added coverage."""
    co = _order_pdf(engine_run)
    pages = fixture_pdfs["pages"]
    orphans = set(pages[pages.path.str.startswith("/orphan/")].url_canon)
    assert orphans
    crawled = set(co.url_canon)
    assert orphans & crawled, "no orphan page was ever fetched"
    # and truly orphan: no non-sitemap page links to them
    for _, row in pages.iterrows():
        if row.path.startswith(("/sitemap", "/orphan")):
            continue
        for h in row.outlinks_raw:
            assert "/orphan/" not in h


def test_sitemapindex_recursion(engine_run, fixture_pdfs):
    """The index's sub-sitemaps are fetched (enqueued like links) and
    their locs expand in turn."""
    co = _order_pdf(engine_run)
    pages = fixture_pdfs["pages"]
    subs = set(pages[pages.path.str.match(r"/sitemap-\d+\.xml")].url_canon)
    assert subs
    assert subs <= set(co.url_canon)


def test_sitemap_fetches_emit_no_documents(engine_run, fixture_pdfs,
                                           oracle_result):
    eng, manifest = engine_run
    pages = fixture_pdfs["pages"]
    sm_urls = pages[pages.path.str.contains("sitemap")].url_canon
    sm_fps = {fingerprint_hex(u) for u in sm_urls}
    co = _order_pdf(engine_run)
    assert sm_fps & set(co.fingerprint)      # sitemaps WERE fetched...
    doc_ids = set(eng.documents_df(manifest).toPandas().doc_id)
    assert not (sm_fps & doc_ids)            # ...but produced no documents
    assert not (sm_fps & set(oracle_result.documents))


def test_sitemaps_disabled_treats_xml_as_html(spark, tmp_path_factory):
    """With cfg.sitemaps_enabled=False a sitemap body parses as (empty)
    HTML: no locs discovered, orphans never reached — engine and oracle
    agree on the degraded behavior too."""
    import pandas as pd

    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.fixtures.webgraph import default_config, write_fixture
    from crawlspark.oracle.simulator import simulate

    base = default_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "sitemaps_enabled": False})
    fx = str(tmp_path_factory.mktemp("sm_off_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx, str(tmp_path_factory.mktemp("sm_off_run")),
                      cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[["rank", "fingerprint", "url_canon", "round",
                        "host", "status"]].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[got.columns.tolist()] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert not any("/orphan/" in u for u in got.url_canon)


def test_robots_declared_sitemap_discovered(engine_run, fixture_pdfs):
    """F7 r3: odd-indexed sitemap hosts declare their sitemap ONLY via a
    robots.txt `Sitemap:` line — the engine must still discover, fetch
    and expand it (enqueue_seqs after the explicit seed list)."""
    robots = fixture_pdfs["robots"]
    declared = {u for lst in robots.sitemap_urls for u in lst}
    seed_urls = set(fixture_pdfs["seeds"].url)
    robots_only = declared - seed_urls
    assert robots_only, "fixture must have a robots-only sitemap host"
    co = _order_pdf(engine_run)
    assert robots_only <= set(co.url_canon)


def test_null_sitemap_urls_cell_tolerated(spark, tmp_path_factory):
    """ADVICE r03: a robots table whose sitemap_urls cell is NULL (written
    by another tool — schema allows it) must behave exactly like an empty
    list in BOTH engines: the oracle guards None explicitly, and the
    engine's bootstrap count + posexplode must not raise."""
    import pandas as pd
    from crawlspark.engine import CrawlEngine
    from crawlspark.fixtures.webgraph import default_config, write_fixture
    from crawlspark.oracle.simulator import simulate

    cfg = default_config()
    fx = str(tmp_path_factory.mktemp("nullsm_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    robots = pd.read_parquet(f"{fx}/robots.parquet")
    # null out one declaring host's cell and one non-declaring host's
    vals = list(robots.sitemap_urls)
    declaring = [i for i, v in enumerate(vals) if v is not None and len(v)]
    assert declaring
    vals[declaring[0]] = None
    vals[(declaring[0] + 1) % len(vals)] = None
    robots = robots.assign(sitemap_urls=pd.Series(vals, dtype="object"))
    robots.to_parquet(f"{fx}/robots.parquet", index=False)

    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx, str(tmp_path_factory.mktemp("nullsm_run")),
                      cfg)
    manifest = eng.run()
    cols = ["rank", "fingerprint", "url_canon", "round", "host", "status"]
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[cols].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[cols] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
