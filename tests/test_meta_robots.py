"""X9 r3 extensions: page-level robots-meta nofollow + rel=canonical
(VERDICT r02 item 6; [S:scrapy robots-meta conventions,
LxmlLinkExtractor]) — plus the r4 X-Robots-Tag RESPONSE-HEADER nofollow
(X14 extension, VERDICT r03 missing #2): the header composes with the
meta tag (either suppresses all link/form discovery; spans/documents are
unaffected).

Crawl-order effects of meta nofollow are covered by the session
engine-vs-oracle gate (the shared graph contains meta pages); this file
pins the parse semantics, the canonical_url surfacing end-to-end, and
the header-nofollow mode oracle-exactly on a with_x_robots graph.
"""

from __future__ import annotations

import pandas as pd

from crawlspark.kernels.canon import absolutize, canonicalize_url
from crawlspark.kernels.parse import (
    Form, Span, parse_page, render_html,
)


def test_meta_nofollow_suppresses_all_discovery():
    spans = [Span("text", "hello", None, 0)]
    body = render_html("t", spans, ["/a", "/b"], [],
                       [Form("/f", "x=1")], meta_nofollow=True)
    got_spans, hrefs, forms, meta = parse_page("https://h.test/p", body)
    assert meta.nofollow is True
    assert hrefs == [] and forms == []
    assert [(s.kind, s.text) for s in got_spans] == [("text", "hello")]
    # without the meta tag the same body parses normally
    body2 = render_html("t", spans, ["/a", "/b"], [], [Form("/f", "x=1")])
    _, hrefs2, forms2, meta2 = parse_page("https://h.test/p", body2)
    assert hrefs2 == ["/a", "/b"] and len(forms2) == 1
    assert meta2.nofollow is False and meta2.canonical_raw is None


def test_canonical_extracted_raw():
    body = render_html("t", [], ["/x"], [],
                       canonical="/Hotel/1?b=2&a=1#frag")
    _, hrefs, _, meta = parse_page("https://H.test/dir/p", body)
    assert hrefs == ["/x"]           # canonical does not affect discovery
    assert meta.canonical_raw == "/Hotel/1?b=2&a=1#frag"


def test_fixture_exercises_meta_pages(fixture_pdfs):
    pages = fixture_pdfs["pages"]
    assert pages.meta_nofollow.sum() > 0
    assert pages.canonical_raw.notna().sum() > 0
    # meta-nofollow pages have empty discovery goldens despite anchors
    nf = pages[pages.meta_nofollow]
    for _, row in nf.iterrows():
        assert list(row.outlinks_raw) == []
    # at least one such page actually renders anchors (suppression is real)
    assert any("<a href=" in row.body_html for _, row in nf.iterrows())


def test_x_robots_extractor_composes_with_meta():
    """X14 r4 unit: the engine's Arrow extractor suppresses discovery on
    header nofollow, on meta nofollow, and on both — spans survive."""
    from crawlspark.engine import _extract_fn
    spans = [Span("text", "hello", None, 0)]
    plain = render_html("t", spans, ["/a", "/b"], [], [Form("/f", "x=1")])
    meta = render_html("t", spans, ["/a", "/b"], [], [Form("/f", "x=1")],
                       meta_nofollow=True)
    pdf = pd.DataFrame({
        "url_canon": ["https://h.test/p"] * 4,
        "body_html": [plain, plain, meta, meta],
        "x_robots": [None, "noindex, NOFOLLOW", None, "nofollow"],
    })
    fn = _extract_fn(["url_canon"], sitemaps_enabled=True)
    out = next(fn(iter([pdf])))
    # row 0: no suppression; rows 1-3: header, meta, both — all suppressed
    assert len(out["outlinks_canon"][0]) == 2
    assert len(out["outforms_action"][0]) == 1
    for i in (1, 2, 3):
        assert list(out["outlinks_canon"][i]) == []
        assert list(out["outforms_action"][i]) == []
        assert [s["text"] for s in out["spans"][i]] == ["hello"]


def test_x_robots_header_nofollow_oracle_exact(spark, tmp_path_factory):
    """Engine == oracle rank-exactly on a graph where ~8% of pages carry
    an X-Robots-Tag nofollow header; the suppression provably bites (a
    fetched 200 header-nofollow page renders anchors, and the
    header-free control graph discovers strictly more)."""
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.fixtures.webgraph import default_config, write_fixture
    from crawlspark.oracle.simulator import simulate

    cfg = default_config()
    fx = str(tmp_path_factory.mktemp("xr_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0,
                  with_x_robots=True)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    pages = pdfs["pages"]
    xr = pages[pages.x_robots.notna()]
    assert len(xr) > 0
    # goldens: header-NOFOLLOW pages discover nothing despite anchors;
    # pure header-noindex pages (r4b) keep their discovery goldens
    xnf = xr[xr.x_robots.str.contains("nofollow")]
    assert len(xnf) > 0
    assert all(len(list(r.outlinks_raw)) == 0 for r in xnf.itertuples())
    assert any("<a href=" in r.body_html for r in xnf.itertuples())

    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx, str(tmp_path_factory.mktemp("xr_run")),
                      cfg)
    manifest = eng.run()
    cols = ["rank", "fingerprint", "url_canon", "round", "host", "status"]
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[cols].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[cols] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # a fetched 200 header-nofollow (meta-free) page with rendered anchors
    # exists, so an engine that failed to suppress would have diverged
    fetched_urls = {o["url_canon"] for o in oracle.crawl_order
                    if o["status"] == 200}
    hot = xr[xr.url_canon.isin(fetched_urls) & ~xr.meta_nofollow]
    assert any("<a href=" in r.body_html for r in hot.itertuples())
    # and its document spans still exist (nofollow != noindex)
    docs = eng.documents_df(manifest).toPandas()
    assert set(docs.doc_id) == set(oracle.documents)
    # control: the same graph without headers discovers at least as much
    control = simulate({**pdfs, "pages": pages.assign(
        x_robots=pd.array([None] * len(pages), dtype="string"))}, cfg)
    disc = sum(m["discovered"] for m in oracle.metrics)
    disc_c = sum(m["discovered"] for m in control.metrics)
    assert disc < disc_c


def test_meta_noindex_parse_semantics():
    """X14 r4b unit: noindex leaves discovery intact (links/forms still
    extracted) and sets meta.noindex; composes with nofollow in one tag."""
    spans = [Span("text", "hello", None, 0)]
    body = render_html("t", spans, ["/a", "/b"], [], [Form("/f", "x=1")],
                       meta_noindex=True)
    got_spans, hrefs, forms, meta = parse_page("https://h.test/p", body)
    assert meta.noindex is True and meta.nofollow is False
    assert hrefs == ["/a", "/b"] and len(forms) == 1
    assert [(s.kind, s.text) for s in got_spans] == [("text", "hello")]
    both = render_html("t", spans, ["/a"], [], meta_noindex=True,
                       meta_nofollow=True)
    assert 'content="noindex, nofollow"' in both
    _, h2, f2, m2 = parse_page("https://h.test/p", both)
    assert m2.noindex and m2.nofollow and h2 == [] and f2 == []
    # r3 nofollow-only rendering is byte-identical to before r4b
    nf_only = render_html("t", spans, ["/a"], [], meta_nofollow=True)
    assert '<meta name="robots" content="nofollow"/>' in nf_only


def test_noindex_extractor_unit():
    """The Arrow extractor's noindex column: meta tag, header, either —
    while discovery and spans are untouched by pure noindex."""
    from crawlspark.engine import _extract_fn
    spans = [Span("text", "hello", None, 0)]
    plain = render_html("t", spans, ["/a"], [])
    meta_ni = render_html("t", spans, ["/a"], [], meta_noindex=True)
    pdf = pd.DataFrame({
        "url_canon": ["https://h.test/p"] * 4,
        "body_html": [plain, plain, meta_ni, plain],
        "x_robots": [None, "NOINDEX", None, "nofollow"],
    })
    out = next(_extract_fn(["url_canon"], True)(iter([pdf])))
    assert list(out["noindex"]) == [False, True, True, False]
    # pure noindex (rows 1-2) still discovers; header nofollow (row 3)
    # still indexes
    for i in (0, 1, 2):
        assert len(out["outlinks_canon"][i]) == 1
    assert list(out["outlinks_canon"][3]) == []
    for i in range(4):
        assert [s["text"] for s in out["spans"][i]] == ["hello"]


def test_noindex_oracle_exact(spark, tmp_path_factory):
    """Engine == oracle on a graph carrying meta-noindex pages AND
    noindex X-Robots-Tag headers: noindexed pages are fetched (crawl
    order) and their links followed (discovery), but they emit NO
    document row — and every other fetched HTML 200 does."""
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import CrawlEngine
    from crawlspark.fixtures.webgraph import default_config, write_fixture
    from crawlspark.oracle.simulator import simulate

    cfg = default_config()
    fx = str(tmp_path_factory.mktemp("ni_graph"))
    write_fixture(fx, n_pages=140, seed=7, config=cfg, chain_len=0,
                  with_x_robots=True)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    pages = pdfs["pages"]
    ni_urls = set(pages[pages.meta_noindex].url_canon) | set(
        pages[pages.x_robots.fillna("").str.contains("noindex")].url_canon)
    assert len(ni_urls) > 0

    oracle = simulate(pdfs, cfg)
    eng = CrawlEngine(spark, fx, str(tmp_path_factory.mktemp("ni_run")),
                      cfg)
    manifest = eng.run()
    cols = ["rank", "fingerprint", "url_canon", "round", "host", "status"]
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[cols].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[cols] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    docs = set(eng.documents_df(manifest).toPandas().doc_id)
    assert docs == set(oracle.documents)
    fetched_ni = [o for o in oracle.crawl_order
                  if o["url_canon"] in ni_urls and o["status"] == 200]
    assert len(fetched_ni) > 0            # suppression provably bites
    assert all(o["fingerprint"] not in docs for o in fetched_ni)
    # a fetched PURE-noindex page (no nofollow anywhere) whose anchors
    # render had its links FOLLOWED: one of its outlink fingerprints
    # was discovered (appears in the oracle seen set)
    by_url = {r.url_canon: r for r in pages.itertuples()}
    fetched_urls = {o["url_canon"] for o in oracle.crawl_order}
    pure = [u for u in ni_urls
            if u in fetched_urls and not by_url[u].meta_nofollow
            and "nofollow" not in (by_url[u].x_robots or "")
            and len(list(by_url[u].outlinks_raw)) > 0]
    assert len(pure) > 0
    followed = {canonicalize_url(absolutize(u, h))
                for u in pure for h in by_url[u].outlinks_raw}
    assert followed & fetched_urls


def test_documents_carry_canonical_url(engine_run, oracle_result,
                                       fixture_pdfs):
    """Engine documents.canonical_url == oracle's canonicalized target
    for every fetched declaring page; null elsewhere."""
    eng, manifest = engine_run
    docs = eng.documents_df(manifest).toPandas()
    got = {r.doc_id: r.canonical_url for r in docs.itertuples()
           if r.canonical_url is not None}
    assert got == oracle_result.canonical
    assert len(got) > 0
    # spot-check the normalization: canonical of each declaring fetched
    # page equals canonicalize(absolutize(page_url, raw))
    pages = fixture_pdfs["pages"]
    declaring = pages[pages.canonical_raw.notna()]
    by_url = {r.url_canon: r.canonical_raw for r in declaring.itertuples()}
    co = eng.crawl_order_df(manifest).toPandas()
    fp_to_url = dict(zip(co.fingerprint, co.url_canon))
    for fp, canon in got.items():
        url = fp_to_url[fp]
        assert canon == canonicalize_url(absolutize(url, by_url[url]))
