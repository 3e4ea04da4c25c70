"""X9 r3 extensions: page-level robots-meta nofollow + rel=canonical
(VERDICT r02 item 6; [S:scrapy robots-meta conventions,
LxmlLinkExtractor]).

Crawl-order effects of meta nofollow are covered by the session
engine-vs-oracle gate (the shared graph contains meta pages); this file
pins the parse semantics and the canonical_url surfacing end-to-end.
"""

from __future__ import annotations

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
