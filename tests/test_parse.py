"""X8/X9 extractor tests: the interleaved span invariant
(BASELINE.json:"input_hint" — span-sequence equality on
(kind, text, media_ref, order) per doc) and link discovery order."""

from crawlspark.kernels.parse import (
    Form, Span, is_sitemap, media_ref_for, parse_html, parse_sitemap,
    render_html, render_sitemap,
)


def test_roundtrip_all_fixture_pages(fixture_pdfs):
    """parse_html(body_html) must reproduce the golden body_spans,
    outlinks_raw AND outform_* for EVERY fixture page; sitemap bodies
    (content-sniffed, the extractor's dispatch) must reproduce their
    golden loc list with no spans/forms."""
    pages = fixture_pdfs["pages"]
    n_forms = n_sitemaps = 0
    for _, row in pages.iterrows():
        if is_sitemap(row.body_html):
            assert parse_sitemap(row.body_html) == list(row.outlinks_raw)
            assert list(row.body_spans) == []
            n_sitemaps += 1
            continue
        spans, hrefs, forms = parse_html(row.url_canon, row.body_html)
        got = [(s.kind, s.text, s.media_ref, s.offset) for s in spans]
        want = [(d["kind"], d["text"], d["media_ref"], d["offset"])
                for d in row.body_spans]
        assert got == want, row.url_canon
        assert hrefs == list(row.outlinks_raw), row.url_canon
        assert [f.action for f in forms] == list(row.outform_actions)
        assert [f.body for f in forms] == list(row.outform_bodies)
        n_forms += len(forms)
    assert n_forms > 0   # the fixture must actually exercise POST forms
    assert n_sitemaps > 0  # ... and sitemaps


def test_sitemap_kernel_roundtrip():
    locs = ["https://h0.example-hotels.test/hotel/1",
            "https://h0.example-hotels.test/a?b=1&c=2",
            "https://h0.example-hotels.test/x<&>y"]
    body = render_sitemap(locs)
    assert is_sitemap(body)
    assert parse_sitemap(body) == locs
    idx = render_sitemap(["https://h/s1.xml", "https://h/s2.xml"],
                         index=True)
    assert is_sitemap(idx)
    assert parse_sitemap(idx) == ["https://h/s1.xml", "https://h/s2.xml"]
    assert not is_sitemap("<html><body>urlset</body></html>")
    assert not is_sitemap("")


def test_offsets_dense(fixture_pdfs):
    for _, row in fixture_pdfs["pages"].iterrows():
        offs = [d["offset"] for d in row.body_spans]
        assert offs == list(range(len(offs)))


def test_span_null_discipline(fixture_pdfs):
    """text spans: media_ref is null; media spans: text is null (§7.3.6)."""
    for _, row in fixture_pdfs["pages"].iterrows():
        for d in row.body_spans:
            if d["kind"] == "text":
                assert d["media_ref"] is None and d["text"] is not None
            else:
                assert d["text"] is None and d["media_ref"].startswith("full/")


def test_escaping_roundtrip():
    mr = media_ref_for("https://h.test/p", "/i.jpg?a=1&b=2")
    spans = [Span("text", 'a<b>&"quo" café ★', None, 0),
             Span("media", None, mr, 1)]
    forms = [Form('/sub?x=<1>', 'q=a b&n=caf\u00e9&z=')]
    html = render_html("t&t", spans, ['/x?a=1&b=2#f', 'mailto:a@b'],
                       ["/i.jpg?a=1&b=2"], forms)
    sp, hr, fr = parse_html("https://h.test/p", html)
    assert [tuple(s) for s in sp] == [tuple(s) for s in spans]
    assert hr == ['/x?a=1&b=2#f', 'mailto:a@b']
    assert fr == forms


def test_media_ref_is_sha1_of_canonical_absolute_url():
    import hashlib
    from crawlspark.kernels.canon import canonicalize_url
    ref = media_ref_for("https://h.test/dir/page", "img/1.JPG?b=2&a=1")
    canon = canonicalize_url("https://h.test/dir/img/1.JPG?b=2&a=1")
    assert ref == "full/" + hashlib.sha1(canon.encode()).hexdigest()


def test_nofollow_links_not_extracted(fixture_pdfs):
    """rel=nofollow anchors render into the HTML but must never be
    discovered (LxmlLinkExtractor default). The same URL may also appear
    as a followable anchor elsewhere on the page, so the contract is on
    anchor COUNTS: extracted hrefs == followable anchors only."""
    import html as _h
    pages = fixture_pdfs["pages"]
    n_nf = 0
    for _, row in pages.iterrows():
        if is_sitemap(row.body_html) or row.meta_nofollow:
            continue   # sitemap locs aren't anchors; meta-nofollow pages
            # suppress ALL anchors (covered by test_meta_robots)
        _, hrefs, _ = parse_html(row.url_canon, row.body_html)
        for nf in row.nofollow_raw:
            assert f'<a href="{_h.escape(nf)}" rel="nofollow">' \
                in row.body_html
            n_nf += 1
        n_anchors = row.body_html.count("<a href=")
        assert len(hrefs) == n_anchors - len(row.nofollow_raw)
        assert hrefs == list(row.outlinks_raw)
    assert n_nf > 0   # the fixture must actually exercise nofollow
