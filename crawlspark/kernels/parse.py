"""HTML render + interleaved-span extractor (SURVEY.md §2.8 X8/X9).

The reference extracts, per fetched page and in document order, a sequence of
text blocks and media references (parsel XPath walk + ImagesPipeline refs,
tier [S]) — pinned by BASELINE.json:"input_hint" to the output schema
``(doc_id, spans:array<struct<kind,text,media_ref,offset:int32>>)``.

No lxml/parsel in-sandbox, so the fixture generator emits a small
deterministic HTML dialect and this module parses it with ordered regex
walks. ``render_html`` (generator) and ``parse_html`` (engine + oracle) are
exact inverses, which tests assert; the engine additionally asserts
span-sequence equality against the fixture's golden ``body_spans`` column.

media_ref spec (SURVEY §2.1 O2, tier [S:scrapy/pipelines/files.py::
FilesPipeline.file_path]): ``full/<sha1-of-canonical-absolute-media-url>`` —
a computed column, no binary blobs stored.
"""

from __future__ import annotations

import html as _html
import re
from typing import NamedTuple

import hashlib

from .canon import absolutize, canonicalize_url


class Span(NamedTuple):
    kind: str            # 'text' | 'media'
    text: str | None     # null for media spans
    media_ref: str | None  # null for text spans
    offset: int          # 0-based dense position in document order


class Form(NamedTuple):
    """A POST form discovered on a page (X9 extension, r2): raw action URL
    plus the urlencoded body built from the inputs in document order —
    Scrapy's FormRequest.from_response analogue
    [S:scrapy/http/request/form.py]."""
    action: str          # raw (un-absolutized) action URL
    body: str            # urlencoded field payload, input document order


class PageMeta(NamedTuple):
    """Page-level head metadata (X9 extension, r3): a
    <meta name="robots" content="...nofollow..."> suppresses ALL request
    discovery from the page (links and forms — page-level analogue of
    the per-anchor rel=nofollow [S:scrapy robots-meta middleware
    conventions]); <link rel="canonical" href="..."> is surfaced RAW for
    the pipeline to normalize (the cheapest dedup signal a crawler
    gets). ``noindex`` (r4) is the complementary REP directive: the page
    is crawled and its links followed, but it must yield NO document —
    the engine drops its documents/feed-export row (and the item-budget
    count) while discovery proceeds [S:robots-meta conventions; Scrapy
    exposes the tag to user spiders rather than indexing, so the
    engine-side analogue is suppressing item emission]."""
    nofollow: bool
    canonical_raw: str | None
    noindex: bool = False


def media_ref_for(base_url: str, src: str) -> str:
    """full/<sha1(canonical absolute media url)> — deterministic media path."""
    canon = canonicalize_url(absolutize(base_url, src))
    return "full/" + hashlib.sha1(canon.encode("utf-8")).hexdigest()


def render_html(title: str, spans: list[Span], hrefs: list[str],
                media_srcs: list[str],
                forms: list[Form] = (),
                nofollow: list[str] = (),
                meta_nofollow: bool = False,
                canonical: str | None = None,
                meta_noindex: bool = False) -> str:
    """Render the fixture page. ``media_srcs[i]`` is the raw src of the i-th
    media span (spans store only the derived media_ref). Forms render after
    the link list, one hidden input per urlencoded field. ``nofollow``
    hrefs render as ``rel="nofollow"`` anchors after the followable
    links — the extractor must NOT discover them. ``meta_nofollow`` /
    ``meta_noindex`` render as one page-level robots meta tag (comma
    token list, as real servers emit it); ``canonical`` a rel=canonical
    link in the head (r3)."""
    head = [f"<title>{_html.escape(title)}</title>"]
    robots_tokens = ([*(["noindex"] if meta_noindex else []),
                      *(["nofollow"] if meta_nofollow else [])])
    if robots_tokens:
        head.append(f'<meta name="robots" '
                    f'content="{", ".join(robots_tokens)}"/>')
    if canonical:
        head.append(
            f'<link rel="canonical" href="{_html.escape(canonical)}"/>')
    out = [f"<html><head>{''.join(head)}</head><body>"]
    m = 0
    for s in spans:
        if s.kind == "text":
            out.append(f"<p>{_html.escape(s.text, quote=False)}</p>")
        else:
            out.append(f'<img src="{_html.escape(media_srcs[m])}"/>')
            m += 1
    out.append("<ul>")
    for h in hrefs:
        out.append(f'<li><a href="{_html.escape(h)}">l</a></li>')
    for h in nofollow:
        out.append(f'<li><a href="{_html.escape(h)}" rel="nofollow">l</a>'
                   f'</li>')
    out.append("</ul>")
    for f in forms:
        out.append(f'<form action="{_html.escape(f.action)}" method="post">')
        for kv in f.body.split("&") if f.body else []:
            k, _, v = kv.partition("=")
            out.append(f'<input name="{_html.escape(k)}" '
                       f'value="{_html.escape(v)}"/>')
        out.append("</form>")
    out.append("</body></html>")
    return "".join(out)


# ---- sitemap kernel (F1 extension, r3) --------------------------------
# [S:scrapy/spiders/sitemap.py::SitemapSpider._parse_sitemap]: a fetched
# body that IS a sitemap (urlset or sitemapindex) expands to its <loc>
# entries in document order — urlset locs are content URLs, sitemapindex
# locs are further sitemaps (the recursion falls out of content sniffing:
# each sub-sitemap is enqueued like any link and expands when fetched).

_SITEMAP_SIG_RE = re.compile(r"<\s*(urlset|sitemapindex)[\s>]")
_LOC_RE = re.compile(r"<loc>(.*?)</loc>", re.S)


def is_sitemap(body: str) -> bool:
    """True iff the body is a sitemap urlset/sitemapindex document (the
    signature check Scrapy's Sitemap class applies to the root tag)."""
    return bool(body) and bool(_SITEMAP_SIG_RE.search(body[:256]))


def render_sitemap(locs: list[str], index: bool = False) -> str:
    tag = "sitemapindex" if index else "urlset"
    item = "sitemap" if index else "url"
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           f'<{tag} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">']
    for u in locs:
        out.append(f"<{item}><loc>{_html.escape(u)}</loc></{item}>")
    out.append(f"</{tag}>")
    return "".join(out)


def parse_sitemap(body: str) -> list[str]:
    """<loc> entries in document order, unescaped and RAW (the link
    pipeline owns absolutize/canonicalize, exactly as for hrefs)."""
    return [_html.unescape(m) for m in _LOC_RE.findall(body)]


_SPAN_RE = re.compile(r"<p>(.*?)</p>|<img src=\"([^\"]*)\"/>", re.S)
_HREF_RE = re.compile(r"<a href=\"([^\"]*)\">")
_FORM_RE = re.compile(r"<form action=\"([^\"]*)\" method=\"post\">(.*?)</form>",
                      re.S)
_INPUT_RE = re.compile(r"<input name=\"([^\"]*)\" value=\"([^\"]*)\"/>")
_META_ROBOTS_RE = re.compile(r"<meta name=\"robots\" content=\"([^\"]*)\"")
_CANONICAL_RE = re.compile(r"<link rel=\"canonical\" href=\"([^\"]*)\"")


def parse_page(base_url: str, body: str) \
        -> tuple[list[Span], list[str], list[Form], PageMeta]:
    """Extract (spans in document order, raw hrefs in discovery order,
    POST forms in document order, page-level head metadata).

    hrefs/actions are returned RAW (un-absolutized, un-canonicalized) — the
    engine's link pipeline (D1/D2 + P1–P4) owns normalization, mirroring
    Scrapy where LinkExtractor absolutizes but fingerprinting
    canonicalizes [S]. Discovery-order contract (R2): links first, then
    forms — both in their own document order. Anchors carrying
    ``rel="nofollow"`` are NOT extracted (the LxmlLinkExtractor default
    [S:scrapy/linkextractors/lxmlhtml.py]; the _HREF_RE pattern requires
    the href to be the tag's final attribute, which nofollow anchors—
    rendered with a trailing rel attr—never satisfy). A page-level
    ``<meta name="robots" content="...nofollow...">`` suppresses ALL
    discovery (hrefs AND forms return empty; spans are unaffected — the
    page is still content).
    """
    spans: list[Span] = []
    for i, m in enumerate(_SPAN_RE.finditer(body)):
        text, src = m.group(1), m.group(2)
        if text is not None:
            spans.append(Span("text", _html.unescape(text), None, i))
        else:
            spans.append(
                Span("media", None, media_ref_for(base_url, _html.unescape(src)), i)
            )
    mr = _META_ROBOTS_RE.search(body)
    nofollow = bool(mr) and "nofollow" in mr.group(1)
    noindex = bool(mr) and "noindex" in mr.group(1)
    cn = _CANONICAL_RE.search(body)
    meta = PageMeta(nofollow, _html.unescape(cn.group(1)) if cn else None,
                    noindex)
    if nofollow:
        return spans, [], [], meta
    hrefs = [_html.unescape(h) for h in _HREF_RE.findall(body)]
    forms = [
        Form(_html.unescape(action),
             "&".join(f"{_html.unescape(k)}={_html.unescape(v)}"
                      for k, v in _INPUT_RE.findall(inner)))
        for action, inner in _FORM_RE.findall(body)
    ]
    return spans, hrefs, forms, meta


def parse_html(base_url: str,
               body: str) -> tuple[list[Span], list[str], list[Form]]:
    """Back-compat 3-tuple view of parse_page (meta rules applied)."""
    spans, hrefs, forms, _ = parse_page(base_url, body)
    return spans, hrefs, forms
