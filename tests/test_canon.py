"""Golden-vector tests for D1 canonicalize + D2 fingerprint (SURVEY §5.2.1;
mirrors upstream Scrapy's tests/test_utils_request.py golden-hex style)."""

import hashlib

import pytest

from crawlspark.kernels.canon import (
    absolutize, canonicalize_url, fingerprint_hex, url_host,
)

# (raw, canonical) — the normative vector set: query sort, %-case, default
# port, fragment, idna, empty path, whitespace, blank query values, scheme/
# host case, relative resolution handled separately.
VECTORS = [
    ("http://example.com/", "http://example.com/"),
    ("HTTP://example.com/", "http://example.com/"),
    ("http://EXAMPLE.com/", "http://example.com/"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com:80/", "http://example.com/"),
    ("https://example.com:443/x", "https://example.com/x"),
    ("http://example.com:8080/", "http://example.com:8080/"),
    ("https://example.com:80/", "https://example.com:80/"),
    ("http://example.com/#frag", "http://example.com/"),
    ("http://example.com/x#frag", "http://example.com/x"),
    ("http://example.com/?b=2&a=1", "http://example.com/?a=1&b=2"),
    ("http://example.com/?b=2&a=1&a=0", "http://example.com/?a=0&a=1&b=2"),
    ("http://example.com/?a=2&a=1", "http://example.com/?a=1&a=2"),
    ("http://example.com/?k=", "http://example.com/?k="),
    ("http://example.com/?k", "http://example.com/?k="),
    ("http://example.com/?b&a=1", "http://example.com/?a=1&b="),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/%70age", "http://example.com/page"),
    ("http://example.com/a%2Fb", "http://example.com/a/b"),  # w3lib-style conflation
    ("http://example.com/a b/c", "http://example.com/a%20b/c"),
    ("http://example.com/a%20b", "http://example.com/a%20b"),
    ("http://example.com/café", "http://example.com/caf%C3%A9"),
    ("http://münchen.test/x", "http://xn--mnchen-3ya.test/x"),
    ("  http://example.com/x  ", "http://example.com/x"),
    ("http://example.com/x?q=a b", "http://example.com/x?q=a+b"),
    ("http://example.com/x?q=a+b", "http://example.com/x?q=a+b"),
    ("http://example.com/x?z=%C3%A9", "http://example.com/x?z=%C3%A9"),
    ("http://example.com/;params", "http://example.com/;params"),
    ("http://user:pw@example.com/x", "http://user:pw@example.com/x"),
    ("http://USER:pw@EXAMPLE.com/x", "http://USER:pw@example.com/x"),
    ("https://h.test/a/../b", "https://h.test/a/../b"),  # no dot-normalization (w3lib parity)
    ("mailto:a@b.test", "mailto:a@b.test"),
    ("javascript:void(0)", "javascript:void(0)"),
    ("https://h.test/%E2%98%85", "https://h.test/%E2%98%85"),
    ("http://example.com/?utf=★", "http://example.com/?utf=%E2%98%85"),
    ("HTTPS://Booking.TEST:443/hotel/1?b=2&a=1#x",
     "https://booking.test/hotel/1?a=1&b=2"),
]


@pytest.mark.parametrize("raw,want", VECTORS)
def test_canonical_vectors(raw, want):
    assert canonicalize_url(raw) == want


@pytest.mark.parametrize("raw,want", VECTORS)
def test_canonical_idempotent(raw, want):
    assert canonicalize_url(want) == want


def test_fingerprint_golden():
    # R6: sha1('GET' || canonical_url) hex — pinned golden values
    assert fingerprint_hex("http://example.com/") == \
        hashlib.sha1(b"GEThttp://example.com/").hexdigest()
    assert fingerprint_hex("http://example.com/") == \
        "628735d3a16b67b1dd5fbfbd10a15f2c28362bbd"


def test_fingerprint_matches_spark_native_sha1(spark):
    """The engine computes D2 natively: sha1(concat('GET', url_canon)).
    It must equal the Python kernel bit-for-bit."""
    from pyspark.sql import functions as F
    urls = [c for _, c in VECTORS[:10]]
    df = spark.createDataFrame([(u,) for u in urls], "url_canon string") \
        .withColumn("fp", F.sha1(F.concat(F.lit("GET"), F.col("url_canon"))))
    for r in df.collect():
        assert r["fp"] == fingerprint_hex(r["url_canon"])


def test_absolutize():
    assert absolutize("https://h.test/a/b", "/x") == "https://h.test/x"
    assert absolutize("https://h.test/a/b", "c") == "https://h.test/a/c"
    assert absolutize("https://h.test/a/", "c?q=1") == "https://h.test/a/c?q=1"
    assert absolutize("https://h.test/a", "https://o.test/z") == "https://o.test/z"
    assert absolutize("https://h.test/a", " /x ") == "https://h.test/x"


def test_url_host():
    assert url_host("https://A.B.test:8080/x") == "a.b.test"
    assert url_host("not a url") == ""


def test_fixture_outlinks_roundtrip(fixture_pdfs):
    """Every same-graph messy outlink canonicalizes back to a pages key
    (the _mess_up transformations are canonicalization-invariant)."""
    pages = fixture_pdfs["pages"]
    urlset = set(pages.url_canon)
    in_graph = 0
    for _, row in pages.iterrows():
        for h in row.outlinks_raw:
            cu = canonicalize_url(absolutize(row.url_canon, h))
            if url_host(cu).endswith(".test") and "/brochure/" not in cu \
                    and not cu.startswith(("mailto", "javascript", "ftp")) \
                    and url_host(cu) not in ("facebook.test", "ads.tracker.test") \
                    and "/l/" not in cu:
                assert cu in urlset, (h, cu)
                in_graph += 1
    assert in_graph > 100
