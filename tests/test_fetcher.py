"""X7 HTTP fetcher plumbing: mapInPandas schema, row-order preservation,
status/redirect mapping — exercised via an injected deterministic opener
(no network in-sandbox)."""

from __future__ import annotations

import pytest

from crawlspark import fetcher


def make_fake_opener():
    # local def: cloudpickle serializes it BY VALUE, so executors don't
    # need the tests/ dir on their import path
    def fake_opener(url: str, timeout_s: float, method: str = "GET",
                    body: str = ""):
        if url.endswith("/redir"):
            return 301, "", url.replace("/redir", "/target")
        if url.endswith("/boom"):
            return 503, "", None
        return 200, f"<html><p>{method} {url} {body}</p></html>", None
    return fake_opener


@pytest.fixture(scope="module")
def fetched(spark):
    urls = [(f"https://h{i}.test/{kind}",)
            for i in range(20)
            for kind in ("page", "redir", "boom")]
    batch = spark.createDataFrame(urls, "url_canon string").repartition(4)
    df = fetcher.http_fetch_batch(batch, opener=make_fake_opener()).cache()
    return df


def test_schema_and_counts(fetched):
    assert fetched.schema == fetcher.FETCH_SCHEMA
    assert fetched.count() == 60


def test_status_and_redirect_mapping(fetched):
    rows = {r["url_canon"]: r for r in fetched.collect()}
    for url, r in rows.items():
        if url.endswith("/redir"):
            assert r["status"] == 301
            assert r["redirect_to"] == url.replace("/redir", "/target")
        elif url.endswith("/boom"):
            assert r["status"] == 503 and r["redirect_to"] is None
        else:
            assert r["status"] == 200 and url in r["body_html"]
        assert r["latency_ms"] >= 0.0


def test_row_order_preserved_within_partition(spark):
    urls = [(f"https://ordered.test/{i:03d}",) for i in range(50)]
    batch = spark.createDataFrame(urls, "url_canon string").coalesce(1)
    out = [r["url_canon"] for r in
           fetcher.http_fetch_batch(batch, opener=make_fake_opener()).collect()]
    assert out == [u for (u,) in urls]


def test_post_method_and_body_passthrough(spark):
    batch = spark.createDataFrame(
        [("https://h.test/form", "POST", "q=a&b=c"),
         ("https://h.test/page", "GET", "")],
        "url_canon string, method string, body string").coalesce(1)
    rows = {r["url_canon"]: r for r in
            fetcher.http_fetch_batch(batch, opener=make_fake_opener()).collect()}
    assert "POST https://h.test/form q=a&b=c" in \
        rows["https://h.test/form"]["body_html"]
    assert "GET https://h.test/page" in rows["https://h.test/page"]["body_html"]


def test_retry_after_surfaced(spark):
    """X15 r3: a 4-tuple opener's Retry-After seconds reach the
    retry_after_s column; legacy 3-tuple openers yield null."""
    from crawlspark import fetcher

    def ra_opener(url, timeout_s, method="GET", body=""):
        if url.endswith("/throttle"):
            return 429, "", None, 30.0
        return 200, "<html></html>", None, None

    batch = spark.createDataFrame(
        [("https://a.test/throttle",), ("https://a.test/ok",)],
        "url_canon string")
    rows = {r.url_canon: r for r in
            fetcher.http_fetch_batch(batch, opener=ra_opener).collect()}
    assert rows["https://a.test/throttle"].status == 429
    assert rows["https://a.test/throttle"].retry_after_s == 30.0
    assert rows["https://a.test/ok"].retry_after_s is None


def test_parse_retry_after_forms():
    from crawlspark.fetcher import parse_retry_after
    assert parse_retry_after("120") == 120.0
    assert parse_retry_after(" 5.5 ") == 5.5
    assert parse_retry_after("-3") is None
    assert parse_retry_after("Wed, 21 Oct 2015 07:28:00 GMT") is None
    assert parse_retry_after(None) is None
    assert parse_retry_after("") is None
