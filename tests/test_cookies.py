"""X13 cookies/session state (r2): a non-root login page grants a
host-scoped session cookie at END of its round; requires_cookie pages
serve 403 unless the cookie is held at round START. Engine parity is
covered by the full engine-vs-oracle suite (the default fixture now
contains cookie sessions); this file pins the oracle-level semantics.
[S:scrapy/downloadermiddlewares/cookies.py — within-round propagation is
deliberately excluded (batch fetches are concurrent); see COVERAGE.md]
"""

from __future__ import annotations

from dataclasses import replace

import pandas as pd


def _gated(pdfs, res):
    req_urls = set(pdfs["pages"][pdfs["pages"].requires_cookie.notna()]
                   .url_canon)
    return [r for r in res.crawl_order if r["url_canon"] in req_urls]


def test_cookie_gate_both_outcomes(fixture_pdfs, oracle_result):
    """The default graph must exercise BOTH paths: a gated page fetched
    before its host's login 403s; one fetched after serves 200."""
    gated = _gated(fixture_pdfs, oracle_result)
    statuses = [g["status"] for g in gated]
    assert 403 in statuses and 200 in statuses, statuses


def test_cookie_grant_round_ordering(fixture_pdfs, oracle_result):
    """Every gated 200 must come strictly AFTER its host's login page was
    fetched (grants take effect next round); every gated 403 must come
    in or before the login's round."""
    pages = fixture_pdfs["pages"]
    login_by_host = dict(
        pages[pages.set_cookie.notna()][["host", "url_canon"]].values)
    login_round = {}
    for r in oracle_result.crawl_order:
        if r["url_canon"] == login_by_host.get(r["host"]) \
                and r["status"] == 200:
            login_round[r["host"]] = r["round"]
    for g in _gated(fixture_pdfs, oracle_result):
        lr = login_round.get(g["host"])
        if g["status"] == 200:
            assert lr is not None and g["round"] > lr, g
        elif g["status"] == 403:
            assert lr is None or g["round"] <= lr, g


def test_cookies_disabled_changes_results(fixture_pdfs, oracle_result):
    from crawlspark.fixtures.webgraph import default_config
    from crawlspark.oracle.simulator import simulate
    off = simulate(fixture_pdfs, replace(default_config(),
                                         cookies_enabled=False))
    assert [r["status"] for r in off.crawl_order] != \
        [r["status"] for r in oracle_result.crawl_order]
    # with the gate off, no gated fetch may 403
    assert all(g["status"] != 403 for g in _gated(fixture_pdfs, off))
