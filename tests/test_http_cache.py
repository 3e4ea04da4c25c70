"""X12 HTTP-cache analogue (r2): re-crawl without re-fetch.

Semantics pinned in config.py / oracle: non-retryable responses are cached
by fingerprint; cache hits are served without touching the network — they
bypass the per-host politeness budget, consume no carry, and don't feed
AutoThrottle. [S:scrapy/downloadermiddlewares/httpcache.py DummyPolicy]

The second crawl here runs against a SABOTAGED network (every page 404s):
only cache-served responses can produce documents, so equality with the
first run's documents proves responses really come from the cache.
"""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.oracle.simulator import simulate

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host", "status"]


def _cfg():
    base = default_config()
    return CrawlConfig(**{**base.to_dict(),
                          "allowed_domains": base.allowed_domains,
                          "http_cache": True})


@pytest.fixture(scope="module")
def cache_setup(spark, tmp_path_factory):
    cfg = _cfg()
    fx = str(tmp_path_factory.mktemp("hc_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    cache_dir = str(tmp_path_factory.mktemp("hc_cache"))

    oracle_cache: dict = {}
    oracle_a = simulate(pdfs, cfg, cache=oracle_cache)
    eng_a = CrawlEngine(spark, fx, str(tmp_path_factory.mktemp("hc_run_a")),
                        cfg, cache_dir=cache_dir)
    man_a = eng_a.run()

    # sabotage the network: every page now 404s with no body
    n = len(pdfs["pages"])
    mut = pdfs["pages"].assign(
        status=pd.array([404] * n, dtype="int32"),
        redirect_to=pd.array([None] * n, dtype="string"),
        succeeds_after=pd.array([None] * n, dtype="Int32"),
        body_html="")
    fx_b = str(tmp_path_factory.mktemp("hc_graph_b"))
    mut.to_parquet(f"{fx_b}/pages.parquet", index=False)
    for n in ("seeds", "robots", "host_policy"):
        pdfs[n].to_parquet(f"{fx_b}/{n}.parquet", index=False)
    pdfs_b = {n: pd.read_parquet(f"{fx_b}/{n}.parquet")
              for n in ("seeds", "pages", "robots", "host_policy")}

    oracle_b = simulate(pdfs_b, cfg, cache=oracle_cache)
    eng_b = CrawlEngine(spark, fx_b,
                        str(tmp_path_factory.mktemp("hc_run_b")),
                        cfg, cache_dir=cache_dir)
    man_b = eng_b.run()
    return (eng_a, man_a, oracle_a), (eng_b, man_b, oracle_b), cfg


def _order(eng, manifest):
    return (eng.crawl_order_df(manifest).orderBy("rank")
            .toPandas()[ORDER_COLS].reset_index(drop=True))


def test_first_run_matches_oracle_and_plain(cache_setup, spark,
                                            tmp_path_factory):
    (eng_a, man_a, oracle_a), _, cfg = cache_setup
    got = _order(eng_a, man_a)
    want = pd.DataFrame(oracle_a.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # an empty cache must not change behavior at all
    m = eng_a.metrics_df(man_a).toPandas()
    assert m.cached.sum() == 0


def test_recrawl_served_from_cache_matches_oracle(cache_setup):
    (_, _, oracle_a), (eng_b, man_b, oracle_b), _ = cache_setup
    got = _order(eng_b, man_b)
    want = pd.DataFrame(oracle_b.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    m = eng_b.metrics_df(man_b).toPandas()
    assert m.cached.sum() > 0
    # cache hits bypass the budget: the re-crawl finishes in fewer rounds
    assert man_b["round"] <= oracle_a.rounds


def test_recrawl_documents_identical_despite_dead_network(cache_setup):
    """Every cached 200 re-serves its ORIGINAL body — the sabotaged
    network (all 404) cannot have produced these spans."""
    (eng_a, man_a, oracle_a), (eng_b, man_b, _) = cache_setup[:2]
    docs_a = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_a.documents_df(man_a).toPandas().itertuples()}
    docs_b = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_b.documents_df(man_b).toPandas().itertuples()}
    assert len(docs_b) > 0
    for doc_id, spans in docs_b.items():
        assert docs_a[doc_id] == spans


def test_cache_off_unchanged_by_flag_default():
    cfg = default_config()
    assert cfg.http_cache is False


def test_cache_publish_transactional_with_commit(spark, tmp_path_factory):
    """ADVICE r02 (medium): a kill between the cache write and the
    snapshot commit must NOT leave the crashed round's responses in the
    cache — otherwise the re-executed round sees its own fingerprints as
    hits (budget bypass, different dequeue order) and resume diverges
    from the oracle.

    Crash injection: store.commit raises on round 2 AFTER the table/cache
    writes ran. The resumed run must (a) see zero cache hits — nothing
    the crashed round wrote was published — and (b) reproduce the
    oracle's crawl order exactly."""
    cfg = _cfg()
    fx = str(tmp_path_factory.mktemp("txn_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg, cache={})

    cache_dir = str(tmp_path_factory.mktemp("txn_cache"))
    run_dir = str(tmp_path_factory.mktemp("txn_run"))
    eng1 = CrawlEngine(spark, fx, run_dir, cfg, cache_dir=cache_dir)
    real_commit = eng1.store.commit

    def crashing_commit(rnd, state, tables):
        if rnd == 2:
            raise RuntimeError("injected crash before commit")
        real_commit(rnd, state, tables)

    eng1.store.commit = crashing_commit
    with pytest.raises(RuntimeError, match="injected crash"):
        eng1.run()

    # nothing from the crashed round was published to the cache
    import os
    assert all(not d.startswith("r") or d < "r000003"
               for d in os.listdir(cache_dir) if not d.startswith("."))

    eng2 = CrawlEngine(spark, fx, run_dir, cfg, cache_dir=cache_dir)
    man2 = eng2.run(resume=True)
    got = _order(eng2, man2)
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    m = eng2.metrics_df(man2).toPandas()
    assert m.cached.sum() == 0   # first crawl: the cache never serves


@pytest.mark.parametrize("ttl", [0, 2])
def test_cache_compaction_preserves_semantics(spark, tmp_path_factory, ttl):
    """X12 compaction (r4, VERDICT r03 #2): with
    httpcache_compact_every=2 the engine folds published cache dirs into
    one latest-epoch-wins dir every 2 epochs. Compaction must be purely
    physical: the compacted run's crawl order equals the uncompacted
    run's AND the oracle's, a sabotaged-network re-crawl still serves
    the original bodies from the compacted cache, and the cache dir
    count stays O(cadence) instead of one per round."""
    import os
    base = _cfg()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "httpcache_compact_every": 2,
                         "httpcache_expiration_rounds": ttl})
    fx = str(tmp_path_factory.mktemp(f"cp_graph_{ttl}"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}

    oracle_cache: dict = {}
    oracle_a = simulate(pdfs, cfg, cache=oracle_cache)
    cache_dir = str(tmp_path_factory.mktemp(f"cp_cache_{ttl}"))
    eng_a = CrawlEngine(spark, fx,
                        str(tmp_path_factory.mktemp(f"cp_run_a_{ttl}")),
                        cfg, cache_dir=cache_dir)
    man_a = eng_a.run()
    got = _order(eng_a, man_a)
    want = pd.DataFrame(oracle_a.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert oracle_a.rounds >= 4   # compaction ran at least once
    published = [d for d in os.listdir(cache_dir) if d.startswith("r")]
    assert len(published) <= 2, published   # O(cadence), not O(rounds)
    assert any("c-" in d for d in published)

    # sabotaged re-crawl: only the COMPACTED cache can produce documents
    n = len(pdfs["pages"])
    mut = pdfs["pages"].assign(
        status=pd.array([404] * n, dtype="int32"),
        redirect_to=pd.array([None] * n, dtype="string"),
        succeeds_after=pd.array([None] * n, dtype="Int32"),
        body_html="")
    fx_b = str(tmp_path_factory.mktemp(f"cp_graph_b_{ttl}"))
    mut.to_parquet(f"{fx_b}/pages.parquet", index=False)
    for name in ("seeds", "robots", "host_policy"):
        pdfs[name].to_parquet(f"{fx_b}/{name}.parquet", index=False)
    pdfs_b = {name: pd.read_parquet(f"{fx_b}/{name}.parquet")
              for name in ("seeds", "pages", "robots", "host_policy")}
    oracle_b = simulate(pdfs_b, cfg, cache=oracle_cache)
    eng_b = CrawlEngine(spark, fx_b,
                        str(tmp_path_factory.mktemp(f"cp_run_b_{ttl}")),
                        cfg, cache_dir=cache_dir)
    man_b = eng_b.run()
    got_b = _order(eng_b, man_b)
    want_b = pd.DataFrame(oracle_b.crawl_order)[ORDER_COLS] \
        .astype(got_b.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_b, want_b)
    m = eng_b.metrics_df(man_b).toPandas()
    if ttl == 0:
        assert m.cached.sum() > 0
    else:
        # ttl=2: run B's epoch counter starts at run A's end and advances
        # in lockstep with its own rounds, so every run-A entry is >ttl
        # epochs old by the time run B's dequeue reaches it — NOTHING may
        # be served. An engine that rewrote entry epochs at compaction
        # (extending TTLs instead of preserving them) would serve the
        # sabotaged pages' original bodies here and diverge from the
        # oracle frame-equality above.
        assert m.cached.sum() == 0


def test_cache_revalidation_oracle_exact(spark, tmp_path_factory):
    """X12 r4 conditional revalidation (RFC2616Policy ETag analogue):
    run B re-crawls with ttl=1 (most entries expired) + revalidation on,
    against a network whose BODIES are all blanked but whose validators
    are unchanged except on a deterministic subset. Expired entries with
    an unchanged validator must revalidate — serve their ORIGINAL run-A
    body (provably not the network's, which is blank) while consuming
    politeness budget like a fetch — and changed-validator pages must
    fully re-fetch the blank body. Crawl order is oracle-exact."""
    base = _cfg()
    cfg_a = CrawlConfig(**{**base.to_dict(),
                           "allowed_domains": base.allowed_domains,
                           "httpcache_revalidate": True})
    fx = str(tmp_path_factory.mktemp("rv_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg_a, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    cache_dir = str(tmp_path_factory.mktemp("rv_cache"))
    oracle_cache: dict = {}
    oracle_a = simulate(pdfs, cfg_a, cache=oracle_cache)
    eng_a = CrawlEngine(spark, fx,
                        str(tmp_path_factory.mktemp("rv_run_a")),
                        cfg_a, cache_dir=cache_dir)
    man_a = eng_a.run()
    docs_a = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_a.documents_df(man_a).toPandas().itertuples()}

    # blank every body; flip validators on a deterministic 1/3 of pages
    pg = pdfs["pages"].reset_index(drop=True)
    changed_mask = pg.index % 3 == 0
    mut = pg.assign(
        body_html="",
        validator=pg.validator.where(~changed_mask, "W/changed"))
    fx_b = str(tmp_path_factory.mktemp("rv_graph_b"))
    mut.to_parquet(f"{fx_b}/pages.parquet", index=False)
    for name in ("seeds", "robots", "host_policy"):
        pdfs[name].to_parquet(f"{fx_b}/{name}.parquet", index=False)
    pdfs_b = {name: pd.read_parquet(f"{fx_b}/{name}.parquet")
              for name in ("seeds", "pages", "robots", "host_policy")}

    cfg_b = CrawlConfig(**{**cfg_a.to_dict(),
                           "allowed_domains": cfg_a.allowed_domains,
                           "httpcache_expiration_rounds": 1})
    oracle_b = simulate(pdfs_b, cfg_b, cache=oracle_cache)
    eng_b = CrawlEngine(spark, fx_b,
                        str(tmp_path_factory.mktemp("rv_run_b")),
                        cfg_b, cache_dir=cache_dir)
    man_b = eng_b.run()
    got = _order(eng_b, man_b)
    want = pd.DataFrame(oracle_b.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    # partition run-B documents: unchanged-validator pages revalidated and
    # kept their ORIGINAL spans; changed-validator pages re-fetched the
    # blank network body (spans differ from run A's non-empty ones)
    changed_urls = set(mut[changed_mask].url_canon)
    fp2url = {o["fingerprint"]: o["url_canon"]
              for o in oracle_b.crawl_order}
    docs_b = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_b.documents_df(man_b).toPandas().itertuples()}
    kept = refetched = 0
    for doc_id, spans in docs_b.items():
        if doc_id not in docs_a:
            continue
        if fp2url[doc_id] in changed_urls:
            if docs_a[doc_id]:           # originally non-empty spans
                assert spans != docs_a[doc_id]
                refetched += 1
        else:
            assert spans == docs_a[doc_id]
            kept += 1
    assert kept > 0 and refetched > 0
    # revalidations hit the network: budget-gated fetches, not cache hits
    m = eng_b.metrics_df(man_b).toPandas()
    assert int(m.cached.sum()) < int(m.fetched.sum())


def test_cache_ttl_expired_entries_refetch(spark, tmp_path_factory):
    """X12 TTL (r3): run B shares run A's cache but sets
    httpcache_expiration_rounds = roundsA - 1, so exactly the epoch-0
    entries (seeds + first batch) are stale: B re-fetches them over the
    network while later-epoch entries serve as hits. The run must be a
    MIX of hits and re-fetches and match the oracle's TTL model exactly.
    (The TTL never affects run A: its cache starts empty and within-run
    re-fetches are impossible — the seen set blocks re-enqueue and
    retryable responses are never cached.)"""
    cfg_a = _cfg()
    fx = str(tmp_path_factory.mktemp("ttl_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg_a, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    cache_dir = str(tmp_path_factory.mktemp("ttl_cache"))

    oracle_cache: dict = {}
    oracle_a = simulate(pdfs, cfg_a, cache=oracle_cache)
    eng_a = CrawlEngine(spark, fx,
                        str(tmp_path_factory.mktemp("ttl_run_a")),
                        cfg_a, cache_dir=cache_dir)
    eng_a.run()
    assert oracle_a.rounds > 2
    assert oracle_cache["__epoch__"] == oracle_a.rounds

    cfg_b = CrawlConfig(**{**cfg_a.to_dict(),
                           "allowed_domains": cfg_a.allowed_domains,
                           "httpcache_expiration_rounds":
                               oracle_a.rounds - 1})
    oracle_b = simulate(pdfs, cfg_b, cache=oracle_cache)
    eng_b = CrawlEngine(spark, fx,
                        str(tmp_path_factory.mktemp("ttl_run_b")),
                        cfg_b, cache_dir=cache_dir)
    man_b = eng_b.run()
    got = _order(eng_b, man_b)
    want = pd.DataFrame(oracle_b.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    m = eng_b.metrics_df(man_b).toPandas()
    hits, fetched = int(m.cached.sum()), int(m.fetched.sum())
    assert 0 < hits < fetched, (hits, fetched)   # mixed hits + re-fetches


def test_cache_revalidation_last_modified_oracle_exact(spark,
                                                       tmp_path_factory):
    """X12 r5 (RFC2616Policy both-validators): Last-Modified is the weak
    If-Modified-Since analogue, consulted only when the cached entry has
    no ETag. A hand-built one-host graph with three page classes:

    * /lm-keep, /lm-flip: NO ETag, only last_modified — run B (ttl=1,
      bodies blanked) must revalidate /lm-keep (original run-A spans
      served) and fully re-fetch /lm-flip (lm changed -> blank body).
    * /etag-wins: BOTH validators; run B changes the ETag but keeps
      last_modified — the strong validator decides, so it must RE-FETCH
      (a weak-validator-first engine would wrongly serve the cache).

    Crawl order is oracle-exact for both runs."""
    from crawlspark.kernels.parse import Span, render_html

    HOST = "d.test"

    def _page(path, hrefs=()):
        sp = [Span("text", f"page {path}", None, 0)]
        return {
            "url_canon": f"https://{HOST}{path}" if path != "/"
            else f"https://{HOST}/",
            "status": 200, "redirect_to": None, "succeeds_after": None,
            "latency_ms": 10.0,
            "body_html": render_html(path, sp, list(hrefs), []),
            "retry_after_s": None,
        }

    fx = str(tmp_path_factory.mktemp("lm_graph"))
    pages = [
        _page("/", hrefs=["/lm-keep", "/lm-flip", "/etag-wins"]),
        _page("/lm-keep"),
        _page("/lm-flip"),
        _page("/etag-wins"),
    ]
    for p in pages:
        leaf = p["url_canon"].rsplit("/", 1)[-1]
        p["validator"] = ("W/" + leaf) if leaf in ("etag-wins", "") else None
        p["last_modified"] = "LM/" + (leaf or "root")
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
    cache_dir = str(tmp_path_factory.mktemp("lm_cache"))

    cfg_a = CrawlConfig(allowed_domains=(HOST,), http_cache=True,
                        httpcache_revalidate=True)
    oracle_cache: dict = {}
    simulate(pdfs, cfg_a, cache=oracle_cache)
    eng_a = CrawlEngine(spark, fx, str(tmp_path_factory.mktemp("lm_run_a")),
                        cfg_a, cache_dir=cache_dir)
    man_a = eng_a.run()
    docs_a = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_a.documents_df(man_a).toPandas().itertuples()}

    pg = pdfs["pages"].copy()
    pg["body_html"] = ""                      # cache serves are provable
    flip = pg.url_canon.str.endswith("/lm-flip")
    pg.loc[flip, "last_modified"] = "LM/changed"
    ew = pg.url_canon.str.endswith("/etag-wins")
    pg.loc[ew, "validator"] = "W/changed"     # lm stays — ETag must win
    fx_b = str(tmp_path_factory.mktemp("lm_graph_b"))
    pg.to_parquet(f"{fx_b}/pages.parquet", index=False)
    for name in ("seeds", "robots", "host_policy"):
        pdfs[name].to_parquet(f"{fx_b}/{name}.parquet", index=False)
    pdfs_b = {**pdfs, "pages": pg}

    cfg_b = CrawlConfig(allowed_domains=(HOST,), http_cache=True,
                        httpcache_revalidate=True,
                        httpcache_expiration_rounds=1)
    oracle_b = simulate(pdfs_b, cfg_b, cache=oracle_cache)
    eng_b = CrawlEngine(spark, fx_b,
                        str(tmp_path_factory.mktemp("lm_run_b")),
                        cfg_b, cache_dir=cache_dir)
    man_b = eng_b.run()
    got = _order(eng_b, man_b)
    want = pd.DataFrame(oracle_b.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)

    url2fp = {o["url_canon"]: o["fingerprint"]
              for o in oracle_b.crawl_order}
    docs_b = {r.doc_id: [tuple(s) for s in r.spans] for r in
              eng_b.documents_df(man_b).toPandas().itertuples()}
    keep_fp = url2fp[f"https://{HOST}/lm-keep"]
    flip_fp = url2fp[f"https://{HOST}/lm-flip"]
    ew_fp = url2fp[f"https://{HOST}/etag-wins"]
    # lm unchanged + no ETag -> revalidated, ORIGINAL spans
    assert docs_b[keep_fp] == docs_a[keep_fp] and docs_a[keep_fp]
    # lm changed -> full re-fetch of the blank body
    assert docs_b[flip_fp] != docs_a[flip_fp]
    # ETag changed (lm unchanged) -> strong validator wins: re-fetch
    assert docs_b[ew_fp] != docs_a[ew_fp]
