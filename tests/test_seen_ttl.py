"""Seen-TTL re-crawl mode (config ``seen_ttl_rounds``, r3) + cuckoo
prefilter (config ``seen_filter="cuckoo"``) — engine == oracle EXACTLY.

Semantics under test (config.py / oracle R3+TTL rule): a fingerprint's
seen entry is LIVE for N rounds after its last enqueue or fetch (fetches
refresh it); an expired fingerprint rediscovered later re-enqueues —
unless it is still pending. The prefilter stays exact either way: bloom
never clears bits (stale bits = lost selectivity only), cuckoo deletes
expired tags under the one-insert-per-becomes-live / one-delete-per-
expiry discipline, keeping occupancy proportional to the LIVE set — the
property that makes a 10^10-URL recurring crawl's seen filter bounded.
"""

from __future__ import annotations

from dataclasses import replace

import pandas as pd
import pytest

from crawlspark.engine import CrawlEngine, SHARDS_SCHEMA
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.oracle.simulator import simulate
from crawlspark import cuckoo as ck

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host",
              "status", "depth", "method"]
TTL = 3
MAX_R = 14   # TTL crawls re-crawl indefinitely — cap like production would


@pytest.fixture(scope="module")
def graph(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ttl_graph"))
    cfg = write_fixture(d, n_pages=110, seed=42, config=default_config(),
                        chain_len=0)
    pdfs = {n: pd.read_parquet(f"{d}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    return d, cfg, pdfs


def _run_pair(spark, tmp_path_factory, graph, cfg, max_rounds):
    d, _, pdfs = graph
    oracle = simulate(pdfs, cfg, max_rounds=max_rounds)
    eng = CrawlEngine(spark, d, str(tmp_path_factory.mktemp("ttl_run")), cfg)
    manifest = eng.run(max_rounds=max_rounds)
    return eng, manifest, oracle


def _assert_exact(eng, manifest, oracle):
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want)
    assert set(eng.seen_df(manifest).toPandas().fingerprint) == oracle.seen
    m_got = (eng.metrics_df(manifest).toPandas()
             .sort_values(["round", "host"]).reset_index(drop=True))
    m_want = (pd.DataFrame(oracle.metrics)[m_got.columns]
              .sort_values(["round", "host"])
              .astype(m_got.dtypes.to_dict()).reset_index(drop=True))
    pd.testing.assert_frame_equal(m_got, m_want)
    return got


def test_cuckoo_prefilter_ttl_off_oracle_exact(spark, tmp_path_factory,
                                               graph):
    """Drop-in parity: cuckoo instead of bloom, default forever-seen."""
    cfg = replace(graph[1], seen_filter="cuckoo")
    eng, m, oracle = _run_pair(spark, tmp_path_factory, graph, cfg, None)
    got = _assert_exact(eng, m, oracle)
    # no re-crawls without TTL: repeats only via the retry path
    cnt = got.groupby("fingerprint").size()
    assert (cnt <= 1 + cfg.retry_times).all()


@pytest.mark.parametrize("variant",
                         ["bloom", "cuckoo", "nofilter", "cuckoo_deltas"])
def test_seen_ttl_recrawl_oracle_exact(spark, tmp_path_factory, graph,
                                       variant):
    base = graph[1]
    cfg = {
        "bloom": replace(base, seen_ttl_rounds=TTL),
        "cuckoo": replace(base, seen_ttl_rounds=TTL, seen_filter="cuckoo"),
        "nofilter": replace(base, seen_ttl_rounds=TTL, use_bloom=False),
        # the two opt-in storage modes composed: merge-on-read frontier
        # deltas x TTL re-crawl x deletable prefilter
        "cuckoo_deltas": replace(base, seen_ttl_rounds=TTL,
                                 seen_filter="cuckoo",
                                 frontier_deltas=True),
    }[variant]
    eng, m, oracle = _run_pair(spark, tmp_path_factory, graph, cfg, MAX_R)
    got = _assert_exact(eng, m, oracle)
    # the TTL must actually be exercised: many fingerprints re-fetched
    # beyond what retries allow, i.e. genuine scheduled re-crawls
    cnt = got.groupby("fingerprint").size()
    assert (cnt > 1 + cfg.retry_times).any(), "no re-crawl happened"
    assert oracle.rounds == MAX_R   # the re-crawl loop keeps the run alive

    if variant == "cuckoo":
        # scale property: filter occupancy == |live set|, NOT |all-time
        # seen| — expired tags were deleted (bloom cannot do this)
        from pyspark.sql.types import StructType
        rows = eng.store.read(spark, m, "seen_shards",
                              StructType.fromDDL(SHARDS_SCHEMA)).collect()
        occ = sum(int((ck.decode(bytes(r["bits"]), cfg)[1] != 0).sum())
                  for r in rows)
        assert not any(ck.decode(bytes(r["bits"]), cfg)[0] for r in rows)
        seen_pd = eng.seen_df(m).toPandas()
        live = seen_pd[seen_pd.seen_round > m["round"] - TTL] \
            .fingerprint.nunique()
        alltime = seen_pd.fingerprint.nunique()
        assert occ == live
        assert occ < alltime  # deletions really happened


def test_seen_ttl_resume_equals_uninterrupted(spark, tmp_path_factory,
                                              graph):
    """C1 x TTL x cuckoo: kill after round 5, resume with a fresh engine,
    final crawl order == the uninterrupted run's (the distributed shard
    merge + seen_round rows are all snapshot-committed state)."""
    d, base, _ = graph
    cfg = replace(base, seen_ttl_rounds=TTL, seen_filter="cuckoo")
    run_dir = str(tmp_path_factory.mktemp("ttl_resume"))
    eng1 = CrawlEngine(spark, d, run_dir, cfg)
    m1 = eng1.run(max_rounds=5)
    assert m1["round"] == 4
    eng2 = CrawlEngine(spark, d, run_dir, cfg)
    m2 = eng2.run(max_rounds=MAX_R, resume=True)

    full = CrawlEngine(spark, d, str(tmp_path_factory.mktemp("ttl_full")),
                       cfg)
    mf = full.run(max_rounds=MAX_R)
    got = (eng2.crawl_order_df(m2).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    want = (full.crawl_order_df(mf).orderBy("rank")
            .toPandas()[ORDER_COLS].reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)
    assert set(eng2.seen_df(m2).toPandas().fingerprint) == \
        set(full.seen_df(mf).toPandas().fingerprint)
