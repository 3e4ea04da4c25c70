"""C1 frontier merge-on-read delta mode (r2): each round appends O(round)
add/remove events instead of rewriting the O(frontier) base; reads resolve
latest-event-wins per fingerprint; the base is compacted every
frontier_compact_every rounds. At the 10^10 design point this is the only
viable write path (a 10-TB frontier cannot be rewritten per round) — the
tests pin EXACT equality with the oracle and with resume-from-kill, so the
MOR path is not a weaker sibling."""

from __future__ import annotations

import pandas as pd
import pytest

from crawlspark.config import CrawlConfig
from crawlspark.engine import CrawlEngine
from crawlspark.fixtures.webgraph import default_config, write_fixture
from crawlspark.oracle.simulator import simulate

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host",
              "status", "depth"]


@pytest.fixture(scope="module")
def fd_setup(spark, tmp_path_factory):
    base = default_config()
    cfg = CrawlConfig(**{**base.to_dict(),
                         "allowed_domains": base.allowed_domains,
                         "frontier_deltas": True,
                         "frontier_compact_every": 3})
    fx = str(tmp_path_factory.mktemp("fd_graph"))
    write_fixture(fx, n_pages=110, seed=42, config=cfg, chain_len=0)
    pdfs = {n: pd.read_parquet(f"{fx}/{n}.parquet")
            for n in ("seeds", "pages", "robots", "host_policy")}
    oracle = simulate(pdfs, cfg)
    run_dir = str(tmp_path_factory.mktemp("fd_run"))
    eng = CrawlEngine(spark, fx, run_dir, cfg)
    manifest = eng.run()
    return fx, cfg, eng, manifest, oracle


def test_delta_mode_order_matches_oracle(fd_setup):
    _, _, eng, manifest, oracle = fd_setup
    got = (eng.crawl_order_df(manifest).orderBy("rank").toPandas()[ORDER_COLS]
           .reset_index(drop=True))
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(eng.seen_df(manifest).toPandas().fingerprint) == oracle.seen


def test_delta_mode_actually_writes_deltas(fd_setup):
    """Guard against a silently-inert flag: at least one committed
    manifest must carry a non-empty frontier_delta list, and the final
    manifests alternate with compactions (delta list resets)."""
    _, cfg, eng, manifest, _ = fd_setup
    import json
    import os
    snaps = sorted(os.listdir(eng.store.snap_dir))
    delta_counts = []
    for sn in snaps:
        with open(os.path.join(eng.store.snap_dir, sn)) as f:
            m = json.load(f)
        delta_counts.append(len(m["tables"].get("frontier_delta", [])))
    assert max(delta_counts) > 0
    assert 0 in delta_counts[1:]   # some compaction reset the list


def test_delta_mode_resume_equals_uninterrupted(spark, fd_setup,
                                                tmp_path_factory):
    """Kill after 4 rounds (mid-delta, past one compaction at round 3)
    and resume in a fresh engine: final state must equal the
    uninterrupted run exactly."""
    fx, cfg, eng_full, man_full, _ = fd_setup
    run_dir = str(tmp_path_factory.mktemp("fd_resume"))
    eng1 = CrawlEngine(spark, fx, run_dir, cfg)
    eng1.run(max_rounds=4)
    eng2 = CrawlEngine(spark, fx, run_dir, cfg)
    man2 = eng2.run(resume=True)
    a = (eng_full.crawl_order_df(man_full).orderBy("rank")
         .toPandas()[ORDER_COLS].reset_index(drop=True))
    b = (eng2.crawl_order_df(man2).orderBy("rank")
         .toPandas()[ORDER_COLS].reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert set(eng2.seen_df(man2).toPandas().fingerprint) == \
        set(eng_full.seen_df(man_full).toPandas().fingerprint)
