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


# ---------------------------------------------------------------------------
# "auto" storage mode (r5, VERDICT r04 #6): per round, delta mode iff the
# round-START pending count exceeds frontier_deltas_auto_rows — the default
# config becomes the scale-correct one without opting in, and a shrinking
# tail downshifts back (the full rewrite doubles as compaction).
# ---------------------------------------------------------------------------

def _auto_run(spark, tmp_path_factory, fx, base_cfg, mode, thresh, tag):
    cfg = CrawlConfig(**{**base_cfg.to_dict(),
                         "allowed_domains": base_cfg.allowed_domains,
                         "frontier_deltas": mode,
                         "frontier_deltas_auto_rows": thresh,
                         "frontier_compact_every": 3})
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp(f"fda_{tag}")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    return eng, manifest, got


def _manifest_rows(eng):
    import json
    import os
    out = []
    for sn in sorted(os.listdir(eng.store.snap_dir)):
        with open(os.path.join(eng.store.snap_dir, sn)) as f:
            m = json.load(f)
        out.append((m["round"], len(m["tables"].get("frontier_delta", [])),
                    m["state"].get("pending", 0)))
    return sorted(out)


def test_auto_mode_parity_and_switch(spark, fd_setup, tmp_path_factory):
    """auto == full-rewrite == oracle exactly, while the manifests show
    BOTH transitions: full rewrites below the threshold, delta appends
    above it, and a downshift on the shrinking tail."""
    fx, base_cfg, _, _, oracle = fd_setup
    # threshold 20: seeds (6) start below it, the mid-crawl frontier
    # peaks at 39, the tail drops back under — one run exercises up AND
    # downshift (pending trajectory: 6,39,34,30,27,16,11,2,1,0)
    eng_a, _, got_a = _auto_run(spark, tmp_path_factory, fx, base_cfg,
                                "auto", 20, "auto20")
    _, _, got_f = _auto_run(spark, tmp_path_factory, fx, base_cfg,
                            False, 20, "full")
    pd.testing.assert_frame_equal(got_a, got_f)
    want = pd.DataFrame(oracle.crawl_order)[ORDER_COLS] \
        .astype(got_a.dtypes.to_dict()).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_a, want)

    rows = _manifest_rows(eng_a)
    # per round r (>=1): a delta was appended iff this manifest's list is
    # LONGER than the previous round's. That must equal the engine rule:
    # previous pending > threshold and r not on the compaction cadence.
    wrote_delta = [rows[i][1] > rows[i - 1][1] for i in range(1, len(rows))]
    should = [rows[i - 1][2] > 20 and rows[i][0] % 3 != 0
              for i in range(1, len(rows))]
    assert wrote_delta == should
    assert any(wrote_delta), "threshold never crossed - fixture too small"
    # downshift: after deltas began, some NON-compaction round wrote a
    # full rewrite — only a below-threshold pending can cause that
    first_delta = min(i for i, w in enumerate(wrote_delta) if w)
    assert any(not wrote_delta[j] and rows[j + 1][0] % 3 != 0
               for j in range(first_delta + 1, len(wrote_delta))), \
        "tail never downshifted"
    assert rows[-1][2] == 0


def test_auto_mode_default_ratio_rule(spark, fd_setup, tmp_path_factory):
    """With no absolute override (frontier_deltas_auto_rows=None, the
    default), the rule is pending > frontier_deltas_auto_ratio *
    round_cap. ratio 0.3 at round_cap 64 puts the threshold at 19.2 —
    inside this fixture's pending trajectory (peak 39, tail to 0), so
    one run exercises upshift AND downshift under the default rule, and
    the crawl output still equals the full-rewrite run exactly."""
    fx, base_cfg, _, _, _ = fd_setup
    cfg = CrawlConfig(**{**base_cfg.to_dict(),
                         "allowed_domains": base_cfg.allowed_domains,
                         "frontier_deltas": "auto",
                         "frontier_deltas_auto_rows": None,
                         "frontier_deltas_auto_ratio": 0.3,
                         "frontier_compact_every": 3})
    assert cfg.round_cap == 64
    eng = CrawlEngine(spark, fx,
                      str(tmp_path_factory.mktemp("fda_ratio")), cfg)
    manifest = eng.run()
    got = (eng.crawl_order_df(manifest).orderBy("rank")
           .toPandas()[ORDER_COLS].reset_index(drop=True))
    _, _, got_f = _auto_run(spark, tmp_path_factory, fx, base_cfg,
                            False, 20, "ratio_full")
    pd.testing.assert_frame_equal(got, got_f)

    thresh = 0.3 * 64
    rows = _manifest_rows(eng)
    wrote_delta = [rows[i][1] > rows[i - 1][1] for i in range(1, len(rows))]
    should = [rows[i - 1][2] > thresh and rows[i][0] % 3 != 0
              for i in range(1, len(rows))]
    assert wrote_delta == should
    assert any(wrote_delta), "ratio threshold never crossed"
    first_delta = min(i for i, w in enumerate(wrote_delta) if w)
    assert any(not wrote_delta[j] and rows[j + 1][0] % 3 != 0
               for j in range(first_delta + 1, len(wrote_delta))), \
        "tail never downshifted under the ratio rule"


def test_auto_mode_thresholds_degenerate(spark, fd_setup, tmp_path_factory):
    """threshold 0 ~= always-delta; huge threshold == never-delta."""
    fx, base_cfg, _, _, _ = fd_setup
    eng_lo, _, got_lo = _auto_run(spark, tmp_path_factory, fx, base_cfg,
                                  "auto", 0, "lo")
    eng_hi, _, got_hi = _auto_run(spark, tmp_path_factory, fx, base_cfg,
                                  "auto", 10**9, "hi")
    pd.testing.assert_frame_equal(got_lo, got_hi)
    assert max(r[1] for r in _manifest_rows(eng_lo)) > 0
    assert max(r[1] for r in _manifest_rows(eng_hi)) == 0


def test_auto_mode_resume_across_switch(spark, fd_setup, tmp_path_factory):
    """Kill mid-run (with deltas live) and resume under auto: final state
    equals the uninterrupted auto run exactly."""
    fx, base_cfg, _, _, _ = fd_setup
    _, _, got_full = _auto_run(spark, tmp_path_factory, fx, base_cfg,
                               "auto", 40, "unint")
    cfg = CrawlConfig(**{**base_cfg.to_dict(),
                         "allowed_domains": base_cfg.allowed_domains,
                         "frontier_deltas": "auto",
                         "frontier_deltas_auto_rows": 40,
                         "frontier_compact_every": 3})
    run_dir = str(tmp_path_factory.mktemp("fda_resume"))
    eng1 = CrawlEngine(spark, fx, run_dir, cfg)
    eng1.run(max_rounds=4)
    eng2 = CrawlEngine(spark, fx, run_dir, cfg)
    man2 = eng2.run(resume=True)
    got_res = (eng2.crawl_order_df(man2).orderBy("rank")
               .toPandas()[ORDER_COLS].reset_index(drop=True))
    pd.testing.assert_frame_equal(got_res, got_full)
