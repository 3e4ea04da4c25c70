"""C1 checkpoint/resume (SURVEY §5.2.3): kill after round k, resume, and the
final crawl order / seen set equal the uninterrupted run — zero duplicate
fetches (BASELINE.json:"north_star")."""

import pandas as pd

ORDER_COLS = ["rank", "fingerprint", "url_canon", "round", "host",
              "status", "depth"]


def test_resume_equals_uninterrupted(spark, fixture_dir, tmp_path_factory,
                                     engine_run):
    from crawlspark.engine import CrawlEngine
    d, cfg = fixture_dir
    run_dir = str(tmp_path_factory.mktemp("run_interrupted"))

    # phase 1: crawl 3 rounds, then "die"
    eng1 = CrawlEngine(spark, d, run_dir, cfg)
    m1 = eng1.run(max_rounds=3)
    assert m1["round"] == 2 and m1["state"]["pending"] > 0

    # phase 2: brand-new engine object resumes from the committed snapshot
    eng2 = CrawlEngine(spark, d, run_dir, cfg)
    m2 = eng2.run(resume=True)

    _, m_full = engine_run
    eng_full = engine_run[0]
    got = (eng2.crawl_order_df(m2).orderBy("rank").toPandas()[ORDER_COLS]
           .reset_index(drop=True))
    want = (eng_full.crawl_order_df(m_full).orderBy("rank")
            .toPandas()[ORDER_COLS].reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    seen_got = set(eng2.seen_df(m2).toPandas().fingerprint)
    seen_want = set(eng_full.seen_df(m_full).toPandas().fingerprint)
    assert seen_got == seen_want

    # zero duplicate fetches: a fingerprint may repeat in crawl_order only
    # via the retry path (bounded by retry_times)
    cnt = got.groupby("fingerprint").size()
    assert (cnt <= 1 + cfg.retry_times).all()


def test_rerun_of_committed_round_is_noop(spark, fixture_dir,
                                          tmp_path_factory):
    """Idempotence: resuming an already-complete run does nothing."""
    from crawlspark.engine import CrawlEngine
    d, cfg = fixture_dir
    run_dir = str(tmp_path_factory.mktemp("run_idem"))
    eng = CrawlEngine(spark, d, run_dir, cfg)
    m_done = eng.run(max_rounds=2)
    m_again = eng.run(max_rounds=2, resume=True)
    assert m_again["round"] == m_done["round"]
    assert m_again["state"] == m_done["state"]
