"""Structured Streaming rollup over the committed crawl_order table:
streaming results must agree with the identical batch aggregation over the
same committed files (exactly-once file-source semantics).

Append-mode + watermark semantics: windows still open when an
``availableNow`` drain terminates are NOT emitted (their watermark never
passes), so the file-sink test compares only finalized windows; the
complete-mode memory-sink test covers the full total.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from crawlspark import streaming as cs

WINDOW_S, LATE_S = 8, 4


def _batch_rollup(spark, eng, manifest):
    co = eng.crawl_order_df(manifest)
    bstream = co.withColumn(
        "fetch_ts",
        F.timestamp_seconds(
            F.lit(1_600_000_000)
            + F.col("round").cast("double") * F.lit(8.0)
            + F.pmod(F.col("rank").cast("double"), F.lit(8.0))))
    return (bstream.groupBy(F.window("fetch_ts", f"{WINDOW_S} seconds"),
                            F.col("host"))
            .agg(F.count("*").alias("fetched"),
                 F.sum(F.when(F.col("status") >= 400, 1).otherwise(0))
                 .alias("errors"),
                 F.max("depth").alias("max_depth"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"), "host",
                    "fetched", "errors", "max_depth")
            .toPandas())


def test_stream_rollup_matches_batch_on_finalized_windows(
        spark, engine_run, tmp_path):
    eng, manifest = engine_run
    stream = cs.crawl_order_stream(spark, eng.store.root)
    agg = cs.host_throughput(stream, window_s=WINDOW_S, late_s=LATE_S)
    out = str(tmp_path / "stream_out")
    cs.run_available_now(agg, out)
    got = (spark.read.parquet(f"{out}/out").toPandas()
           .sort_values(["win_start", "host"]).reset_index(drop=True))

    want_all = _batch_rollup(spark, eng, manifest)
    max_ts = want_all["win_end"].max()  # proxy for final watermark position
    finalized = (want_all[want_all["win_end"]
                          <= max_ts - pd.Timedelta(seconds=LATE_S)]
                 .drop(columns=["win_end"])
                 .sort_values(["win_start", "host"]).reset_index(drop=True))

    # emitted rows are exactly the finalized windows...
    assert len(finalized) > 0
    pd.testing.assert_frame_equal(got, finalized, check_dtype=False)
    # ...and every emitted row also appears in the full batch rollup
    full = {tuple(r) for r in want_all.drop(columns=["win_end"]).to_numpy()}
    assert all(tuple(r) in full for r in got.to_numpy())


def test_stream_complete_mode_total_matches_engine_state(spark, engine_run):
    eng, manifest = engine_run
    stream = cs.crawl_order_stream(spark, eng.store.root)
    counts = stream.groupBy(
        F.window("fetch_ts", f"{WINDOW_S} seconds")).count()
    q = (counts.writeStream.outputMode("complete")
         .trigger(availableNow=True)
         .format("memory").queryName("crawl_totals").start())
    q.awaitTermination()
    total = int(spark.sql(
        "SELECT COALESCE(SUM(count), 0) FROM crawl_totals").collect()[0][0])
    assert total == manifest["state"]["total_fetched"] > 0


def test_stateful_host_sessions(spark, engine_run, tmp_path):
    """applyInPandasWithState sessionization: every CLOSED session emitted
    by the stateful operator must exactly match the pandas-computed
    session for that (host, session_start); sessions still open at drain
    end stay in state (append-mode semantics). At least one session must
    close on this graph."""
    eng, manifest = engine_run
    stream = cs.crawl_order_stream(spark, eng.store.root,
                                   files_per_trigger=1)
    sess = cs.host_sessions(stream, gap_s=10, late_s=LATE_S)
    out = str(tmp_path / "sess_out")
    cs.run_available_now(sess, out)
    got = spark.read.parquet(f"{out}/out").toPandas()
    assert len(got) > 0

    # pandas ground truth: per-host gap-split sessions over all fetches
    co = eng.crawl_order_df(manifest).toPandas()
    co["fetch_ts"] = (1_600_000_000 + co["round"].astype(float) * 8.0
                      + (co["rank"].astype(float) % 8.0))
    expected = {}
    for host, grp in co.groupby("host"):
        ts = grp["fetch_ts"].sort_values().to_numpy()
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > 10:
                expected[(host, round(start, 3))] = (round(last, 3), n)
                start, n = t, 0
            last = t
            n += 1
        expected[(host, round(start, 3))] = (round(last, 3), n)

    for r in got.itertuples():
        key = (r.host, round(r.session_start.timestamp(), 3))
        assert key in expected, key
        want_end, want_n = expected[key]
        assert round(r.session_end.timestamp(), 3) == want_end
        assert r.n_fetches == want_n


def test_stateful_host_sessions_multifile_batches(spark, engine_run,
                                                  tmp_path):
    """ADVICE r02: under files_per_trigger=8 one micro-batch spans many
    rounds; the operator must split it into gap-delimited runs instead of
    merging distinct sessions. Every closed session must still match the
    pandas ground truth, and MORE sessions close than under
    one-file-per-trigger draining (interior runs emit immediately)."""
    eng, manifest = engine_run
    stream = cs.crawl_order_stream(spark, eng.store.root,
                                   files_per_trigger=8)
    sess = cs.host_sessions(stream, gap_s=10, late_s=LATE_S)
    out = str(tmp_path / "sess_out_mf")
    cs.run_available_now(sess, out)
    got = spark.read.parquet(f"{out}/out").toPandas()
    assert len(got) > 0

    co = eng.crawl_order_df(manifest).toPandas()
    co["fetch_ts"] = (1_600_000_000 + co["round"].astype(float) * 8.0
                      + (co["rank"].astype(float) % 8.0))
    expected = {}
    for host, grp in co.groupby("host"):
        ts = grp["fetch_ts"].sort_values().to_numpy()
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > 10:
                expected[(host, round(start, 3))] = (round(last, 3), n)
                start, n = t, 0
            last = t
            n += 1
        expected[(host, round(start, 3))] = (round(last, 3), n)

    for r in got.itertuples():
        key = (r.host, round(r.session_start.timestamp(), 3))
        assert key in expected, key
        want_end, want_n = expected[key]
        assert round(r.session_end.timestamp(), 3) == want_end
        assert r.n_fetches == want_n
    # interior sessions of a multi-round batch emit without waiting for
    # the watermark: all fully-closed ground-truth sessions must appear
    n_expected_closed = sum(
        1 for (h, s), (e, n) in expected.items()
        if e < co["fetch_ts"].max() - 10)
    assert len(got) >= n_expected_closed > 0
