"""Structured Streaming surface over the crawl's output tables.

The engine itself is deliberately batch-BSP (SURVEY §2.9): exact crawl-order
matching and snapshot resume are table properties, and Scrapy has no
event-time semantics to reproduce. This module covers the *streaming
category* the idiomatic-Spark way: the snapshot store's append-only
directories (``crawl_order``, ``metrics``) are valid file-stream sources, so
monitoring/rollup consumers run as real ``readStream`` pipelines with
watermarks — on a cluster they tail the live crawl while rounds commit.

Used with ``Trigger.AvailableNow`` in tests (drain-what-exists, then stop);
on a real cluster the same code runs continuous micro-batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

# crawl_order rows augmented with an event-time column for watermarking
# (round start epoch + rank spacing — deterministic, derived from data)
STREAM_SCHEMA = StructType([
    StructField("rank", LongType()),
    StructField("fingerprint", StringType()),
    StructField("url_canon", StringType()),
    StructField("round", IntegerType()),
    StructField("host", StringType()),
    StructField("status", IntegerType()),
    StructField("depth", IntegerType()),
])


def crawl_order_stream(spark: SparkSession, run_dir: str,
                       round_wall_s: float = 8.0,
                       files_per_trigger: int = 8) -> DataFrame:
    """readStream over the append-only crawl_order table; synthesizes
    ``fetch_ts`` event time from (round, rank) so watermarking is
    deterministic (no wall clock in verified paths). Stateful consumers
    pass files_per_trigger=1 so each committed round is one micro-batch
    (the watermark advances round-by-round, closing sessions)."""
    src = (spark.readStream.schema(STREAM_SCHEMA)
           .option("maxFilesPerTrigger", files_per_trigger)
           .parquet(f"{run_dir}/data/crawl_order/*"))
    return src.withColumn(
        "fetch_ts",
        F.timestamp_seconds(
            F.lit(1_600_000_000)
            + F.col("round").cast("double") * F.lit(round_wall_s)
            + F.pmod(F.col("rank").cast("double"), F.lit(round_wall_s))))


def host_throughput(stream: DataFrame, window_s: int = 8,
                    late_s: int = 4) -> DataFrame:
    """Windowed per-host fetch/error rollup with a watermark — the
    streaming analogue of the engine's A1 metrics aggregation."""
    return (stream
            .withWatermark("fetch_ts", f"{late_s} seconds")
            .groupBy(F.window("fetch_ts", f"{window_s} seconds"), F.col("host"))
            .agg(F.count("*").alias("fetched"),
                 F.sum(F.when(F.col("status") >= 400, 1).otherwise(0))
                 .alias("errors"),
                 F.max("depth").alias("max_depth"))
            .select(F.col("window.start").cast(TimestampType()).alias("win_start"),
                    "host", "fetched", "errors", "max_depth"))


def run_available_now(agg: DataFrame, out_dir: str) -> None:
    """Drain everything currently committed and stop (test/audit mode);
    identical plan runs continuously on a cluster."""
    q = (agg.writeStream.outputMode("append")
         .trigger(availableNow=True)
         .option("checkpointLocation", f"{out_dir}/_chk")
         .format("parquet")
         .option("path", f"{out_dir}/out")
         .start())
    q.awaitTermination()


def host_sessions(stream: DataFrame, gap_s: int = 10,
                  late_s: int = 4) -> DataFrame:
    """Custom STATEFUL streaming operator (U1/Q5 extension, r2): per-host
    crawl-activity sessions via ``applyInPandasWithState`` — a session is
    a run of fetches for one host with no gap > ``gap_s`` of event time;
    closed sessions are emitted when the watermark passes session_end +
    gap (EventTimeTimeout) or when a later run within/after a batch
    closes them. Batches are split into gap-delimited runs internally
    (r3), so correctness does NOT depend on files_per_trigger=1 — a
    micro-batch spanning several rounds emits every interior session.

    This is the arbitrary-stateful-processing shape Spark reserves for
    logic windows can't express: the state (session start/end/count) lives
    in the state store, keyed by host, Arrow-batched in and out — no
    per-row Python at the Spark row level. Sessions still open at the end
    of an AvailableNow drain remain in state (they would emit on the next
    trigger of a continuous run) — tests assert on the CLOSED subset.
    """
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    out_schema = StructType([
        StructField("host", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_fetches", LongType()),
    ])
    state_schema = StructType([
        StructField("start", DoubleType()),
        StructField("last", DoubleType()),
        StructField("n", LongType()),
    ])

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        host = key[0]

        def emit(start, last, n):
            return pd.DataFrame({
                "host": [host],
                "session_start": [pd.Timestamp(start, unit="s")],
                "session_end": [pd.Timestamp(last, unit="s")],
                "n_fetches": [int(n)],
            })

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(start, last, n)
            return
        rows = pd.concat(list(pdfs))
        ts = rows["fetch_ts"].map(pd.Timestamp.timestamp).sort_values()
        # split the batch into gap-delimited RUNS (ADVICE r02: one
        # micro-batch can span multiple rounds under files_per_trigger>1,
        # so treating it as a single gap-free run silently merged
        # sessions separated by > gap_s)
        runs: list[tuple[float, float, int]] = []
        cur_s = cur_l = None
        cnt = 0
        for t in (float(x) for x in ts):
            if cur_s is None:
                cur_s = cur_l = t
                cnt = 1
            elif t - cur_l > gap_s:
                runs.append((cur_s, cur_l, cnt))
                cur_s = cur_l = t
                cnt = 1
            else:
                cur_l = t
                cnt += 1
        runs.append((cur_s, cur_l, cnt))
        if state.exists:
            s0, l0, n0 = state.get
            if runs[0][0] - l0 <= gap_s:
                runs[0] = (s0, max(l0, runs[0][1]), n0 + runs[0][2])
            else:
                runs.insert(0, (s0, l0, n0))
        *closed, last_run = runs
        state.update(last_run)
        state.setTimeoutTimestamp(int((last_run[1] + gap_s) * 1000))
        for r in closed:   # chronological order
            yield emit(*r)
        return

    return (stream
            .withWatermark("fetch_ts", f"{late_s} seconds")
            .groupBy("host")
            .applyInPandasWithState(
                fn, out_schema, state_schema, "append",
                GroupStateTimeout.EventTimeTimeout))
