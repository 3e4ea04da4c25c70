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
    IntegerType, LongType, StringType, StructField, StructType,
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
                       round_wall_s: float = 8.0) -> DataFrame:
    """readStream over the append-only crawl_order table; synthesizes
    ``fetch_ts`` event time from (round, rank) so watermarking is
    deterministic (no wall clock in verified paths)."""
    src = (spark.readStream.schema(STREAM_SCHEMA)
           .option("maxFilesPerTrigger", 8)
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
