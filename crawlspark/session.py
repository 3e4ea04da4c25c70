"""SparkSession factory with the engine's standard tuning.

Conf rationale (SURVEY §4.2): AQE on (skew-join split + partition
coalescing), Arrow on (pandas-UDF transport), shuffle partitions sized to
cores (the sandbox is local[N]; on a real cluster set this to 2-3x total
cores via spark-submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(app: str = "crawlspark", cores: int | None = None,
                shuffle_partitions: int | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = shuffle_partitions or max(cores, 8)
    return (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("CRAWLSPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
