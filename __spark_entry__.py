"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship operator (the window-ranked per-host
politeness dequeue — BASELINE.json:"north_star" flagship) on sf0.001.
``queries()``/``oracle_sql()`` expose the operator surface from SURVEY.md §2
plus the training-pipeline ops (dedup / similarity / text analysis); each
SQL-expressible entry is DuckDB-verified by the driver at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from crawlspark.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn, _ = QUERIES["frontier_dequeue"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; rows-only ops (xxhash64-based
    sketches: minhash/simhash; binary media) are deliberately omitted."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql}
