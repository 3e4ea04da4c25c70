"""crawlspark — a from-scratch PySpark-native crawl frontier & fetch scheduler.

Reproduces the query/data-processing capabilities of the reference Scrapy
hotel/restaurant crawler (see SURVEY.md; the reference snapshot is empty in
this sandbox, so semantics are pinned by BASELINE.json + public Scrapy
framework behavior, citation tiers per SURVEY.md §0).

Design: each scheduler round is one DataFrame job (BSP superstep); state
(frontier, seen set, bloom shards, documents, metrics, lineage) lives in
snapshot-committed parquet tables (Iceberg-compatible semantics); all hot
paths are native Spark SQL expressions or Arrow-vectorized pandas UDFs —
no per-row Python at the Spark row level, no RDDs.
"""

__version__ = "0.1.0"
