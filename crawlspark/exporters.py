"""O1 feed-export formats (r4, VERDICT r03 missing #3): the ``-o items.jl``
surface a Scrapy user expects [S:scrapy/exporters.py::JsonLinesItemExporter,
CsvItemExporter].

The documents table (doc_id, spans, canonical_url) exports to JSONLines or
CSV in CRAWL ORDER (rank ascending — Scrapy appends items as they are
scraped, so feed order is scrape order; the rank join reconstructs it
exactly, including across resumed runs). Span structure:

* JSONLines: one JSON object per line via Spark's native json writer —
  ``{"rank": .., "doc_id": "..", "canonical_url": "..", "spans": [...]}``
  with spans as a JSON array of {kind, text, media_ref, offset} objects in
  document order. Null fields are kept (explicit ``ignoreNullFields=false``)
  so a re-read without a schema still sees every column.
* CSV: spans serialize to ONE JSON-string cell (`to_json`) — CSV cannot
  carry nested arrays natively, and a lossless, order-preserving string is
  what CsvItemExporter does for multi-valued fields (joined serialization).

Determinism/scale: ``single_file=True`` (default, the sandbox/test mode)
coalesces to one part file with a global ``orderBy(rank)`` — byte-stable
output for golden tests. ``single_file=False`` is the 100 TB path: rows are
range-partitioned by Spark's sort into many part files, each internally
rank-sorted (``sortWithinPartitions`` after a repartitionByRange keeps the
global order across lexically-ordered part files without a single-reducer
bottleneck).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_EXPORT_COLS = ["rank", "doc_id", "canonical_url", "spans"]


def documents_export_df(documents: DataFrame,
                        crawl_order: DataFrame) -> DataFrame:
    """Join each document to the rank of the ONE fetch that produced it
    (doc_id == fingerprint; (doc_id, round) names a single successful
    attempt — crawl_order also carries the FAILED attempts of a retried
    fingerprint, each with its own rank, and a seen-TTL re-crawl carries
    one document row per re-fetch). A doc_id fetched more than once
    exports one item per fetch, like a spider yielding an item per
    response."""
    ranks = crawl_order.select(F.col("fingerprint").alias("doc_id"),
                               "round", "rank")
    return (documents.join(ranks, ["doc_id", "round"])
            .select("rank", "doc_id", "canonical_url", "spans"))


def write_feed(export: DataFrame, out_path: str, fmt: str = "jsonlines",
               single_file: bool = True) -> None:
    if fmt not in ("jsonlines", "csv"):
        raise ValueError(f"unsupported feed format: {fmt!r}")
    if fmt == "csv":
        export = export.select(
            "rank", "doc_id", "canonical_url",
            F.to_json("spans").alias("spans_json"))
    if single_file:
        # one partition, sorted inside it == a global order with no
        # reliance on post-sort coalesce order preservation
        out = export.repartition(1).sortWithinPartitions("rank")
    else:
        out = (export.repartitionByRange("rank")
               .sortWithinPartitions("rank"))
    if fmt == "jsonlines":
        (out.write.mode("overwrite")
         .option("ignoreNullFields", "false").json(out_path))
    else:
        (out.write.mode("overwrite")
         .option("header", "true").option("escape", '"').csv(out_path))
