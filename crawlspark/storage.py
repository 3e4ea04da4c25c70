"""Snapshot-committed parquet catalog (SURVEY §2.8 C1).

Iceberg-compatible semantics without the Iceberg runtime (no jar in-sandbox,
SURVEY §0): every round commits by atomically renaming a manifest JSON into
``_snapshots/``; the manifest pins the EXACT parquet directory list of every
logical table plus the engine's scalar state (next_seq, next_rank, ...).
Readers only ever see committed manifests, so a killed run resumes from the
last manifest with no duplicate fetches and no torn state (tested in
tests/test_resume.py).

Table layouts:
  * ``frontier``, ``host_state``, ``seen_shards`` — full rewrite per round
    (the mutable queue/state; on a real cluster frontier becomes an Iceberg
    table with delta + compaction, same manifest contract).
  * ``seen``, ``documents``, ``crawl_order``, ``metrics``, ``lineage`` —
    append-only deltas; the manifest stores the cumulative path list.

On a real cluster swap this class for an Iceberg catalog adapter — the
engine only uses read()/write_round()/commit()/latest().
"""

from __future__ import annotations

import json
import os
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FULL_REWRITE = {"frontier", "host_state", "seen_shards"}
APPEND_ONLY = {"seen", "documents", "crawl_order", "metrics", "lineage"}


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.snap_dir, exist_ok=True)

    # -- manifest ----------------------------------------------------------
    def latest(self) -> dict | None:
        snaps = sorted(f for f in os.listdir(self.snap_dir)
                       if f.startswith("round-") and f.endswith(".json"))
        if not snaps:
            return None
        with open(os.path.join(self.snap_dir, snaps[-1])) as f:
            return json.load(f)

    def commit(self, round_no: int, state: dict,
               tables: dict[str, list[str]]) -> None:
        manifest = {"round": round_no, "state": state, "tables": tables}
        tmp = os.path.join(self.snap_dir, f".tmp-round-{round_no:06d}.json")
        final = os.path.join(self.snap_dir, f"round-{round_no:06d}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)  # atomic commit point

    # -- table IO ----------------------------------------------------------
    def table_path(self, table: str, round_no: int) -> str:
        return os.path.join(self.root, "data", table, f"r{round_no:06d}")

    def write_round(self, df: DataFrame, table: str, round_no: int) -> str:
        path = self.table_path(table, round_no)
        df.write.mode("overwrite").parquet(path)
        return path

    def read(self, spark: SparkSession, manifest: dict | None, table: str,
             schema: StructType) -> DataFrame:
        paths: Iterable[str] = (manifest or {}).get("tables", {}).get(table, [])
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*paths)
