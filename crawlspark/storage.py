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

FULL_REWRITE = {"frontier", "host_state", "cookie_state", "seen_shards"}
APPEND_ONLY = {"seen", "documents", "crawl_order", "metrics", "lineage",
               "frontier_delta"}


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


class IcebergSnapshotStore:
    """Iceberg-backed implementation of the SnapshotStore interface for real
    clusters (north_rule: "frontier kept in Iceberg").

    SAME four-method contract the engine uses (write_round / read / commit /
    latest); tables live under ``<catalog>.<namespace>`` with the round
    manifest kept in a one-row ``_manifests`` table appended atomically —
    Iceberg's snapshot isolation gives the same torn-state-free resume as
    SnapshotStore's rename. Readers time-travel via the path list pinned in
    the manifest row (``VERSION AS OF`` per table snapshot id).

    NOT constructible in this sandbox: no iceberg-spark-runtime jar is on
    the classpath (verified at survey time, SURVEY.md §0) and there is no
    network to fetch one — the constructor checks and raises with guidance.
    The parquet SnapshotStore above is the tested, semantics-equivalent
    default everywhere else.
    """

    def __init__(self, spark: SparkSession, catalog: str, namespace: str):
        # the catalog impl must be configured AND its class loadable —
        # py4j resolves JVM attributes lazily, so probe via the conf
        impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
        if not impl or "iceberg" not in impl.lower():
            raise RuntimeError(
                "Iceberg runtime not on the Spark classpath. On a real "
                "cluster submit with --packages org.apache.iceberg:"
                "iceberg-spark-runtime-4.0_2.13:<ver> and configure "
                f"spark.sql.catalog.{catalog}=org.apache.iceberg.spark."
                "SparkCatalog. In this sandbox use SnapshotStore.")
        self.spark = spark
        self.prefix = f"{catalog}.{namespace}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.prefix}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.prefix}._manifests "
            "(round INT, manifest STRING) USING iceberg")

    def write_round(self, df: DataFrame, table: str, round_no: int) -> str:
        name = f"{self.prefix}.{table}"
        if table in FULL_REWRITE:
            df.writeTo(name).using("iceberg").createOrReplace()
        else:
            try:
                df.writeTo(name).append()
            except Exception:   # first round: table does not exist yet
                df.writeTo(name).using("iceberg").create()
        snap = self.spark.sql(
            f"SELECT snapshot_id FROM {name}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1").collect()[0][0]
        return f"{name}@{snap}"

    def commit(self, round_no: int, state: dict, tables: dict) -> None:
        import json as _json
        payload = _json.dumps({"round": round_no, "state": state,
                               "tables": tables})
        self.spark.createDataFrame(
            [(round_no, payload)], "round int, manifest string"
        ).writeTo(f"{self.prefix}._manifests").append()

    def latest(self) -> dict | None:
        import json as _json
        rows = self.spark.sql(
            f"SELECT manifest FROM {self.prefix}._manifests "
            "ORDER BY round DESC LIMIT 1").collect()
        return _json.loads(rows[0][0]) if rows else None

    def read(self, spark: SparkSession, manifest: dict | None, table: str,
             schema: StructType) -> DataFrame:
        refs = (manifest or {}).get("tables", {}).get(table, [])
        if not refs:
            return spark.createDataFrame([], schema)
        # the newest pinned snapshot already CONTAINS all earlier appends
        # (unlike the parquet store's per-round path list), so read just it
        name, snap = refs[-1].rsplit("@", 1)
        return spark.read.option("snapshot-id", snap).table(name)
