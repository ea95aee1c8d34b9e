"""Checkpoint / lineage table + resume protocol (FIXTURES.md F4).

Reference analog: JobStorage persisting every JobStatusResponse per jobId
(jobserver/impl/FileJobStorage.java:53-133) and the master's per-split
DataWorkResult accounting (processor/DataFileProcessorMaster.java:282-343).

Protocol (SURVEY.md §7.4 "Resume correctness"):
  1. a partition's violations are durably appended FIRST,
  2. then its checkpoint row (run_id, partition_id, status, counts, lineage)
     is appended — so a checkpoint row implies its violations exist;
  3. resume reads completed partition_ids for the run and prunes the
     work-list BEFORE the scan (partition filter on the derived partition
     column → at cluster scale this is Iceberg partition pruning, here a
     pushed-down predicate). Replays are idempotent: re-validated partitions
     overwrite by (run_id, partition_id) dedup at read time (latest wins).

Storage is a plain parquet directory (Iceberg-shaped: append-only, keyed by
(run_id, partition_id)); swapping in a real Iceberg catalog changes only
``_write``/``read_checkpoints``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..model import CHECKPOINT_SCHEMA


def read_checkpoints(spark: SparkSession, path: str) -> DataFrame:
    """All checkpoint rows, deduped to the latest per (run_id, partition_id)."""
    if not _exists(path):
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)
    df = spark.read.parquet(path)
    w = Window.partitionBy("run_id", "partition_id").orderBy(F.col("finished_at").desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def completed_partitions(spark: SparkSession, path: str, run_id: str) -> list[str]:
    """Partition ids already validated for this run (driver-side list; the
    partition universe is small — months × buckets — even at 100 TB)."""
    cps = read_checkpoints(spark, path)
    rows = (
        cps.where((F.col("run_id") == run_id) & F.col("status").isin("PASS", "FAIL"))
        .select("partition_id")
        .collect()
    )
    return [r.partition_id for r in rows]


def append_checkpoints(checkpoint_rows: DataFrame, path: str) -> None:
    checkpoint_rows.write.mode("append").parquet(path)


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
