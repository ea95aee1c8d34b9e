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

from ..model import CHECKPOINT_SCHEMA, PROFILE_SCHEMA, SKETCH_SCHEMA


def read_checkpoints(spark: SparkSession, path: str) -> DataFrame:
    """All checkpoint rows, deduped to the latest per (run_id, partition_id)."""
    if not _exists(spark, path):
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)
    df = spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
    w = Window.partitionBy("run_id", "partition_id").orderBy(F.col("finished_at").desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def completed_partitions_all_runs(spark: SparkSession, path: str) -> list[str]:
    """Partition ids validated by ANY run in this work_dir (excluding the
    per-run GLOBAL rows) — the incremental-chain prune set: the work_dir is
    one table's validation lineage, so every historically-validated window
    is history regardless of which run in the chain validated it.

    The UNKNOWN partition (null/invalid warc_ts rows — and its UNKNOWN-b*
    bucketed variants) is never in the prune set: every append can add new
    null-ts rows, which all land in UNKNOWN forever, so the append-only-
    new-windows assumption is structurally false for that one bucket. A
    pruned UNKNOWN would mean newly appended malformed records — exactly
    what the engine exists to catch — are never validated."""
    cps = read_checkpoints(spark, path)
    rows = (
        cps.where(
            F.col("status").isin("PASS", "FAIL")
            & ~F.col("partition_id").startswith("stream:")
            & ~F.col("partition_id").startswith("UNKNOWN")
        )
        .select("partition_id")
        .distinct()
        .collect()
    )
    return [r.partition_id for r in rows]


def latest_validators(spark: SparkSession, path: str) -> dict[str, str]:
    """partition_id → run_id of the run that most recently validated it
    (by finished_at; PASS/FAIL rows only, per-run GLOBAL and streaming-batch
    rows excluded). The incremental read filter uses this to inherit ONLY
    violation rows written by a window's current validator — an older run's
    rows for a since-revalidated window are stale (the finding may have been
    fixed) and must not fold into the report."""
    cps = read_checkpoints(spark, path)
    rows = (
        cps.where(
            F.col("status").isin("PASS", "FAIL")
            & ~F.col("partition_id").startswith("stream:")
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("partition_id").orderBy(
                    F.col("finished_at").desc(), F.col("run_id")
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select("partition_id", "run_id")
        .collect()
    )
    return {r.partition_id: r.run_id for r in rows}


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


def append_sketches(spark: SparkSession, tuples: list[tuple], path: str) -> None:
    """Persist per-window drift-sketch rows (SKETCH_SCHEMA tuples). Append-
    only like the checkpoint table; replays dedup at read time."""
    if tuples:
        spark.createDataFrame(tuples, schema=SKETCH_SCHEMA).write.mode(
            "append"
        ).parquet(path)


def append_profiles(spark: SparkSession, tuples: list[tuple], path: str) -> None:
    """Persist per-window profile-state rows (PROFILE_SCHEMA tuples)."""
    if tuples:
        spark.createDataFrame(tuples, schema=PROFILE_SCHEMA).write.mode(
            "append"
        ).parquet(path)


def latest_window_profiles(spark: SparkSession, path: str) -> dict:
    """partition_id → profile-state dict (n_rows, counts, hlls, len_q,
    len_avg) from each window's latest validator (finished_at desc, run_id
    tiebreak). Driver-side: #windows rows of KB-sized state."""
    if not _exists(spark, path):
        return {}
    df = spark.read.schema(PROFILE_SCHEMA).parquet(path)
    w = Window.partitionBy("partition_id").orderBy(
        F.col("finished_at").desc(), F.col("run_id")
    )
    rows = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "run_id", "finished_at")
        .collect()
    )
    return {
        r.partition_id: {
            "n_rows": r.n_rows or 0,
            "counts": dict(r.counts or {}),
            "hlls": dict(r.hlls or {}),
            "len_q": {k: list(v) for k, v in (r.len_q or {}).items()},
            "len_avg": dict(r.len_avg or {}),
        }
        for r in rows
    }


def latest_window_sketches(spark: SparkSession, path: str) -> dict:
    """partition_id → (drift_n, drift_q) from the run that most recently
    wrote the window's sketch (finished_at desc, run_id tiebreak — the same
    latest-validator discipline as the violations read filter). Driver-side
    dict: the sketch table has #windows × #runs rows, tiny even at 100 TB."""
    if not _exists(spark, path):
        return {}
    df = spark.read.schema(SKETCH_SCHEMA).parquet(path)
    w = Window.partitionBy("partition_id").orderBy(
        F.col("finished_at").desc(), F.col("run_id")
    )
    rows = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("partition_id", "drift_n", "drift_q")
        .collect()
    )
    return {
        r.partition_id: (
            r.drift_n or 0,
            list(r.drift_q) if r.drift_q is not None else None,
        )
        for r in rows
    }


def build_checkpoint_tuples(
    run_id: str,
    counts_by_partition: dict[str, dict[str, int]],
    n_rows_by_partition: dict[str, int],
    started,
    finished,
    blocking: frozenset | None = None,
) -> list[tuple]:
    """CHECKPOINT_SCHEMA-shaped rows from per-partition check counts: the
    single definition of the blocking-verdict fold and tuple order, shared
    by the batch engine and the streaming sink (a drifting copy of this
    shape is how lineage tables rot). ``blocking`` defaults to the built-in
    set; the engine passes its config-aware set (custom blocking checks)."""
    from ..model import BLOCKING_CHECKS

    if blocking is None:
        blocking = BLOCKING_CHECKS
    out = []
    for pid in sorted(set(counts_by_partition) | set(n_rows_by_partition)):
        checks = counts_by_partition.get(pid, {})
        out.append(
            (
                run_id,
                pid,
                "FAIL" if any(k in blocking for k in checks) else "PASS",
                n_rows_by_partition.get(pid, 0),
                sum(checks.values()),
                checks,
                started,
                finished,
            )
        )
    return out


def ensure_partition_scheme(spark: SparkSession, work_dir: str, n_buckets: int) -> None:
    """The first run against a work_dir records its partition scheme in
    ``{work_dir}/_scheme``; every later run (resume or incremental) must use
    the same ``n_buckets`` — a silent mismatch would make pruning skip
    never-validated bucket slices (format-only id checks can't catch a
    4-bucket baseline read with 2 buckets). Raises ValueError on mismatch."""
    p = os.path.join(work_dir, "_scheme")
    recorded = _read_scheme(spark, p)
    if recorded is None:
        # crash-safe write: an interrupted first run must not leave a
        # half-written _scheme that bricks the work_dir, and concurrent
        # first runs must converge — write to a temp dir, then promote with
        # an atomic rename (fails if a concurrent writer won; re-read then).
        import uuid as _uuid

        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            # exists but unreadable/empty = an interrupted writer's garbage;
            # remove it, else rename-into-existing-dir would nest the temp
            # dir inside instead of replacing it
            fs.delete(jpath, True)
        tmp = os.path.join(work_dir, f"_scheme.tmp-{_uuid.uuid4().hex[:8]}")
        spark.createDataFrame([(n_buckets,)], "n_buckets int").coalesce(1).write.parquet(tmp)
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath):
            fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)  # lost the race
        recorded = _read_scheme(spark, p)
    if recorded is not None and recorded != n_buckets:
        raise ValueError(
            f"work_dir {work_dir!r} was written with a different partition "
            f"scheme (n_buckets={recorded}); this run uses "
            f"n_buckets={n_buckets} — pruning would be incorrect. "
            f"Rerun with n_buckets={recorded}."
        )


def _read_scheme(spark: SparkSession, p: str) -> int | None:
    """n_buckets from a _scheme dir; None if absent, empty, or unreadable
    (an interrupted writer's leftovers count as absent, not as corruption)."""
    if not _exists(spark, p):
        return None
    try:
        rows = spark.read.parquet(p).collect()
        return rows[0].n_buckets if rows else None
    except Exception:
        return None


def _exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check through the Hadoop FS API — the
    work_dir is an object-store URI (s3://, hdfs://, abfs://) in production,
    where a driver-local os.path check would always be False (silently
    disabling resume and emptying the final report)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.exists(hpath)
