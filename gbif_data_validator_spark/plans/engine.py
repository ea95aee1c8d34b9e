"""The staged validation engine — the reference's evaluator chain as
DataFrame passes.

Reference analog: EvaluationChain + DataFileProcessorMaster orchestration
(evaluator/EvaluationChain.java:69-71; processor/DataFileProcessorMaster.java:
128-176): Phase 0 constitution (can stop the chain), Phase 1 fan-out of
metadata / record-collection / per-split record evaluators, Phase 2 collector
merge + IndexableRules verdict. Here the actor fan-out is the Spark
scheduler; the collector merge is Catalyst partial/final aggregation; the
verdict is a filter on the blocking-check set
(evaluator/IndexableRules.java:22-33, reduce :54-61).

Passes (SURVEY.md §7.1):
  0 preflight (driver, no jobs)     — short-circuit on blocking findings
  1 record checks (narrow, 1 scan)  — violations DF
  2 uniqueness (salted) + referential (broadcast anti) + KS drift
  3 metrics (1 agg scan)
  4 report: counts, distinct-first samples, per-partition verdicts,
    checkpoint/lineage rows; resume prunes completed partitions.
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import BLOCKING_CHECKS, CheckId, ValidationReport
from ..operators.drift import drift_violations, ks_drift
from ..operators.metrics import issue_counts_by_partition, partitioned_profile
from ..operators.record_checks import partition_id_col, run_record_checks
from ..operators.referential import referential_violations
from ..operators.sampling import distinct_first_samples
from ..operators.uniqueness import uniqueness_violations
from ..sources.lang_dim import lang_dim
from . import checkpoint as cp
from .preflight import preflight

GLOBAL_PARTITION = "GLOBAL"


@dataclass
class EngineConfig:
    key_col: str = "url"
    check_extraction: bool = True
    n_buckets: int = 1
    n_salt: int = 16
    drift_threshold: float = 0.15
    max_samples: int = 10
    work_dir: str | None = None  # enables persisted violations + checkpoint/resume
    run_id: str = field(default_factory=lambda: uuid.uuid4().hex[:12])

    @property
    def violations_path(self) -> str | None:
        return os.path.join(self.work_dir, "violations") if self.work_dir else None

    @property
    def checkpoint_path(self) -> str | None:
        return os.path.join(self.work_dir, "checkpoint") if self.work_dir else None


class ValidationEngine:
    def __init__(self, spark: SparkSession, config: EngineConfig | None = None):
        self.spark = spark
        self.config = config or EngineConfig()

    # ------------------------------------------------------------------
    def build_violations(self, pages: DataFrame, dim: DataFrame) -> DataFrame:
        """Passes 1+2 as one lazy plan: record checks ∪ referential ∪
        salted uniqueness ∪ drift verdicts (unionByName on the violations
        contract — reference U1 mergeOnFilename,
        api/result/ValidationResultElement.java:103-117)."""
        c = self.config
        v1 = run_record_checks(
            pages, check_extraction=c.check_extraction, n_buckets=c.n_buckets, key_col=c.key_col
        )
        v2 = referential_violations(pages, dim, id_col=c.key_col)
        v3 = uniqueness_violations(pages, key_col=c.key_col, n_salt=c.n_salt)
        v4 = drift_violations(ks_drift(pages, threshold=c.drift_threshold))
        return v1.unionByName(v2).unionByName(v3).unionByName(v4)

    # ------------------------------------------------------------------
    def run(self, pages: DataFrame, dim: DataFrame | None = None) -> ValidationReport:
        c = self.config
        started = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
        dim = dim if dim is not None else lang_dim(self.spark)

        # Pass 0 — constitution; blocking finding stops everything
        # (ResourceConstitutionEvaluationChain.java:114-121 analog).
        findings = preflight(pages, key_col=c.key_col)
        blocking = [f for f in findings if f.blocking]
        if blocking:
            return ValidationReport(
                run_id=c.run_id,
                indexable=False,
                n_rows=0,
                n_violations=len(blocking),
                issue_counts={f.check_id: 1 for f in blocking},
                samples={
                    f.check_id: [{"expected": f.expected, "found": f.found}]
                    for f in blocking
                },
                error_code=CheckId.RESOURCE_INTEGRITY,
            )

        pages = pages.withColumn(
            "_partition_id",
            partition_id_col(F.col("warc_ts"), c.n_buckets, F.col(c.key_col)),
        )

        # Resume: prune completed partitions BEFORE any scan.
        done: list[str] = []
        if c.checkpoint_path:
            done = cp.completed_partitions(self.spark, c.checkpoint_path, c.run_id)
        work = pages
        skip_global = GLOBAL_PARTITION in done
        if done:
            work = pages.where(~F.col("_partition_id").isin([d for d in done]))

        # Passes 1+2 (lazy plan). Global checks (uniqueness over the full
        # key space, drift across all windows) must see ALL rows, so they
        # run over `pages`, not the pruned work-list — unless their GLOBAL
        # checkpoint already exists.
        per_partition_v = run_record_checks(
            work, check_extraction=c.check_extraction, n_buckets=c.n_buckets, key_col=c.key_col
        ).unionByName(referential_violations(work, dim, id_col=c.key_col))
        violations = per_partition_v
        if not skip_global:
            global_v = uniqueness_violations(pages, key_col=c.key_col, n_salt=c.n_salt)
            global_v = global_v.unionByName(
                drift_violations(ks_drift(pages, threshold=c.drift_threshold))
            )
            violations = violations.unionByName(global_v)

        # Persist violations FIRST (resume-correctness ordering), then
        # derive everything else from the durable copy.
        if c.violations_path:
            violations.write.mode("append").partitionBy("partition_id").parquet(
                c.violations_path
            )
            # replay idempotence: an interrupted run may have appended a
            # partition's violations without checkpointing it; the re-run
            # appends them again, so reads dedup exact tuples (map column is
            # not set-op comparable → dedup on its JSON form).
            raw = self.spark.read.parquet(c.violations_path)
            all_violations = (
                raw.withColumn("_rd", F.to_json("related_data"))
                .dropDuplicates(["url", "check_id", "expected", "found", "partition_id", "_rd"])
                .drop("_rd")
            )
        else:
            violations = violations.persist()
            all_violations = violations

        # Pass 4a — per-partition accounting. ONE aggregation job over the
        # (already materialized) violations yields the per-(partition, check)
        # counts; everything downstream — global issue counts, per-partition
        # verdicts, checkpoint rows — is derived driver-side from that tiny
        # result (#partitions × #checks rows). This mirrors the reference's
        # collector merge at the master (CollectorGroup.java:80-141) without
        # re-triggering distributed work per artifact.
        vc_rows = issue_counts_by_partition(all_violations).collect()

        # Pass 3 fused with row counting: ROLLUP(partition) profile — one
        # scan, one job emits per-partition n_rows/stats AND the grand-total
        # run-level profile (the NULL-partition row).
        prof_rows = partitioned_profile(work, "_partition_id").collect()
        rc_rows = [r for r in prof_rows if r["_partition_id"] is not None]
        # rollup over EMPTY input yields zero rows (no grand-total row, unlike
        # a plain global agg) — happens on an empty table or a fully-resumed
        # run whose work-list pruned every partition.
        grand = next((r for r in prof_rows if r["_partition_id"] is None), None)
        metrics = (
            {
                k: (list(v) if isinstance(v, list) else v)
                for k, v in grand.asDict().items()
                if k != "_partition_id"
            }
            if grand is not None
            else {"n_rows": 0}
        )
        finished = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)

        part_rows = {r["_partition_id"]: r.n_rows for r in rc_rows}
        by_part: dict[str, dict[str, int]] = {}
        issue_counts: dict[str, int] = {}
        for r in vc_rows:
            by_part.setdefault(r.partition_id, {})[r.check_id] = r.n
            issue_counts[r.check_id] = issue_counts.get(r.check_id, 0) + r.n

        cp_tuples = []
        for pid, n_rows_p in sorted(part_rows.items()):
            checks = by_part.get(pid, {})
            blocking = any(k in BLOCKING_CHECKS for k in checks)
            cp_tuples.append(
                (c.run_id, pid, "FAIL" if blocking else "PASS", n_rows_p,
                 sum(checks.values()), checks, started, finished)
            )
        if not skip_global:
            g_checks = by_part.get(GLOBAL_PARTITION, {})
            cp_tuples.append(
                (c.run_id, GLOBAL_PARTITION,
                 "FAIL" if any(k in BLOCKING_CHECKS for k in g_checks) else "PASS",
                 0, sum(g_checks.values()), g_checks, started, finished)
            )
        if c.checkpoint_path:
            from ..model import CHECKPOINT_SCHEMA

            cp.append_checkpoints(
                self.spark.createDataFrame(cp_tuples, schema=CHECKPOINT_SCHEMA),
                c.checkpoint_path,
            )

        # Pass 4b — distinct-first samples (window over the small violations DF).
        samples_rows = distinct_first_samples(all_violations, c.max_samples).collect()
        samples: dict[str, list[dict]] = {}
        for r in sorted(samples_rows, key=lambda r: (r.check_id, r.sample_rank)):
            samples.setdefault(r.check_id, []).append(
                {"url": r.url, "expected": r.expected, "found": r.found}
            )
        if c.checkpoint_path:
            cps = cp.read_checkpoints(self.spark, c.checkpoint_path)
            rows = cps.where(F.col("run_id") == c.run_id).collect()
            verdicts = {r.partition_id: r.status for r in rows}
            n_rows = sum(r.n_rows for r in rows)
            # resumed runs: fold previously-checkpointed partitions' counts
            # back into the report (all_violations already includes their
            # persisted violations, so issue_counts is complete; verdicts
            # and n_rows come from the checkpoint table)
        else:
            verdicts = {t[1]: t[2] for t in cp_tuples}
            n_rows = sum(part_rows.values())

        n_violations = sum(issue_counts.values())
        indexable = not any(k in BLOCKING_CHECKS for k in issue_counts)
        if not c.violations_path:
            violations.unpersist()
        return ValidationReport(
            run_id=c.run_id,
            indexable=indexable,
            n_rows=n_rows,
            n_violations=n_violations,
            issue_counts=issue_counts,
            samples=samples,
            metrics=metrics,
            partition_verdicts=verdicts,
        )
