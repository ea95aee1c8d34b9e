"""Compact + vacuum maintenance: future reads must be bit-identical, file
counts must drop, and superseded/dead rows must be gone."""

from __future__ import annotations

import datetime as dt

from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine
from gbif_data_validator_spark.plans.maintenance import (
    compact_violations,
    latest_finished_run,
)

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _month_rows(month, n=20):
    rows = [
        (f"https://m{month}.example/{i}", dt.datetime(2024, month, 10), None, "t", "en")
        for i in range(n)
    ] + [("", dt.datetime(2024, month, 11), None, "t", "en")]  # 1 KEY_EMPTY/month
    if month == 1:
        # a persistent duplicate: EVERY run's global uniqueness pass
        # re-writes its rows into the 2024-01 partition dir — the file and
        # dead-row accumulation compaction exists to clean up
        rows.append(("https://m1.example/0", dt.datetime(2024, 1, 12), None, "t", "en"))
    return rows


def _chain(spark, wd):
    """A(m1) → B(m1+2) → C(m1+2+3); returns (full table, C's report)."""
    t1 = spark.createDataFrame(_month_rows(1), SCHEMA)
    t12 = t1.unionByName(spark.createDataFrame(_month_rows(2), SCHEMA))
    t123 = t12.unionByName(spark.createDataFrame(_month_rows(3), SCHEMA))
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(t1)
    ValidationEngine(
        spark,
        EngineConfig(check_extraction=False, work_dir=wd, run_id="B", baseline_run_id="A"),
    ).run(t12)
    rep = ValidationEngine(
        spark,
        EngineConfig(check_extraction=False, work_dir=wd, run_id="C", baseline_run_id="B"),
    ).run(t123)
    return t123, rep


def _report_key(rep):
    return (rep.issue_counts, dict(rep.partition_verdicts), rep.n_violations, rep.n_rows)


def test_compact_preserves_future_incremental_reads(spark, tmp_path):
    """Identical chains in two work_dirs; one compacted+vacuumed. The next
    incremental run must produce identical reports from both."""
    wd_plain, wd_comp = str(tmp_path / "plain"), str(tmp_path / "comp")
    t123, _ = _chain(spark, wd_plain)
    _chain(spark, wd_comp)

    stats = compact_violations(spark, wd_comp, vacuum=True)
    assert stats["n_files_after"] < stats["n_files_before"]
    assert stats["n_rows_after"] < stats["n_rows_before"]  # dead rows gone

    t1234 = t123.unionByName(spark.createDataFrame(_month_rows(4), SCHEMA))
    reps = [
        ValidationEngine(
            spark,
            EngineConfig(
                check_extraction=False, work_dir=wd, run_id="D", baseline_run_id="C"
            ),
        ).run(t1234)
        for wd in (wd_plain, wd_comp)
    ]
    assert _report_key(reps[0]) == _report_key(reps[1])
    assert reps[1].issue_counts["KEY_EMPTY"] == 4  # one inherited per month


def test_compact_preserves_latest_run_resume(spark, tmp_path):
    """Re-running the LATEST run_id after vacuum reproduces its report
    (older run_ids are documented as unsupported post-vacuum)."""
    wd = str(tmp_path / "wd")
    t123, rep_c = _chain(spark, wd)
    assert latest_finished_run(spark, wd + "/checkpoint") == "C"
    compact_violations(spark, wd, vacuum=True)
    rep_c2 = ValidationEngine(
        spark,
        EngineConfig(check_extraction=False, work_dir=wd, run_id="C", baseline_run_id="B"),
    ).run(t123)
    assert _report_key(rep_c) == _report_key(rep_c2)


def test_compact_without_vacuum_keeps_rows(spark, tmp_path):
    wd = str(tmp_path / "wd")
    _chain(spark, wd)
    stats = compact_violations(spark, wd, vacuum=False)
    assert stats["n_rows_after"] == stats["n_rows_before"]
    assert stats["n_files_after"] < stats["n_files_before"]


def test_vacuum_keeps_streamed_rows_until_batch_revalidates(spark, tmp_path):
    """Streaming runs have only stream:* checkpoint lineage (excluded from
    latest_validators), but their violation rows live under REAL window
    ids: vacuum must keep them while the stream is a window's only
    validator, and drop them once a batch run revalidates the window."""
    from gbif_data_validator_spark.streaming import validate_stream as vs

    wd = str(tmp_path / "wd")
    land = str(tmp_path / "land")
    # month-1 landing zone with one KEY_EMPTY violation
    spark.createDataFrame(
        [("https://s.example/1", dt.datetime(2024, 1, 5), None, "t", "en"),
         ("", dt.datetime(2024, 1, 6), None, "t", "en")],
        SCHEMA,
    ).write.parquet(land)
    stream = vs.read_pages_stream(spark, land)
    vs.stream_validate_to_work_dir(stream, wd, run_id="s1", check_extraction=False)

    # a later BATCH run on month 2 only — becomes the latest finished run
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="B")
    ).run(spark.createDataFrame(_month_rows(2), SCHEMA))

    compact_violations(spark, wd, vacuum=True)
    live = spark.read.parquet(wd + "/violations")
    jan = live.where("partition_id = '2024-01'").collect()
    assert len(jan) == 1 and jan[0]["check_id"] == "KEY_EMPTY"  # streamed row kept

    # batch backfill revalidates month 1 with CLEAN data → stream's stale
    # copy is superseded and vacuums away
    clean_m1 = spark.createDataFrame(
        [(f"https://c.example/{i}", dt.datetime(2024, 1, 7), None, "t", "en")
         for i in range(5)],
        SCHEMA,
    )
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="C")
    ).run(clean_m1)
    compact_violations(spark, wd, vacuum=True)
    assert (
        spark.read.parquet(wd + "/violations")
        .where("partition_id = '2024-01'")
        .count()
        == 0
    )


def test_vacuum_keeps_stream_rows_appended_after_batch_validation(spark, tmp_path):
    """Reverse order: a window batch-validated FIRST, then a stream appends
    new rows into it — the streamed findings cover rows the batch never
    saw and must survive vacuum (supersede is timestamp-aware, not just
    window-membership)."""
    from gbif_data_validator_spark.streaming import validate_stream as vs

    wd = str(tmp_path / "wd")
    # batch validates month 1 (clean)
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="B")
    ).run(
        spark.createDataFrame(
            [(f"https://b.example/{i}", dt.datetime(2024, 1, 5), None, "t", "en")
             for i in range(5)],
            SCHEMA,
        )
    )
    # stream later appends a violating row into the SAME window
    land = str(tmp_path / "land")
    spark.createDataFrame(
        [("", dt.datetime(2024, 1, 20), None, "t", "en")], SCHEMA
    ).write.parquet(land)
    vs.stream_validate_to_work_dir(
        vs.read_pages_stream(spark, land), wd, run_id="s2", check_extraction=False
    )

    compact_violations(spark, wd, vacuum=True)
    jan = spark.read.parquet(wd + "/violations").where(
        "partition_id = '2024-01'"
    ).collect()
    assert len(jan) == 1 and jan[0]["check_id"] == "KEY_EMPTY"


def test_compact_missing_dir_is_noop(spark, tmp_path):
    assert compact_violations(spark, str(tmp_path / "nope")) == {
        "skipped": "no violations dir"
    }


def test_vacuum_refuses_without_checkpoint_lineage(spark, tmp_path):
    """Violations with no checkpoint table: vacuum can't tell live rows
    from dead — it must degrade to compact-only, never delete."""
    wd = str(tmp_path / "wd")
    spark.createDataFrame(
        [("u1", "KEY_EMPTY", "e", "f", {}, "2024-01", "orphan-run")],
        "url string, check_id string, expected string, found string, "
        "related_data map<string,string>, partition_id string, _run_id string",
    ).write.partitionBy("partition_id").parquet(wd + "/violations")
    stats = compact_violations(spark, wd, vacuum=True)
    assert stats["vacuum_skipped"] == "no checkpoint lineage in work_dir"
    assert stats["n_rows_after"] == stats["n_rows_before"] == 1
    assert stats["vacuumed"] is False
