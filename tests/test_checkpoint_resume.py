"""Checkpoint / resume protocol (FIXTURES.md F4): an interrupted run
revalidates only unvalidated partitions and the final report matches an
uninterrupted run."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.plans import checkpoint as cp
from gbif_data_validator_spark.plans.engine import (
    GLOBAL_PARTITION,
    EngineConfig,
    ValidationEngine,
)


def test_checkpoint_rows_written(spark, pages, tmp_path):
    cfg = EngineConfig(check_extraction=False, work_dir=str(tmp_path / "w1"), run_id="r1")
    rep = ValidationEngine(spark, cfg).run(pages.drop("expected_issue"))
    cps = cp.read_checkpoints(spark, cfg.checkpoint_path)
    rows = cps.collect()
    assert {r.run_id for r in rows} == {"r1"}
    parts = {r.partition_id for r in rows}
    assert GLOBAL_PARTITION in parts
    # every month partition got a verdict and row counts sum to the table
    assert sum(r.n_rows for r in rows) == pages.count()
    by_status = {r.partition_id: r.status for r in rows}
    assert by_status == rep.partition_verdicts


def test_resume_skips_completed_partitions(spark, pages, tmp_path):
    """Simulate interruption: pre-checkpoint two partitions as done, then run
    — the engine must not re-emit violations for them, and the combined
    report must equal the uninterrupted one."""
    pages = pages.drop("expected_issue")
    # uninterrupted baseline
    base_cfg = EngineConfig(check_extraction=False, work_dir=str(tmp_path / "base"), run_id="rb")
    base = ValidationEngine(spark, base_cfg).run(pages)

    # interrupted run: first validate ONLY two months by pre-seeding
    # checkpoints for everything else... instead run fully, then delete two
    # partitions' checkpoints and violations to simulate the kill, and re-run.
    work = str(tmp_path / "resume")
    cfg = EngineConfig(check_extraction=False, work_dir=work, run_id="rr")
    eng = ValidationEngine(spark, cfg)
    eng.run(pages)

    cps = cp.read_checkpoints(spark, cfg.checkpoint_path)
    all_parts = [r.partition_id for r in cps.collect()]
    victims = sorted(p for p in all_parts if p not in (GLOBAL_PARTITION, "UNKNOWN"))[:2]

    import shutil, os
    # drop the victims' checkpoint rows (rewrite table without them) and
    # their violations directories — as if the run died before writing them
    kept = spark.read.parquet(cfg.checkpoint_path).where(~F.col("partition_id").isin(victims))
    kept_rows = kept.collect()
    shutil.rmtree(cfg.checkpoint_path)
    spark.createDataFrame(kept_rows, schema=kept.schema).write.parquet(cfg.checkpoint_path)
    for v in victims:
        d = os.path.join(cfg.violations_path, f"partition_id={v}")
        if os.path.isdir(d):
            shutil.rmtree(d)

    rep2 = ValidationEngine(spark, cfg).run(pages)

    # resumed report equals the uninterrupted one (counts + verdicts + rows)
    assert rep2.issue_counts == base.issue_counts
    assert rep2.partition_verdicts == base.partition_verdicts
    assert rep2.n_rows == base.n_rows

    # and the re-run only validated the two victim partitions: checkpoint
    # table now has exactly one row per partition except victims (two rows
    # deduped to latest) — verify via raw (non-deduped) storage
    raw = spark.read.parquet(cfg.checkpoint_path)
    per_part = {r.partition_id: r.n for r in raw.groupBy("partition_id").agg(F.count("*").alias("n")).collect()}
    for v in victims:
        assert per_part[v] == 1  # rewritten once by the resume
    n_multi = [p for p, n in per_part.items() if n > 1]
    assert set(n_multi) <= {GLOBAL_PARTITION}


def test_rerun_completed_run_is_noop(spark, pages, tmp_path):
    """Re-running a FINISHED run_id prunes every partition (empty work-list)
    and must still produce the identical report — the rollup-profile path
    must tolerate zero rows (Spark's rollup on empty input emits no
    grand-total row)."""
    cfg = EngineConfig(check_extraction=False, work_dir=str(tmp_path / "w"), run_id="rn")
    src = pages.drop("expected_issue")
    rep1 = ValidationEngine(spark, cfg).run(src)
    rep2 = ValidationEngine(spark, cfg).run(src)
    assert rep2.issue_counts == rep1.issue_counts
    assert rep2.n_rows == rep1.n_rows
    assert rep2.partition_verdicts == rep1.partition_verdicts


def test_empty_input_runs_clean(spark):
    from gbif_data_validator_spark.model import PAGES_SCHEMA

    empty = spark.createDataFrame([], schema=PAGES_SCHEMA)
    rep = ValidationEngine(spark, EngineConfig(check_extraction=False)).run(empty)
    assert rep.n_rows == 0
    assert rep.indexable
    assert rep.issue_counts == {}


def test_bucketed_partitions(spark, pages, tmp_path):
    """n_buckets > 1 subdivides each warc_ts month into url-hash buckets —
    the checkpoint/verdict unit for months too large to validate atomically.
    Per-row check counts must be independent of the partition granularity."""
    src = pages.drop("expected_issue")
    cfg = EngineConfig(
        check_extraction=False, n_buckets=4,
        work_dir=str(tmp_path / "wb"), run_id="rb4",
    )
    rep = ValidationEngine(spark, cfg).run(src)
    bucketed = [p for p in rep.partition_verdicts if "-b" in p]
    assert bucketed, rep.partition_verdicts
    assert rep.n_rows == src.count()

    plain = ValidationEngine(spark, EngineConfig(check_extraction=False)).run(src)
    for check in ["KEY_EMPTY", "URL_MALFORMED", "WARC_TS_INVALID",
                  "WARC_TS_UNLIKELY", "TEXT_EMPTY", "LANG_UNKNOWN",
                  "RECORD_NOT_UNIQUELY_IDENTIFIED"]:
        assert rep.issue_counts.get(check) == plain.issue_counts.get(check), check

    # resume with the same run_id is a no-op at bucket granularity too
    rep2 = ValidationEngine(spark, cfg).run(src)
    assert rep2.partition_verdicts == rep.partition_verdicts
    assert rep2.issue_counts == rep.issue_counts


def test_incremental_validation_with_baseline_run(spark, tmp_path):
    """Append-only crawl: run B with baseline_run_id=A revalidates only the
    NEW warc_ts windows; A's windows are pruned, but the global uniqueness
    pass still sees the whole table (cross-run duplicates must surface)."""
    import datetime as dt

    from gbif_data_validator_spark.model import CheckId
    from gbif_data_validator_spark.plans import checkpoint as cp
    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

    wd = str(tmp_path / "inc")

    def page(url, month, text="hello world"):
        return (url, dt.datetime(2024, month, 15), None, text, "en")

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    old = spark.createDataFrame(
        [page(f"https://a.example/{i}", 1 + i % 2) for i in range(40)], schema
    )
    # run A validates months 1-2
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(old)
    done_a = cp.completed_partitions(spark, wd + "/checkpoint", "A")
    assert {"2024-01", "2024-02", "GLOBAL"} <= set(done_a)

    # month 3 appends, including a cross-run duplicate of an old url
    new = old.unionByName(
        spark.createDataFrame(
            [page("https://a.example/0", 3), page("https://b.example/new", 3)], schema
        )
    )
    report = ValidationEngine(
        spark,
        EngineConfig(
            check_extraction=False, work_dir=wd, run_id="B", baseline_run_id="A"
        ),
    ).run(new)
    done_b = cp.completed_partitions(spark, wd + "/checkpoint", "B")
    # B checkpointed only the new window (plus its own GLOBAL)
    assert "2024-03" in done_b and "2024-01" not in done_b and "2024-02" not in done_b
    # the cross-run duplicate WAS caught by the rerun global pass
    assert report.issue_counts.get(CheckId.RECORD_NOT_UNIQUELY_IDENTIFIED, 0) == 1
    dup_samples = report.samples[CheckId.RECORD_NOT_UNIQUELY_IDENTIFIED]
    assert dup_samples[0]["url"] == "https://a.example/0"


def test_incremental_global_rows_superseded_not_accumulated(spark, tmp_path):
    """Run B's rerun global pass REPLACES run A's stale uniqueness rows in
    the shared store: one finding per duplicated key with the fresh count,
    and the report's verdicts/n_rows cover the whole table."""
    import datetime as dt

    from gbif_data_validator_spark.model import CheckId
    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

    wd = str(tmp_path / "inc2")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    def page(url, month):
        return (url, dt.datetime(2024, month, 15), None, "hello world", "en")

    # run A: url X appears twice (found=count=2)
    old = spark.createDataFrame(
        [page("https://x.example/dup", 1), page("https://x.example/dup", 1)]
        + [page(f"https://a.example/{i}", 1 + i % 2) for i in range(30)],
        schema,
    )
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(old)

    # run B appends a third copy of X in month 3
    new = old.unionByName(
        spark.createDataFrame([page("https://x.example/dup", 3)], schema)
    )
    report = ValidationEngine(
        spark,
        EngineConfig(
            check_extraction=False, work_dir=wd, run_id="B", baseline_run_id="A"
        ),
    ).run(new)
    # exactly ONE uniqueness finding, with the fresh count — not A's + B's
    assert report.issue_counts[CheckId.RECORD_NOT_UNIQUELY_IDENTIFIED] == 1
    samples = report.samples[CheckId.RECORD_NOT_UNIQUELY_IDENTIFIED]
    assert len(samples) == 1 and samples[0]["found"] == "count=3"
    # report covers the WHOLE table: baseline windows fold into verdicts/n_rows
    assert {"2024-01", "2024-02", "2024-03"} <= set(report.partition_verdicts)
    assert report.n_rows == new.count()


def test_incremental_bucket_scheme_mismatch_rejected(spark, tmp_path):
    import datetime as dt

    import pytest

    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

    wd = str(tmp_path / "inc3")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    df = spark.createDataFrame(
        [(f"https://a.example/{i}", dt.datetime(2024, 1, 15), None, "t", "en")
         for i in range(20)],
        schema,
    )
    ValidationEngine(
        spark,
        EngineConfig(check_extraction=False, work_dir=wd, run_id="A", n_buckets=4),
    ).run(df)
    with pytest.raises(ValueError, match="partition scheme"):
        ValidationEngine(
            spark,
            EngineConfig(
                check_extraction=False, work_dir=wd, run_id="B",
                baseline_run_id="A", n_buckets=1,
            ),
        ).run(df)


def test_resume_pruning_pushes_warc_ts_filter_to_scan(spark, pages, tmp_path):
    """Completed months must prune at the SCAN, not just post-scan: the
    derived _partition_id filter can't reach storage, so prune_completed
    re-expresses fully-done months as warc_ts range predicates — assert
    they appear in the parquet scan's PushedFilters (at cluster scale this
    is Iceberg partition pruning: skipped bytes, not just skipped rows)."""
    from gbif_data_validator_spark.operators.record_checks import partition_id_col
    from gbif_data_validator_spark.plans.engine import (
        _fully_completed_months,
        prune_completed,
    )

    path = str(tmp_path / "pages.parquet")
    pages.drop("expected_issue").write.parquet(path)
    src = spark.read.parquet(path).withColumn(
        "_partition_id", partition_id_col(F.col("warc_ts"), 1, F.col("url"))
    )
    months = sorted(
        r._partition_id
        for r in src.select("_partition_id").distinct().collect()
        if r._partition_id not in ("UNKNOWN",)
    )[:2]
    pruned = prune_completed(src, months, 1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    assert "warc_ts" in pushed, pushed
    # and the correctness layer still holds: no pruned-month rows survive
    left = {r._partition_id for r in pruned.select("_partition_id").distinct().collect()}
    assert not (left & set(months))

    # bucketed scheme: a month with only SOME buckets done must NOT become
    # a range predicate (layer-1 partition-id filter handles its done slices)
    assert _fully_completed_months(["2024-01-b0", "2024-01-b1"], 4) == []
    assert _fully_completed_months(
        ["2024-01-b0", "2024-01-b1", "2024-01-b2", "2024-01-b3", "UNKNOWN-b1"], 4
    ) == ["2024-01"]


def test_incremental_unknown_partition_revalidated(spark, tmp_path):
    """The UNKNOWN partition (null warc_ts rows) is never pruned by the
    incremental chain: every append can add new null-ts rows and they all
    land in UNKNOWN forever, so a pruned UNKNOWN would mean newly appended
    malformed records are never validated."""
    import datetime as dt

    from gbif_data_validator_spark.model import CheckId
    from gbif_data_validator_spark.plans import checkpoint as cp

    wd = str(tmp_path / "unk")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    old = spark.createDataFrame(
        [(f"https://a.example/{i}", dt.datetime(2024, 1, 15), None, "t", "en")
         for i in range(20)]
        + [("https://a.example/nots", None, None, "t", "en")],  # UNKNOWN row
        schema,
    )
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(old)
    assert "UNKNOWN" in cp.completed_partitions(spark, wd + "/checkpoint", "A")

    # append: a new month AND a new malformed (blank-url, null-ts) row that
    # lands in UNKNOWN — it must be caught despite A having validated UNKNOWN
    new = old.unionByName(
        spark.createDataFrame(
            [("https://b.example/new", dt.datetime(2024, 2, 15), None, "t", "en"),
             ("", None, None, "t", "en")],
            schema,
        )
    )
    report = ValidationEngine(
        spark,
        EngineConfig(check_extraction=False, work_dir=wd, run_id="B",
                     baseline_run_id="A"),
    ).run(new)
    assert report.issue_counts.get(CheckId.KEY_EMPTY, 0) == 1
    # B revalidated (and re-checkpointed) UNKNOWN with the fresh verdict
    assert "UNKNOWN" in cp.completed_partitions(spark, wd + "/checkpoint", "B")
    assert report.partition_verdicts["UNKNOWN"] == "FAIL"
    assert report.n_rows == new.count()


def test_incremental_does_not_inherit_stale_superseded_rows(spark, tmp_path):
    """A window re-validated by a LATER full run supersedes the older run's
    violation rows: an incremental run must inherit only rows written by
    each pruned window's latest validator, else a since-fixed finding
    poisons the counts while the verdict fold reports the window as PASS."""
    import datetime as dt

    from gbif_data_validator_spark.model import CheckId

    wd = str(tmp_path / "stale")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    broken = spark.createDataFrame(
        [(f"https://a.example/{i}", dt.datetime(2024, 1, 15), None, "t", "en")
         for i in range(20)]
        + [("", dt.datetime(2024, 1, 16), None, "t", "en")],  # KEY_EMPTY
        schema,
    )
    fixed = spark.createDataFrame(
        [(f"https://a.example/{i}", dt.datetime(2024, 1, 15), None, "t", "en")
         for i in range(20)]
        + [("https://a.example/fixed", dt.datetime(2024, 1, 16), None, "t", "en")],
        schema,
    )

    # run A finds the January KEY_EMPTY; full rerun F validates the FIXED
    # table (fresh full run inherits nothing, re-checkpoints January clean)
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(broken)
    rep_f = ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="F")
    ).run(fixed)
    assert rep_f.issue_counts.get(CheckId.KEY_EMPTY, 0) == 0

    # incremental C on appended data: January is pruned; its latest
    # validator is F, so A's stale KEY_EMPTY row must NOT be inherited
    appended = fixed.unionByName(
        spark.createDataFrame(
            [("https://b.example/new", dt.datetime(2024, 2, 15), None, "t", "en")],
            schema,
        )
    )
    report = ValidationEngine(
        spark,
        EngineConfig(check_extraction=False, work_dir=wd, run_id="C",
                     baseline_run_id="F"),
    ).run(appended)
    assert report.issue_counts.get(CheckId.KEY_EMPTY, 0) == 0
    assert report.partition_verdicts["2024-01"] == "PASS"
    assert report.indexable


def test_baseline_run_id_must_have_checkpoint_rows(spark, tmp_path):
    """A typo'd baseline_run_id fails fast instead of silently enabling
    chain-wide incremental semantics against a lineage it never wrote."""
    import datetime as dt

    import pytest

    wd = str(tmp_path / "typo")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    df = spark.createDataFrame(
        [(f"https://a.example/{i}", dt.datetime(2024, 1, 15), None, "t", "en")
         for i in range(5)],
        schema,
    )
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(df)
    with pytest.raises(ValueError, match="no checkpoint rows"):
        ValidationEngine(
            spark,
            EngineConfig(check_extraction=False, work_dir=wd, run_id="B",
                         baseline_run_id="A-typo"),
        ).run(df)


def test_interrupted_scheme_marker_self_heals(spark, pages, tmp_path):
    """An interrupted first run can leave an empty/unreadable _scheme dir;
    later runs must treat it as absent and rewrite it instead of crashing
    on every subsequent attempt (a permanently bricked work_dir)."""
    import os

    wd = str(tmp_path / "heal")
    os.makedirs(os.path.join(wd, "_scheme"))  # exists, but no data files
    cfg = EngineConfig(check_extraction=False, work_dir=wd, run_id="r1")
    rep = ValidationEngine(spark, cfg).run(pages.drop("expected_issue"))
    assert rep.n_rows == pages.count()
    # the marker was repaired: a mismatched reuse is still rejected
    import pytest

    with pytest.raises(ValueError, match="partition scheme"):
        ValidationEngine(
            spark,
            EngineConfig(check_extraction=False, work_dir=wd, run_id="r2",
                         n_buckets=4),
        ).run(pages.drop("expected_issue"))


def test_incremental_three_run_chain(spark, tmp_path):
    """C←B←A chain: run C (baseline B) must prune A's windows too (the
    work_dir is the table's lineage), keep A's and B's record findings in
    its whole-table report, and fold all historical verdicts."""
    import datetime as dt

    from gbif_data_validator_spark.plans import checkpoint as cp
    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

    wd = str(tmp_path / "chain")
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    def month_rows(month, n=20):
        return [
            (f"https://m{month}.example/{i}", dt.datetime(2024, month, 10), None, "t", "en")
            for i in range(n)
        ] + [("", dt.datetime(2024, month, 11), None, "t", "en")]  # 1 KEY_EMPTY per month

    t1 = spark.createDataFrame(month_rows(1), schema)
    t12 = t1.unionByName(spark.createDataFrame(month_rows(2), schema))
    t123 = t12.unionByName(spark.createDataFrame(month_rows(3), schema))

    ValidationEngine(spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")).run(t1)
    ValidationEngine(spark, EngineConfig(check_extraction=False, work_dir=wd,
                                         run_id="B", baseline_run_id="A")).run(t12)
    report = ValidationEngine(spark, EngineConfig(check_extraction=False, work_dir=wd,
                                                  run_id="C", baseline_run_id="B")).run(t123)
    # C checkpointed ONLY month 3 (A's and B's windows pruned transitively)
    done_c = cp.completed_partitions(spark, wd + "/checkpoint", "C")
    assert "2024-03" in done_c and "2024-01" not in done_c and "2024-02" not in done_c
    # whole-table report: one KEY_EMPTY per month incl. A's, verdicts cover all
    assert report.issue_counts["KEY_EMPTY"] == 3
    assert {"2024-01", "2024-02", "2024-03"} <= set(report.partition_verdicts)
    assert report.n_rows == t123.count()
