"""Star-schema validation: golden assertions mirroring the reference's
ReferentialIntegrityEvaluatorTest (unlinked extension id is exactly "ZZ"
:51; empty ids found on both sides :76-81)."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.model import BLOCKING_CHECKS, CheckId
from gbif_data_validator_spark.plans.star import validate_star


def _tbl(spark, rows, schema):
    return spark.createDataFrame(rows, schema=schema)


def test_golden_unlinked_extension_id(spark):
    core = _tbl(spark, [("i1", "x"), ("i2", "y"), ("i3", "z")], "id string, v string")
    ext = _tbl(
        spark,
        [("i1", "a"), ("i2", "b"), ("ZZ", "c"), ("i1", "d")],
        "core_id string, w string",
    )
    v = validate_star(core, {"identification": (ext, "core_id")}, core_key="id")
    rows = v.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.url == "ZZ" and r.found == "ZZ"
    assert r.check_id == CheckId.RECORD_REFERENTIAL_INTEGRITY_VIOLATION
    assert r.partition_id == "ext:identification"
    assert r.check_id in BLOCKING_CHECKS  # IndexableRules.java:29


def test_empty_ids_found_on_both_sides(spark):
    core = _tbl(spark, [("i1", "x"), ("", "y"), (None, "z")], "id string, v string")
    ext = _tbl(spark, [("i1", "a"), (" ", "b")], "core_id string, w string")
    v = validate_star(core, {"ident": (ext, "core_id")}, core_key="id")
    got = {(r.partition_id, r.check_id) for r in v.collect()}
    # two empty core ids + one blank ext id; NO referential violation for
    # them (blank keys are excluded from the anti-join, like awk's hash skip)
    by_part = {}
    for r in v.collect():
        by_part.setdefault(r.partition_id, []).append(r.check_id)
    assert by_part["core"] == [CheckId.KEY_EMPTY] * 2
    assert by_part["ext:ident"] == [CheckId.KEY_EMPTY]
    assert ("ext:ident", CheckId.RECORD_REFERENTIAL_INTEGRITY_VIOLATION) not in got


def test_multi_extension_star_and_broadcast_toggle(spark):
    core = _tbl(spark, [("c1",), ("c2",)], "id string")
    e1 = _tbl(spark, [("c1",), ("zz",)], "fk string")
    e2 = _tbl(spark, [("c2",), ("c2",), ("qq",)], "fk string")
    for bc in (False, True):
        v = validate_star(
            core, {"a": (e1, "fk"), "b": (e2, "fk")}, core_key="id", broadcast_core=bc
        )
        got = {(r.partition_id, r.url) for r in v.collect()}
        assert got == {("ext:a", "zz"), ("ext:b", "qq")}
    # forced broadcast shows up in the plan
    plan = (
        validate_star(core, {"a": (e1, "fk")}, core_key="id", broadcast_core=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_star_composes_with_engine_accounting(spark):
    """The star plan's violations feed the engine's accounting artifacts
    unchanged: per-table (RowTypeKey-style) counts, distinct-first samples,
    and the blocking-set verdict — the ValidationResultElement-per-rowType
    report shape of the reference."""
    from gbif_data_validator_spark.operators.metrics import issue_counts_by_partition
    from gbif_data_validator_spark.operators.sampling import distinct_first_samples

    core = _tbl(spark, [("i1",), ("i2",), ("",)], "id string")
    e1 = _tbl(spark, [("i1",), ("ZZ",), ("YY",)], "fk string")
    v = validate_star(core, {"ident": (e1, "fk")}, core_key="id").cache()

    counts = {
        (r.partition_id, r.check_id): r.n for r in issue_counts_by_partition(v).collect()
    }
    assert counts == {
        ("core", CheckId.KEY_EMPTY): 1,
        ("ext:ident", CheckId.RECORD_REFERENTIAL_INTEGRITY_VIOLATION): 2,
    }
    samples = distinct_first_samples(v, 10).collect()
    assert {r.url for r in samples if r.check_id
            == CheckId.RECORD_REFERENTIAL_INTEGRITY_VIOLATION} == {"ZZ", "YY"}
    # blocking-set verdict per table (IndexableRules reduce)
    verdicts = {
        pid: ("FAIL" if any(c in BLOCKING_CHECKS for (p, c) in counts if p == pid)
              else "PASS")
        for pid in {p for (p, _) in counts}
    }
    assert verdicts == {"core": "FAIL", "ext:ident": "FAIL"}
    v.unpersist()


def test_run_star_per_table_report(spark, pages_path):
    """Engine-level star run: full battery on the core + per-extension
    referential, with per-table verdicts in one report."""
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

    core = spark.read.parquet(pages_path).drop("expected_issue")
    # extension: one row per clean core url + two orphans
    ext = (
        core.where(F.col("url").isNotNull() & (F.col("url") != "")).select(
            F.col("url").alias("page_url")
        ).limit(50)
        .unionByName(
            spark.createDataFrame([("https://nope.example/x",), ("https://nope.example/y",)],
                                  schema="page_url string")
        )
    )
    eng = ValidationEngine(spark, EngineConfig(check_extraction=False))
    report = eng.run_star(core, {"links": (ext, "page_url")})
    assert report.issue_counts[CheckId.RECORD_REFERENTIAL_INTEGRITY_VIOLATION] == 2
    assert report.partition_verdicts["ext:links"] == "FAIL"
    assert report.metrics["table_rows"]["ext:links"] == 52
    assert not report.indexable
    # core battery still ran (fixture has injected violations)
    assert CheckId.URL_MALFORMED in report.issue_counts


def test_run_star_core_verdict_reflects_core_findings(spark):
    """A failing core (duplicate urls → blocking) must show core: FAIL in
    the per-table verdict list, even though its findings carry
    warc_ts-window/GLOBAL partition ids."""
    import datetime as dt

    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    core = spark.createDataFrame(
        [("https://a.example/x", dt.datetime(2024, 1, 1), None, "t", "en")] * 2
        + [("https://a.example/y", dt.datetime(2024, 1, 1), None, "t", "en")],
        schema,
    )
    ext = spark.createDataFrame([("https://a.example/y",)], "fk string")
    report = ValidationEngine(spark, EngineConfig(check_extraction=False)).run_star(
        core, {"links": (ext, "fk")}
    )
    assert report.partition_verdicts["core"] == "FAIL"
    assert report.partition_verdicts["ext:links"] == "PASS"
