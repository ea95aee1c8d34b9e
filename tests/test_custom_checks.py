"""CustomCheck extension surface: user rules fuse into the pass-1 scan
(no extra scan, no shuffle), flow through counts/samples/verdicts, and
blocking=True joins the indexability fold."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.record_checks import (
    CustomCheck,
    run_record_checks,
)
from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _pages(spark):
    rows = [
        (f"https://ex.org/{i}", dt.datetime(2024, 1, 1 + i), None,
         "short" if i < 3 else "a perfectly reasonable document text", "en")
        for i in range(10)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _too_short(blocking: bool = False) -> CustomCheck:
    # Columns need a live JVM — build inside the test, not at import time
    return CustomCheck(
        check_id="TEXT_TOO_SHORT",
        violated=F.length("text") < 10,
        expected="length(text) >= 10",
        found=F.length("text"),
        blocking=blocking,
    )


def test_custom_check_rows_and_fusion(spark):
    df = _pages(spark)
    v = run_record_checks(df, check_extraction=False, custom_checks=(_too_short(),))
    rows = v.where(F.col("check_id") == "TEXT_TOO_SHORT").collect()
    assert len(rows) == 3
    assert all(r.found == "5" and r.expected == "length(text) >= 10" for r in rows)
    # fused: still exactly ONE scan of the source in the plan
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 1
    assert "Exchange" not in plan


def test_non_blocking_custom_check_reports_but_indexes(spark):
    rep = ValidationEngine(
        spark, EngineConfig(check_extraction=False, custom_checks=(_too_short(),))
    ).run(_pages(spark))
    assert rep.issue_counts["TEXT_TOO_SHORT"] == 3
    assert rep.indexable  # not in the blocking set
    assert rep.samples["TEXT_TOO_SHORT"][0]["found"] == "5"


def test_blocking_custom_check_flips_verdicts(spark):
    rep = ValidationEngine(
        spark,
        EngineConfig(check_extraction=False, custom_checks=(_too_short(True),)),
    ).run(_pages(spark))
    assert not rep.indexable
    # the three short docs are on days 1-3 of 2024-01 → that window FAILs
    assert rep.partition_verdicts["2024-01"] == "FAIL"


def test_custom_checks_default_off_keeps_goldens(spark):
    rep = ValidationEngine(
        spark, EngineConfig(check_extraction=False)
    ).run(_pages(spark))
    assert "TEXT_TOO_SHORT" not in rep.issue_counts and rep.indexable


def test_lang_script_rides_the_custom_check_surface(spark, pages):
    """The packaged cross-field check fuses into pass 1 and agrees row-for-
    row with the standalone operator on the same pages."""
    from gbif_data_validator_spark.operators.record_checks import (
        lang_script_custom_check,
        lang_script_mismatch,
        run_record_checks,
    )

    v = run_record_checks(
        pages, check_extraction=False,
        custom_checks=(lang_script_custom_check(),),
    ).where(F.col("check_id") == "LANG_SCRIPT_MISMATCH")
    standalone = lang_script_mismatch(pages, id_cols=["url"])
    assert v.count() == standalone.count()
    assert {r.url for r in v.select("url").collect()} == {
        r.url for r in standalone.select("url").collect()
    }

def test_mojibake_rides_the_custom_check_surface(spark):
    """TEXT_MOJIBAKE fuses into pass 1; found carries the signal battery +
    repairability so the violation row doubles as a repair work order."""
    from gbif_data_validator_spark.operators.record_checks import (
        mojibake_custom_check,
    )

    rows = [
        ("https://ex.org/0", dt.datetime(2024, 1, 1), None, "cafÃ© au lait", "en"),
        ("https://ex.org/1", dt.datetime(2024, 1, 2), None, "clean text", "en"),
        ("https://ex.org/2", dt.datetime(2024, 1, 3), None, "bad � byte", "en"),
        ("https://ex.org/3", dt.datetime(2024, 1, 4), None, None, "en"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    v = run_record_checks(
        df, check_extraction=False, custom_checks=(mojibake_custom_check(),)
    ).where(F.col("check_id") == "TEXT_MOJIBAKE")
    got = {r.url: r.found for r in v.collect()}
    assert set(got) == {"https://ex.org/0", "https://ex.org/2"}
    assert got["https://ex.org/0"] == "latin1=1 tri=0 c1=0 fffd=0 repairable=true"
    assert got["https://ex.org/2"] == "latin1=0 tri=0 c1=0 fffd=1 repairable=false"
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("FileScan") <= 1
    assert "Exchange" not in plan


def test_mojibake_check_engine_e2e(spark):
    from gbif_data_validator_spark.operators.record_checks import (
        mojibake_custom_check,
    )

    rows = [
        (f"https://ex.org/{i}", dt.datetime(2024, 1, 1 + i), None,
         "donâ€™t stop" if i < 2 else "a perfectly ordinary document", "en")
        for i in range(8)
    ]
    rep = ValidationEngine(
        spark,
        EngineConfig(
            check_extraction=False,
            custom_checks=(mojibake_custom_check(blocking=True),),
        ),
    ).run(spark.createDataFrame(rows, SCHEMA))
    assert rep.issue_counts["TEXT_MOJIBAKE"] == 2
    assert not rep.indexable  # blocking=True joins the verdict fold


def test_blocklist_check_rides_pass1(spark):
    """Planted blocked token → violation rows with reviewable found=;
    blocking=True flips the verdict; clean pages stay indexable."""
    import pytest

    from gbif_data_validator_spark.operators.record_checks import (
        blocklist_custom_check,
    )

    rows = [
        ("https://ex.org/0", dt.datetime(2024, 1, 1), None, "nice clean prose", "en"),
        ("https://ex.org/1", dt.datetime(2024, 1, 2), None, "the SLOW slow dup page", "en"),
        ("https://ex.org/2", dt.datetime(2024, 1, 3), None, "slow. is not a hit", "en"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    v = run_record_checks(
        df,
        check_extraction=False,
        custom_checks=(blocklist_custom_check(["slow", "dup"]),),
    ).where(F.col("check_id") == "TEXT_BLOCKLISTED")
    got = {r.url: r.found for r in v.collect()}
    assert got == {"https://ex.org/1": "hits=3 terms=dup,slow"}
    rep = ValidationEngine(
        spark,
        EngineConfig(
            check_extraction=False,
            custom_checks=(blocklist_custom_check(["slow", "dup"], blocking=True),),
        ),
    ).run(df)
    assert rep.issue_counts["TEXT_BLOCKLISTED"] == 1 and not rep.indexable
    with pytest.raises(ValueError, match="empty blocklist"):
        blocklist_custom_check([])


def test_readability_band_check(spark):
    """Out-of-band FRE violates; NULL/wordless text never does; the band
    arguments validate."""
    import pytest

    from gbif_data_validator_spark.operators.record_checks import (
        readability_custom_check,
    )

    rows = [
        # dense polysyllabic run → syllables/word ≈ 7 → FRE deep below 0
        ("https://ex.org/0", dt.datetime(2024, 1, 1), None,
         "incomprehensible antidisestablishmentarianism extraordinarily unconstitutionally", "en"),
        ("https://ex.org/1", dt.datetime(2024, 1, 2), None,
         "The quick brown fox jumps. It runs fast! Why?", "en"),
        ("https://ex.org/2", dt.datetime(2024, 1, 3), None, None, "en"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    v = run_record_checks(
        df,
        check_extraction=False,
        custom_checks=(readability_custom_check(0, 130_000_000),),
    ).where(F.col("check_id") == "TEXT_READABILITY_OUT_OF_BAND")
    assert [r.url for r in v.collect()] == ["https://ex.org/0"]
    with pytest.raises(ValueError, match="min > max"):
        readability_custom_check(1, 0)
