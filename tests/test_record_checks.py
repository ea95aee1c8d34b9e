"""Pass-1 record checks: per-check recall = 1.0 against the labeled fixture
and zero false positives on clean rows (the reference's
validator_test_file_all_issues.tsv pattern — SURVEY.md §5)."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.model import CheckId
from gbif_data_validator_spark.operators.record_checks import run_record_checks

# row-level checks produced by pass 1 (uniqueness/referential/drift are pass 2)
PASS1_CHECKS = [
    CheckId.KEY_EMPTY,
    CheckId.URL_MALFORMED,
    CheckId.WARC_TS_INVALID,
    CheckId.WARC_TS_UNLIKELY,
    CheckId.TEXT_EMPTY,
    CheckId.TEXT_EXTRACTION_MISMATCH,
]


def test_recall_and_false_positives(spark, pages):
    violations = run_record_checks(pages, check_extraction=True).cache()

    label_counts = {
        r.expected_issue: r.n
        for r in pages.groupBy("expected_issue").agg(F.count("*").alias("n")).collect()
    }
    found_counts = {
        r.check_id: r.n
        for r in violations.groupBy("check_id").agg(F.count("*").alias("n")).collect()
    }
    for check in PASS1_CHECKS:
        assert label_counts.get(check, 0) > 0, f"fixture has no {check} rows"
        assert found_counts.get(check, 0) == label_counts[check], check

    # zero false positives: every pass-1 violation's url belongs to a row
    # labeled with exactly that issue (KEY_EMPTY rows have url='' → count match
    # above is the evidence; here check the url-addressable ones exactly)
    for check in [CheckId.URL_MALFORMED, CheckId.WARC_TS_UNLIKELY, CheckId.TEXT_EMPTY,
                  CheckId.TEXT_EXTRACTION_MISMATCH, CheckId.WARC_TS_INVALID]:
        expected_urls = {
            r.url for r in pages.where(F.col("expected_issue") == check).select("url").collect()
        }
        got_urls = {
            r.url for r in violations.where(F.col("check_id") == check).select("url").collect()
        }
        assert got_urls == expected_urls, check
    violations.unpersist()


def test_no_violations_on_clean_table(spark):
    from gbif_data_validator_spark.sources.synthetic import synth_pages

    clean = synth_pages(spark, 1500, with_violations=False)
    v = run_record_checks(clean, check_extraction=True)
    assert v.count() == 0


def test_partition_id_derivation(spark, pages):
    v = run_record_checks(pages, check_extraction=False)
    # NULL warc_ts rows land in the UNKNOWN partition
    null_ts = v.where(F.col("check_id") == CheckId.WARC_TS_INVALID)
    assert null_ts.where(F.col("partition_id") != "UNKNOWN").count() == 0
    # others carry yyyy-MM windows
    assert v.where(F.col("partition_id").rlike(r"^(\d{4}-\d{2}|UNKNOWN)$")).count() == v.count()


def test_html_pruned_when_extraction_disabled(spark, pages):
    """Column pruning: with the extraction check off, the html:binary column
    must not be read at all (it dominates bytes at 100 TB — SURVEY.md §7.4)."""
    v = run_record_checks(pages, check_extraction=False)
    plan = v._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m is not None, plan
    assert "html" not in m.group(1), m.group(1)


def test_record_checks_adversarial_inputs(spark):
    """Hostile rows — control chars, RTL text, lone surrogates-adjacent
    escapes, 1MB strings, null islands — must classify, never crash, and
    never mis-fire checks that don't apply."""
    import datetime as dt

    big = "x" * 1_000_000
    rows = [
        # url with spaces and control chars → URL_MALFORMED
        ("http://bad url/\x00\x1f", dt.datetime(2024, 1, 1), b"<p>a</p>", "a", "en"),
        # RTL + combining marks: valid text, valid url
        ("https://ok.example/1", dt.datetime(2024, 1, 1), None, "مرحبا ́e", "ar"),
        # 1MB text, no html
        ("https://ok.example/2", dt.datetime(2024, 1, 1), None, big, "en"),
        # everything null except url
        ("https://ok.example/3", None, None, None, None),
        # replacement char in text → TEXT_NOT_UTF8
        ("https://ok.example/4", dt.datetime(2024, 1, 1), None, "a�b", "en"),
        # ASCII-whitespace-only url → KEY_EMPTY
        (" \t ", dt.datetime(2024, 1, 1), None, "t", "en"),
        # NBSP is NOT Java-regex \s: a U+00A0 "blank" url is treated as
        # content and classified URL_MALFORMED instead — a finding either way
        (" ", dt.datetime(2024, 1, 1), None, "t", "en"),
    ]
    df = spark.createDataFrame(
        rows, schema="url string, warc_ts timestamp, html binary, text string, lang string"
    )
    from gbif_data_validator_spark.sources.lang_dim import lang_dim

    got = {}
    for r in run_record_checks(df, check_extraction=True, lang_dim=lang_dim(spark)).collect():
        got.setdefault(r.url, set()).add(r.check_id)
    assert CheckId.URL_MALFORMED in got["http://bad url/\x00\x1f"]
    assert "https://ok.example/1" not in got  # clean RTL row: no findings
    assert "https://ok.example/2" not in got  # big text alone is not a finding
    # TEXT_EMPTY is gated on non-empty html when extraction is on (no html →
    # no text expected), so the all-null row yields only the ts finding
    assert got["https://ok.example/3"] == {CheckId.WARC_TS_INVALID}
    assert got["https://ok.example/4"] == {CheckId.TEXT_NOT_UTF8}
    assert got[" \t "] == {CheckId.KEY_EMPTY}
    assert got[" "] == {CheckId.URL_MALFORMED}


# ----------------------------------------------------- lang/script crosscheck


def test_lang_script_mismatch_semantics(spark):
    from gbif_data_validator_spark.operators.record_checks import (
        lang_script_mismatch,
    )

    rows = [
        (1, "en", "plain latin words here"),          # consistent
        (2, "zh", "plain latin words here"),          # declared zh, latin text
        (3, "zh", "中文网页测试中文网页测试"),           # consistent cjk
        (4, "ru", "латинские буквы нет кириллица"),   # cyrillic-dominant, ok
        (5, "ru", "mostly latin text actually"),      # mismatch
        (6, "xx", "whatever ??? text"),               # unmapped lang: no claim
        (7, "en", "!!! 123 ..."),                     # no script chars: 'und'
        (8, "ja", "カタカナのテキストです"),             # kana allowed for ja
        (9, "ja", "中文漢字だけ"),                      # cjk also allowed for ja
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: r.dominant_script
           for r in lang_script_mismatch(df, id_cols=["doc_id"]).collect()}
    assert got == {2: "latin", 5: "latin"}


def test_lang_script_mismatch_plan_is_narrow(spark):
    from gbif_data_validator_spark.operators.record_checks import (
        lang_script_mismatch,
    )

    df = spark.createDataFrame(
        [(1, "en", "x")], "doc_id long, lang string, text string"
    )
    plan = (
        lang_script_mismatch(df, id_cols=["doc_id"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan
