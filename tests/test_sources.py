"""Sources: CSV scan with declared schema (S3/S6), default imputation (P4),
UTF-8 residual check (S5 analog), JSON report sink (S9)."""

import json
import os

from pyspark.sql import functions as F

from gbif_data_validator_spark.model import CheckId
from gbif_data_validator_spark.operators.record_checks import run_record_checks
from gbif_data_validator_spark.sources.tables import apply_defaults, read_pages_csv


def test_csv_roundtrip(spark, tmp_path):
    from gbif_data_validator_spark.sources.synthetic import synth_pages

    pages = synth_pages(spark, 300, with_violations=False)
    csv_dir = str(tmp_path / "pages_csv")
    pages.select(
        "url", "warc_ts", F.base64("html").alias("html_b64"), "text", "lang"
    ).write.option("header", "true").option("escape", '"').csv(csv_dir)

    back = read_pages_csv(spark, csv_dir)
    assert back.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert back.count() == 300
    # html bytes survive the base64 ride; extraction identity still holds
    from gbif_data_validator_spark.functions.extraction import extract_text_udf

    assert back.where(extract_text_udf(F.col("html")) != F.col("text")).count() == 0


def test_csv_parse_failures_become_nulls(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("url,warc_ts,html_b64,text,lang\nhttps://a.example.com/x,NOT_A_TS,,hello,en\n")
    df = read_pages_csv(spark, str(p))
    row = df.collect()[0]
    assert row.warc_ts is None  # PERMISSIVE: finding material, not a crash
    v = run_record_checks(df, check_extraction=False)
    assert v.where(F.col("check_id") == CheckId.WARC_TS_INVALID).count() == 1


def test_apply_defaults_only_when_blank(spark):
    df = spark.createDataFrame(
        [("en",), (None,), ("  ",), ("fr",)], schema="lang string"
    )
    out = [r.lang for r in apply_defaults(df, {"lang": "und"}).collect()]
    assert out == ["en", "und", "und", "fr"]


def test_text_not_utf8_check(spark):
    df = spark.createDataFrame(
        [
            ("https://a.example.com/1", "clean text", "en"),
            ("https://a.example.com/2", "broken � here", "en"),
        ],
        schema="url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2020-06-01 00:00:00").cast("timestamp")).withColumn(
        "html", F.lit(None).cast("binary")
    )
    v = run_record_checks(df, check_extraction=False)
    bad = v.where(F.col("check_id") == CheckId.TEXT_NOT_UTF8).collect()
    assert [r.url for r in bad] == ["https://a.example.com/2"]


def test_report_json_sink(spark, tmp_path):
    from gbif_data_validator_spark.model import ValidationReport

    rep = ValidationReport(run_id="r9", indexable=True, n_rows=5, n_violations=0)
    rep.write_json(str(tmp_path))
    data = json.load(open(os.path.join(str(tmp_path), "r9.json")))
    assert data["run_id"] == "r9" and data["indexable"] is True


def test_jsonl_source_corrupt_record_capture(spark, tmp_path):
    """Malformed JSONL lines become RECORD_MALFORMED findings, parseable
    lines land typed — a bad line is a finding, never a crash."""
    import base64

    from gbif_data_validator_spark.model import CheckId
    from gbif_data_validator_spark.sources.tables import (
        corrupt_record_violations,
        read_pages_jsonl,
    )

    b64 = base64.b64encode(b"<html>x</html>").decode()
    lines = [
        '{"url": "https://a.example/1", "warc_ts": "2024-01-01T00:00:00.000Z", '
        f'"html_b64": "{b64}", "text": "x", "lang": "en"}}',
        "this is not json",
        '{"url": "https://a.example/2", "warc_ts": "2024-01-02T00:00:00.000Z", '
        '"html_b64": null, "text": "y", "lang": "de"}',
        '{"url": "https://a.example/3", "warc_ts": "broken-ts"',
    ]
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(lines) + "\n")
    df = read_pages_jsonl(spark, str(p)).cache()
    # (cache: Spark disallows queries whose pruned schema is ONLY the
    # internal corrupt-record column — QUERY_ONLY_CORRUPT_RECORD_COLUMN;
    # production consumers always select data columns alongside)
    assert df.columns == ["url", "warc_ts", "html", "text", "lang", "_corrupt_record"]
    ok = df.where(F.col("_corrupt_record").isNull())
    assert ok.count() == 2
    assert ok.where(F.col("html").isNotNull()).count() == 1  # base64 decoded
    v = corrupt_record_violations(df).collect()
    assert len(v) == 2
    assert {r.check_id for r in v} == {CheckId.RECORD_MALFORMED}
    assert any("not json" in r.found for r in v)


# ------------------------------------------------- schema-evolution union


def test_evolving_union_widens_and_fills(spark):
    from gbif_data_validator_spark.sources.evolution import evolving_union

    month1 = spark.createDataFrame(
        [(1, 10, "en")], "url int, n int, lang string"
    )
    month2 = spark.createDataFrame(
        [(2_000_000_000_000, 2.5, "fr", True)],
        "url long, n double, lang string, fetched boolean",
    )
    out, findings = evolving_union([month1, month2])
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "string", "boolean"
    ]
    rows = sorted(out.collect(), key=lambda r: r.url)
    assert rows[0].url == 1 and rows[0].n == 10.0 and rows[0].fetched is None
    assert rows[1].url == 2_000_000_000_000 and rows[1].fetched is True
    kinds = {(f["column"], f["kind"]) for f in findings}
    assert ("url", "TYPE_WIDENED") in kinds
    assert ("n", "TYPE_WIDENED") in kinds
    assert ("fetched", "ADDED_LATER") in kinds
    assert ("fetched", "MISSING_IN_INPUT") in kinds


def test_evolving_union_string_conflict_gated(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.sources.evolution import evolving_union

    a = spark.createDataFrame([(1,)], "v int")
    b = spark.createDataFrame([("x",)], "v string")
    with _pytest.raises(ValueError, match="allow_stringify"):
        evolving_union([a, b])
    out, findings = evolving_union([a, b], allow_stringify=True)
    assert out.schema.fields[0].dataType.simpleString() == "string"
    assert sorted(r.v for r in out.collect()) == ["1", "x"]


def test_evolving_union_irreconcilable_raises(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.sources.evolution import evolving_union

    a = spark.createDataFrame([(1, [1, 2])], "id int, v array<int>")
    b = spark.createDataFrame([(2, 3)], "id int, v long")
    with _pytest.raises(ValueError, match="irreconcilable"):
        evolving_union([a, b])


def test_evolving_union_no_shuffle(spark):
    from gbif_data_validator_spark.sources.evolution import evolving_union

    a = spark.createDataFrame([(1, 2)], "x int, y int")
    b = spark.createDataFrame([(3,)], "x long")
    out, _ = evolving_union([a, b])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --------------------------------------------------------------------------
# CDX crawl-index source
# --------------------------------------------------------------------------


def test_cdx_scan_typed_rows_and_errors(spark):
    from gbif_data_validator_spark.sources.cdx import read_cdx_files

    df = read_cdx_files(spark, "tests/fixtures/cdx")
    rows = {(r.src_file, r.surt, r.error) for r in df.collect()}
    assert ("index-00.cdxj", "com,example)/", None) in rows
    errs = sorted(e for _, _, e in rows if e)
    assert errs == [
        "CDX_JSON_INVALID", "CDX_LINE_SHORT", "CDX_TS_INVALID",
        "CDX_URL_MISSING",
    ]
    ok = df.where("error IS NULL").collect()
    assert all(r.url and r.capture_ts is not None for r in ok)
    # numerics re-typed from the string-valued JSON convention
    asset = next(r for r in ok if r.surt == "net,cdn)/asset")
    assert asset.length == 204800 and asset.offset == 4096 and asset.status == 200


def test_cdx_parse_is_shuffle_free(spark):
    """The whole parse is one narrow projection — no UDF, no Exchange."""
    from gbif_data_validator_spark.sources.cdx import read_cdx_files

    plan = (
        read_cdx_files(spark, "tests/fixtures/cdx")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_cdx_error_rows_preserve_cardinality(spark):
    """Every non-blank input line is exactly one output row."""
    from gbif_data_validator_spark.sources.cdx import read_cdx_files

    n_lines = sum(
        1
        for f in ("index-00.cdxj", "index-01.cdxj")
        for line in open(f"tests/fixtures/cdx/{f}")
        if line.strip()
    )
    assert read_cdx_files(spark, "tests/fixtures/cdx").count() == n_lines


def test_fetch_plan_coalesces_and_splits(spark):
    from gbif_data_validator_spark.sources.cdx import fetch_plan

    rows = [
        # one shard: 0..100, 150..250 (gap 50), 10000..10100 (gap far)
        ("a.warc.gz", 0, 100), ("a.warc.gz", 150, 100), ("a.warc.gz", 10000, 100),
        # second shard: single capture
        ("b.warc.gz", 5, 10),
    ]
    cdx = spark.createDataFrame(
        [(f, o, l, None) for f, o, l in rows],
        "filename string, offset long, length long, error string",
    )
    got = {
        (r.filename, r.range_start, r.range_end, r.n_captures, r.range_bytes)
        for r in fetch_plan(cdx, max_gap_bytes=64).collect()
    }
    assert got == {
        ("a.warc.gz", 0, 250, 2, 250),      # gap 50 <= 64: merged
        ("a.warc.gz", 10000, 10100, 1, 100),  # far capture: own range
        ("b.warc.gz", 5, 15, 1, 10),
    }


def test_fetch_plan_zero_gap_never_merges_across_files(spark):
    from gbif_data_validator_spark.sources.cdx import fetch_plan

    cdx = spark.createDataFrame(
        [("x.warc.gz", 0, 10, None), ("y.warc.gz", 10, 10, None)],
        "filename string, offset long, length long, error string",
    )
    assert fetch_plan(cdx, max_gap_bytes=10**9).count() == 2


def test_fetch_plan_excludes_error_and_offsetless_rows(spark):
    from gbif_data_validator_spark.sources.cdx import fetch_plan

    cdx = spark.createDataFrame(
        [("x.warc.gz", 0, 10, None), ("x.warc.gz", None, None, "CDX_TS_INVALID"),
         ("x.warc.gz", None, None, None)],
        "filename string, offset long, length long, error string",
    )
    rows = fetch_plan(cdx).collect()
    assert len(rows) == 1 and rows[0].n_captures == 1


def test_best_captures_policy(spark):
    """200 beats 404 regardless of recency; among 200s the latest wins;
    exact ties break by (filename, offset)."""
    import datetime as dt

    from gbif_data_validator_spark.sources.cdx import best_captures

    t = lambda s: dt.datetime.fromisoformat(s)
    rows = [
        # u1: newer 404 must lose to older 200
        ("u1", t("2024-03-01T00:00:00"), 404, "b.warc.gz", 5, None),
        ("u1", t("2024-01-01T00:00:00"), 200, "a.warc.gz", 9, None),
        # u2: two 200s -> latest
        ("u2", t("2024-01-01T00:00:00"), 200, "a.warc.gz", 1, None),
        ("u2", t("2024-02-01T00:00:00"), 200, "a.warc.gz", 2, None),
        # u3: exact tie -> min (filename, offset)
        ("u3", t("2024-01-01T00:00:00"), 200, "b.warc.gz", 7, None),
        ("u3", t("2024-01-01T00:00:00"), 200, "a.warc.gz", 8, None),
        # error row excluded entirely
        (None, None, None, None, None, "CDX_TS_INVALID"),
    ]
    cdx = spark.createDataFrame(
        rows,
        "url string, capture_ts timestamp, status int, filename string, "
        "offset long, error string",
    )
    got = {(r.url, r.status, r.filename, r.offset) for r in best_captures(cdx).collect()}
    assert got == {
        ("u1", 200, "a.warc.gz", 9),
        ("u2", 200, "a.warc.gz", 2),
        ("u3", 200, "a.warc.gz", 8),
    }


def test_cdx_checks_fixture_findings(spark):
    from gbif_data_validator_spark.sources.cdx import cdx_checks, read_cdx_files

    got = {
        (r.check_id, r.surt)
        for r in cdx_checks(read_cdx_files(spark, "tests/fixtures/cdx")).collect()
    }
    assert ("DIGEST_MALFORMED", "net,cdn)/asset") in got
    assert ("DIGEST_MALFORMED", "org,wiki)/page") in got
    # the 4 parse-error classes forwarded; SURT recompute: no false positives
    assert sum(1 for c, _ in got if c.startswith("CDX_")) == 4
    assert not any(c == "SURT_URL_MISMATCH" for c, _ in got)


def test_cdx_checks_planted_field_violations(spark):
    import datetime as dt

    from gbif_data_validator_spark.sources.cdx import cdx_checks

    rows = [
        # SURT built with the WRONG transform (host NOT reversed)
        ("example,com)/x", "https://example.com/x", dt.datetime(2024, 1, 1),
         200, "ABCDEFGH", 10, 0, "f.warc.gz", None),
        # status out of range + non-positive length + pre-epoch ts
        ("com,ok)/", "https://ok.com/", dt.datetime(1990, 1, 1),
         999, "ABCDEFGH", 0, 0, "f.warc.gz", None),
    ]
    cdx = spark.createDataFrame(
        rows,
        "surt string, url string, capture_ts timestamp, status int, "
        "digest string, length long, offset long, filename string, error string",
    )
    got = {(r.surt, r.check_id) for r in cdx_checks(cdx).collect()}
    assert ("example,com)/x", "SURT_URL_MISMATCH") in got
    assert ("com,ok)/", "STATUS_INVALID") in got
    assert ("com,ok)/", "LENGTH_NONPOSITIVE") in got
    assert ("com,ok)/", "CAPTURE_TS_UNLIKELY") in got


def test_cdx_checks_surt_recompute_matches_convention(spark):
    """Well-formed captures produce zero SURT findings: query strings are
    excluded from the path component, host case-folds."""
    import datetime as dt

    from gbif_data_validator_spark.sources.cdx import cdx_checks

    rows = [
        ("org,sub,deep)/a/b", "https://Deep.Sub.Org/a/b?id=1",
         dt.datetime(2024, 1, 1), 200, "ABCDEFGH", 5, 0, "f.warc.gz", None),
        ("com,e)/", "https://e.com/", dt.datetime(2024, 1, 1),
         200, "ABCDEFGH", 5, 0, "f.warc.gz", None),
    ]
    cdx = spark.createDataFrame(
        rows,
        "surt string, url string, capture_ts timestamp, status int, "
        "digest string, length long, offset long, filename string, error string",
    )
    assert cdx_checks(cdx).count() == 0
