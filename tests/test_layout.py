"""Layout and skew audits: real multi-file parquet layouts (the unit tests
cover what the single-file driver fixture can't), skew ordering/shares, and
the narrow-scan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.layout import (
    file_rowcounts,
    key_skew_audit,
    layout_audit,
)


def test_file_rowcounts_multifile(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(0, 1000).repartition(4).write.parquet(p)
    rc = file_rowcounts(spark.read.parquet(p)).collect()
    assert len(rc) == 4
    assert sum(r["n_rows"] for r in rc) == 1000
    assert all("/" not in r["file"] for r in rc)  # basenames only


def test_layout_audit_flags_small_files(spark, tmp_path):
    big = str(tmp_path / "big")
    small = str(tmp_path / "small")
    spark.range(0, 2000).coalesce(1).write.parquet(big)
    spark.range(0, 90).repartition(3).write.parquet(small)
    out = {
        r["table"]: r
        for r in layout_audit(
            spark, {"big": big, "small": small}, small_file_rows=100
        ).collect()
    }
    assert out["big"]["n_files"] == 1 and out["big"]["n_small_files"] == 0
    assert out["small"]["n_files"] == 3 and out["small"]["n_small_files"] == 3
    assert out["small"]["n_rows"] == 90
    assert out["big"]["min_file_rows"] == out["big"]["max_file_rows"] == 2000


def test_key_skew_audit_orders_and_shares(spark):
    # key "a" ×6, "b" ×3, "c" ×1 → shares .6/.3/.1; null key counts too
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1 + [(None,)] * 10
    df = spark.createDataFrame(rows, "k: string")
    got = key_skew_audit(df, "k", top_k=2).collect()
    assert [r["key"] for r in got] == [None, "a"]
    assert got[1]["n"] == 6
    assert abs(got[1]["share"] - 0.3) < 1e-9  # 6 of 20
    assert got[0]["n_groups"] == 4


def test_key_skew_deterministic_ties(spark):
    rows = [("x%d" % i,) for i in range(5) for _ in range(2)]
    df = spark.createDataFrame(rows, "k: string")
    got = [r["key"] for r in key_skew_audit(df, "k", top_k=3).collect()]
    assert got == ["x0", "x1", "x2"]  # ties broken by key ascending


def test_skew_audit_scan_is_narrow(spark, pages):
    """Column pruning: the skew audit over a wide table must read only the
    key column (html stays out of ReadSchema)."""
    plan = (
        key_skew_audit(pages, "lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "html" not in plan
