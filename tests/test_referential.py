"""Broadcast anti-join referential integrity (reference golden: unlinked id
"ZZ" — ReferentialIntegrityEvaluatorTest.java:38-85) + null-key semantics."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.model import CheckId
from gbif_data_validator_spark.operators.referential import (
    orphan_rows,
    referential_violations,
)
from gbif_data_validator_spark.sources.lang_dim import lang_dim


def test_orphans_golden(spark, pages):
    dim = lang_dim(spark)
    v = referential_violations(pages, dim)
    expected_urls = {
        r.url
        for r in pages.where(F.col("expected_issue") == CheckId.LANG_UNKNOWN)
        .select("url")
        .collect()
    }
    got = {r.url for r in v.collect()}
    assert got == expected_urls and len(got) > 0
    assert {r.found for r in v.collect()} == {"zz"}


def test_null_keys_not_reported_as_orphans(spark):
    fact = spark.createDataFrame(
        [("u1", "en"), ("u2", None), ("u3", ""), ("u4", "xx1")],
        schema="url string, lang string",
    ).withColumn("warc_ts", F.lit("2020-01-01 00:00:00").cast("timestamp"))
    dim = lang_dim(spark)
    got = {r.url for r in orphan_rows(fact, dim, "lang", "lang").select("url").collect()}
    assert got == {"u4"}  # null/blank keys are a separate check, not orphans


def test_anti_join_is_broadcast(spark, pages):
    """The dim side must broadcast — no shuffle of the fact table."""
    plan = (
        orphan_rows(pages, lang_dim(spark), "lang", "lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan


def test_reconcile_aggregates_statuses_and_determinism(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.referential import (
        reconcile_aggregates,
    )

    fact = spark.createDataFrame(
        [(1, 10.0), (1, 5.25), (2, 7.0), (3, 1.0), (3, None)],
        "k long, m double",
    )
    rollup = spark.createDataFrame(
        [(1, 15.25), (2, 9.0), (4, 2.0)], "k long, total double"
    )
    got = {
        r.k: (r.actual, r.expected, r.delta, r.status)
        for r in reconcile_aggregates(
            fact, rollup, ["k"], "m", "total"
        ).collect()
    }
    assert got[1] == (15.25, 15.25, 0.0, "matched")
    assert got[2] == (7.0, 9.0, -2.0, "mismatched")
    assert got[3][3] == "fact_only" and got[3][0] == 1.0  # NULL measure drops
    assert got[4] == (None, 2.0, None, "rollup_only")
    # partitioning invariance of the quantized sum
    a = reconcile_aggregates(fact.repartition(7), rollup, ["k"], "m", "total")
    b = reconcile_aggregates(fact.repartition(1), rollup, ["k"], "m", "total")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # tolerance boundary: |delta| == tol is matched (strict >)
    edge = reconcile_aggregates(
        spark.createDataFrame([(9, 1.01)], "k long, m double"),
        spark.createDataFrame([(9, 1.0)], "k long, total double"),
        ["k"], "m", "total", tol=0.01,
    ).collect()[0]
    assert edge.status == "matched"
