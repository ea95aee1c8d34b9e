"""Salted uniqueness: golden duplicated-key assertions (reference pattern:
the duplicate id is exactly "i19" — UniquenessEvaluatorTest.java:37-58)."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.model import CheckId
from gbif_data_validator_spark.operators.uniqueness import (
    duplicate_keys,
    uniqueness_violations,
)
from gbif_data_validator_spark.sources.synthetic import expected_duplicate_urls
from tests.conftest import N_FIXTURE_ROWS


def test_golden_duplicate_urls(spark, pages):
    expected = {r.url for r in expected_duplicate_urls(spark, N_FIXTURE_ROWS).collect()}
    assert len(expected) > 0
    got = {r.url for r in uniqueness_violations(pages).collect()}
    assert got == expected


def test_duplicate_counts_are_exact(spark):
    df = spark.createDataFrame(
        [("a",), ("b",), ("a",), ("a",), ("c",), ("b",)], schema="url string"
    )
    rows = {r.url: r.dup_count for r in duplicate_keys(df, "url").collect()}
    assert rows == {"a": 3, "b": 2}


def test_salting_is_count_preserving(spark):
    """Two-phase salted agg must give identical results to a plain groupBy
    for every salt width."""
    df = spark.range(0, 3000).select((F.col("id") % 7).cast("string").alias("url"))
    plain = {r.url: r.c for r in df.groupBy("url").agg(F.count("*").alias("c")).collect()}
    for n_salt in (1, 4, 64):
        salted = {r.url: r.dup_count for r in duplicate_keys(df, "url", n_salt).collect()}
        assert salted == plain


def test_empty_keys_excluded(spark, pages):
    """Empty/null urls are KEY_EMPTY findings (pass 1), never uniqueness
    duplicates — mirrors the reference's separate empty-id scan
    (ReferentialIntegrityEvaluator.java:74-86)."""
    v = uniqueness_violations(pages)
    assert v.where((F.col("url") == "") | F.col("url").isNull()).count() == 0
    assert v.where(F.col("check_id") != CheckId.RECORD_NOT_UNIQUELY_IDENTIFIED).count() == 0


def test_salted_plan_is_two_phase(spark):
    """The salting contract (BASELINE.json: 'skew handled with explicit key
    salting') must be visible in the physical plan: TWO shuffle exchanges —
    partial agg keyed (key, salt), final re-agg keyed (key) — so a hot key's
    rows split across reducers before the tiny re-aggregation."""
    import re

    df = spark.range(0, 1000).select((F.col("id") % 5).cast("string").alias("url"))
    plan = duplicate_keys(df, "url", n_salt=16)._jdf.queryExecution().executedPlan().toString()
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) == 2, plan
    phase1 = [e for e in exchanges if "salt" in e]
    assert phase1, exchanges          # partial phase keyed by (k, salt)
    assert any("salt" not in e for e in exchanges), exchanges  # final by k


def test_data_field_uniqueness_violations(spark):
    """A2 DataUniquenessEvaluator analog: duplicates on a data column emit
    DATA_FIELD_NOT_UNIQUE with the column recorded; blanks excluded."""
    from gbif_data_validator_spark.operators.uniqueness import (
        data_uniqueness_violations,
    )

    df = spark.createDataFrame(
        [("u1", "d1"), ("u2", "d1"), ("u3", "d2"), ("u4", ""), ("u5", ""), ("u6", None)],
        schema="url string, digest string",
    )
    v = data_uniqueness_violations(df, "digest").collect()
    assert len(v) == 1
    r = v[0]
    assert r.url == "digest:d1"
    assert r.check_id == CheckId.DATA_FIELD_NOT_UNIQUE
    assert r.found == "count=2"
    assert r.related_data["column"] == "digest"


def test_engine_data_unique_cols(spark, pages):
    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

    cfg = EngineConfig(check_extraction=False, data_unique_cols=("lang",))
    report = ValidationEngine(spark, cfg).run(pages.drop("expected_issue"))
    # every lang value repeats → one DATA_FIELD_NOT_UNIQUE row per value
    assert report.issue_counts.get(CheckId.DATA_FIELD_NOT_UNIQUE, 0) >= 1
