"""Embedding-column health census (operators/vectors.py)."""

from __future__ import annotations

import pyspark.sql.functions as F  # noqa: F401  (parity with sibling tests)
import pytest

from gbif_data_validator_spark.operators.vectors import embedding_health

NAN = float("nan")
INF = float("inf")

ROWS = [
    # (group, vector)
    ("a", [3.0, 4.0]),          # norm 5.0
    ("a", [0.0, 0.0]),          # zero vector
    ("a", None),                # null vector
    ("a", [1.0, NAN]),          # non-finite
    ("b", [6.0, 8.0]),          # norm 10.0
    ("b", [1.0, 2.0, 2.0]),     # dim mismatch (norm 3.0)
    ("b", [INF, 1.0]),          # non-finite (Inf flavour)
]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(ROWS, "g string, v array<double>")


def test_grouped_census(vec_df):
    out = {
        r.g: r
        for r in embedding_health(vec_df, "v", ["g"], expected_dim=2).collect()
    }
    a, b = out["a"], out["b"]
    assert (a.n_rows, a.n_null_vec, a.n_nonfinite, a.n_zero) == (4, 1, 1, 1)
    assert a.n_dim_mismatch == 0
    assert (a.dims_min, a.dims_max) == (2, 2)
    # finite vectors in a: norms 5.0 and 0.0 — exact micro-unit math
    assert (a.norm_min, a.norm_max, a.norm_avg) == (0.0, 5.0, 2.5)
    assert (b.n_rows, b.n_null_vec, b.n_nonfinite, b.n_zero) == (3, 0, 1, 0)
    assert b.n_dim_mismatch == 1
    assert (b.dims_min, b.dims_max) == (2, 3)
    assert (b.norm_min, b.norm_max, b.norm_avg) == (3.0, 10.0, 6.5)


def test_global_mode_and_no_expected_dim(vec_df):
    row = embedding_health(vec_df, "v").collect()[0]
    assert row.n_rows == 7 and row.n_null_vec == 1
    assert row.n_dim_mismatch == 0  # no contract supplied -> no mismatches
    assert row.n_nonfinite == 2 and row.n_zero == 1


def test_all_null_group(spark):
    df = spark.createDataFrame([("x", None)], "g string, v array<double>")
    row = embedding_health(df, "v", ["g"]).collect()[0]
    assert row.n_null_vec == 1
    assert row.dims_min is None and row.norm_avg is None


def test_plan_single_exchange(vec_df):
    """Raw vectors never shuffle: one hash-aggregate Exchange total."""
    plan = (
        embedding_health(vec_df, "v", ["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
