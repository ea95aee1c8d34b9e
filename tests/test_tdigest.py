"""t-digest UDAF: accuracy vs exact quantiles, merge associativity, and
bounded partial size (the explicit partial/merge/final collector pattern)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.tdigest import (
    _merge_centroids,
    _quantile,
    merged_digests,
    partial_digests,
    t_digest_quantiles,
)


def test_accuracy_on_skewed_data(spark):
    rng = np.random.RandomState(3)
    vals = rng.lognormal(mean=3.0, sigma=1.2, size=40_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "x double").repartition(8)

    probs = [0.01, 0.25, 0.5, 0.9, 0.99]
    got = dict(t_digest_quantiles(df, "x", probs, delta=100))
    exact = np.quantile(vals, probs)
    for p, e in zip(probs, exact):
        # t-digest rank error scales with q(1-q)/delta; generous bars
        assert abs(got[p] - e) / e < 0.08, (p, got[p], e)
    # tails are tight by construction
    assert abs(got[0.99] - exact[-1]) / exact[-1] < 0.05


def test_partial_digests_bounded_and_mergeable(spark):
    df = spark.range(0, 50_000).select(
        (F.col("id") % 1000).cast("double").alias("x")
    ).repartition(16)
    parts = partial_digests(df, "x", delta=100).collect()
    assert len(parts) >= 1
    for r in parts:
        assert len(r.means) == len(r.weights)
        # bounded: ~delta mid-quantile centroids + tail singletons (the
        # q(1-q) limit floors at one row near the extremes) — well under
        # the raw batch size either way
        assert len(r.means) <= 5 * 100
    # total weight is conserved through partial compression
    assert sum(sum(r.weights) for r in parts) == 50_000


def test_distributed_tree_merge_bounds_driver_collect(spark):
    """With many partitions (many per-batch partials), the tree-merge round
    must hand the driver ≤ n_merge digest rows — the 10^12-row guarantee
    that the final collect is O(n_merge), never O(#batches) — while the
    quantiles stay within tolerance of percentile_approx."""
    df = (
        spark.range(0, 100_000)
        .select((F.col("id") % 997).cast("double").alias("x"))
        .repartition(200)  # ≥200 partials going into the merge round
    )
    merged = merged_digests(df, "x", delta=100, n_merge=8).collect()
    assert 1 <= len(merged) <= 8
    assert sum(sum(r.weights) for r in merged) == 100_000  # nothing lost

    probs = [0.1, 0.5, 0.9]
    got = dict(t_digest_quantiles(df, "x", probs, delta=100, n_merge=8))
    ref = df.select(F.percentile_approx("x", probs, 10000).alias("q")).collect()[0].q
    for p, r in zip(probs, ref):
        assert abs(got[p] - r) <= 0.02 * 997, (p, got[p], r)


def test_merge_is_weight_conserving_and_sorted():
    rng = np.random.RandomState(7)
    m, w = _merge_centroids(rng.standard_normal(5000), np.ones(5000), delta=50)
    assert w.sum() == 5000
    assert np.all(np.diff(m) >= 0)
    # median of standard normal ≈ 0
    assert abs(_quantile(m, w, 0.5)) < 0.1


def test_empty_and_single_value(spark):
    empty = spark.createDataFrame([], "x double")
    got = t_digest_quantiles(empty, "x", [0.5])
    assert len(got) == 1 and got[0][1] != got[0][1]  # NaN
    one = spark.createDataFrame([(42.0,)], "x double")
    assert t_digest_quantiles(one, "x", [0.1, 0.9]) == [(0.1, 42.0), (0.9, 42.0)]
