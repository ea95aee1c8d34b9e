"""Bloom pre-filtered referential: exactness vs the plain anti-join at any
bitmap size (the filter may only change the physical plan), no-false-negative
invariant, auto-sizing, and the plan shape (definite-miss branch never
shuffles the fact side)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.bloom import (
    MAX_BITS,
    bloom_build,
    bloom_might_contain,
    orphan_rows_bloom,
    size_bits,
)


@pytest.fixture(scope="module")
def fact_dim(spark):
    # keys 0..13999 in fact; multiples of 7 below 7000 in dim, plus nulls
    # and a blank-ish string on the fact side to pin the non_blank contract
    fact = spark.range(0, 14000).select(F.col("id").alias("k"), F.lit("x").alias("v"))
    fact = fact.unionByName(
        spark.createDataFrame([(None, "nullkey")], "k: bigint, v: string")
    )
    dim = spark.range(0, 1000).select((F.col("id") * 7).alias("dk"))
    dim = dim.unionByName(spark.createDataFrame([(None,)], "dk: bigint"))
    return fact, dim


def test_exact_vs_anti_join(spark, fact_dim):
    fact, dim = fact_dim
    got = orphan_rows_bloom(fact, dim, "k", "dk").select("k", "v")
    expected = fact.where(F.col("k").isNotNull()).join(
        dim.select(F.col("dk").alias("k")).distinct(), "k", "left_anti"
    ).select("k", "v")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


@pytest.mark.parametrize("n_bits", [1 << 16, 1 << 10])
def test_exact_at_any_bitmap_size(spark, fact_dim, n_bits):
    """Even an absurdly undersized (high-fp) bitmap must stay exact — fp
    only shrinks the definite-miss branch, never the result."""
    fact, dim = fact_dim
    got = orphan_rows_bloom(fact, dim, "k", "dk", n_bits=n_bits)
    assert got.count() == 13000


def test_no_false_negatives(spark, fact_dim):
    """Every dim key must probe true (bloom containment invariant)."""
    _, dim = fact_dim
    bloom_df, n_bits = bloom_build(dim, "dk", n_bits=1 << 16)
    probes = (
        dim.where(F.col("dk").isNotNull())
        .crossJoin(F.broadcast(bloom_df))
        .where(~bloom_might_contain(F.col("dk"), n_bits))
    )
    assert probes.count() == 0


def test_prefilter_actually_prunes(spark, fact_dim):
    """At a healthy size the candidate set should be close to |matches|:
    far fewer fact rows reach the anti-join than exist."""
    fact, dim = fact_dim
    bloom_df, n_bits = bloom_build(dim, "dk", n_bits=1 << 16)
    cand = (
        fact.where(F.col("k").isNotNull())
        .crossJoin(F.broadcast(bloom_df))
        .where(bloom_might_contain(F.col("k"), n_bits))
    )
    n_cand = cand.count()
    assert 1000 <= n_cand < 2000  # 1000 true matches + few false positives


def test_auto_sizing_and_cap():
    assert size_bits(0) == 1 << 16
    assert size_bits(10_000) == 1 << 17  # 120k bits → next pow2
    assert size_bits(10**12) == MAX_BITS  # capped, not unbounded


def test_oversize_raises(spark, fact_dim):
    _, dim = fact_dim
    with pytest.raises(ValueError, match="MAX_BITS"):
        bloom_build(dim, "dk", n_bits=MAX_BITS * 2)


def test_definite_branch_has_no_join(spark, fact_dim):
    """Plan shape: the definite-miss branch is scan → filter →
    broadcast-nested-loop against the 1-row bitmap — no shuffle Exchange,
    no SortMergeJoin of the fact side."""
    fact, dim = fact_dim
    bloom_df, n_bits = bloom_build(dim, "dk")
    probed = fact.where(F.col("k").isNotNull()).crossJoin(F.broadcast(bloom_df))
    definite = probed.where(~bloom_might_contain(F.col("k"), n_bits))
    plan = definite._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
