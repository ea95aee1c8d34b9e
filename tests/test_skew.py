"""Salted join: result equivalence under planted skew + plan shape."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of fact rows share one hot key — the Zipf head of a web corpus
    fact = spark.createDataFrame(
        [(1 if i % 10 else (i // 10) % 5 + 2, f"row{i}") for i in range(200)],
        "k long, payload string",
    ).repartition(8)
    dim = spark.createDataFrame(
        [(j, f"dim{j}") for j in range(1, 8)], "dk long, label string"
    )
    return fact, dim


def test_salted_join_equals_plain_join(spark, skewed):
    fact, dim = skewed
    plain = sorted(
        (r.k, r.payload, r.dk, r.label)
        for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    salted = sorted(
        (r.k, r.payload, r.dk, r.label)
        for r in salted_join(fact, dim, "k", "dk", n_salts=8).collect()
    )
    assert salted == plain and len(plain) == 200


def test_salted_join_degenerate_one_salt(spark, skewed):
    fact, dim = skewed
    plain = sorted(
        (r.k, r.payload) for r in fact.join(dim, fact.k == dim.dk).collect()
    )
    one = sorted(
        (r.k, r.payload)
        for r in salted_join(fact, dim, "k", "dk", n_salts=1).collect()
    )
    assert one == plain


def test_salted_join_no_duplicate_matches(spark):
    # a right side with duplicate keys: each (left row, right row) pair must
    # appear exactly once despite the n_salts-fold replication
    left = spark.createDataFrame([(1, "a"), (1, "b")], "k long, s string")
    right = spark.createDataFrame([(1, "x"), (1, "y")], "rk long, t string")
    got = sorted(
        (r.s, r.t) for r in salted_join(left, right, "k", "rk", n_salts=4).collect()
    )
    assert got == [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]


def test_salted_join_plan_joins_on_salt(spark, skewed):
    fact, dim = skewed
    plan = (
        salted_join(fact, dim, "k", "dk", n_salts=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the join keys must include the salt (that is the whole mechanism) and
    # the right side must be replicated via a JVM-side explode
    assert "_salt" in plan, plan
    assert "explode" in plan.lower(), plan


def test_salted_join_rejects_bad_salt_count(spark, skewed):
    fact, dim = skewed
    with pytest.raises(ValueError, match="n_salts"):
        salted_join(fact, dim, "k", "dk", n_salts=0)
