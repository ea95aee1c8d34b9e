"""Count-Min Sketch: one-sided error, exact linearity (mergeability),
zero-for-absent probes, and the shape guard."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.cms import (
    cms_build,
    cms_merge,
    cms_query,
)


def _terms(spark, words):
    return spark.createDataFrame([(w,) for w in words], "term string")


def _exact(words):
    out = {}
    for w in words:
        out[w] = out.get(w, 0) + 1
    return out


def test_cms_estimate_is_one_sided(spark):
    # tiny width forces collisions: every estimate must be >= truth and
    # <= truth + total stream length (the trivial upper bound)
    words = [f"w{i % 7}" for i in range(50)] + ["hot"] * 30
    df = _terms(spark, words)
    sk = cms_build(df, "term", width=4, depth=2)
    probes = _terms(spark, sorted(set(words)))
    got = {
        r.term: r.cms_est
        for r in cms_query(sk, probes, "term", width=4, depth=2).collect()
    }
    exact = _exact(words)
    for w, n in exact.items():
        assert n <= got[w] <= n + len(words), (w, n, got[w])


def test_cms_exact_when_no_collisions(spark):
    # wide sketch over a tiny vocabulary: estimates are exact counts
    words = ["a"] * 5 + ["b"] * 3 + ["c"]
    df = _terms(spark, words)
    sk = cms_build(df, "term", width=4096, depth=4)
    got = {
        r.term: r.cms_est
        for r in cms_query(sk, _terms(spark, ["a", "b", "c"]), "term", width=4096, depth=4).collect()
    }
    assert got == {"a": 5, "b": 3, "c": 1}


def test_cms_linearity_merge_equals_union(spark):
    # CMS is linear: sketch(A ⊎ B) == sketch(A) + sketch(B), cell for cell
    a = _terms(spark, [f"x{i % 11}" for i in range(40)])
    b = _terms(spark, [f"x{i % 5}" for i in range(25)] + ["only_b"] * 3)
    w, d = 64, 3
    merged = {
        (r.row_idx, r.col_idx): r.cnt
        for r in cms_merge(
            cms_build(a, "term", width=w, depth=d),
            cms_build(b, "term", width=w, depth=d),
        ).collect()
    }
    direct = {
        (r.row_idx, r.col_idx): r.cnt
        for r in cms_build(a.unionByName(b), "term", width=w, depth=d).collect()
    }
    assert merged == direct


def test_cms_absent_probe_is_zero_and_nulls_excluded(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "term string")
    sk = cms_build(df, "term", width=4096, depth=4)
    got = {
        r.term: r.cms_est
        for r in cms_query(
            sk, _terms(spark, ["a", "never_seen"]), "term", width=4096, depth=4
        ).collect()
    }
    # null input rows carry no frequency; an unsketched term provably
    # estimates 0 only if none of its cells collide (true at this width)
    assert got == {"a": 2, "never_seen": 0}


def test_cms_shape_guard(spark):
    df = _terms(spark, ["a"])
    with pytest.raises(ValueError, match="width >= 2"):
        cms_build(df, "term", width=1, depth=4)
    with pytest.raises(ValueError, match="broadcast guard"):
        cms_build(df, "term", width=20_000_000, depth=4)


def test_cms_build_one_exchange(spark):
    # the whole build is scan -> explode -> partial agg -> ONE Exchange
    df = _terms(spark, [f"w{i}" for i in range(100)])
    plan = cms_build(df, "term", width=128, depth=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
