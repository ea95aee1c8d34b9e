"""Temporal joins (operators/temporal.py): as-of join via union+window
(no join node at all) and interval join via bucket-explode equi-join
(never a BroadcastNestedLoopJoin)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.temporal import asof_join, interval_join


def _ts(m, s=0):
    return dt.datetime(2024, 1, 1, 12, m, s)


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: per-key "state changes"
    return spark.createDataFrame(
        [
            ("a", _ts(0), 1.0, 100),
            ("a", _ts(10), 2.0, 101),
            ("a", _ts(10), 3.0, 102),  # same instant — tiebreak decides
            ("a", _ts(30), 4.0, 103),
            ("b", _ts(5), 9.0, 200),
        ],
        "k string, ts timestamp, px double, qid long",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            ("a", _ts(0), 1),   # exact-match instant
            ("a", _ts(10), 2),  # two quotes at this instant
            ("a", _ts(20), 3),  # between quotes
            ("a", _ts(40), 4),  # after the last quote
            ("b", _ts(4), 5),   # before b's only quote
            ("c", _ts(1), 6),   # key with no quotes
        ],
        "k string, ts timestamp, tid long",
    )


def test_asof_backward_semantics(quotes, trades):
    got = {
        r.tid: (r.r_ts, r.r_px, r.r_qid)
        for r in asof_join(
            trades, quotes, on=["k"], right_cols=["px", "qid"], tiebreak=["qid"]
        ).collect()
    }
    assert got == {
        1: (_ts(0), 1.0, 100),    # inclusive at the exact instant
        2: (_ts(10), 3.0, 102),   # tie at same ts → max tiebreak wins
        3: (_ts(10), 3.0, 102),   # latest at-or-before
        4: (_ts(30), 4.0, 103),
    }
    # b's trade precedes b's only quote, c has no quotes → inner drops both
    assert 5 not in got and 6 not in got


def test_asof_strict_and_left_modes(quotes, trades):
    strict = {
        r.tid: r.r_qid
        for r in asof_join(
            trades, quotes, on=["k"], right_cols=["qid"], tiebreak=["qid"],
            allow_exact_matches=False,
        ).collect()
    }
    assert 1 not in strict            # exact instant excluded under strict <
    assert strict[2] == 100           # same-instant quotes excluded → prior one
    left = {
        r.tid: r.r_qid
        for r in asof_join(
            trades, quotes, on=["k"], right_cols=["qid"], tiebreak=["qid"],
            how="left",
        ).collect()
    }
    assert len(left) == 6 and left[5] is None and left[6] is None


def test_asof_plan_has_no_join(quotes, trades):
    plan = (
        asof_join(trades, quotes, on=["k"], right_cols=["qid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan, plan
    # exactly one exchange moves data: the hashpartitioning on the key
    assert plan.count("Exchange") == 1, plan


def test_interval_join_semantics(spark):
    iv = spark.createDataFrame(
        [("w1", _ts(0), _ts(10)), ("w2", _ts(5), _ts(15))],
        "wid string, lo timestamp, hi timestamp",
    )
    pts = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(7)), (3, _ts(10)), (4, _ts(20))],
        "pid long, ts timestamp",
    )
    got = {
        (r.pid, r.wid)
        for r in interval_join(pts, iv, "ts", "lo", "hi", bucket_seconds=60).collect()
    }
    # half-open: lo inclusive, hi exclusive; overlaps yield multiple rows
    assert got == {(1, "w1"), (2, "w1"), (2, "w2"), (3, "w2")}


def test_interval_join_plan_is_equi_join(spark):
    iv = spark.createDataFrame(
        [("w", _ts(0), _ts(10))], "wid string, lo timestamp, hi timestamp"
    )
    pts = spark.createDataFrame([(1, _ts(1))], "pid long, ts timestamp")
    plan = (
        interval_join(pts, iv, "ts", "lo", "hi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interval_join_bucket_bomb_raises(spark):
    iv = spark.createDataFrame(
        [("w", dt.datetime(2024, 1, 1), dt.datetime(2030, 1, 1))],
        "wid string, lo timestamp, hi timestamp",
    )
    pts = spark.createDataFrame([(1, _ts(1))], "pid long, ts timestamp")
    with pytest.raises(Exception, match="too many buckets"):
        interval_join(pts, iv, "ts", "lo", "hi", bucket_seconds=1).collect()


def test_interval_join_inverted_interval_dropped(spark):
    """end <= start contains nothing under half-open semantics; the dirty
    row must be dropped BEFORE the explode (sequence(lo, hi) with hi < lo
    is a descending-array row bomb that bypasses the bucket guard)."""
    iv = spark.createDataFrame(
        [
            ("ok", _ts(0), _ts(10)),
            # inverted by ~12 days: unguarded, this is a ~10^6-bucket bomb
            ("inv", dt.datetime(2024, 1, 13), dt.datetime(2024, 1, 1)),
            ("empty", _ts(5), _ts(5)),
        ],
        "wid string, lo timestamp, hi timestamp",
    )
    pts = spark.createDataFrame([(1, _ts(3))], "pid long, ts timestamp")
    got = {
        (r.pid, r.wid)
        for r in interval_join(pts, iv, "ts", "lo", "hi", bucket_seconds=1).collect()
    }
    assert got == {(1, "ok")}


def test_interval_join_auto_bucket(spark):
    """Default bucket_seconds=None sizes buckets from the median interval
    span (one 1-row agg) and matches the explicit-bucket result."""
    iv = spark.createDataFrame(
        [("w1", _ts(0), _ts(10)), ("w2", _ts(5), _ts(15)), ("w3", _ts(30), _ts(45))],
        "wid string, lo timestamp, hi timestamp",
    )
    pts = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(7)), (3, _ts(10)), (4, _ts(35)), (5, _ts(45))],
        "pid long, ts timestamp",
    )
    auto = {(r.pid, r.wid) for r in interval_join(pts, iv, "ts", "lo", "hi").collect()}
    explicit = {
        (r.pid, r.wid)
        for r in interval_join(pts, iv, "ts", "lo", "hi", bucket_seconds=7).collect()
    }
    assert auto == explicit == {(1, "w1"), (2, "w1"), (2, "w2"), (3, "w2"), (4, "w3")}
