"""Sequence/ordering checks: interval overlaps (SCD2), id-gap
completeness (bucketed == textbook global lag), out-of-order arrivals,
freshness/cadence verdicts — brute-force equivalence + plan shape."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.sequence import (
    cusum_changepoint,
    dispersion_census,
    freshness_by_group,
    id_gaps,
    interval_overlaps,
    out_of_order_rows,
    seasonality_profile,
    theil_sen_trend,
)


def _ts(day: int, hour: int = 0, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, minute)


# ---------------------------------------------------------------- intervals


def test_interval_overlaps_catches_containment_chain(spark):
    # key A: [1,10) swallows [2,3) and [4,5) — the adjacent-lag shortcut
    # would clear [4,5) (its immediate predecessor [2,3) ends before it);
    # the running max convicts both. [12,13) is clean.
    rows = [
        ("A", 1, _ts(1), _ts(10)),
        ("A", 2, _ts(2), _ts(3)),
        ("A", 3, _ts(4), _ts(5)),
        ("A", 4, _ts(12), _ts(13)),
        ("B", 5, _ts(2), _ts(4)),
        ("B", 6, _ts(4), _ts(6)),  # half-open [start,end): touching is NOT overlap
    ]
    df = spark.createDataFrame(
        rows, "k string, rid int, valid_from timestamp, valid_to timestamp"
    )
    got = interval_overlaps(
        df, ["k"], "valid_from", "valid_to", tiebreak=["rid"]
    ).collect()
    flagged = {(r.k, r.rid) for r in got}
    assert flagged == {("A", 2), ("A", 3)}
    by_rid = {r.rid: r for r in got}
    # both convicted by the rid=1 interval's end
    assert by_rid[2].prev_max_end == _ts(10)
    assert by_rid[3].prev_max_end == _ts(10)
    # overlap clipped to the row's own span: [2,3) fully inside -> 1 day
    assert by_rid[2].overlap_us == 86_400_000_000


def test_interval_overlaps_rejects_inverted_and_requires_tiebreak(spark):
    rows = [("A", 1, _ts(5), _ts(1)), ("A", 2, _ts(6), _ts(7))]
    df = spark.createDataFrame(
        rows, "k string, rid int, valid_from timestamp, valid_to timestamp"
    )
    # the inverted rid=1 interval is excluded from the running max, so the
    # later clean row is NOT convicted by garbage
    assert interval_overlaps(df, ["k"], "valid_from", "valid_to", ["rid"]).count() == 0
    with pytest.raises(ValueError, match="tiebreak"):
        interval_overlaps(df, ["k"], "valid_from", "valid_to", [])


def test_interval_overlaps_brute_force(spark):
    rng = random.Random(7)
    rows = []
    for rid in range(200):
        k = f"k{rng.randrange(4)}"
        s = rng.randrange(0, 500)
        rows.append((k, rid, _ts(1) + dt.timedelta(hours=s),
                     _ts(1) + dt.timedelta(hours=s + rng.randrange(1, 30))))
    df = spark.createDataFrame(
        rows, "k string, rid int, valid_from timestamp, valid_to timestamp"
    )
    got = {(r.k, r.rid) for r in
           interval_overlaps(df, ["k"], "valid_from", "valid_to", ["rid"]).collect()}
    expect = set()
    for k in {r[0] for r in rows}:
        ivs = sorted([r for r in rows if r[0] == k], key=lambda r: (r[2], r[1]))
        hi = None
        for (_, rid, s, e) in ivs:
            if hi is not None and s < hi:
                expect.add((k, rid))
            hi = e if hi is None else max(hi, e)
    assert got == expect


# ------------------------------------------------------------------- gaps


def _brute_gaps(ids: list[int]) -> set[tuple[int, int, int]]:
    u = sorted(set(ids))
    out = set()
    for a, b in zip(u, u[1:]):
        if b > a + 1:
            out.add((a + 1, b - 1, b - a - 1))
    return out


def test_id_gaps_matches_global_lag_brute_force(spark):
    rng = random.Random(11)
    ids = [i for i in range(5000) if rng.random() > 0.15] + [2500, 2500]
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    got = {(r.gap_start, r.gap_end, r.gap_len)
           for r in id_gaps(df, "event_id", bucket=100).collect()}
    assert got == _brute_gaps(ids)


def test_id_gaps_whole_missing_buckets_and_partitioning_invariance(spark):
    # ids 0-99 and 500-599 present: buckets 1-4 entirely missing -> one
    # boundary gap 100..499 spanning them
    ids = list(range(100)) + list(range(500, 600))
    df = spark.createDataFrame([(i,) for i in ids], "event_id long")
    for d in (df, df.repartition(7)):
        rows = id_gaps(d, "event_id", bucket=100).collect()
        assert [(r.gap_start, r.gap_end, r.gap_len) for r in rows] == [(100, 499, 400)]


def test_id_gaps_plan_never_globally_sorts_the_ids(spark):
    df = spark.range(0, 100_000).withColumnRenamed("id", "event_id").where(
        F.col("event_id") % 97 != 0
    )
    plan = id_gaps(df, "event_id", bucket=1000)._jdf.queryExecution().executedPlan().toString()
    # the id-level window shuffles on the bucket key...
    assert "hashpartitioning(_gap_bucket" in plan
    # ...and the only SinglePartition exchange feeds the per-bucket edge
    # aggregate (|ids|/bucket rows), never the raw ids
    single = [seg for seg in plan.split("Exchange") if seg.startswith(" SinglePartition")]
    assert len(single) == 1
    with pytest.raises(ValueError, match="bucket"):
        id_gaps(df, "event_id", bucket=1)


# ------------------------------------------------------------ out of order


def test_out_of_order_rows(spark):
    rows = [
        ("u1", 1, _ts(1, 10)),
        ("u1", 2, _ts(1, 9)),   # behind seq-1 high water (1h)
        ("u1", 3, _ts(1, 11)),
        ("u1", 4, _ts(1, 10, 30)),  # behind the RUNNING max (seq 3), not seq 3's lag
        ("u2", 5, _ts(1, 5)),
    ]
    df = spark.createDataFrame(rows, "k string, seq int, ts timestamp")
    got = {r.seq: r for r in out_of_order_rows(df, ["k"], "seq", "ts").collect()}
    assert set(got) == {2, 4}
    assert got[2].late_by_us == 3_600_000_000
    assert got[2].high_water_ts == _ts(1, 10)
    assert got[4].high_water_ts == _ts(1, 11)


# -------------------------------------------------------------- freshness


def test_freshness_by_group(spark):
    rows = (
        # "hot": 11 events, one per hour, last at day2 10:00 == global max
        [("hot", _ts(2, h)) for h in range(11)]
        # "stale": hourly cadence but silent since day1 06:00
        + [("stale", _ts(1, h)) for h in range(7)]
        # "single": one event — mean gap 0, never stale by definition
        + [("single", _ts(1, 12))]
    )
    df = spark.createDataFrame(rows, "src string, ts timestamp")
    out = {r.group_key: r for r in freshness_by_group(df, "src", "ts").collect()}
    assert out["hot"].lag_behind_us == 0 and not out["hot"].stale
    assert out["hot"].mean_gap_us == 3_600_000_000.0
    # stale: lag = 28h vs mean gap 1h -> 28 > 3×1
    assert out["stale"].lag_behind_us == 28 * 3_600_000_000
    assert out["stale"].stale
    assert out["single"].mean_gap_us == 0.0 and not out["single"].stale
    assert out["single"].n_rows == 1


def test_freshness_single_scan_plus_broadcast(spark):
    df = spark.createDataFrame(
        [("a", _ts(1)), ("b", _ts(2))], "src string, ts timestamp"
    )
    plan = freshness_by_group(df, "src", "ts")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# -- funnel + cohort retention -------------------------------------------------


def _iso(s):
    from datetime import datetime

    return datetime.fromisoformat(s)


def test_funnel_strict_ordering(spark):
    from gbif_data_validator_spark.operators.sequence import funnel_counts

    rows = [
        # u1 completes the whole funnel in order
        (1, _iso("2024-01-01T00:00:00"), "signup"),
        (1, _iso("2024-01-02T00:00:00"), "view"),
        (1, _iso("2024-01-03T00:00:00"), "purchase"),
        # u2 views BEFORE signing up -> stops at signup
        (2, _iso("2024-01-02T00:00:00"), "view"),
        (2, _iso("2024-01-03T00:00:00"), "signup"),
        # u3 same-instant view (not strictly after) -> stops at signup
        (3, _iso("2024-01-01T00:00:00"), "signup"),
        (3, _iso("2024-01-01T00:00:00"), "view"),
        # u4 never signs up -> counted nowhere
        (4, _iso("2024-01-01T00:00:00"), "view"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.step: r.n_users
        for r in funnel_counts(df, "user_id", "ts", "event_type",
                               ["signup", "view", "purchase"]).collect()
    }
    assert got == {"signup": 3, "view": 1, "purchase": 1}


def test_funnel_greedy_earliest_is_optimal(spark):
    from gbif_data_validator_spark.operators.sequence import funnel_counts

    # signup at t1, view at t2, ANOTHER signup at t3: greedy anchors at t1
    # so the t2 view counts (re-anchoring at t3 would lose it)
    rows = [
        (1, _iso("2024-01-01T00:00:00"), "signup"),
        (1, _iso("2024-01-02T00:00:00"), "view"),
        (1, _iso("2024-01-03T00:00:00"), "signup"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.step: r.n_users
        for r in funnel_counts(df, "user_id", "ts", "event_type",
                               ["signup", "view"]).collect()
    }
    assert got == {"signup": 1, "view": 1}


def test_cohort_retention_matrix(spark):
    from gbif_data_validator_spark.operators.sequence import cohort_retention

    rows = [
        (1, _iso("2024-01-01T10:00:00")),  # cohort 01-01
        (1, _iso("2024-01-03T09:00:00")),  # offset 2
        (1, _iso("2024-01-03T23:00:00")),  # same offset, counted once
        (2, _iso("2024-01-01T00:00:00")),  # cohort 01-01, offset 0 only
        (3, _iso("2024-01-02T00:00:00")),  # cohort 01-02
        (3, _iso("2024-03-01T00:00:00")),  # offset 59 > max_offset -> dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (str(r.cohort_date), r.offset_days): r.n_users
        for r in cohort_retention(df, "user_id", "ts", max_offset=30).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-02", 0): 1,
    }


def test_transition_census_bigram_and_tiebreak(spark):
    from gbif_data_validator_spark.operators.sequence import transition_census

    rows = [
        # u1: a -> b -> a; u2: a -> a; ties on ts broken by id (3 before 4)
        (1, 1, _iso("2024-01-01T00:00:00"), "a"),
        (2, 1, _iso("2024-01-02T00:00:00"), "b"),
        (3, 1, _iso("2024-01-03T00:00:00"), "z"),
        (4, 1, _iso("2024-01-03T00:00:00"), "a"),   # same ts as id 3
        (5, 2, _iso("2024-01-01T00:00:00"), "a"),
        (6, 2, _iso("2024-01-02T00:00:00"), "a"),
        (7, 3, _iso("2024-01-01T00:00:00"), "solo"),  # single event: no bigram
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r.from_type, r.to_type): r.n
        for r in transition_census(df, "user_id", "ts", "event_type", "event_id").collect()
    }
    # id tie-break: 3 ("z") precedes 4 ("a") -> b->z and z->a, never b->a
    assert got == {("a", "b"): 1, ("b", "z"): 1, ("z", "a"): 1, ("a", "a"): 1}


def test_transition_census_partition_invariant(spark):
    from gbif_data_validator_spark.operators.sequence import transition_census

    rows = [
        (i, i % 5, _iso(f"2024-01-{(i % 27) + 1:02d}T00:00:00"), "t" + str(i % 3))
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    a = {tuple(r) for r in transition_census(df, "user_id", "ts", "event_type", "event_id").collect()}
    b = {
        tuple(r)
        for r in transition_census(
            df.repartition(7, "event_id"), "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------- cusum


def _volume_rows(day_counts: list[int]) -> list[tuple]:
    """day i (1-based) gets day_counts[i-1] rows, spread within the day."""
    rows = []
    for i, n in enumerate(day_counts, start=1):
        for j in range(n):
            rows.append((f"e{i}_{j}", _ts(i, hour=j % 24, minute=j % 60)))
    return rows


def test_cusum_finds_injected_level_shift(spark):
    # 10 days at ~20/day, then 10 days at ~60/day: the shift lands after
    # day 10, no single day is an outlier vs its own level.
    counts = [20, 21, 19, 20, 22, 18, 20, 21, 19, 20,
              60, 61, 59, 60, 62, 58, 60, 61, 59, 60]
    df = spark.createDataFrame(_volume_rows(counts), ["id", "ts"])
    out = cusum_changepoint(df, "ts", window="day").orderBy("bucket").collect()
    assert len(out) == 20
    change = [r for r in out if r.is_change_point]
    assert len(change) == 1
    # |S_k| peaks at the last pre-shift bucket (k=10, day 10)
    assert change[0].k == 10
    assert change[0].bucket.day == 10
    # exact integer level means: before = 20.0/day, after = 60.0/day
    assert change[0].mean_before_micro == 20_000_000
    assert change[0].mean_after_micro == 60_000_000


def test_cusum_matches_integer_brute_force(spark):
    random.seed(7)
    counts = [random.randint(1, 30) for _ in range(15)]
    df = spark.createDataFrame(_volume_rows(counts), ["id", "ts"])
    out = {r.k: r for r in cusum_changepoint(df, "ts", "day").collect()}
    total, n_b = sum(counts), len(counts)
    cum = 0
    best = None  # (abs_s, k) with earliest-k tie-break
    for k, n in enumerate(counts, start=1):
        cum += n
        s = n_b * cum - k * total
        assert out[k].n == n
        assert out[k].cusum_scaled == s
        assert out[k].mean_before_micro == (1_000_000 * cum) // k
        if k < n_b:
            assert out[k].mean_after_micro == (1_000_000 * (total - cum)) // (n_b - k)
        else:
            assert out[k].mean_after_micro is None
        if best is None or (abs(s), k) < best:
            # python tuple order == (abs desc, bucket asc) rank inverted
            pass
        cand = (-abs(s), k)
        if best is None or cand < best:
            best = cand
    for k, r in out.items():
        assert r.is_change_point == ((-abs(r.cusum_scaled), k) == best)


def test_cusum_constant_series_reports_first_bucket_zero_delta(spark):
    df = spark.createDataFrame(_volume_rows([5] * 8), ["id", "ts"])
    out = cusum_changepoint(df, "ts", "day").orderBy("bucket").collect()
    assert all(r.cusum_scaled == 0 for r in out)
    change = [r for r in out if r.is_change_point]
    assert len(change) == 1 and change[0].k == 1
    assert change[0].mean_before_micro == change[0].mean_after_micro == 5_000_000


def test_cusum_one_input_scan(spark):
    df = spark.createDataFrame(_volume_rows([3, 4, 5]), ["id", "ts"])
    plan = cusum_changepoint(df, "ts", "day")._jdf.queryExecution().executedPlan().toString()
    # all window passes run over the bucket table: exactly one scan of df
    assert plan.count("Scan ExistingRDD") <= 1


# ------------------------------------------------------- theil-sen trend


def test_theil_sen_matches_integer_brute_force(spark):
    random.seed(11)
    counts = [random.randint(1, 40) for _ in range(14)]
    df = spark.createDataFrame(_volume_rows(counts), ["id", "ts"])
    row = theil_sen_trend(df, "ts", "day").collect()[0]

    B = len(counts)
    pairs = []
    mk_s = 0
    for i in range(B):
        for j in range(i + 1, B):
            d = counts[j] - counts[i]
            g = j - i
            q = abs(1_000_000 * d) // g  # truncation toward zero
            pairs.append((-q if d < 0 else q, i + 1, j + 1))
            mk_s += (d > 0) - (d < 0)
    pairs.sort()
    n_pairs = len(pairs)
    slope = pairs[(n_pairs + 1) // 2 - 1][0]  # lower median, 1-based rank
    resid = sorted(
        (1_000_000 * counts[k - 1] - slope * k, k) for k in range(1, B + 1)
    )
    intercept = resid[(B + 1) // 2 - 1][0]

    assert row.n_buckets == B
    assert row.n_pairs == n_pairs
    assert row.slope_micro == slope
    assert row.intercept_micro == intercept
    assert row.mk_s == mk_s
    want = "increasing" if mk_s > 0 else "decreasing" if mk_s < 0 else "flat"
    assert row.trend == want


def test_theil_sen_robust_to_outlier_day(spark):
    # clean +3/day trend with one 10x spike: least squares would bend,
    # the pairwise median must not — slope stays exactly 3.0/day
    counts = [10 + 3 * i for i in range(11)]
    counts[5] = 400
    df = spark.createDataFrame(_volume_rows(counts), ["id", "ts"])
    row = theil_sen_trend(df, "ts", "day").collect()[0]
    assert row.slope_micro == 3_000_000
    assert row.trend == "increasing"


def test_theil_sen_single_bucket_degenerate(spark):
    df = spark.createDataFrame(_volume_rows([7]), ["id", "ts"])
    row = theil_sen_trend(df, "ts", "day").collect()[0]
    assert row.n_buckets == 1
    assert row.n_pairs == 0
    assert row.slope_micro is None
    assert row.mk_s == 0
    assert row.trend == "flat"


def test_theil_sen_one_input_scan(spark):
    df = spark.createDataFrame(_volume_rows([3, 4, 5]), ["id", "ts"])
    out = theil_sen_trend(df, "ts", "day")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the bucket table local-checkpoints eagerly: every scan in the
    # result plan reads the checkpointed (bucket, n, k) blocks — the
    # corpus columns never reappear (no re-scan), and no cache-manager
    # entry is left behind
    assert "Scan ExistingRDD[id" not in plan
    assert plan.count("Scan ExistingRDD[bucket") >= 3
    assert out.collect()[0].n_buckets == 3


# -------------------------------------------------- seasonality profile


def test_seasonality_profile_exact_counts_and_peaks(spark):
    # day 1..7 of June 2024: 2024-06-01 is a Saturday (isodow 6)
    rows = []
    for day in range(1, 8):
        for h, reps in ((3, 2), (12, 5), (20, 1)):
            for r in range(reps):
                rows.append((f"{day}_{h}_{r}", _ts(day, hour=h, minute=r)))
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = seasonality_profile(df, "ts").collect()
    assert len(out) == 21  # 7 dows x 3 hours
    by_cell = {(r.dow, r.hour): r for r in out}
    assert set(r.dow for r in out) == set(range(1, 8))
    for (dow, hour), r in by_cell.items():
        assert r.dow_total == 8
        assert r.n == {3: 2, 12: 5, 20: 1}[hour]
        assert r.share_micro == (1_000_000 * r.n) // 8
        assert r.is_peak_hour == (hour == 12)


def test_seasonality_peak_tie_breaks_to_earliest_hour(spark):
    rows = [("a", _ts(3, hour=5)), ("b", _ts(3, hour=9))]
    df = spark.createDataFrame(rows, ["id", "ts"])
    out = {r.hour: r.is_peak_hour for r in seasonality_profile(df, "ts").collect()}
    assert out == {5: True, 9: False}


# ------------------------------------------------------ dispersion census


def test_dispersion_exact_micro_value(spark):
    # hours with counts [2, 4, 6]: mean=4, Var=8/3, D=2/3 -> 666666 micro
    rows = []
    for h, n in ((0, 2), (1, 4), (2, 6)):
        for j in range(n):
            rows.append((f"{h}_{j}", _ts(1, hour=h, minute=j)))
    df = spark.createDataFrame(rows, ["id", "ts"])
    row = dispersion_census(df, "ts", "hour").collect()[0]
    assert row.n_buckets == 3
    assert row.total == 12
    assert row.mean_micro == 4_000_000
    # exact: (10^6 * (3*56 - 144)) // (3*12) with division-exact trick
    num = 1_000_000 * (3 * 56 - 144)
    den = 3 * 12
    assert row.dispersion_micro == (num - num % den) // den == 666_666
    # D = 2/3 sits inside the [0.5, 1.5] poisson-like band
    assert row.regime == "poisson-like"


def test_dispersion_constant_series_is_zero(spark):
    rows = [(f"{h}_{j}", _ts(1, hour=h, minute=j)) for h in range(6) for j in range(5)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    row = dispersion_census(df, "ts", "hour").collect()[0]
    assert row.dispersion_micro == 0
    assert row.regime == "underdispersed"


def test_dispersion_overdispersed_bursts(spark):
    # alternating 1 / 19 per hour: mean=10, Var=81, D=8.1
    rows = []
    for h in range(10):
        n = 1 if h % 2 == 0 else 19
        for j in range(n):
            rows.append((f"{h}_{j}", _ts(2, hour=h, minute=j)))
    df = spark.createDataFrame(rows, ["id", "ts"])
    row = dispersion_census(df, "ts", "hour").collect()[0]
    assert row.dispersion_micro == 8_100_000
    assert row.regime == "overdispersed"


def test_dispersion_partition_invariant(spark):
    random.seed(3)
    rows = [(f"r{i}", _ts(1 + i % 9, hour=i % 24, minute=i % 60)) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "ts"])
    a = dispersion_census(df.repartition(1), "ts", "hour").collect()[0]
    b = dispersion_census(df.repartition(13), "ts", "hour").collect()[0]
    assert a == b


def test_monitors_counts_fast_path_parity(spark):
    """The engine's volume_monitor face feeds all four monitors one shared
    pre-counted bucket table — results must be identical to the raw path."""
    random.seed(5)
    day_counts = [random.randint(5, 40) for _ in range(12)]
    df = spark.createDataFrame(_volume_rows(day_counts), ["id", "ts"])
    counts = df.groupBy(F.date_trunc("day", F.col("ts")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    from gbif_data_validator_spark.operators.sequence import rate_anomaly

    for op in (rate_anomaly, cusum_changepoint, theil_sen_trend, dispersion_census):
        raw = sorted(map(tuple, op(df, "ts", "day").collect()))
        fast = sorted(map(tuple, op(df, "ts", "day", counts=counts).collect()))
        assert raw == fast, op.__name__


# ------------------------------------------------------- grouped cusum


def _keyed_volume_rows(series: dict) -> list[tuple]:
    rows = []
    for key, day_counts in series.items():
        for i, n in enumerate(day_counts, start=1):
            for j in range(n):
                rows.append((key, f"{key}_{i}_{j}", _ts(i, hour=j % 24, minute=j % 60)))
    return rows


def test_group_cusum_finds_per_key_shifts(spark):
    from gbif_data_validator_spark.operators.sequence import group_cusum_shifts

    series = {
        "lost":  [30, 31, 29, 30, 10, 11, 9, 10],   # halves after day 4
        "gained": [5, 5, 6, 5, 20, 21, 19, 20],      # quadruples after day 4
        "flat":  [12, 12, 12, 12, 12, 12, 12, 12],
        "tiny":  [3, 4],                              # < min_buckets: excluded
    }
    df = spark.createDataFrame(_keyed_volume_rows(series), ["key", "id", "ts"])
    out = {r.key: r for r in group_cusum_shifts(df, "key", "ts", "day").collect()}
    assert set(out) == {"lost", "gained", "flat"}
    assert out["lost"].k == 4 and out["lost"].shift_micro < 0
    assert out["gained"].k == 4 and out["gained"].shift_micro > 0
    # exact side means
    assert out["lost"].mean_before_micro == 30_000_000
    assert out["lost"].mean_after_micro == 10_000_000
    assert out["lost"].shift_micro == -20_000_000
    # constant series: argmax |S|=0 everywhere -> earliest bucket, shift 0... 
    # (k=1: mean_before == n_1, mean_after == mean of rest, both 12)
    assert out["flat"].cusum_scaled == 0
    assert out["flat"].k == 1
    assert out["flat"].shift_micro == 0


def test_group_cusum_matches_global_on_single_key(spark):
    from gbif_data_validator_spark.operators.sequence import group_cusum_shifts

    counts = [20, 21, 19, 20, 60, 61, 59, 60]
    df = spark.createDataFrame(_volume_rows(counts), ["id", "ts"]).withColumn(
        "key", F.lit("all")
    )
    grp = group_cusum_shifts(df, "key", "ts", "day").collect()[0]
    glob = [
        r
        for r in cusum_changepoint(df, "ts", "day").collect()
        if r.is_change_point
    ][0]
    assert (grp.bucket, grp.k, grp.cusum_scaled) == (
        glob.bucket, glob.k, glob.cusum_scaled
    )
    assert grp.mean_before_micro == glob.mean_before_micro
    assert grp.mean_after_micro == glob.mean_after_micro


def test_group_cusum_partition_invariant_no_single_partition_window(spark):
    from gbif_data_validator_spark.operators.sequence import group_cusum_shifts

    series = {f"h{i}": [10 + i, 11, 9, 30 + i, 31, 29] for i in range(6)}
    df = spark.createDataFrame(_keyed_volume_rows(series), ["key", "id", "ts"])
    a = sorted(map(tuple, group_cusum_shifts(df.repartition(1), "key", "ts").collect()))
    b = sorted(map(tuple, group_cusum_shifts(df.repartition(13), "key", "ts").collect()))
    assert a == b and len(a) == 6
    plan = (
        group_cusum_shifts(df, "key", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # every window partitions by key: the plan must not contain a
    # SinglePartition exchange (the non-scalable global-window shape)
    assert "SinglePartition" not in plan
