"""Temporal joins Spark has no native operator for: as-of (point-in-time)
join and interval (range) join.

No reference analog (the reference is a single-snapshot validator); these
are the temporal primitives a crawl/event pipeline needs around the
validation engine (attribute a failure to the configuration active when the
page was fetched; find pages crawled inside an incident window).

Scale shapes:
- ``asof_join`` is NOT a join at all: both sides union into one stream and
  a single partitionBy(key) window carries the last right-side row forward
  — one shuffle, no join build side, no row explosion. The classic
  inequality-join formulation (l.ts >= r.ts + row_number) explodes to
  |L|×|R| per key before ranking; this stays |L|+|R|.
- ``interval_join`` equi-joins on a time BUCKET both sides are mapped to
  (intervals explode to the buckets they cover, points to the one they
  fall in), then refines exactly. Catalyst would otherwise plan a range
  predicate as BroadcastNestedLoopJoin — quadratic and driver-bound. The
  bucket join shuffles |P| + Σ(interval spans/bucket) rows, both linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: refuse to explode an interval into more buckets than this — a single
#: year-long interval at 1-second grain is a 3×10^7-row bomb, not a join
MAX_BUCKETS_PER_INTERVAL = 100_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: list[str] | None = None,
    allow_exact_matches: bool = True,
    how: str = "inner",
) -> DataFrame:
    """For every left row: the single most recent right row per ``on`` key
    with ``right_ts <= left_ts`` (backward as-of, pandas ``merge_asof``
    semantics; ``allow_exact_matches=False`` makes it strict ``<``).

    ``tiebreak`` orders right rows sharing a timestamp (last one wins) —
    pass a unique column for deterministic output. Output: all left
    columns + the matched ``right_cols`` (aliased ``r_{col}``); ``how``
    'inner' drops unmatched left rows, 'left' keeps them with nulls.

    Plan: union both sides, ONE window over (key, ts) carrying the last
    right payload forward — |L|+|R| rows through one Exchange, no join.
    Keys are expected at user/host grain; a single key's rows sort on one
    reducer, which is the operator's ordering requirement, not a bug —
    at web scale use host-grain keys, never a constant key."""
    right_cols = right_cols or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    tiebreak = tiebreak or []
    # right rows sort BEFORE a left row at the same instant iff exact
    # matches are allowed (inclusive <=), after it iff strict (<)
    l_rank, r_rank = (1, 0) if allow_exact_matches else (0, 1)
    payload = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in right_cols]
    )
    r_side = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(r_rank).alias("_side"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(tiebreak)],
        payload.alias("_r"),
        F.lit(None).alias("_l_marker"),
    )
    l_side = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(l_rank).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{i}")
          for i, c in enumerate(tiebreak)],
        F.lit(None).cast(r_side.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l_marker"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", *[f"_tb_{i}" for i in range(len(tiebreak))])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r_side.unionByName(l_side)
        .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
        .where(F.col("_l_marker").isNotNull())
    )
    if how == "inner":
        matched = matched.where(F.col("_match").isNotNull())
    return matched.select(
        *[F.col(f"_l_marker.{c}").alias(c) for c in left.columns],
        F.col("_match._rts").alias(f"r_{right_ts}"),
        *[F.col(f"_match.{c}").alias(f"r_{c}") for c in right_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """All (point, interval) pairs with ``start <= point_ts < end``
    (half-open). Output: every point column + every interval column; a
    point inside k overlapping intervals yields k rows.

    Plan: both sides map to ``bucket_seconds``-grain epoch buckets — the
    interval to EVERY bucket it covers (``sequence`` + ``explode``), the
    point to its one bucket — then a plain equi-join on the bucket plus the
    exact containment filter. This is a shuffled hash/sort-merge join that
    scales linearly, where the naive range predicate plans as a
    BroadcastNestedLoopJoin. ``bucket_seconds=None`` (default) auto-sizes
    to the MEDIAN interval span — one bounded 1-row agg — so a typical
    interval explodes to ~2 buckets; an interval covering more than
    ``MAX_BUCKETS_PER_INTERVAL`` buckets raises rather than exploding.

    Degenerate intervals (``end <= start``) contain nothing under the
    half-open semantics and are dropped BEFORE the explode — otherwise
    ``sequence(lo, hi)`` with ``hi < lo`` emits a DESCENDING array that
    bypasses the bucket-count guard (one dirty row, millions of spurious
    bucket rows)."""

    def _epoch_us(col: str) -> F.Column:
        # unix_micros rejects TIMESTAMP_NTZ (the type parquet timestamps
        # read back as); the cast is identity under the UTC session tz
        return F.unix_micros(F.col(col).cast("timestamp"))

    intervals = intervals.where(F.col(end_col) > F.col(start_col))
    if bucket_seconds is None:
        span_s = (_epoch_us(end_col) - _epoch_us(start_col)) / F.lit(1_000_000.0)
        med = intervals.agg(
            F.percentile_approx(span_s, 0.5).alias("_median_span")
        ).first()["_median_span"]
        bucket_seconds = max(1, int(med)) if med is not None else 60
    us = F.lit(int(bucket_seconds) * 1_000_000)

    p_b = (_epoch_us(point_ts) / us).cast("long").alias("_b")
    lo = (_epoch_us(start_col) / us).cast("long")
    # half-open end: the bucket of the last covered microsecond
    hi = ((_epoch_us(end_col) - 1) / us).cast("long")
    n_buckets = hi - lo + 1
    guard = F.when(
        n_buckets > F.lit(MAX_BUCKETS_PER_INTERVAL),
        F.raise_error(
            F.concat(
                F.lit("interval spans too many buckets ("),
                n_buckets.cast("string"),
                F.lit("); raise bucket_seconds"),
            )
        ).cast("long"),
    ).otherwise(hi)
    iv = intervals.withColumn("_b", F.explode(F.sequence(lo, guard)))
    pt = points.withColumn("_b", p_b)
    return (
        pt.join(iv, on="_b")
        .where(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_b")
    )
