"""Sequence / ordering data-quality checks: validity-interval overlaps,
ID-sequence completeness (gap detection), out-of-order arrival detection,
and per-group freshness/cadence.

No reference analog (gbif-data-validator validates a single snapshot with
no ordering semantics); these are the continuity checks an always-on crawl
ingestion pipeline needs around the validation engine: did two config
epochs for the same host overlap, did the fetcher skip a WARC id range,
did a source's pages arrive out of crawl order, has a source gone stale.

Scale shapes:
- ``interval_overlaps`` / ``out_of_order_rows`` are ONE window over
  (key, order) — a single hash Exchange on the key, running ``max`` over
  the frame, no join, no explosion. Keys are expected at host/user grain;
  a constant key serializes onto one reducer (same stated contract as
  ``temporal.asof_join``).
- ``id_gaps`` finds holes in a dense id sequence WITHOUT a global sort:
  ids hash-shuffle once on ``id // bucket`` (window per bucket finds
  interior holes), and only the tiny per-bucket ``(min, max)`` aggregate
  — |ids| / bucket rows, e.g. 10^6 rows for 10^12 ids at bucket=10^6 —
  crosses a single-partition window to stitch boundary/whole-bucket
  holes. A naive ``lag() OVER (ORDER BY id)`` plans a SinglePartition
  Exchange over ALL ids, which is the non-scalable shape this operator
  exists to avoid.
- ``freshness_by_group`` is one groupBy agg plus a 1-row global-max
  broadcast crossJoin (the house pattern from boilerplate census).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "interval_overlaps",
    "id_gaps",
    "out_of_order_rows",
    "freshness_by_group",
    "cusum_changepoint",
    "theil_sen_trend",
    "seasonality_profile",
    "dispersion_census",
    "group_cusum_shifts",
]



def _us(c: F.Column) -> F.Column:
    # unix_micros rejects TIMESTAMP_NTZ (the type parquet timestamps load
    # as); the cast is value-preserving under the session UTC timezone,
    # and every use below is a DIFFERENCE, so any fixed offset cancels.
    return F.unix_micros(c.cast("timestamp"))

def interval_overlaps(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tiebreak: list[str],
) -> DataFrame:
    """Rows whose ``[start, end)`` interval overlaps ANY earlier interval
    of the same key (SCD2 / validity-epoch invariant: per-key intervals
    must not overlap).

    A row is flagged when ``start < max(end)`` over all preceding rows of
    the key in ``(start, *tiebreak)`` order — the running-max formulation
    detects every overlapping row in one pass where the adjacent-``lag``
    shortcut misses containment chains (a long interval swallowing several
    later short ones). ``tiebreak`` must make the ordering total or the
    preceding-frame max is nondeterministic.

    Output: the flagged rows' key + tiebreak + interval columns plus
    ``prev_max_end`` (the running max that convicts them) and
    ``overlap_us`` (microseconds, clipped to the row's own span; > 0 by
    construction — exact integer arithmetic, no float epoch). Inverted
    intervals (``end <= start``) are rejected loudly rather than silently
    folded into the running max — the same dirty-row discipline as
    ``temporal.interval_join``.
    """
    if not tiebreak:
        raise ValueError("interval_overlaps: tiebreak columns are required "
                         "for a deterministic preceding-frame max")
    s, e = F.col(start_col), F.col(end_col)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(s, *[F.col(c) for c in tiebreak])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    clean = df.where(e > s)
    prev_end = F.max(e).over(w)
    return (
        clean.select(
            *key_cols,
            *tiebreak,
            s.alias(start_col),
            e.alias(end_col),
            prev_end.alias("prev_max_end"),
        )
        .where(F.col("prev_max_end") > s)
        .withColumn(
            "overlap_us",
            (
                _us(F.least(F.col(end_col), F.col("prev_max_end")))
                - _us(F.col(start_col))
            ).cast("long"),
        )
    )


def id_gaps(df: DataFrame, id_col: str, bucket: int = 1_000_000) -> DataFrame:
    """Missing ranges in a dense integer id sequence →
    ``(gap_start, gap_end, gap_len)`` per hole, between the observed min
    and max id (duplicates collapse; holes before the min / after the max
    are unobservable and not reported).

    Two-level plan instead of a global sort: interior holes come from a
    ``lag`` window per ``id // bucket`` partition (one hash Exchange over
    the ids); boundary holes — including whole missing buckets — come
    from a ``lag`` over the per-bucket ``(min, max)`` aggregate, which is
    |ids| / bucket rows and is the ONLY thing that crosses a
    single-partition window. Result is identical to the textbook
    ``lag() OVER (ORDER BY id)`` scan (the pytest pins it) without ever
    materializing a total order of the ids.
    """
    if bucket < 2:
        raise ValueError(f"id_gaps: bucket must be >= 2, got {bucket}")
    ids = df.select(F.col(id_col).cast("long").alias("id")).where(
        F.col("id").isNotNull()
    ).distinct()
    bucketed = ids.withColumn("_gap_bucket", F.floor(F.col("id") / bucket))

    in_w = Window.partitionBy("_gap_bucket").orderBy("id")
    interior = (
        bucketed.withColumn("_prev", F.lag("id").over(in_w))
        .where(F.col("id") > F.col("_prev") + 1)
        .select(
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col("id") - 1).alias("gap_end"),
        )
    )

    edges = bucketed.groupBy("_gap_bucket").agg(
        F.min("id").alias("_lo"), F.max("id").alias("_hi")
    )
    edge_w = Window.orderBy("_gap_bucket")
    boundary = (
        edges.withColumn("_prev_hi", F.lag("_hi").over(edge_w))
        .where(F.col("_lo") > F.col("_prev_hi") + 1)
        .select(
            (F.col("_prev_hi") + 1).alias("gap_start"),
            (F.col("_lo") - 1).alias("gap_end"),
        )
    )

    return (
        interior.unionByName(boundary)
        .withColumn("gap_len", F.col("gap_end") - F.col("gap_start") + 1)
    )


def out_of_order_rows(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    ts_col: str,
) -> DataFrame:
    """Rows that arrived out of order: per key, in ``seq_col`` order, the
    row's ``ts_col`` is EARLIER than the running max of all preceding
    timestamps (the streaming late-arrival census — what a watermark
    would have dropped, attributed row-by-row).

    One window per key, running ``max(ts)`` over the strictly-preceding
    frame; ``seq_col`` must be unique per key for a total order. Output:
    key + seq + ts + ``high_water_ts`` (the running max that convicts the
    row) + ``late_by_us`` (microseconds, > 0 by construction).
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hw = F.max(F.col(ts_col)).over(w)
    return (
        df.select(
            *key_cols,
            F.col(seq_col).alias(seq_col),
            F.col(ts_col).alias(ts_col),
            hw.alias("high_water_ts"),
        )
        .where(F.col("high_water_ts") > F.col(ts_col))
        .withColumn(
            "late_by_us",
            (
                _us(F.col("high_water_ts"))
                - _us(F.col(ts_col))
            ).cast("long"),
        )
    )


def freshness_by_group(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    stale_factor: float = 3.0,
) -> DataFrame:
    """Per-group freshness/cadence verdict → ``(group_key, n_rows, min_ts,
    max_ts, lag_behind_us, mean_gap_us, stale)``.

    "Now" is the GLOBAL max timestamp (deterministic — no wall clock), so
    ``lag_behind_us`` is how far each group trails the freshest group, in
    exact integer microseconds. ``mean_gap_us`` is the group's mean
    inter-arrival time ``(max - min) / (n - 1)`` (0 for singleton groups,
    rounded to 6 places — one division, hash-portable); a group is
    ``stale`` when its lag exceeds ``stale_factor`` mean gaps — i.e. the
    source has been silent for longer than ``stale_factor`` of its own
    typical cadence.

    Plan: one groupBy agg over (group, ts) only, then a 1-row global-max
    aggregate broadcast-crossJoined back — no second scan, no window.
    """
    ts = F.col(ts_col)
    per = df.groupBy(F.col(group_col).alias("group_key")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
    )
    glob = df.agg(F.max(ts).alias("_global_max_ts"))
    span_us = _us(F.col("max_ts")) - _us(F.col("min_ts"))
    mean_gap = F.when(
        F.col("n_rows") > 1,
        span_us.cast("double") / (F.col("n_rows") - 1),
    ).otherwise(F.lit(0.0))
    lag_us = (
        _us(F.col("_global_max_ts")) - _us(F.col("max_ts"))
    ).cast("long")
    return (
        per.crossJoin(F.broadcast(glob))
        .withColumn("lag_behind_us", lag_us)
        .withColumn("mean_gap_us", F.round(mean_gap, 6))
        .withColumn(
            "stale",
            (F.col("n_rows") > 1)
            & (
                F.col("lag_behind_us").cast("double")
                > F.lit(float(stale_factor)) * F.col("mean_gap_us")
            ),
        )
        .drop("_global_max_ts")
    )


def rate_anomaly(
    df: DataFrame,
    ts_col: str,
    window: str = "day",
    k: float = 3.0,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Arrival-rate control chart → one row per ``window`` bucket:
    ``(bucket, n, center, spread, is_anomaly)`` where a bucket is
    anomalous when ``|n − median| > k · 1.4826 · MAD`` over all bucket
    counts — the robust-z recipe from ``constraints.mad_outlier_rows``
    lifted from row values to windowed volumes. This is the "did the
    crawler stall / double-fetch on Tuesday" check: drift operators
    compare value *distributions* between windows, this one flags the
    window whose row *count* breaks the series' own baseline.

    Plan: ONE scan of the input aggregates to per-bucket counts
    (date_trunc groupBy, map-side combinable; |buckets| rows ≈ days,
    tiny). Median and MAD then run as two percentile WINDOW passes over
    that bucket table on a single partition — deliberate: the bucket
    table is bounded by the calendar, so a SinglePartition Exchange of
    |days| rows is free and the input is never rescanned (unlike the
    3-scan ``mad_outlier_rows`` shape, which must stream full rows).
    All stats round to 1e-6 so the result hash-checks against a
    quantile_cont SQL replay.
    """
    w = Window.partitionBy(F.lit(1))
    counts = _resolve_counts(df, ts_col, window, counts)
    centered = counts.withColumn(
        "center",
        F.round(F.percentile(F.col("n").cast("double"), F.lit(0.5)).over(w), 6),
    )
    dev = F.abs(F.col("n").cast("double") - F.col("center"))
    spread = centered.withColumn(
        "spread",
        F.round(
            F.lit(k)
            * F.lit(1.4826)
            * F.round(F.percentile(dev, F.lit(0.5)).over(w), 6),
            6,
        ),
    )
    return spread.select(
        "bucket",
        "n",
        "center",
        "spread",
        (
            F.abs(F.col("n").cast("double") - F.col("center")) > F.col("spread")
        ).alias("is_anomaly"),
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: "list[str]",
) -> DataFrame:
    """→ ``(step_idx, step, n_users)`` — strictly-sequential funnel: a user
    counts for step *i* only with an event of type ``steps[i]`` STRICTLY
    AFTER their step *i−1* completion time (earliest valid completion is
    carried forward, the standard greedy funnel semantics — greedy-earliest
    is optimal here, so no backtracking is needed).

    Scale shape: one filtered user-grain ``min`` aggregation per step,
    chained by equi-joins on the user key — every join and agg shares the
    same hash partitioning (AQE reuses the exchange), per-step state is
    ONE row per surviving user, and events of types outside ``steps``
    are pruned at the scan. No windows over the raw event stream, no
    per-user event collection. Emits a row for every step (n_users=0
    after the funnel dies), so the output is always ``len(steps)`` rows.
    """
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    u = F.col(user_col).alias("u")
    reached = None
    rows = []
    for i, step in enumerate(steps):
        ev = df.where(F.col(type_col) == step).select(
            u, F.col(ts_col).alias("ts")
        )
        if reached is None:
            reached = ev.groupBy("u").agg(F.min("ts").alias("t"))
        else:
            reached = (
                ev.join(reached, "u")
                .where(F.col("ts") > F.col("t"))
                .groupBy("u")
                .agg(F.min("ts").alias("t"))
            )
        rows.append(
            reached.agg(
                F.lit(i).alias("step_idx"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_offset: int = 30,
) -> DataFrame:
    """→ ``(cohort_date, offset_days, n_users)`` — classic retention
    matrix: users bucketed by their FIRST event's date, counted once per
    (cohort, day-offset) they were active on (offset 0 = the cohort day
    itself, so every cohort has an offset-0 row equal to its size).

    Scale shape: user-grain ``min(date)`` agg → equi-join back on the
    user key (same partitioning, exchange reused) → distinct at
    (cohort, offset, user) grain → count. Offsets beyond ``max_offset``
    are excluded (bounds the matrix, not the scan). All-integer output.
    """
    d = F.to_date(F.col(ts_col))
    ev = df.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col).alias("u"), d.alias("d")
    )
    cohorts = ev.groupBy("u").agg(F.min("d").alias("cohort_date"))
    return (
        ev.join(cohorts, "u")
        .select(
            "u",
            "cohort_date",
            F.datediff(F.col("d"), F.col("cohort_date")).alias("offset_days"),
        )
        .where(F.col("offset_days") <= max_offset)
        .distinct()
        .groupBy("cohort_date", "offset_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def transition_census(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    id_col: "str | None" = None,
) -> DataFrame:
    """→ ``(from_type, to_type, n)`` — per-key event-type bigram
    (Markov transition) census: for each key's event stream in time
    order, count consecutive type pairs. The behavioral drift input —
    "did click→purchase transitions crater this snapshot" — and the raw
    material for per-key sequence fingerprints.

    Order is made TOTAL with ``(ts, id_col, type)`` (ties on ``ts`` are
    real in event data; without a deterministic tie-break two runs of the
    same job could report different matrices). One window pass per key
    partition + one bigram-grain agg — the shuffle carries (key) then
    (from,to) pairs, never wide rows.
    """
    order = [F.col(ts_col)]
    if id_col:
        order.append(F.col(id_col))
    order.append(F.col(type_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        df.where(F.col(ts_col).isNotNull() & F.col(type_col).isNotNull())
        .select(
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str,
    window: str = "day",
    counts: DataFrame | None = None,
) -> DataFrame:
    """CUSUM level-shift detector over windowed arrival volumes → one row
    per ``window`` bucket: ``(bucket, k, n, cusum_scaled,
    mean_before_micro, mean_after_micro, is_change_point)``.

    ``rate_anomaly`` flags the SINGLE window whose count breaks the
    series' own robust baseline; this operator answers the other
    monitoring question — "did the crawl volume shift to a NEW level,
    and when" (Page 1954): a fetcher fleet losing a datacenter halves
    every subsequent day without any one day being a MAD outlier.

    Exact-integer discipline (the ``correlation_exact`` house rule): the
    textbook CUSUM ``S_k = Σ_{i≤k}(n_i − mean)`` is kept in BIGINT by
    scaling ×n_buckets — ``cusum_scaled = n_buckets·cum_k − k·total`` —
    so no float ever forms and the argmax is bit-reproducible. The
    change point is the row maximizing ``|cusum_scaled|`` (earliest
    bucket on ties — a constant series deterministically reports its
    first bucket with delta 0). Level means on each side are exact
    integer micro-units: ``mean_before_micro = (10^6·cum_k) div k``,
    ``mean_after_micro = (10^6·(total−cum_k)) div (n_buckets−k)`` (NULL
    on the last row, where the "after" side is empty).

    Plan: ONE scan of the input aggregates to per-bucket counts; every
    window pass after that runs over the tiny bucket table (|buckets| ≈
    days — bounded by the calendar, so its SinglePartition Exchange is
    free, the same deliberate shape as ``rate_anomaly``). Overflow
    headroom: 10^12 input rows × 10^4 buckets ≈ 10^16 < 2^63.
    """
    counts = _resolve_counts(df, ts_col, window, counts)

    w_all = Window.partitionBy(F.lit(1))
    w_ord = (
        Window.partitionBy(F.lit(1))
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = counts.select(
        "bucket",
        "n",
        F.row_number()
        .over(Window.partitionBy(F.lit(1)).orderBy("bucket"))
        .cast("long")
        .alias("k"),
        F.sum("n").over(w_ord).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n_buckets"),
    ).select(
        "bucket",
        "k",
        "n",
        (F.col("n_buckets") * F.col("cum") - F.col("k") * F.col("total")).alias(
            "cusum_scaled"
        ),
        F.expr("(1000000 * cum) div k").alias("mean_before_micro"),
        F.when(
            F.col("k") < F.col("n_buckets"),
            F.expr("(1000000 * (total - cum)) div (n_buckets - k)"),
        ).alias("mean_after_micro"),
    )
    w_rank = Window.partitionBy(F.lit(1)).orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("bucket").asc()
    )
    return staged.select(
        "bucket",
        "k",
        "n",
        "cusum_scaled",
        "mean_before_micro",
        "mean_after_micro",
        (F.row_number().over(w_rank) == F.lit(1)).alias("is_change_point"),
    )


def _resolve_counts(
    df: DataFrame,
    ts_col: str,
    window: str,
    counts: DataFrame | None,
) -> DataFrame:
    """Shared entry of the volume-monitor family: per-``window`` arrival
    counts ``(bucket, n)`` — either aggregated here (ONE scan of the
    input) or passed in pre-counted (``counts``), so a caller running the
    whole battery (the engine's ``volume_monitor`` face) pays ONE corpus
    scan for all four monitors instead of four."""
    if counts is not None:
        return counts.select("bucket", "n")
    return df.groupBy(
        F.date_trunc(window, F.col(ts_col)).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


def _bucket_counts(
    df: DataFrame,
    ts_col: str,
    window: str,
    counts: DataFrame | None = None,
) -> DataFrame:
    """ONE scan of the input → per-``window`` arrival counts with a dense
    time rank ``k`` (1-based, bucket order). Every trend/monitoring pass
    downstream runs over this tiny table (|buckets| bounded by the
    calendar), the same deliberate shape as ``cusum_changepoint``."""
    return _resolve_counts(df, ts_col, window, counts).select(
        "bucket",
        "n",
        F.row_number()
        .over(Window.partitionBy(F.lit(1)).orderBy("bucket"))
        .cast("long")
        .alias("k"),
    )


def theil_sen_trend(
    df: DataFrame,
    ts_col: str,
    window: str = "day",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Theil–Sen robust trend + Mann–Kendall direction test over windowed
    arrival volumes → ONE row ``(n_buckets, n_pairs, slope_micro,
    intercept_micro, mk_s, trend)``.

    Completes the volume-monitoring triad: ``rate_anomaly`` flags a single
    broken window, ``cusum_changepoint`` locates a sustained level shift,
    this answers "is the crawl drifting, and how fast" — the Theil–Sen
    estimator (median of all pairwise slopes, Sen 1968) is insensitive to
    ~29% outliers, so a fetcher hiccup day doesn't fake a trend the way it
    would under least squares.

    Exact-integer discipline: for every bucket pair ``i<j``,
    ``slope_micro = (10^6·(n_j−n_i)) div (k_j−k_i)`` (BIGINT, truncation
    toward zero — Spark ``div`` and DuckDB ``//`` agree on negatives); the
    reported slope is the LOWER median under the total order
    ``(slope_micro, k_i, k_j)`` — deterministic, no float forms.
    ``intercept_micro`` is the lower median of ``10^6·n_k −
    slope_micro·k`` (Sen's intercept) under ``(value, k)``. ``mk_s`` is
    the Mann–Kendall S statistic ``Σ_{i<j} sign(n_j − n_i)`` (exact
    integer); ``trend`` is its sign: increasing / decreasing / flat.

    Plan: one corpus scan → bucket counts; the pair self-join and both
    median windows run over the bucket table only (B buckets → B(B−1)/2
    pair rows; day grain bounds B by the calendar — at 30 years daily
    B≈11k, pairs≈6·10^7, still executor-trivial; corpus rows never
    self-join). The bucket table LOCAL-CHECKPOINTS eagerly (the
    self-join's two branches plus the residual pass would otherwise each
    re-scan the corpus); unlike ``persist`` this leaves no cache-manager
    entry behind — the B-row blocks free with the RDD, so a long-lived
    server calling the monitor per run can't accumulate leaked caches.
    Overflow headroom: |10^6·Δn| ≤ 10^6·10^12 = 10^18 < 2^63.
    """
    staged = _bucket_counts(df, ts_col, window, counts).localCheckpoint(
        eager=True
    )
    a = staged.select(
        F.col("k").alias("ka"), F.col("n").alias("na")
    )
    b = staged.select(
        F.col("k").alias("kb"), F.col("n").alias("nb")
    )
    pairs = a.join(b, F.col("kb") > F.col("ka")).select(
        "ka",
        "kb",
        F.expr("(1000000 * (nb - na)) div (kb - ka)").alias("slope_micro"),
        F.when(F.col("nb") > F.col("na"), F.lit(1))
        .when(F.col("nb") < F.col("na"), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("sgn"),
    )
    w_slope = Window.partitionBy(F.lit(1)).orderBy("slope_micro", "ka", "kb")
    ranked = pairs.select(
        "slope_micro",
        "sgn",
        F.row_number().over(w_slope).cast("long").alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n_pairs"),
    )
    slope_row = ranked.groupBy().agg(
        F.coalesce(F.max("n_pairs"), F.lit(0).cast("long")).alias("n_pairs"),
        F.max(
            F.when(
                F.col("r") == F.expr("(n_pairs + 1) div 2"),
                F.col("slope_micro"),
            ).otherwise(F.lit(None))
        ).alias("slope_micro"),
        F.coalesce(F.sum("sgn"), F.lit(0).cast("long")).alias("mk_s"),
    )
    # Sen intercept: lower median of residuals at the chosen slope — the
    # 1-row slope broadcasts back onto the bucket table
    resid = staged.crossJoin(F.broadcast(slope_row)).select(
        "n_pairs",
        "slope_micro",
        "mk_s",
        (F.lit(1000000) * F.col("n") - F.col("slope_micro") * F.col("k")).alias(
            "resid_micro"
        ),
        F.col("k"),
    )
    w_resid = Window.partitionBy(F.lit(1)).orderBy("resid_micro", "k")
    return (
        resid.select(
            "n_pairs",
            "slope_micro",
            "mk_s",
            "resid_micro",
            F.row_number().over(w_resid).cast("long").alias("r"),
            F.count(F.lit(1)).over(Window.partitionBy(F.lit(1))).alias("n_buckets"),
        )
        .groupBy()
        .agg(
            F.max("n_buckets").alias("n_buckets"),
            F.max("n_pairs").alias("n_pairs"),
            F.max("slope_micro").alias("slope_micro"),
            F.max(
                F.when(
                    F.col("r") == F.expr("(n_buckets + 1) div 2"),
                    F.col("resid_micro"),
                ).otherwise(F.lit(None))
            ).alias("intercept_micro"),
            F.max("mk_s").alias("mk_s"),
        )
        .select(
            "n_buckets",
            "n_pairs",
            "slope_micro",
            "intercept_micro",
            "mk_s",
            F.when(F.col("mk_s") > 0, F.lit("increasing"))
            .when(F.col("mk_s") < 0, F.lit("decreasing"))
            .otherwise(F.lit("flat"))
            .alias("trend"),
        )
    )


def seasonality_profile(df: DataFrame, ts_col: str) -> DataFrame:
    """Weekly seasonality fingerprint: one row per observed (ISO weekday,
    hour-of-day) cell — ``(dow, hour, n, dow_total, share_micro,
    is_peak_hour)``.

    A healthy steady crawl has a stable weekly rhythm; a fetcher stuck in
    one timezone, a scheduler bug firing everything at 00:00, or a
    replayed batch all show up as a distorted profile long before totals
    move. ``share_micro = (10^6·n) div dow_total`` is the hour's exact
    integer share of its weekday; ``is_peak_hour`` marks each weekday's
    busiest hour (largest n, earliest hour on ties — deterministic).

    Cross-engine note: ``dow`` is ISO (Monday=1 … Sunday=7) — Spark's
    ``weekday()+1`` equals DuckDB's ``isodow`` (Spark's ``dayofweek`` is
    Sunday=1 and would silently disagree).

    Plan: one scan → ≤168-key agg (map-side combinable); the dow rollup
    and peak window run over the 168-row cell table. Overflow: 10^6·n ≤
    10^18 < 2^63 at 10^12 input rows.
    """
    cells = df.groupBy(
        (F.weekday(F.col(ts_col)) + 1).cast("long").alias("dow"),
        F.hour(F.col(ts_col)).cast("long").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w_dow = Window.partitionBy("dow")
    w_peak = Window.partitionBy("dow").orderBy(F.col("n").desc(), F.col("hour").asc())
    return cells.select(
        "dow",
        "hour",
        "n",
        F.sum("n").over(w_dow).alias("dow_total"),
    ).select(
        "dow",
        "hour",
        "n",
        "dow_total",
        F.expr("(1000000 * n) div dow_total").alias("share_micro"),
        (F.row_number().over(w_peak) == F.lit(1)).alias("is_peak_hour"),
    )


def dispersion_census(
    df: DataFrame,
    ts_col: str,
    window: str = "hour",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Index-of-dispersion (variance-to-mean ratio) of windowed arrival
    counts → ONE row ``(n_buckets, total, mean_micro, dispersion_micro,
    regime)``.

    A Poisson arrival process has dispersion ≈ 1; batch replays / thundering
    herds push it ≫ 1 (overdispersed), a rate-limiter or metronome
    scheduler pulls it ≪ 1 (underdispersed). One scalar, read against 1.0,
    that characterizes the arrival process independent of its level — the
    distribution-shape companion to the rate/level/trend monitors.

    Exact arithmetic at 10^12-row scale: ``D = Var/mean =
    (B·Σn² − total²)/(B·total)`` needs Σn² ≈ 10^20 — past BIGINT — so the
    numerator is computed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB
    oracle), both exact integer arithmetic. The final micro-unit quotient
    is made division-exact before casting down:
    ``q = (num − num % den) / den`` — num, den ≥ 0, den = B·total ≤ 10^16
    fits BIGINT, and the division is exact by construction so no decimal
    rounding mode can disagree across engines. ``mean_micro =
    (10^6·total) div B`` stays in BIGINT.

    Plan: one scan → bucket counts; everything after is a 2-stage fold of
    the tiny bucket table (Σn² partial-aggregates map-side).
    """
    counts = _resolve_counts(df, ts_col, window, counts)
    folded = counts.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("n").alias("total"),
        F.sum(
            F.col("n").cast("decimal(19,0)") * F.col("n").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("sum_sq"),
    )
    num = (
        F.lit(1000000).cast("decimal(38,0)")
        * (
            F.col("n_buckets").cast("decimal(38,0)") * F.col("sum_sq")
            - F.col("total").cast("decimal(38,0)")
            * F.col("total").cast("decimal(38,0)")
        )
    )
    den = (F.col("n_buckets") * F.col("total")).cast("decimal(38,0)")
    return folded.select(
        "n_buckets",
        "total",
        F.expr("(1000000 * total) div n_buckets").alias("mean_micro"),
        ((num - num % den) / den).cast("long").alias("dispersion_micro"),
    ).select(
        "n_buckets",
        "total",
        "mean_micro",
        "dispersion_micro",
        F.when(F.col("dispersion_micro") > 1500000, F.lit("overdispersed"))
        .when(F.col("dispersion_micro") < 500000, F.lit("underdispersed"))
        .otherwise(F.lit("poisson-like"))
        .alias("regime"),
    )


def group_cusum_shifts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window: str = "day",
    min_buckets: int = 4,
) -> DataFrame:
    """Per-key CUSUM level shift: for every key (host/source) with at
    least ``min_buckets`` observed windows, the single change-point row
    of its own volume series → ``(key, n_buckets, bucket, k,
    cusum_scaled, mean_before_micro, mean_after_micro, shift_micro)``.

    The global ``cusum_changepoint`` answers "did THE CRAWL shift"; this
    answers "WHICH hosts shifted" — a host whose volume halved is
    invisible in the global series when another host doubled. Same
    exact-integer algebra per key (``S_k = B_key·cum_k − k·total_key``,
    argmax |S|, earliest bucket on ties); ``shift_micro =
    mean_after_micro − mean_before_micro`` at the change point (signed —
    negative = lost volume; NULL when the change point is the last
    bucket). Keys with fewer than ``min_buckets`` buckets are excluded
    (a 1-bucket key "shifts" meaninglessly).

    Plan: ONE scan → (key, bucket) counts (map-side combinable); all
    window passes partition BY KEY over that count table — the shuffle
    carries (key, bucket) rows (≤ keys·calendar), never corpus rows, and
    no single partition ever holds more than one key's calendar.
    """
    counts = df.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(window, F.col(ts_col)).alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))

    w_key = Window.partitionBy("key")
    w_ord = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = counts.select(
        "key",
        "bucket",
        "n",
        F.row_number()
        .over(Window.partitionBy("key").orderBy("bucket"))
        .cast("long")
        .alias("k"),
        F.sum("n").over(w_ord).alias("cum"),
        F.sum("n").over(w_key).alias("total"),
        F.count(F.lit(1)).over(w_key).alias("n_buckets"),
    ).where(F.col("n_buckets") >= min_buckets)
    scored = staged.select(
        "key",
        "bucket",
        "k",
        "n_buckets",
        (F.col("n_buckets") * F.col("cum") - F.col("k") * F.col("total")).alias(
            "cusum_scaled"
        ),
        F.expr("(1000000 * cum) div k").alias("mean_before_micro"),
        F.when(
            F.col("k") < F.col("n_buckets"),
            F.expr("(1000000 * (total - cum)) div (n_buckets - k)"),
        ).alias("mean_after_micro"),
    )
    w_rank = Window.partitionBy("key").orderBy(
        F.abs(F.col("cusum_scaled")).desc(), F.col("bucket").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w_rank))
        .where(F.col("_rk") == 1)
        .select(
            "key",
            "n_buckets",
            "bucket",
            "k",
            "cusum_scaled",
            "mean_before_micro",
            "mean_after_micro",
            (F.col("mean_after_micro") - F.col("mean_before_micro")).alias(
                "shift_micro"
            ),
        )
    )
