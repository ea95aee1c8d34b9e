"""Vector-column (embedding) health validation: one grouped aggregate.

Reference analog: the validator's per-column metrics collectors
(``validator-processor/src/main/java/org/gbif/validation/collector/``,
e.g. ``TermsFrequencyCollector`` / ``DataFileStatsCollector``) profile
scalar columns for nulls and value shape.  A modern training-data corpus
carries ``array<float>`` embedding columns that need the same treatment,
plus vector-specific invariants scalar profiling can't see: dimension
consistency, non-finite elements (NaN/Inf poison downstream cosine math
silently), all-zero vectors (cosine similarity undefined — a common
artifact of failed encoder batches), and L2-norm distribution (collapsed
or exploding norms flag a broken encoder checkpoint).

Scale design (100 TB):
- the ENTIRE battery is one projection + one map-side-combinable
  ``groupBy`` — raw vectors never cross the shuffle, only per-group
  partial aggregates (a dozen longs per group);
- zero Python/pandas UDFs: dimension via ``size``, finiteness via
  ``exists(isnan|isinf)``, norms via ``aggregate`` — all inside
  WholeStageCodegen over the scan;
- norms are quantized per-row to integer micro-units
  (``round(norm*1e6) AS LONG``) before aggregation, so SUM/MIN/MAX are
  exact integer arithmetic — bit-identical to the DuckDB oracle and
  independent of partitioning/merge order (the same trick as the
  Pearson-correlation operator, see __spark_entry__ ``corr_exact``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_nonfinite(x: Column) -> Column:
    return F.isnan(x) | (F.abs(x) == F.lit(float("inf")))


def embedding_health(
    df: DataFrame,
    vec_col: str,
    group_cols: list[str] | None = None,
    expected_dim: int | None = None,
) -> DataFrame:
    """Per-group embedding-column health census.

    Output columns (per group): ``n_rows``, ``n_null_vec``, ``dims_min``/
    ``dims_max`` (over non-null vectors), ``n_dim_mismatch`` (vs
    ``expected_dim`` when given, else vs the column-wide ``dims_max`` is
    NOT assumed — the caller supplies the contract), ``n_nonfinite``
    (vectors containing NaN/±Inf), ``n_zero`` (finite all-zero vectors),
    and exact-quantized L2-norm stats ``norm_min``/``norm_max``/
    ``norm_avg`` over finite non-null vectors (micro-unit precision).
    """
    e = F.col(vec_col).cast("array<double>")
    dims = F.when(e.isNotNull(), F.size(e))
    nonfinite = F.when(e.isNotNull(), F.exists(e, _is_nonfinite)).otherwise(
        F.lit(False)
    )
    finite = e.isNotNull() & ~nonfinite
    norm = F.sqrt(
        F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # integer micro-units: exact, order-independent aggregation
    norm_q = F.when(finite, F.round(norm * F.lit(1e6)).cast("long"))
    is_zero = finite & F.forall(e, lambda x: x == F.lit(0.0))
    if expected_dim is not None:
        dim_mismatch = e.isNotNull() & (dims != F.lit(int(expected_dim)))
    else:
        dim_mismatch = F.lit(False)

    proj = df.select(
        *(group_cols or []),
        e.isNull().alias("_null"),
        dims.alias("_dims"),
        nonfinite.alias("_nonfin"),
        is_zero.alias("_zero"),
        dim_mismatch.alias("_dimbad"),
        norm_q.alias("_nq"),
    )
    n_finite = F.count(F.col("_nq"))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("_null").cast("long")).alias("n_null_vec"),
        F.min("_dims").alias("dims_min"),
        F.max("_dims").alias("dims_max"),
        F.sum(F.col("_dimbad").cast("long")).alias("n_dim_mismatch"),
        F.sum(F.col("_nonfin").cast("long")).alias("n_nonfinite"),
        F.sum(F.col("_zero").cast("long")).alias("n_zero"),
        (F.min("_nq").cast("double") / F.lit(1e6)).alias("norm_min"),
        (F.max("_nq").cast("double") / F.lit(1e6)).alias("norm_max"),
        F.when(
            n_finite > 0,
            F.round(
                F.sum("_nq").cast("double") / n_finite.cast("double") / F.lit(1e6),
                6,
            ),
        ).alias("norm_avg"),
    ]
    if group_cols:
        return proj.groupBy(*group_cols).agg(*aggs)
    return proj.agg(*aggs)


def _quantized(e: Column, quant: int) -> Column:
    """Element-wise integer quantization. try_cast, not cast: the
    optimizer may evaluate this projection below the caller's finiteness
    filter (e.g. pushed through a round-robin Exchange), and an ANSI
    cast of a NaN row that the filter is about to drop would abort the
    job."""
    return F.transform(
        e, lambda x: F.round(x * F.lit(float(quant))).try_cast("long")
    )


def embedding_drift(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_windows: int = 5,
    quant: int = 1000,
) -> DataFrame:
    """Embedding-SPACE drift between consecutive id windows: does the
    encoder's output distribution move over ingestion order?  Scalar
    drift (KS/PSI/JSD/EMD, operators/drift.py) sees one column at a
    time; a re-trained or silently-swapped encoder checkpoint shifts the
    whole vector distribution while every scalar marginal looks stable.
    The detector the modality needs is centroid geometry: per-window
    mean vector, then cosine alignment + mean-norm delta between
    consecutive windows (alignment ≪ 1 ⟹ the space rotated/shifted).

    Reference analog: the distribution-expectation side of the
    validator's metrics collectors (``collector/``), extended to the
    vector modality the way `embedding_health` extends its null/shape
    profiling.

    Output: one row per consecutive window pair, ordered —
    ``win`` (current window index), ``n_prev``/``n_cur`` (finite-vector
    counts), ``centroid_cos_micro`` (cosine of the two window centroids
    in integer micro-units), ``mean_norm_prev_micro``/
    ``mean_norm_cur_micro`` (per-window mean L2 norm, micro-units).

    Exactness protocol (bit-identical to the DuckDB oracle, independent
    of partitioning):
    - elements quantized to ``quant`` integer units per row (same-input
      IEEE double ops, then integer sums — order-free);
    - per-window centroid element = ``floor(sum / n)`` — one
      deterministic double division per (window, dim) cell;
    - cosine computed over the tiny integer centroid vectors with an
      ordered ``zip_with``/``aggregate`` fold, one final rounded double
      expression.

    Scale design (100 TB):
    - one projection + ``posexplode`` → ONE map-side-combinable
      ``groupBy(win, pos)``: raw vectors never cross the shuffle, only
      |windows|·dim partial integer sums;
    - row-level stats (count, norm sum) ride the ``pos == 0`` rows of
      the same exploded pass — no second scan;
    - the pairing join runs on |windows| rows (driver-bounded input,
      broadcast-trivial); nothing downstream of the first agg grows
      with |rows|;
    - integer headroom: centroid elements are ~``quant``·max|x|
      regardless of n (the floor-division normalizes before any
      product), so the cosine fold never overflows a long at any corpus
      size.
    """
    e = F.col(vec_col).cast("array<double>")
    finite = (
        e.isNotNull() & (F.size(e) > 0) & ~F.exists(e, _is_nonfinite)
    )
    q = _quantized(e, quant)
    norm_q = F.round(
        F.sqrt(F.aggregate(e, F.lit(0.0), lambda acc, x: acc + x * x))
        * F.lit(1e6)
    ).try_cast("long")

    # window width from the id range: one 1-row agg, broadcast crossJoin
    # (house pattern — no driver action, SQL-replayable)
    bounds = df.agg(F.max(F.col(id_col)).alias("_max_id"))
    win = F.floor(
        F.col(id_col)
        / F.ceil((F.col("_max_id") + F.lit(1)) / F.lit(int(n_windows)))
    ).cast("long")

    rows = (
        df.where(finite)
        .crossJoin(F.broadcast(bounds))
        .select(
            win.alias("win"), q.alias("_q"), norm_q.alias("_nq")
        )
        .select("win", "_nq", F.posexplode("_q").alias("pos", "val"))
    )
    cells = rows.groupBy("win", "pos").agg(
        F.sum("val").alias("s"),
        F.count(F.lit(1)).alias("n"),
        # row-grain norm sum rides pos==0 so one exploded pass covers
        # both grains
        F.sum(F.when(F.col("pos") == 0, F.col("_nq"))).alias("ns0"),
    )
    wins = (
        cells.select(
            "win",
            "pos",
            F.floor(F.col("s").cast("double") / F.col("n").cast("double"))
            .cast("long")
            .alias("c"),
            "n",
            "ns0",
        )
        .groupBy("win")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("_cv"),
            F.max("n").alias("n"),
            F.max("ns0").alias("_norm_sum"),
        )
        .select(
            "win",
            F.transform("_cv", lambda st: st["c"]).alias("cvec"),
            "n",
            F.floor(
                F.col("_norm_sum").cast("double") / F.col("n").cast("double")
            )
            .cast("long")
            .alias("mean_norm_micro"),
        )
    )
    cur, prev = wins.alias("cur"), wins.alias("prev")
    dot = F.aggregate(
        F.zip_with(F.col("cur.cvec"), F.col("prev.cvec"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sq = lambda side: F.aggregate(  # noqa: E731
        F.col(side + ".cvec"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    return (
        cur.join(prev, F.col("cur.win") == F.col("prev.win") + 1)
        .select(
            F.col("cur.win").alias("win"),
            F.col("prev.n").alias("n_prev"),
            F.col("cur.n").alias("n_cur"),
            F.when(
                (sq("cur") > 0) & (sq("prev") > 0),
                F.round(
                    dot.cast("double")
                    / F.sqrt(sq("cur").cast("double") * sq("prev").cast("double"))
                    * F.lit(1e6)
                ).cast("long"),
            ).alias("centroid_cos_micro"),
            F.col("prev.mean_norm_micro").alias("mean_norm_prev_micro"),
            F.col("cur.mean_norm_micro").alias("mean_norm_cur_micro"),
        )
        .orderBy("win")
    )


def embedding_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_col: str,
    quant: int = 1000,
    z_micro: int = 3_000_000,
) -> DataFrame:
    """Per-group embedding outliers: rows whose distance to their
    group's centroid exceeds ``mean + z·stddev`` of that group's
    distance distribution — the vector-modality analog of the scalar
    ``iqr_outliers``/``mad_outliers`` battery, and the check that
    catches MISLABELED cluster members (a row whose scalar columns all
    validate but whose embedding sits in another label's region).

    ``z_micro`` is the z threshold in integer micro-units (3σ =
    3_000_000) so the contract stays exact-arithmetic end to end.

    Output (flagged rows only, ordered): ``group``, ``id``,
    ``dist_micro`` (distance to own-group centroid, micro-units),
    ``mean_micro``/``std_micro`` (that group's distance stats),
    ``n_group`` (finite rows in the group).

    Exactness protocol (bit-identical to the DuckDB oracle): the same
    milli-quantized elements and floor-divided integer centroids as
    `embedding_drift`; per-row squared distance is an ordered integer
    fold over (q - c)²; distances quantize to integer micro-units
    before the group-stat sums (long / decimal(38,0) — order-free);
    mean/std/threshold are single IEEE double expressions over those
    exact sums.

    Scale design (100 TB): three passes over the vector column, each
    the minimal plan for its grain — (1) centroid: posexplode →
    map-side-combinable ``groupBy(group, pos)`` (only groups×dim
    integer sums shuffle); (2) distance stats: row scan ⋈ broadcast
    centroids (|groups| rows) → map-side-combinable group agg (three
    numbers per group); (3) flag: row scan ⋈ broadcast centroids ⋈
    broadcast stats → filter. No row-grain shuffle anywhere; an exact
    z-score needs the centroid before the stats and the stats before
    the flag, so two of the scans are inherent — callers that already
    know the threshold can precompute and filter in one.
    """
    e = F.col(vec_col).cast("array<double>")
    finite = e.isNotNull() & (F.size(e) > 0) & ~F.exists(e, _is_nonfinite)
    rows = df.where(finite & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("id"),
        _quantized(e, quant).alias("_q"),
    )

    cells = (
        rows.select("group", F.posexplode("_q").alias("pos", "val"))
        .groupBy("group", "pos")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    centroids = (
        cells.select(
            "group",
            "pos",
            F.floor(F.col("s").cast("double") / F.col("n").cast("double"))
            .cast("long")
            .alias("c"),
        )
        .groupBy("group")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("_cv"))
        .select(
            "group", F.transform("_cv", lambda st: st["c"]).alias("cvec")
        )
    )

    d2 = F.aggregate(
        F.zip_with(
            F.col("_q"), F.col("cvec"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dist_micro = F.round(
        F.sqrt(d2.cast("double")) / F.lit(float(quant)) * F.lit(1e6)
    ).cast("long")
    with_dist = rows.join(F.broadcast(centroids), "group").select(
        "group", "id", dist_micro.alias("dist_micro")
    )

    stats = with_dist.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_group"),
        # decimal(38,0): micro-unit distances summed over billions of
        # rows exceed a long; exact on both engines (DuckDB HUGEINT)
        F.sum(F.col("dist_micro").cast("decimal(38,0)")).alias("_sd"),
        # cast each factor BEFORE multiplying: long*long wraps silently
        # under non-ANSI semantics once dist_micro exceeds ~3.0e9
        # (plausible for large-magnitude high-dim vectors); decimal*decimal
        # is exact at any corpus scale
        F.sum(
            F.col("dist_micro").cast("decimal(38,0)")
            * F.col("dist_micro").cast("decimal(38,0)")
        ).alias("_sd2"),
    )
    n = F.col("n_group").cast("double")
    mean = F.col("_sd").cast("double") / n
    var = F.greatest(
        F.col("_sd2").cast("double") / n - mean * mean, F.lit(0.0)
    )
    stats = stats.select(
        "group",
        "n_group",
        F.round(mean).cast("long").alias("mean_micro"),
        F.round(F.sqrt(var)).cast("long").alias("std_micro"),
        # threshold in exact micro-units from the same double expression
        # both engines evaluate on identical exact sums
        F.round(mean + F.lit(float(z_micro)) / F.lit(1e6) * F.sqrt(var))
        .cast("long")
        .alias("_thr"),
    )
    return (
        with_dist.join(F.broadcast(stats), "group")
        .where(F.col("dist_micro") > F.col("_thr"))
        .select(
            "group", "id", "dist_micro", "mean_micro", "std_micro", "n_group"
        )
        .orderBy("group", "id")
    )
