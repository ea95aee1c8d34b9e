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
