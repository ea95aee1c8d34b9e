"""Re-identification risk audits: k-anonymity (Sweeney 2002) and
l-diversity (Machanavalli et al. 2007) over declared quasi-identifier
columns.

The reference's privacy posture is record-level (it never publishes a
verbatim record without the uniqueness/structure gates; see
EvaluationResultDetails + the verbatim sampler,
collector/InterpretedTermsCountCollector.java-adjacent surface); a
training-corpus release needs the TABLE-level complement: even with
direct identifiers stripped (functions/pii.py redaction), the
COMBINATION of innocuous columns (site, language, region, segment) can
single out an individual. k-anonymity measures that: a row in an
equivalence class of size < k is re-identifiable by anyone who knows its
quasi-identifier values; l-diversity catches the homogeneity attack the
k-threshold misses (a class of 50 rows that all share one sensitive
value discloses that value without singling anyone out).

Semantics:
- equivalence class = one distinct combination of the quasi-identifier
  columns, NULLs grouping together (SQL GROUP BY semantics — a null
  region is itself a quasi-identifier value an attacker may know).
- ``l`` = exact count of distinct non-null sensitive values in the
  class; classes where every sensitive value is NULL have l = 0.
- everything is exact integer counts / micro-unit ratios — the whole
  audit is one canonical answer, SQL-replayable bit-for-bit.

Scale shapes:
- ``k_anonymity_classes``: ONE groupBy over the quasi columns (map-side
  combinable; count-distinct of the sensitive column goes through
  Spark's two-phase Expand, still one logical pass). Output is bounded
  by quasi-identifier cardinality, not corpus size.
- ``k_anonymity_summary``: the class table folds to ONE row. The fold
  runs on class-grain rows, so at 10^12 documents the driver still only
  ever sees one row.
A genuinely high-cardinality quasi set (urls as quasi-identifiers)
makes every class size 1 — that is a finding (min_k = 1), not a
performance trap: the class table is as big as the groupBy's distinct
key count either way, same cost as the uniqueness operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_classes", "k_anonymity_summary"]


def k_anonymity_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Equivalence-class census → one row per distinct quasi-identifier
    combination: ``(*quasi_cols, class_size, risky)`` plus, when
    ``sensitive_col`` is given, ``(l_diversity, homogeneous)``.

    ``risky`` = class_size < k (re-identification risk);
    ``homogeneous`` = l_diversity <= 1 (attribute-disclosure risk: the
    class maps its members to at most one sensitive value).
    """
    if not quasi_cols:
        raise ValueError("k_anonymity: need at least one quasi-identifier column")
    if k < 2:
        raise ValueError(f"k_anonymity: k must be >= 2, got {k}")
    aggs = [F.count(F.lit(1)).alias("class_size")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("l_diversity"))
    out = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out = out.withColumn("risky", F.col("class_size") < k)
    if sensitive_col is not None:
        out = out.withColumn("homogeneous", F.col("l_diversity") <= 1)
    return out


def k_anonymity_summary(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """The release-gate face → ONE row ``(n_rows, n_classes, min_k,
    rows_below_k, pct_below_k_micro)`` plus ``(min_l, rows_homogeneous)``
    when ``sensitive_col`` is given.

    ``min_k`` is the table's k-anonymity (the classic headline number:
    "this table is 3-anonymous"); ``rows_below_k`` counts the rows an
    attacker could pin to fewer than k candidates; the micro ratio is
    exact integer ``(10^6 * rows_below_k) div n_rows`` (NULL on empty).
    """
    classes = k_anonymity_classes(df, quasi_cols, k, sensitive_col)
    aggs = [
        F.coalesce(F.sum("class_size"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").alias("min_k"),
        F.coalesce(
            F.sum(F.when(F.col("risky"), F.col("class_size")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("rows_below_k"),
    ]
    if sensitive_col is not None:
        aggs += [
            F.min("l_diversity").alias("min_l"),
            F.coalesce(
                F.sum(
                    F.when(F.col("homogeneous"), F.col("class_size")).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("rows_homogeneous"),
        ]
    folded = classes.agg(*aggs)
    return folded.withColumn(
        "pct_below_k_micro",
        F.when(
            F.col("n_rows") > 0,
            F.expr("(1000000 * rows_below_k) div n_rows"),
        ),
    )
