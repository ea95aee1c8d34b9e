"""Pass 2b — referential integrity via broadcast hash anti-join.

Reference analog: ``ReferentialIntegrityEvaluator`` — awk loads the core id
column into an in-memory hash (``FNR==NR{a[$k];next}``), streams the
extension file and prints ids with no match → RECORD_REFERENTIAL_INTEGRITY_
VIOLATION (DIFF_CMD util/FileBashUtilities.java:38-46; driver
evaluator/ReferentialIntegrityEvaluator.java:54-87). Both sides are also
scanned for empty keys (:74-86) because the hash lookup silently skips them.

Spark design: the awk build-side hash IS a broadcast hash anti-join —
``fact.join(broadcast(dim), key, "left_anti")``. Exactly one narrow pass
over the fact table, no shuffle of the 100 TB side. The null/empty-key
pre-check is a separate filter (Spark anti-join drops null keys silently,
same trap as awk — SURVEY.md J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import non_blank
from ..model import CheckId


def orphan_rows(fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str) -> DataFrame:
    """Rows of ``fact`` whose non-null key has no match in ``dim``.
    The dim side is broadcast explicitly (lang dim: ~180 rows)."""
    key = F.col(fact_key)
    return fact.where(non_blank(key)).join(
        F.broadcast(dim.select(F.col(dim_key).alias(fact_key)).distinct()),
        on=fact_key,
        how="left_anti",
    )


def referential_violations(
    pages: DataFrame,
    dim: DataFrame,
    fact_key: str = "lang",
    dim_key: str = "lang",
    id_col: str = "url",
) -> DataFrame:
    """Violations-DF-shaped orphans: LANG_UNKNOWN per row whose lang is not
    in the dimension table (reference: unlinked extension id "ZZ",
    ReferentialIntegrityEvaluatorTest.java:51)."""
    orphans = orphan_rows(pages, dim, fact_key, dim_key)
    return orphans.select(
        F.col(id_col).alias("url"),
        F.lit(CheckId.LANG_UNKNOWN).alias("check_id"),
        F.lit(f"{fact_key} present in dimension").alias("expected"),
        F.col(fact_key).alias("found"),
        F.create_map(F.lit(fact_key), F.col(fact_key)).alias("related_data"),
        F.coalesce(F.date_format(F.col("warc_ts"), "yyyy-MM"), F.lit("UNKNOWN")).alias(
            "partition_id"
        ),
    )


def reconcile_aggregates(
    fact: DataFrame,
    rollup: DataFrame,
    key_cols: list[str],
    measure_col: str,
    expected_col: str,
    tol: float = 0.01,
) -> DataFrame:
    """Fact-vs-rollup reconciliation: per key, the fact table's summed
    measure against the rollup's stored expectation →
    ``(*key, actual, expected, delta, status)`` with status ``matched`` |
    ``mismatched`` (|delta| > tol) | ``fact_only`` | ``rollup_only``.
    The referential family's AGGREGATE face: orphan checks ask "does the
    key exist", this asks "does the MONEY add up" (the warehouse
    invariant the reference's per-row predicates cannot express).

    Determinism discipline: the fact-side sum accumulates 10^6-quantized
    DECIMAL(38,0) integers (order-independent, map-side combinable) and
    descends to a round-6 double only at the end, so ``actual`` and
    ``delta`` hash-check across engines and partitionings.

    Plan: one grouped aggregation on the fact side (map-side partials),
    one full-outer equi-join against the rollup keys — both linear, AQE
    handles skewed keys; no driver-side state."""
    grain = F.lit(1_000_000).cast("double")
    m = F.col(measure_col)
    q = F.when(m.isNotNull(), F.round(m.cast("double") * grain)).cast(
        "decimal(38,0)"
    )
    actual = fact.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.round(F.sum(q).cast("double") / F.lit(1e6), 6).alias("actual")
    )
    exp = rollup.select(
        *[F.col(c) for c in key_cols],
        F.round(F.col(expected_col).cast("double"), 6).alias("expected"),
    )
    joined = actual.join(exp, key_cols, "full_outer")
    delta = F.round(F.col("actual") - F.col("expected"), 6)
    return joined.select(
        *key_cols,
        "actual",
        "expected",
        delta.alias("delta"),
        F.when(F.col("actual").isNull(), F.lit("rollup_only"))
        .when(F.col("expected").isNull(), F.lit("fact_only"))
        .when(F.abs(delta) > F.lit(float(tol)), F.lit("mismatched"))
        .otherwise(F.lit("matched"))
        .alias("status"),
    )


def relationship_cardinality(
    dim: DataFrame,
    fact: DataFrame,
    dim_key: str,
    fact_key: str,
    bounds: tuple[int, ...] = (1, 2, 4),
) -> DataFrame:
    """Deequ-style relationship-cardinality census →
    ``(card_class, n_keys)``: how many dimension keys have 0 / 1 / 2-3 /
    4+ matching fact rows (classes cut at ``bounds``), plus a
    ``fact_orphan`` class counting DISTINCT fact keys that reference no
    dimension row. ``orphan_rows`` answers *which* rows dangle; this
    answers the cardinality-contract question (is orders→customer really
    N:1? does every customer have at least one order?) as a bounded
    census a verdict rule can threshold on.

    Plan: fact aggregates to (key, n) first — map-side combinable, one
    Exchange on the key — then a full-outer equi-join against the dim
    keys (AQE broadcasts the smaller side) feeds TWO tiny aggs over
    |keys| rows. No full fact rows ever shuffle; output is
    ``len(bounds)+2`` rows regardless of scale.
    """
    per_key = fact.groupBy(F.col(fact_key).alias("_fk")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    keys = dim.select(F.col(dim_key).alias("_dk")).distinct()
    joined = keys.join(
        per_key, keys["_dk"] == per_key["_fk"], "full_outer"
    ).select(
        F.coalesce(F.col("_n"), F.lit(0)).alias("_n"),
        F.col("_dk").isNotNull().alias("_in_dim"),
    )
    lo = 0
    cls = None
    for b in bounds:
        label = str(lo) if b == lo + 1 else f"{lo}-{b - 1}"
        cond = F.col("_n") < F.lit(b)
        cls = F.when(cond, F.lit(label)) if cls is None else cls.when(cond, F.lit(label))
        lo = b
    cls = cls.otherwise(F.lit(f"{lo}+"))
    dim_side = (
        joined.where(F.col("_in_dim"))
        .groupBy(cls.alias("card_class"))
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )
    orphans = (
        joined.where(~F.col("_in_dim"))
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .select(F.lit("fact_orphan").alias("card_class"), "n_keys")
    )
    return dim_side.unionByName(orphans)
