"""Snapshot-over-snapshot table diff: crawl churn classification.

No reference analog (the reference validates one archive at a time); this
is the operator a recurring crawl pipeline runs between consecutive
snapshots of the same table — "how much of last month's corpus survived,
what changed, what's new" — the table-level complement to the
findings-level ``plans/compare.py`` (which diffs validation REPORTS, not
the data itself).

Scale shape:
- each snapshot collapses to its key grain in one pass: the scan projects
  ONLY ``(key, fingerprint_col)``, the fingerprint is md5'd map-side, and
  a groupBy(key) with map-side partial aggregation yields one
  ``(key, fp, n)`` row per key — nothing wider than 2 strings + a long
  ever shuffles, regardless of how wide the snapshot rows are.
- the diff itself is ONE full-outer equi-join on the key. Snapshots
  written bucketed by the key (sources/tables.py bucketing helpers) make
  it zero-shuffle; otherwise it is the canonical co-partitioned join AQE
  already handles, with no skew risk beyond the key's own distribution.
- the summary variant reduces the join output to ≤4 rows before the
  driver sees anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: classification values, in report order
STATUSES = ("added", "changed", "removed", "unchanged")


def _snapshot_grain(df: DataFrame, key_col: str, fingerprint_col: str) -> DataFrame:
    """One row per non-null key: ``(key, fp, n)`` where ``fp`` is the
    MINIMUM md5 over the key's non-null fingerprint values (deterministic
    under duplicate keys; all-null → null fp) and ``n`` the row count.
    Null keys are excluded by contract — key emptiness is the engine's
    KEY_EMPTY check's job, not the diff's."""
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.md5(F.col(fingerprint_col).cast("string")).alias("_fp"),
        )
        .groupBy("key")
        .agg(F.min("_fp").alias("fp"), F.count(F.lit(1)).alias("n"))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fingerprint_col: str = "text",
) -> DataFrame:
    """→ one row per key in either snapshot: ``(<key_col>, status, n_old,
    n_new)`` with ``status`` ∈ ``added`` (new only) / ``removed`` (old
    only) / ``unchanged`` (both, same content fingerprint, null-safe) /
    ``changed`` (both, different fingerprint). ``n_old``/``n_new`` are the
    key's row counts per snapshot (0 on the absent side), so duplicate-key
    drift is visible even when the fingerprint is stable."""
    o = _snapshot_grain(old, key_col, fingerprint_col).select(
        "key", F.col("fp").alias("fp_old"), F.col("n").alias("n_old")
    )
    n = _snapshot_grain(new, key_col, fingerprint_col).select(
        "key", F.col("fp").alias("fp_new"), F.col("n").alias("n_new")
    )
    joined = o.join(n, "key", "full")
    status = (
        F.when(F.col("n_old").isNull(), F.lit("added"))
        .when(F.col("n_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        F.col("key").alias(key_col),
        status.alias("status"),
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "url",
    fingerprint_col: str = "text",
) -> DataFrame:
    """→ ≤4 rows ``(status, n_keys, n_rows_old, n_rows_new)`` — the
    bounded-output face for CLI/report use (the driver collects at most
    one row per status)."""
    return (
        snapshot_diff(old, new, key_col, fingerprint_col)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_old").alias("n_rows_old"),
            F.sum("n_new").alias("n_rows_new"),
        )
    )
