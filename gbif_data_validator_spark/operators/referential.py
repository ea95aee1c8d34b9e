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
