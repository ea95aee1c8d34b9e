"""Shared blankness predicates.

Reference semantics: ``StringUtils.isNotBlank`` — a cell counts only if it
contains a non-whitespace character (collector/TermsFrequencyCollector.java:
34-39). Spark's ``trim`` strips only ASCII spaces, so blankness is expressed
as a ``\\S`` regex match (JVM-side, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_blank(col: Column) -> Column:
    """NULL, empty, or whitespace-only."""
    return col.isNull() | ~col.cast("string").rlike(r"\S")


def non_blank(col: Column) -> Column:
    return col.isNotNull() & col.cast("string").rlike(r"\S")
