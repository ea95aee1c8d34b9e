"""Unicode normalization for the text column — the canonicalization step
upstream of every hash-based operator (exact dedup, minhash shingles,
winnowing): visually-identical strings with different codepoint sequences
('e'+U+0301 vs U+00E9) would otherwise hash apart and silently depress
duplicate recall.

Arrow-batched pandas UDF (Python's unicodedata is the reference UCD
implementation; Spark has no built-in normalizer) — the batch transfer is
the cost, one str.map per Arrow chunk. The DuckDB oracle side uses its
native ``nfc_normalize``, pinning cross-implementation agreement."""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# UDFs built lazily: pandas_udf registration touches the active session,
# so module import must stay session-free (pytest collection imports this
# before any SparkSession exists).
_UDF_CACHE: dict = {}


def _norm_udf(form: str):
    if form not in _UDF_CACHE:

        def _series(s: pd.Series) -> pd.Series:
            return s.map(
                lambda x: unicodedata.normalize(form, x) if x is not None else None
            )

        _UDF_CACHE[form] = pandas_udf(_series, StringType())
    return _UDF_CACHE[form]


def nfc(col: Column) -> Column:
    """Canonical composition (NFC) — byte-stable form for hashing."""
    return _norm_udf("NFC")(col)


def nfkc(col: Column) -> Column:
    """Compatibility composition (NFKC) — also folds width/ligature
    variants; lossier, for token-level matching."""
    return _norm_udf("NFKC")(col)


def normalization_report(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc normalization audit → ``(doc_id, changed, len_before,
    len_after, text_nfc)`` — run before the dedup family to measure how
    much of the corpus was in a non-canonical form (changed=true rows are
    the ones whose hashes would have missed their duplicates)."""
    t = F.col(text_col)
    n = nfc(t)
    return df.where(t.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        (n != t).alias("changed"),
        F.length(t).cast("long").alias("len_before"),
        F.length(n).cast("long").alias("len_after"),
        n.alias("text_nfc"),
    )
