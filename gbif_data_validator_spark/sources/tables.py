"""Table sources: parquet / CSV / Iceberg-style catalog reads with declared
schemas, plus default-value imputation.

Reference analogs:
- S3 DwC-A/CSV scan with external declared schema (meta.xml → Term list,
  source/DataFileFactory.java:121-146, header extraction :226-248): here the
  schema is declared by the caller (PAGES_SCHEMA by default) and enforced,
  never inferred — schema surprises are *findings* (preflight), not crashes.
- S6 tabular record source honoring delimiter/quote/header
  (source/TabularRecordSource.java:27-57): `spark.read.csv` options.
- P4 default-value imputation: fill a column from declared defaults only
  when blank (evaluator/record/OccurrenceInterpretationEvaluator.java:99-106).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import PAGES_SCHEMA


def read_pages_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_pages_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    sep: str = ",",
    quote: str = '"',
    header: bool = True,
) -> DataFrame:
    """CSV scan with a declared (never inferred) schema. Parse failures
    surface as NULLs (PERMISSIVE mode) so the record checks report them as
    findings — the reference's string-typed-then-interpret semantics.
    Binary columns can't ride CSV; html is read as base64 text if present."""
    schema = schema or T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html_b64", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("quote", quote)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
    if "html_b64" in df.columns:
        df = df.withColumn("html", F.unbase64(F.col("html_b64"))).drop("html_b64")
        # keep the declared column order of the pages contract
        df = df.select("url", "warc_ts", "html", "text", "lang")
    return df


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Catalog reference (Iceberg `db.table`) or a path. The catalog path is
    the production entry (S1 analog: the 'upload' is a table identifier)."""
    if "/" in ref:
        return spark.read.parquet(ref)
    return spark.table(ref)


def apply_defaults(df: DataFrame, defaults: dict[str, str]) -> DataFrame:
    """P4: impute declared default values ONLY into blank cells (the
    reference fills verbatim fields from meta.xml defaults only when blank)."""
    from ..functions.predicates import non_blank

    for col, default in defaults.items():
        df = df.withColumn(
            col, F.when(non_blank(F.col(col)), F.col(col)).otherwise(F.lit(default))
        )
    return df
