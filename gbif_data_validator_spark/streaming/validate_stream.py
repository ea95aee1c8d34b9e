"""Streaming record validation.

Design: pass 1 (record checks) is a narrow, stateless transformation, so it
lifts to Structured Streaming unchanged — the same ``run_record_checks``
Column plan runs per micro-batch. Collection checks that need global state
(uniqueness) become watermarked stateful aggregations: duplicate detection
within the watermark horizon via a windowed groupBy count (exactly the
semantics a crawl pipeline wants: re-crawls of the same url inside the
horizon are duplicates; a crawl a month later is a refresh).

Sinks: violations stream to an append sink (parquet/Iceberg in production;
memory sink in tests); issue-rate windows stream in update mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import PAGES_SCHEMA
from ..operators.record_checks import run_record_checks


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream over a pages parquet directory (each new file =
    one crawl batch; in production this is the Iceberg/warehouse landing
    zone)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_violations(pages_stream: DataFrame, check_extraction: bool = True) -> DataFrame:
    """Pass-1 checks per micro-batch (stateless, append-safe)."""
    return run_record_checks(pages_stream, check_extraction=check_extraction)


def stream_issue_rates(
    pages_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    check_extraction: bool = False,
) -> DataFrame:
    """Watermarked windowed issue counts: (window, check_id, n). Late rows
    beyond the watermark are dropped from state — bounded state at any
    ingest rate."""
    v = run_record_checks(
        pages_stream.withWatermark("warc_ts", watermark),
        check_extraction=check_extraction,
    )
    # the violations carry partition_id but the event time lives upstream;
    # re-derive window from the related_data ts (kept as string) is lossy —
    # instead aggregate on partition_id (the month window) for NULL-safe
    # grouping, and on processing-time micro-batches for rates.
    return v.groupBy("partition_id", "check_id").agg(F.count(F.lit(1)).alias("n"))


def stream_duplicates_within_horizon(
    pages_stream: DataFrame,
    window: str = "24 hours",
    watermark: str = "24 hours",
    key_col: str = "url",
) -> DataFrame:
    """Stateful uniqueness within a time horizon: urls seen >1 time inside a
    tumbling event-time window. State is bounded by the watermark (the
    streaming analog of the batch salted-agg uniqueness; global-history
    dedup belongs to the batch pass over the full table)."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .where(F.col(key_col).isNotNull() & (F.col(key_col) != ""))
        .groupBy(F.window("warc_ts", window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("n").alias("dup_count"),
        )
    )


def run_stream_once(stream_df: DataFrame, query_name: str, output_mode: str = "append"):
    """Drain all available input into a memory sink (availableNow) and stop —
    the test/validation harness for the streaming plans."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
