"""Shared fixtures: one local SparkSession per test session, plus the
injected-violation pages fixture materialized to parquet once (mirrors the
reference's committed test archives under src/test/resources)."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from gbif_data_validator_spark.session import build_session
from gbif_data_validator_spark.sources.synthetic import synth_pages

N_FIXTURE_ROWS = 4000


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = build_session(app_name="gdv-tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path(spark, tmp_path_factory) -> str:
    """Labeled fixture table written once — (F2 pages_with_violations)."""
    path = str(tmp_path_factory.mktemp("fixtures") / "pages")
    synth_pages(spark, N_FIXTURE_ROWS, with_violations=True).write.parquet(path)
    return path


@pytest.fixture(scope="session")
def pages(spark, pages_path):
    return spark.read.parquet(pages_path)
