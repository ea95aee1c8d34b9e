"""KS drift over warc_ts windows: exactly the injected drift month is
flagged (FIXTURES.md F2 DRIFT_WINDOW — one window with 3x text lengths)."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.drift import ks_drift
from gbif_data_validator_spark.sources.synthetic import DRIFT_MONTH


def test_drift_month_flagged_and_only_it(spark, pages):
    drift = ks_drift(pages).cache()
    flagged = {r.window for r in drift.where(F.col("drifted")).collect()}
    assert flagged == {DRIFT_MONTH}
    # the drifted window's KS stat is decisively large, others small
    stats = {r.window: r.ks_stat for r in drift.collect()}
    assert stats[DRIFT_MONTH] > 0.5
    others = [v for k, v in stats.items() if k != DRIFT_MONTH]
    # sentence-quantized lengths give coarse ECDFs → per-window noise up to
    # ~1.95/sqrt(n); the drifted window clears it decisively
    assert max(others) < 0.3 < stats[DRIFT_MONTH]
    drift.unpersist()


def test_no_drift_on_clean_uniform_table(spark):
    from gbif_data_validator_spark.sources.synthetic import synth_pages

    # without violations the drift month still exists (it's a property of
    # ts), so test on a metric that is uniform: url length
    clean = synth_pages(spark, 3000, with_violations=False)
    d = ks_drift(clean, metric=F.length("lang"))
    assert d.where(F.col("drifted")).count() == 0
