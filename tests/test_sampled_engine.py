"""Triage mode (EngineConfig.sample_pct): the engine validates a
deterministic hash sample and folds Wilson full-corpus rate estimates
into report.metrics["sampling"]."""

from __future__ import annotations

import pytest

from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine
from gbif_data_validator_spark.sources.synthetic import synth_pages


def _pages(spark, n=800):
    return synth_pages(spark, n, with_violations=True).drop("expected_issue")


def test_sample_pct_100_equals_full_run(spark):
    """pct=100 keeps every bucket → identical counts/verdicts to the
    unsampled run, plus the estimates block."""
    pages = _pages(spark)
    full = ValidationEngine(spark, EngineConfig()).run(pages)
    triage = ValidationEngine(spark, EngineConfig(sample_pct=100)).run(pages)
    assert triage.issue_counts == full.issue_counts
    assert triage.n_rows == full.n_rows
    assert triage.partition_verdicts == full.partition_verdicts
    s = triage.metrics["sampling"]
    assert (s["pct"], s["sample_n"]) == (100, full.n_rows)
    assert set(s["estimates"]) == set(full.issue_counts)
    for check, est in s["estimates"].items():
        assert est["violations"] == full.issue_counts[check]
        assert (
            0
            <= est["wilson_lo_micro"]
            <= est["rate_micro"]
            <= est["wilson_hi_micro"]
            <= 1_000_000
        )


def test_sample_pct_triage_is_deterministic_and_brackets_truth(spark):
    """A 30% triage run validates fewer rows, reproduces exactly on
    re-run (hash membership, no rand()), and its per-check Wilson
    interval brackets the full run's true rate for these planted,
    hash-independent violation rates."""
    pages = _pages(spark)
    full = ValidationEngine(spark, EngineConfig()).run(pages)
    cfg = EngineConfig(sample_pct=30)
    a = ValidationEngine(spark, cfg).run(pages)
    b = ValidationEngine(spark, EngineConfig(sample_pct=30)).run(pages)
    assert 0 < a.n_rows < full.n_rows
    assert a.issue_counts == b.issue_counts and a.n_rows == b.n_rows
    s = a.metrics["sampling"]
    assert s["sample_n"] == a.n_rows
    for check, est in s["estimates"].items():
        true_rate_micro = 1_000_000 * full.issue_counts[check] // full.n_rows
        assert est["wilson_lo_micro"] <= true_rate_micro <= est["wilson_hi_micro"], (
            check,
            est,
            true_rate_micro,
        )


def test_sample_pct_validation(spark, tmp_path):
    pages = _pages(spark, 50)
    with pytest.raises(ValueError, match="sample_pct must be in"):
        ValidationEngine(spark, EngineConfig(sample_pct=0)).run(pages)
    with pytest.raises(ValueError, match="incompatible with work_dir"):
        ValidationEngine(
            spark, EngineConfig(sample_pct=10, work_dir=str(tmp_path / "w"))
        ).run(pages)


def test_sample_pct_off_by_default(spark):
    rep = ValidationEngine(spark, EngineConfig()).run(_pages(spark, 50))
    assert "sampling" not in rep.metrics
