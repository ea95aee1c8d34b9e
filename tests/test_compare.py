"""Run-over-run comparison (plans/compare.py): check-count deltas, verdict
flips, and the row-level violation diff — computed entirely from the
work_dir's own lineage/violations tables, never a corpus rescan."""

import datetime as dt

from gbif_data_validator_spark.plans.compare import compare_runs, violation_diff
from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _pages(spark, n_bad_urls: int, bad_url=lambda i: ""):
    rows = []
    for i in range(80):
        url = bad_url(i) if i < n_bad_urls else f"https://ex.org/{i}"
        rows.append((url, dt.datetime(2024, 1, 1 + i % 28), None, "hello world", "en"))
    return spark.createDataFrame(rows, SCHEMA)


def test_compare_runs_detects_fix_and_regression(spark, tmp_path):
    wd = str(tmp_path / "w")
    # run A: 3 empty keys; run B: fixed to 0 but one unknown lang appears
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(_pages(spark, 3))
    # the regression lands in a DIFFERENT month (LANG_UNKNOWN is blocking),
    # so January — A's KEY_EMPTY month — must flip FAIL→PASS in B
    fixed = _pages(spark, 0).unionByName(
        spark.createDataFrame(
            [("https://ex.org/zz", dt.datetime(2024, 2, 5), None, "hi there", "zz")],
            SCHEMA,
        )
    )
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="B")
    ).run(fixed)

    d = compare_runs(spark, wd, "A", "B")
    assert d["check_deltas"]["KEY_EMPTY"] == {"a": 3, "b": 0, "delta": -3}
    assert "KEY_EMPTY" in d["fixed"]
    assert "LANG_UNKNOWN" in d["regressed"]
    # the empty-key partitions flipped FAIL→PASS (KEY_EMPTY is blocking)
    assert any(
        v == {"a": "FAIL", "b": "PASS"} for v in d["verdict_changes"].values()
    )


def test_report_history_lists_runs_newest_first(spark, tmp_path):
    from gbif_data_validator_spark.plans.compare import report_history

    wd = str(tmp_path / "w")
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(_pages(spark, 2))
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="B")
    ).run(_pages(spark, 0))
    hist = report_history(spark, wd).collect()
    assert [r.run_id for r in hist] == ["B", "A"]
    a = next(r for r in hist if r.run_id == "A")
    b = next(r for r in hist if r.run_id == "B")
    assert a.any_fail and not b.any_fail
    assert a.n_violations >= 2 and b.n_violations == 0
    assert a.n_partitions > 0 and a.n_stream_batches == 0
    assert a.n_rows >= 80  # GLOBAL row carries the table total


def test_violation_diff_row_level(spark, tmp_path):
    wd = str(tmp_path / "w")
    # bad urls stay DISTINCT — the row-level diff keys on url
    bad = lambda i: f"not a url {i}"
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="A")
    ).run(_pages(spark, 2, bad_url=bad))
    ValidationEngine(
        spark, EngineConfig(check_extraction=False, work_dir=wd, run_id="B")
    ).run(_pages(spark, 0))
    rows = violation_diff(spark, wd, "A", "B").collect()
    gone = [r for r in rows if r.in_a and not r.in_b]
    assert {r.check_id for r in gone} == {"URL_MALFORMED"} and len(gone) == 2
    assert all(r.in_a != r.in_b for r in rows)  # only one-sided rows appear


def test_metric_anomalies_flags_spike(spark, tmp_path):
    """Online z-score over the run history: three stable runs build the
    baseline, a 10x violation spike in run D flags; the stable runs and
    the warm-up window never flag."""
    from gbif_data_validator_spark.plans.compare import metric_anomalies

    wd = str(tmp_path / "w")
    for run_id, n_bad in [("A", 2), ("B", 2), ("C", 2), ("D", 20)]:
        ValidationEngine(
            spark, EngineConfig(check_extraction=False, check_drift=False,
                                work_dir=wd, run_id=run_id)
        ).run(_pages(spark, n_bad))

    pts = metric_anomalies(spark, wd, k=3.0, min_history=3)
    by_run = {p["run_id"]: p for p in pts}
    assert [p["run_id"] for p in pts] == ["A", "B", "C", "D"]  # chronological
    assert not any(by_run[r]["flagged"] for r in "ABC")  # warm-up + stable
    d = by_run["D"]
    assert d["flagged"] and d["n_prev"] == 3 and d["value"] > d["mean_prev"]

    # per-check granularity: KEY_EMPTY spikes, RECORD checks stay quiet
    per = metric_anomalies(spark, wd, k=3.0, min_history=3, per_check=True)
    key_pts = [p for p in per if p["check_id"] == "KEY_EMPTY"]
    assert [p["run_id"] for p in key_pts] == ["A", "B", "C", "D"]
    assert key_pts[-1]["flagged"] and not any(p["flagged"] for p in key_pts[:-1])
    assert not any(
        p["flagged"] for p in per if p["check_id"] != "KEY_EMPTY"
    )


def test_metric_anomalies_zero_variance_history(spark, tmp_path):
    """A flat history has std 0 — ANY change flags (Deequ OnlineNormal
    degenerate case), identical rates never do."""
    from gbif_data_validator_spark.plans.compare import metric_anomalies

    wd = str(tmp_path / "w0")
    for run_id in ["A", "B", "C", "D"]:
        ValidationEngine(
            spark, EngineConfig(check_extraction=False, check_drift=False,
                                work_dir=wd, run_id=run_id)
        ).run(_pages(spark, 2))
    pts = metric_anomalies(spark, wd, min_history=3)
    assert not any(p["flagged"] for p in pts)

    ValidationEngine(
        spark, EngineConfig(check_extraction=False, check_drift=False,
                            work_dir=wd, run_id="E")
    ).run(_pages(spark, 3))
    pts = metric_anomalies(spark, wd, min_history=3)
    assert pts[-1]["run_id"] == "E" and pts[-1]["flagged"]
