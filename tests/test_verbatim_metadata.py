"""J3 verbatim sample reassembly + M4 metadata lint."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.model import CheckId
from gbif_data_validator_spark.operators.record_checks import run_record_checks
from gbif_data_validator_spark.operators.verbatim import verbatim_samples
from gbif_data_validator_spark.plans.metadata import lint_metadata


def test_verbatim_samples_join_back(spark, pages):
    v = run_record_checks(pages, check_extraction=False)
    out = verbatim_samples(v, pages).collect()
    assert 0 < len(out)
    by_check = {}
    for r in out:
        by_check.setdefault(r.check_id, []).append(r)
    for check, rows in by_check.items():
        assert len(rows) <= 10
        # every sample is a genuine source row with its full columns
        assert all(r.text is not None for r in rows)
    # a URL_MALFORMED sample's url really is malformed in the source
    assert all(
        not r.url.startswith("https://") for r in by_check["URL_MALFORMED"]
    )
    # plan shape: the sample side must broadcast
    plan = verbatim_samples(v, pages)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_lint_metadata():
    ok = {
        "title": "Crawl validation run",
        "description": "Validates the 2024-01 crawl snapshot against schema v1.",
        "license": "CC0-1.0",
    }
    assert lint_metadata(ok) == []
    bad = lint_metadata({"title": "x", "description": "", "license": "WTFPL"})
    ids = {f.check_id for f in bad}
    assert ids == {
        CheckId.TITLE_TOO_SHORT,
        CheckId.DESCRIPTION_TOO_SHORT,
        CheckId.LICENSE_MISSING_OR_UNKNOWN,
    }
    # only the license finding blocks (IndexableRules analog)
    assert [f.check_id for f in bad if f.blocking] == [CheckId.LICENSE_MISSING_OR_UNKNOWN]
