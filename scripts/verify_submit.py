"""The /verify recipe as a reusable job: drive the production surface
(spark-submit --py-files pkg.zip) — synth pages with violations, run the
full ValidationEngine, print the report JSON, and smoke any operators
named on the CLI through the shipped zip.

Usage (see .claude/skills/verify/SKILL.md):
  WD=$(mktemp -d); zip -qr $WD/gdv.zip gbif_data_validator_spark
  spark-submit --py-files $WD/gdv.zip scripts/verify_submit.py $WD [query ...]

Golden at n=3000: 4 each of KEY_EMPTY/URL_MALFORMED/WARC_TS_INVALID/
WARC_TS_UNLIKELY/TEXT_EMPTY/TEXT_EXTRACTION_MISMATCH/LANG_UNKNOWN,
3 RECORD_NOT_UNIQUELY_IDENTIFIED, 1 DRIFT_WINDOW; indexable=false.
Trailing args name __spark_entry__ queries to smoke at sf0.001.
"""
import json
import sys

from pyspark.sql import SparkSession

wd = sys.argv[1]
smoke = sys.argv[2:]
spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("gdv-verify")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine
from gbif_data_validator_spark.sources.synthetic import synth_pages

synth_pages(spark, 3000, with_violations=True).drop("expected_issue").write.mode(
    "overwrite"
).parquet(wd + "/pages")
pages = spark.read.parquet(wd + "/pages")
rep = ValidationEngine(
    spark, EngineConfig(work_dir=wd + "/work", run_id="verify")
).run(pages)
golden = {
    "KEY_EMPTY": 4, "URL_MALFORMED": 4, "WARC_TS_INVALID": 4,
    "WARC_TS_UNLIKELY": 4, "TEXT_EMPTY": 4, "TEXT_EXTRACTION_MISMATCH": 4,
    "LANG_UNKNOWN": 4, "RECORD_NOT_UNIQUELY_IDENTIFIED": 3, "DRIFT_WINDOW": 1,
}
got = dict(rep.issue_counts)
ok = rep.n_rows == 3000 and rep.indexable is False and got == golden
print("REPORT", json.dumps({"n_rows": rep.n_rows, "indexable": rep.indexable,
                            "issue_counts": dict(sorted(got.items())),
                            "golden_match": ok}))
if smoke:
    sys.path.insert(0, ".")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in smoke:
        n = qs[name](spark, "/root/testdata/sf0.001").count()
        print("SMOKE", name, n)
spark.stop()
sys.exit(0 if ok else 1)
