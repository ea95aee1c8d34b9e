"""PII detection/redaction: per-kind hits, redaction masks, ordering
(structured digit runs are masked before bare IPv4), null passthrough."""

from __future__ import annotations

from pyspark.sql import functions as F

from gbif_data_validator_spark.functions import pii

FIXTURE = [
    (0, "mail me at alice.smith+x@sub.example.co.uk thanks"),
    (1, "server at 10.0.255.3 and also 192.168.1.1 responded"),
    (2, "id 123-45-6789 on file"),
    (3, "call +44 800 1234 5678 today"),
    (4, "card 4111-1111-1111-1111 expires"),
    (5, "clean text with token tok087 and 12345 numbers"),
    (6, None),
    (7, "combo a@b.io 1.2.3.4 999-88-7777 +1 555 010 0199"),
]


def _scan(spark):
    df = spark.createDataFrame(FIXTURE, ["id", "text"])
    counts = pii.pii_counts(F.col("text"))
    return {
        r["id"]: r
        for r in df.select(
            "id",
            *[c.alias(f"n_{k}") for k, c in counts.items()],
            pii.pii_total(F.col("text")).alias("n_pii"),
            pii.pii_redact(F.col("text")).alias("red"),
        ).collect()
    }


def test_per_kind_detection(spark):
    rows = _scan(spark)
    assert rows[0]["n_email"] == 1 and rows[0]["n_pii"] == 1
    assert rows[1]["n_ipv4"] == 2 and rows[1]["n_pii"] == 2
    assert rows[2]["n_ssn"] == 1
    assert rows[3]["n_phone"] == 1
    assert rows[4]["n_cc"] == 1
    assert rows[5]["n_pii"] == 0
    assert rows[7]["n_email"] == 1 and rows[7]["n_ipv4"] == 1
    assert rows[7]["n_ssn"] == 1 and rows[7]["n_phone"] == 1


def test_redaction_masks(spark):
    rows = _scan(spark)
    assert rows[0]["red"] == "mail me at <EMAIL> thanks"
    assert rows[1]["red"] == "server at <IP> and also <IP> responded"
    assert rows[2]["red"] == "id <SSN> on file"
    assert rows[3]["red"] == "call <PHONE> today"
    assert rows[4]["red"] == "card <CC> expires"
    assert rows[5]["red"] == FIXTURE[5][1]  # untouched
    assert rows[7]["red"] == "combo <EMAIL> <IP> <SSN> <PHONE>"


def test_null_passthrough(spark):
    rows = _scan(spark)
    assert rows[6]["n_pii"] == 0
    assert rows[6]["red"] is None


def test_cc_not_double_masked_as_ssn(spark):
    """Redaction order: the 16-digit card run is consumed by <CC> before
    the SSN/IPv4 patterns can bite fragments of it."""
    df = spark.createDataFrame([(0, "4111-1111-1111-1111 and 123-45-6789")], ["id", "t"])
    out = df.select(pii.pii_redact(F.col("t")).alias("r")).head()["r"]
    assert out == "<CC> and <SSN>"
