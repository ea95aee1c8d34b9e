"""Mojibake census + JVM round-trip repair (functions/encoding.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gbif_data_validator_spark.functions.encoding import (
    fix_mojibake,
    mojibake_census,
    mojibake_exprs,
)

# (raw, expected_fixed) — expected == raw means "must pass through untouched"
CASES = [
    ("cafÃ© au lait", "café au lait"),                  # latin-1 flavour
    ("donâ€™t stop â€” ever", "don’t stop — ever"),     # cp1252 flavour
    ("price â‚¬99 â„¢", "price €99 ™"),                 # cp1252 trigraphs
    ("naÃ¯ve rÃ©sumÃ©", "naïve résumé"),
    ("Â padded", " padded"),                  # NBSP artifact
    ("clean ascii text", "clean ascii text"),
    ("日本語テキスト", "日本語テキスト"),                 # CJK untouched
    ("Größe straße", "Größe straße"),                   # real Latin-1 text: no
    ("truncated tail Ã", "truncated tail Ã"),           # lone lead byte
    ("cafÃ© dangling Ã", "cafÃ© dangling Ã"),           # signal but malformed
    ("bad � byte", "bad � byte"),             # already-lost bytes
    ("", ""),
    (None, None),
]


@pytest.fixture(scope="module")
def moji_df(spark):
    rows = [(i, raw) for i, (raw, _) in enumerate(CASES)]
    return spark.createDataFrame(rows, ["id", "text"])


def test_fix_mojibake_goldens(moji_df):
    got = {
        r.id: r.fixed
        for r in moji_df.select(
            "id", fix_mojibake(F.col("text")).alias("fixed")
        ).collect()
    }
    for i, (_, want) in enumerate(CASES):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_fix_mojibake_idempotent(moji_df):
    once = moji_df.select("id", fix_mojibake(F.col("text")).alias("text"))
    twice = once.select("id", fix_mojibake(F.col("text")).alias("text"))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_signals(moji_df):
    sig = {
        r.id: r
        for r in moji_df.select(
            "id", *[c.alias(k) for k, c in mojibake_exprs(F.col("text")).items()]
        ).collect()
    }
    assert sig[0].n_latin1_digraphs == 1 and sig[0].has_mojibake
    assert sig[1].n_trigraphs == 2
    assert sig[4].n_nbsp_artifacts == 1 and sig[4].n_latin1_digraphs == 1
    assert not sig[5].has_mojibake
    assert not sig[6].has_mojibake          # CJK is NOT flagged
    assert not sig[7].has_mojibake          # real Latin-1 text is NOT flagged
    assert sig[10].n_fffd == 1 and sig[10].has_mojibake


def test_census_grouped(spark):
    df = spark.createDataFrame(
        [("a", "cafÃ© x"), ("a", "clean"), ("b", "donâ€™t"), ("b", None)],
        ["src", "text"],
    )
    out = {r.src: r for r in mojibake_census(df, "text", ["src"]).collect()}
    assert out["a"].rows_affected == 1 and out["a"].rows_repairable == 1
    assert out["a"].n_rows == 2
    assert out["b"].rows_affected == 1 and out["b"].n_trigraphs == 1


def test_census_plan_is_single_pass(spark):
    """Census over a grouped frame: one scan, one shuffle (the groupBy)."""
    df = spark.createDataFrame([("a", "x")], ["src", "text"])
    plan = mojibake_census(df, "text", ["src"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1
