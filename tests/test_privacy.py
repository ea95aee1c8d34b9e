"""k-anonymity / l-diversity audits (operators/privacy.py).

Hand-computed truths on a tiny table with NULL quasi values and NULL
sensitive values; error paths; SQL-replay parity against the exact
GROUP BY the docstring promises.
"""

from __future__ import annotations

import pytest

from gbif_data_validator_spark.operators.privacy import (
    k_anonymity_classes,
    k_anonymity_summary,
)


@pytest.fixture(scope="module")
def people(spark):
    # (region, segment, salary) — class sizes engineered:
    #   ("e", "x"): 3 rows, salaries {10, 10, 20}  -> l=2
    #   ("e", "y"): 1 row,  salary NULL            -> l=0, risky
    #   ("w", "x"): 4 rows, salaries all 30        -> l=1, homogeneous
    #   (NULL,"x"): 2 rows, salaries {40, 50}      -> NULL quasi groups together
    rows = [
        ("e", "x", 10.0),
        ("e", "x", 10.0),
        ("e", "x", 20.0),
        ("e", "y", None),
        ("w", "x", 30.0),
        ("w", "x", 30.0),
        ("w", "x", 30.0),
        ("w", "x", 30.0),
        (None, "x", 40.0),
        (None, "x", 50.0),
    ]
    return spark.createDataFrame(rows, "region string, segment string, salary double")


def test_classes_exact(people):
    got = {
        (r["region"], r["segment"]): r
        for r in k_anonymity_classes(
            people, ["region", "segment"], k=3, sensitive_col="salary"
        ).collect()
    }
    assert len(got) == 4
    ex = got[("e", "x")]
    assert (ex["class_size"], ex["l_diversity"], ex["risky"], ex["homogeneous"]) == (
        3,
        2,
        False,
        False,
    )
    ey = got[("e", "y")]
    # all-NULL sensitive -> l = 0, which counts as homogeneous (<=1)
    assert (ey["class_size"], ey["l_diversity"], ey["risky"], ey["homogeneous"]) == (
        1,
        0,
        True,
        True,
    )
    wx = got[("w", "x")]
    assert (wx["class_size"], wx["l_diversity"], wx["risky"], wx["homogeneous"]) == (
        4,
        1,
        False,
        True,
    )
    nx = got[(None, "x")]  # NULL region is ONE class (GROUP BY semantics)
    assert (nx["class_size"], nx["l_diversity"], nx["risky"]) == (2, 2, True)


def test_classes_without_sensitive(people):
    cols = k_anonymity_classes(people, ["region"], k=2).columns
    assert cols == ["region", "class_size", "risky"]


def test_summary_exact(people):
    row = k_anonymity_summary(
        people, ["region", "segment"], k=3, sensitive_col="salary"
    ).collect()[0]
    assert row["n_rows"] == 10
    assert row["n_classes"] == 4
    assert row["min_k"] == 1
    assert row["rows_below_k"] == 3  # ("e","y") 1 + (NULL,"x") 2
    assert row["pct_below_k_micro"] == (1_000_000 * 3) // 10
    assert row["min_l"] == 0
    assert row["rows_homogeneous"] == 5  # ("e","y") 1 + ("w","x") 4


def test_summary_empty(spark):
    empty = spark.createDataFrame([], "region string, salary double")
    row = k_anonymity_summary(empty, ["region"], k=5, sensitive_col="salary").collect()[
        0
    ]
    assert row["n_rows"] == 0
    assert row["n_classes"] == 0
    assert row["min_k"] is None
    assert row["rows_below_k"] == 0
    assert row["pct_below_k_micro"] is None


def test_arg_validation(people):
    with pytest.raises(ValueError):
        k_anonymity_classes(people, [], k=5)
    with pytest.raises(ValueError):
        k_anonymity_classes(people, ["region"], k=1)


def test_sql_parity(spark, people):
    """The class table IS the documented GROUP BY — replay it in Spark SQL
    and compare sets (the same replay the DuckDB oracle runs at sf0.01)."""
    people.createOrReplaceTempView("ppl")
    want = {
        tuple(r)
        for r in spark.sql(
            """
            SELECT region, segment, COUNT(*) AS class_size,
                   COUNT(DISTINCT salary) AS l_diversity,
                   COUNT(*) < 3 AS risky,
                   COUNT(DISTINCT salary) <= 1 AS homogeneous
            FROM ppl GROUP BY region, segment
            """
        ).collect()
    }
    got = {
        tuple(r)
        for r in k_anonymity_classes(
            people, ["region", "segment"], k=3, sensitive_col="salary"
        ).collect()
    }
    assert got == want


def test_k_anonymity_matches_pandas_on_random_tables(spark):
    """Seeded-random quasi/sensitive tables vs a pure-pandas groupby
    replay of both faces (classes and the one-row gate)."""
    import random

    for seed in (3, 11):
        rng = random.Random(seed)
        n = rng.randint(5, 80)
        rows = [
            (
                rng.choice(["a", "b", "c", None]),
                rng.choice(["x", "y", None]),
                rng.choice([1.0, 2.0, 3.0, None]),
            )
            for _ in range(n)
        ]
        df = spark.createDataFrame(rows, "q1 string, q2 string, s double")
        k = rng.randint(2, 5)
        got = {
            (r["q1"], r["q2"]): r
            for r in k_anonymity_classes(
                df, ["q1", "q2"], k=k, sensitive_col="s"
            ).collect()
        }
        # pure-python replay (NULLs group together; l counts non-null s)
        want: dict = {}
        for q1, q2, s in rows:
            cs, vals = want.setdefault((q1, q2), [0, set()])
            want[(q1, q2)][0] += 1
            if s is not None:
                vals.add(s)
        assert len(got) == len(want), seed
        for key, (cs, vals) in want.items():
            r = got[key]
            assert (r["class_size"], r["l_diversity"]) == (cs, len(vals)), (
                seed,
                key,
            )
            assert r["risky"] == (cs < k) and r["homogeneous"] == (
                len(vals) <= 1
            ), (seed, key)

        gate = k_anonymity_summary(df, ["q1", "q2"], k=k, sensitive_col="s").first()
        sizes = [cs for cs, _ in want.values()]
        below = sum(cs for cs, _ in want.values() if cs < k)
        assert gate["n_rows"] == n and gate["n_classes"] == len(want)
        assert gate["min_k"] == min(sizes) and gate["rows_below_k"] == below
        assert gate["pct_below_k_micro"] == 1_000_000 * below // n
