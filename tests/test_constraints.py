"""Constraint discovery + FD/mask operators. Bit-exact value checks live
in the fd_check / mask_profile / suggest_constraints / url_canonical
driver oracles; these pin the branchy semantics (null groups, completeness
ratios, the IN_SET cardinality gate, the two-scan plan contract)."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.constraints import (
    benford_deviation,
    fd_violations,
    iqr_outlier_rows,
    mask_expr,
    mask_profile,
    suggest_constraints,
    verify_constraints,
)


def test_fd_violations_null_semantics(spark):
    df = spark.createDataFrame(
        [
            ("a", "x"), ("a", "x"),          # clean group
            ("b", "x"), ("b", "y"),          # violation
            ("c", "x"), ("c", None),         # null RHS ignored -> clean
            (None, "x"), (None, "y"),        # null LHS group still checked
        ],
        "k string, v string",
    )
    got = {r.k: (r.n_rows, r.n_rhs_distinct, r.rhs_min, r.rhs_max)
           for r in fd_violations(df, ["k"], "v").collect()}
    assert got == {"b": (2, 2, "x", "y"), None: (2, 2, "x", "y")}


def test_fd_violations_multi_column_lhs(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 1, "y"), ("a", 2, "x"), ("b", 1, "x")],
        "k1 string, k2 int, v string",
    )
    rows = fd_violations(df, ["k1", "k2"], "v").collect()
    assert [(r.k1, r.k2) for r in rows] == [("a", 1)]


def test_mask_expr_classes(spark):
    df = spark.createDataFrame([("Clerk#000000001",), ("+41 22-B x",)], "s string")
    got = [r.m for r in df.select(mask_expr(F.col("s")).alias("m")).collect()]
    assert got == ["Aaaaa#999999999", "+99 99-A a"]


def test_mask_profile_order_and_example(spark):
    df = spark.createDataFrame(
        [("ab1",), ("cd2",), ("ef3",), ("X9",), (None,)], "s string"
    )
    rows = mask_profile(df, "s").collect()
    assert [(r.mask, r.n_rows, r.n_values, r.example) for r in rows] == [
        ("aa9", 3, 3, "ab1"),   # most frequent first; example = min value
        ("A9", 1, 1, "X9"),     # nulls excluded entirely
    ]


def test_suggest_constraints_branches(spark):
    df = spark.createDataFrame(
        [
            (1, "a", "red", None),
            (2, "b", "red", 1.5),
            (3, "c", "blue", 2.5),
            (4, "d", "blue", 3.5),
        ],
        "id int, name string, color string, score double",
    )
    got = {(r["column"], r["constraint"]): r["detail"]
           for r in suggest_constraints(df).collect()}
    assert got[("id", "NOT_NULL")] == ""
    assert got[("id", "UNIQUE")] == ""
    assert got[("id", "RANGE")] == "1..4"
    assert got[("name", "UNIQUE")] == ""
    assert got[("color", "IN_SET")] == "blue,red"   # sorted, < nn so not UNIQUE
    assert ("color", "UNIQUE") not in got
    assert got[("score", "COMPLETENESS_GE")] == "0.750000"
    assert ("score", "NOT_NULL") not in got
    assert got[("score", "RANGE")] == "1.5..3.5"
    # unique columns never get IN_SET even at tiny cardinality
    assert ("id", "IN_SET") not in got and ("name", "IN_SET") not in got


def test_suggest_constraints_in_set_cardinality_gate(spark):
    # 11 distinct values > max_set=10 -> no IN_SET, and (the scale
    # contract) no collect_set scan runs at all for that column
    df = spark.createDataFrame([(i, f"v{i % 11}") for i in range(50)], "id int, c string")
    got = {(r["column"], r["constraint"]) for r in suggest_constraints(df).collect()}
    assert ("c", "IN_SET") not in got
    got10 = {(r["column"], r["constraint"]): r["detail"]
             for r in suggest_constraints(df, max_set=11).collect()}
    assert got10[("c", "IN_SET")] == ",".join(sorted(f"v{i}" for i in range(11)))


def test_suggest_constraints_empty_table(spark):
    df = spark.createDataFrame([], "id int, c string")
    assert suggest_constraints(df).collect() == []


def test_benford_digit_extraction_and_math(spark):
    # digits from the string form: 123.0->1, 0.045->4, -900.0->9;
    # 0 / NULL excluded
    df = spark.createDataFrame(
        [(123.0,), (0.045,), (-900.0,), (1.5,), (0.0,), (None,)], "x double"
    )
    rows = {r.digit: r for r in benford_deviation(df, "x").collect()}
    assert set(rows) == {"1", "4", "9"}
    assert rows["1"].n_rows == 2 and rows["1"].frac == 0.5
    assert rows["1"].expected == round(__import__("math").log10(2), 6)
    assert rows["9"].abs_dev == round(abs(0.25 - round(__import__("math").log10(1 + 1 / 9), 6)), 6)


def test_iqr_outlier_fences(spark):
    # sorted [-50,1,2,3,4,5,100]: interpolated q1=1.5, q3=4.5, IQR=3
    # -> fences [-3, 9]: only 100 and -50 flagged
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 100, -50])],
        "id long, x double",
    )
    rows = iqr_outlier_rows(df, "x", id_cols=["id"]).collect()
    got = sorted((r.id, r.x) for r in rows)
    assert got == [(5, 100.0), (6, -50.0)]
    assert rows[0].lo == -3.0 and rows[0].hi == 9.0


def test_verify_constraints_roundtrip_clean(spark):
    # the suggest -> verify loop: a clean table passes every rule it
    # suggested for itself, in one agg scan
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, v double",
    )
    rules = [
        (r.column, r.constraint, r.detail)
        for r in suggest_constraints(df).collect()
    ]
    assert rules  # NOT_NULL/UNIQUE/RANGE at minimum
    res = verify_constraints(df, rules).collect()
    assert all(r.passed for r in res)
    assert all(r.n_violations == 0 for r in res)


def test_verify_constraints_planted_violations(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, None), (2, "y"), (3, "ZZZ")], "id long, tag string"
    )
    res = {
        (r.column, r.constraint): r
        for r in verify_constraints(
            df,
            [
                ("id", "UNIQUE", ""),
                ("id", "RANGE", "1..2"),
                ("tag", "NOT_NULL", ""),
                ("tag", "IN_SET", "x,y"),
                ("tag", "COMPLETENESS_GE", "0.500000"),
            ],
        ).collect()
    }
    assert res[("id", "UNIQUE")].n_violations == 1 and not res[("id", "UNIQUE")].passed
    assert res[("id", "RANGE")].n_violations == 1  # the 3
    assert res[("tag", "NOT_NULL")].n_violations == 1
    assert res[("tag", "IN_SET")].n_violations == 1  # ZZZ; NULL ignored
    # 3/4 = 0.75 >= 0.5: records the null but passes
    c = res[("tag", "COMPLETENESS_GE")]
    assert c.n_violations == 1 and c.passed


def test_verify_constraints_unknown_kind_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="unknown constraint kind"):
        verify_constraints(df, [("id", "REGEX", ".*")])


def test_verify_constraints_single_job(spark):
    # the scale contract: N rules = ONE aggregation action (one scan),
    # regardless of rule count — pinned via the job-group tracker the
    # same way test_graph pins PageRank's per-iteration job count
    df = spark.createDataFrame(
        [(i, f"v{i % 5}") for i in range(100)], "id long, tag string"
    )
    rules_small = [("id", "NOT_NULL", ""), ("id", "UNIQUE", "")]
    rules_big = rules_small + [
        ("id", "RANGE", "0..99"),
        ("tag", "NOT_NULL", ""),
        ("tag", "IN_SET", "v0,v1,v2,v3,v4"),
        ("tag", "COMPLETENESS_GE", "0.900000"),
    ]
    sc = spark.sparkContext

    def jobs_for(rules) -> int:
        group = f"vc-jobcount-{len(rules)}"
        sc.setJobGroup(group, "verify_constraints job-count pin")
        try:
            verify_constraints(df, rules)
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    n_small, n_big = jobs_for(rules_small), jobs_for(rules_big)
    assert n_small == n_big  # more rules never add a scan


def test_column_entropy_analytic(spark):
    import math

    # uniform over 4 values -> ln 4; constant column -> 0.0; NULLs excluded
    df = spark.createDataFrame(
        [(v, "k") for v in ["a", "a", "b", "b", "c", "c", "d", "d"]]
        + [(None, "k")],
        "x string, y string",
    )
    from gbif_data_validator_spark.operators.constraints import column_entropy

    row = column_entropy(df, "x").collect()[0]
    assert (row["column"], row["n_rows"], row["n_groups"]) == ("x", 8, 4)
    assert row["value"] == round(math.log(4), 6)
    const = column_entropy(df, "y").collect()[0]
    assert const["value"] == 0.0 and const["n_groups"] == 1


def test_mutual_information_analytic(spark):
    import math

    from gbif_data_validator_spark.operators.constraints import (
        column_entropy,
        mutual_information,
    )

    # independent pair -> 0.0
    indep = spark.createDataFrame(
        [("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")], "x string, y string"
    )
    assert mutual_information(indep, "x", "y").collect()[0]["value"] == 0.0
    # identical columns -> MI == H(X)
    dep = spark.createDataFrame(
        [("a", "a"), ("a", "a"), ("b", "b"), ("c", "c")], "x string, y string"
    )
    mi = mutual_information(dep, "x", "y").collect()[0]
    h = column_entropy(dep, "x").collect()[0]
    assert mi["value"] == h["value"] > 0
    assert mi["column"] == "x|y" and mi["n_groups"] == 3
    # either-side NULL rows excluded
    holey = spark.createDataFrame(
        [("a", "c"), ("a", None), (None, "d")], "x string, y string"
    )
    assert mutual_information(holey, "x", "y").collect()[0]["n_rows"] == 1


def test_entropy_max_groups_guard(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.operators.constraints import column_entropy

    df = spark.createDataFrame([(str(i),) for i in range(50)], "x string")
    with _pytest.raises(Exception, match="exceeds max_groups"):
        column_entropy(df, "x", max_groups=10).collect()


def test_verify_constraints_new_kinds(spark):
    from gbif_data_validator_spark.operators.constraints import verify_constraints

    df = spark.createDataFrame(
        [("AB-1", 10.0), ("CD-2", 20.0), ("bad", 30.0), (None, None)],
        "code string, x double",
    )
    rows = {
        (r["column"], r["constraint"], r["detail"]): r
        for r in verify_constraints(df, [
            ("code", "MATCHES", "^[A-Z]{2}-[0-9]$"),
            ("code", "LENGTH_BETWEEN", "4..4"),
            ("x", "QUANTILE_BETWEEN", "0.5:15..25"),   # median 20 -> pass
            ("x", "QUANTILE_BETWEEN", "0.5:21..25"),   # median 20 -> fail
        ]).collect()
    }
    m = rows[("code", "MATCHES", "^[A-Z]{2}-[0-9]$")]
    assert (m["n_violations"], m["passed"]) == (1, False)  # 'bad'; NULL skipped
    lb = rows[("code", "LENGTH_BETWEEN", "4..4")]
    assert (lb["n_violations"], lb["passed"]) == (1, False)
    by_detail = {r["detail"]: r for (_, k, _d), r in rows.items()
                 if k == "QUANTILE_BETWEEN"}
    assert by_detail["0.5:15..25"]["passed"] is True
    assert by_detail["0.5:21..25"]["passed"] is False
    assert by_detail["0.5:21..25"]["n_violations"] == 1
    # all-NULL column passes QUANTILE_BETWEEN vacuously
    empty = spark.createDataFrame([(None,), (None,)], "x double")
    r = verify_constraints(empty, [("x", "QUANTILE_BETWEEN", "0.5:0..1")]).collect()[0]
    assert r["passed"] is True and r["n_violations"] == 0


def test_verify_constraints_by_matches_whole_table_on_one_group(spark):
    from gbif_data_validator_spark.operators.constraints import verify_constraints_by

    df = spark.createDataFrame(
        [(1, "x", 10.0), (1, None, 20.0), (2, "y", 30.0), (3, "ZZZ", 40.0)],
        "id long, tag string, v double",
    ).withColumn("g", F.lit("all"))
    rules = [
        ("id", "UNIQUE", ""),
        ("id", "RANGE", "1..2"),
        ("tag", "NOT_NULL", ""),
        ("tag", "IN_SET", "x,y"),
        ("tag", "COMPLETENESS_GE", "0.500000"),
        ("v", "QUANTILE_BETWEEN", "0.5:0..25"),
    ]
    whole = {
        (r.column, r.constraint): (r.n_violations, r.passed)
        for r in verify_constraints(df, rules).collect()
    }
    grouped = {
        (r.column, r.constraint): (r.n_violations, r.passed)
        for r in verify_constraints_by(df, rules, ["g"]).collect()
    }
    assert grouped == whole


def test_verify_constraints_by_isolates_groups(spark):
    from gbif_data_validator_spark.operators.constraints import verify_constraints_by

    # violations planted ONLY in group b must not bleed into group a's
    # verdicts — including UNIQUE, whose duplicate ids are per-group
    rows = [("a", 1, "x"), ("a", 2, "y"), ("b", 1, None), ("b", 1, "ZZZ")]
    df = spark.createDataFrame(rows, "g string, id long, tag string")
    rules = [("id", "UNIQUE", ""), ("tag", "NOT_NULL", ""), ("tag", "IN_SET", "x,y")]
    res = {
        (r.g, r.column, r.constraint): (r.n_violations, r.passed)
        for r in verify_constraints_by(df, rules, ["g"]).collect()
    }
    assert res[("a", "id", "UNIQUE")] == (0, True)
    assert res[("a", "tag", "NOT_NULL")] == (0, True)
    assert res[("a", "tag", "IN_SET")] == (0, True)
    assert res[("b", "id", "UNIQUE")] == (1, False)
    assert res[("b", "tag", "NOT_NULL")] == (1, False)
    assert res[("b", "tag", "IN_SET")] == (1, False)
    # and the id=1 duplicated ACROSS groups is not a within-group duplicate
    assert all(res[(g, "id", "UNIQUE")][1] for g in ("a",))


def test_verify_constraints_by_plan_shape(spark):
    from gbif_data_validator_spark.operators.constraints import verify_constraints_by

    # scale contract: one grouped aggregation scan feeds every rule — no
    # joins, the unpivot is a JVM-side explode over the agg output, and
    # counting-only rule batteries carry exactly ONE Exchange (the groupBy).
    # A UNIQUE rule adds the standard second Exchange of Spark's two-phase
    # exact distinct ((g, id) pre-agg → (g) final) — still one scan.
    df = spark.createDataFrame(
        [(f"g{i % 3}", i, f"v{i % 5}") for i in range(60)],
        "g string, id long, tag string",
    )
    rules = [
        ("id", "NOT_NULL", ""),
        ("id", "RANGE", "0..59"),
        ("tag", "IN_SET", "v0,v1,v2,v3,v4"),
    ]

    def plan_of(rs) -> str:
        return (
            verify_constraints_by(df, rs, ["g"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    counting = plan_of(rules)
    assert counting.count("Exchange") == 1, counting
    assert "Join" not in counting, counting
    with_unique = plan_of(rules + [("id", "UNIQUE", "")])
    assert with_unique.count("Exchange") == 2, with_unique
    assert "Join" not in with_unique, with_unique


def test_quantiles_by_exact_per_group(spark):
    from gbif_data_validator_spark.operators.constraints import quantiles_by

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         ("b", 10.0), ("b", 20.0), ("b", None)],
        "g string, v double",
    )
    got = {r.g: (r.n, r.q25, r.q50, r.q75)
           for r in quantiles_by(df, "v", ["g"]).collect()}
    # linear interpolation, NULLs excluded from both count and quantiles
    assert got["a"] == (4, 1.75, 2.5, 3.25)
    assert got["b"] == (2, 12.5, 15.0, 17.5)


def test_mad_outlier_rows_robust_to_heavy_contamination(spark):
    from gbif_data_validator_spark.operators.constraints import mad_outlier_rows

    # 9 inliers around 10, one absurd point; MAD spread stays tight
    rows = [(i, 10.0 + (i % 3) * 0.1) for i in range(9)] + [(99, 1000.0)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = [r.id for r in mad_outlier_rows(df, "v", k=3.0, id_cols=["id"]).collect()]
    assert got == [99]
    # center is the true median, spread = k * 1.4826 * MAD
    r = mad_outlier_rows(df, "v", k=3.0, id_cols=["id"]).first()
    assert r.center == 10.1 and abs(r.spread - 3.0 * 1.4826 * 0.1) < 1e-6


def test_json_key_rule_presence_and_type(spark):
    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "tag": "x"}'),
            (2, '{"k": "seven"}'),          # present, uncastable
            (3, '{"tag": "y"}'),            # missing k
            (4, "not json at all"),         # unparseable → missing
            (5, None),                      # NULL payload skipped
        ],
        "id long, props string",
    )
    res = {
        r.detail: (r.n_violations, r.passed)
        for r in verify_constraints(
            df,
            [
                ("props", "JSON_KEY", "$.k:BIGINT"),
                ("props", "JSON_KEY", "$.tag:STRING"),
            ],
        ).collect()
    }
    assert res["$.k:BIGINT"] == (3, False)   # rows 2, 3, 4
    assert res["$.tag:STRING"] == (2, False)  # rows 2 (no tag), 4


def test_json_key_rule_streams_and_groups(spark):
    # the kind rides the shared compiler: grouped face works, streaming
    # compiler accepts it (counting aggregate)
    from gbif_data_validator_spark.operators.constraints import (
        rule_agg_exprs,
        verify_constraints_by,
    )

    rule_agg_exprs([("props", "JSON_KEY", "$.k:BIGINT")], streaming=True)
    df = spark.createDataFrame(
        [("a", '{"k": 1}'), ("b", '{"z": 1}')], "g string, props string"
    )
    got = {
        r.g: r.n_violations
        for r in verify_constraints_by(
            df, [("props", "JSON_KEY", "$.k:BIGINT")], ["g"]
        ).collect()
    }
    assert got == {"a": 0, "b": 1}


def test_correlation_exact_matches_numpy(spark):
    """correlation_exact reproduces the closed-form Pearson r (to the 6-dp
    quantization) and is invariant to partitioning — the property the
    naive double-sum corr() lacks."""
    import numpy as np

    from gbif_data_validator_spark.operators.constraints import correlation_exact

    rng_x = [float(i) for i in range(1, 101)]
    rng_y = [2.5 * x + ((x * 37) % 11) - 5.0 for x in rng_x]
    df = spark.createDataFrame(list(zip(rng_x, rng_y)), "x double, y double")
    r = correlation_exact(df, "x", "y").collect()[0]
    assert r["n_rows"] == 100
    assert abs(r["corr"] - round(float(np.corrcoef(rng_x, rng_y)[0, 1]), 6)) <= 1e-6
    # partitioning invariance: identical result at 1 and 16 partitions
    r16 = correlation_exact(df.repartition(16), "x", "y").collect()[0]
    assert r16["corr"] == r["corr"]


def test_correlation_exact_null_and_degenerate(spark):
    """Pairwise-complete NULL handling; zero variance → NULL corr (never
    an engine-dependent 0/0)."""
    from gbif_data_validator_spark.operators.constraints import correlation_exact

    df = spark.createDataFrame(
        [("g1", 1.0, 2.0), ("g1", 2.0, 4.0), ("g1", None, 9.0),
         ("g1", 3.0, None), ("g2", 5.0, 1.0), ("g2", 5.0, 7.0)],
        "g string, x double, y double",
    )
    got = {r["g"]: r for r in correlation_exact(df, "x", "y", ["g"]).collect()}
    assert got["g1"]["n_rows"] == 2 and got["g1"]["corr"] == 1.0
    # g2: x has zero variance
    assert got["g2"]["n_rows"] == 2 and got["g2"]["corr"] is None


def test_null_pattern_census_counts_and_blank_mode(spark):
    from gbif_data_validator_spark.operators.constraints import null_pattern_census

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), (None, None), ("  ", 2.0), ("\u00a0", 3.0)],
        "s string, v double",
    )
    plain = {r["pattern"]: r["n_rows"]
             for r in null_pattern_census(df, ["s", "v"]).collect()}
    assert plain == {"00": 3, "01": 1, "11": 1}
    # blank_as_missing folds whitespace-only strings into '1' — but NBSP is
    # a real character under Java \S (the engine-wide blank semantics), so
    # the U+00A0 row stays '00'
    blank = {r["pattern"]: r["n_rows"]
             for r in null_pattern_census(df, ["s", "v"],
                                          blank_as_missing=True).collect()}
    assert blank == {"00": 2, "01": 1, "10": 1, "11": 1}
    shares = {r["pattern"]: r["share"]
              for r in null_pattern_census(df, ["s", "v"]).collect()}
    assert shares["00"] == 0.6


def test_dtype_census_classes_and_inference(spark):
    from gbif_data_validator_spark.operators.constraints import dtype_census

    def census(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        return dtype_census(df, "v").collect()[0].asDict()

    mixed = census(["42", "-7", "3.14", "2e3", "TRUE", "abc", "", None])
    assert mixed == {"n_rows": 8, "n_null": 1, "n_boolean": 1,
                     "n_integral": 2, "n_fractional": 2, "n_string": 2,
                     "inferred": "String"}
    assert census(["true", "False"])["inferred"] == "Boolean"
    assert census(["1", "+2", "-0007"])["inferred"] == "Integral"
    assert census(["1", "2.5", ".5", "1e-3", None])["inferred"] == "Fractional"
    # booleans mixed with numerics have no covering numeric type
    assert census(["true", "1"])["inferred"] == "String"
    assert census([None, None])["inferred"] == "Unknown"


def test_corr_between_rule_all_faces(spark):
    """CORR_BETWEEN rides the shared compiler: whole-table verdict agrees
    with correlation_exact, grouped face isolates groups, streaming
    compiler ACCEPTS it (bounded-sum state, unlike UNIQUE/QUANTILE),
    degenerate variance passes vacuously."""
    from gbif_data_validator_spark.operators.constraints import (
        correlation_exact,
        rule_agg_exprs,
        verify_constraints_by,
    )

    # streaming compiler must not raise for this kind
    rule_agg_exprs([("x", "CORR_BETWEEN", "y:0.9..1.0")], streaming=True)

    xs = [float(i) for i in range(1, 41)]
    df = spark.createDataFrame(
        [(x, 3.0 * x + ((x * 7) % 5)) for x in xs], "x double, y double"
    )
    expected = correlation_exact(df, "x", "y").collect()[0]["corr"]
    assert expected > 0.99
    res = {
        (r.constraint, r.detail): (r.n_violations, r.passed)
        for r in verify_constraints(
            df,
            [("x", "CORR_BETWEEN", "y:0.9..1.0"),
             ("x", "CORR_BETWEEN", "y:-1.0..0.0")],
        ).collect()
    }
    assert res[("CORR_BETWEEN", "y:0.9..1.0")] == (0, True)
    assert res[("CORR_BETWEEN", "y:-1.0..0.0")] == (1, False)

    # grouped face: g1 perfectly correlated, g2 anti-correlated, g3
    # zero-variance (vacuous pass)
    gdf = spark.createDataFrame(
        [("g1", 1.0, 2.0), ("g1", 2.0, 4.0), ("g1", 3.0, 6.0),
         ("g2", 1.0, 9.0), ("g2", 2.0, 5.0), ("g2", 3.0, 1.0),
         ("g3", 7.0, 1.0), ("g3", 7.0, 2.0)],
        "g string, x double, y double",
    )
    got = {
        r.g: (r.n_violations, r.passed)
        for r in verify_constraints_by(
            gdf, [("x", "CORR_BETWEEN", "y:0.5..1.0")], ["g"]
        ).collect()
    }
    assert got == {"g1": (0, True), "g2": (1, False), "g3": (0, True)}

    # whole-table and grouped faces agree on a single-group table
    one = gdf.where(F.col("g") == "g2")
    whole = verify_constraints(one, [("x", "CORR_BETWEEN", "y:0.5..1.0")]).collect()[0]
    assert (whole.n_violations, whole.passed) == got["g2"]


def test_null_pattern_census_empty_cols_raises(spark):
    import pytest

    from gbif_data_validator_spark.operators.constraints import null_pattern_census

    with pytest.raises(ValueError, match="at least one column"):
        null_pattern_census(spark.createDataFrame([(1,)], "a int"), [])


# ------------------------------------------------- aggregate-envelope kinds


def test_agg_envelope_kinds_all_semantics(spark):
    import datetime as dt

    from gbif_data_validator_spark.operators.constraints import verify_constraints

    df = spark.createDataFrame(
        [
            (1, 10.0, dt.datetime(2024, 1, 1)),
            (2, 20.0, dt.datetime(2024, 1, 2)),
            (3, None, dt.datetime(2024, 1, 3)),
        ],
        "id long, v double, ts timestamp",
    )
    rules = [
        ("v", "MIN_BETWEEN", "5..15"),
        ("v", "MAX_BETWEEN", "0..15"),                        # max 20 → fail
        ("v", "MEAN_BETWEEN", "14..16"),                      # mean 15
        ("v", "SUM_BETWEEN", "29..31"),                       # sum 30
        ("*", "N_ROWS_BETWEEN", "1..2"),                      # 3 rows → fail
        ("ts", "FRESH_WITHIN", "2024-01-03 12:00:00|43200"),  # lag == budget
        ("ts", "FRESH_WITHIN", "2024-01-05 00:00:00|3600"),   # stale → fail
    ]
    got = {
        (r.constraint, r.detail): (r.n_violations, r.passed)
        for r in verify_constraints(df, rules).collect()
    }
    assert got[("MIN_BETWEEN", "5..15")] == (0, True)
    assert got[("MAX_BETWEEN", "0..15")] == (1, False)
    assert got[("MEAN_BETWEEN", "14..16")] == (0, True)
    assert got[("SUM_BETWEEN", "29..31")] == (0, True)
    assert got[("N_ROWS_BETWEEN", "1..2")] == (1, False)
    assert got[("FRESH_WITHIN", "2024-01-03 12:00:00|43200")] == (0, True)
    assert got[("FRESH_WITHIN", "2024-01-05 00:00:00|3600")] == (1, False)


def test_fresh_within_empty_fails_but_other_envelopes_pass_vacuously(spark):
    from gbif_data_validator_spark.operators.constraints import verify_constraints

    e = spark.createDataFrame([], "v double, ts timestamp")
    got = {
        r.constraint: r.passed
        for r in verify_constraints(
            e,
            [
                ("ts", "FRESH_WITHIN", "2024-01-01 00:00:00|60"),
                ("v", "MIN_BETWEEN", "0..1"),
                ("v", "MEAN_BETWEEN", "0..1"),
                ("v", "SUM_BETWEEN", "0..1"),
            ],
        ).collect()
    }
    # silence is staleness; an aggregate over nothing has no claim to test
    assert got == {
        "FRESH_WITHIN": False,
        "MIN_BETWEEN": True,
        "MEAN_BETWEEN": True,
        "SUM_BETWEEN": True,
    }


def test_mean_sum_partitioning_invariance(spark):
    """The DECIMAL(38,0) quantized sums make MEAN/SUM verdicts (and their
    round-6 observed values) identical under any partitioning — the
    property a naive double SUM does not have."""
    import random

    from gbif_data_validator_spark.operators.constraints import verify_constraints

    rng = random.Random(3)
    rows = [(i, rng.uniform(-1000, 1000)) for i in range(5000)]
    rules = [("v", "MEAN_BETWEEN", "-50..50"), ("v", "SUM_BETWEEN", "-1e9..1e9")]
    outs = []
    for parts in (1, 7, 32):
        df = spark.createDataFrame(rows, "id long, v double").repartition(parts)
        outs.append(
            sorted(map(tuple, verify_constraints(df, rules).collect()))
        )
    assert outs[0] == outs[1] == outs[2]


def test_agg_envelope_kinds_grouped_and_streaming_faces(spark):
    from gbif_data_validator_spark.operators.constraints import (
        rule_agg_exprs,
        verify_constraints_by,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 100.0)], "g string, v double"
    )
    rules = [("v", "MAX_BETWEEN", "0..50"), ("*", "N_ROWS_BETWEEN", "2..9")]
    got = {
        (r.g, r.constraint): r.passed
        for r in verify_constraints_by(df, rules, ["g"]).collect()
    }
    assert got == {
        ("a", "MAX_BETWEEN"): True,
        ("a", "N_ROWS_BETWEEN"): True,
        ("b", "MAX_BETWEEN"): False,
        ("b", "N_ROWS_BETWEEN"): False,
    }
    # every envelope kind is streaming-legal (incremental aggregates)
    rule_agg_exprs(
        [
            ("v", "MIN_BETWEEN", "0..1"),
            ("v", "MAX_BETWEEN", "0..1"),
            ("v", "MEAN_BETWEEN", "0..1"),
            ("v", "SUM_BETWEEN", "0..1"),
            ("*", "N_ROWS_BETWEEN", "0..1"),
            ("ts", "FRESH_WITHIN", "2024-01-01 00:00:00|60"),
        ],
        streaming=True,
    )


# ------------------------------------------------------------ key discovery


def test_candidate_keys_exact_and_approx_agree(spark):
    from gbif_data_validator_spark.operators.constraints import candidate_keys

    rows = [(i, i % 10, f"s{i % 3}", i) for i in range(1000)]
    df = spark.createDataFrame(rows, "a long, b long, c string, d long")
    exact = sorted(map(tuple, candidate_keys(df, ["a", "b", "c", "d"]).collect()))
    approx = sorted(
        map(tuple, candidate_keys(df, ["a", "b", "c", "d"], exact=False).collect())
    )
    # keys/minimality identical; non-candidate estimates may differ from
    # exact counts, so compare the decision columns everywhere and the
    # counts on key rows only
    assert [(r[0], r[1], r[2], r[4], r[5]) for r in exact] == [
        (r[0], r[1], r[2], r[4], r[5]) for r in approx
    ]
    assert [r for r in exact if r[4]] == [r for r in approx if r[4]]
    keys = {r[0] for r in exact if r[4]}
    minimal = {r[0] for r in exact if r[5]}
    # a and d are both keys (d == i); every pair containing one is a key
    assert minimal == {"a", "d"}
    assert "a,b" in keys and "b,c" not in keys


def test_candidate_keys_null_rows_break_uniqueness(spark):
    from gbif_data_validator_spark.operators.constraints import candidate_keys

    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "a long"
    )
    r = candidate_keys(df, ["a"], max_arity=1).collect()[0]
    # COUNT DISTINCT drops the NULL row: 2 < 3 -> completeness is part of
    # being a key
    assert (r.n_rows, r.n_distinct, r.is_key) == (3, 2, False)


def test_candidate_keys_guards(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.operators.constraints import candidate_keys

    df = spark.createDataFrame([(1,)], "a long")
    with _pytest.raises(ValueError, match="non-empty"):
        candidate_keys(df, [])
    with _pytest.raises(ValueError, match="max_arity"):
        candidate_keys(df, ["a"], max_arity=0)
    wide = spark.createDataFrame([tuple(range(25))], ", ".join(f"c{i} long" for i in range(25)))
    with _pytest.raises(ValueError, match="MAX_KEY_COMBOS"):
        candidate_keys(wide, [f"c{i}" for i in range(25)], max_arity=2)


def test_candidate_keys_approx_avoids_expand(spark):
    """The scale path's pass-1 plan must contain no Expand operator (the
    exact multi-distinct cost multiplier)."""
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.constraints import candidate_keys

    df = spark.range(0, 10_000).select(
        F.col("id").alias("a"), (F.col("id") % 7).alias("b")
    )
    # exact mode: Expand is expected (documented); approx pass 1 must not
    # have it. We can't introspect the internal agg directly, so assert on
    # equivalent plans built the same way.
    exact_plan = (
        df.agg(F.countDistinct("a"), F.countDistinct("b"), F.countDistinct("a", "b"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        df.agg(
            F.approx_count_distinct(F.struct("a")),
            F.approx_count_distinct(F.struct("b")),
            F.approx_count_distinct(F.struct("a", "b")),
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan and "Expand" not in approx_plan
    # and the operator's two modes agree end-to-end on this table
    e = sorted(map(tuple, candidate_keys(df, ["a", "b"]).collect()))
    x = sorted(map(tuple, candidate_keys(df, ["a", "b"], exact=False).collect()))
    assert [(r[0], r[4], r[5]) for r in e] == [(r[0], r[4], r[5]) for r in x]


def test_compliance_and_unique_ratio_kinds(spark):
    from gbif_data_validator_spark.operators.constraints import (
        rule_agg_exprs,
        verify_constraints,
        verify_constraints_by,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 5.0), (1, None)], "k long, v double"
    )
    rules = [
        ("*", "COMPLIANCE_GE", "v < 10|0.5"),   # 2/4 compliant (NULL fails)
        ("*", "COMPLIANCE_GE", "v < 10|0.6"),   # 0.5 < 0.6 → fail
        ("k", "UNIQUE_RATIO_GE", "0.7"),        # 3 distinct / 4 = 0.75
        ("k", "UNIQUE_RATIO_GE", "0.8"),        # fail; n_violations = dups
    ]
    got = {
        (r.constraint, r.detail): (r.n_violations, r.passed)
        for r in verify_constraints(df, rules).collect()
    }
    assert got[("COMPLIANCE_GE", "v < 10|0.5")] == (2, True)
    assert got[("COMPLIANCE_GE", "v < 10|0.6")] == (2, False)
    assert got[("UNIQUE_RATIO_GE", "0.7")] == (1, True)
    assert got[("UNIQUE_RATIO_GE", "0.8")] == (1, False)
    # grouped face carries both kinds; streaming accepts COMPLIANCE_GE
    # and rejects UNIQUE_RATIO_GE like the other distinct-state kinds
    g = {
        (r.k2, r.constraint): r.passed
        for r in verify_constraints_by(
            df.withColumn("k2", df.k % 2),
            [("*", "COMPLIANCE_GE", "v < 10|0.5")],
            ["k2"],
        ).collect()
    }
    assert set(g) == {(0, "COMPLIANCE_GE"), (1, "COMPLIANCE_GE")}
    rule_agg_exprs([("*", "COMPLIANCE_GE", "v < 10|0.5")], streaming=True)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not streamable"):
        rule_agg_exprs([("k", "UNIQUE_RATIO_GE", "0.5")], streaming=True)


def test_fd_strength_hand_computed(spark):
    """g1=[a,a,a,b] keeps 3, g2=[c] keeps 1 -> g3 = 1/5 = 200000 micro."""
    from gbif_data_validator_spark.operators.constraints import fd_strength

    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "c")],
        "k string, v string",
    )
    r = fd_strength(df, ["k"], "v").collect()[0]
    assert (r.lhs, r.rhs) == ("k", "v")
    assert (r.n_rows, r.n_groups, r.n_violating_groups, r.n_kept) == (5, 2, 1, 4)
    assert r.g3_micro == 200_000


def test_fd_strength_null_semantics_and_perfect_fd(spark):
    """NULL RHS rows excluded (fd_violations parity); NULL LHS group kept;
    a perfect FD scores exactly 0."""
    from gbif_data_validator_spark.operators.constraints import fd_strength

    df = spark.createDataFrame(
        [("g1", "a"), ("g1", None), (None, "x"), (None, "y"), ("g2", "b")],
        "k string, v string",
    )
    r = fd_strength(df, ["k"], "v").collect()[0]
    # NULL-rhs row dropped; NULL-lhs group [x,y] is violating, keeps 1
    assert (r.n_rows, r.n_groups, r.n_violating_groups, r.n_kept) == (4, 3, 1, 3)
    assert r.g3_micro == 250_000
    perfect = spark.createDataFrame(
        [("g1", "a")] * 10 + [("g2", "b")] * 5, "k string, v string"
    )
    assert fd_strength(perfect, ["k"], "v").collect()[0].g3_micro == 0


def test_fd_strength_partition_invariance_and_multi_lhs(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.constraints import fd_strength

    df = spark.range(0, 3000).select(
        (F.col("id") % 7).cast("string").alias("a"),
        (F.col("id") % 3).cast("string").alias("b"),
        (F.col("id") % 10).cast("string").alias("v"),
    )
    r1 = fd_strength(df, ["a", "b"], "v").collect()[0]
    r2 = fd_strength(df.repartition(13), ["a", "b"], "v").collect()[0]
    assert tuple(r1) == tuple(r2)
    assert r1.lhs == "a,b" and r1.n_groups == 21
