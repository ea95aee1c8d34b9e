"""Distinct-first top-N sampler — port of
RecordEvaluationResultCollectorTest (collector/RecordEvaluationResult
CollectorTest.java:21-106): distinct input-keys first, top-up with
non-distinct overflow, hard cap at N, deterministic order."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.sampling import (
    distinct_first_samples,
    top_n_by_key,
)


def _violations(spark, rows):
    return spark.createDataFrame(
        [(u, c, "exp", f, {"k": rd}) for (u, c, f, rd) in rows],
        schema="url string, check_id string, expected string, found string, related_data map<string,string>",
    ).withColumn("partition_id", F.lit("p"))


def test_distinct_first_then_topup(spark):
    # 3 distinct found-values but 6 rows; with max=4 → the 3 distinct firsts
    # + 1 overflow, ordered by url
    rows = [
        ("u1", "A", "x", "r"), ("u2", "A", "x", "r"), ("u3", "A", "y", "r"),
        ("u4", "A", "y", "r"), ("u5", "A", "z", "r"), ("u6", "A", "z", "r"),
    ]
    got = distinct_first_samples(_violations(spark, rows), max_samples=4).collect()
    assert len(got) == 4
    by_rank = sorted(got, key=lambda r: r.sample_rank)
    firsts = [(r.url, r.found) for r in by_rank[:3]]
    assert firsts == [("u1", "x"), ("u3", "y"), ("u5", "z")]  # distinct firsts by url
    assert by_rank[3].url == "u2"  # overflow top-up, smallest url


def test_cap_per_check(spark):
    rows = [(f"u{i:02d}", "A", f"f{i}", "r") for i in range(25)]
    rows += [(f"v{i:02d}", "B", "same", "r") for i in range(25)]
    got = distinct_first_samples(_violations(spark, rows), max_samples=10).collect()
    a = [r for r in got if r.check_id == "A"]
    b = [r for r in got if r.check_id == "B"]
    assert len(a) == 10 and len(b) == 10
    # A has 25 distinct keys → all 10 samples are distinct firsts
    assert len({r.found for r in a}) == 10
    # B has 1 distinct key → 1 first + 9 top-ups, all found='same'
    assert {r.found for r in b} == {"same"}


def test_related_data_in_input_key(spark):
    # same found, different related_data → distinct input keys
    # (computeInputValuesKey includes sorted relatedData values —
    # RecordEvaluationResultDetails.java:78-89)
    rows = [("u1", "A", "x", "r1"), ("u2", "A", "x", "r2"), ("u3", "A", "x", "r1")]
    got = distinct_first_samples(_violations(spark, rows), max_samples=2).collect()
    by_rank = sorted(got, key=lambda r: r.sample_rank)
    assert [(r.url) for r in by_rank] == ["u1", "u2"]


def test_top_n_by_key(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(5)] + [("b", i) for i in range(2)],
        schema="k string, v int",
    )
    got = top_n_by_key(df, "k", "v", 3).groupBy("k").count().collect()
    assert {r.k: r["count"] for r in got} == {"a": 3, "b": 2}


def test_deterministic_sample_is_stable_and_key_derived(spark):
    """Membership is a pure function of the key: two independent
    computations agree row-for-row, the fraction lands near pct, and a
    superset table keeps exactly the same members (append-consistency —
    the property rand()-based sampling lacks)."""
    from gbif_data_validator_spark.operators.sampling import (
        deterministic_sample,
        deterministic_split,
    )

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s1 = {r.doc_id for r in deterministic_sample(df, "doc_id", 10).collect()}
    s2 = {r.doc_id for r in deterministic_sample(df, "doc_id", 10).collect()}
    assert s1 == s2
    assert 0.07 < len(s1) / 5000 < 0.13

    bigger = spark.range(0, 10000).withColumnRenamed("id", "doc_id")
    s3 = {r.doc_id for r in deterministic_sample(bigger, "doc_id", 10).collect()}
    assert {x for x in s3 if x < 5000} == s1  # appends never reshuffle membership

    split = deterministic_split(df, "doc_id", test_pct=10).collect()
    by = {}
    for r in split:
        by.setdefault(r.split, set()).add(r.doc_id)
    assert by["test"] == s1 and len(by["train"]) == 5000 - len(s1)


def test_stratified_sample_rates_and_determinism(spark):
    """Per-stratum keep rates are honored (hash-bucket < pct), strata
    absent from the rate map fall back to default_pct, and membership is
    a pure function of the key (re-run agrees row-for-row)."""
    from gbif_data_validator_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else "rare") for i in range(4000)],
        schema="doc_id long, src string",
    )
    got = stratified_sample(df, "doc_id", "src", {"hot": 10, "rare": 90})
    rows = got.collect()
    assert all(0 <= r.bucket < 100 for r in rows)
    by = {}
    for r in rows:
        by.setdefault(r.src, set()).add(r.doc_id)
    assert 0.05 < len(by["hot"]) / 2000 < 0.15
    assert 0.85 < len(by["rare"]) / 2000 < 0.95
    again = {(r.src, r.doc_id) for r in got.collect()}
    assert again == {(s, d) for s, ds in by.items() for d in ds}

    # unmapped stratum -> default_pct=0 drops everything
    df2 = spark.createDataFrame([(i, "other") for i in range(500)],
                                schema="doc_id long, src string")
    assert stratified_sample(df2, "doc_id", "src", {"hot": 10}).count() == 0


def test_stratum_rollup_aggregates(spark):
    from gbif_data_validator_spark.operators.metrics import stratum_rollup

    df = spark.createDataFrame(
        [
            ("a", "good text here", 14, "en"),
            ("a", None, None, "de"),
            ("b", "x", 1, "en"),
        ],
        schema="source string, text string, n_chars int, lang string",
    )
    got = {r.stratum: r for r in stratum_rollup(df, "source", "text", "n_chars").collect()}
    assert got["a"].n_docs == 2 and got["a"].n_null_text == 1
    assert got["a"].sum_size == 14 and got["a"].n_langs == 2
    assert got["a"].sum_ws_tokens == 3
    assert got["b"].n_docs == 1 and got["b"].sum_size == 1
    assert abs(got["a"].avg_size - 7.0) < 1e-9


def test_stratified_sample_plan_is_narrow(spark):
    """Rate map compiles into the plan as a literal — no join, no shuffle."""
    from gbif_data_validator_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(1, "a")], schema="doc_id long, src string"
    )
    plan = stratified_sample(
        df, "doc_id", "src", {"a": 10}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_weighted_sample(spark):
    from gbif_data_validator_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0 if i else 1e6) for i in range(200)] + [(900, None), (901, -1.0)],
        "doc_id long, w double",
    )
    out = weighted_sample(df, "doc_id", "w", 20).collect()
    ids = [r.doc_id for r in out]
    assert len(ids) == 20 == len(set(ids))  # without replacement
    assert 0 in ids  # the 10^6-weight row essentially always wins
    assert 900 not in ids and 901 not in ids  # null / non-positive excluded
    # deterministic: identical picks on a second evaluation
    assert [r.doc_id for r in weighted_sample(df, "doc_id", "w", 20).collect()] == ids
    # k >= n returns every eligible row
    assert weighted_sample(df, "doc_id", "w", 500).count() == 200
    # keys are valid (0, 1] powers, descending
    keys = [r.sample_key for r in out]
    assert keys == sorted(keys, reverse=True) and all(0 < x <= 1 for x in keys)


# --------------------------------------------------- neyman allocation


def test_neyman_allocation_budget_exact_and_variance_weighted(spark):
    import math
    import random

    from gbif_data_validator_spark.operators.sampling import neyman_allocation

    random.seed(13)
    rows = []
    # "wild": high variance; "calm": near-constant; "mid": moderate
    for i in range(200):
        rows.append(("wild", float(random.randint(0, 1000))))
    for i in range(400):
        rows.append(("calm", 50.0 + (i % 2) * 0.001))
    for i in range(300):
        rows.append(("mid", float(random.randint(40, 60))))
    df = spark.createDataFrame(rows, "stratum string, v double")
    out = {r.stratum: r for r in neyman_allocation(df, "stratum", "v", 100).collect()}
    assert sum(r.alloc_n for r in out.values()) == 100
    # Neyman: the wild stratum dominates despite being the smallest
    assert out["wild"].alloc_n > out["mid"].alloc_n > out["calm"].alloc_n
    assert out["calm"].alloc_n < 5
    # exact-arithmetic weight: sqrt(n*sum(v_micro^2) - sum(v_micro)^2)
    vs = [int(round(v * 1_000_000)) for s, v in rows if s == "wild"]
    want = math.sqrt(len(vs) * sum(x * x for x in vs) - sum(vs) ** 2)
    assert out["wild"].weight == want
    assert not any(r.over_allocated for r in out.values())


def test_neyman_zero_variance_falls_back_to_proportional(spark):
    from gbif_data_validator_spark.operators.sampling import neyman_allocation

    rows = [("a", 5.0)] * 30 + [("b", 7.0)] * 70
    df = spark.createDataFrame(rows, "stratum string, v double")
    out = {r.stratum: r for r in neyman_allocation(df, "stratum", "v", 10).collect()}
    assert out["a"].weight == 0.0 and out["b"].weight == 0.0
    assert (out["a"].alloc_n, out["b"].alloc_n) == (3, 7)


def test_neyman_largest_remainder_and_overalloc_flag(spark):
    from gbif_data_validator_spark.operators.sampling import neyman_allocation

    # stratum "a": 2 rows, ALL the variance; "b": 100 constant rows
    # (weight 0) — the whole 50-row budget lands on a (N_a*sigma_a is the
    # only nonzero weight), which must be flagged over_allocated
    rows = [("a", 0.0), ("a", 100.0)] + [("b", 42.0)] * 100
    df = spark.createDataFrame(rows, "stratum string, v double")
    out = {r.stratum: r for r in neyman_allocation(df, "stratum", "v", 50).collect()}
    assert sum(r.alloc_n for r in out.values()) == 50
    assert out["a"].alloc_n == 50 and out["a"].over_allocated
    assert out["b"].alloc_n == 0 and not out["b"].over_allocated


def test_neyman_partition_invariant(spark):
    from gbif_data_validator_spark.operators.sampling import neyman_allocation

    rows = [(f"s{i % 4}", float((i * 37) % 101)) for i in range(500)]
    df = spark.createDataFrame(rows, "stratum string, v double")
    a = sorted(map(tuple, neyman_allocation(df.repartition(1), "stratum", "v", 33).collect()))
    b = sorted(map(tuple, neyman_allocation(df.repartition(17), "stratum", "v", 33).collect()))
    assert a == b


def test_sampled_violation_estimate_matches_python_replay(spark):
    """pct=100 (whole corpus as the 'sample') with a trivial battery vs a
    pure-Python Wilson replay in the operator's exact float-op order;
    zero-violation checks still get a row with the informative bound."""
    import math

    from gbif_data_validator_spark.operators.sampling import (
        sampled_violation_estimate,
    )

    df = spark.createDataFrame(
        [(i, "" if i < 3 else "ok") for i in range(10)], "doc_id int, text string"
    )

    def battery(d):
        return d.where(F.col("text") == "").select(
            "doc_id", F.lit("TEXT_EMPTY").alias("check_id")
        )

    got = {
        r.check_id: r.asDict()
        for r in sampled_violation_estimate(
            df, battery, ["TEXT_EMPTY", "NEVER_FIRES"], pct=100
        ).collect()
    }

    def wilson(v, n, z=1.96):
        z2 = z * z
        nd, vd = float(n), float(v)
        phat = vd / nd
        denom = 1.0 + z2 / nd
        center = (phat + z2 / (2.0 * nd)) / denom
        half = (z * math.sqrt((phat * (1.0 - phat)) / nd + z2 / (4.0 * (nd * nd)))) / denom
        return (
            math.floor(1e6 * phat),
            math.floor(1e6 * max(0.0, center - half)),
            math.floor(1e6 * min(1.0, center + half)),
        )

    assert set(got) == {"TEXT_EMPTY", "NEVER_FIRES"}
    r = got["TEXT_EMPTY"]
    assert (r["sample_n"], r["violations"]) == (10, 3)
    assert (r["rate_micro"], r["wilson_lo_micro"], r["wilson_hi_micro"]) == wilson(3, 10)
    z = got["NEVER_FIRES"]
    assert (z["violations"], z["rate_micro"]) == (0, 0)
    # v=0 still bounds the rate away from "anything is possible"
    assert (z["rate_micro"], z["wilson_lo_micro"], z["wilson_hi_micro"]) == wilson(0, 10)
    assert 0 < z["wilson_hi_micro"] < 1_000_000


def test_sampled_violation_estimate_sample_follows_hash_bucket(spark):
    """The estimate's sample_n equals the deterministic_sample row count —
    membership follows the md5 bucket, never rand()."""
    from gbif_data_validator_spark.operators.sampling import (
        deterministic_sample,
        sampled_violation_estimate,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id int")
    expected_n = deterministic_sample(df, "doc_id", 10).count()

    def battery(d):
        return d.select("doc_id", F.lit("X").alias("check_id")).limit(0)

    r = sampled_violation_estimate(df, battery, ["X"], pct=10).first()
    assert r.sample_n == expected_n > 0


def test_sampled_violation_estimate_arg_validation(spark):
    import pytest

    from gbif_data_validator_spark.operators.sampling import (
        sampled_violation_estimate,
    )

    df = spark.createDataFrame([(1,)], "doc_id int")
    with pytest.raises(ValueError, match="no check_ids"):
        sampled_violation_estimate(df, lambda d: d, [])
    with pytest.raises(ValueError, match="pct outside"):
        sampled_violation_estimate(df, lambda d: d, ["X"], pct=0)
    with pytest.raises(ValueError, match="pct outside"):
        sampled_violation_estimate(df, lambda d: d, ["X"], pct=101)
