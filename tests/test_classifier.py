"""Naive Bayes quality classifier (operators/classifier.py): separability
on a planted two-dialect corpus, OOV handling, prior behavior, and
broadcast/shuffle-join result equality. The bit-exact score check lives in
the nb_quality driver oracle."""

import math

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.classifier import nb_score, nb_train


def _corpus(spark):
    rows = [
        (1, "good clean prose with varied words", True),
        (2, "more good prose here clean and varied", True),
        (3, "clean words good text varied prose", True),
        (4, "spam spam buy now spam click spam", False),
        (5, "click buy spam now now buy click", False),
        (6, "buy click spam buy spam now click", False),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label boolean")


def test_separates_planted_dialects(spark):
    docs = _corpus(spark)
    model = nb_train(docs, "label")
    scored = {r.doc_id: r for r in nb_score(docs, model).collect()}
    for i in (1, 2, 3):
        assert scored[i].pred is True and scored[i].log_odds > 0, i
    for i in (4, 5, 6):
        assert scored[i].pred is False and scored[i].log_odds < 0, i


def test_oov_and_prior(spark):
    docs = _corpus(spark)
    model = nb_train(docs, "label")
    # an all-OOV doc scores prior + n_tokens*oov_delta exactly
    unseen = spark.createDataFrame(
        [(9, "zzz yyy xxx")], "doc_id long, text string"
    )
    (row,) = nb_score(unseen, model).collect()
    want = model.prior_dlogp + 3 * model.oov_dlogp
    assert row.n_tokens == 3 and row.log_odds == pytest.approx(want, abs=1e-12)
    # balanced classes → zero log-prior
    assert model.prior_dlogp == pytest.approx(math.log(3.5) - math.log(3.5))
    # token-less docs are dropped, not scored
    empty = spark.createDataFrame([(10, "   "), (11, None)], "doc_id long, text string")
    assert nb_score(empty, model).count() == 0


def test_broadcast_and_shuffle_paths_agree(spark):
    docs = _corpus(spark)
    model = nb_train(docs, "label")
    a = {r.doc_id: r for r in nb_score(docs, model, broadcast_model=True).collect()}
    b = {r.doc_id: r for r in nb_score(docs, model, broadcast_model=False).collect()}
    assert set(a) == set(b)
    for i in a:  # join strategy changes float summation order → ulp noise
        assert a[i].n_tokens == b[i].n_tokens and a[i].pred == b[i].pred
        assert a[i].log_odds == pytest.approx(b[i].log_odds, abs=1e-9)


def test_calibration_curve_bins_and_exact_means(spark):
    from gbif_data_validator_spark.operators.classifier import (
        calibration_curve,
    )

    rows = [
        (0.05, 0), (0.05, 0), (0.05, 0), (0.05, 1),   # bin 0: mean .05, 25% pos
        (0.95, 1), (0.95, 1), (0.95, 1), (0.95, 0),   # bin 9: mean .95, 75% pos
        (0.55, 1), (0.55, 0),                          # bin 5
    ]
    df = spark.createDataFrame(rows, "p double, y int")
    got = {r.bin: (r.n, r.mean_pred, r.frac_pos)
           for r in calibration_curve(df, "p", "y", logit=False).collect()}
    assert got == {0: (4, 0.05, 0.25), 5: (2, 0.55, 0.5), 9: (4, 0.95, 0.75)}


def test_calibration_curve_logit_and_clamps(spark):
    from gbif_data_validator_spark.operators.classifier import (
        calibration_curve,
    )

    df = spark.createDataFrame(
        [(0.0, 1), (-50.0, 0), (50.0, 1)], "s double, y int"
    )
    got = {r.bin: r.mean_pred
           for r in calibration_curve(df, "s", "y", logit=True).collect()}
    # sigmoid(0)=0.5 -> bin 5; extremes clamp into bins 0 and 9
    assert set(got) == {0, 5, 9} and got[5] == 0.5
    assert got[0] == 0.0 and got[9] == 1.0


def test_calibration_error_hand_computed(spark):
    from gbif_data_validator_spark.operators.classifier import (
        calibration_curve,
        calibration_error,
    )

    rows = [(0.05, 0)] * 4 + [(0.95, 1)] * 3 + [(0.95, 0)]
    df = spark.createDataFrame(rows, "p double, y int")
    curve = calibration_curve(df, "p", "y", logit=False)
    got = calibration_error(curve).collect()[0]
    # bin0: 4/8 * |0.05 - 0| ; bin9: 4/8 * |0.95 - 0.75|
    assert (got.n, got.n_bins) == (8, 2)
    assert got.ece == round(0.5 * 0.05 + 0.5 * 0.2, 6)


def test_agreement_kappa_hand_computed(spark):
    from gbif_data_validator_spark.operators.classifier import agreement_kappa

    # classic 2x2: a/b agree on 7 of 10; row marginals a: 6 yes 4 no,
    # col marginals b: 5 yes 5 no -> pe = (6*5 + 4*5)/100 = 0.5,
    # kappa = (0.7 - 0.5)/0.5 = 0.4
    rows = (
        [("y", "y")] * 4 + [("y", "n")] * 2 + [("n", "n")] * 3 + [("n", "y")]
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = agreement_kappa(df, "a", "b").first()
    assert (r.n, r.n_agree) == (10, 7)
    assert r.po == 0.7 and r.pe == 0.5 and r.kappa == 0.4


def test_agreement_kappa_degenerate_and_nulls(spark):
    from gbif_data_validator_spark.operators.classifier import agreement_kappa

    # both constant & equal -> pe = 1 -> kappa NULL; NULL rows excluded
    df = spark.createDataFrame(
        [("y", "y"), ("y", "y"), (None, "y"), ("y", None)],
        "a string, b string",
    )
    r = agreement_kappa(df, "a", "b").first()
    assert r.n == 2 and r.kappa is None and r.po == 1.0
    # zero overlap in labels -> n_agree 0, kappa negative
    df2 = spark.createDataFrame(
        [("y", "n"), ("n", "y")], "a string, b string"
    )
    r2 = agreement_kappa(df2, "a", "b").first()
    assert r2.n_agree == 0 and r2.kappa < 0


# --- cluster_pair_agreement -------------------------------------------------


def test_pair_agreement_hand_computed(spark):
    from gbif_data_validator_spark.operators.classifier import (
        cluster_pair_agreement,
    )

    # A: {1,2},{3},{4}; B: {1,2,3},{4}
    df = spark.createDataFrame(
        [("x", "p"), ("x", "p"), ("y", "p"), ("z", "q")], "a string, b string"
    )
    r = cluster_pair_agreement(df, "a", "b").first()
    assert (r.n_items, r.n_cells, r.n_clusters_a, r.n_clusters_b) == (4, 3, 3, 2)
    assert (r.pairs_a, r.pairs_b, r.pairs_both) == (1, 3, 1)
    assert r.precision_micro == 333333  # 1/3, floor
    assert r.recall_micro == 1_000_000
    assert r.dice_micro == 500_000  # 2·1/(1+3)
    assert r.rand_micro == 666_666  # (6−1−3+2)/6, floor


def test_pair_agreement_identical_and_singletons(spark):
    from gbif_data_validator_spark.operators.classifier import (
        cluster_pair_agreement,
    )

    same = spark.createDataFrame(
        [("x", "x"), ("x", "x"), ("y", "y")], "a string, b string"
    )
    r = cluster_pair_agreement(same, "a", "b").first()
    assert r.precision_micro == r.recall_micro == r.dice_micro == 1_000_000
    assert r.rand_micro == 1_000_000

    # all singletons under both → no pairs anywhere → ratio NULLs, rand=1
    single = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("3", "c")], "a string, b string"
    )
    r2 = cluster_pair_agreement(single, "a", "b").first()
    assert (r2.pairs_a, r2.pairs_b, r2.pairs_both) == (0, 0, 0)
    assert r2.precision_micro is None and r2.dice_micro is None
    assert r2.rand_micro == 1_000_000  # everything correctly apart


def test_pair_agreement_null_labels_excluded(spark):
    from gbif_data_validator_spark.operators.classifier import (
        cluster_pair_agreement,
    )

    df = spark.createDataFrame(
        [("x", "p"), ("x", "p"), (None, "p"), ("x", None)],
        "a string, b string",
    )
    r = cluster_pair_agreement(df, "a", "b").first()
    assert r.n_items == 2 and r.pairs_both == 1


def test_pair_agreement_plan_no_join_one_corpus_exchange(spark):
    """Linear pipeline contract: no Join node anywhere; exactly one
    Exchange BELOW the first window (the corpus→cell groupBy) — the two
    window repartitions operate on the cell table only."""
    from gbif_data_validator_spark.operators.classifier import (
        cluster_pair_agreement,
    )

    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("a"),
        (F.col("id") % 11).cast("string").alias("b"),
    )
    plan = (
        cluster_pair_agreement(df, "a", "b")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") <= 3


def test_pair_agreement_matches_bruteforce_on_random_clusterings(spark):
    """Seeded-random clusterings vs an O(n²) pure-Python pair enumeration
    — the whole statistic, not just the hand-computed case."""
    import itertools
    import random

    from gbif_data_validator_spark.operators.classifier import (
        cluster_pair_agreement,
    )

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = rng.randint(2, 60)
        rows = [
            (str(rng.randint(0, 8)), str(rng.randint(0, 5))) for _ in range(n)
        ]
        got = cluster_pair_agreement(
            spark.createDataFrame(rows, "a string, b string"), "a", "b"
        ).first()

        pa = pb = pboth = 0
        for (a1, b1), (a2, b2) in itertools.combinations(rows, 2):
            sa, sb = a1 == a2, b1 == b2
            pa += sa
            pb += sb
            pboth += sa and sb
        tot = n * (n - 1) // 2
        assert (got.n_items, got.pairs_a, got.pairs_b, got.pairs_both) == (
            n,
            pa,
            pb,
            pboth,
        ), seed
        assert got.precision_micro == (
            1_000_000 * pboth // pb if pb else None
        ), seed
        assert got.recall_micro == (
            1_000_000 * pboth // pa if pa else None
        ), seed
        assert got.rand_micro == 1_000_000 * (tot - pa - pb + 2 * pboth) // tot
