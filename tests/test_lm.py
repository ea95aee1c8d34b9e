"""CCNet-style unigram-LM perplexity and DSIR importance weights:
hand-computable goldens, OOV behavior, degenerate docs, and plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.lm import (
    dsir_log_weights,
    lm_perplexity,
    train_unigram_lm,
)


def test_train_unigram_lm_golden(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    lm, oov_logp, denom = train_unigram_lm(docs, k=0.5)
    # counts: a=3, b=1, c=1; total=5, V=3 → denom = 5 + 0.5*4 = 7
    assert denom == 7.0
    got = {r.token: r.logp for r in lm.collect()}
    assert math.isclose(got["a"], math.log(3.5 / 7))
    assert math.isclose(got["b"], math.log(1.5 / 7))
    assert math.isclose(oov_logp, math.log(0.5 / 7))


def test_lm_perplexity_golden_and_oov(spark):
    train = spark.createDataFrame([(1, "a a b"), (2, "a c")], "doc_id long, text string")
    lm, oov, _ = train_unigram_lm(train, k=0.5)
    docs = spark.createDataFrame(
        [(10, "a b"), (11, "zzz"), (12, ""), (13, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_perplexity(docs, lm, oov).collect()}
    lp = math.log(3.5 / 7) + math.log(1.5 / 7)
    assert math.isclose(out[10].log_prob, round(lp, 6))
    assert math.isclose(out[10].ppl, round(math.exp(-lp / 2), 6))
    # pure-OOV doc scores at the smoothing floor, not a crash / null
    assert math.isclose(out[11].log_prob, round(math.log(0.5 / 7), 6))
    # token-less docs have no defined perplexity → dropped
    assert 12 not in out and 13 not in out


def test_lm_perplexity_ranks_fluent_below_gibberish(spark):
    fluent = "the cat sat on the mat and the dog sat on the rug"
    train = spark.createDataFrame([(i, fluent) for i in range(20)], "doc_id long, text string")
    lm, oov, _ = train_unigram_lm(train)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "qz vx jkl pq wmmm zzz")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.ppl for r in lm_perplexity(docs, lm, oov).collect()}
    assert out[1] < out[2]


def test_dsir_weights_prefer_target_like_docs(spark):
    target = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"), (2, "totally unrelated gibberish words here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.log_weight for r in dsir_log_weights(docs, target).collect()}
    assert out[1] > out[2]
    # doc 1 shares 4 of its 5 bigrams with the target
    assert out[1] > 0


def test_dsir_short_docs_dropped(spark):
    target = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a"), (3, ""), (4, None)], "doc_id long, text string"
    )
    out = {r.doc_id for r in dsir_log_weights(docs, target).collect()}
    assert out == {1}  # <2 tokens → no bigram features


def test_lm_scoring_plan_shape(spark):
    """Scoring = one broadcast join + one agg; no shuffle joins."""
    train = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    lm, oov, _ = train_unigram_lm(train)
    plan = (
        lm_perplexity(spark.createDataFrame([(1, "a")], "doc_id long, text string"), lm, oov)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan
