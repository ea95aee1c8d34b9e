"""BPE tokenizer training/encoding/census (operators/tokenizer.py).

Golden: the Sennrich et al. 2016 worked example — vocabulary
{low:5, lower:2, newest:6, widest:3} — whose first merges are pinned by
hand-computed pair counts, so the trainer's determinism and tie-breaking
are checked against the published algorithm, not against itself."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gbif_data_validator_spark.operators.tokenizer import (
    EOW,
    BPEModel,
    _learn_merges,
    bpe_encode_udf,
    bpe_train,
    token_census,
    token_census_summary,
    word_frequencies,
)

SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def _sennrich_docs(spark):
    # one doc per word instance so word_frequencies must do the counting
    rows = [(i, w) for i, (w, c) in enumerate(SENNRICH) for _ in range(c)]
    rows = [(j, w) for j, (_, w) in enumerate(rows)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_learn_merges_matches_sennrich_worked_example():
    merges, vocab = _learn_merges(SENNRICH, n_merges=5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]
    assert "est" + EOW in vocab and "low" in vocab


def test_word_frequencies_single_shuffle(spark):
    wf = word_frequencies(_sennrich_docs(spark))
    plan = wf._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # partial agg map-side, one shuffle
    got = {r.word: r.cnt for r in wf.collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_train_is_deterministic_and_reports_coverage(spark):
    docs = _sennrich_docs(spark)
    m1 = bpe_train(docs, n_merges=5)
    m2 = bpe_train(docs, n_merges=5)
    assert m1.merges == m2.merges == (
        ("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"), ("lo", "w"),
    )
    assert m1.coverage == 1.0
    assert m1.n_word_types_total == m1.n_word_types_used == 4


def test_bpe_train_cap_is_loud_not_silent(spark):
    m = bpe_train(_sennrich_docs(spark), n_merges=3, max_word_types=2)
    # top-2 types by count: newest(6), low(5) → 11 of 16 token mass
    assert m.n_word_types_used == 2 and m.n_word_types_total == 4
    assert m.coverage == pytest.approx(11 / 16)


def test_encode_applies_merges_by_rank(spark):
    model = bpe_train(_sennrich_docs(spark), n_merges=5)
    df = spark.createDataFrame(
        [(0, "lowest"), (1, "low lower newest"), (2, None)],
        "doc_id long, text string",
    )
    enc = bpe_encode_udf(model)
    got = {r.doc_id: r.toks for r in
           df.select("doc_id", enc(F.col("text")).alias("toks")).collect()}
    # "lowest" was NOT in training yet compresses via learned subwords
    assert got[0] == ["low", "est" + EOW]
    assert got[1][:2] == ["low" + EOW] if ("low", EOW) in model.merges else True
    assert got[2] is None
    # roundtrip: tokens concatenate back to the pre-tokenized words
    for did, toks in got.items():
        if toks is None:
            continue
        text = {0: "lowest", 1: "low lower newest"}[did]
        assert "".join(toks).replace(EOW, "") == text.replace(" ", "")


def test_encode_with_no_merges_is_char_fallback(spark):
    model = BPEModel(merges=(), n_word_types_total=0,
                     n_word_types_used=0, coverage=1.0)
    df = spark.createDataFrame([(0, "ab c?")], "doc_id long, text string")
    [r] = df.select(bpe_encode_udf(model)(F.col("text")).alias("t")).collect()
    # pre-tokens: "ab", "c", "?" → chars + EOW each
    assert r.t == ["a", "b", EOW, "c", EOW, "?", EOW]


def test_token_census_math_and_summary(spark):
    docs = _sennrich_docs(spark)
    model = bpe_train(docs, n_merges=5)
    census = token_census(docs, model)
    rows = census.collect()
    assert len(rows) == 16
    for r in rows:
        assert r.n_words == 1
        assert r.fertility == pytest.approx(r.n_tokens / r.n_words)
        assert r.chars_per_token == pytest.approx(
            round(r.n_chars / r.n_tokens, 6))
    # more merges → never more tokens
    loose = token_census(docs, bpe_train(docs, n_merges=1))
    total5 = census.agg(F.sum("n_tokens")).head()[0]
    total1 = loose.agg(F.sum("n_tokens")).head()[0]
    assert total5 <= total1
    [s] = token_census_summary(census).collect()
    assert s.n_docs == 16 and s.total_tokens == total5
    assert s.total_words == 16


def test_census_is_narrow_zero_shuffle(spark):
    docs = _sennrich_docs(spark)
    model = bpe_train(docs, n_merges=2)
    plan = (token_census(docs, model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
