"""Text-analysis functions: token counts, quality, lang-id, fingerprints."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.functions import textstats as ts


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], schema="text string")
    return df.select(col.alias("v")).collect()[0].v


def test_ws_token_count(spark):
    assert _one(spark, "a b  c", ts.ws_token_count(F.col("text"))) == 3
    assert _one(spark, "   ", ts.ws_token_count(F.col("text"))) == 0
    assert _one(spark, "", ts.ws_token_count(F.col("text"))) == 0
    assert _one(spark, None, ts.ws_token_count(F.col("text"))) == 0


def test_bpe_token_count(spark):
    # "don't stop!" -> don | ' | t | stop | !
    assert _one(spark, "don't stop!", ts.bpe_token_count(F.col("text"))) == 5
    assert _one(spark, "", ts.bpe_token_count(F.col("text"))) == 0


def test_ratios(spark):
    assert _one(spark, "a, b.", ts.punct_ratio(F.col("text"))) == 2 / 5
    assert _one(spark, "the cat and dog", ts.stopword_ratio(F.col("text"))) == 0.5
    assert _one(spark, "", ts.stopword_ratio(F.col("text"))) == 0.0


def test_quality_score_orders_sensibly(spark):
    good = "the quick brown fox jumps over the lazy dog and runs to the hills " * 8
    bad = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    q_good = _one(spark, good, ts.quality_score(F.col("text")))
    q_bad = _one(spark, bad, ts.quality_score(F.col("text")))
    assert 0.0 <= q_bad < q_good <= 1.0


def test_lang_id(spark):
    assert _one(spark, "the cat is in the house and it is big", ts.lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund ist nicht in das haus und die katze", ts.lang_id(F.col("text"))) == "de"
    assert _one(spark, "le chat est dans la maison pour les amis", ts.lang_id(F.col("text"))) == "fr"
    assert _one(spark, "zzz qqq www", ts.lang_id(F.col("text"))) == "und"


def test_content_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("different",)], schema="text string"
    )
    fps = [r.fp for r in df.select(ts.content_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_winnow_fingerprint_stable_and_overlap(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " extra trailing words appended here"
    far = "completely unrelated content about spark shuffle partitions and joins"
    df = spark.createDataFrame([(1, base), (2, near), (3, far)], schema="id long, text string")
    rows = {
        r.id: set(r.fp)
        for r in df.select("id", ts.winnow_fingerprint_udf(F.col("text")).alias("fp")).collect()
    }
    # deterministic across invocations
    rows2 = {
        r.id: set(r.fp)
        for r in df.select("id", ts.winnow_fingerprint_udf(F.col("text")).alias("fp")).collect()
    }
    assert rows == rows2
    # near-dup shares fingerprints; unrelated shares none
    assert rows[1] & rows[2]
    assert not rows[1] & rows[3]


def test_on_real_documents_table(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = docs.select(
        "doc_id",
        ts.ws_token_count(F.col("text")).alias("n_tok"),
        ts.quality_score(F.col("text")).alias("q"),
        ts.lang_id(F.col("text")).alias("lang_pred"),
    )
    rows = out.collect()
    assert all(r.n_tok > 0 for r in rows)
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_nonblank_lines_drops_blanks(spark):
    df = spark.createDataFrame([(1, "x\n\n y \nz"), (2, None)], "id long, text string")
    rows = {r.id: r.l for r in df.select("id", ts.nonblank_lines(F.col("text")).alias("l")).collect()}
    assert rows[1] == ["x", " y ", "z"]
    assert rows[2] == []


def test_dup_line_stats_known_values(spark):
    df = spark.createDataFrame(
        [(1, ["a b", "c d", "a b", "e f"]), (2, ["u", "v"]), (3, [])],
        "id long, lines array<string>",
    )
    stats = ts.dup_line_stats(F.col("lines"))
    rows = {
        r.id: r
        for r in df.select(
            "id",
            stats["n_lines"].alias("n"),
            stats["dup_line_frac"].alias("f"),
            stats["dup_line_char_frac"].alias("cf"),
        ).collect()
    }
    # "a b" occurs twice: 2/4 lines, 6/12 chars
    assert rows[1].n == 4 and rows[1].f == 0.5 and rows[1].cf == 0.5
    assert rows[2].f == 0.0 and rows[2].cf == 0.0
    assert rows[3].n == 0 and rows[3].f == 0.0 and rows[3].cf == 0.0


def test_top_ngram_stats_tiebreak(spark):
    from gbif_data_validator_spark.operators.metrics import top_ngram_stats

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "solo"), (3, None)], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in top_ngram_stats(df, "doc_id", "text", n=2).collect()}
    # "a b" and "b a" both occur twice; lexicographic tiebreak picks "a b"
    assert rows[1].top_gram == "a b" and rows[1].n_occurrences == 2
    assert abs(rows[1].char_frac - 2 * 3 / 9) < 1e-6  # round(.,6) applied
    assert 2 not in rows and 3 not in rows  # no 2-gram / null text absent


def test_type_token_ratio(spark):
    from gbif_data_validator_spark.functions.textstats import type_token_ratio

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "x y z"), (3, "A a"), (4, "   "), (5, None)],
        schema="id long, text string",
    )
    got = {r.id: r.ttr for r in df.select("id", type_token_ratio(F.col("text")).alias("ttr")).collect()}
    assert got[1] == 0.5
    assert got[2] == 1.0
    assert got[3] == 0.5  # lowercased: {a} / 2 tokens
    assert got[4] is None and got[5] is None


def test_token_entropy(spark):
    import math

    from gbif_data_validator_spark.functions.textstats import token_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b"), (4, ""), (5, None)],
        schema="id long, text string",
    )
    got = {r.id: r.h for r in df.select("id", token_entropy(F.col("text")).alias("h")).collect()}
    assert got[1] == 0.0
    assert abs(got[2] - math.log(4)) < 1e-6
    assert abs(got[3] - math.log(2)) < 1e-6
    assert got[4] is None and got[5] is None


def test_script_counts(spark):
    t = "abc привет 中文 γεια"
    counts = {
        k: _one(spark, t, v)
        for k, v in ts.script_counts(F.col("text")).items()
    }
    assert counts["latin"] == 3
    assert counts["cyrillic"] == 6
    assert counts["cjk"] == 2
    assert counts["greek"] == 4
    assert counts["arabic"] == counts["hebrew"] == counts["hangul"] == 0
    assert counts["kana"] == counts["devanagari"] == 0
    # null-safe: every count is 0 on null text
    assert all(
        _one(spark, None, v) == 0
        for v in ts.script_counts(F.col("text")).values()
    )


def test_dominant_script(spark):
    assert _one(spark, "hello world", ts.dominant_script(F.col("text"))) == "latin"
    assert _one(spark, "привет мир!", ts.dominant_script(F.col("text"))) == "cyrillic"
    assert _one(spark, "中文网页测试", ts.dominant_script(F.col("text"))) == "cjk"
    assert _one(spark, "مرحبا", ts.dominant_script(F.col("text"))) == "arabic"
    assert _one(spark, "안녕하세요", ts.dominant_script(F.col("text"))) == "hangul"
    assert _one(spark, "ひらがなカタカナ", ts.dominant_script(F.col("text"))) == "kana"
    # digits/punct only -> und; ties break to the lexicographically
    # greatest script name (same contract as lang_id)
    assert _one(spark, "123 !!!", ts.dominant_script(F.col("text"))) == "und"
    assert _one(spark, None, ts.dominant_script(F.col("text"))) == "und"
    assert _one(spark, "ab ва", ts.dominant_script(F.col("text"))) == "latin"


# ------------------------------------------------- compression ratio gate


def test_compression_ratio_separates_repetition_from_prose(spark):
    from gbif_data_validator_spark.functions.textstats import (
        compression_ratio_micro,
    )

    rows = [
        (1, "spam " * 2000),                           # highly repetitive
        (2, " ".join(f"organic word{i} flows here with varied phrasing {i*7}"
                      for i in range(200))),            # prose-ish
        (3, "".join(f"{i*2654435761 % 2**32:08x}" for i in range(2000))),  # high entropy
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.ratio
        for r in df.select(
            "doc_id", compression_ratio_micro(F.col("text")).alias("ratio")
        ).collect()
    }
    assert out[1] < 20_000            # boilerplate: < 2%
    assert 20_000 < out[2] < 400_000  # prose band
    assert out[3] > 400_000           # entropy soup
    assert out[4] is None and out[5] is None
    # band ordering is the gate's whole contract
    assert out[1] < out[2] < out[3]


def test_compression_ratio_exact_and_partition_invariant(spark):
    import zlib

    from gbif_data_validator_spark.functions.textstats import (
        compression_ratio_micro,
    )

    texts = [(i, f"document body {i} " * (10 + i % 17)) for i in range(100)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    expect = {
        i: (1_000_000 * len(zlib.compress(t.encode(), 6))) // len(t.encode())
        for i, t in texts
    }
    for parts in (1, 7):
        got = {
            r.doc_id: r.ratio
            for r in df.repartition(parts)
            .select("doc_id", compression_ratio_micro(F.col("text")).alias("ratio"))
            .collect()
        }
        assert got == expect


def test_readability_hand_computed(spark):
    """w=9, s=3, syl=9 for the planted sentence; the micro scores equal a
    pure-Python replay with the operator's exact float-op order."""
    import math

    text = "The quick brown fox jumps. It runs fast! Why?"
    df = spark.createDataFrame([(text,)], "text string")
    ex = ts.readability_exprs(F.col("text"))
    r = df.select(*[v.alias(k) for k, v in ex.items()]).collect()[0]
    assert (r.n_words, r.n_sentences, r.n_syllables) == (9, 3, 9)
    w, s, syl = 9.0, 3.0, 9.0
    fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
    fkgl = 0.39 * (w / s) + 11.8 * (syl / w) - 15.59
    assert r.fre_micro == math.floor(1e6 * fre)
    assert r.fkgl_micro == math.floor(1e6 * fkgl)


def test_readability_edge_branches(spark):
    """Sentence floor (no terminal punctuation → 1), vowel-free tokens
    (one syllable each), NULL text → NULLs, wordless text → NULL scores."""
    ex = ts.readability_exprs(F.col("text"))
    rows = spark.createDataFrame(
        [("word salad no punctuation",), ("pfft tsk",), (None,), ("",)],
        "text string",
    ).select(*[v.alias(k) for k, v in ex.items()]).collect()
    salad, novowel, null, empty = rows
    assert salad.n_sentences == 1 and salad.n_words == 4
    # 'pfft' and 'tsk' have no [aeiouy] group → 1 syllable each
    assert (novowel.n_words, novowel.n_syllables) == (2, 2)
    assert all(v is None for v in null.asDict().values())
    assert empty.n_words == 0 and empty.fre_micro is None and empty.fkgl_micro is None
