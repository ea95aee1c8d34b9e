"""Metrics pass: TermsFrequencyCollector semantics port
(collector/TermsFrequencyCollectorTest.java:18-39 — blank / whitespace /
null handling) + the one-scan column profile."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.metrics import (
    column_profile,
    interpreted_counts,
    issue_counts,
    term_frequency,
)


def test_term_frequency_blank_semantics(spark):
    # port of TermsFrequencyCollectorTest: blank and whitespace-only cells
    # do NOT count; zero-initialized columns report 0
    df = spark.createDataFrame(
        [("a", " ", None), ("b", "", "x"), (None, "\t", "y")],
        schema="c1 string, c2 string, c3 string",
    )
    row = term_frequency(df).collect()[0]
    assert (row.c1, row.c2, row.c3) == (2, 0, 2)


def test_column_profile_single_scan_counts(spark, pages):
    row = column_profile(pages, columns=["url", "lang"], length_cols=["text"]).collect()[0]
    n = pages.count()
    assert row.n_rows == n
    # nulls + non_blank partition the column (urls are never whitespace-only)
    null_urls = pages.where(F.col("url").isNull()).count()
    blank_urls = pages.where(F.col("url") == "").count()
    assert row.url_nulls == null_urls
    assert row.url_non_blank == n - null_urls - blank_urls
    # HLL distinct within rsd of exact
    exact = pages.select("lang").distinct().count()
    assert abs(row.lang_approx_distinct - exact) <= max(2, 0.1 * exact)
    # length quantiles are monotone
    qs = row.text_len_quantiles
    assert qs == sorted(qs)


def test_interpreted_counts(spark):
    df = spark.createDataFrame(
        [("2020-01-01",), ("not a date",), (None,)], schema="raw string"
    )
    # ANSI mode (Spark 4 default): try_to_timestamp yields NULL on parse
    # failure — the "parse failure is itself a finding" semantics
    row = interpreted_counts(df, {"ts_parsed": F.try_to_timestamp("raw")}).collect()[0]
    assert row.ts_parsed == 1


def test_issue_counts(spark):
    v = spark.createDataFrame(
        [("u1", "A"), ("u2", "A"), ("u3", "B")], schema="url string, check_id string"
    )
    got = {r.check_id: r.n for r in issue_counts(v).collect()}
    assert got == {"A": 2, "B": 1}


def test_length_histogram(spark):
    from gbif_data_validator_spark.operators.metrics import length_histogram

    df = spark.createDataFrame(
        [(3,), (49,), (50,), (120,), (121,), (None,)], schema="n int"
    )
    got = {r.bucket: (r.n, r.lo, r.hi) for r in length_histogram(df, "n", 50).collect()}
    # NULLs excluded; buckets are floor(n/50) with exact per-bucket min/max
    assert got == {0: (2, 3, 49), 1: (1, 50, 50), 2: (2, 120, 121)}


def test_frequent_values(spark):
    from gbif_data_validator_spark.operators.metrics import frequent_values

    df = spark.createDataFrame(
        [("b",), ("a",), ("b",), ("c",), ("a",), ("b",), (None,)], schema="v string"
    )
    got = [(r.value, r.n, r.rank) for r in frequent_values(df, "v", 2).orderBy("rank").collect()]
    assert got == [("b", 3, 1), ("a", 2, 2)]  # NULL excluded, ties by value


def test_tfidf_top_terms_ranks_rare_terms(spark):
    from gbif_data_validator_spark.operators.metrics import tfidf_top_terms

    df = spark.createDataFrame(
        [
            (1, "the the the zebra"),
            (2, "the cow"),
            (3, "the cow cow"),
            (4, None),
        ],
        schema="doc_id long, text string",
    )
    got = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    by = {}
    for r in got:
        by.setdefault(r.doc_id, []).append((r.rk, r.term, r.tf, r.df))
    # doc 1: zebra (df=1) beats 'the' (df=3, idf=0)
    assert by[1][0][1] == "zebra" and by[1][0][3] == 1
    # 'the' appears in every text doc -> idf = ln(3/3) = 0 -> tfidf 0
    the = [r for r in got if r.term == "the"]
    assert all(r.tfidf == 0.0 for r in the)
    # doc 3: cow tf=2 ranks first
    assert by[3][0][1] == "cow" and by[3][0][2] == 2
    assert 4 not in by  # null text drops out
    assert all(len(v) <= 2 for v in by.values())


def test_exact_heavy_hitters_matches_plain_groupby(spark):
    from gbif_data_validator_spark.operators.metrics import exact_heavy_hitters

    # skewed profile: 2 heavy values, long uniform tail, NULLs ignored
    rows = [("hot",)] * 20 + [("warm",)] * 5 + [(f"t{i}",) for i in range(200)]
    rows += [(None,)] * 3
    df = spark.createDataFrame(rows, schema="v string").repartition(8)
    expect = {
        (r.v, r["count"])
        for r in df.where(F.col("v").isNotNull())
        .groupBy("v")
        .count()
        .where(F.col("count") >= 5)
        .collect()
    }
    got = {
        (r.value, r.n)
        for r in exact_heavy_hitters(df, "v", min_count=5).collect()
    }
    assert got == expect == {("hot", 20), ("warm", 5)}


def test_exact_heavy_hitters_exact_under_any_bucket_count(spark):
    from gbif_data_validator_spark.operators.metrics import exact_heavy_hitters

    # exactness theorem: result is invariant to n_buckets (collisions only
    # add pass-2 work, never change a final exact count) — including the
    # degenerate 1-bucket case where nothing is pruned
    rows = [(f"v{i % 7}",) for i in range(70)] + [(f"u{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, schema="v string")
    ref = {
        (r.value, r.n)
        for r in exact_heavy_hitters(df, "v", min_count=10, n_buckets=4096).collect()
    }
    assert ref == {(f"v{i}", 10) for i in range(7)}
    for nb in (1, 2, 16):
        got = {
            (r.value, r.n)
            for r in exact_heavy_hitters(df, "v", min_count=10, n_buckets=nb).collect()
        }
        assert got == ref


def test_exact_heavy_hitters_broadcasts_hot_buckets(spark):
    from gbif_data_validator_spark.operators.metrics import exact_heavy_hitters

    df = spark.createDataFrame([("a",)] * 3 + [("b",)], schema="v string")
    plan = exact_heavy_hitters(df, "v", min_count=2)._jdf.queryExecution().executedPlan().toString()
    # pass 2 must reach the rows via a broadcast hash join on the bounded
    # hot-bucket list — never a shuffle of the full value stream for the join
    assert "BroadcastHashJoin" in plan


def test_exact_heavy_hitters_grouped_isolation(spark):
    from gbif_data_validator_spark.operators.metrics import exact_heavy_hitters

    # "hot" clears the bar only inside group a — per-group counts never
    # pool across groups
    rows = [("a", "hot")] * 6 + [("b", "hot")] * 2 + [("b", "warm")] * 5
    df = spark.createDataFrame(rows, "g string, v string")
    got = {
        (r.g, r.value, r.n)
        for r in exact_heavy_hitters(
            df, "v", min_count=5, group_cols=["g"]
        ).collect()
    }
    assert got == {("a", "hot", 6), ("b", "warm", 5)}


def test_group_majority_mismatch_census_and_tiebreak(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.metrics import (
        group_majority_mismatch,
    )

    df = spark.createDataFrame(
        [
            # h1: en x3 majority, de x1, fr x1
            ("h1", "en"), ("h1", "en"), ("h1", "en"), ("h1", "de"), ("h1", "fr"),
            # h2: tie 2-2 -> 'de' wins by min-string tie-break
            ("h2", "de"), ("h2", "de"), ("h2", "en"), ("h2", "en"),
            # h3: unanimous -> no rows
            ("h3", "en"), ("h3", "en"),
            # h4: below min_group -> skipped
            ("h4", "de"),
            # nulls excluded
            ("h1", None),
        ],
        "host string, lang string",
    )
    got = {
        (r.group, r.value): (r.n, r.majority_value, r.n_majority, r.n_group)
        for r in group_majority_mismatch(df, "host", "lang", min_group=2).collect()
    }
    assert got == {
        ("h1", "de"): (1, "en", 3, 5),
        ("h1", "fr"): (1, "en", 3, 5),
        ("h2", "en"): (2, "de", 2, 4),
    }


def test_group_majority_mismatch_partitioning_invariant(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.metrics import (
        group_majority_mismatch,
    )

    df = spark.range(0, 3000).select(
        (F.col("id") % 37).cast("string").alias("g"),
        (F.col("id") % 5).cast("string").alias("v"),
    )
    a = sorted(group_majority_mismatch(df, "g", "v").collect())
    b = sorted(group_majority_mismatch(df.repartition(13), "g", "v").collect())
    assert a == b


def test_zipf_fit_exact_two_point_line(spark):
    from gbif_data_validator_spark.operators.metrics import zipf_fit

    # "a" x4, "b" x2: slope = (ln2 - ln4)/(ln2 - ln1) = -1, perfect fit
    df = spark.createDataFrame([("a a a a b b",)], "text string")
    row = zipf_fit(df, "text").collect()[0]
    assert (row.n_terms, row.k) == (2, 2)
    assert row.slope == -1.0 and row.r2 == 1.0


def test_zipf_fit_degenerate_and_invariance(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.metrics import zipf_fit

    one = zipf_fit(spark.createDataFrame([("hello hello",)], "text string"))
    r = one.collect()[0]
    assert r.k == 1 and r.slope is None and r.r2 is None

    df = spark.range(0, 500).select(
        F.concat(F.lit("w"), (F.col("id") % 37).cast("string"),
                 F.lit(" common common"), (F.col("id") % 7).cast("string")
                 ).alias("text")
    )
    a = zipf_fit(df, "text", top_k=30).collect()
    b = zipf_fit(df.repartition(9), "text", top_k=30).collect()
    assert a == b and a[0].slope < 0


# -- ARI readability census ---------------------------------------------------


def test_readability_hand_computed(spark):
    from gbif_data_validator_spark.operators.metrics import readability_census
    import math

    # "The cat sat." → chars=9, words=3, sentences=1
    df = spark.createDataFrame([(1, "The cat sat.")], "doc_id long, text string")
    r = readability_census(df, "text").collect()[0]
    expected = math.floor(1e6 * (4.71 * (9 / 3) + 0.5 * (3 / 1) - 21.43))
    assert (r.n_docs, r.n_skipped) == (1, 0)
    assert r.sum_ari_ppm == r.min_ari_ppm == r.max_ari_ppm == expected
    assert r.avg_ari_ppm == expected


def test_readability_skips_and_groups(spark):
    from gbif_data_validator_spark.operators.metrics import readability_census

    df = spark.createDataFrame(
        [
            (1, "One full sentence here.", "en"),
            (2, "no terminal punctuation", "en"),   # 0 sentences -> skipped
            (3, "...", "en"),                       # 0 words?? "..." is a \S+ run -> 1 word, 3 sents
            (4, None, "fr"),                        # null -> skipped
            (5, "Deux. Mots.", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r for r in readability_census(df, "text", ["lang"]).collect()}
    assert (out["en"].n_docs, out["en"].n_skipped) == (2, 1)
    assert (out["fr"].n_docs, out["fr"].n_skipped) == (1, 1)
    import math

    # group with docs: avg = floor(sum/n)
    assert out["en"].avg_ari_ppm == math.floor(out["en"].sum_ari_ppm / 2)
    assert out["fr"].avg_ari_ppm == out["fr"].sum_ari_ppm


def test_readability_partition_invariant_and_plan(spark):
    from gbif_data_validator_spark.operators.metrics import readability_census

    rows = [(i, f"Sentence number {i} is right here. Another one!", "en" if i % 2 else "fr")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = {tuple(r) for r in readability_census(df, "text", ["lang"]).collect()}
    b = {
        tuple(r)
        for r in readability_census(df.repartition(7, "doc_id"), "text", ["lang"]).collect()
    }
    assert a == b
    plan = (
        readability_census(df, "text", ["lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# -- term co-occurrence lift census -------------------------------------------


def test_term_cooccurrence_hand_lift(spark):
    from gbif_data_validator_spark.operators.metrics import term_cooccurrence

    # 4 docs; "alpha beta" together in 2, alpha in 3, beta in 2
    # lift(alpha,beta) = (2*4)/(3*2) = 4/3 -> 1333333 ppm
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "alpha gamma"),
            (4, "delta gamma"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.word_a, r.word_b): r
        for r in term_cooccurrence(df, top_n=10, min_pair=2).collect()
    }
    r = out[("alpha", "beta")]
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 2)
    assert r.lift_ppm == 1333333  # floor(1e6 * 8/6)
    # alpha+gamma co-occur twice: lift = (2*4)/(3*3)
    assert out[("alpha", "gamma")].lift_ppm == 888888
    # pairs below min_pair are absent
    assert ("beta", "gamma") not in out


def test_term_cooccurrence_partition_invariant_and_broadcasts(spark):
    from gbif_data_validator_spark.operators.metrics import term_cooccurrence

    rows = [(i, f"common term{i % 3} filler word{i % 5} common tail") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {tuple(r) for r in term_cooccurrence(df, top_n=8).collect()}
    b = {tuple(r) for r in term_cooccurrence(df.repartition(7, "doc_id"), top_n=8).collect()}
    assert a == b
    plan = (
        term_cooccurrence(df, top_n=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # top-N vocab and the 1-row doc count attach as broadcasts, never shuffles
    assert plan.count("BroadcastHashJoin") >= 1
    assert "BroadcastNestedLoopJoin" in plan


def test_concentration_census_hand_computed(spark):
    from gbif_data_validator_spark.operators.metrics import (
        concentration_census,
    )

    # groups a:1, b:1, c:2, d:4 (n=4, T=8); ascending x -> S = 1*1 + 2*1
    # + 3*2 + 4*4 = 25; gini = (50 - 5*8)/(4*8) = 10/32 = 0.3125
    rows = [("a",)] + [("b",)] + [("c",)] * 2 + [("d",)] * 4 + [(None,)]
    df = spark.createDataFrame(rows, "g string")
    r = concentration_census(df, "g", top_k=1).first()
    assert (r.n_groups, r.n_rows) == (4, 8)  # NULL group excluded
    assert r.gini_micro == 1000000 * 10 // 32
    assert (r.topk_rows, r.topk_share_micro) == (4, 500000)


def test_concentration_census_uniform_is_zero_and_bucketing_invariant(spark):
    from gbif_data_validator_spark.operators.metrics import (
        concentration_census,
    )

    rows = [(f"g{i % 5}",) for i in range(20)]  # 5 groups x 4 rows
    df = spark.createDataFrame(rows, "g string")
    r = concentration_census(df, "g", top_k=2).first()
    assert r.gini_micro == 0
    assert r.topk_share_micro == 1000000 * 8 // 20
    # the distributed rank must not depend on the bucket count
    for nb in (1, 3, 1024):
        r2 = concentration_census(df, "g", top_k=2, n_buckets=nb).first()
        assert tuple(r2) == tuple(r)


def test_concentration_census_empty(spark):
    from gbif_data_validator_spark.operators.metrics import (
        concentration_census,
    )

    df = spark.createDataFrame([], "g string")
    assert concentration_census(df, "g").count() == 0


# ------------------------------------------------ stylometric distance


def test_style_distance_matches_brute_force(spark):
    from gbif_data_validator_spark.operators.metrics import style_distance_census

    rows = [
        ("s1", "the cat and the dog and the bird"),
        ("s1", "the fish"),
        ("s2", "the cat the cat the cat dog"),
        ("s3", "entirely unrelated words appear here nothing shared at all"),
        ("s3", None),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r.group_a, r.group_b): r
        for r in style_distance_census(df, "source", "text", vocab_k=4).collect()
    }
    # brute force
    import collections

    toks = collections.defaultdict(list)
    for s, t in rows:
        if t is not None:
            toks[s].extend(w for w in t.lower().split() if w)
    counts = {s: collections.Counter(ws) for s, ws in toks.items()}
    g = collections.Counter()
    for c in counts.values():
        g.update(c)
    vocab = sorted(g.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    vocab = [w for w, _ in vocab]
    prof = {
        s: {w: (1_000_000 * c.get(w, 0)) // sum(c.values()) for w in vocab}
        for s, c in counts.items()
    }
    srcs = sorted(prof)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            want = sum(abs(prof[a][w] - prof[b][w]) for w in vocab)
            assert out[(a, b)].delta_micro == want, (a, b)
            assert out[(a, b)].n_words == 4
    assert len(out) == 3


def test_style_distance_identical_templates_zero(spark):
    from gbif_data_validator_spark.operators.metrics import style_distance_census

    # same generator behind two "domains": identical word distribution,
    # different multiplicities — relative profiles match exactly
    rows = [
        ("a.com", "buy now cheap deals buy now"),
        ("b.net", "buy now cheap deals buy now " * 3),
        ("c.org", "longform essay about something else entirely with flowing prose"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r.group_a, r.group_b): r.delta_micro
        for r in style_distance_census(df, "source", "text", vocab_k=10).collect()
    }
    assert out[("a.com", "b.net")] == 0
    assert out[("a.com", "c.org")] > 0


def test_style_distance_partition_invariant_one_scan(spark):
    from gbif_data_validator_spark.operators.metrics import style_distance_census

    rows = [(f"s{i % 5}", f"word{i % 23} common tokens here {i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "source string, text string")
    a = {
        (r.group_a, r.group_b): (r.n_words, r.delta_micro)
        for r in style_distance_census(df.repartition(1), "source", "text").collect()
    }
    b = {
        (r.group_a, r.group_b): (r.n_words, r.delta_micro)
        for r in style_distance_census(df.repartition(11), "source", "text").collect()
    }
    assert a == b and len(a) == 10


def test_dup_ngram_stats_hand_computed(spark):
    from gbif_data_validator_spark.operators.metrics import dup_ngram_stats

    # "ab ab ab ab" (11 chars): four tokens, top 2-gram "ab ab" occurs 3×
    # (overlapping), covering 3*5=15 chars -> capped at 1.0; dup 5..10-grams
    # don't exist (only 4 tokens) -> 0.0 and all dup gates pass.
    # "one two three four five six seven" has no repeats: all fracs from
    # duplication are 0; top 2-gram ties at cnt=1 -> deterministic pick is
    # the lexicographically smallest gram "five six" (8 chars) / 33.
    df = spark.createDataFrame(
        [(1, "ab ab ab ab"), (2, "one two three four five six seven"), (3, None)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_stats(df).collect()}
    assert out[1].top_2gram_char_frac == 1.0
    assert out[1].dup_5gram_char_frac == 0.0
    assert not out[1].gate_top_2gram and not out[1].rep_passes
    assert out[2].top_2gram_char_frac == round(8 / 33, 6)
    assert out[2].dup_10gram_char_frac == 0.0
    # 8/33 ≈ 0.242 > 0.20 threshold: a single occurrence can still trip the
    # top-gram gate on a tiny doc — the published formulation, kept as-is
    assert not out[2].gate_top_2gram
    # null text: every fraction 0.0, every gate passes
    assert out[3].top_4gram_char_frac == 0.0 and out[3].rep_passes


def test_dup_ngram_stats_partition_invariant(spark):
    from gbif_data_validator_spark.operators.metrics import dup_ngram_stats

    rows = [(i, " ".join(f"w{j % (3 + i % 5)}" for j in range(30))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    canon = lambda d: sorted(map(tuple, d.collect()))
    assert canon(dup_ngram_stats(df.repartition(1))) == canon(
        dup_ngram_stats(df.repartition(13))
    )
