"""Curation operators: deterministic sequence packing (token-budget bins)
and benchmark decontamination (n-gram overlap)."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.curation import (
    ngram_contamination,
    pack_bins,
)


def test_pack_bins_budget_and_determinism(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 700 + 50).cast("int").alias("tokens"),
    )
    packed = pack_bins(df, "doc_id", "tokens", budget=1000, n_shards=4)
    rows = packed.collect()
    assert len(rows) == 400  # every document assigned exactly once

    # contiguous-fill bounds: a bin holds < budget + its largest item, and
    # a shard uses no more bins than ceil(total / budget) — the fill is
    # gapless, so the bin count is within one of optimal for its order
    import collections
    import math

    bins = collections.defaultdict(list)
    shard_tot = collections.defaultdict(int)
    for r in rows:
        bins[(r.shard, r.bin_id)].append(r.tokens)
        shard_tot[r.shard] += r.tokens
    for (s, b), toks in bins.items():
        assert sum(toks) < 1000 + max(toks), (s, b, toks)
    for s, tot in shard_tot.items():
        n_bins = len([1 for (s2, _) in bins if s2 == s])
        assert n_bins <= math.ceil(tot / 1000), (s, tot, n_bins)

    # deterministic: a second computation agrees row-for-row
    again = {(r.doc_id): (r.shard, r.bin_id) for r in packed.collect()}
    assert {(r.doc_id): (r.shard, r.bin_id) for r in rows} == again


def test_pack_bins_oversized_item_gets_own_bin_start(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "doc_id long, tokens int"
    )
    rows = pack_bins(df, "doc_id", "tokens", budget=1000, n_shards=1).collect()
    by_id = {r.doc_id: r.bin_id for r in rows}
    # FFD order: the 5000-token doc packs first and fully occupies bins 0-4;
    # the small docs start in bin 5
    assert by_id[1] == 0
    assert by_id[2] == 5 and by_id[3] == 5


def test_ngram_contamination_flags_copied_passage(spark):
    passage = " ".join(f"bench{i}" for i in range(20))
    bench = spark.createDataFrame([(passage,)], "text string")
    docs = spark.createDataFrame(
        [
            (1, passage + " plus some trailing words here"),        # contains it
            (2, " ".join(f"clean{i}" for i in range(30))),          # disjoint
            (3, "too short"),                                       # < n words
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_contamination(docs, bench, n=8).collect()}
    assert 3 not in got  # no 8-grams → no row
    assert got[2].n_hits == 0 and got[2].ratio == 0.0
    # doc 1 shares every 8-gram of the 20-word passage (13 grams)
    assert got[1].n_hits == 13
    assert got[1].ratio > 0.4


def _bp_df(spark):
    # domain d1: "COOKIE NOTICE" on 3 of 4 docs, "FOOTER" on all 4,
    # "body N" unique per doc; domain d2: no recurring lines
    rows = []
    for i in range(4):
        lines = [f"body {i}", "FOOTER", ""]
        if i < 3:
            lines.insert(0, "COOKIE NOTICE")
        rows.append((i, "d1", lines))
    rows += [(10, "d2", ["hello", "world"]), (11, "d2", ["other", "text"])]
    return spark.createDataFrame(
        rows, schema="doc_id long, domain string, lines array<string>"
    )


def test_boilerplate_lines_census_and_cap(spark):
    from gbif_data_validator_spark.operators.curation import boilerplate_lines

    df = _bp_df(spark)
    got = {
        (r.domain, r.line): r.n_docs
        for r in boilerplate_lines(df, "doc_id", "domain", "lines", min_docs=3).collect()
    }
    assert got == {("d1", "FOOTER"): 4, ("d1", "COOKIE NOTICE"): 3}

    # in-doc repeats count once (array_distinct semantics)
    rep = spark.createDataFrame(
        [(1, "d", ["x", "x", "x"]), (2, "d", ["x"])],
        schema="doc_id long, domain string, lines array<string>",
    )
    assert boilerplate_lines(rep, "doc_id", "domain", "lines", min_docs=3).count() == 0

    # cap keeps the most widespread line (n_docs desc, line tie-break)
    top1 = boilerplate_lines(
        df, "doc_id", "domain", "lines", min_docs=3, max_lines=1
    ).collect()
    assert {(r.domain, r.line) for r in top1} == {("d1", "FOOTER")}


def test_strip_boilerplate_preserves_order_blanks_and_clean_domains(spark):
    from gbif_data_validator_spark.operators.curation import strip_boilerplate

    df = _bp_df(spark)
    got = {
        r.doc_id: r.clean_lines
        for r in strip_boilerplate(df, "doc_id", "domain", "lines", min_docs=3).collect()
    }
    # boilerplate removed, order + blank lines preserved
    assert got[0] == ["body 0", ""]
    assert got[3] == ["body 3", ""]  # doc without COOKIE still loses FOOTER
    # clean domain untouched (null dim join -> keep everything)
    assert got[10] == ["hello", "world"]

    # null lines array stays null
    nul = spark.createDataFrame(
        [(1, "d1", None), (2, "d1", ["a"]), (3, "d1", ["a"]), (4, "d1", ["a"])],
        schema="doc_id long, domain string, lines array<string>",
    )
    out = {r.doc_id: r.clean_lines for r in strip_boilerplate(nul, "doc_id", "domain", "lines").collect()}
    assert out[1] is None and out[2] == []


def test_quota_by_stratum_budget_and_order(spark):
    from gbif_data_validator_spark.operators.curation import quota_by_stratum

    # stratum a: qualities 5,4,3,2 with 40 tokens each, budget 100 ->
    # top two selected (cum 80), third would cross (120). stratum b fits whole.
    df = spark.createDataFrame(
        [(1, "a", 5.0, 40), (2, "a", 4.0, 40), (3, "a", 3.0, 40), (4, "a", 2.0, 40),
         (5, "b", 1.0, 30), (6, "b", 1.0, 30)],
        schema="doc_id long, src string, q double, tokens int",
    )
    got = {
        r.doc_id: (r.rank, r.cum_tokens, r.selected)
        for r in quota_by_stratum(
            df, "src", "tokens", 100,
            [F.col("q").desc(), F.col("doc_id")],
        ).collect()
    }
    assert got[1] == (1, 40, True) and got[2] == (2, 80, True)
    assert got[3] == (3, 120, False) and got[4] == (4, 160, False)
    # tie on q=1.0 broken by doc_id; both fit in budget
    assert got[5] == (1, 30, True) and got[6] == (2, 60, True)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_strip_boilerplate_plan_broadcasts_census(spark):
    """The corpus side must NOT shuffle: the census broadcasts (bounded by
    max_lines × |domains|), and the per-domain top-N compiles to a
    WindowGroupLimit so the cap prunes map-side."""
    from gbif_data_validator_spark.operators.curation import strip_boilerplate

    df = _bp_df(spark)
    plan = _plan(strip_boilerplate(df, "doc_id", "domain", "lines", max_lines=50))
    assert "BroadcastHashJoin" in plan and "BuildRight" in plan
    # the rank<=N cap compiles to a map-side WindowGroupLimit when N is
    # under spark.sql.optimizer.windowGroupLimitThreshold (1000)
    assert "WindowGroupLimit" in plan
    # corpus branch: no hashpartitioning exchange of the full input columns
    # (the only hash exchanges belong to the census agg/window)
    corpus_exchanges = [
        l for l in plan.splitlines()
        if "Exchange hashpartitioning" in l and "domain" not in l and "line" not in l
    ]
    assert corpus_exchanges == [], corpus_exchanges


def test_quota_plan_single_stratum_exchange(spark):
    """rank + running sum share one hashpartitioning(stratum) exchange."""
    from gbif_data_validator_spark.operators.curation import quota_by_stratum

    df = spark.createDataFrame(
        [(1, "a", 1.0, 10)], schema="doc_id long, src string, q double, tokens int"
    )
    plan = _plan(
        quota_by_stratum(df, "src", "tokens", 100, [F.col("q").desc(), "doc_id"])
    )
    hashes = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
    assert len(hashes) == 1, hashes


def test_chunk_documents_windows_and_overlap(spark):
    from gbif_data_validator_spark.operators.curation import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y"), (3, "   "), (4, None)],
        schema="doc_id long, text string",
    )
    got = {}
    for r in chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1).collect():
        got.setdefault(r.doc_id, []).append((r.chunk_id, r.chunk_text, r.n_tokens))
    # 7 tokens, chunk 4, stride 3 -> chunks at offsets 0 and 3 cover all
    # tokens (the second ends exactly at n, so no third chunk)
    assert got[1] == [(0, "a b c d", 4), (1, "d e f g", 4)]
    assert got[2] == [(0, "x y", 2)]
    assert 3 not in got and 4 not in got
    # every token covered, consecutive chunks share `overlap` tokens
    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_resample_by_weight_copy_counts(spark):
    from gbif_data_validator_spark.operators.sampling import resample_by_weight

    df = spark.createDataFrame(
        [(i, "hot" if i % 2 == 0 else "rare") for i in range(2000)],
        schema="doc_id long, src string",
    )
    out = resample_by_weight(df, "doc_id", "src", {"hot": 0.5, "rare": 2.5})
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(r.copy)
    # copy indexes are dense 0..n-1
    assert all(sorted(v) == list(range(len(v))) for v in by.values())
    hot = [r for r in rows if r.src == "hot"]
    rare = [r for r in rows if r.src == "rare"]
    # expectations: hot ~0.5x, rare ~2.5x (hash-deterministic, tolerance wide)
    assert 0.4 * 1000 < len(hot) < 0.6 * 1000
    assert 2.3 * 1000 < len(rare) < 2.7 * 1000
    # rare docs get 2 or 3 copies; hot docs 0 or 1
    assert {len(v) for k, v in by.items() if k % 2 == 1} == {2, 3}
    assert all(len(v) == 1 for k, v in by.items() if k % 2 == 0)
    # determinism
    assert {(r.doc_id, r.copy) for r in out.collect()} == {(r.doc_id, r.copy) for r in rows}


def test_chunk_documents_plan_is_narrow(spark):
    from gbif_data_validator_spark.operators.curation import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    plan = (
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_resample_by_weight_plan_is_narrow(spark):
    from gbif_data_validator_spark.operators.sampling import resample_by_weight

    df = spark.createDataFrame([(1, "s")], "doc_id long, src string")
    plan = (
        resample_by_weight(df, "doc_id", "src", {"s": 2.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Join" not in plan, plan


def test_survivors_by_score_keeps_best_not_min_id(spark):
    from gbif_data_validator_spark.operators.curation import survivors_by_score

    # docs 1/2/3 are one near-dup cluster; doc 3 (highest score) must
    # survive even though min-id policy would keep doc 1. doc 9 is
    # unclustered and passes through.
    df = spark.createDataFrame(
        [(1, 0.2), (2, 0.5), (3, 0.9), (9, 0.1)], "doc_id long, score double"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    got = sorted(
        r.doc_id
        for r in survivors_by_score(df, pairs, "doc_id", F.col("score")).collect()
    )
    assert got == [3, 9]


def test_survivors_by_score_tie_breaks_to_min_id(spark):
    from gbif_data_validator_spark.operators.curation import survivors_by_score

    df = spark.createDataFrame(
        [(5, 0.7), (6, 0.7), (7, 0.7)], "doc_id long, score double"
    )
    pairs = spark.createDataFrame([(5, 6), (6, 7)], "doc_a long, doc_b long")
    got = sorted(
        r.doc_id
        for r in survivors_by_score(df, pairs, "doc_id", F.col("score")).collect()
    )
    assert got == [5]


def test_survivors_by_score_multi_cluster(spark):
    from gbif_data_validator_spark.operators.curation import survivors_by_score

    # two disjoint clusters → one survivor each, chosen per-cluster
    df = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (10, 0.8), (11, 0.2), (20, 0.5)],
        "doc_id long, score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (10, 11)], "doc_a long, doc_b long"
    )
    got = sorted(
        r.doc_id
        for r in survivors_by_score(df, pairs, "doc_id", F.col("score")).collect()
    )
    assert got == [2, 10, 20]


# ------------------------------------------------------------------ funnel

_GOOD = (
    "the quick brown fox jumps over the lazy dog and that sentence is long. "
) * 12  # one long terminal-punctuated line, >50 words, clean


def _funnel_df(spark, rows):
    from pyspark.sql import Row

    return spark.createDataFrame([Row(doc_id=i, text=t, lang=l) for i, t, l in rows])


def test_curation_funnel_first_failing_stage_attribution(spark):
    from gbif_data_validator_spark.operators.curation import curation_funnel

    rows = [
        (1, _GOOD, "en"),                       # kept
        (2, _GOOD + " lorem ipsum", "fr"),      # fails c4 AND lang -> 'c4'
        (3, "too short.", "en"),                # passes c4? no: <3 sentences -> c4
        (4, _GOOD, "de"),                       # only lang fails
        (5, _GOOD, "en"),                       # exact dup of 1 (same text)
    ]
    got = {
        r.doc_id: r.stage
        for r in curation_funnel(_funnel_df(spark, rows)).collect()
    }
    assert got == {1: "kept", 2: "c4", 3: "c4", 4: "lang", 5: "exact_dup"}


def test_curation_funnel_dedup_survivorship_is_conditional(spark):
    """A doc whose lower-id twin FAILED an earlier stage must win
    survivorship itself — dropped docs never contend."""
    from gbif_data_validator_spark.operators.curation import curation_funnel

    rows = [
        (1, _GOOD, "zz"),   # same text, fails lang
        (2, _GOOD, "en"),   # must be 'kept', NOT 'exact_dup' behind doc 1
        (3, _GOOD, "en"),   # dup of 2
    ]
    got = {
        r.doc_id: r.stage
        for r in curation_funnel(_funnel_df(spark, rows)).collect()
    }
    assert got == {1: "lang", 2: "kept", 3: "exact_dup"}


def test_curation_funnel_census_and_plan(spark):
    from gbif_data_validator_spark.operators.curation import (
        curation_funnel,
        funnel_census,
    )

    rows = [(i, _GOOD if i % 2 else "x.", "en") for i in range(1, 11)]
    staged = curation_funnel(_funnel_df(spark, rows))
    census = funnel_census(staged)
    out = {r.stage: (r.n_docs, r.share) for r in census.collect()}
    assert out["c4"][0] == 5 and out["kept"][0] == 1 and out["exact_dup"][0] == 4
    assert abs(sum(s for _, s in out.values()) - 1.0) < 1e-9
    # plan: the three filter batteries are ONE projection — no Join
    # anywhere, and the only data-sized Exchange is the dedup window's
    # fingerprint hash partitioning
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_shard_plan_matches_single_window_definition(spark):
    from pyspark.sql import Window, functions as F

    from gbif_data_validator_spark.operators.curation import shard_plan

    # skewed ids (quadratic gaps) so range buckets are uneven on purpose
    df = spark.range(0, 400).select(
        (F.col("id") * F.col("id")).alias("doc_id"),
        (F.col("id") % 97 + 10).alias("nbytes"),
    ).repartition(7)
    got = shard_plan(df, "doc_id", "nbytes", shard_bytes=500, n_buckets=16)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "doc_id", F.col("nbytes").cast("long").alias("size"),
        F.expr("sum(nbytes) over (order by doc_id "
               "rows between unbounded preceding and current row)"),
    ).withColumn(
        "shard", F.expr("(`sum(nbytes) OVER (ORDER BY doc_id ASC NULLS FIRST "
                        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)` "
                        "- size) div 500")
    ).select("doc_id", "size", "shard")
    assert sorted(got.collect()) == sorted(want.collect())
    # shards are contiguous along the id order and sized near the budget
    rows = sorted(got.collect())
    seen = [r.shard for r in rows]
    assert seen == sorted(seen)  # monotone along id order


def test_shard_plan_guards_and_empty(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.curation import shard_plan

    df = spark.range(0, 10).select(
        F.col("id").alias("doc_id"), F.lit(100).alias("n")
    )
    with _pytest.raises(ValueError, match="shard_bytes"):
        shard_plan(df, "doc_id", "n", shard_bytes=0)
    empty = shard_plan(df.where(F.lit(False)), "doc_id", "n", 1000)
    assert empty.count() == 0 and empty.columns == ["doc_id", "size", "shard"]
    # budget larger than the corpus -> everything in shard 0
    one = shard_plan(df, "doc_id", "n", shard_bytes=10_000)
    assert {r.shard for r in one.collect()} == {0}


def test_canonical_census_orders_precedence_offhost(spark):
    from gbif_data_validator_spark.operators.curation import canonical_census

    pages = spark.createDataFrame(
        [
            # rel-first form, off-host
            ("https://a.com/1", '<link rel="canonical" href="https://c.com/p">'),
            # href-first form, same target, second source host
            ("https://b.com/1", '<link href="https://c.com/p" rel="canonical">'),
            # own-host canonical -> not off-host
            ("https://a.com/2", "<LINK REL='canonical' HREF='https://a.com/x'>"),
            # rel-first wins over a second href-first tag
            ("https://a.com/3",
             '<link rel="canonical" href="https://win.com/y">'
             '<link href="https://lose.com/z" rel="canonical">'),
            # stylesheet link must not match; page drops out
            ("https://a.com/4", '<link rel="stylesheet" href="https://s.com/c.css">'),
        ],
        "url string, html string",
    )
    got = {r.canonical: (r.n_pages, r.n_src_hosts, r.n_offhost)
           for r in canonical_census(pages).collect()}
    assert got == {
        "https://c.com/p": (2, 2, 2),
        "https://a.com/x": (1, 1, 0),
        "https://win.com/y": (1, 1, 1),
    }


def test_shard_plan_plan_shape_no_global_sort(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.curation import shard_plan

    df = spark.range(0, 500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("n")
    )
    plan = (
        shard_plan(df, "doc_id", "n", shard_bytes=1000, n_buckets=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the global prefix sum must NOT be a global sort: no range
    # partitioning, exactly one hash Exchange (the bucket window), and
    # the offsets arrive by broadcast
    assert "rangepartitioning" not in plan.lower()
    assert plan.lower().count("hashpartitioning") == 1
    assert "BroadcastHashJoin" in plan


# -- continuation (tail→head) chaining ---------------------------------------


def test_continuation_pairs_chain_and_exclusions(spark):
    from gbif_data_validator_spark.operators.curation import continuation_pairs

    k = 8
    a_tail = "ABCDEFGH"
    df = spark.createDataFrame(
        [
            (1, "p" * 20 + a_tail),              # page 1: ends with the key
            (2, a_tail + "q" * 20),              # page 2: starts with it -> pair (1,2)
            (3, a_tail),                         # too short (< 2k) -> excluded
            (4, "unrelated content that is long enough to qualify"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_a, r.doc_b) for r in continuation_pairs(df, k=k).collect()}
    assert got == {(1, 2)}


def test_continuation_pairs_hot_key_cap(spark):
    from gbif_data_validator_spark.operators.curation import continuation_pairs

    k = 8
    # 5 docs all END with the same boilerplate footer start; 5 all BEGIN
    # with it -> 25 pairs uncapped, 0 with max_key=4 (the hot key drops)
    foot = "FOOTERXX"
    rows = [(i, "y" * 20 + foot) for i in range(5)]
    rows += [(100 + i, foot + "z" * 20) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert continuation_pairs(df, k=k, max_key=100).count() == 25
    assert continuation_pairs(df, k=k, max_key=4).count() == 0


def test_continuation_pairs_directed_not_symmetric(spark):
    from gbif_data_validator_spark.operators.curation import continuation_pairs

    k = 8
    key = "KEYKEYKE"
    df = spark.createDataFrame(
        [(1, "a" * 20 + key), (2, key + "b" * 20)], "doc_id long, text string"
    )
    got = {(r.doc_a, r.doc_b) for r in continuation_pairs(df, k=k).collect()}
    assert got == {(1, 2)}  # no (2, 1): the chain is directed


def test_url_param_census_semantics(spark):
    """Bare flag -> NULL value; ?ref= -> blank value counted; raw keys
    (no case fold: ID and id are different params); no-qs URLs silent."""
    from gbif_data_validator_spark.operators.curation import url_param_census

    urls = [
        "https://a.com/x?id=1&utm=s0",
        "https://a.com/y?id=2&utm=s0&ref=",
        "https://b.com/z?id=3&debug",
        "https://b.com/w?ID=3",
        "https://c.com/noqs",
        "https://c.com/frag?id=4#id=ignored&x=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r.param: r for r in url_param_census(df, "url").collect()}
    assert set(got) == {"id", "utm", "ref", "debug", "ID"}
    # id: 4 pairs (fragment param ignored), all distinct values -> ratio 1e6
    assert got["id"].n_pairs == 4 and got["id"].n_values == 4
    assert got["id"].distinct_ratio_micro == 1_000_000
    assert got["id"].n_hosts == 3
    # utm: 2 pairs, one value -> ratio 500000
    assert got["utm"].n_values == 1 and got["utm"].distinct_ratio_micro == 500_000
    # ref= blank: the '' value is distinct AND blank
    assert got["ref"].n_values == 1 and got["ref"].n_blank == 1
    # bare flag: NULL value -> 0 distinct values, blank
    assert got["debug"].n_values == 0 and got["debug"].n_blank == 1
    assert got["ID"].n_pairs == 1  # raw keys, no case fold


def test_url_param_census_partition_invariance(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.curation import url_param_census

    df = spark.range(0, 2000).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 10).cast("string"),
            F.lit(".com/p?k="), (F.col("id") % 7).cast("string"),
            F.lit("&t="), F.col("id").cast("string"),
        ).alias("url")
    )
    a = sorted(map(tuple, url_param_census(df, "url").collect()))
    b = sorted(map(tuple, url_param_census(df.repartition(17), "url").collect()))
    assert a == b
    k = dict((r[0], r) for r in a)["k"]
    assert k[1] == 2000 and k[4] == 7  # n_pairs, n_values


def test_duplicate_title_census_normalize_and_threshold(spark):
    from gbif_data_validator_spark.operators.curation import (
        duplicate_title_census,
    )

    pages = spark.createDataFrame(
        [
            ("https://a.x/1", "<html><title>Hello   World</title></html>"),
            ("https://b.y/2", '<title data-l="en">Hello\tWorld </title>'),
            ("https://a.x/3", "<title>Hello World</title>"),
            ("https://a.x/4", "<title>Unique</title>"),  # below min_pages
            ("https://a.x/5", "<html><body>no title</body></html>"),
            ("https://a.x/6", "<title>  </title>"),  # blank -> NULL
        ],
        "url string, html string",
    )
    got = {
        r.title: (r.n_pages, r.n_hosts, r.example_url)
        for r in duplicate_title_census(pages).collect()
    }
    assert got == {"Hello World": (3, 2, "https://a.x/1")}
    # min_pages=1 admits the singleton; blank/missing titles never appear
    all_rows = duplicate_title_census(pages, min_pages=1)
    assert sorted(r.title for r in all_rows.collect()) == [
        "Hello World",
        "Unique",
    ]


# --------------------------------------------------------------------------
# mixture planner + rank normalization
# --------------------------------------------------------------------------


def test_mixture_plan_exact_arithmetic(spark):
    from gbif_data_validator_spark.operators.curation import mixture_token_plan

    df = spark.createDataFrame(
        [("a", 100), ("a", 100), ("b", 1000), ("c", 50)],
        "source string, tokens long",
    )
    plan = {
        r.source: r
        for r in mixture_token_plan(
            df, "source", "tokens", {"a": 500_000, "b": 250_000, "d": 250_000}, 1000
        ).collect()
    }
    # a: avail 200, target 500 -> oversubscribed, 2.5 epochs
    assert plan["a"].target_tokens == 500 and plan["a"].oversubscribed
    assert plan["a"].epochs_micro == 2_500_000
    # b: avail 1000, target 250 -> 0.25 epochs
    assert plan["b"].target_tokens == 250 and not plan["b"].oversubscribed
    assert plan["b"].epochs_micro == 250_000
    # c in corpus, not in plan: explicit weight-0 drop row
    assert plan["c"].weight_ppm == 0 and plan["c"].target_tokens == 0
    assert plan["c"].epochs_micro == 0 and not plan["c"].oversubscribed
    # d in plan, not in corpus: available 0, oversubscribed, null epochs
    assert plan["d"].available_tokens == 0 and plan["d"].oversubscribed
    assert plan["d"].epochs_micro is None


def test_mixture_plan_exact_past_double_precision(spark):
    """budget · ppm beyond 2^53 still lands exactly (DECIMAL path)."""
    from gbif_data_validator_spark.operators.curation import mixture_token_plan

    df = spark.createDataFrame([("a", 3)], "source string, tokens long")
    budget = 10**13 + 1  # budget*ppm = (1e13+1)*333_333 > 2^53
    row = mixture_token_plan(df, "source", "tokens", {"a": 333_333}, budget).first()
    assert row.target_tokens == (budget * 333_333) // 1_000_000


def test_mixture_plan_rejects_negatives(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.operators.curation import mixture_token_plan

    df = spark.createDataFrame([("a", 1)], "source string, tokens long")
    with _pytest.raises(ValueError):
        mixture_token_plan(df, "source", "tokens", {"a": -1}, 10)
    with _pytest.raises(ValueError):
        mixture_token_plan(df, "source", "tokens", {"a": 1}, -10)


def test_rank_normalize_percentiles(spark):
    from gbif_data_validator_spark.operators.curation import rank_normalize

    df = spark.createDataFrame(
        [(1, "s", 0.1), (2, "s", 0.5), (3, "s", 0.9), (4, "t", 0.2), (5, "t", 0.2)],
        "doc_id long, source string, q double",
    )
    got = {r.doc_id: r.q_rank for r in rank_normalize(df, "source", "q", "doc_id").collect()}
    assert got[1] == 0.0 and got[2] == 0.5 and got[3] == 1.0
    # tie broken by doc_id: deterministic distinct ranks
    assert got[4] == 0.0 and got[5] == 1.0


def test_idn_spoof_census_flag_matrix(spark):
    """Every detection branch: punycode at ^ and mid-host, xn-- not at a
    label start (benign), Latin+Cyrillic and Latin+Greek mixed labels,
    pure-Cyrillic label (non_ascii only), ASCII benign, non-url."""
    from gbif_data_validator_spark.operators.curation import idn_spoof_census

    urls = [
        "https://good.example.com/a",
        "https://good.example.com/b",
        "https://xn--pypal-4ve.example.com/x",
        "https://sub.xn--80ak6aa92e.com/y",
        "https://axn--fake.example.com/z",
        "https://pаypal.example.com/login",
        "https://πshop.example.org/",
        "https://кириллица.example.ru/",
        "http://plain.example.net/q",
        "not a url at all",
        "https://XN--UPPER.example.com/c",  # case-insensitive via lower()
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["host"]: (r["punycode"], r["mixed_script"], r["non_ascii"], r["n_pages"])
        for r in idn_spoof_census(df).collect()
    }
    assert set(got) == {
        "xn--pypal-4ve.example.com",
        "sub.xn--80ak6aa92e.com",
        "pаypal.example.com",
        "πshop.example.org",
        "кириллица.example.ru",
        "xn--upper.example.com",
    }
    assert got["xn--pypal-4ve.example.com"] == (True, False, False, 1)
    assert got["xn--upper.example.com"] == (True, False, False, 1)
    assert got["pаypal.example.com"] == (False, True, True, 1)
    assert got["πshop.example.org"] == (False, True, True, 1)
    # legitimate pure-Cyrillic IDN: broad flag only, never "spoof-shaped"
    assert got[
        "кириллица.example.ru"
    ] == (False, False, True, 1)


def test_idn_spoof_census_plan_one_exchange(spark):
    """One host-grain groupBy is the only shuffle; flags are computed on
    the grouped key, so the pre-shuffle row is (host) alone."""
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.curation import idn_spoof_census

    df = spark.range(100).select(
        F.concat(F.lit("https://h"), F.col("id") % 7, F.lit(".example.com/p")).alias(
            "url"
        )
    )
    plan = (
        idn_spoof_census(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_term_blocklist_flags_semantics(spark):
    """Case-folding, occurrence vs distinct counts, whole-token matching
    ('Slow.' keeps its period → no match), NULL text → NULL row."""
    from gbif_data_validator_spark.operators.curation import term_blocklist_flags

    df = spark.createDataFrame(
        [
            (1, "the slow DUP dup fox"),
            (2, "clean text here"),
            (3, None),
            (4, "Slow."),
            (5, ""),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.blocked_hits, r.blocked_distinct, r.allowed)
        for r in term_blocklist_flags(df, ["SLOW", "dup", "slow"]).collect()
    }
    assert got[1] == (5, 3, 2, False)
    assert got[2] == (3, 0, 0, True)
    assert got[3] == (None, None, None, None)
    assert got[4] == (1, 0, 0, True)  # exact whole-token: 'slow.' != 'slow'
    assert got[5] == (0, 0, 0, True)


def test_term_blocklist_census_and_empty_list(spark):
    import pytest

    from gbif_data_validator_spark.operators.curation import (
        term_blocklist_census,
        term_blocklist_flags,
    )

    df = spark.createDataFrame(
        [(1, "slow dup slow"), (2, "dup x"), (3, None)],
        "doc_id int, text string",
    )
    got = {
        r.term: (r.n_docs, r.n_occurrences)
        for r in term_blocklist_census(df, ["slow", "dup", "absent"]).collect()
    }
    # present terms only — no zero row for 'absent'
    assert got == {"slow": (1, 2), "dup": (2, 2)}
    with pytest.raises(ValueError, match="empty blocklist"):
        term_blocklist_flags(df, [])
    with pytest.raises(ValueError, match="empty blocklist"):
        term_blocklist_census(df, [])


def test_term_blocklist_plan_shapes(spark):
    """Flags: zero-shuffle Column algebra. Census: the blocklist filter
    runs BEFORE the explode, then one term-grain groupBy (the distinct
    doc count may add its Expand exchange, never a Join)."""
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.curation import (
        term_blocklist_census,
        term_blocklist_flags,
    )

    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id") % 5).alias("text"),
    )
    flags_plan = (
        term_blocklist_flags(df, ["tok1"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in flags_plan and "Join" not in flags_plan
    census_plan = (
        term_blocklist_census(df, ["tok1"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in census_plan
    assert census_plan.count("Exchange hashpartitioning") <= 2


def test_mirror_census_semantics(spark):
    """Normalization folds case/whitespace into one fp; subset host →
    overlap 10^6; the over-cap boilerplate fp creates no pairs but shows
    up in the dropped report; min_shared filters."""
    from gbif_data_validator_spark.operators.curation import (
        mirror_census,
        mirror_census_dropped,
    )

    rows = [
        ("https://a.com/1", "the original article text"),
        ("https://b.com/1", "The  ORIGINAL article   text"),
        ("https://a.com/2", "second shared piece"),
        ("https://b.com/2", "second shared piece"),
        ("https://c.com/1", "second shared piece"),
        ("https://a.com/3", "content only a has"),
        ("https://a.com/err", "error 404"),
        ("https://b.com/err", "error 404"),
        ("https://c.com/err", "error 404"),
        ("https://d.com/err", "error 404"),
        ("https://e.com/null", None),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {
        (r.host_a, r.host_b): (r.n_shared, r.n_a, r.n_b, r.overlap_micro)
        for r in mirror_census(df, min_shared=1, max_hosts_per_fp=3).collect()
    }
    # the 4-host 'error 404' fp is capped out; d.com/e.com appear nowhere
    assert set(got) == {("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "c.com")}
    assert got[("a.com", "b.com")] == (2, 4, 3, 666666)
    assert got[("a.com", "c.com")] == (1, 4, 2, 500000)
    assert got[("b.com", "c.com")] == (1, 3, 2, 500000)
    # min_shared=2 keeps only the true mirror pair
    only = mirror_census(df, min_shared=2, max_hosts_per_fp=3).collect()
    assert [(r.host_a, r.host_b) for r in only] == [("a.com", "b.com")]
    dropped = mirror_census_dropped(df, max_hosts_per_fp=3).collect()
    assert len(dropped) == 1 and dropped[0].n_hosts == 4
    import pytest

    with pytest.raises(ValueError, match="min_shared"):
        mirror_census(df, min_shared=0)


def test_mirror_census_plan_all_equi_joins(spark):
    """No cartesian/nested-loop anywhere — the fp self-join and the two
    total joins are all equi-joins."""
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.curation import mirror_census

    df = spark.range(100).select(
        F.concat(F.lit("https://h"), F.col("id") % 7, F.lit(".com/p"), F.col("id")).alias("url"),
        F.concat(F.lit("text "), F.col("id") % 13).alias("text"),
    )
    plan = (
        mirror_census(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
