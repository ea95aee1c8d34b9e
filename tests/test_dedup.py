"""Dedup operators: exact, n-gram Jaccard, MinHash-LSH, SimHash,
embedding-cosine — each validated on crafted corpora with known duplicate
structure (golden-pair assertions, reference test style)."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators import dedup


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"
    rows = [
        (1, base),
        (2, base),                                     # exact dup of 1
        (3, "The  Quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"),  # normalized dup of 1
        (4, base + " and then some extra words happen at the end of it"),  # near dup
        (5, "spark shuffles data between executors during wide transformations like joins and aggregations"),
        (6, "completely different content about gardens flowers bees and honey production in summer"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_exact_duplicate_groups(spark, corpus):
    groups = dedup.exact_duplicate_groups(corpus, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0].doc_ids == [1, 2, 3]  # case/whitespace-normalized


def test_dedup_exact_keeps_min_id(spark, corpus):
    kept = sorted(r.doc_id for r in dedup.dedup_exact(corpus, "doc_id", "text").collect())
    assert kept == [1, 4, 5, 6]


def test_ngram_jaccard_pairs(spark, corpus):
    pairs = dedup.ngram_jaccard_pairs(corpus, "doc_id", "text", k=3, threshold=0.5)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # exact/normalized dups have jaccard 1.0; the near dup clears 0.5
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (1, 4) in got
    assert not any(5 in p or 6 in p for p in got)


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], schema="doc_id long, text string"
    )
    rows = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=2, threshold=0.1).collect()
    # shingles: {ab,bc,cd} vs {ab,bc,ce} → inter 2, union 4 → 0.5
    assert len(rows) == 1 and rows[0].jaccard == 0.5


def test_ngram_containment_catches_supersets(spark):
    """A page wrapped in boilerplate: containment 1.0 (subset fully inside
    the superset) while Jaccard is diluted below any useful threshold."""
    inner = "alpha beta gamma delta epsilon zeta"
    wrapper = (
        "nav home about contact subscribe footer terms privacy " * 3
        + inner
        + " copyright sitemap rss feed archive tags search login logout"
    )
    df = spark.createDataFrame(
        [(1, inner), (2, wrapper)], schema="doc_id long, text string"
    )
    cont = dedup.ngram_containment_pairs(df, "doc_id", "text", k=3, threshold=0.9)
    rows = cont.collect()
    assert len(rows) == 1 and rows[0].containment == 1.0
    jac = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.5)
    assert jac.count() == 0  # symmetric Jaccard misses it


def test_minhash_lsh_finds_near_dups(spark, corpus):
    pairs = dedup.minhash_lsh_pairs(
        corpus, "doc_id", "text", k=3, n_hashes=64, n_bands=16, threshold=0.5
    )
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0 and got[(1, 3)] == 1.0
    assert (1, 4) in got  # near dup caught by banding
    assert not any(5 in p or 6 in p for p in got)


def test_minhash_signature_deterministic(spark, corpus):
    s1 = dedup.minhash_signatures(corpus, "doc_id", "text").collect()
    s2 = dedup.minhash_signatures(corpus, "doc_id", "text").collect()
    assert {r.doc_id: r.sig for r in s1} == {r.doc_id: r.sig for r in s2}


def test_simhash_pairs(spark, corpus):
    pairs = dedup.simhash_pairs(corpus, "doc_id", "text", max_hamming=10)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0  # identical text → identical simhash
    assert (1, 3) in got and got[(1, 3)] == 0  # case-normalized
    assert all(h <= 10 for h in got.values())
    assert not any((5 in p or 6 in p) for p in got)


def test_embedding_cosine_pairs(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = dedup.embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.99)
    for r in pairs.collect():
        assert r.doc_a < r.doc_b and r.cosine >= 0.99
    # threshold monotonicity: lowering it can only add pairs
    lo = dedup.embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.9).count()
    hi = pairs.count()
    assert lo >= hi


def test_embedding_cosine_pairs_lsh_recall(spark):
    """LSH-bucketed cosine dedup vs the exact quadratic operator on planted
    near-dup clusters: precision 1.0 by construction (cosine verified
    in-bucket), recall high with 4 tables."""
    import numpy as np

    from gbif_data_validator_spark.operators.dedup import (
        embedding_cosine_pairs,
        embedding_cosine_pairs_lsh,
    )

    rng = np.random.RandomState(11)
    dim, n_clusters, per = 64, 20, 4
    rows = []
    for c in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for j in range(per):
            v = center + 0.01 * rng.standard_normal(dim)
            rows.append((c * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")

    exact = {
        (r.doc_a, r.doc_b)
        for r in embedding_cosine_pairs(df, "vec_id", "embedding", 0.95).collect()
    }
    approx = {
        (r.doc_a, r.doc_b)
        for r in embedding_cosine_pairs_lsh(
            df, "vec_id", "embedding", dim=dim, threshold=0.95, n_tables=4
        ).collect()
    }
    # every cluster contributes its within-cluster pairs to the exact set
    assert len(exact) == n_clusters * per * (per - 1) // 2
    assert approx <= exact                       # verified pairs: no false positives
    assert len(approx & exact) / len(exact) >= 0.9  # high recall


def test_minhash_bucket_cap_drops_degenerate_bucket_loudly(spark):
    """A boilerplate cluster larger than max_bucket must be EXCLUDED from
    the pair fan-out (the c²/2-on-one-reducer guard) and REPORTED by the
    dropped-buckets audit — no silent caps."""
    boiler = "copyright notice all rights reserved contact us terms of service privacy policy"
    rows = [(i, boiler) for i in range(30)] + [
        (100, "a genuinely unique document about marine biology and coral reefs near the coast"),
        (101, "a genuinely unique document about marine biology and coral reefs near the shore"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")

    capped = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, max_bucket=10
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in capped}
    assert not any(a < 100 and b < 100 for a, b in got)  # cluster dropped
    assert (100, 101) in got  # normal near-dups unaffected

    dropped = dedup.minhash_lsh_dropped_buckets(
        df, "doc_id", "text", max_bucket=10
    ).collect()
    assert dropped and all(r.n_docs == 30 for r in dropped)

    # uncapped (cap above the cluster) still yields the full pair set
    full = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", threshold=0.5, max_bucket=1000
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in full} >= {(0, 1), (0, 29), (100, 101)}


def test_embedding_lsh_bucket_cap_and_audit(spark):
    """Same guard for the hyperplane-LSH embedding dedup: a dead-embedding
    cluster bigger than max_bucket is dropped from pair generation and
    surfaced by the audit."""
    import numpy as np

    rng = np.random.RandomState(5)
    v = rng.standard_normal(16)
    v /= np.linalg.norm(v)
    w = rng.standard_normal(16)
    w /= np.linalg.norm(w)
    rows = [(i, [float(x) for x in v]) for i in range(25)] + [
        (200, [float(x) for x in w]),
        (201, [float(x) for x in (w + 0.01 * rng.standard_normal(16))]),
    ]
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")

    capped = dedup.embedding_cosine_pairs_lsh(
        df, "vec_id", "embedding", dim=16, threshold=0.9, max_bucket=10
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in capped}
    assert not any(a < 200 and b < 200 for a, b in got)
    assert (200, 201) in got

    dropped = dedup.embedding_lsh_dropped_buckets(
        df, "vec_id", "embedding", dim=16, max_bucket=10
    ).collect()
    assert dropped and all(r.n_docs == 25 for r in dropped)


def test_dedup_exact_single_exchange(spark, corpus):
    """The survivor pass is a window over the fingerprint: exactly ONE
    shuffle exchange in the physical plan (the groupBy+join formulation
    pays two)."""
    plan = dedup.dedup_exact(corpus, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan


def test_duplicate_clusters_connected_components(spark):
    """Pairs (1,2),(2,3) are ONE three-doc cluster; (10,11) another; an
    8-node chain converges despite its diameter (pointer jumping)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)] + [(i, i + 1) for i in range(20, 27)],
        schema="doc_a long, doc_b long",
    )
    got = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(pairs, max_iter=10).collect()
    }
    assert {k: v for k, v in got.items() if k < 10} == {1: 1, 2: 1, 3: 1}
    assert got[10] == 10 and got[11] == 10
    assert all(got[i] == 20 for i in range(20, 28))  # the whole chain


def test_dedup_exact_keeps_null_text_representative(spark):
    """Null-text rows form one group and keep their min-id representative —
    they must never be silently dropped (null-key join trap)."""
    from gbif_data_validator_spark.operators.dedup import dedup_exact

    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, None), (4, None), (5, "other")],
        schema="doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in dedup_exact(df, "doc_id", "text").collect())
    assert kept == [1, 3, 5]


def test_winnow_pairs_find_copied_passage(spark):
    """Two documents sharing a long verbatim passage collide on winnow
    fingerprints; unrelated documents don't."""
    from gbif_data_validator_spark.operators.dedup import winnow_pairs

    passage = ("the quick brown fox jumps over the lazy dog while the rain "
               "falls gently on the quiet village rooftops every evening")
    rows = [
        (1, "intro text alpha " + passage + " closing words beta"),
        (2, "completely different opening " + passage + " and another ending"),
        (3, "nothing in common here just some plain filler words about weather "
            "patterns and various unrelated topics entirely separate"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.n_shared for r in winnow_pairs(df, "doc_id", "text").collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert not any(3 in pair for pair in got)


def test_paragraph_duplicate_groups(spark):
    from gbif_data_validator_spark.operators.dedup import paragraph_duplicate_groups

    boiler = "subscribe to our newsletter for the latest updates and exclusive offers"
    rows = [
        (1, f"unique intro one\n\n{boiler}\n\nunique body one that is long enough here"),
        (2, f"unique intro two\n\n{boiler}\n\n{boiler}\n\nanother unique body follows"),
        (3, "totally unrelated document with no shared paragraphs at all in it"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = paragraph_duplicate_groups(df, "doc_id", "text", min_chars=40).collect()
    assert len(got) == 1
    assert got[0].n_docs == 2 and got[0].doc_ids == [1, 2]  # within-doc repeat counts once


# -- cross-corpus dedup ------------------------------------------------------


@pytest.fixture(scope="module")
def two_corpora(spark):
    base = "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"
    ref = spark.createDataFrame(
        [
            (101, base),
            (102, "spark shuffles data between executors during wide transformations like joins"),
            (103, None),
        ],
        schema="doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, base),                                  # exact dup of ref 101
            (2, "The  Quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire"),  # normalized dup
            (3, base + " and then some extra words happen at the end of it"),  # near dup only
            (4, "completely different content about gardens flowers bees and honey production"),
            (5, None),                                   # null text: trivially novel
        ],
        schema="doc_id long, text string",
    )
    return new, ref


def test_exact_cross_flags(spark, two_corpora):
    new, ref = two_corpora
    flags = {r.doc_id: r.seen_in_ref for r in
             dedup.exact_cross_flags(new, ref, "doc_id", "text").collect()}
    assert flags == {1: True, 2: True, 3: False, 4: False, 5: False}


def test_dedup_against_keeps_novel_rows_with_all_columns(spark, two_corpora):
    new, ref = two_corpora
    out = dedup.dedup_against(new, ref, "doc_id", "text", broadcast_ref=True)
    assert out.columns == new.columns
    assert sorted(r.doc_id for r in out.collect()) == [3, 4, 5]
    # broadcast_ref puts the reference fingerprints on the broadcast side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_minhash_cross_pairs_only_cross_side(spark, two_corpora):
    new, ref = two_corpora
    # seed a same-side near-dup in `new` that must NOT appear in the output
    extra = spark.createDataFrame(
        [(6, "the quick brown fox jumps over the lazy dog while the cat sleeps near a warm fire")],
        schema="doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_cross_pairs(
        new.unionByName(extra), ref, "doc_id", "text", threshold=0.5
    ).collect()
    got = {(r.left_id, r.right_id) for r in pairs}
    assert (1, 101) in got and (2, 101) in got  # exact dups always collide
    assert all(r.right_id > 100 and r.left_id < 100 for r in pairs)
    assert all(0.5 <= r.est_jaccard <= 1.0 for r in pairs)


def test_minhash_cross_pairs_id_collision_safe(spark):
    """Same doc_id on both sides must stay distinguishable (sides are
    tagged before the union, never joined back by id)."""
    left = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        schema="doc_id long, text string",
    )
    right = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        schema="doc_id long, text string",
    )
    rows = dedup.minhash_lsh_cross_pairs(left, right, "doc_id", "text", threshold=0.5).collect()
    assert len(rows) == 1 and rows[0].left_id == 1 and rows[0].right_id == 1
    assert rows[0].est_jaccard == 1.0


def test_duplicated_spans_planted_window(spark):
    # doc2 carries tokens 11..30 of doc1 verbatim (20 tokens) at its own
    # offset 11; doc3 shares only a 10-token tail (< min_tokens); doc4 is
    # shorter than k (the sequence(1, <1) descending-array guard path)
    w = [f"w{i}" for i in range(50)]
    doc1 = " ".join(w)
    doc2 = " ".join([f"x{i}" for i in range(10)] + w[10:30] + [f"y{i}" for i in range(10)])
    doc3 = " ".join([f"z{i}" for i in range(5)] + w[40:50])
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3), (4, "short text")],
        "doc_id long, text string",
    )
    rows = dedup.duplicated_spans(df, "doc_id", "text", k=8, min_tokens=16).collect()
    assert [(r.doc_a, r.doc_b, r.start_a, r.start_b, r.n_tokens) for r in rows] == [
        (1, 2, 11, 11, 20)
    ]
    # the maximal span is reported ONCE (islands merge), not as sub-spans;
    # lowering min_tokens surfaces the 10-token doc1/doc3 overlap too
    rows10 = dedup.duplicated_spans(df, "doc_id", "text", k=8, min_tokens=10).collect()
    got = sorted((r.doc_a, r.doc_b, r.start_a, r.start_b, r.n_tokens) for r in rows10)
    assert got == [(1, 2, 11, 11, 20), (1, 3, 41, 6, 10)]


def test_duplicated_spans_stop_gram_cap(spark):
    # a gram appearing in max_df+ docs is pruned: no pairs survive
    text = " ".join(f"t{i}" for i in range(8))
    df = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )
    assert dedup.duplicated_spans(df, "doc_id", "text", k=8, min_tokens=8, max_df=4).collect() == []
    # under the cap the clique of identical docs pairs up fully
    assert (
        dedup.duplicated_spans(df, "doc_id", "text", k=8, min_tokens=8, max_df=5).count()
        == 10
    )


def test_strip_dup_spans_planted_window(spark):
    # same corpus as the detector test: doc2 carries tokens 11..30 of doc1
    # (20 tokens) — keep-first strips them from doc2 ONLY; doc1/3/4 are
    # untouched; the null-text doc is excluded entirely
    w = [f"w{i}" for i in range(50)]
    doc1 = " ".join(w)
    pre = [f"x{i}" for i in range(10)]
    post = [f"y{i}" for i in range(10)]
    doc2 = " ".join(pre + w[10:30] + post)
    doc3 = " ".join([f"z{i}" for i in range(5)] + w[40:50])
    df = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, doc3), (4, "short text"), (5, None)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in dedup.strip_dup_spans(df, "doc_id", "text", k=8, min_tokens=16)
        .withColumn("clean", F.col("text_clean"))
        .collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert (out[1].n_tokens, out[1].n_removed) == (50, 0)
    assert out[1].clean == doc1
    assert (out[2].n_tokens, out[2].n_removed) == (40, 20)
    assert out[2].clean == " ".join(pre + post)
    assert out[3].n_removed == 0 and out[4].n_removed == 0


def test_strip_dup_spans_overlap_union_and_chain(spark):
    # doc3 duplicates doc1 at positions 1..25 and doc2 at 16..40: the two
    # removal ranges MERGE (union, not double-count) → 40 removed, tail
    # s40..s49 survives. doc1↔doc2 share only 10 tokens (< min) → doc2 whole.
    s = [f"s{i}" for i in range(50)]
    df = spark.createDataFrame(
        [(1, " ".join(s[0:25])), (2, " ".join(s[15:40])), (3, " ".join(s))],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup.strip_dup_spans(df, "doc_id", "text").collect()}
    assert (out[1].n_removed, out[2].n_removed) == (0, 0)
    assert (out[3].n_tokens, out[3].n_removed) == (50, 40)
    assert out[3].text_clean == " ".join(s[40:50])


def test_strip_dup_spans_identical_clique_keeps_lowest(spark):
    # N identical docs: exactly the lowest id keeps its text; the others
    # strip to empty (ranges from multiple doc_a's collapse to one union)
    text = " ".join(f"t{i}" for i in range(20))
    df = spark.createDataFrame([(i, text) for i in (7, 3, 9)], "doc_id long, text string")
    out = {r.doc_id: r for r in dedup.strip_dup_spans(df, "doc_id", "text").collect()}
    assert out[3].n_removed == 0 and out[3].text_clean == text
    for i in (7, 9):
        assert out[i].n_removed == 20 and out[i].text_clean == ""


def test_prefix_jaccard_equals_all_token_plan(spark, corpus):
    # the prefix-filtering lemma, empirically: bit-identical output to the
    # all-token posting-list plan at several thresholds (incl. ones where
    # threshold*n lands exactly on an integer — the ceil-epsilon edge)
    for t in (0.5, 0.7, 0.8):
        ref = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(
                corpus, "doc_id", "text", k=3, threshold=t
            ).collect()
        )
        got = sorted(
            (r.doc_a, r.doc_b, r.jaccard)
            for r in dedup.prefix_jaccard_pairs(
                corpus, "doc_id", "text", k=3, threshold=t
            ).collect()
        )
        assert got == ref, t
    assert ref  # the 0.8 pass still finds the exact-dup cluster


def test_prefix_jaccard_wide_corpus_equivalence(spark):
    # larger deterministic corpus with overlapping sentence templates so
    # candidate pruning actually has work to do (shared common shingles,
    # rare discriminating ones)
    common = "data validation at scale needs exact answers under skew"
    rows = [
        (i, f"{common} variant {i % 7} tail token{i % 3} more shared words here")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string").repartition(8)
    ref = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.6).collect()
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.prefix_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.6).collect()
    )
    assert got == ref and len(ref) > 0


def test_edit_similarity_pairs_sequence_aware(spark):
    # docs 1/2: one-word edit → high edit sim; docs 1/3: same shingle
    # VOCABULARY reshuffled → Jaccard-style candidates but low edit sim
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    shuffled = "eta theta iota kappa alpha beta gamma delta epsilon zeta"
    rows = [(1, base), (2, base.replace("delta", "delXa")), (3, shuffled)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.edit_sim
        for r in dedup.edit_similarity_pairs(
            df, "doc_id", "text", k=1, candidate_threshold=0.3, threshold=0.9
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 0.9
    assert (1, 3) not in got and (2, 3) not in got  # order matters
    # exact value: 1 char substitution (delta→delXa) over the 56 chars
    assert got[(1, 2)] == round(1.0 - 1 / len(base), 6)


def _crawl_docs(spark, prefix, n, clone_of=None):
    from pyspark.sql import functions as F

    base = spark.range(0, n).select(
        (F.col("id") + (clone_of or 0)).alias("seed"),
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("doc_id"),
    )
    return base.select(
        "doc_id",
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta token"),
            (F.col("seed") % 7).cast("string"),
            F.lit(" eta theta iota kappa word"),
            F.col("seed").cast("string"),
        ).alias("text"),
    )


def test_minhash_index_matches_cross_pairs(spark, tmp_path):
    from gbif_data_validator_spark.operators.dedup import (
        dedup_vs_index,
        minhash_lsh_cross_pairs,
        write_minhash_index,
    )

    old = _crawl_docs(spark, "old-", 40)
    # new crawl: 10 exact clones of old docs + 10 fresh docs
    new = _crawl_docs(spark, "new-", 10).unionByName(
        _crawl_docs(spark, "newc-", 10, clone_of=100)
    )
    path = str(tmp_path / "idx")
    write_minhash_index(old, path, "doc_id", "text")
    got = sorted(
        (r.new_id, r.index_id, r.est_jaccard)
        for r in dedup_vs_index(new, path, "doc_id", "text").collect()
    )
    want = sorted(
        (r.left_id, r.right_id, r.est_jaccard)
        for r in minhash_lsh_cross_pairs(new, old, "doc_id", "text").collect()
    )
    assert got == want and len(got) > 0


def test_minhash_index_append_equals_one_shot(spark, tmp_path):
    from gbif_data_validator_spark.operators.dedup import (
        dedup_vs_index,
        write_minhash_index,
    )
    from pyspark.sql import functions as F

    old = _crawl_docs(spark, "old-", 30)
    new = _crawl_docs(spark, "new-", 8)

    whole = str(tmp_path / "whole")
    write_minhash_index(old, whole, "doc_id", "text")
    split = str(tmp_path / "split")
    write_minhash_index(old.where(F.col("doc_id") < "old-2"), split, "doc_id", "text")
    write_minhash_index(old.where(F.col("doc_id") >= "old-2"), split, "doc_id", "text")

    a = sorted(map(tuple, dedup_vs_index(new, whole, "doc_id", "text").collect()))
    b = sorted(map(tuple, dedup_vs_index(new, split, "doc_id", "text").collect()))
    assert a == b


def test_minhash_index_param_mismatch_raises(spark, tmp_path):
    import pytest as _pytest

    from gbif_data_validator_spark.operators.dedup import write_minhash_index

    old = _crawl_docs(spark, "old-", 5)
    path = str(tmp_path / "idx2")
    write_minhash_index(old, path, "doc_id", "text", n_bands=16)
    with _pytest.raises(ValueError, match="refusing"):
        write_minhash_index(old, path, "doc_id", "text", n_bands=8)


# -- corpus k-gram novelty census --------------------------------------------


def test_ngram_novelty_hand_counts(spark):
    # doc A: 10 tokens -> 3 8-grams; doc B identical -> same 3 grams again;
    # doc C: 8 distinct tokens -> 1 unique 8-gram; doc D: 7 tokens -> none.
    a = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, "u1 u2 u3 u4 u5 u6 u7 u8"), (4, "v1 v2 v3 v4 v5 v6 v7")],
        schema="doc_id long, text string",
    )
    row = dedup.ngram_novelty(df, "text", k=8).collect()
    assert len(row) == 1
    r = row[0]
    assert (r.total_grams, r.distinct_grams, r.dup_grams) == (7, 4, 3)
    assert r.dup_rate_ppm == int(1e6 * 3 / 7)  # floor semantics


def test_ngram_novelty_grouped_and_partition_invariant(spark):
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    df = spark.createDataFrame(
        [(i, a if i % 2 else a + " extra", "en" if i < 6 else "fr") for i in range(10)],
        schema="doc_id long, text string, lang string",
    )
    out1 = {
        tuple(r)
        for r in dedup.ngram_novelty(df, "text", k=8, group_cols=["lang"]).collect()
    }
    out2 = {
        tuple(r)
        for r in dedup.ngram_novelty(
            df.repartition(7, "doc_id"), "text", k=8, group_cols=["lang"]
        ).collect()
    }
    assert out1 == out2
    assert {r[0] for r in out1} == {"en", "fr"}


def test_ngram_novelty_plan_two_exchanges_no_join(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h", "en")], "doc_id long, text string, lang string"
    )
    plan = (
        dedup.ngram_novelty(df, "text", k=8, group_cols=["lang"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 2  # gram agg + group agg


# --------------------------------------------------------------------------
# Weighted (multiset) Jaccard
# --------------------------------------------------------------------------


def test_shingle_tf_run_length_counts(spark):
    """tf map matches a hand count, including a repeated shingle."""
    df = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    row = df.select(dedup.shingle_tf(F.col("text"), k=2).alias("tfs")).first()
    got = {t["g"]: t["tf"] for t in row.tfs}
    # bigrams: ab ba ab ba ab → {"a b": 3, "b a": 2}
    assert got == {"a b": 3, "b a": 2}


def test_shingle_tf_short_text_empty(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    row = df.select(dedup.shingle_tf(F.col("text"), k=3).alias("tfs")).first()
    assert row.tfs == []


def test_weighted_jaccard_exact_value(spark):
    """Hand-computed multiset Jaccard: repetition changes the score where
    set Jaccard saturates at 1.0."""
    df = spark.createDataFrame(
        [(1, "x y " * 6), (2, "x y " * 2)], "doc_id long, text string"
    )
    # k=2 grams doc1: xy*6? words: x y x y ... bigrams "x y"×6 "y x"×5 (11 total)
    # doc2: "x y"×2 "y x"×1 (3 total). s_min = min(6,2)+min(5,1) = 3
    # wj = 3 / (11 + 3 - 3) = 3/11
    rows = dedup.weighted_jaccard_pairs(df, "doc_id", "text", k=2, threshold=0.1).collect()
    assert len(rows) == 1
    assert rows[0].wjaccard == round(3 / 11, 6)
    # set Jaccard would be 1.0 — identical shingle SETS
    set_rows = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=2, threshold=0.9).collect()
    assert len(set_rows) == 1 and set_rows[0].jaccard == 1.0


def test_weighted_jaccard_matches_python_reference(spark, corpus):
    import collections
    import re

    got = {
        (r.doc_a, r.doc_b): r.wjaccard
        for r in dedup.weighted_jaccard_pairs(
            corpus, "doc_id", "text", k=3, threshold=0.05
        ).collect()
    }

    def tf(text, k=3):
        w = re.split(r"\s+", text.strip().lower())
        return collections.Counter(
            " ".join(w[i : i + k]) for i in range(len(w) - k + 1)
        )

    docs = {r.doc_id: tf(r.text) for r in corpus.collect()}
    ids = sorted(docs)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ta, tb = docs[a], docs[b]
            s_min = sum(min(ta[g], tb[g]) for g in ta.keys() & tb.keys())
            if not s_min:
                continue
            j = s_min / (sum(ta.values()) + sum(tb.values()) - s_min)
            if j >= 0.05:
                exp[(a, b)] = round(j, 6)
    assert got == exp


def test_weighted_jaccard_max_df_prunes(spark):
    """A shingle present in > max_df docs posts nothing — the skew cap."""
    rows = [(i, "common gram here") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert (
        dedup.weighted_jaccard_pairs(
            df, "doc_id", "text", k=3, threshold=0.1, max_df=3
        ).count()
        == 0
    )


# --------------------------------------------------------------------------
# Incremental connected components
# --------------------------------------------------------------------------


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_merge_clusters_equals_full_recompute(spark):
    """Batch 2 merges two previously separate clusters AND introduces a
    brand-new one; merged labeling == clustering the union from scratch."""
    batch1 = [(1, 2), (2, 3), (10, 11), (20, 21)]
    batch2 = [(3, 10), (30, 31), (31, 32)]
    labels1 = dedup.duplicate_clusters(_pairs_df(spark, batch1))
    merged = {
        (r.doc_id, r.cluster_id)
        for r in dedup.merge_clusters(labels1, _pairs_df(spark, batch2)).collect()
    }
    full = {
        (r.doc_id, r.cluster_id)
        for r in dedup.duplicate_clusters(_pairs_df(spark, batch1 + batch2)).collect()
    }
    assert merged == full
    # the bridged component is labeled by the GLOBAL min id
    assert (11, 1) in merged and (30, 30) in merged and (32, 30) in merged


def test_merge_clusters_new_min_relabels_hub(spark):
    """A new doc with a SMALLER id than an existing hub takes over the
    label — the case a naive 'attach to old label' merge gets wrong."""
    labels1 = dedup.duplicate_clusters(_pairs_df(spark, [(5, 6)]))
    merged = {
        (r.doc_id, r.cluster_id)
        for r in dedup.merge_clusters(labels1, _pairs_df(spark, [(1, 6)])).collect()
    }
    assert merged == {(1, 1), (5, 1), (6, 1)}


def test_merge_clusters_empty_batch_is_identity(spark):
    labels1 = dedup.duplicate_clusters(_pairs_df(spark, [(1, 2), (3, 4)]))
    empty = _pairs_df(spark, []).limit(0)
    merged = {
        (r.doc_id, r.cluster_id)
        for r in dedup.merge_clusters(labels1, empty).collect()
    }
    assert merged == {(1, 1), (2, 1), (3, 3), (4, 3)}


def test_threshold_sweep_hand_counts(spark):
    """Two docs at jaccard exactly 0.5, one pair at 1.0: grid rows land
    exactly (integer comparison, no IEEE boundary)."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "a b c d")],
        "doc_id long, text string",
    )
    got = {
        r.threshold_pct: (r.n_pairs, r.n_docs)
        for r in dedup.dedup_threshold_sweep(
            df, "doc_id", "text", k=2, thresholds_pct=(40, 50, 60, 100)
        ).collect()
    }
    # pairs: (1,3) j=1.0; (1,2) j=0.5; (2,3) j=0.5
    assert got[40] == (3, 3)
    assert got[50] == (3, 3)   # >= 0.5 exactly clears 50
    assert got[60] == (1, 2)
    assert got[100] == (1, 2)


def test_threshold_sweep_empty_grid_rows(spark):
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "p q r s")], "doc_id long, text string"
    )
    rows = dedup.dedup_threshold_sweep(
        df, "doc_id", "text", k=2, thresholds_pct=(50,)
    ).collect()
    assert [(r.threshold_pct, r.n_pairs, r.n_docs) for r in rows] == [(50, 0, 0)]


# --------------------------------------------------------------------------
# Weighted MinHash LSH
# --------------------------------------------------------------------------


def test_weighted_minhash_discriminates_repetition(spark):
    """Identical shingle SETS, very different multiset mass: set LSH pairs
    them at est 1.0; weighted LSH scores them near the true J_w ≈ 0.27."""
    df = spark.createDataFrame(
        [(1, "x y " * 40), (2, "x y " * 4)], "doc_id long, text string"
    )
    set_pairs = dedup.minhash_lsh_pairs(
        df, "doc_id", "text", k=2, threshold=0.9
    ).collect()
    assert len(set_pairs) == 1 and set_pairs[0].est_jaccard == 1.0
    w_pairs = dedup.weighted_minhash_lsh_pairs(
        df, "doc_id", "text", k=2, threshold=0.5
    ).collect()
    assert w_pairs == []  # J_w ≈ (7+6)/(79+78-13) ≈ 0.09 — far below 0.5


def test_weighted_minhash_estimates_weighted_jaccard(spark):
    """Near-identical multisets: estimate lands within MinHash tolerance
    of the exact weighted Jaccard from weighted_jaccard_pairs."""
    base = "alpha beta gamma delta " * 20
    df = spark.createDataFrame(
        [(1, base), (2, base + "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    exact = dedup.weighted_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.1
    ).first()
    est = dedup.weighted_minhash_lsh_pairs(
        df, "doc_id", "text", k=3, n_hashes=128, n_bands=32, threshold=0.1
    ).first()
    assert est is not None
    assert abs(est.est_wjaccard - exact.wjaccard) < 0.15


def test_weighted_minhash_exact_dup_is_certain(spark):
    df = spark.createDataFrame(
        [(1, "p q r s t u " * 10), (2, "p q r s t u " * 10)],
        "doc_id long, text string",
    )
    rows = dedup.weighted_minhash_lsh_pairs(
        df, "doc_id", "text", k=3, threshold=0.9
    ).collect()
    assert len(rows) == 1 and rows[0].est_wjaccard == 1.0


def test_bucketed_minhash_index_drops_index_exchange(spark, tmp_path):
    """The bucketed-layout upgrade the index docstring promises: same
    probe results as the flat layout, with the index-side Exchange gone
    (its groupBy and the probe join read co-located buckets)."""
    from gbif_data_validator_spark.operators.dedup import (
        dedup_vs_index,
        write_minhash_index,
    )

    old = _crawl_docs(spark, "old-", 40)
    new = _crawl_docs(spark, "new-", 10).unionByName(
        _crawl_docs(spark, "newc-", 10, clone_of=100)
    )
    flat = str(tmp_path / "flat")
    write_minhash_index(old, flat, "doc_id", "text")
    bucketed = str(tmp_path / "bucketed")
    spark.sql("DROP TABLE IF EXISTS mh_idx_test")
    write_minhash_index(
        old, bucketed, "doc_id", "text",
        storage_buckets=8, table="mh_idx_test", mode="overwrite",
    )

    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q_flat = dedup_vs_index(new, flat, "doc_id", "text")
        q_bkt = dedup_vs_index(new, bucketed, "doc_id", "text")
        p_flat = q_flat._jdf.queryExecution().executedPlan().toString()
        p_bkt = q_bkt._jdf.queryExecution().executedPlan().toString()
        assert p_bkt.count("Exchange") == p_flat.count("Exchange") - 1, (
            p_flat, p_bkt,
        )
        got_flat = sorted(map(tuple, q_flat.collect()))
        got_bkt = sorted(map(tuple, q_bkt.collect()))
        assert got_flat == got_bkt and len(got_bkt) > 0
    finally:
        if saved is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql("DROP TABLE IF EXISTS mh_idx_test")


def test_bucketed_minhash_index_append_accumulates(spark, tmp_path):
    from gbif_data_validator_spark.operators.dedup import (
        dedup_vs_index,
        write_minhash_index,
    )

    old = _crawl_docs(spark, "old-", 40)
    new = _crawl_docs(spark, "newc-", 10, clone_of=100)
    path = str(tmp_path / "bidx")
    spark.sql("DROP TABLE IF EXISTS mh_idx_append")
    write_minhash_index(
        old.where(F.col("doc_id") < "old-2"), path, "doc_id", "text",
        storage_buckets=8, table="mh_idx_append",
    )
    write_minhash_index(
        old.where(F.col("doc_id") >= "old-2"), path, "doc_id", "text",
        storage_buckets=8, table="mh_idx_append",
    )
    flat = str(tmp_path / "fidx")
    write_minhash_index(old, flat, "doc_id", "text")
    a = sorted(map(tuple, dedup_vs_index(new, path, "doc_id", "text").collect()))
    b = sorted(map(tuple, dedup_vs_index(new, flat, "doc_id", "text").collect()))
    assert a == b and len(a) > 0
    spark.sql("DROP TABLE IF EXISTS mh_idx_append")


def test_lsh_recall_pin(spark, corpus):
    """Recall measured on the crafted corpus: the clone triangle (1,2,3)
    plus each clone × the near-dup 4 → 6 exact pairs at ≥0.5; the LSH
    probe finds the clones certainly."""
    row = dedup.lsh_recall_vs_exact(corpus, "doc_id", "text", k=3, threshold=0.5).first()
    assert row.n_exact == 6
    assert 0 < row.n_found <= row.n_exact
    assert row.recall_micro == (row.n_found * 1_000_000) // row.n_exact


def test_lsh_recall_empty_corpus_null_recall(spark):
    df = spark.createDataFrame([(1, "too short")], "doc_id long, text string")
    row = dedup.lsh_recall_vs_exact(df, "doc_id", "text", k=3).first()
    assert row.n_exact == 0 and row.n_found == 0 and row.recall_micro is None


def test_dedup_weights_integer_exact(spark):
    labels = dedup.duplicate_clusters(
        _pairs_df(spark, [(1, 2), (2, 3), (10, 11)])
    )
    got = {
        r.doc_id: (r.cluster_id, r.n_members, r.weight_micro)
        for r in dedup.dedup_weights(labels).collect()
    }
    assert got[1] == (1, 3, 333_333) and got[2] == (1, 3, 333_333)
    assert got[3] == (1, 3, 333_333)
    assert got[10] == (10, 2, 500_000) and got[11] == (10, 2, 500_000)
    # total weight per cluster ≈ one document's worth (floor'd)
    assert sum(v[2] for v in got.values() if v[0] == 1) == 999_999


def test_listing_faces_bounded_ids_hot_fingerprint(spark):
    """The capped listing discipline: a fingerprint shared by many docs
    keeps only the first max_ids (sorted) ids in the output array while
    n_docs stays the TRUE count and ids_truncated flags the clip — and
    the clip happens BEFORE the aggregation (rank filter), so reducer
    state is bounded at any group size."""
    hot = "the exact same boilerplate page content repeated across the whole site"
    rows = [(i, hot) for i in range(1, 51)] + [(100, "one unique document here")]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = dedup.exact_duplicate_groups(df, "doc_id", "text", max_ids=5).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 50 and r.ids_truncated is True
    assert r.doc_ids == [1, 2, 3, 4, 5]
    # under the cap: full list, not truncated
    out2 = dedup.exact_duplicate_groups(df, "doc_id", "text", max_ids=100).collect()
    assert out2[0].n_docs == 50 and out2[0].ids_truncated is False
    assert out2[0].doc_ids == list(range(1, 51))
    # the plan clips pre-agg: the collect_list input is the rank-gated
    # conditional, so no unconditional corpus-sized array aggregate exists
    plan = dedup.exact_duplicate_groups(
        df, "doc_id", "text", max_ids=5
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in plan


def test_paragraph_census_bounded_ids(spark):
    from gbif_data_validator_spark.operators.dedup import paragraph_duplicate_groups

    boiler = "subscribe to our newsletter for the latest updates and exclusive offers"
    rows = [(i, f"unique intro {i}\n\n{boiler}\n\nbody {i} padded to be long enough indeed")
            for i in range(1, 11)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = paragraph_duplicate_groups(df, "doc_id", "text", min_chars=40, max_ids=4).collect()
    shared = [r for r in out if r.n_docs == 10]
    assert len(shared) == 1
    assert shared[0].doc_ids == [1, 2, 3, 4] and shared[0].ids_truncated is True


def test_minhash_pair_budget_bounds_and_censuses(spark):
    """Round-5 max_pairs budget: a corpus with one boilerplate template
    group (big buckets in every band) plus genuinely-near pairs — a tight
    budget keeps the small buckets' pairs, drops the template buckets,
    and the budget census accounts for every dropped pair; an ample
    budget is a no-op vs the uncapped plan."""
    from gbif_data_validator_spark.operators.dedup import (
        minhash_lsh_budget_dropped,
        minhash_lsh_pairs,
        weighted_minhash_budget_dropped,
        weighted_minhash_lsh_pairs,
    )

    template = "the quick brown fox jumps over the lazy dog again and again "
    rows = [(i, template * 4) for i in range(12)]           # 12-doc clone set
    rows += [(100, "alpha beta gamma delta epsilon zeta eta theta"),
             (101, "alpha beta gamma delta epsilon zeta eta iota")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    full = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5)
    ample = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5,
                              max_pairs=10_000_000)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, ample.collect()))

    # tight budget: the 12-doc template buckets (66 pairs per band) blow
    # it; the 2-doc buckets survive (cut floor 2)
    tight = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5,
                              max_pairs=40)
    got = {(r.doc_a, r.doc_b) for r in tight.collect()}
    assert (100, 101) in got
    assert not any(a < 100 and b < 100 for a, b in got)
    census = minhash_lsh_budget_dropped(df, "doc_id", "text", max_pairs=40)
    crows = census.collect()
    assert crows and all(r.n_docs == 12 and r.n_pairs == 66 for r in crows)

    # weighted flavor: same contract
    wt = weighted_minhash_lsh_pairs(df, "doc_id", "text", threshold=0.5,
                                    max_pairs=40)
    wgot = {(r.doc_a, r.doc_b) for r in wt.collect()}
    assert not any(a < 100 and b < 100 for a, b in wgot)
    wcensus = weighted_minhash_budget_dropped(
        df, "doc_id", "text", max_pairs=40).collect()
    assert wcensus and all(r.n_pairs == 66 for r in wcensus)
