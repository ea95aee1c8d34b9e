"""Corpus-overlap census: exact set algebra pinned against brute-force
Python sets, KMV sketches pinned by exact-when-small, tolerance-at-scale,
mergeability, and determinism properties."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.overlap import corpus_overlap, kmv_overlap


def _docs(spark, ids, prefix="doc"):
    return spark.createDataFrame(
        [(i, f"{prefix} text number {i}") for i in ids], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def overlapping(spark):
    # A = 0..299, B = 200..449  ->  common 100, union 450
    a = _docs(spark, range(0, 300))
    b = _docs(spark, range(200, 450))
    return a, b


def test_corpus_overlap_exact_counts(spark, overlapping):
    a, b = overlapping
    row = corpus_overlap(a, b).collect()[0]
    assert (row.n_a, row.n_b, row.n_common, row.n_union) == (300, 250, 100, 450)
    assert row.jaccard_micro == (1_000_000 * 100) // 450
    assert row.containment_a_micro == (1_000_000 * 100) // 300
    assert row.containment_b_micro == (1_000_000 * 100) // 250


def test_corpus_overlap_normalization_grain(spark):
    # case/whitespace variants are the SAME content (content_fingerprint)
    a = spark.createDataFrame([(1, "Hello   World")], "doc_id long, text string")
    b = spark.createDataFrame(
        [(2, "hello world"), (3, "other")], "doc_id long, text string"
    )
    row = corpus_overlap(a, b).collect()[0]
    assert (row.n_a, row.n_b, row.n_common, row.n_union) == (1, 2, 1, 2)


def test_corpus_overlap_null_text_excluded_and_disjoint(spark):
    a = spark.createDataFrame([(1, "alpha"), (2, None)], "doc_id long, text string")
    b = spark.createDataFrame([(3, "beta"), (4, None)], "doc_id long, text string")
    row = corpus_overlap(a, b).collect()[0]
    assert (row.n_a, row.n_b, row.n_common, row.n_union) == (1, 1, 0, 2)
    assert row.jaccard_micro == 0


def test_corpus_overlap_empty_side(spark):
    a = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    b = spark.createDataFrame([], "doc_id long, text string")
    row = corpus_overlap(a, b).collect()[0]
    assert (row.n_a, row.n_b, row.n_common, row.n_union) == (1, 0, 0, 1)
    assert row.containment_b_micro is None  # 0 denominator -> NULL, not crash


def test_corpus_overlap_plan_one_hash_exchange_no_join(spark, overlapping):
    a, b = overlapping
    plan = (
        corpus_overlap(a, b)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_kmv_exact_when_sets_fit_in_k(spark, overlapping):
    a, b = overlapping
    row = kmv_overlap(a, b, k=1024).collect()[0]
    # every sketch holds its whole set: all numbers are exact
    assert row.est_a == 300.0
    assert row.est_b == 250.0
    assert row.est_union == 450.0
    assert row.k_used == 450
    assert row.est_intersection == pytest.approx(100.0)
    assert row.est_jaccard_micro == (1_000_000 * 100) // 450


def test_kmv_tolerance_at_scale(spark):
    # |A|=6000, |B|=5000, common 2000, union 9000; k=512 -> se ~ 4.4%
    a = _docs(spark, range(0, 6000))
    b = _docs(spark, range(4000, 9000))
    row = kmv_overlap(a, b, k=512).collect()[0]
    assert row.est_a == pytest.approx(6000, rel=0.15)
    assert row.est_b == pytest.approx(5000, rel=0.15)
    assert row.est_union == pytest.approx(9000, rel=0.15)
    assert row.est_jaccard_micro / 1e6 == pytest.approx(2000 / 9000, abs=0.05)
    assert row.est_intersection == pytest.approx(2000, rel=0.30)


def test_kmv_union_sketch_merge_property(spark):
    # sketch(A union B) == union sketch built from sketch(A), sketch(B):
    # estimating (A u B) vs empty must reproduce est_union of (A, B)
    a = _docs(spark, range(0, 3000))
    b = _docs(spark, range(2000, 5000))
    both = a.unionByName(b)
    empty = spark.createDataFrame([], "doc_id long, text string")
    r_ab = kmv_overlap(a, b, k=256).collect()[0]
    r_u = kmv_overlap(both, empty, k=256).collect()[0]
    assert r_ab.est_union == r_u.est_a


def test_kmv_deterministic(spark, overlapping):
    a, b = overlapping
    r1 = kmv_overlap(a.repartition(7), b, k=128).collect()[0]
    r2 = kmv_overlap(a.repartition(2), b.repartition(5), k=128).collect()[0]
    assert r1 == r2


def test_kmv_rejects_tiny_k(spark, overlapping):
    a, b = overlapping
    with pytest.raises(ValueError):
        kmv_overlap(a, b, k=1)


def test_kmv_sketch_roundtrip_parity(spark, tmp_path):
    from gbif_data_validator_spark.operators.overlap import (
        kmv_overlap_vs_sketch,
        write_kmv_sketch,
    )

    a = _docs(spark, range(0, 3000))
    b = _docs(spark, range(2000, 5000))
    path = str(tmp_path / "sk_a")
    write_kmv_sketch(a, path, k=256)
    direct = kmv_overlap(a, b, k=256).collect()[0]
    via = kmv_overlap_vs_sketch(b, path).collect()[0]
    assert tuple(via) == tuple(direct)


def test_kmv_sketch_append_merges(spark, tmp_path):
    from gbif_data_validator_spark.operators.overlap import (
        kmv_overlap_vs_sketch,
        write_kmv_sketch,
    )

    shard1 = _docs(spark, range(0, 1500))
    shard2 = _docs(spark, range(1500, 3000))
    whole = _docs(spark, range(0, 3000))
    b = _docs(spark, range(2000, 5000))
    path = str(tmp_path / "sk_m")
    write_kmv_sketch(shard1, path, k=256)
    write_kmv_sketch(shard2, path, k=256, mode="append")
    merged = kmv_overlap_vs_sketch(b, path).collect()[0]
    direct = kmv_overlap(whole, b, k=256).collect()[0]
    assert tuple(merged) == tuple(direct)


def test_kmv_sketch_k_mismatch_refused(spark, tmp_path):
    from gbif_data_validator_spark.operators.overlap import write_kmv_sketch

    a = _docs(spark, range(0, 100))
    path = str(tmp_path / "sk_g")
    write_kmv_sketch(a, path, k=128)
    with pytest.raises(ValueError, match="refusing"):
        write_kmv_sketch(a, path, k=256, mode="append")


def test_kmv_md5_path_matches_xxhash_semantics(spark):
    """The engine-portable md5-prefix hash path (the oracle path) and the
    xxhash64 default must agree on the exact-regime outputs (below-k
    sketches are the set itself) and stay within sketch tolerance above
    k; unknown hash_fn refuses."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.overlap import kmv_overlap

    rows = [(i, f"doc number {i} with some shared words") for i in range(60)]
    a = spark.createDataFrame(rows[:40], "doc_id long, text string")
    b = spark.createDataFrame(rows[20:], "doc_id long, text string")
    # k above both set sizes: estimates are EXACT for both hash paths
    r_md5 = kmv_overlap(a, b, "text", k=128, hash_fn="md5").collect()[0]
    r_xx = kmv_overlap(a, b, "text", k=128).collect()[0]
    for r in (r_md5, r_xx):
        assert (r.est_a, r.est_b) == (40.0, 40.0)
        assert r.est_union == 60.0 and r.k_used == 60
        assert r.est_jaccard_micro == (1_000_000 * 20) // 60
    with _pytest.raises(ValueError, match="hash_fn"):
        kmv_overlap(a, b, "text", k=8, hash_fn="sha9000")
