"""Similarity search: brute-force exact top-k vs DuckDB-style oracle
semantics, and LSH ANN recall against the exact baseline."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.similarity import brute_force_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 8)


def test_brute_force_topk_shape(spark, emb, queries):
    out = brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(8))
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        # scores non-increasing, no self matches
        scores = [r.cosine for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r.neighbor_id != qid for r in rows)


def test_brute_force_matches_numpy(spark, emb, queries):
    import numpy as np

    data = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    out = brute_force_topk(emb, queries, k=3).collect()
    for qid in range(8):
        qv = data[qid]
        sims = {
            i: float(np.dot(qv, v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
            for i, v in data.items()
            if i != qid
        }
        expect = sorted(sims.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:3]
        got = sorted(
            [(r.neighbor_id, r.cosine) for r in out if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert [e[0] for e in expect] == [g[0] for g in got]
        for (_, se), (_, sg) in zip(expect, got):
            assert abs(se - sg) < 1e-5


def test_lsh_shape_on_real_embeddings(spark, emb, queries):
    """The testdata embeddings are near-random (max cosine ≈ 0.3), so recall
    isn't meaningful there — assert the contract: ranked, bounded, no self."""
    ann = lsh_topk(emb, queries, dim=64, k=5, n_planes=6, multiprobe=3).collect()
    assert len(ann) > 0
    assert all(-1.0 <= r.cosine <= 1.0 and r.neighbor_id != r.query_id for r in ann)


def test_lsh_recall_on_planted_clusters(spark):
    """Planted-neighbor recall: 30 clusters × 8 near-identical vectors; a
    query's true top-k are its cluster mates and LSH must find them (they
    share the bucket with overwhelming probability)."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim, n_clusters, per = 64, 30, 8
    rows = []
    for c in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for j in range(per):
            v = center + 0.01 * rng.standard_normal(dim)
            rows.append((c * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    queries = df.where(F.col("vec_id") % per == 0)  # one query per cluster

    k = per - 1
    exact = brute_force_topk(df, queries, k=k).collect()
    # multiprobe=8 probes every 1-bit-flip neighbor bucket (full 1-Hamming ball)
    ann = lsh_topk(df, queries, dim=dim, k=k, n_planes=8, multiprobe=8).collect()
    exact_sets, ann_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in ann:
        ann_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact_sets[q] & ann_sets.get(q, set())) / k for q in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.9
    # exact top-k of a cluster query are exactly its cluster mates
    for q, s in exact_sets.items():
        assert s == {q + j for j in range(1, per)}


def test_ivf_shape_on_real_embeddings(spark, emb, queries):
    from gbif_data_validator_spark.operators.similarity import ivf_topk

    ann = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3).collect()
    assert len(ann) > 0
    assert all(-1.0 <= r.cosine <= 1.0 and r.neighbor_id != r.query_id for r in ann)
    by_q = {}
    for r in ann:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(ranks) == list(range(1, len(ranks) + 1)) for ranks in by_q.values())


def test_ivf_recall_on_planted_clusters(spark):
    """Same planted-cluster protocol as LSH: a query's cluster mates live in
    its own k-means list, so probing the nearest lists must recover them."""
    import numpy as np

    from gbif_data_validator_spark.operators.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(11)
    dim, n_clusters, per = 64, 20, 8
    rows = []
    for c in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for j in range(per):
            v = center + 0.01 * rng.standard_normal(dim)
            rows.append((c * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    qs = df.where(F.col("vec_id") % per == 0)
    k = per - 1
    exact = brute_force_topk(df, qs, k=k).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    ann = ivf_topk(df, qs, k=k, n_lists=10, n_probe=3).collect()
    ann_sets = {}
    for r in ann:
        ann_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact_sets[q] & ann_sets.get(q, set())) / k for q in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.9


# -- semantic dedup (SemDeDup) ----------------------------------------------


@pytest.fixture(scope="module")
def clustered_vecs(spark):
    """Two tight clusters + isolated points: ids 0-2 are near-identical
    around (1,0,...), ids 10-11 near-identical around (0,1,...), 20/21
    far from everything (and each other)."""
    import numpy as np

    rng = np.random.RandomState(7)
    dim = 8

    def around(base, eps):
        v = np.array(base, dtype=float) + rng.standard_normal(dim) * eps
        return [float(x) for x in v]

    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = (
        [(i, around(e1, 0.01)) for i in range(3)]
        + [(10 + i, around(e2, 0.01)) for i in range(2)]
        + [(20, [float(x) for x in rng.standard_normal(dim)]),
           (21, [float(x) for x in rng.standard_normal(dim)])]
    )
    return spark.createDataFrame(rows, schema="vec_id long, embedding array<double>")


def test_semantic_dup_pairs_finds_tight_clusters(spark, clustered_vecs):
    from gbif_data_validator_spark.operators.similarity import semantic_dup_pairs

    pairs = semantic_dup_pairs(
        clustered_vecs, n_clusters=4, threshold=0.95
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert {(0, 1), (0, 2), (1, 2), (10, 11)} <= got
    assert all(a < b for a, b in got)
    assert not any(20 in p or 21 in p for p in got)
    assert all(r.cosine >= 0.95 for r in pairs)


def test_semantic_dedup_survivors(spark, clustered_vecs):
    from gbif_data_validator_spark.operators.similarity import semantic_dedup

    kept = sorted(
        r.vec_id for r in semantic_dedup(
            clustered_vecs, n_clusters=4, threshold=0.95
        ).collect()
    )
    # one representative (min id) per tight cluster; isolated points kept
    assert kept == [0, 10, 20, 21]


def test_semantic_cluster_cap_is_loud(spark, clustered_vecs):
    from gbif_data_validator_spark.operators.similarity import (
        semantic_dropped_clusters,
        semantic_dup_pairs,
    )

    # cap of 2 drops the 3-doc cluster: its pairs disappear from the scan
    pairs = semantic_dup_pairs(
        clustered_vecs, n_clusters=4, threshold=0.95, max_cluster=2
    ).collect()
    assert not any(r.doc_a in (0, 1, 2) for r in pairs)
    dropped = semantic_dropped_clusters(
        clustered_vecs, n_clusters=4, max_cluster=2
    ).collect()
    assert len(dropped) == 1 and dropped[0].n_docs == 3


def test_pq_codebooks_deterministic_and_shaped(spark, emb):
    from gbif_data_validator_spark.operators.similarity import train_pq_codebooks

    cb1 = train_pq_codebooks(emb, "embedding", dim=64, m=8, k_codes=16)
    cb2 = train_pq_codebooks(emb, "embedding", dim=64, m=8, k_codes=16)
    assert cb1.shape == (8, 16, 8)
    assert (cb1 == cb2).all()  # seeded numpy Lloyd — bit-reproducible


def test_pq_encode_compresses(spark, emb):
    from gbif_data_validator_spark.operators.similarity import (
        pq_encode_udf,
        train_pq_codebooks,
    )
    from pyspark.sql import functions as F

    cb = train_pq_codebooks(emb, "embedding", dim=64, m=8, k_codes=16)
    codes = emb.select(pq_encode_udf(cb)(F.col("embedding")).alias("c")).collect()
    assert all(len(r.c) == 8 for r in codes)  # 64 floats -> 8 small ints
    assert all(0 <= v < 16 for r in codes for v in r.c)


def test_pq_ivf_shape_on_real_embeddings(spark, emb, queries):
    from gbif_data_validator_spark.operators.similarity import pq_ivf_topk

    ann = pq_ivf_topk(emb, queries, dim=64, k=5, n_lists=8, n_probe=4).collect()
    assert len(ann) > 0
    assert all(r.neighbor_id != r.query_id for r in ann)
    by_q = {}
    for r in ann:
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(ranks) == list(range(1, len(ranks) + 1)) for ranks in by_q.values())


def test_pq_ivf_recall_on_planted_clusters(spark):
    """Cluster mates quantize to (near-)identical codes, so ADC ranks them
    ahead of other clusters; recall vs the exact baseline must stay high."""
    import numpy as np

    from gbif_data_validator_spark.operators.similarity import pq_ivf_topk

    rng = np.random.RandomState(11)
    dim, n_clusters, per = 64, 20, 8
    rows = []
    for c in range(n_clusters):
        center = rng.standard_normal(dim)
        center /= np.linalg.norm(center)
        for j in range(per):
            v = center + 0.01 * rng.standard_normal(dim)
            rows.append((c * per + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    qs = df.where(F.col("vec_id") % per == 0)

    k = per - 1
    exact = brute_force_topk(df, qs, k=k).collect()
    ann = pq_ivf_topk(df, qs, dim=dim, k=k, n_lists=8, n_probe=4, m=8, k_codes=32).collect()
    exact_sets, ann_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in ann:
        ann_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(exact_sets[q] & ann_sets.get(q, set())) / k for q in exact_sets]
    assert sum(recalls) / len(recalls) >= 0.9


def test_det_lsh_recall_report(spark):
    """Deterministic LSH recall: engine-portable buckets (the DuckDB
    oracle reproduces them), multiprobe never hurts recall, and the
    report's counters are internally consistent."""
    from gbif_data_validator_spark.operators.similarity import lsh_recall_report

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8)
    probe = lsh_recall_report(emb, q, dim=64, k=5, n_planes=4, multiprobe=1)
    single = lsh_recall_report(emb, q, dim=64, k=5, n_planes=4, multiprobe=0)
    p = {r.query_id: r for r in probe.collect()}
    s = {r.query_id: r for r in single.collect()}
    assert set(p) == set(s) and len(p) == 8
    for qid in p:
        assert 0 <= p[qid].n_hit <= p[qid].n_ann <= 5
        assert p[qid].recall == p[qid].n_hit / 5.0
        # probing adjacent buckets can only add candidates
        assert p[qid].n_hit >= s[qid].n_hit
    # determinism: a second run is identical
    again = {r.query_id: tuple(r) for r in lsh_recall_report(emb, q, dim=64, k=5, n_planes=4).collect()}
    assert again == {k: tuple(v) for k, v in p.items()}


def test_det_lsh_cosine_pairs(spark):
    """Pairs are a SUBSET of brute-force pairs (bucketing only prunes,
    never invents), deterministic across evaluations, and the bucket cap
    drops everything when set below the bucket sizes."""
    import math

    from gbif_data_validator_spark.operators.dedup import embedding_cosine_pairs
    from gbif_data_validator_spark.operators.similarity import det_lsh_cosine_pairs

    rows = []
    for i in range(40):
        base = [math.sin(0.7 * i + j) for j in range(8)]
        rows.append((i, [float(x) for x in base]))
        rows.append((i + 100, [float(x * 1.01) for x in base]))  # near-dup twin
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    got = {
        (r.doc_a, r.doc_b)
        for r in det_lsh_cosine_pairs(
            df, "vec_id", "embedding", dim=8, n_planes=4, threshold=0.9
        ).collect()
    }
    brute = {
        (r.doc_a, r.doc_b)
        for r in embedding_cosine_pairs(df, "vec_id", "embedding", 0.9).collect()
    }
    assert got and got <= brute  # prunes, never invents
    # every scaled twin shares its original's bucket (same sign pattern)
    assert all((i, i + 100) in got for i in range(40) if (i, i + 100) in brute)
    assert got == {
        (r.doc_a, r.doc_b)
        for r in det_lsh_cosine_pairs(
            df, "vec_id", "embedding", dim=8, n_planes=4, threshold=0.9
        ).collect()
    }
    # cap: with max_bucket=1 every bucket (twins share one) is dropped
    assert det_lsh_cosine_pairs(
        df, "vec_id", "embedding", dim=8, n_planes=4, threshold=0.9, max_bucket=1
    ).count() == 0
