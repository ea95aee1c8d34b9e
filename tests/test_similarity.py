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
