"""Similarity search over embedding columns: brute-force cosine top-k
(exact baseline) and hyperplane-LSH bucketed ANN (the scale path).

Scale design: brute force is a broadcast of the (small) query set against
the corpus — one narrow pass + a top-k window per query; correct but O(Q*N).
The LSH variant assigns every vector to sign-pattern buckets from R seeded
random hyperplanes; queries probe their own bucket (+ optional multi-probe
neighbors), so the join touches ~N/2^R of the corpus per query. At 10^12
rows the bucket assignment is a narrow map and the probe join shuffles only
bucket-matched candidates; recall is tunable via n_planes / multiprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from .dedup import cosine_sim


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: → (query_id, neighbor_id, cosine, rank).
    The query side is broadcast (small by contract); ties broken by
    neighbor_id for determinism. Self-matches excluded."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Hyperplane LSH
# --------------------------------------------------------------------------


def _plane_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def _bucket_series(vecs: pd.Series, dim: int, n_planes: int, seed: int) -> pd.Series:
    """Sign-pattern bucket id per vector — one matmul per Arrow batch."""
    planes = _plane_matrix(dim, n_planes, seed)
    weights = (1 << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs], dtype=np.float64)
    if len(mat) == 0:  # zero-row Arrow batch: (0,) @ planes.T would raise
        return pd.Series([], dtype="int64")
    signs = (mat @ planes.T) > 0  # (batch, n_planes)
    ids = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
    return pd.Series(ids.astype(np.int64))


def lsh_bucket_udf(dim: int, n_planes: int = 8, seed: int = 42):
    return F.pandas_udf(
        lambda s: _bucket_series(s, dim, n_planes, seed), returnType=LongType()
    )


def lsh_multi_bucket_udf(dim: int, n_planes: int, n_tables: int, seed: int = 42):
    """Bucket ids for ``n_tables`` independent hash tables in ONE pandas UDF
    call per Arrow batch: one matmul against a stacked
    (n_tables·n_planes, dim) plane matrix instead of n_tables separate
    UDF round-trips (each rebuilding its plane matrix and re-materializing
    the batch). Table t uses the same planes as ``lsh_bucket_udf(dim,
    n_planes, seed + t)`` so single- and multi-table paths agree."""
    import numpy as np

    planes = np.vstack(
        [_plane_matrix(dim, n_planes, seed + t) for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        signs = (mat @ planes.T) > 0  # (batch, n_tables*n_planes)
        per_table = signs.reshape(len(mat), n_tables, n_planes)
        ids = (per_table.astype(np.uint64) * weights[None, None, :]).sum(axis=2)
        return pd.Series([row.astype(np.int64).tolist() for row in ids])

    return F.pandas_udf(buckets, returnType="array<long>")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_train: int = 50_000,
) -> DataFrame:
    """IVF-style ANN: a k-means coarse quantizer (pyspark.ml KMeans, trained
    on a bounded sample) partitions the corpus into ``n_lists`` inverted
    lists; each query probes its ``n_probe`` nearest centroids and scores
    exact cosine only inside those lists — the join touches ~n_probe/n_lists
    of the corpus per query instead of all of it.

    Scale notes: training is over ≤``max_train`` sampled vectors (driver-
    side model, broadcast back as a literal centroid matrix inside a pandas
    UDF); list assignment is one narrow Arrow-batched pass; the probe join
    is an equi-join on list id, so Catalyst shuffles only bucket-matched
    candidates. Same output schema as brute_force_topk; recall < 1.0 by
    design (measured against the exact baseline in tests)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    n = train.count()
    if n > max_train:
        train = train.sample(fraction=max_train / n, seed=seed)
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(train)
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])  # (L, d)

    def assign_udf(n_nearest: int):
        """list ids of the n_nearest centroids per vector (euclidean, same
        metric KMeans optimizes) — vectorized over the Arrow batch."""

        def assign(vecs: pd.Series) -> pd.Series:
            mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
            if len(mat) == 0:
                return pd.Series([], dtype=object)
            # squared euclidean to every centroid: (B, L)
            d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            idx = np.argsort(d2, axis=1)[:, :n_nearest]
            return pd.Series([row.astype("int32").tolist() for row in idx])

        return F.pandas_udf(assign, returnType="array<int>")

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("list_id", F.element_at(assign_udf(1)(F.col("cv")), 1))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("list_id", F.explode(assign_udf(n_probe)(F.col("qv"))))

    scored = (
        F.broadcast(q)
        .join(c, on="list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """ANN top-k: probe the query's LSH bucket plus ``multiprobe`` 1-bit
    neighbor buckets. Returns the same schema as brute_force_topk; recall
    < 1.0 by design (measured in tests against the exact baseline)."""
    udf = lsh_bucket_udf(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("bucket", udf(F.col("cv")))

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("bucket0", udf(F.col("qv")))
    # multi-probe: flip each of the first `multiprobe` bits of the bucket id
    # (static shift amounts → driver-side loop of literal masks)
    probe_cols = [F.col("bucket0")] + [
        F.col("bucket0").bitwiseXOR(F.lit(1 << i)) for i in range(max(multiprobe, 0))
    ]
    probes = F.array_distinct(F.array(*probe_cols))
    q = F.broadcast(q.select("query_id", "qv", F.explode(probes).alias("bucket")))

    scored = (
        q.join(c, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
