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
    signs = (mat @ planes.T) > 0  # (batch, n_planes)
    ids = (signs.astype(np.uint64) * weights[None, :]).sum(axis=1)
    return pd.Series(ids.astype(np.int64))


def lsh_bucket_udf(dim: int, n_planes: int = 8, seed: int = 42):
    return F.pandas_udf(
        lambda s: _bucket_series(s, dim, n_planes, seed), returnType=LongType()
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
