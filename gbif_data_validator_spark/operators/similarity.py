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


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    n_lists: int,
    seed: int = 42,
    max_train: int = 50_000,
) -> np.ndarray:
    """k-means coarse-quantizer centroids as an (n_lists, dim) matrix —
    pyspark.ml KMeans trained on a bounded sample (≤ ``max_train``
    vectors), so training cost is constant in corpus size. Shared by the
    IVF probe path and semantic dedup."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    n = train.count()
    if n > max_train:
        train = train.sample(fraction=max_train / n, seed=seed)
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(train)
    return np.stack([np.asarray(c) for c in model.clusterCenters()])  # (L, d)


def centroid_assign_udf(centers: np.ndarray, n_nearest: int = 1):
    """Pandas UDF: list ids of the ``n_nearest`` centroids per vector
    (euclidean, same metric KMeans optimizes) — the centroid matrix rides
    into executors inside the serialized UDF, one matmul per Arrow batch."""

    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        # squared euclidean to every centroid: (B, L)
        d2 = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        idx = np.argsort(d2, axis=1)[:, :n_nearest]
        return pd.Series([row.astype("int32").tolist() for row in idx])

    return F.pandas_udf(assign, returnType="array<int>")


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
    centers = train_centroids(corpus, vec_col, n_lists, seed, max_train)

    def assign_udf(n_nearest: int):
        return centroid_assign_udf(centers, n_nearest)

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


# --------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# --------------------------------------------------------------------------


def semantic_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_train: int = 50_000,
    max_cluster: int = 10_000,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embeddings, compute exact cosine only
    WITHIN each cluster, keep pairs ≥ ``threshold``.
    → (doc_a, doc_b, cosine, cluster_id), doc_a < doc_b.

    Scale: cluster assignment is a narrow Arrow pass (centroids ride in the
    UDF); the only corpus-sized shuffle is the per-cluster posting-list
    groupBy, and in-cluster pairing is JVM-side nested transforms — no
    self-join. ``n_clusters`` must scale with the corpus (the paper uses
    ~√n clusters at 10^8+ docs) so clusters stay O(thousands); the
    ``max_cluster`` cap bounds the quadratic in-cluster work against a
    degenerate clustering, and dropped clusters are auditable via
    ``semantic_dropped_clusters`` — never silent."""
    from .dedup import _in_list_pairs

    posts = _semantic_posts(df, id_col, vec_col, n_clusters, seed, max_train)
    pairs = (
        posts.where((F.size("ds") >= 2) & (F.size("ds") <= max_cluster))
        .select(
            F.col("cluster_id"),
            F.explode(_in_list_pairs(F.col("ds"), ["id", "vec"])).alias("p"),
        )
        .select(
            F.col("p.id_a").alias("doc_a"),
            F.col("p.id_b").alias("doc_b"),
            F.round(cosine_sim(F.col("p.vec_a"), F.col("p.vec_b")), 6).alias("cosine"),
            "cluster_id",
        )
        .where(F.col("cosine") >= threshold)
    )
    return pairs


def _semantic_posts(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int,
    seed: int,
    max_train: int,
) -> DataFrame:
    centers = train_centroids(df, vec_col, n_clusters, seed, max_train)
    assign = centroid_assign_udf(centers, 1)
    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .withColumn("cluster_id", F.element_at(assign(F.col("vec")), 1))
        .groupBy("cluster_id")
        .agg(F.collect_list(F.struct("id", "vec")).alias("ds"))
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    max_train: int = 50_000,
    max_cluster: int = 10_000,
) -> DataFrame:
    """Rows of ``df`` surviving semantic dedup: a doc is dropped iff it has
    an in-cluster partner at cosine ≥ threshold with a SMALLER id (the
    deterministic analog of SemDeDup's keep-one-per-duplicate-set; on a
    chain a→b→c this drops b and c — marginally more aggressive than a
    connected-component representative, and reproducible). One broadcast-
    able anti-join of the (small) dropped-id set against the corpus."""
    dropped = (
        semantic_dup_pairs(
            df, id_col, vec_col, n_clusters, threshold, seed, max_train, max_cluster
        )
        .select(F.col("doc_b").alias(id_col))
        .distinct()
    )
    return df.join(dropped, id_col, "left_anti")


def semantic_dropped_clusters(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
    max_train: int = 50_000,
    max_cluster: int = 10_000,
) -> DataFrame:
    """→ (cluster_id, n_docs) for clusters ``max_cluster`` excluded from
    the semantic-dedup pair scan — route these through a coarser pass
    (raise n_clusters, or fall back to embedding LSH) instead of reading
    'no pairs' as 'no duplicates'."""
    return (
        _semantic_posts(df, id_col, vec_col, n_clusters, seed, max_train)
        .where(F.size("ds") > max_cluster)
        .select("cluster_id", F.size("ds").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the compressed-domain scale path
# ---------------------------------------------------------------------------


def _lloyd_kmeans(X: np.ndarray, k: int, seed: int, iters: int = 25) -> np.ndarray:
    """Seeded Lloyd's k-means in numpy — deterministic (no MLlib randomness
    surface), used per PQ subspace on a bounded driver-side sample. Empty
    clusters reseed to the farthest point."""
    rng = np.random.default_rng(seed)
    n = len(X)
    if n <= k:
        reps = X[rng.integers(0, n, size=k - n)] if k > n else X[:0]
        return np.concatenate([X, reps + rng.normal(0, 1e-6, reps.shape)])[:k]
    centers = X[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            pts = X[assign == j]
            centers[j] = pts.mean(axis=0) if len(pts) else X[d2.min(axis=1).argmax()]
    return centers


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    seed: int = 42,
    max_train: int = 20_000,
) -> np.ndarray:
    """(m, k_codes, dim/m) PQ codebooks: the L2-NORMALIZED vector space is
    split into ``m`` contiguous subspaces and each gets its own k-means
    codebook (so Σ_j <q_j, c_j(x)> approximates cosine(q, x)). Trained on a
    bounded sample — constant cost in corpus size, like train_centroids."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    rows = corpus.select(vec_col)
    n = rows.count()
    if n > max_train:
        rows = rows.sample(fraction=max_train / n, seed=seed)
    X = np.array([np.asarray(r[0], dtype=np.float64) for r in rows.collect()])
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    X = X / np.where(norms == 0, 1.0, norms)
    return np.stack(
        [
            _lloyd_kmeans(X[:, j * sub : (j + 1) * sub], k_codes, seed + j)
            for j in range(m)
        ]
    )  # (m, k, sub)


def pq_encode_udf(codebooks: np.ndarray):
    """Pandas UDF: L2-normalize and quantize each vector to its per-subspace
    nearest-code ids → array<int> of length m. The 100 TB win is storage and
    shuffle volume: m small ints travel instead of dim floats (~32× at
    dim=64, m=8), and candidate scoring never touches the raw vector."""
    m, _, sub = codebooks.shape

    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.where(norms == 0, 1.0, norms)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for j in range(m):
            xj = mat[:, j * sub : (j + 1) * sub]
            d2 = ((xj[:, None, :] - codebooks[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series([row.tolist() for row in codes])

    return F.pandas_udf(encode, returnType="array<int>")


def pq_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    seed: int = 42,
    max_train: int = 20_000,
) -> DataFrame:
    """IVF + PQ/ADC ANN: IVF lists bound WHICH candidates are scored
    (n_probe/n_lists of the corpus per query), PQ bounds WHAT travels —
    the probe join carries only (neighbor_id, list_id, m codes); raw
    embeddings never shuffle. Scoring is true ADC: per query a (m × k_codes)
    lookup table of subvector dot products is built ONCE driver-side (the
    query set is small by the same contract that lets brute_force_topk
    broadcast it) and candidate scores are m table adds — no float vector
    math per pair. → (query_id, neighbor_id, adc_cosine, rank); approximate
    by construction, recall measured against brute_force_topk in tests."""
    codebooks = train_pq_codebooks(corpus, vec_col, dim, m, k_codes, seed, max_train)
    centers = train_centroids(corpus, vec_col, n_lists, seed, max_train)
    sub = dim // m

    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("list_id", F.element_at(centroid_assign_udf(centers, 1)(F.col("cv")), 1))
        .withColumn("codes", pq_encode_udf(codebooks)(F.col("cv")))
        .drop("cv")  # the point: candidates travel as codes, not vectors
    )

    qrows = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).collect()
    luts = {}
    for r in qrows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        nrm = np.linalg.norm(qv)
        qv = qv / (nrm if nrm else 1.0)
        luts[r["query_id"]] = np.stack(
            [codebooks[j] @ qv[j * sub : (j + 1) * sub] for j in range(m)]
        )  # (m, k_codes)

    def adc(qids: pd.Series, codes: pd.Series) -> pd.Series:
        if len(qids) == 0:
            return pd.Series([], dtype="float64")
        out = np.empty(len(qids), dtype=np.float64)
        qarr = qids.to_numpy()
        carr = np.array([np.asarray(c, dtype=np.int64) for c in codes])
        for qid in np.unique(qarr):
            sel = qarr == qid
            lut = luts[qid]
            out[sel] = lut[np.arange(m)[None, :], carr[sel]].sum(axis=1)
        return pd.Series(out)

    adc_udf = F.pandas_udf(adc, returnType="double")

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("list_id", F.explode(centroid_assign_udf(centers, n_probe)(F.col("qv")))).drop("qv")

    scored = (
        F.broadcast(q)
        .join(c, on="list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "codes")
        .distinct()
        .withColumn("adc_cosine", F.round(adc_udf(F.col("query_id"), F.col("codes")), 6))
        .drop("codes")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_cosine", "rank")
    )


# --------------------------------------------------------------------------
# Deterministic (engine-portable) LSH + recall measurement
# --------------------------------------------------------------------------

#: LCG constants (glibc) driving the Rademacher hyperplanes — chosen so the
#: identical arithmetic is expressible in ANSI SQL (the DuckDB oracle
#: recomputes the same buckets bit-for-bit)
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2_147_483_648  # 2^31


def det_lsh_bucket(vec, dim: int, n_planes: int = 4, scale: int = 1000):
    """Deterministic sign-LSH bucket id (Column) for an array<float> vector.

    Unlike the seeded-numpy hyperplanes above, this variant is *engine
    portable*: components quantize to integers (``floor(x*scale)`` — floor,
    not round, so no half-even/half-up divergence), each of ``n_planes``
    Rademacher hyperplanes has ±1 entries derived from an LCG over
    ``(plane, dim)``, and the projection is a pure BIGINT dot product — so
    an ANSI-SQL oracle (DuckDB) reproduces the exact bucket for every
    vector and the ANN result becomes a hash-checkable correctness row
    rather than a rows-only recall test. All Column algebra, JVM-side."""
    qv = F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))

    def _dot_with_plane(b: int):
        # closure (not a default arg — PySpark reads lambda arity)
        def merge(acc, d):
            # all-long arithmetic: the LCG multiply overflows int32 (ANSI throws)
            seed = F.lit(b * 10007).cast("long") + d.cast("long") + F.lit(1).cast("long")
            rademacher = F.when(
                (seed * F.lit(_LCG_A).cast("long") + F.lit(_LCG_C).cast("long"))
                % F.lit(_LCG_M).cast("long")
                >= F.lit(_LCG_M // 2).cast("long"),
                F.lit(1),
            ).otherwise(F.lit(-1))
            return acc + F.element_at(qv, d.cast("int") + 1) * rademacher

        return merge

    bucket = F.lit(0).cast("long")
    for b in range(n_planes):
        proj = F.aggregate(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            F.lit(0).cast("long"),
            _dot_with_plane(b),
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**b)).otherwise(F.lit(0))
    return bucket


def lsh_recall_report(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 4,
    multiprobe: int = 1,
) -> DataFrame:
    """Per-query recall@k of deterministic-LSH ANN against exact brute
    force → ``(query_id, n_ann, n_hit, recall)`` — the quality pin for the
    ANN family (SQL-expressible end to end, so the driver hash-checks it).

    Plan: one narrow pass buckets the corpus (no shuffle), the (small,
    broadcast-by-contract) query set probes its own bucket — plus, with
    ``multiprobe=1``, every bucket one sign-flip away (bucket XOR 2^p, the
    classic multi-probe trick: a vector near a hyperplane hashes across
    it, so the adjacent buckets hold most of the missed neighbors) —
    candidates rank by exact cosine inside the probed buckets, and the
    exact top-k comes from :func:`brute_force_topk`. The brute-force side
    is O(|Q|·|C|) — this is a measurement harness run over a bounded query
    sample, not the serving path (that's lsh_ann/ivf_ann/pq_ann)."""
    bucket = lambda df: det_lsh_bucket(F.col(vec_col), dim=dim, n_planes=n_planes)
    probe_of = F.col("_qb0")
    probes = F.array(
        probe_of,
        *(
            [probe_of.bitwiseXOR(F.lit(2**p)) for p in range(n_planes)]
            if multiprobe >= 1
            else []
        ),
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            bucket(queries).alias("_qb0"),
        )
        .withColumn("_qb", F.explode(probes))
        .drop("_qb0")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        bucket(corpus).alias("_cb"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    ann = (
        q.join(c, (F.col("_qb") == F.col("_cb")) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cosine", F.round(cosine_sim(F.col("qv"), F.col("cv")), 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )
    exact = brute_force_topk(corpus, queries, id_col=id_col, vec_col=vec_col, k=k)
    hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .join(
            ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ann")), "query_id", "left"
        )
        .join(
            hits.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit")), "query_id", "left"
        )
        .select(
            "query_id",
            F.coalesce("n_ann", F.lit(0)).alias("n_ann"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) / F.col("n_exact")).alias("recall"),
        )
    )


def det_lsh_cosine_pairs(
    df,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 4,
    threshold: float = 0.3,
    max_bucket: int = 1000,
):
    """Near-duplicate embedding pairs via the engine-portable deterministic
    sign-LSH → ``(doc_a, doc_b, cosine)`` with ``doc_a < doc_b``:
    candidates share a ``det_lsh_bucket`` (integer LCG Rademacher planes —
    the same primitive ``ann_recall`` pins), exact cosine verifies
    in-bucket. Unlike ``embedding_cosine_pairs_lsh`` (seeded-numpy
    hyperplanes, rows-only correctness), EVERY stage here replays in ANSI
    SQL, so the LSH-bucketed dedup path itself gets a hash-checkable
    correctness row — not just a recall bound.

    Plan shape: one narrow pass computes the bucket per row; a bucket-size
    agg drops hot buckets past ``max_bucket`` (the family-wide loud skew
    cap — a bucket that big means the planes aren't discriminating and the
    quadratic in-bucket join would explode); the candidate join is a
    bucket equi-join, quadratic only within capped buckets. No UDFs, no
    Python rows."""
    b = det_lsh_bucket(F.col(vec_col), dim, n_planes)
    keyed = df.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v"), b.alias("bucket")
    )
    ok = (
        keyed.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") <= max_bucket)
        .select("bucket")
    )
    keyed = keyed.join(F.broadcast(ok), "bucket")
    a = keyed.select("bucket", F.col("vid").alias("doc_a"), F.col("v").alias("va"))
    c = keyed.select("bucket", F.col("vid").alias("doc_b"), F.col("v").alias("vb"))
    from .dedup import cosine_sim

    return (
        a.join(c, ["bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
        # no distinct: each doc lives in exactly ONE bucket, so a pair can
        # only be generated once — a dedup here would be a wasted shuffle
    )
