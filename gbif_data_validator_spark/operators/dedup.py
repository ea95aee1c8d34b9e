"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Reference analog: the uniqueness evaluators (sort + adjacent-compare →
RECORD_NOT_UNIQUELY_IDENTIFIED, evaluator/UniquenessEvaluator.java:46-74)
generalized from key equality to content equality/similarity — the operator
the reference *would* need at web scale.

Scale design notes (per operator, for 100 TB / 10^12 docs):
- exact: one salted hash-agg on a 16-byte digest — same shape as the
  uniqueness check; shuffle carries (digest, count) only.
- ngram-jaccard: explode shingles → self-join on shingle → exact Jaccard on
  candidates. The shingle join is the scalable skeleton, but frequency-capped
  (drop shingles appearing in > max_df docs) so hot shingles don't quadratic-
  blow the join — the standard candidate-pruning trick.
- minhash-lsh: constant-size signature per doc (Arrow-batched numpy), banded
  into B buckets → candidates only collide within a band bucket; the
  band-bucket groupBy is the only shuffle and its fan-in per bucket is tiny
  with healthy banding.
- simhash: 64-bit signature, near-dup = Hamming ≤ r; candidates via the
  pigeonhole split into (r+1) chunks — equality join per chunk.
- embedding-cosine: brute pairwise restricted to LSH buckets (see
  similarity.py); the exact variant here is for bounded candidate sets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions.textstats import content_fingerprint

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------


def exact_duplicate_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (fingerprint, n_docs, doc_ids sorted) for content appearing >1 time.
    Normalization: lowercase + whitespace-collapse (content_fingerprint)."""
    fp = content_fingerprint(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .where(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep one representative (min id) per exact-content group — the
    training-data 'drop exact dups' pass. Returns the surviving rows."""
    fp = content_fingerprint(F.col(text_col)).alias("_fp")
    w = df.select("*", fp)
    keep = w.groupBy("_fp").agg(F.min(F.col(id_col)).alias(id_col))
    return w.join(keep, on=["_fp", id_col], how="inner").drop("_fp")


# --------------------------------------------------------------------------
# Word n-gram shingles + exact Jaccard on candidates
# --------------------------------------------------------------------------


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles (lowercased)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(words)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i, k), " "),
    )
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    max_df: int = 1000,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard) for pairs with Jaccard(shingle sets) ≥
    threshold, doc_a < doc_b. Exact Jaccard computed from shingle-join
    intersection counts; shingles occurring in > max_df docs are dropped
    from candidate generation (stop-shingle pruning) to bound the join."""
    sh = df.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    sh = sh.where(F.col("n_sh") > 0).persist()

    exploded = sh.select("doc_id", F.explode("sh").alias("s"))
    hot = exploded.groupBy("s").agg(F.count(F.lit(1)).alias("df_")).where(
        F.col("df_") > max_df
    )
    pruned = exploded.join(F.broadcast(hot.select("s")), "s", "left_anti")

    a = pruned.alias("a")
    b = pruned.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.select("doc_id", "n_sh")
    out = (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_series(shingle_arrays: pd.Series, n_hashes: int, seed: int) -> pd.Series:
    """numpy minhash signatures over Arrow batches: h_i(x) = (a_i*x + b_i)
    mod p, min over the doc's shingle hashes."""
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=n_hashes, dtype=np.int64).astype(np.uint64)

    def one(arr):
        if arr is None or len(arr) == 0:
            return None
        # stable 64-bit hash of each shingle string
        xs = np.array(
            [_poly_hash(s) for s in arr], dtype=np.uint64
        )  # (n_shingles,)
        # (n_hashes, n_shingles) permutation hashes, min over shingles
        vals = (a[:, None] * xs[None, :] + b[:, None]) % np.uint64(_MERSENNE)
        return vals.min(axis=1).astype(np.int64).tolist()

    return shingle_arrays.map(one)


def _poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 131 + ord(ch)) % _MERSENNE
    return h


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 64,
    seed: int = 42,
) -> DataFrame:
    """→ (doc_id, sig array<long>[n_hashes])."""
    udf = F.pandas_udf(
        lambda s: _minhash_series(s, n_hashes, seed), returnType=ArrayType(LongType())
    )
    return df.select(
        F.col(id_col).alias("doc_id"), shingles(F.col(text_col), k).alias("sh")
    ).select("doc_id", udf(F.col("sh")).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    n_hashes: int = 64,
    n_bands: int = 16,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: band the signature into n_bands buckets,
    candidates = pairs colliding in ≥1 band, verified by estimated Jaccard
    (signature agreement rate) ≥ threshold.

    Scale: the only shuffle over the corpus is groupBy(band, band_hash);
    signatures are constant-size. Estimated Jaccard avoids a second pass
    over the texts (re-verification with exact Jaccard can chain after)."""
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(df, id_col, text_col, k, n_hashes, seed).persist()

    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda bnd: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), bnd * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    ) / F.lit(float(n_hashes))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .where(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def _simhash_series(texts: pd.Series) -> pd.Series:
    """64-bit SimHash (Charikar 2002): sign of the per-bit sum of token
    hashes. Arrow-batched numpy."""
    import numpy as np

    bits = np.arange(64, dtype=np.uint64)

    def one(t):
        if t is None:
            return None
        words = t.lower().split()
        if not words:
            return 0
        hs = np.array([_poly_hash(w) for w in words], dtype=np.uint64)
        bitmat = ((hs[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.int32)
        acc = (2 * bitmat - 1).sum(axis=0)
        sig = np.uint64(0)
        for i in range(64):
            if acc[i] > 0:
                sig |= np.uint64(1) << np.uint64(i)
        return int(sig.astype(np.int64))  # two's complement into BIGINT

    return texts.map(one)


simhash_udf = F.pandas_udf(_simhash_series, returnType=LongType())


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming via the pigeonhole
    principle: split 64 bits into (max_hamming+1) chunks; any qualifying pair
    collides exactly on ≥1 chunk → equality self-join per chunk, then exact
    Hamming verification with bit_count (JVM-side)."""
    n_chunks = max_hamming + 1
    chunk_bits = 64 // n_chunks
    sigs = df.select(
        F.col(id_col).alias("doc_id"), simhash_udf(F.col(text_col)).alias("sig")
    ).persist()
    # shift amounts must be Python ints (static per chunk), so the chunk
    # array is built with a driver-side loop of literal shifts
    chunk_cols = [
        F.shiftrightunsigned(F.col("sig"), i * chunk_bits).bitwiseAND(
            F.lit((1 << chunk_bits) - 1)
        )
        for i in range(n_chunks)
    ]
    chunks = sigs.select(
        "doc_id",
        "sig",
        F.posexplode(F.array(*chunk_cols)).alias("chunk_idx", "chunk_val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --------------------------------------------------------------------------
# Embedding cosine near-dup (exact over candidate sets)
# --------------------------------------------------------------------------


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns — JVM-side
    aggregate/zip_with, computed in double precision."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Exact pairwise cosine near-dups (doc_a < doc_b, sim ≥ threshold).
    Quadratic — intended for bounded inputs (an LSH bucket, a partition,
    a candidate set from similarity.py), not a whole 10^12-row corpus."""
    a = df.select(F.col(id_col).alias("doc_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("doc_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", F.round(cosine_sim(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )
