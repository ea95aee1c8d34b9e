"""Bloom-filter pre-filtered referential integrity — the big-big scale path.

Reference analog: ``ReferentialIntegrityEvaluator`` loads the whole core id
column into an in-memory awk hash (util/FileBashUtilities.java:38-46) —
fine at upload scale, impossible when the dimension itself is 10^8+ keys.
The broadcast anti-join in ``referential.orphan_rows`` covers small dims;
the shuffle anti-join (``lapsed_customers`` shape) covers big-big but pays
a full shuffle of the 100 TB fact side.

This module is the middle path, the explicit form of Spark's own runtime
row-level filtering (Catalyst injects BloomFilterAggregate/BloomFilterMightContain
for shuffle joins when ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled``
is on; the expressions are not registered as public SQL functions, so the
engine carries its own):

1. ONE pass over the dim keys builds a word-packed bitmap — ``xxhash64`` k
   times per key, explode to bit positions, ``bit_or`` per 64-bit word —
   a |dim|-input, (n_bits/64)-output aggregation.
2. The dense ``array<bigint>`` travels as a 1-row broadcast (crossJoin
   against one row, NOT a per-plan literal), so probing is an O(1)
   ``element_at`` per hash inside whole-stage codegen — no Python, no join,
   no shuffle of the fact side.
3. Rows that fail the bloom probe are DEFINITE orphans (a Bloom filter has
   no false negatives) and never enter a shuffle. Only the surviving
   candidates — |matches| + fp_rate·|orphans| — pay the anti-join, so the
   result is EXACT while the shuffled volume drops by ~the orphan share.

Sizing: fp ≈ (1 - e^(-k·n/m))^k; at the default 12 bits/key with k=3,
fp ≈ 1.1%. The bitmap is capped at 2^27 bits (16 MiB broadcast — past
that, storage bucketing or Spark's automatic runtime filter is the right
tool, and the cap is reported loudly rather than silently degrading).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.predicates import non_blank

#: 2^i masks; index 63 is the sign bit of a signed 64-bit long.
_POW2 = [1 << i for i in range(63)] + [-(1 << 63)]

#: bitmap cap: 2^27 bits = 16 MiB dense array — broadcast-comfortable.
MAX_BITS = 1 << 27

BITS_PER_KEY = 12
DEFAULT_HASHES = 3
DEFAULT_SEED = 42


def _positions(key: Column, n_bits: int, n_hashes: int, seed: int) -> list[Column]:
    """k bit positions for one key: xxhash64(key, seed+i) mod n_bits."""
    return [
        F.pmod(F.xxhash64(key, F.lit(seed + i)), F.lit(n_bits))
        for i in range(n_hashes)
    ]


def _word_mask(pos: Column) -> tuple[Column, Column]:
    """(word index, single-bit mask) for a bit position. ``shiftleft``
    needs a literal shift count, so the mask is an O(1) lookup into a
    64-long powers-of-two literal instead."""
    word = F.shiftright(pos, 6)
    mask = F.element_at(
        F.lit(_POW2).cast("array<bigint>"),
        (pos.bitwiseAND(F.lit(63)) + F.lit(1)).cast("int"),
    )
    return word, mask


def size_bits(n_keys: int, bits_per_key: int = BITS_PER_KEY) -> int:
    """Power-of-two bitmap size for an estimated key count, capped at
    MAX_BITS (the caller is told via the cap; fp degrades gracefully)."""
    want = max(1 << 16, n_keys * bits_per_key)
    n = 1 << 16
    while n < want and n < MAX_BITS:
        n <<= 1
    return n


def bloom_build(
    dim: DataFrame,
    dim_key: str,
    n_bits: int | None = None,
    n_hashes: int = DEFAULT_HASHES,
    seed: int = DEFAULT_SEED,
) -> tuple[DataFrame, int]:
    """Build the bitmap over ``dim``'s non-null keys; returns a 1-row
    DataFrame ``[_bloom: array<bigint>]`` plus the n_bits used.

    One distributed agg: |dim| rows in, ≤ n_bits/64 sparse words out
    (collected — bounded by the cap, never by |dim|), densified on the
    driver, re-parallelized as a single broadcastable row. If ``n_bits``
    is None it is auto-sized from ``approx_count_distinct`` (one cheap
    extra pass over the key column only).
    """
    spark = dim.sparkSession
    keys = dim.where(F.col(dim_key).isNotNull()).select(F.col(dim_key).alias("_k"))
    if n_bits is None:
        est = keys.agg(F.approx_count_distinct("_k").alias("n")).collect()[0]["n"]
        n_bits = size_bits(int(est))
    if n_bits > MAX_BITS:
        raise ValueError(
            f"n_bits={n_bits} exceeds MAX_BITS={MAX_BITS}; at that dim size "
            "use storage bucketing or Spark's runtime bloom filter instead"
        )
    pos = F.explode(F.array(*_positions(F.col("_k"), n_bits, n_hashes, seed)))
    word, mask = _word_mask(F.col("_pos"))
    sparse = (
        keys.select(pos.alias("_pos"))
        .select(word.alias("_w"), mask.alias("_m"))
        .groupBy("_w")
        .agg(F.expr("bit_or(_m)").alias("_bits"))
        .collect()
    )
    dense = [0] * (n_bits // 64)
    for r in sparse:
        dense[int(r["_w"])] = int(r["_bits"])
    return spark.createDataFrame([(dense,)], "_bloom: array<bigint>"), n_bits


def bloom_might_contain(
    key: Column,
    n_bits: int,
    n_hashes: int = DEFAULT_HASHES,
    seed: int = DEFAULT_SEED,
    bloom_col: str = "_bloom",
) -> Column:
    """Probe predicate against the crossJoin-ed bitmap column: true iff
    every one of the k hashed bits is set. False ⇒ key definitely absent."""
    cond: Column | None = None
    for pos in _positions(key, n_bits, n_hashes, seed):
        word, mask = _word_mask(pos)
        hit = (
            F.element_at(F.col(bloom_col), (word + F.lit(1)).cast("int"))
            .bitwiseAND(mask)
            != 0
        )
        cond = hit if cond is None else cond & hit
    assert cond is not None
    return cond


def orphan_rows_bloom(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int | None = None,
    n_hashes: int = DEFAULT_HASHES,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """EXACT orphans of ``fact`` vs ``dim`` (same contract as
    ``referential.orphan_rows``) with a bloom pre-filter so only bloom
    survivors reach the anti-join shuffle.

    definite-miss branch: filtered out by the probe — no false negatives,
    so these are orphans with zero join work. candidate branch:
    |matches| + fp·|orphans| rows verified by the usual anti-join. The
    union is bit-identical to the plain anti-join at any n_bits.
    """
    bloom_df, n_bits = bloom_build(dim, dim_key, n_bits, n_hashes, seed)
    key = F.col(fact_key)
    probed = fact.where(non_blank(key)).crossJoin(F.broadcast(bloom_df))
    mc = bloom_might_contain(key, n_bits, n_hashes, seed)
    definite = probed.where(~mc).drop("_bloom")
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    verified = probed.where(mc).drop("_bloom").join(dim_keys, fact_key, "left_anti")
    return definite.unionByName(verified)
