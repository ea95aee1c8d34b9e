"""Probabilistic record linkage: blocked Fellegi–Sunter scoring.

No reference analog (the reference validates single archives); this is the
entity-resolution primitive a multi-source ingest runs BEFORE referential
checks make sense — "is source A's publisher row the same real-world
entity as source B's" — the fuzzy counterpart of the exact anti-join
referential family (operators/referential.py) and of the content-dedup
family (operators/dedup.py), operating on structured field agreement
instead of text similarity.

Fellegi–Sunter (1969): each compared field contributes a log-likelihood
weight — ``log2(m/u)`` on agreement, ``log2((1-m)/(1-u))`` on
disagreement — where ``m``/``u`` are the caller's match/unmatch agreement
probabilities. The weights are computed DRIVER-SIDE in Python and enter
the plan as double literals: no transcendental function ever evaluates in
either engine, so scores are bit-reproducible and the whole operator
hash-checks against a SQL oracle carrying the same literals.

Scale shape:
- candidate generation is ONE equi-join on the blocking key — never a
  cross join; the blocking key is the operator's scale contract and hot
  blocks are excluded (never truncated) under ``max_block_pairs`` with a
  loud census via `linkage_dropped_blocks` (the dedup-family max_bucket
  discipline).
- field comparison and scoring are pure Column algebra inside the join
  projection — zero Python, zero extra shuffles.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_weights(fields: dict) -> dict:
    """``{field: (m, u)}`` → ``{field: (agree_w, disagree_w)}`` in log2
    likelihood-ratio units, computed in Python so both engines consume
    identical double literals. Requires 0 < u < m < 1."""
    out = {}
    for f, (m, u) in fields.items():
        if not (0.0 < u < m < 1.0):
            raise ValueError(
                f"linkage: field {f!r} needs 0 < u < m < 1, got m={m} u={u}"
            )
        out[f] = (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))
    return out


def _norm(c: F.Column) -> F.Column:
    """Comparison normalization: lowercase, trim, inner whitespace
    collapsed — the same convention as title/anchor normalization."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def linkage_scores(
    left: DataFrame,
    right: DataFrame,
    block_col: str,
    fields: dict,
    id_left: str,
    id_right: str,
    threshold: float = 0.0,
    max_block_pairs: int = 1_000_000,
    fuzzy: dict | None = None,
) -> DataFrame:
    """Score all blocked candidate pairs → ``(id_a, id_b, n_agree, score,
    is_match)``. ``fields``: ``{column: (m, u)}`` — the column must exist
    on both sides; comparison is null-safe normalized equality
    (lower/trim/space-collapse): both null or either null contributes 0
    (no evidence), agreement adds ``log2(m/u)``, disagreement adds
    ``log2((1-m)/(1-u))``. ``fuzzy={column: max_dist}`` relaxes that
    column's agreement to ``levenshtein(a, b) <= max_dist`` — typo
    tolerance with EXACT integer distances. Oracle caveat: Spark's
    levenshtein counts CHARACTERS, DuckDB's counts BYTES — identical on
    ASCII, divergent on multi-byte codepoints; keep oracled fixtures
    ASCII (the operator itself uses Spark char semantics). ``is_match``
    is ``score >= threshold`` on the raw (unrounded) sum — deterministic
    because both engines add the same literals in the same field order;
    the reported ``score`` rounds to 6 dp for hashing.

    Blocks whose ``n_left × n_right`` exceeds ``max_block_pairs`` are
    EXCLUDED from pairing (a degenerate blocking value — empty string,
    'unknown' — would otherwise quadratically explode); audit them with
    `linkage_dropped_blocks` before trusting recall."""
    w = fs_weights(fields)
    lsz = left.groupBy(block_col).agg(F.count(F.lit(1)).alias("_nl"))
    rsz = right.groupBy(block_col).agg(F.count(F.lit(1)).alias("_nr"))
    ok_blocks = (
        lsz.join(rsz, block_col)
        .where(F.col("_nl") * F.col("_nr") <= max_block_pairs)
        .select(block_col)
    )
    lf = left.select(
        F.col(block_col),
        F.col(id_left).alias("id_a"),
        *[_norm(F.col(f)).alias(f"_la_{f}") for f in fields],
    ).join(ok_blocks, block_col)
    rf = right.select(
        F.col(block_col),
        F.col(id_right).alias("id_b"),
        *[_norm(F.col(f)).alias(f"_rb_{f}") for f in fields],
    )
    pairs = lf.join(rf, block_col)
    score = F.lit(0.0)
    agree_bits = []
    fuzzy = fuzzy or {}
    for f, (wa, wd) in w.items():
        a, b = F.col(f"_la_{f}"), F.col(f"_rb_{f}")
        known = a.isNotNull() & b.isNotNull()
        if f in fuzzy:
            agree = known & (F.levenshtein(a, b) <= int(fuzzy[f]))
        else:
            agree = known & (a == b)
        score = score + F.when(~known, F.lit(0.0)).when(
            agree, F.lit(wa)
        ).otherwise(F.lit(wd))
        agree_bits.append(F.when(agree, 1).otherwise(0))
    n_agree = sum(agree_bits[1:], agree_bits[0])
    return pairs.select(
        "id_a",
        "id_b",
        n_agree.cast("int").alias("n_agree"),
        F.round(score, 6).alias("score"),
        (score >= F.lit(threshold)).alias("is_match"),
    )


def linkage_dropped_blocks(
    left: DataFrame,
    right: DataFrame,
    block_col: str,
    max_block_pairs: int = 1_000_000,
) -> DataFrame:
    """The blocking values `linkage_scores` excluded, with both side
    counts and the pair count that would have been generated — the loud
    cap report (never drop silently)."""
    lsz = left.groupBy(block_col).agg(F.count(F.lit(1)).alias("n_left"))
    rsz = right.groupBy(block_col).agg(F.count(F.lit(1)).alias("n_right"))
    return (
        lsz.join(rsz, block_col)
        .withColumn("n_pairs", F.col("n_left") * F.col("n_right"))
        .where(F.col("n_pairs") > max_block_pairs)
    )
