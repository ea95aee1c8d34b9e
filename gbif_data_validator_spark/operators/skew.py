"""Skew-resistant joins — explicit key salting as a first-class operator.

The north rule requires "partitioning / shuffle / skew handled explicitly":
``uniqueness.py`` salts its aggregation keys; this module does the same for
JOINS. A web corpus's join keys are Zipf-distributed (one hot domain, one
hot language, one hot crawl window), and a shuffled equi-join lands every
row of a hot key on ONE reducer. AQE's skew-join split (OptimizeSkewedJoin)
mitigates this at runtime for sort-merge joins, but only within its
per-partition size thresholds and never for broadcast-ineligible
hash joins it has already committed to; salting is the plan-level guarantee
that holds regardless of join strategy, statistics staleness, or AQE being
disabled — and it is deterministic, so the physical layout is reproducible
run over run.

Reference analog: the reference sidesteps join skew by splitting files into
fixed 10k-line work units (DataFileProcessorMaster.java:82,139) — a
row-count split that cannot help a keyed shuffle; salting is the Spark-native
equivalent for keyed work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    n_salts: int = 16,
) -> DataFrame:
    """Inner equi-join with the LEFT side's hot keys spread across
    ``n_salts`` reducers → the exact same rows as
    ``left.join(right, left[left_on] == right[right_on])``.

    Mechanics: every left row gets a deterministic salt in
    ``[0, n_salts)`` hashed from its WHOLE row (``xxhash64`` over all
    columns — same-key rows differ elsewhere, so a hot key's rows spread
    ~uniformly; a salt from the key alone would be a no-op). The right
    side is replicated ``n_salts``× via an exploded sequence, and the join
    key becomes ``(key, salt)`` — each left row still meets every matching
    right row exactly once, so the result is bit-identical to the plain
    join (pinned by the oracle row and the equivalence test).

    Cost model: right side shuffles ``n_salts``× its size — use it when
    the right side is too big to broadcast but small next to the left
    (dimension vs fact), and the left's key histogram is skewed. The left
    side shuffles once, on ``(key, salt)``, which is the whole point: the
    hot key's reducer becomes ``n_salts`` reducers. For a small right
    side, prefer ``F.broadcast`` (no shuffle at all); for two huge evenly
    keyed sides, prefer the plain join — salting pays a replication tax
    for a guarantee you only need under skew."""
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    l = left.withColumn("_salt", salt.cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = l.join(
        r, (l[left_on] == r[right_on]) & (l["_salt"] == r["_salt"]), "inner"
    )
    return out.drop("_salt")
