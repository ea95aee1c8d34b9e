"""Corpus-overlap census: how much of corpus B is already in corpus A,
exactly (distinct-fingerprint set algebra) and approximately (KMV / theta-
style bottom-k sketches whose size is independent of corpus size).

No reference analog (gbif-data-validator validates one archive at a time);
this is the cross-crawl bookkeeping a continuously-refreshed web corpus
needs before the pairwise dedup operators run: "what fraction of this
month's crawl is last month's" decides whether a full cross-corpus dedup
pass (operators/dedup.py:exact_cross_flags) is worth its join at all, and
the containment numbers are the dedup-rate denominators the curation
funnel reports against.

Grain: the exact-dedup key — ``content_fingerprint`` (md5 of lowercased,
whitespace-collapsed text; functions/textstats.py:220), so the census and
the dedup operators agree on what "the same document" means, and the
DuckDB oracle can replay it bit-for-bit.

Scale shapes:
- ``corpus_overlap``: each side projects to the 16-byte digest; the union
  shuffles ONCE at fingerprint grain into membership flags (map-side
  partial agg collapses per-partition duplicates first), then a 1-row
  fold. No join, no distinct-per-side double shuffle.
- ``kmv_overlap``: per side, distinct 8-byte hashes reduce to the k
  SMALLEST via a sort-limit (Spark plans TakeOrderedAndProject — per-
  partition top-k then a k-row merge on the driver side of the exchange;
  nothing global ever sorts). Everything after is k-row-table algebra.
  At 10^12 docs the exact census's fingerprint shuffle is ~16 TB; the
  sketch answers the same question moving k·8 bytes per side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import content_fingerprint

__all__ = [
    "corpus_overlap",
    "kmv_overlap",
    "write_kmv_sketch",
    "kmv_overlap_vs_sketch",
]


def corpus_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Exact distinct-content overlap between two corpora → ONE row
    ``(n_a, n_b, n_common, n_union, jaccard_micro, containment_a_micro,
    containment_b_micro)``.

    ``n_a`` / ``n_b`` count distinct fingerprints per side, ``n_common``
    their intersection, ``n_union`` the union; the ratios are exact
    integer micro-units (``(10^6·n_common) div n_union`` etc., NULL when
    the denominator is 0). ``containment_b_micro`` is the decontamination
    number: the share of B's distinct content already present in A.
    Null-text rows carry no fingerprint and are excluded (they are
    TEXT_EMPTY findings, not content).

    Plan: tag + union → ONE fingerprint-grain groupBy (md5 keys are
    uniform — no skew path) computing per-fp membership flags → 1-row
    fold. Overflow: 10^6·count ≤ 10^18 < 2^63.
    """
    fp = content_fingerprint(F.col(text_col))
    tagged = df_a.select(
        fp.alias("fingerprint"), F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    ).unionByName(
        df_b.select(
            fp.alias("fingerprint"), F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
        )
    ).where(F.col("fingerprint").isNotNull())
    members = tagged.groupBy("fingerprint").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    folded = members.groupBy().agg(
        F.coalesce(F.sum("in_a"), F.lit(0)).cast("long").alias("n_a"),
        F.coalesce(F.sum("in_b"), F.lit(0)).cast("long").alias("n_b"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
        .cast("long")
        .alias("n_common"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
    )
    return folded.select(
        "n_a",
        "n_b",
        "n_common",
        "n_union",
        F.when(
            F.col("n_union") > 0, F.expr("(1000000 * n_common) div n_union")
        ).alias("jaccard_micro"),
        F.when(
            F.col("n_a") > 0, F.expr("(1000000 * n_common) div n_a")
        ).alias("containment_a_micro"),
        F.when(
            F.col("n_b") > 0, F.expr("(1000000 * n_common) div n_b")
        ).alias("containment_b_micro"),
    )


def _bottom_k(df: DataFrame, k: int) -> DataFrame:
    """Distinct hash values → the k smallest (one column ``h``)."""
    return df.select("h").distinct().orderBy("h").limit(k)


def kmv_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str = "text",
    k: int = 1024,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """KMV (k-minimum-values, Bar-Yossef et al. 2002 / theta-sketch)
    estimate of the same census → ONE row ``(k, k_used, est_a, est_b,
    est_union, est_intersection, est_jaccard_micro)``.

    Per side, content fingerprints hash to uniform 64-bit values
    (``xxhash64``) and only the k smallest survive; the union sketch is
    the k smallest of the merged candidate set (sketches are mergeable —
    the distributed-profile property: shards sketch independently, a
    union of sketches is the sketch of the union). With ``u_k`` the k-th
    smallest value mapped to (0,1), ``est = (k−1)/u_k``; when a set has
    fewer than k distinct values the sketch IS the set and the count is
    exact. Jaccard is estimated on the union sketch as the fraction of
    its members present in both sides' sketches (``k_used`` of them;
    exact-integer micro-units), and ``est_intersection = J·est_union``.

    Estimate quality: relative error ~1/sqrt(k) (~3% at k=1024),
    pinned by tolerance + mergeability pytest. ``hash_fn="md5"`` swaps
    the sketch hash for the engine-portable 60-bit md5-prefix value
    (``conv(substr(md5(fp),1,15),16,10)`` — the same deterministic-hash
    convention as hash_bucket / det-LSH / CMS), making the WHOLE
    estimator — sketches, union, k-th-value estimate, Jaccard sample —
    replayable bit-for-bit in SQL; xxhash64 (default) is the faster
    production path with identical semantics.

    Plan: two distinct-hash reductions (map-side combine) + sort-limits;
    every subsequent node touches ≤ 2k rows. The two k-row sketch frames
    broadcast into the membership joins.
    """
    if k < 2:
        raise ValueError(f"kmv_overlap: k must be >= 2, got {k}")
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"kmv_overlap: unknown hash_fn {hash_fn!r}")
    sk_a = _bottom_k(_hashes(df_a, text_col, hash_fn), k)
    sk_b = _bottom_k(_hashes(df_b, text_col, hash_fn), k)
    return _kmv_estimates(sk_a, sk_b, k, hash_fn)


def _hashes(df: DataFrame, text_col: str, hash_fn: str = "xxhash64") -> DataFrame:
    """Uniform hash per non-null content fingerprint (column ``h``):
    signed-64 xxhash64 (default) or the 60-bit md5-prefix portable value."""
    fp = content_fingerprint(F.col(text_col))
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(fp), 1, 15), 16, 10).cast("long")
    else:
        h = F.xxhash64(fp)
    return df.select(h.alias("h")).where(fp.isNotNull())


def _kmv_estimates(
    sk_a: DataFrame, sk_b: DataFrame, k: int, hash_fn: str = "xxhash64"
) -> DataFrame:
    """The estimator core over two bottom-k sketch frames (column ``h``)
    — shared by the two-corpus face and the persisted-sketch face."""
    if hash_fn == "md5":
        # unsigned 60-bit value → (0,1) position
        u = lambda c: c.cast("double") / F.lit(2.0**60)  # noqa: E731
    else:
        # (0,1) position of a signed-64 hash; (k-1)/u_k is the estimator
        u = lambda c: (c.cast("double") / F.lit(2.0**64)) + F.lit(0.5)  # noqa: E731

    def side_stats(sk: DataFrame, name: str) -> DataFrame:
        # 1-row fold (never empty — an empty corpus estimates 0): n kept
        # values and the k-th smallest (= the max of the kept set)
        return sk.groupBy().agg(
            F.count(F.lit(1)).cast("long").alias("_n"), F.max("h").alias("_hk")
        ).select(
            F.when(F.col("_n") < k, F.col("_n").cast("double"))
            .otherwise(F.lit(float(k - 1)) / u(F.col("_hk")))
            .alias(name)
        )
    # union sketch = k smallest of the merged candidates; its members'
    # presence in both side sketches gives the Jaccard sample
    sk_u = _bottom_k(sk_a.unionByName(sk_b), k)
    both = (
        sk_u.join(
            F.broadcast(sk_a.withColumn("ia", F.lit(1))), "h", "left"
        )
        .join(F.broadcast(sk_b.withColumn("ib", F.lit(1))), "h", "left")
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_used"),
            F.coalesce(
                F.sum(F.coalesce(F.col("ia"), F.lit(0)) * F.coalesce(F.col("ib"), F.lit(0))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_both"),
            F.max("h").alias("h_k"),
        )
    )
    est_u = F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
        F.lit(float(k - 1)) / u(F.col("h_k"))
    )
    # ANSI mode: integer div by zero throws — empty-union guard
    j_micro = F.when(
        F.col("k_used") > 0, F.expr("(1000000 * n_both) div k_used")
    )
    return (
        both.crossJoin(F.broadcast(side_stats(sk_a, "est_a")))
        .crossJoin(F.broadcast(side_stats(sk_b, "est_b")))
        .select(
            F.lit(k).alias("k"),
            "k_used",
            "est_a",
            "est_b",
            est_u.alias("est_union"),
            F.when(
                F.col("k_used") > 0,
                est_u
                * F.col("n_both").cast("double")
                / F.col("k_used").cast("double"),
            ).alias("est_intersection"),
            j_micro.alias("est_jaccard_micro"),
        )
    )


#: params sidecar for persisted sketches (the minhash-index scheme guard)
_SKETCH_PARAMS_FILE = "_kmv_params.json"


def write_kmv_sketch(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    k: int = 1024,
    mode: str = "error",
) -> None:
    """Persist a corpus's bottom-k sketch (k rows of ``h``) + a params
    sidecar — the incremental face: last month's crawl sketches ONCE,
    and every later overlap census reads k·8 bytes instead of rescanning
    its text (the minhash-band-index discipline, applied to distinct-set
    cardinality). ``mode="append"`` adds another shard's sketch; KMV
    merge = bottom-k of the union, so the reader re-limits and the
    result equals the sketch of the combined corpus (pinned by test).
    A k mismatch against the sidecar refuses loudly — mixed-k sketches
    silently bias the estimator."""
    import json
    import os

    if k < 2:
        raise ValueError(f"write_kmv_sketch: k must be >= 2, got {k}")
    params = {"k": k, "scheme": "kmv-xxhash64-md5norm-v1"}
    pfile = os.path.join(path, _SKETCH_PARAMS_FILE)
    if os.path.exists(pfile):
        with open(pfile) as fh:
            existing = json.load(fh)
        if existing != params:
            raise ValueError(
                f"kmv sketch at {path} was built with {existing}; "
                f"refusing to {mode} with {params}"
            )
    _bottom_k(_hashes(df, text_col), k).write.mode(mode).parquet(path)
    if not os.path.exists(pfile):
        os.makedirs(path, exist_ok=True)
        with open(pfile, "w") as fh:
            json.dump(params, fh)


def kmv_overlap_vs_sketch(
    df_new: DataFrame,
    path: str,
    text_col: str = "text",
) -> DataFrame:
    """The kmv_overlap census with side A read from a persisted sketch:
    byte-identical to ``kmv_overlap(old, new, k)`` (pinned by test)
    without any scan of the old corpus. Appended shards merge by
    re-limiting to bottom-k at read."""
    import json
    import os

    spark = df_new.sparkSession
    with open(os.path.join(path, _SKETCH_PARAMS_FILE)) as fh:
        params = json.load(fh)
    k = int(params["k"])
    sk_a = _bottom_k(spark.read.parquet(path), k)
    sk_b = _bottom_k(_hashes(df_new, text_col), k)
    return _kmv_estimates(sk_a, sk_b, k)
