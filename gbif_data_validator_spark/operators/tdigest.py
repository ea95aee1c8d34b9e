"""t-digest quantile sketch as an explicit partial → merge → final UDAF.

Reference analog: the collectors' hand-rolled aggregation protocol —
per-split partial state, associative merge at the master, final extraction
(collector/CollectorGroup.java:80-141, RecordEvaluationResultCollector
single-thread/concurrent variants). The engine's profile normally gets this
machinery free from Catalyst (``percentile_approx``); this operator is the
north star's "length histograms via t-digest" realized with the SAME
explicit three-phase shape the reference uses, so the pattern is available
for statistics Spark has no built-in sketch for.

Scale shape: ONE narrow scan; each Arrow batch folds into a bounded
centroid list (``mapInPandas`` → one partial-digest row per batch, ~delta
centroids ≈ KBs); the partials then go through one DISTRIBUTED tree-merge
round (repartition into ``n_merge`` groups → in-group merge), so the
driver collects ≤ n_merge digests regardless of input size — at 10^12
rows the per-batch partials are O(10^8) rows, which would OOM a
driver-side-only merge. Cost: one shuffle of sketch state (KBs per
partial), nothing corpus-sized. The digest is order-independent by
construction (merging is associative and commutative up to compression
error).

Algorithm: the "merging t-digest" (Dunning & Ertl, 2019) with the
q·(1-q) size bound — centroids near the tails stay tiny (accurate
extremes), mid-quantile centroids grow. Scipy-free, deterministic given
input order (we sort within every merge).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("means", T.ArrayType(T.DoubleType())),
        T.StructField("weights", T.ArrayType(T.DoubleType())),
    ]
)


def _merge_centroids(
    means: np.ndarray, weights: np.ndarray, delta: int
) -> tuple[np.ndarray, np.ndarray]:
    """Compress (means, weights) to ≤ ~delta centroids, each bounded by the
    t-digest q(1-q) rule."""
    if len(means) == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0  # weight fully to the left of the current centroid
    for m, w in zip(means[1:], weights[1:]):
        q = (w_before + (cur_w + w) / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= max(limit, 1.0):
            cur_m += (m - cur_m) * (w / (cur_w + w))  # weighted mean update
            cur_w += w
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.asarray(out_m), np.asarray(out_w)


def _quantile(means: np.ndarray, weights: np.ndarray, p: float) -> float:
    """Quantile from a sorted centroid list: linear interpolation between
    centroid means at the target cumulative weight."""
    total = float(weights.sum())
    if total == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    target = p * total
    cum = np.cumsum(weights) - weights / 2.0  # centroid "centers"
    if target <= cum[0]:
        return float(means[0])
    if target >= cum[-1]:
        return float(means[-1])
    i = int(np.searchsorted(cum, target)) - 1
    span = cum[i + 1] - cum[i]
    frac = (target - cum[i]) / span if span > 0 else 0.0
    return float(means[i] + frac * (means[i + 1] - means[i]))


def partial_digests(df: DataFrame, col: str, delta: int = 100) -> DataFrame:
    """Phase 1 (partial): one bounded digest row per Arrow batch — the
    per-split collector state."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = pd.to_numeric(pdf[col], errors="coerce").dropna().to_numpy(
                dtype=np.float64
            )
            if len(vals) == 0:
                continue
            m, w = _merge_centroids(vals, np.ones_like(vals), delta)
            yield pd.DataFrame({"means": [m.tolist()], "weights": [w.tolist()]})

    return df.select(col).mapInPandas(fold, schema=PARTIAL_SCHEMA)


def merged_digests(
    df: DataFrame, col: str, delta: int = 100, n_merge: int = 16
) -> DataFrame:
    """Phase 2a (distributed tree merge): the per-batch partials are
    repartitioned into ``n_merge`` groups and merged within each group by a
    second ``mapInPandas`` pass — ≤ n_merge digest rows come out no matter
    how many batches went in. This is the reference's split-collector →
    master merge (CollectorGroup.mergeAndGetResult) with the merge itself
    distributed; only sketch state shuffles."""

    def merge_group(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ms: list[np.ndarray] = []
        ws: list[np.ndarray] = []
        for pdf in batches:
            for m_, w_ in zip(pdf["means"], pdf["weights"]):
                ms.append(np.asarray(m_, dtype=np.float64))
                ws.append(np.asarray(w_, dtype=np.float64))
        if ms:
            m, w = _merge_centroids(np.concatenate(ms), np.concatenate(ws), delta)
            yield pd.DataFrame({"means": [m.tolist()], "weights": [w.tolist()]})

    return (
        partial_digests(df, col, delta)
        .repartition(n_merge)
        .mapInPandas(merge_group, schema=PARTIAL_SCHEMA)
    )


def t_digest_quantiles(
    df: DataFrame, col: str, probs: list[float], delta: int = 100, n_merge: int = 16
) -> list[tuple[float, float]]:
    """Phases 2b+3 (final merge + extract): collect the ≤ n_merge tree-merged
    digests, fold them into one, extract quantiles → [(p, value), ...].
    The driver-side step mirrors CollectorGroup.mergeAndGetResult but sees a
    bounded row count (the distributed round above did the fan-in)."""
    partials = merged_digests(df, col, delta, n_merge).collect()
    if not partials:
        return [(p, float("nan")) for p in probs]
    means = np.concatenate([np.asarray(r.means) for r in partials])
    weights = np.concatenate([np.asarray(r.weights) for r in partials])
    m, w = _merge_centroids(means, weights, delta)
    return [(p, _quantile(m, w, p)) for p in probs]
