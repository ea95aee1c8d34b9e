"""Supervised document quality classifier — the fastText-style "train a
tiny classifier on seed labels, filter the crawl with it" stage (the
GPT-3/LLaMA/CCNet-reported pipeline step) that the LM-perplexity and
rule-gate operators beside it (operators/lm.py, functions/cleaning.py)
don't cover. No reference analog (the reference's quality surface is
per-field predicates, evaluator/record/RecordStructureEvaluator.java).

Multinomial Naive Bayes over whitespace tokens instead of a learned
embedding model: deterministic, trainable as pure DataFrame aggregation,
and — unlike an iterative logistic fit — exactly SQL-expressible, so the
driver hash-checks the scores against a DuckDB oracle.

Scale shape:
- train = one explode + ONE (token)-keyed groupBy with conditional sums
  (map-side combinable) + a 1-row scalar agg; model size is |vocab|, not
  corpus.
- score = one explode + one token join (broadcast when the vocab fits —
  same contract as operators/lm.py's LM table; pass
  ``broadcast_model=False`` past ~10^8-token vocabularies and Catalyst
  plans a shuffle join) + one doc-keyed sum.
- the driver only ever sees the 4 training scalars.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import _ws_tokens


@dataclass(frozen=True)
class NBModel:
    """Broadcastable classifier state: per-token log-likelihood DELTAS
    (pos minus neg — scoring only ever needs the difference), the
    out-of-vocabulary delta, and the log-prior delta."""

    table: DataFrame  # (token, dlogp)
    oov_dlogp: float
    prior_dlogp: float


def nb_train(
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    k: float = 0.5,
) -> NBModel:
    """Train multinomial NB from ``label_col`` (truthy = positive class).
    Add-k smoothing with one reserved OOV bucket per class:
    ``logp_c(t) = ln((cnt_c(t) + k) / (total_c + k·(V + 1)))`` where V is
    the JOINT vocabulary — mirrors train_unigram_lm's smoothing so the two
    operators share one oracle formulation."""
    lbl = F.col(label_col).cast("boolean")
    counts = (
        docs.where(F.col(text_col).isNotNull())
        .select(lbl.alias("_pos"), F.explode(_ws_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(
            F.sum(F.when(F.col("_pos"), 1).otherwise(0)).alias("pos_cnt"),
            F.sum(F.when(F.col("_pos"), 0).otherwise(1)).alias("neg_cnt"),
        )
    )
    counts = counts.localCheckpoint(eager=False)  # reused: scalars + table
    row = counts.agg(
        F.sum("pos_cnt").alias("tp"),
        F.sum("neg_cnt").alias("tn"),
        F.count(F.lit(1)).alias("v"),
    ).head()
    total_pos, total_neg, v = (row.tp or 0), (row.tn or 0), (row.v or 0)
    denom_pos = float(total_pos) + k * (v + 1)
    denom_neg = float(total_neg) + k * (v + 1)
    nd = docs.where(F.col(text_col).isNotNull()).agg(
        F.sum(F.when(lbl, 1).otherwise(0)).alias("np"),
        F.count(F.lit(1)).alias("n"),
    ).head()
    n_pos, n = (nd.np or 0), (nd.n or 0)
    prior = math.log(n_pos + k) - math.log((n - n_pos) + k)
    table = counts.select(
        "token",
        (
            F.log((F.col("pos_cnt") + F.lit(k)) / F.lit(denom_pos))
            - F.log((F.col("neg_cnt") + F.lit(k)) / F.lit(denom_neg))
        ).alias("dlogp"),
    )
    return NBModel(
        table=table,
        oov_dlogp=math.log(k / denom_pos) - math.log(k / denom_neg),
        prior_dlogp=prior,
    )


def nb_score(
    docs: DataFrame,
    model: NBModel,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-doc log-odds under the trained classifier →
    ``(doc_id, n_tokens, log_odds, pred)`` with
    ``log_odds = prior_Δ + Σ_t Δlogp(t)`` and ``pred = log_odds > 0``.
    Token-less docs are dropped (nothing to classify — same contract as
    lm_perplexity)."""
    toks = docs.where(F.col(text_col).isNotNull()).select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(_ws_tokens(F.col(text_col))).alias("token"),
    )
    table = F.broadcast(model.table) if broadcast_model else model.table
    scored = toks.join(table, "token", "left").select(
        "doc_id", F.coalesce("dlogp", F.lit(model.oov_dlogp)).alias("dlogp")
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (F.sum("dlogp") + F.lit(model.prior_dlogp)).alias("log_odds"),
        ((F.sum("dlogp") + F.lit(model.prior_dlogp)) > 0).alias("pred"),
    )


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
    logit: bool = True,
) -> DataFrame:
    """Reliability diagram for a scored corpus → one row per probability
    bin: ``(bin, n, mean_pred, frac_pos)`` — the "does a 0.9 quality
    score mean 90% good" audit for any classifier gate (``nb_score``'s
    log-odds with ``logit=True``, or any [0,1] score with
    ``logit=False``). A curator trusting an uncalibrated gate mislabels
    at corpus scale; this census is the check.

    Exactness discipline: predictions quantize to integer MICRO-UNITS
    (round(p·1e6)) before any sum, so per-bin aggregation is exact
    integer arithmetic — partition-order-independent and SQL-replayable
    — and the bin id derives from the quantized value with integer
    div, never a float comparison. ``mean_pred``/``frac_pos`` round at
    6 dp from those integer sums.

    Plan: one projection + ONE n_bins-grain hash agg (map-side
    combinable); output is ≤ n_bins rows."""
    s = F.col(score_col).cast("double")
    p = (F.lit(1.0) / (F.lit(1.0) + F.exp(-s))) if logit else s
    q = F.round(p * F.lit(1_000_000.0), 0).cast("long")
    # integer div on the quantized value: floor(q * n_bins / 1e6) without
    # ever comparing floats, clamped into [0, n_bins)
    bin_id = F.least(
        F.greatest((q * n_bins / F.lit(1_000_000)).cast("long"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    rows = df.select(
        bin_id.alias("bin"),
        q.alias("_q"),
        F.col(label_col).cast("long").alias("_y"),
    )
    return (
        rows.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_q").alias("_sq"),
            F.sum("_y").alias("_sy"),
        )
        .select(
            "bin",
            "n",
            F.round(F.col("_sq").cast("double") / F.col("n") / F.lit(1e6), 6)
             .alias("mean_pred"),
            F.round(F.col("_sy").cast("double") / F.col("n"), 6)
             .alias("frac_pos"),
        )
    )


def calibration_error(curve: DataFrame) -> DataFrame:
    """Expected calibration error from a ``calibration_curve`` output →
    ONE row ``(n, n_bins, ece)``: Σ (n_b / N) · |mean_pred_b −
    frac_pos_b| — the single-number gate companion to the per-bin
    diagram (an ECE threshold belongs in a rule battery; the curve is
    for humans). Deterministic: the fold runs over the bin-sorted list
    (bins are disjoint integers), inputs are the curve's already-rounded
    6 dp values, result rounds at 6 dp.

    Plan: one agg over the ≤ n_bins-row curve — nothing touches the
    corpus again."""
    from .constraints import _ordered_fold

    one = curve.agg(
        F.sort_array(
            F.collect_list(F.struct("bin", "n", "mean_pred", "frac_pos"))
        ).alias("g"),
        F.sum("n").alias("n"),
    )
    term = lambda s: (  # noqa: E731
        s["n"].cast("double") / F.col("n").cast("double")
        * F.abs(s["mean_pred"] - s["frac_pos"])
    )
    return one.select(
        F.col("n").cast("long").alias("n"),
        F.size("g").cast("long").alias("n_bins"),
        F.round(_ordered_fold(F.transform(F.col("g"), term)), 6).alias("ece"),
    )


def agreement_kappa(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Cohen's kappa between two label columns → ONE row ``(n, n_agree,
    po, pe, kappa)`` — chance-corrected inter-classifier agreement, the
    label-QA statistic raw accuracy can't replace: two quality filters
    that both pass 95% of documents agree 90%+ by chance alone, and
    kappa is what's left after that chance is removed. Rows where either
    label is NULL are excluded (no agreement question to ask).

    po = Σ diag / n, pe = Σ_k row_k·col_k / n², kappa = (po−pe)/(1−pe);
    all three computed as DOUBLEs in a pinned operation order and rounded
    to 6 dp, so the result hash-checks against a SQL oracle (the pagerank
    discipline). Degenerate case: pe = 1 (both classifiers constant and
    equal) → kappa NULL rather than 0/0.

    Plan: ONE corpus-sized agg to the k×k confusion matrix (labels ×
    labels — tiny by construction), then all marginals/scalars are aggs
    over THAT table: a second shuffle of k² rows, a 1-row result. The
    corpus shuffles once, as (a, b) label pairs only."""
    pairs = df.select(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
    cm = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    row_m = cm.groupBy("a").agg(F.sum("c").alias("row_c"))
    col_m = cm.groupBy("b").agg(F.sum("c").alias("col_c"))
    prod = (
        row_m.join(col_m, row_m.a == col_m.b)
        .agg(F.sum(F.col("row_c") * F.col("col_c")).alias("s_prod"))
    )
    tot = cm.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("c"))).alias("n_agree"),
    )
    nd = F.col("n").cast("double")
    po = F.coalesce(F.col("n_agree"), F.lit(0)).cast("double") / nd
    pe = F.col("s_prod").cast("double") / (nd * nd)
    kappa = F.when(pe != 1.0, (po - pe) / (F.lit(1.0) - pe))
    return tot.crossJoin(prod).select(
        F.col("n"),
        F.coalesce(F.col("n_agree"), F.lit(0)).alias("n_agree"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round(kappa, 6).alias("kappa"),
    )


def cluster_pair_agreement(
    df: DataFrame, label_a: str, label_b: str
) -> DataFrame:
    """Pair-counting agreement between two clusterings of the same rows →
    ONE row ``(n_items, n_cells, n_clusters_a, n_clusters_b, pairs_a,
    pairs_b, pairs_both, precision_micro, recall_micro, dice_micro,
    rand_micro)``.

    The dedup-quality evaluator the kappa statistic can't be (kappa
    compares per-ROW labels; clusterings have no label alignment): treat
    clustering A as truth and B as prediction and count ITEM PAIRS —
    ``pairs_a`` co-clustered in A, ``pairs_b`` in B, ``pairs_both`` in
    both. ``precision = both/b``, ``recall = both/a``, ``dice`` (the
    pair-F1) ``= 2·both/(a+b)``, and the Rand index ``= (C(n,2) − a − b
    + 2·both) / C(n,2)`` — all emitted in exact integer micro-units
    (floor), NULL when the denominator is 0 (engines disagree on 0/0).
    This is how you answer "how much does normalization-insensitive /
    LSH / semantic dedup AGREE with exact dedup" as one hard number per
    pair of policies.

    Exact arithmetic at 10^12 rows: pair counts reach ~n²/2 ≈ 5·10^23 —
    past BIGINT — so they accumulate as DECIMAL(38,0) products of cell
    counts, and each micro-quotient is made division-exact before the
    cast down (``(num − num % den) / den``; the quotient itself is
    ≤ 2·10^6 so the final cast to BIGINT never truncates). The raw
    ``pairs_*`` columns are surfaced via try_cast — exact whenever they
    fit BIGINT (any feasible test scale), NULL past 2^63 rather than
    silently wrong.

    Rows where EITHER label is NULL are excluded: a NULL cluster id is
    "unclustered", and an unclustered row asserts no pair under either
    policy.

    Plan shape (ONE linear pipeline, no self-joins, no persist): corpus
    → ONE map-combinable (a,b)-cell groupBy (the only corpus-sized
    shuffle; cell count ≤ n_items) → two window passes AT CELL GRAIN
    (partitionBy a, then b: marginal sizes + one designated row per
    cluster) → a 1-row fold. The driver sees one row at any scale.
    """
    dec = "decimal(38,0)"
    from pyspark.sql import Window

    lab = df.where(F.col(label_a).isNotNull() & F.col(label_b).isNotNull())
    cells = lab.groupBy(
        F.col(label_a).alias("_a"), F.col(label_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("n"))

    w_a, w_b = Window.partitionBy("_a"), Window.partitionBy("_b")
    sized = (
        cells.withColumn("size_a", F.sum("n").over(w_a))
        .withColumn("rn_a", F.row_number().over(w_a.orderBy("_b")))
        .withColumn("size_b", F.sum("n").over(w_b))
        .withColumn("rn_b", F.row_number().over(w_b.orderBy("_a")))
    )

    def _c2(col):  # C(x,2) in DECIMAL(38,0); x·(x−1) is even so /2 is exact
        x = col.cast(dec)
        return ((x * (x - F.lit(1).cast(dec))) / F.lit(2).cast(dec)).cast(dec)

    folded = sized.groupBy().agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_items"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.coalesce(F.sum(F.when(F.col("rn_a") == 1, 1)), F.lit(0))
        .cast("long")
        .alias("n_clusters_a"),
        F.coalesce(F.sum(F.when(F.col("rn_b") == 1, 1)), F.lit(0))
        .cast("long")
        .alias("n_clusters_b"),
        F.coalesce(
            F.sum(F.when(F.col("rn_a") == 1, _c2(F.col("size_a")))),
            F.lit(0),
        )
        .cast(dec)
        .alias("_pa"),
        F.coalesce(
            F.sum(F.when(F.col("rn_b") == 1, _c2(F.col("size_b")))),
            F.lit(0),
        )
        .cast(dec)
        .alias("_pb"),
        F.coalesce(F.sum(_c2(F.col("n"))), F.lit(0)).cast(dec).alias("_pboth"),
    )

    def _micro(num, den):  # ⌊10^6·num/den⌋, exact (num,den ≥ 0), NULL at den=0
        n6 = (num * F.lit(1_000_000).cast(dec)).cast(dec)
        return F.when(
            den > F.lit(0).cast(dec), ((n6 - n6 % den) / den).cast("long")
        )

    pa, pb, pboth = F.col("_pa"), F.col("_pb"), F.col("_pboth")
    total_pairs = _c2(F.col("n_items"))
    agree = (total_pairs - pa - pb + F.lit(2).cast(dec) * pboth).cast(dec)
    return folded.select(
        "n_items",
        "n_cells",
        "n_clusters_a",
        "n_clusters_b",
        pa.try_cast("long").alias("pairs_a"),
        pb.try_cast("long").alias("pairs_b"),
        pboth.try_cast("long").alias("pairs_both"),
        _micro(pboth, pb).alias("precision_micro"),
        _micro(pboth, pa).alias("recall_micro"),
        _micro(F.lit(2).cast(dec) * pboth, (pa + pb).cast(dec)).alias(
            "dice_micro"
        ),
        _micro(agree, total_pairs).alias("rand_micro"),
    )
