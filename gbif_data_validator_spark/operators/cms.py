"""Count-Min Sketch (Cormode & Muthukrishnan 2005): a LINEAR, mergeable
frequency sketch answering point queries ("how often does this term
occur?") with one-sided error, in space `depth x width` regardless of
term cardinality.

No reference analog (gbif-data-validator counts interpreted terms
exactly — collector/TermsFrequencyCollector.java:18-54, fine at archive
scale); at 10^12
documents the exact term-frequency groupBy shuffles the full token
vocabulary every run. The CMS answers the recurring-census questions
("did 'viagra' spike this crawl?", "how hot is this boilerplate
shingle?") from a fixed `depth*width`-cell table that each crawl APPENDS
to by cell-wise addition — the sketch of a union is the sum of the
sketches, exactly (linearity), so incremental corpora never re-scan.

Hashing: row ``j`` maps a term to column
``int(md5(term || ':' || j)[:15 hex], 16) % width`` — 60 bits of md5,
non-negative, no seed state — chosen (like the calibration/bucket-LM
operators) so DuckDB replays the construction bit-for-bit: every cell
count and every MIN-over-rows estimate is an integer with one canonical
value. xxhash64 on (term, j) is the 100 TB key knob (same plan, cheaper
hash), documented not defaulted because it trades away the SQL oracle.

Scale shapes:
- ``cms_build``: one scan -> per-row d-element cell array -> posexplode
  -> ONE groupBy(row_idx, col_idx). The explode is d x token count, but
  map-side partial aggregation collapses each task's contribution to
  <= depth*width cells BEFORE the exchange — the shuffle moves
  O(depth * width * n_tasks) rows, independent of corpus size. That
  collapse IS the sketch's reason to exist in Spark.
- ``cms_merge``: groupBy(row,col) SUM over two cell tables — bounded by
  2 * depth * width input rows.
- ``cms_query``: probe terms expand to d cells, broadcast-join the cell
  table (<= depth*width rows), MIN per term. Absent cells are true zeros
  (count 0), not nulls.

Guarantee (tested, not assumed): estimate >= true count always, and
P[estimate > true + (e/width)*N] <= exp(-depth) per the classic bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_merge", "cms_query", "cms_term_cells"]

_MAX_CELLS = 16_777_216  # depth*width guard: the cell table must stay broadcastable


def _check_shape(width: int, depth: int) -> None:
    if width < 2 or depth < 1:
        raise ValueError(f"cms: need width >= 2 and depth >= 1, got {width}x{depth}")
    if width * depth > _MAX_CELLS:
        raise ValueError(
            f"cms: {depth}x{width} = {depth * width} cells exceeds the "
            f"{_MAX_CELLS}-cell broadcast guard; widen error bounds instead"
        )


def cms_term_cells(term: F.Column, width: int, depth: int) -> F.Column:
    """``array<struct<row_idx:int, col_idx:int>>`` — the d cells a term
    touches. Shared by build and query so they can never disagree."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("row_idx"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(term, F.lit(f":{j}"))), 1, 15),
                        16,
                        10,
                    ).cast("long")
                    % width
                )
                .cast("int")
                .alias("col_idx"),
            )
            for j in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    term_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Sketch the multiset of ``term_col`` values → cell table
    ``(row_idx, col_idx, cnt)``, sparse (untouched cells are implicit 0).

    Null terms carry no frequency and are excluded (they are completeness
    findings, not vocabulary). The caller owns tokenization — pass an
    already-exploded term column so the sketch grain is explicit.
    """
    _check_shape(width, depth)
    cells = df.where(F.col(term_col).isNotNull()).select(
        F.explode(cms_term_cells(F.col(term_col), width, depth)).alias("cell")
    )
    return (
        cells.groupBy(
            F.col("cell.row_idx").alias("row_idx"),
            F.col("cell.col_idx").alias("col_idx"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sk_a: DataFrame, sk_b: DataFrame) -> DataFrame:
    """Union sketch = cell-wise sum (CMS is linear: sketch(A ⊎ B) ==
    sketch(A) + sketch(B), EXACTLY — pinned by test, not approximately)."""
    return (
        sk_a.unionByName(sk_b)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    term_col: str,
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-query the sketch for every row of ``probes`` →
    ``(<term_col>, cms_est)`` with ``cms_est = MIN over rows of the
    term's cell counts`` (missing cell ⇒ 0 ⇒ estimate 0: the term was
    provably never sketched).

    Plan: probes expand to d rows, the ≤ depth*width cell table
    broadcast-joins, one groupBy(term) MIN. The sketch side is bounded by
    construction; the probe side is whatever the caller asks about.
    """
    _check_shape(width, depth)
    probe_cells = probes.where(F.col(term_col).isNotNull()).select(
        F.col(term_col),
        F.explode(cms_term_cells(F.col(term_col), width, depth)).alias("cell"),
    )
    joined = probe_cells.join(
        F.broadcast(sketch),
        (F.col("cell.row_idx") == F.col("row_idx"))
        & (F.col("cell.col_idx") == F.col("col_idx")),
        "left",
    )
    return joined.groupBy(term_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est")
    )
