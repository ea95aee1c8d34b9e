"""Training-data curation operators: deterministic sequence packing and
benchmark decontamination.

No reference analog (the reference validates biodiversity archives); these
extend the LLM-pipeline family (dedup/textstats/sampling) with the two
remaining passes a corpus pipeline runs between validation and training:
grouping documents into token-budget bins for batch assembly, and flagging
documents that overlap an evaluation benchmark.

Scale notes:
- ``pack_bins``: the global-sort formulation of first-fit packing does not
  distribute (one ordered partition). Instead documents are sharded by a
  deterministic key hash and packed WITHIN each shard by a contiguous-fill
  cumulative-sum window — each shard's window sorts only its slice, shards
  pack in parallel, and the assignment is a pure function of (key, tokens),
  so re-runs and engines agree (DuckDB-oracle-able).
- ``ngram_contamination``: the benchmark side is tiny by definition (an
  eval set), so its distinct n-gram set broadcasts; the corpus side is one
  narrow explode + broadcast join + re-aggregation keyed by doc — no
  corpus×corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import shingles
from .sampling import hash_bucket


def pack_bins(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 1024,
) -> DataFrame:
    """→ (id, shard, bin_id, tokens): contiguous-fill packing of documents
    into per-shard bins of ~``budget`` tokens. Within a shard, documents are
    ordered tokens-descending (FFD-style: big items first leaves less
    fragmentation) with the id as the deterministic tie-break; a document
    goes into the bin its cumulative start falls in, so every bin except
    possibly the last holds ≥ budget - (max item) tokens and bins overflow
    by at most one document. A document larger than the budget gets a bin
    of its own. Training batches key on (shard, bin_id).

    The whole operator is one window over each shard's slice — the shuffle
    moves (id, tokens) only, never text."""
    shard = hash_bucket(F.col(id_col), n_shards)
    w = Window.partitionBy("shard").orderBy(
        F.col(tokens_col).desc(), F.col(id_col)
    )
    cum = F.sum(tokens_col).over(w)
    return (
        df.select(F.col(id_col), F.col(tokens_col), shard.alias("shard"))
        .withColumn(
            "bin_id",
            F.floor((cum - F.col(tokens_col)).cast("double") / F.lit(float(budget))),
        )
        .select(id_col, "shard", "bin_id", F.col(tokens_col).alias("tokens"))
    )


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """→ (id, n_grams, n_hits, ratio): per-document overlap with the
    benchmark's word n-gram set — the standard decontamination check
    (a training document sharing long n-grams with an eval benchmark
    leaks the benchmark). Documents with fewer than n words emit no row
    (no n-grams → nothing to test).

    Plan: distinct n-grams of the (small) benchmark broadcast; the corpus
    explodes its n-grams once, left-joins the broadcast set, and
    re-aggregates per document. ``ratio`` is hits / distinct doc n-grams."""
    doc_sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), n).alias("sh")
    ).where(F.size("sh") > 0)
    ex = doc_sh.select(
        F.col(id_col), F.size("sh").alias("n_grams"), F.explode("sh").alias("g")
    )
    bench_set = (
        bench.select(F.explode(shingles(F.col(bench_text_col), n)).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        ex.join(F.broadcast(bench_set), on="g", how="left")
        .groupBy(id_col, "n_grams")
        .agg(F.count("_hit").alias("n_hits"))
        .withColumn(
            "ratio",
            F.round(F.col("n_hits") / F.col("n_grams").cast("double"), 6),
        )
    )
