"""Persisted inverted term index + keyword-search face.

The searchable complement of the dedup/similarity family: ``build_term_index``
writes the corpus once as (term → posting) parquet; ``search_term_index``
answers conjunctive (AND) keyword queries by reading ONLY the query terms'
postings — parquet predicate pushdown on the ``term`` column prunes the rest
of the index at the scan, so query cost scales with posting-list size, never
corpus size. The reference's analog surface is its term-frequency collector
(validator-processor .../collector/TermsFrequencyCollector.java) — this is
that statistic made queryable.

Scoring is TF-IDF-shaped but exactly rational: each matched term contributes
``floor(1e6 · (tf · n_docs) / (n_doc_terms · df))`` micro-units — integer
products and one pinned-order division, so scores are bit-exact, replayable
in any SQL engine, and independent of partitioning (no ``ln``, which is not
bit-portable across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEME = "term-index-v1"


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
        .where(F.col("term") != "")
    )


def build_term_index(
    df: DataFrame, id_col: str, text_col: str, path: str, n_buckets: int = 64
) -> None:
    """Write the inverted index under ``path``: ``postings/`` =
    (term, doc_id, tf, n_doc_terms) bucketed by ``xxhash64(term)`` so a
    query's terms hit few files; ``stats/`` = 1 row (n_docs, scheme).
    Document frequency is NOT materialized — it is ``COUNT(*)`` per term
    over postings, recomputed at query time from the already-pruned scan
    (storing it would denormalize; the pruned count is one tiny agg)."""
    toks = _tokens(df, id_col, text_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_doc_terms"))
    posts = tf.join(doclen, "doc_id").withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )
    posts.write.partitionBy("bucket").mode("errorifexists").parquet(
        path + "/postings"
    )
    n_docs = df.where(F.col(text_col).isNotNull()).count()
    df.sparkSession.createDataFrame(
        [(int(n_docs), _SCHEME)], "n_docs long, scheme string"
    ).write.mode("errorifexists").parquet(path + "/stats")


def search_term_index(
    spark: SparkSession, path: str, terms: "list[str]", k: int = 10
) -> DataFrame:
    """→ top-``k`` ``(doc_id, n_matched, score_ppm)`` for a conjunctive
    query: docs containing ALL ``terms``, ranked by the exact rational
    TF-IDF score (ties broken by doc_id, so the page is deterministic).
    Reads only the query terms' postings (term + bucket pushdown)."""
    if not terms:
        raise ValueError("search_term_index: empty query")
    stats = spark.read.parquet(path + "/stats").collect()[0]
    if stats.scheme != _SCHEME:
        raise ValueError(f"unknown index scheme {stats.scheme!r}")
    n_docs = int(stats.n_docs)
    q = sorted(set(t.lower() for t in terms))
    posts = spark.read.parquet(path + "/postings").where(F.col("term").isin(q))
    dfreq = posts.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = posts.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        F.floor(
            (F.lit(1000000.0) * (F.col("tf").cast("double") * F.lit(n_docs)))
            / (F.col("n_doc_terms").cast("double") * F.col("df"))
        )
        .cast("long")
        .alias("c"),
    )
    return (
        contrib.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.sum("c").cast("long").alias("score_ppm"),
        )
        .where(F.col("n_matched") == len(q))
        .orderBy(F.desc("score_ppm"), F.asc("doc_id"))
        .limit(k)
    )
