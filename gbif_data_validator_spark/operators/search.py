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
_POS_SCHEME = "pos-index-v1"


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


def _positional_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, pos, term): 0-based token index over the EMPTY-FILTERED
    whitespace tokenization (filter-before-posexplode, so a tab-led text
    — which ``trim``'s ASCII-only strip leaves with a leading "" token —
    still numbers its real words 0,1,2…)."""
    words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda w: w != F.lit(""),
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.posexplode(words))
        .toDF("doc_id", "pos", "term")
    )


def build_positional_index(
    df: DataFrame, id_col: str, text_col: str, path: str, n_buckets: int = 64
) -> None:
    """Positional complement of :func:`build_term_index`: postings are
    (term, doc_id, pos) — one row per token OCCURRENCE — hash-bucketed by
    term so a phrase query's scan prunes to its terms' posting files."""
    posts = _positional_tokens(df, id_col, text_col).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    )
    posts.write.partitionBy("bucket").mode("errorifexists").parquet(
        path + "/postings"
    )
    df.sparkSession.createDataFrame(
        [(_POS_SCHEME,)], "scheme string"
    ).write.mode("errorifexists").parquet(path + "/stats")


def phrase_search(
    spark: SparkSession, path: str, phrase: "list[str]", k: int = 10
) -> DataFrame:
    """→ top-``k`` ``(doc_id, n_occurrences, first_pos)`` for an exact
    consecutive-token phrase, via the anchor trick: a posting for
    ``phrase[i]`` at position ``p`` votes for an occurrence anchored at
    ``p - i``; an anchor with all ``len(phrase)`` DISTINCT offsets present
    is a match. One pruned scan + one broadcast join + one groupBy — no
    (len-1)-way self-join chain, and repeated phrase terms (``"table
    table"``) are exact, because each offset must be witnessed separately.
    Ranked by occurrence count desc, doc_id asc (deterministic page)."""
    if not phrase:
        raise ValueError("phrase_search: empty phrase")
    stats = spark.read.parquet(path + "/stats").collect()[0]
    if stats.scheme != _POS_SCHEME:
        raise ValueError(f"unknown index scheme {stats.scheme!r}")
    terms = [t.lower() for t in phrase]
    n = len(terms)
    qdf = spark.createDataFrame(
        list(enumerate(terms)), "off int, term string"
    )
    posts = spark.read.parquet(path + "/postings").where(
        F.col("term").isin(sorted(set(terms)))
    )
    anchors = (
        posts.join(F.broadcast(qdf), "term")
        .select("doc_id", (F.col("pos") - F.col("off")).alias("a"), "off")
        .where(F.col("a") >= 0)
    )
    occ = (
        anchors.groupBy("doc_id", "a")
        .agg(F.countDistinct("off").alias("n_off"))
        .where(F.col("n_off") == n)
    )
    return (
        occ.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("a").cast("long").alias("first_pos"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
        .limit(k)
    )


def kwic_snippets(
    df: DataFrame, id_col: str, text_col: str, needle: str, radius: int = 30
) -> DataFrame:
    """Keyword-in-context: for every doc whose text contains ``needle``
    (case-insensitive substring), → (doc_id, match_pos, snippet) where
    ``match_pos`` is the 1-based character position of the FIRST match and
    ``snippet`` is the surrounding ``radius`` characters each side. Pure
    Column algebra (instr + substring), zero shuffle — the search face of
    the verbatim-sample collector (reference:
    validator-processor .../collector/RecordEvaluationResultCollector.java
    keeps raw offending values; this keeps the raw surrounding context)."""
    if not needle:
        raise ValueError("kwic_snippets: empty needle")
    pos = F.instr(F.lower(F.col(text_col)), needle.lower())
    start = F.greatest(F.lit(1), pos - F.lit(radius))
    width = F.lit(radius) + F.lit(len(needle)) + F.lit(radius)
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            pos.cast("long").alias("match_pos"),
            F.substring(F.col(text_col), start, width).alias("snippet"),
        )
        .where(F.col("match_pos") > 0)
    )


def bm25_topk(
    df: DataFrame,
    terms: "list[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 (Robertson/Sparck Jones) top-``k`` over the corpus →
    ``(doc_id, n_matched, score_micro)``, disjunctive (any query term),
    ranked ``(score desc, doc_id)`` so the page is deterministic.

    Exactness contract: the corpus-sized math — tf, doclen, df, avgdl,
    saturation ``tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))`` — is integer
    counts and fixed-order IEEE double ops (div/mul/add, all correctly
    rounded → bit-identical in any engine that parses the same literals).
    The ONE non-portable op, ``ln`` in idf, never touches the JVM (whose
    ``Math.log`` intrinsic is ≤1-ulp, not bit-portable): idf for the
    |terms| query words is computed ONCE on the driver with C libm —
    the same library DuckDB's ``ln`` binds — and injected as literals.
    Scores floor at micro precision, so even a foreign libm's last-ulp
    wobble would need a value within ~1e-16 of a micro boundary to show.

    Plan shape: one token explode → ONE doc-grain groupBy producing
    ``(dl, tf_per_query_term…)`` (map-combinable count + |terms|
    conditional sums — doclen and tfs in the same shuffle);
    ``localCheckpoint`` pins that doc-grain table because it feeds TWO
    actions (a 1-row stats fold the driver needs for avgdl/df, then the
    scoring pass); scoring is zero-shuffle column algebra and top-k is
    ``orderBy().limit()`` → TakeOrdered, never a global sort. Driver
    traffic: |terms|+2 scalars. At 10^12 docs the only corpus-sized
    shuffle is the one doc-grain aggregation.
    """
    import math

    if not terms:
        raise ValueError("bm25_topk: empty query")
    q = sorted(set(t.lower() for t in terms))
    toks = _tokens(df, id_col, text_col)
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("dl"),
            *[
                F.sum((F.col("term") == t).cast("long")).alias(f"tf_{i}")
                for i, t in enumerate(q)
            ],
        )
        .localCheckpoint(eager=False)  # reused: stats fold + scoring pass
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(q))
        ],
    ).first()
    n_docs = int(stats["n_docs"])
    if n_docs == 0:
        raise ValueError("bm25_topk: corpus has no tokenized documents")
    avgdl = float(stats["total_tokens"]) / float(n_docs)
    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0
    dl_d = F.col("dl").cast("double")
    score = F.lit(0.0)
    matched = F.lit(0)
    for i in range(len(q)):
        idf = math.log(
            (n_docs - int(stats[f"df_{i}"]) + 0.5) / (int(stats[f"df_{i}"]) + 0.5)
            + 1.0
        )
        tf_d = F.col(f"tf_{i}").cast("double")
        contrib = (
            F.lit(idf)
            * (tf_d * F.lit(k1p1))
            / (tf_d + F.lit(k1) * (F.lit(one_minus_b) + F.lit(b) * dl_d / F.lit(avgdl)))
        )
        score = score + contrib
        matched = matched + (F.col(f"tf_{i}") > 0).cast("int")
    return (
        per_doc.select(
            "doc_id",
            matched.cast("long").alias("n_matched"),
            F.floor(F.lit(1e6) * score).cast("long").alias("score_micro"),
        )
        .where(F.col("n_matched") > 0)
        .orderBy(F.desc("score_micro"), F.asc("doc_id"))
        .limit(k)
    )
