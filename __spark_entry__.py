"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship validation query at sf0.001.
``queries()``   — one callable per implemented operator (SURVEY.md §2 +
                  training-data pipeline ops), each (spark, sf_dir) → DF.
``oracle_sql()``— DuckDB-equivalent SQL per query (omitted for genuinely
                  non-SQL ops → driver does rows-only checks).

Column names are aliased identically on both sides; doubles are rounded
in-query on both sides; money sums go through DECIMAL(18,2) then DOUBLE so
both engines produce bit-identical values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared literals (mirrored verbatim into the SQL oracles)
# ---------------------------------------------------------------------------

KNOWN_LANGS = ["de", "en", "es", "fr"]          # 'zh' deliberately excluded → orphans
KNOWN_SOURCES = [f"src{i}" for i in range(15)]  # src15..19 → orphans
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "that", "for", "on", "with", "as", "was", "at", "by", "be"]
BPE_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
TS_LO, TS_HI = "2024-01-05 00:00:00", "2024-01-25 00:00:00"

LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "con", "del"],
    "it": ["il", "che", "di", "non", "per", "una", "sono", "con"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, round-robin repartitioned to full parallelism. The sf
    testdata is one small parquet file → one input split; CPU-heavy text
    operators (shingling, signature UDFs) would otherwise run single-task.
    At production scale the input is already thousands of splits and this
    repartition is a no-op choice — compute >> shuffle for these operators
    either way."""
    return _docs(spark, sf_dir).repartition(spark.sparkContext.defaultParallelism)


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the documents-table validation battery (issue counts per
    check) at sf0.001 — the engine's pass-1+2 result model on real data."""
    return _q_doc_check_counts(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# validation-engine queries (SURVEY.md §2)
# ---------------------------------------------------------------------------


def _q_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 TermsFrequencyCollector: non-blank count per column (one scan)."""
    from gbif_data_validator_spark.operators.metrics import term_frequency

    return term_frequency(_docs(spark, sf_dir))


def _q_profile_nulls_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 extension: nulls + exact distinct per column, single agg scan."""
    d = _docs(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in ["doc_id", "text", "lang", "source", "n_chars"]:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}_distinct"))
    return d.agg(*aggs)


def _q_uniqueness_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 uniqueness via salted two-phase agg: duplicated l_orderkey."""
    from gbif_data_validator_spark.operators.uniqueness import duplicate_keys

    li = _tbl(spark, sf_dir, "lineitem")
    return duplicate_keys(li, "l_orderkey").orderBy("l_orderkey")


def _q_uniqueness_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2 reference-parity variant: sort + lag adjacent-compare (the
    reference's literal external-sort+awk algorithm); same result as the
    salted hash-agg path."""
    from gbif_data_validator_spark.operators.uniqueness import duplicate_keys_sorted

    li = _tbl(spark, sf_dir, "lineitem")
    return duplicate_keys_sorted(li, "l_orderkey").orderBy("l_orderkey")


#: Exact two-sample KS per day-window vs the pooled distribution, evaluated
#: at every pooled distinct value (the sup of the ECDF gap is attained at a
#: jump point, so this is exact). ONE SQL text executed verbatim by BOTH
#: Spark and DuckDB — the strongest oracle form. The engine's production
#: drift path uses mergeable quantile sketches; this query pins the KS
#: semantics those sketches approximate.
_KS_EXACT_SQL = """
    WITH pts AS (
      SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING) AS w,
             CAST(value AS DOUBLE) AS x
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    tot AS (SELECT count(*) AS n FROM pts),
    wn AS (SELECT w, count(*) AS n_w FROM pts GROUP BY w),
    vals AS (SELECT DISTINCT x FROM pts),
    pc AS (SELECT x, count(*) AS c FROM pts GROUP BY x),
    fp AS (SELECT x, SUM(c) OVER (ORDER BY x) AS cum_pool FROM pc),
    wc AS (SELECT w, x, count(*) AS c FROM pts GROUP BY w, x),
    grid AS (SELECT wn.w, vals.x FROM wn CROSS JOIN vals),
    merged AS (
      SELECT g.w, g.x, COALESCE(wc.c, 0) AS c
      FROM grid g LEFT JOIN wc ON wc.w = g.w AND wc.x = g.x
    ),
    fw AS (SELECT w, x, SUM(c) OVER (PARTITION BY w ORDER BY x) AS cum_w FROM merged),
    d AS (
      SELECT fw.w AS w,
             MAX(ABS(CAST(fw.cum_w AS DOUBLE) / wn.n_w
                     - CAST(fp.cum_pool AS DOUBLE) / tot.n)) AS ks
      FROM fw JOIN wn ON wn.w = fw.w JOIN fp ON fp.x = fw.x CROSS JOIN tot
      GROUP BY fw.w
    )
    SELECT w AS win, round(ks, 6) AS ks_stat FROM d ORDER BY win
"""


def _q_drift_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tbl(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_KS_EXACT_SQL)


def _q_categorical_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI + chi-square categorical drift of events.event_type per day vs
    the pooled distribution (exact counts → exact oracle)."""
    from gbif_data_validator_spark.operators.drift import categorical_drift

    e = _tbl(spark, sf_dir, "events")
    return (
        categorical_drift(e, "event_type", ts_col="ts", window_fmt="yyyy-MM-dd")
        .select("window", "n", "psi", "chi2")
        .orderBy("window")
    )


def _q_ref_orphans_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 broadcast anti-join referential: documents.source ∉ source dim."""
    from gbif_data_validator_spark.operators.referential import orphan_rows

    d = _docs(spark, sf_dir)
    dim = spark.createDataFrame([(s,) for s in KNOWN_SOURCES], schema="source string")
    return (
        orphan_rows(d, dim, "source", "source")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


def _doc_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents-shaped pass-1 battery → violations (doc_id, check_id, found)."""
    return _doc_battery(_docs(spark, sf_dir))


def _doc_battery(d: DataFrame) -> DataFrame:
    """The same battery over ANY documents-shaped DataFrame (the sampled
    estimator runs it over a hash sample)."""
    lang_arr = F.array(*[F.lit(x) for x in KNOWN_LANGS])
    src_arr = F.array(*[F.lit(x) for x in KNOWN_SOURCES])
    checks = [
        F.when(
            F.col("text").isNull() | ~F.col("text").rlike(r"\S"),
            F.struct(F.lit("TEXT_EMPTY").alias("check_id"), F.coalesce(F.col("text"), F.lit("NULL")).alias("found")),
        ),
        F.when(
            F.col("n_chars") != F.length("text"),
            F.struct(F.lit("N_CHARS_MISMATCH").alias("check_id"), F.col("n_chars").cast("string").alias("found")),
        ),
        F.when(
            ~F.array_contains(lang_arr, F.col("lang")),
            F.struct(F.lit("LANG_UNKNOWN").alias("check_id"), F.col("lang").alias("found")),
        ),
        F.when(
            ~F.array_contains(src_arr, F.col("source")),
            F.struct(F.lit("SOURCE_UNKNOWN").alias("check_id"), F.col("source").alias("found")),
        ),
    ]
    packed = F.filter(F.array(*checks), lambda x: x.isNotNull())
    return d.select("doc_id", F.explode(packed).alias("v")).select(
        "doc_id", F.col("v.check_id").alias("check_id"), F.col("v.found").alias("found")
    )


_DOC_VIOLATIONS_SQL = """
    SELECT doc_id, check_id, found FROM (
        SELECT doc_id, 'TEXT_EMPTY' AS check_id, coalesce(text,'NULL') AS found,
               (text IS NULL OR NOT regexp_matches(text, '\\S')) AS hit FROM documents
        UNION ALL
        SELECT doc_id, 'N_CHARS_MISMATCH', CAST(n_chars AS VARCHAR),
               (n_chars <> length(text)) FROM documents
        UNION ALL
        SELECT doc_id, 'LANG_UNKNOWN', lang,
               (NOT list_contains(['de','en','es','fr'], lang)) FROM documents
        UNION ALL
        SELECT doc_id, 'SOURCE_UNKNOWN', source,
               (NOT list_contains({sources}, source)) FROM documents
    ) WHERE hit
"""


def _q_doc_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-family record checks exploded to the violations contract."""
    return _doc_violations(spark, sf_dir).orderBy("doc_id", "check_id")


def _q_doc_check_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 issue counting: count by check_id."""
    return (
        _doc_violations(spark, sf_dir)
        .groupBy("check_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("check_id")
    )


def _q_doc_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 distinct-first top-10 sampler over the documents violations."""
    from gbif_data_validator_spark.operators.sampling import distinct_first_samples

    v = _doc_violations(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("url"),
        "check_id",
        F.lit("").alias("expected"),
        "found",
        F.create_map().cast("map<string,string>").alias("related_data"),
    )
    # order by numeric doc_id re-expressed as zero-padded string so Spark's
    # string-ordered window and the SQL oracle agree
    v = v.withColumn("url", F.lpad(F.col("url"), 10, "0"))
    return distinct_first_samples(v, 10).select("check_id", "url", "found", "sample_rank")


def _q_verbatim_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/S10 issue→verbatim reassembly: sampled violations joined back to
    their full source rows (broadcast sample side)."""
    from gbif_data_validator_spark.operators.verbatim import verbatim_samples

    v = _doc_violations(spark, sf_dir).select(
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("url"),
        "check_id",
        F.lit("").alias("expected"),
        "found",
        F.create_map().cast("map<string,string>").alias("related_data"),
    )
    src = _docs(spark, sf_dir).withColumn(
        "url", F.lpad(F.col("doc_id").cast("string"), 10, "0")
    )
    return verbatim_samples(v, src, key_col="url").select(
        "check_id", "url", "lang", "source", "n_chars"
    ).orderBy("check_id", "url")


def _q_interpreted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 interpreted-term counts: typed derivations that parse (events)."""
    e = _tbl(spark, sf_dir, "events")
    return e.agg(
        F.count(F.col("ts")).alias("ts_ok"),
        F.count(F.when(F.col("value").cast("double").isNotNull(), 1)).alias("value_ok"),
        F.count(F.try_to_timestamp(F.col("event_type"))).alias("event_type_as_ts"),
    )


def _q_events_ts_unlikely(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC_TS_UNLIKELY analog on events: ts outside the plausibility window."""
    e = _tbl(spark, sf_dir, "events")
    return (
        e.where((F.col("ts") < F.lit(TS_LO).cast("timestamp")) | (F.col("ts") >= F.lit(TS_HI).cast("timestamp")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


def _q_events_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed warc_ts-style aggregation: tumbling 1-day windows x type."""
    e = _tbl(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    return (
        e.groupBy(day.alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General agg engine check (TPC-H Q1 shape) with decimal-exact sums."""
    li = _tbl(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_data_field_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 DataUniquenessEvaluator: the same salted uniqueness operator on a
    *data* column (o_custkey) rather than the record id."""
    from gbif_data_validator_spark.operators.uniqueness import duplicate_keys

    o = _tbl(spark, sf_dir, "orders")
    return duplicate_keys(o, "o_custkey").orderBy("o_custkey")


def _q_frequent_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profiler top-k: most frequent event_type values (exact, tie-broken)."""
    from gbif_data_validator_spark.operators.metrics import frequent_values

    return frequent_values(_tbl(spark, sf_dir, "events"), "event_type", k=5).orderBy(
        "rank"
    )


def _q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics extension: exact fixed-width histogram of documents.n_chars."""
    from gbif_data_validator_spark.operators.metrics import length_histogram

    return length_histogram(_docs(spark, sf_dir), "n_chars", width=50).orderBy("bucket")


def _q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup 'keep one representative' pass: surviving rows (min doc_id
    per normalized-content group)."""
    from gbif_data_validator_spark.operators.dedup import dedup_exact

    return (
        dedup_exact(_docs(spark, sf_dir), "doc_id", "text")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def _q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table join engine check (TPC-H Q3 shape): customer ⋈ orders ⋈
    lineitem with the small filtered dimension broadcast; decimal-exact
    revenue so Spark and DuckDB agree bit-for-bit."""
    c = _tbl(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _tbl(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = _tbl(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def _q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via analytic windows: a new session starts after a
    ≥30-min gap per user; per-session event counts. The batch analog of the
    streaming session-window operator."""
    e = _tbl(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # NTZ-safe microsecond-exact gap: timestamp difference as an interval
    new_sess = F.when(
        prev.isNull() | ((F.col("ts") - prev) >= F.expr("INTERVAL 1800 SECONDS")), 1
    ).otherwise(0)
    sess = e.withColumn("sess_id", F.sum(new_sess).over(w))
    return (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
        )
        .orderBy("user_id", "sess_id")
    )


def _q_star_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema referential pass (DwcDataFile analog): lineitem as an
    extension of an orders core restricted to 1995 — post-1995 lineitems
    orphan out as RECORD_REFERENTIAL_INTEGRITY_VIOLATION; per-check counts
    + distinct offending keys."""
    from gbif_data_validator_spark.plans.star import validate_star

    core = _tbl(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li = _tbl(spark, sf_dir, "lineitem")
    from gbif_data_validator_spark.model import CheckId

    v = validate_star(core, {"lineitem": (li, "l_orderkey")}, core_key="o_orderkey")
    # restrict to the referential rows the oracle models (blank-key findings
    # would otherwise add groups the SQL side lacks if the fixture gained any)
    v = v.where(F.col("check_id") == CheckId.RECORD_REFERENTIAL_INTEGRITY_VIOLATION)
    return (
        v.groupBy("partition_id", "check_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("url").alias("n_keys"),
        )
        .orderBy("partition_id", "check_id")
    )


def _q_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle anti-join shape (J1 at big-big scale): customers with no
    orders on/after 2001-01-01 — the non-broadcast referential variant."""
    c = _tbl(spark, sf_dir, "customer")
    recent = _tbl(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        c.join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def _q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join (lineitem ⋈ orders ⋈ customer ⋈ supplier
    ⋈ nation ⋈ region) with the dimension chain broadcast; revenue per
    nation where customer and supplier share the nation. Decimal-exact."""
    li = _tbl(spark, sf_dir, "lineitem")
    o = _tbl(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    c = _tbl(spark, sf_dir, "customer")
    s = _tbl(spark, sf_dir, "supplier")
    n = _tbl(spark, sf_dir, "nation")
    r = _tbl(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .where(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def _q_events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured interpretation: parse the props JSON column with a
    declared schema (from_json — parse failure → NULL, a finding in the
    engine's semantics) and aggregate the extracted field."""
    e = _tbl(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        e.groupBy("event_type")
        .agg(
            F.count(k).alias("n_parsed"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .orderBy("event_type")
    )


def _q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (the engine's internal partitioned-profile shape,
    pinned against SQL GROUPING SETS semantics): per-(day, type), per-day,
    and grand-total counts in one pass; NULL grouping keys coalesced for a
    stable compare."""
    e = _tbl(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    return (
        e.where(F.col("ts").isNotNull())
        .rollup(day.alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce(F.col("day"), F.lit("ALL")).alias("day"),
            F.coalesce(F.col("event_type"), F.lit("ALL")).alias("event_type"),
            "n",
        )
        .orderBy("day", "event_type")
    )


def _q_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 top-N per key: 3 highest-value orders per customer (custkey<50)."""
    o = _tbl(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.where(F.col("o_custkey") < 50)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias("total_price"), "rank")
        .orderBy("o_custkey", "rank")
    )


def _q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (point-in-time) join, operators/temporal.py::asof_join: each
    click attributed to the most recent same-user error at-or-before it.
    Spark plan is union + ONE window (|L|+|R| rows, one shuffle, no join);
    the oracle is the classic inequality-join + QUALIFY formulation that
    explodes per-key pairs — same answer, different asymptotics."""
    from gbif_data_validator_spark.operators.temporal import asof_join

    e = _tbl(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    errors = e.where(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("event_id").alias("err_id"), F.col("value").alias("err_value")
    )
    out = asof_join(
        clicks,
        errors,
        on=["user_id"],
        left_ts="click_ts",
        right_ts="ts",
        right_cols=["err_id", "err_value"],
        tiebreak=["err_id"],
    )
    return out.select(
        "click_id",
        "user_id",
        "click_ts",
        F.col("r_ts").alias("err_ts"),
        F.col("r_err_id").alias("err_id"),
        F.col("r_err_value").alias("err_value"),
    ).orderBy("click_id")


def _q_interval_join_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join, operators/temporal.py::interval_join: clicks falling in
    any 60-minute incident window opened by a top-50-severity error. Spark
    plan is the bucket-explode equi-join (linear shuffle) — the naive range
    predicate would plan a BroadcastNestedLoopJoin; the oracle IS that
    naive inequality join (fine at oracle scale)."""
    from gbif_data_validator_spark.operators.temporal import interval_join

    e = _tbl(spark, sf_dir, "events")
    inc = (
        e.where(F.col("event_type") == "error")
        .orderBy(F.col("value").desc(), "event_id")
        .limit(50)
        .select(
            F.col("event_id").alias("incident_id"),
            F.col("ts").alias("incident_start"),
            (F.col("ts") + F.expr("INTERVAL 60 MINUTES")).alias("incident_end"),
        )
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    out = interval_join(clicks, inc, "click_ts", "incident_start", "incident_end")
    return out.select(
        "click_id", "user_id", "click_ts", "incident_id", "incident_start"
    ).orderBy("click_id", "incident_id")


# ---------------------------------------------------------------------------
# training-data pipeline queries
# ---------------------------------------------------------------------------


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.functions.textstats import content_fingerprint

    return _docs_spread(spark, sf_dir).select(
        "doc_id", content_fingerprint(F.col("text")).alias("fingerprint")
    ).orderBy("doc_id")


def _q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped listing face: doc_ids are rank-filtered to max_ids BEFORE the
    aggregation (bounded reducer state at any group size) and the clip is
    reported, not silent — ids_json + ids_truncated are part of the oracle
    contract."""
    from gbif_data_validator_spark.operators.dedup import exact_duplicate_groups

    return exact_duplicate_groups(
        _docs(spark, sf_dir), "doc_id", "text", max_ids=3
    ).select(
        "fingerprint",
        "n_docs",
        F.to_json("doc_ids").alias("ids_json"),
        "ids_truncated",
    )


def _q_paragraph_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (sentence-level here) exact dedup: content units shared
    across documents. The synthetic corpus has none — a 0-row match against
    the oracle is still a correctness check of the split/hash/group logic."""
    from gbif_data_validator_spark.operators.dedup import paragraph_duplicate_groups

    return (
        paragraph_duplicate_groups(
            _docs(spark, sf_dir), "doc_id", "text", min_chars=40,
            sep_regex=r"\. ", max_ids=3,
        )
        .select(
            "fingerprint",
            "n_docs",
            F.to_json("doc_ids").alias("ids_json"),
            "ids_truncated",
        )
        .orderBy("fingerprint")
    )


def _q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.functions import textstats as ts

    d = _docs_spread(spark, sf_dir)
    return d.select(
        "doc_id",
        ts.ws_token_count(F.col("text")).alias("ws_tokens"),
        ts.bpe_token_count(F.col("text")).alias("bpe_tokens"),
    ).orderBy("doc_id")


def _q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.functions import textstats as ts

    d = _docs_spread(spark, sf_dir)
    return d.select(
        "doc_id", F.round(ts.quality_score(F.col("text")), 4).alias("quality")
    ).orderBy("doc_id")


#: mixture_plan weights (parts-per-million): src19 deliberately ABSENT
#: (→ weight-0 "drop" row) and 'books_extra' deliberately NOT in the
#: corpus (→ available-0 oversubscribed row); src0 weight forces repeats.
MIXTURE_WEIGHTS_PPM = {
    "src0": 400_000,
    "src1": 250_000,
    "src2": 150_000,
    "src3": 100_000,
    "books_extra": 50_000,
    **{f"src{i}": 3_125 for i in range(4, 19)},
}
MIXTURE_BUDGET = 10_000_000


def _mixture_plan_oracle_sql() -> str:
    """Integer-ppm mixture plan replayed in SQL: same weights literal
    (VALUES list), same integer-division arithmetic (DuckDB // on BIGINT
    ≡ the Spark side's DECIMAL floor-divides)."""
    values = ",\n                     ".join(
        f"('{s}', {p})" for s, p in sorted(MIXTURE_WEIGHTS_PPM.items())
    )
    b = MIXTURE_BUDGET
    return f"""
            WITH avail AS (
              SELECT source, CAST(SUM(n_chars) AS BIGINT) AS available_tokens
              FROM documents GROUP BY 1
            ),
            w(source, weight_ppm) AS (
              VALUES {values}
            ),
            j AS (
              SELECT COALESCE(a.source, w.source) AS source,
                     COALESCE(a.available_tokens, 0) AS available_tokens,
                     CAST(COALESCE(w.weight_ppm, 0) AS BIGINT) AS weight_ppm
              FROM avail a FULL OUTER JOIN w ON a.source = w.source
            )
            SELECT source, available_tokens, weight_ppm,
                   CAST(({b} * weight_ppm) // 1000000 AS BIGINT) AS target_tokens,
                   CASE WHEN available_tokens > 0
                        THEN CAST((({b} * weight_ppm) // 1000000) * 1000000
                                  // available_tokens AS BIGINT)
                   END AS epochs_micro,
                   ({b} * weight_ppm) // 1000000 > available_tokens
                     AS oversubscribed
            FROM j ORDER BY source
        """


def _q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture planner: integer-ppm weights × budget → exact
    per-source targets, µ-epoch repeat factors, and loud oversubscription
    flags (operators/curation.py:mixture_token_plan). One agg + a
    |weights|-row outer join; all arithmetic integer/decimal so the plan
    is bit-identical across engines."""
    from gbif_data_validator_spark.operators.curation import mixture_token_plan

    return mixture_token_plan(
        _docs(spark, sf_dir), "source", "n_chars", MIXTURE_WEIGHTS_PPM,
        MIXTURE_BUDGET,
    ).orderBy("source")


def _q_quality_rank_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percentile normalization of the quality score — 'top 40%
    of EACH source' as one threshold on one column; ties broken by doc_id
    so the rank is a pure function of the data
    (operators/curation.py:rank_normalize)."""
    from gbif_data_validator_spark.functions import textstats as ts
    from gbif_data_validator_spark.operators.curation import rank_normalize

    d = _docs(spark, sf_dir).select(
        "doc_id", "source", F.round(ts.quality_score(F.col("text")), 4).alias("quality")
    )
    return rank_normalize(d, "source", "quality", "doc_id").orderBy("doc_id")


def _q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.functions.textstats import lang_id

    return _docs_spread(spark, sf_dir).select(
        "doc_id", lang_id(F.col("text")).alias("lang_pred")
    ).orderBy("doc_id")


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle census over the deterministic 23-host link graph
    (same edge arithmetic as the outlink fixtures) — the local-clustering
    signal: organic neighborhoods triangulate, link farms are stars/rings.
    Each triangle is generated exactly once (a<b<c wedge close); the
    oracle replays canonicalization, wedge build, and close in SQL."""
    from gbif_data_validator_spark.operators.graph import triangle_census

    idc = F.col("doc_id")
    edges = (
        _tbl(spark, sf_dir, "documents")
        .select(
            idc,
            F.explode(
                F.sequence(F.lit(1).cast("long"), idc % 3 + 1)
            ).alias("k"),
        )
        .select(
            F.concat(F.lit("h"), (idc % 23).cast("string")).alias("src"),
            F.concat(
                F.lit("h"), ((idc * 7 + F.col("k") * 13) % 23).cast("string")
            ).alias("dst"),
        )
    )
    return triangle_census(edges).orderBy("vertex")


#: Fellegi–Sunter field model for the record_linkage query: (m, u) per
#: compared column — shared by the Spark query and the oracle generator so
#: both engines consume identical driver-computed double literals.
_LINKAGE_FIELDS = {
    "c_name": (0.95, 0.005),
    "c_band": (0.9, 0.01),
    "c_mktsegment": (0.7, 0.2),
}


def _linkage_sides(spark: SparkSession, sf_dir: str):
    c = _tbl(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_name",
        (F.col("c_custkey") % 50).cast("string").alias("c_band"),
        "c_mktsegment",
    )
    k = F.col("c_custkey")
    left = c.where(k % 2 == 0)
    right = (
        c.where(k % 3 == 0)
        .withColumn(
            "c_name",
            F.when(k % 7 == 0, F.upper("c_name"))
            .when(k % 11 == 0, F.concat(F.col("c_name"), F.lit("x")))
            .otherwise(F.col("c_name")),
        )
        .withColumn(
            "c_band",
            F.when(
                k % 4 == 0, F.concat(F.lit("000-"), k.cast("string"))
            ).otherwise(F.col("c_band")),
        )
        .withColumn(
            "c_mktsegment",
            F.when(k % 9 == 0, F.lit(None).cast("string")).otherwise(
                F.col("c_mktsegment")
            ),
        )
    )
    return left, right


def _q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record linkage between two deterministic 'sources'
    derived from customer (right side: every 7th name case-perturbed —
    must still match under normalization; every 11th name typo'd with one
    appended char — only the FUZZY levenshtein<=1 tier keeps it matching;
    every 4th band replaced — disagreement; every 9th segment nulled —
    no-evidence 0). Blocked on nation; the log2 likelihood weights are
    computed driver-side and enter BOTH engines as identical double
    literals, so scores hash. Fixture is ASCII by construction: Spark's
    levenshtein counts CHARS, DuckDB's counts BYTES — they agree exactly
    on ASCII, documented in the operator."""
    from gbif_data_validator_spark.operators.linkage import linkage_scores

    left, right = _linkage_sides(spark, sf_dir)
    return linkage_scores(
        left,
        right,
        "c_nationkey",
        _LINKAGE_FIELDS,
        "c_custkey",
        "c_custkey",
        threshold=5.0,
        fuzzy={"c_name": 1},
    ).orderBy("id_a", "id_b")


def _linkage_oracle_sql() -> str:
    """Replay of `_q_record_linkage`: same perturbations, same blocking
    join, same CASE evidence chain with the SAME Python-computed weight
    literals (CAST AS DOUBLE so DuckDB never routes through DECIMAL)."""
    from gbif_data_validator_spark.operators.linkage import fs_weights

    w = fs_weights(_LINKAGE_FIELDS)
    n = r"trim(regexp_replace(lower({x}), '\s+', ' ', 'g'))"

    def eq(f: str) -> str:
        a, b = f"la_{f}", f"rb_{f}"
        # c_name carries the fuzzy levenshtein<=1 tier (ASCII fixture:
        # Spark counts chars, DuckDB bytes — identical on ASCII)
        if f == "c_name":
            return f"levenshtein({a}, {b}) <= 1"
        return f"{a} = {b}"

    def evid(f: str) -> str:
        wa, wd = w[f]
        a, b = f"la_{f}", f"rb_{f}"
        return (
            f"CASE WHEN {a} IS NULL OR {b} IS NULL THEN CAST(0.0 AS DOUBLE) "
            f"WHEN {eq(f)} THEN CAST({wa!r} AS DOUBLE) "
            f"ELSE CAST({wd!r} AS DOUBLE) END"
        )

    def bit(f: str) -> str:
        a, b = f"la_{f}", f"rb_{f}"
        return (
            f"CASE WHEN {a} IS NOT NULL AND {b} IS NOT NULL AND {eq(f)} "
            f"THEN 1 ELSE 0 END"
        )

    score = " + ".join(evid(f) for f in _LINKAGE_FIELDS)
    agree = " + ".join(bit(f) for f in _LINKAGE_FIELDS)
    return f"""
            WITH l AS (
              SELECT c_nationkey, c_custkey AS id_a,
                     {n.format(x='c_name')} AS la_c_name,
                     {n.format(x='CAST(c_custkey % 50 AS VARCHAR)')} AS la_c_band,
                     {n.format(x='c_mktsegment')} AS la_c_mktsegment
              FROM customer WHERE c_custkey % 2 = 0
            ),
            r AS (
              SELECT c_nationkey, c_custkey AS id_b,
                     {n.format(x="CASE WHEN c_custkey % 7 = 0 THEN upper(c_name) WHEN c_custkey % 11 = 0 THEN c_name || 'x' ELSE c_name END")} AS rb_c_name,
                     {n.format(x="CASE WHEN c_custkey % 4 = 0 THEN '000-' || CAST(c_custkey AS VARCHAR) ELSE CAST(c_custkey % 50 AS VARCHAR) END")} AS rb_c_band,
                     {n.format(x="CASE WHEN c_custkey % 9 = 0 THEN NULL ELSE c_mktsegment END")} AS rb_c_mktsegment
              FROM customer WHERE c_custkey % 3 = 0
            ),
            p AS (SELECT * FROM l JOIN r USING (c_nationkey)),
            scored AS (
              SELECT id_a, id_b, {agree} AS n_agree, {score} AS score
              FROM p
            )
            SELECT id_a, id_b, CAST(n_agree AS INTEGER) AS n_agree,
                   ROUND(score, 6) AS score,
                   score >= CAST(5.0 AS DOUBLE) AS is_match
            FROM scored ORDER BY id_a, id_b
        """


def _q_join_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy advisor for lineitem ⋈ orders: exact evidence (side
    sizes, key cardinalities, null keys, EXACT inner-join cardinality,
    heaviest-key share) + the verdict — join_explosion_audit's decision
    layer. Thresholds chosen so the sf-scale verdict exercises the
    non-broadcast path."""
    from gbif_data_validator_spark.operators.layout import join_advisor

    return join_advisor(
        _tbl(spark, sf_dir, "lineitem"),
        _tbl(spark, sf_dir, "orders"),
        "l_orderkey",
        "o_orderkey",
        broadcast_threshold_rows=100,
        skew_share_micro=900_000,
    )


def _q_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-concentration datasheet row: Gini of docs across sources +
    top-3 source share, exact integer micro-units; the global rank is a
    bucketed prefix sum (shard_plan pattern), never a one-reducer sort."""
    from gbif_data_validator_spark.operators.metrics import (
        concentration_census,
    )

    return concentration_census(_docs(spark, sf_dir), "source", top_k=3)


def _q_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """snapshot_as_of: reconstruct table state at a past instant from a
    CDC log (time travel without a table format). The deterministic log
    over orders plants same-timestamp upsert+delete collisions (keys
    %10 == 0) so the documented op-DESC tie-break is itself oracled."""
    from gbif_data_validator_spark.operators.snapshot import snapshot_as_of

    o = _tbl(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    e1 = o.select(
        k,
        F.lit("2024-01-01").alias("ts"),
        F.lit("upsert").alias("op"),
        F.col("o_totalprice"),
    )
    e2 = o.where(k % 2 == 0).select(
        k,
        F.lit("2024-01-02").alias("ts"),
        F.lit("upsert").alias("op"),
        (F.col("o_totalprice") + 10).alias("o_totalprice"),
    )
    e3 = o.where(k % 5 == 0).select(
        k,
        F.lit("2024-01-02").alias("ts"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    log = (
        e1.unionByName(e2)
        .unionByName(e3)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    return snapshot_as_of(
        log, "o_orderkey", "ts", "2024-01-02 23:59:59"
    ).orderBy("o_orderkey")


def _q_crawl_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS crawl-depth census from seeds {h0, h1} over the directed
    23-host link graph — how many link hops every host sits from the
    seed list. Hop counts are exact integers, so the iterative operator
    is fully ORACLED via a bounded WITH RECURSIVE + MIN(dist) replay."""
    from gbif_data_validator_spark.operators.graph import bfs_distances

    idc = F.col("doc_id")
    edges = (
        _tbl(spark, sf_dir, "documents")
        .select(
            idc,
            F.explode(
                F.sequence(F.lit(1).cast("long"), idc % 3 + 1)
            ).alias("k"),
        )
        .select(
            F.concat(F.lit("h"), (idc % 23).cast("string")).alias("src"),
            F.concat(
                F.lit("h"), ((idc * 7 + F.col("k") * 13) % 23).cast("string")
            ).alias("dst"),
        )
    )
    seeds = spark.createDataFrame([("h0",), ("h1",)], "vertex string")
    return bfs_distances(edges, seeds, max_hops=6).orderBy("dist", "vertex")


def _q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the 23-host link graph — one row, the
    hubs-link-hubs-or-leaves shape fingerprint that pairs with the
    triangle census. Integer moments are exact; r is a pinned-order
    double rounded 6 dp, replayed verbatim by the oracle."""
    from gbif_data_validator_spark.operators.graph import (
        degree_assortativity,
    )

    idc = F.col("doc_id")
    edges = (
        _tbl(spark, sf_dir, "documents")
        .select(
            idc,
            F.explode(
                F.sequence(F.lit(1).cast("long"), idc % 3 + 1)
            ).alias("k"),
        )
        .select(
            F.concat(F.lit("h"), (idc % 23).cast("string")).alias("src"),
            F.concat(
                F.lit("h"), ((idc * 7 + F.col("k") * 13) % 23).cast("string")
            ).alias("dst"),
        )
    )
    return degree_assortativity(edges)


def _q_partition_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column advisor over the events table: per candidate
    column the exact cardinality / null / skew evidence and a verdict —
    the decision input behind an Iceberg PARTITIONED BY choice. One scan
    (explode to (column, value) pairs, map-side combine), one shuffle."""
    from gbif_data_validator_spark.operators.layout import partition_advisor

    return partition_advisor(
        _tbl(spark, sf_dir, "events"),
        ["event_type", "user_id", "props"],
    ).orderBy("column")


def _q_lang_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the DECLARED lang column and the marker-word
    lang_id prediction — chance-corrected agreement, the one-row answer to
    "is the heuristic actually tracking the labels or just matching the
    majority class by luck". ONE corpus agg to the k×k confusion matrix;
    every marginal/scalar derives from that tiny table."""
    from gbif_data_validator_spark.functions.textstats import lang_id
    from gbif_data_validator_spark.operators.classifier import (
        agreement_kappa,
    )

    d = _docs(spark, sf_dir).select(
        "lang", lang_id(F.col("text")).alias("lang_pred")
    )
    return agreement_kappa(d, "lang", "lang_pred")


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.5
    ).orderBy("doc_a", "doc_b")


def _q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH quality pin: recall of minhash_lsh_pairs against exact
    ngram Jaccard at the same threshold, as ONE integer-exact row —
    deterministic hash family end to end, so the whole measurement (both
    pair pipelines + the semi-join + µ-recall) replays in SQL
    (operators/dedup.py:lsh_recall_vs_exact)."""
    from gbif_data_validator_spark.operators.dedup import lsh_recall_vs_exact

    return lsh_recall_vs_exact(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.5
    )


def _q_weighted_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-MinHash LSH pairs (tf-expanded multiset signatures): the
    scale path for weighted_jaccard. Deterministic md5-based hash family →
    the oracle replays signatures, banding, caps, and estimation in SQL
    over the SAME expanded multisets (operators/dedup.py:
    weighted_minhash_lsh_pairs)."""
    from gbif_data_validator_spark.operators.dedup import weighted_minhash_lsh_pairs

    return weighted_minhash_lsh_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.5
    ).orderBy("doc_a", "doc_b")


def _q_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (tf-weighted) Jaccard near-dup pairs — repetition-aware
    similarity where set Jaccard saturates on template-heavy pages. Exact
    at this scale (max_df ≫ corpus df); the oracle recomputes the gram
    multisets and Σmin/Σmax algebra in SQL."""
    from gbif_data_validator_spark.operators.dedup import weighted_jaccard_pairs

    return weighted_jaccard_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.4
    ).orderBy("doc_a", "doc_b")


def _q_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs/PPJoin prefix-filtered exact Jaccard — same parameters and
    (by the prefix-filtering lemma) bit-identical output to ngram_jaccard,
    reached by posting only prefix shingles. The oracle is the same exact
    all-pairs SQL, which is precisely the point: the filter is lossless."""
    from gbif_data_validator_spark.operators.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.5
    ).orderBy("doc_a", "doc_b")


def _q_grouped_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style grouped verification: the whole-table rule battery
    evaluated per source in ONE grouped scan — 20 sources × 5 rules = 100
    verdict rows, no driver-side build. Rules chosen so real data fails
    some of them per-group (short docs break RANGE, es/zh break IN_SET,
    low-median sources break QUANTILE_BETWEEN)."""
    from gbif_data_validator_spark.operators.constraints import verify_constraints_by

    rules = [
        ("doc_id", "UNIQUE", ""),
        ("lang", "IN_SET", "en,de,fr"),
        ("n_chars", "RANGE", "60..600"),
        ("text", "COMPLETENESS_GE", "0.9"),
        ("n_chars", "QUANTILE_BETWEEN", "0.5:250..400"),
    ]
    return verify_constraints_by(_docs(spark, sf_dir), rules, ["source"]).orderBy(
        "source", "column", "constraint"
    )


def _q_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source n_chars quartiles — the grouped order-statistics
    profiler face (percentile_approx is the documented 100 TB knob)."""
    from gbif_data_validator_spark.operators.constraints import quantiles_by

    return quantiles_by(
        _docs(spark, sf_dir), "n_chars", ["source"], probs=[0.25, 0.5, 0.75]
    ).orderBy("source")


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-z (MAD) outlier rows on events.value — the 50%-contamination-
    tolerant complement to the Tukey-fence iqr_outliers."""
    from gbif_data_validator_spark.operators.constraints import mad_outlier_rows

    return mad_outlier_rows(
        _tbl(spark, sf_dir, "events"), "value", k=3.0, id_cols=["event_id"]
    ).orderBy("event_id")


def _q_edit_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-aware near-dup pairs: posting-list candidates at Jaccard
    ≥ 0.3, exact Levenshtein verify at edit-sim ≥ 0.95 — the check that
    separates minor edits from mere shared vocabulary."""
    from gbif_data_validator_spark.operators.dedup import edit_similarity_pairs

    return edit_similarity_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text",
        k=3, candidate_threshold=0.3, threshold=0.95,
    ).orderBy("doc_a", "doc_b")


def _q_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion audit: exact output size + top contributing keys of
    the many-to-many events.user_id ⋈ orders.o_custkey join, computed from
    the two key histograms without running the join."""
    from gbif_data_validator_spark.operators.layout import join_explosion_audit

    return join_explosion_audit(
        _tbl(spark, sf_dir, "events"),
        _tbl(spark, sf_dir, "orders"),
        "user_id",
        "o_custkey",
        top_k=10,
    )


def _q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the first and second half-month of events.value — the
    bucket-attributable whole-shape drift monitor, hash-exact via the
    ordered-fold recipe."""
    from gbif_data_validator_spark.operators.drift import psi_drift

    ev = _tbl(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return psi_drift(
        ev.where(F.col("ts") < cut),
        ev.where(F.col("ts") >= cut),
        "value",
        lo=0.0,
        hi=500.0,
        n_buckets=10,
    )


def _q_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserstein-1 (earth-mover) drift between the same two half-months
    of events.value on the same bucket grid as psi_drift — the
    distance-weighted member of the drift family: unlike PSI/KS it grows
    with HOW FAR the mass moved, not just how much."""
    from gbif_data_validator_spark.operators.drift import emd_drift

    ev = _tbl(spark, sf_dir, "events")
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    return emd_drift(
        ev.where(F.col("ts") < cut),
        ev.where(F.col("ts") >= cut),
        "value",
        lo=0.0,
        hi=500.0,
        n_buckets=10,
    )


def _q_json_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-schema JSON validation as battery rules: props must carry
    $.k as BIGINT (passes), $.missing (all 10k rows violate), and $.k as
    TIMESTAMP (uncastable — all violate): presence and type are separate
    failure modes of the same JSON_KEY kind."""
    from gbif_data_validator_spark.operators.constraints import verify_constraints

    return verify_constraints(
        _tbl(spark, sf_dir, "events"),
        [
            ("props", "JSON_KEY", "$.k:BIGINT"),
            ("props", "JSON_KEY", "$.missing:BIGINT"),
            ("props", "JSON_KEY", "$.k:TIMESTAMP"),
        ],
    )


def _q_lang_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary census via the grouped two-pass hot-bucket
    plan: exact token counts ≥ 30 within each lang."""
    from gbif_data_validator_spark.operators.metrics import exact_heavy_hitters

    toks = _docs(spark, sf_dir).select(
        "lang",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("tok"),
    )
    return exact_heavy_hitters(
        toks, "tok", min_count=30, group_cols=["lang"]
    ).orderBy("lang", "value")


def _q_quality_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup dedup: connected clusters over the 0.5-Jaccard
    pair graph, keep the argmax-quality member per cluster (min-id
    tie-break) — the survivor policy real corpus pipelines use instead of
    min-id."""
    from gbif_data_validator_spark.functions import textstats as ts
    from gbif_data_validator_spark.operators.curation import survivors_by_score
    from gbif_data_validator_spark.operators.dedup import ngram_jaccard_pairs

    d = _docs_spread(spark, sf_dir)
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", k=3, threshold=0.5)
    out = survivors_by_score(
        d, pairs, "doc_id", F.round(ts.quality_score(F.col("text")), 4)
    )
    return out.select("doc_id", "lang", "source").orderBy("doc_id")


def _q_salted_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted equi-join (orders ⋈ customer spread over 8
    salts) rolled up to per-nation order counts + decimal-exact revenue —
    the oracle pins that salting is result-invisible: same rows as the
    plain join, just a different (hot-key-proof) physical layout."""
    from gbif_data_validator_spark.operators.skew import salted_join

    j = salted_join(
        _tbl(spark, sf_dir, "orders"),
        _tbl(spark, sf_dir, "customer"),
        "o_custkey",
        "c_custkey",
        n_salts=8,
    )
    return (
        j.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("c_nationkey")
    )


def _q_pagerank_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the bipartite customer↔supplier graph
    (edges = co-occurrence in an order, both directions). ORACLED despite
    being iterative: with a fixed iteration count the damped power
    iteration unrolls into chained SQL CTEs (oracle_sql generates the
    5-level unroll with the same IEEE operation order Spark uses), and
    the top-25 cut sorts on the ROUNDED rank (8 dp) so sub-ulp summation
    ordering differences between engines can't flip the cut or the
    tie-break. Fixed-point math is additionally pinned by
    tests/test_graph.py's analytic fixtures."""
    from gbif_data_validator_spark.operators.graph import pagerank

    li = _tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    both = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranked = pagerank(both, iterations=5).select(
        "vertex", F.round("rank", 8).alias("rank")
    )
    return ranked.orderBy(F.col("rank").desc(), "vertex").limit(25)


def _q_hits_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS over the DIRECTED customer→supplier purchase graph —
    pagerank_entities' mutual-reinforcement complement: suppliers score as
    authorities (bought by well-connected customers), customers as hubs
    (buy from authoritative suppliers). ORACLED like pagerank: the
    L1-normalized update is pure +,/ in a pinned order, so 5 iterations
    unroll into chained DuckDB CTEs; the top-25 cut sorts on the 8
    dp-rounded scores so sub-ulp summation noise can't flip it."""
    from gbif_data_validator_spark.operators.graph import hits

    li = _tbl(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _tbl(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    scored = hits(edges, iterations=5).select(
        "vertex",
        F.round("auth", 8).alias("auth"),
        F.round("hub", 8).alias("hub"),
    )
    return scored.orderBy(
        F.col("auth").desc(), F.col("hub").desc(), "vertex"
    ).limit(25)


def _q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-lite (Lee et al. 2022): maximal verbatim-duplicated
    token windows (≥16 tokens) across document pairs — k-gram seed posting
    lists merged along alignment diagonals with the islands trick; grams
    travel as strings so the result is exact and hash-checkable."""
    from gbif_data_validator_spark.operators.dedup import duplicated_spans

    return duplicated_spans(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=8, min_tokens=16
    ).orderBy("doc_a", "doc_b", "start_a", "start_b")


def _q_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The removal half of ExactSubstr dedup: duplicated spans stripped
    from all but their first-by-id occurrence, text reassembled from the
    same normalized token stream the detector used and pinned by md5 so
    the whole surgery is hash-checked. Ranges are edge-sized; the rebuild
    is per-row array algebra (zero UDFs, no corpus window)."""
    from gbif_data_validator_spark.operators.dedup import strip_dup_spans

    return (
        strip_dup_spans(
            _docs_spread(spark, sf_dir), "doc_id", "text", k=8, min_tokens=16
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_removed",
            F.md5(F.col("text_clean").cast("binary")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


def _q_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl snapshot-over-snapshot churn: per-key added/changed/removed/
    unchanged classification between two snapshots of the documents table.
    The "new" snapshot derives deterministically from the old one (10% of
    keys dropped, every 7th surviving text uppercased, every 13th key
    re-added under a shifted id) so all four statuses appear and the oracle
    replays the identical derivation."""
    from gbif_data_validator_spark.operators.snapshot import snapshot_diff

    d = _docs(spark, sf_dir)
    survivors = d.where(F.col("doc_id") % 10 != 0).withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.upper(F.col("text"))).otherwise(
            F.col("text")
        ),
    )
    additions = d.where(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1000000)
    )
    new = survivors.unionByName(additions)
    return snapshot_diff(d, new, key_col="doc_id", fingerprint_col="text").orderBy(
        "doc_id"
    )


def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier reliability diagram (operators/classifier.py:
    calibration_curve): per probability bin, the micro-unit-exact mean
    prediction vs the observed positive rate. Scores and labels derive
    from documents via the md5 hash-bucket idiom (label rate tracks the
    score by construction, so the curve is visibly diagonal); the
    oracle replays construction, quantization, and integer binning."""
    from gbif_data_validator_spark.operators.classifier import (
        calibration_curve,
    )
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    idc = F.col("doc_id")
    b1 = hash_bucket(idc, 1000)
    by = hash_bucket(F.concat(idc.cast("string"), F.lit("y")), 100)
    scored = _tbl(spark, sf_dir, "documents").select(
        (b1 / F.lit(1000.0)).alias("p"),
        F.when(by < (b1 / F.lit(10)).cast("long"), 1).otherwise(0).alias("y"),
    )
    return calibration_curve(scored, "p", "y", n_bins=10, logit=False).orderBy(
        "bin"
    )


def _q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health Zipf fit (operators/metrics.py:zipf_fit): OLS slope
    / intercept / r² on (ln rank, ln count) over the top-500 terms plus
    vocabulary size — rank-sorted ordered folds and a fixed closed-form
    operation order make the value hash-exact at 6 dp."""
    from gbif_data_validator_spark.operators.metrics import zipf_fit

    return zipf_fit(_docs(spark, sf_dir), "text", top_k=500)


def _q_host_lang_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-majority disagreement census (operators/metrics.py:
    group_majority_mismatch): per source, every MINORITY language with
    its count vs the deterministic majority (max count, min-string
    tie-break) — the corpus-level "page lang disagrees with its host"
    consistency check; all post-agg work runs on the count table."""
    from gbif_data_validator_spark.operators.metrics import (
        group_majority_mismatch,
    )

    return group_majority_mismatch(
        _docs(spark, sf_dir), "source", "lang", min_group=5
    ).orderBy("group", "value")


def _q_apply_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge (operators/snapshot.py:apply_changeset): the Iceberg
    MERGE INTO core on plain snapshots — deletes (every 11th key),
    in-place upserts (every remaining 7th key patched), and inserts
    (every 13th key re-added under a shifted id) applied in one
    broadcast anti-join + union; the oracle replays the changeset
    construction and the NOT EXISTS ∪ upserts algebra."""
    from gbif_data_validator_spark.operators.snapshot import apply_changeset

    d = _docs(spark, sf_dir)
    idc = F.col("doc_id")
    dels = d.where(idc % 11 == 0).withColumn("op", F.lit("delete"))
    upds = (
        d.where((idc % 11 != 0) & (idc % 7 == 0))
        .withColumn("source", F.lit("patched"))
        .withColumn("n_chars", F.col("n_chars") + F.lit(1))
        .withColumn("op", F.lit("upsert"))
    )
    ins = (
        d.where(idc % 13 == 0)
        .withColumn("doc_id", idc + F.lit(100000))
        .withColumn("source", F.lit("inserted"))
        .withColumn("op", F.lit("upsert"))
    )
    changes = dels.unionByName(upds).unionByName(ins)
    return apply_changeset(d, changes, key_col="doc_id").orderBy("doc_id")


def _q_script_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script census: per-doc codepoint counts across 9 major
    script blocks + dominant script — the writing-system complement to the
    marker-word lang_id. Multilingual text derives deterministically (a
    per-residue script suffix) so every range is exercised; all-integer
    logic, so the oracle is bit-exact by construction."""
    from gbif_data_validator_spark.functions.textstats import (
        dominant_script,
        script_counts,
    )

    d = _docs(spark, sf_dir)
    suffix = (
        F.when(F.col("doc_id") % 6 == 1, F.lit(" привет мир"))
        .when(F.col("doc_id") % 6 == 2, F.lit(" 中文网页测试"))
        .when(F.col("doc_id") % 6 == 3, F.lit(" مرحبا بالعالم"))
        .when(F.col("doc_id") % 6 == 4, F.lit(" γεια σου κοσμε"))
        .when(F.col("doc_id") % 6 == 5, F.lit(" 안녕하세요 세계"))
        .otherwise(F.lit(""))
    )
    t = F.concat(F.coalesce(F.col("text"), F.lit("")), suffix)
    counts = script_counts(t)
    return d.select(
        "doc_id",
        *[c.alias(f"n_{name}") for name, c in sorted(counts.items())],
        dominant_script(t).alias("dominant"),
    ).orderBy("doc_id")


def _q_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-parity information-theoretic analyzers: Shannon entropy of
    lang and source plus their mutual information — exact integer group
    counts, then a value-sorted deterministic left fold, so the floats
    hash-check rather than merely approximate."""
    from gbif_data_validator_spark.operators.constraints import (
        column_entropy,
        mutual_information,
    )

    d = _docs(spark, sf_dir)
    rows = [
        column_entropy(d, "lang").select(
            F.lit("entropy").alias("analyzer"), "*"
        ),
        column_entropy(d, "source").select(
            F.lit("entropy").alias("analyzer"), "*"
        ),
        mutual_information(d, "lang", "source").select(
            F.lit("mutual_information").alias("analyzer"), "*"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("analyzer", "column")


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement, top-50
    by n_chars weight — md5-derived uniforms make the 'random' draw
    reproducible and exactly replayable in SQL."""
    from gbif_data_validator_spark.operators.sampling import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), "doc_id", "n_chars", 50).select(
        "doc_id", "n_chars", "sample_key"
    )


def _q_cosine_dup_pairs_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine near-dup pairs with the deterministic integer
    sign-LSH — the scale path of embedding dedup as a hash-checkable
    correctness row (the seeded-numpy variant stays rows-only by nature)."""
    from gbif_data_validator_spark.operators.similarity import det_lsh_cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return det_lsh_cosine_pairs(
        emb, "vec_id", "embedding", dim=64, n_planes=4, threshold=0.3
    ).withColumn("cosine", F.round(F.col("cosine"), 4)).orderBy("doc_a", "doc_b")


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the token stream of documents.text (count
    ≥ 50) via the two-pass hot-bucket plan — the scale path for top-value
    census over a column whose distinct-value set (a web corpus's
    vocabulary / URL set) cannot be shuffled whole."""
    from gbif_data_validator_spark.operators.metrics import exact_heavy_hitters

    toks = _docs(spark, sf_dir).select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
        ).alias("tok")
    )
    return exact_heavy_hitters(toks, "tok", min_count=50).orderBy("value")


def _q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-supersets: |A∩B| / min(|A|,|B|) ≥ 0.8 — the
    boilerplate-wrapper duplicate class symmetric Jaccard dilutes."""
    from gbif_data_validator_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.8
    ).orderBy("doc_a", "doc_b")


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.operators.similarity import brute_force_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    return (
        brute_force_topk(emb, q, k=3)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
        .orderBy("query_id", "rank")
    )


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@5 of deterministic multi-probe sign-LSH ANN vs
    exact brute force — the ANN-quality pin. The LSH here is engine-
    portable (integer-quantized vectors, LCG Rademacher hyperplanes), so
    the DuckDB oracle reproduces the exact same buckets, candidates, and
    recall values bit-for-bit."""
    from gbif_data_validator_spark.operators.similarity import lsh_recall_report

    emb = _tbl(spark, sf_dir, "embeddings")
    return (
        lsh_recall_report(
            emb, emb.where(F.col("vec_id") < 16), dim=64, k=5, n_planes=4
        )
        .select("query_id", "n_ann", "n_hit", F.round("recall", 6).alias("recall"))
        .orderBy("query_id")
    )


def _q_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.operators.dedup import embedding_cosine_pairs

    emb = _tbl(spark, sf_dir, "embeddings")
    return (
        embedding_cosine_pairs(emb, "vec_id", "embedding", threshold=0.3)
        .select("doc_a", "doc_b", F.round("cosine", 4).alias("cosine"))
        .orderBy("doc_a", "doc_b")
    )


# --- non-SQL-expressible (rows-only checks) --------------------------------


def _q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs_spread(spark, sf_dir), "doc_id", "text", threshold=0.5)


def _q_lsh_pair_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 total-pair budget over the MinHash-LSH plan: max_pairs=320
    binds at this sf (the size-2 buckets' 309 pairs fit; admitting the
    size-3 tier would exceed it), so only pairs from buckets at-or-under
    the computed size cut survive. The oracle replays the ENTIRE budget
    computation in SQL — signature replay, bucket histogram, running-sum
    cut — so the budget math itself is hash-checked, not just the
    output."""
    from gbif_data_validator_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text",
        threshold=0.5, max_pairs=320,
    )


def _q_lsh_budget_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-silent-caps ledger for the pair budget: per (band, bucket
    size) counts of budget-dropped buckets and the exact pair volume cut
    (bucket KEYS are engine-specific hashes, so the census compares on
    the engine-portable grain: band + size)."""
    from gbif_data_validator_spark.operators.dedup import (
        minhash_lsh_budget_dropped,
    )

    return (
        minhash_lsh_budget_dropped(
            _docs_spread(spark, sf_dir), "doc_id", "text", max_pairs=320,
        )
        .groupBy("band", "n_docs")
        .agg(F.count(F.lit(1)).alias("n_buckets"),
             F.sum("n_pairs").alias("pairs_cut"))
        .orderBy("band", "n_docs")
    )


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_docs_spread(spark, sf_dir), "doc_id", "text", max_hamming=3)


def _q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-duplication candidates via shared winnowing fingerprints."""
    from gbif_data_validator_spark.operators.dedup import winnow_pairs

    return winnow_pairs(_docs_spread(spark, sf_dir), "doc_id", "text", min_shared=2)


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (connected components over the n-gram Jaccard pair
    list, min-id labels) — the unit a dedup pipeline actually keys survivor
    selection on. Oracle: DuckDB recursive CTE over the same pair SQL."""
    from gbif_data_validator_spark.operators.dedup import (
        duplicate_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.5
    )
    return duplicate_clusters(pairs).orderBy("doc_id")


def _q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold tuning census: pair/doc counts for a whole grid of
    Jaccard thresholds from ONE posting-list pass — integer-percent grid
    keys and pure-integer threshold comparisons, so the sweep is exact
    (operators/dedup.py:dedup_threshold_sweep)."""
    from gbif_data_validator_spark.operators.dedup import dedup_threshold_sweep

    return dedup_threshold_sweep(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3
    ).orderBy("threshold_pct")


def _q_incr_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental connected components: the Jaccard pair list split into
    two deterministic batches; batch 1 is clustered, then batch 2 is
    MERGED into that labeling via the star-edge identity
    (operators/dedup.py:merge_clusters) — never re-reading batch 1's
    pairs. Oracle: the SAME recursive-CTE SQL as dedup_clusters, which is
    exactly the claim — incremental merge ≡ full recompute, hash-checked."""
    from gbif_data_validator_spark.operators.dedup import (
        duplicate_clusters,
        merge_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.5
    ).localCheckpoint(eager=True)
    batch1 = pairs.where((F.col("doc_a") + F.col("doc_b")) % 2 == 0)
    batch2 = pairs.where((F.col("doc_a") + F.col("doc_b")) % 2 != 0)
    labels1 = duplicate_clusters(batch1)
    return merge_clusters(labels1, batch2).orderBy("doc_id")


def _q_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup (SlimPajama-style loss reweighting): every cluster
    member kept at weight ⌊10^6/|cluster|⌋ instead of dropped
    (operators/dedup.py:dedup_weights). Oracle: the dedup_clusters
    recursive CTE + a cluster-size join + integer µ-weights."""
    from gbif_data_validator_spark.operators.dedup import (
        dedup_weights,
        duplicate_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        _docs_spread(spark, sf_dir), "doc_id", "text", k=3, threshold=0.5
    )
    return dedup_weights(duplicate_clusters(pairs)).orderBy("doc_id")


def _q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample by md5-prefix hash bucket of the key —
    membership is a pure function of doc_id (reproducible across runs,
    engines, appends), which random sampling cannot give without a
    persisted membership table."""
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", hash_bucket(F.col("doc_id"), 100).alias("bucket"))
        .where(F.col("bucket") < 10)
        .orderBy("doc_id")
    )


def _q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/test split (10% test) summarized per side."""
    from gbif_data_validator_spark.operators.sampling import deterministic_split

    d = _docs(spark, sf_dir)
    return (
        deterministic_split(d, "doc_id", test_pct=10)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_ids"),
        )
        .orderBy("split")
    )


def _q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing: contiguous-fill token-budget bins
    within hash shards (FFD order, tie-broken by id) — batch assembly as a
    pure function of (key, tokens), window over (id, tokens) only."""
    from gbif_data_validator_spark.operators.curation import pack_bins

    return pack_bins(
        _docs(spark, sf_dir), "doc_id", "n_chars", budget=2000, n_shards=8
    ).orderBy("doc_id")


def _q_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered training-shard planner (operators/curation.py:shard_plan):
    documents land in ~25 KB shards along the ascending-doc_id global
    order via a bucketed distributed prefix sum (no global sort); the
    oracle is the one-window SQL definition the two-phase plan must
    equal exactly — integer div, so bit-exact, not approximately."""
    from gbif_data_validator_spark.operators.curation import shard_plan

    return shard_plan(
        _docs(spark, sf_dir), "doc_id", "n_chars", shard_bytes=25_000,
        n_buckets=64,
    ).orderBy("doc_id")


def _q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-doc 8-gram overlap of the corpus
    (doc_id >= 20) against the broadcast benchmark set (doc_id < 20)."""
    from gbif_data_validator_spark.operators.curation import ngram_contamination

    d = _docs(spark, sf_dir)
    return (
        ngram_contamination(
            d.where(F.col("doc_id") >= 20), d.where(F.col("doc_id") < 20), n=8
        )
        .withColumn("n_grams", F.col("n_grams").cast("long"))
        .orderBy("doc_id")
    )


def _pii_augmented_text(i: "Column") -> "Column":
    """documents.text with PII planted on fixed doc_id slots — the
    synthetic corpus has none, so the query fabricates deterministic
    positives (mirrored verbatim in the oracle SQL) to exercise real
    detection and redaction, not a vacuous all-zeros scan."""

    def slot(mod: int, s: "Column") -> "Column":
        return F.when(i % mod == 0, s).otherwise(F.lit(""))

    return F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        slot(7, F.concat(F.lit(" reach me at user"), i.cast("string"),
                         F.lit("@crawl-mail.example.com"))),
        slot(11, F.concat(F.lit(" origin 192.168."), (i % 250).cast("string"),
                          F.lit("."), (i % 100).cast("string"))),
        slot(13, F.concat(F.lit(" tel +1 555 "),
                          F.lpad((i % 1000).cast("string"), 3, "0"),
                          F.lit(" 0199"))),
        slot(17, F.concat(F.lit(" ssn 123-45-"),
                          F.lpad((i % 10000).cast("string"), 4, "0"))),
        slot(19, F.concat(F.lit(" card 4111-1111-1111-"),
                          F.lpad((i % 10000).cast("string"), 4, "0"))),
    )


def _q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the augmented documents table:
    per-kind match counts, total, and the md5/length of the redacted text
    (md5 instead of the text itself keeps compare traffic flat)."""
    from gbif_data_validator_spark.functions import pii

    d = _docs_spread(spark, sf_dir)
    aug = _pii_augmented_text(F.col("doc_id"))
    counts = pii.pii_counts(aug)
    red = pii.pii_redact(aug)
    return d.select(
        "doc_id",
        *[c.alias(f"n_{k}") for k, c in counts.items()],
        pii.pii_total(aug).alias("n_pii"),
        F.md5(red).alias("redacted_md5"),
        F.length(red).alias("redacted_len"),
    ).orderBy("doc_id")


def _q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style duplicate-line metrics. The synthetic word soup has no
    newlines, so the query chunks the word array into 2-word pseudo-lines
    (the sentence pool repeats, so duplicates are real); production callers
    pass ``nonblank_lines(text)`` instead. Mirrored in the oracle SQL."""
    from gbif_data_validator_spark.functions.textstats import dup_line_stats

    d = _docs_spread(spark, sf_dir)
    ws = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    n_lines = F.floor((F.size(ws) + 1) / F.lit(2)).cast("int")
    lines = F.when(
        F.size(ws) > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(ws, i * 2 + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    stats = dup_line_stats(lines)
    return (
        d.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            stats["n_lines"].alias("n_lines"),
            stats["dup_line_frac"].alias("dup_line_frac"),
            stats["dup_line_char_frac"].alias("dup_line_char_frac"),
        )
        .orderBy("doc_id")
    )


def _q_top_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top word-2-gram per document with the char fraction it covers (the
    boilerplate-repetition signal; ties broken (count desc, longer gram,
    lexicographic) so the top-1 is deterministic)."""
    from gbif_data_validator_spark.operators.metrics import top_ngram_stats

    return top_ngram_stats(
        _docs_spread(spark, sf_dir), "doc_id", "text", n=2
    ).orderBy("doc_id")


def _q_rep_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE Gopher n-gram repetition battery per document
    (operators/metrics.py:dup_ngram_stats): top-{2,3,4}-gram char coverage,
    duplicated-{5..10}-gram char coverage, one gate per signal at the
    published thresholds, and the conjunction — integer occurrence counts
    and a fixed INT×INT / DOUBLE round-6 formula make every fraction
    hash-exact vs SQL."""
    from gbif_data_validator_spark.operators.metrics import dup_ngram_stats

    return dup_ngram_stats(_docs_spread(spark, sf_dir), "doc_id", "text").orderBy(
        "doc_id"
    )


#: per-source sampling rates for the stratified-sample query: even-numbered
#: sources downsampled to 10%, odd kept at 30% (the oracle SQL CASE is
#: generated from this same dict)
STRATA_RATES = {f"src{i}": (10 if i % 2 == 0 else 30) for i in range(20)}


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum (source) downsampling: hash-bucket
    membership per doc_id, per-source keep rate from STRATA_RATES."""
    from gbif_data_validator_spark.operators.sampling import stratified_sample

    return (
        stratified_sample(
            _docs(spark, sf_dir), "doc_id", "source", STRATA_RATES, default_pct=5
        )
        .select("doc_id", "source", "bucket")
        .orderBy("doc_id")
    )


def _q_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation rollup (the mix-weighting health table)."""
    from gbif_data_validator_spark.operators.metrics import stratum_rollup

    return stratum_rollup(
        _docs(spark, sf_dir), "source", "text", "n_chars"
    ).orderBy("stratum")


def _doc_pseudo_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents (text non-null) + a ``lines`` array of 2-word pseudo-lines
    (same tokenizer as _q_repetition_stats — the sf documents are
    single-line, so word chunks stand in for page lines; on real pages the
    operator takes ``textstats.nonblank_lines(text)`` unchanged)."""
    d = _docs_spread(spark, sf_dir).where(F.col("text").isNotNull())
    ws = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    n_lines = F.floor((F.size(ws) + 1) / F.lit(2)).cast("int")
    lines = F.when(
        F.size(ws) > 0,
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(ws, i * 2 + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return d.withColumn("lines", lines)


def _q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain boilerplate census: pseudo-lines recurring in ≥3 docs of
    the same source, capped at the 50 most widespread per domain."""
    from gbif_data_validator_spark.operators.curation import boilerplate_lines

    return boilerplate_lines(
        _doc_pseudo_lines(spark, sf_dir), "doc_id", "source", "lines",
        min_docs=3, max_lines=50,
    ).orderBy("domain", "line")


def _q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip over the same census: per-doc kept-line counts and
    an md5 of the cleaned text (so the full cleaned content is hash-checked
    without shipping it through the canonicalizer)."""
    from gbif_data_validator_spark.operators.curation import strip_boilerplate

    return (
        strip_boilerplate(
            _doc_pseudo_lines(spark, sf_dir), "doc_id", "source", "lines",
            min_docs=3, max_lines=50,
        )
        .select(
            "doc_id",
            F.size("lines").cast("long").alias("n_lines"),
            F.size("clean_lines").cast("long").alias("n_kept"),
            F.md5(F.array_join("clean_lines", " ")).alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


def _q_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget quota selection per source: rank docs by rounded
    quality (desc, doc_id tie-break), select while the running whitespace
    token total stays ≤ 400 per source."""
    from gbif_data_validator_spark.operators.curation import quota_by_stratum
    from gbif_data_validator_spark.functions.textstats import (
        quality_score,
        ws_token_count,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        ws_token_count(F.col("text")).alias("tokens"),
        quality_score(F.col("text")).alias("q"),
    )
    return (
        quota_by_stratum(
            d, "source", "tokens", 400,
            [F.col("q").desc_nulls_last(), F.col("doc_id")],
        )
        .select(
            "doc_id", "source", F.col("rank").cast("long").alias("rank"),
            "cum_tokens", "selected",
        )
        .orderBy("doc_id")
    )


def _q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (round-6 score, term tie-break)."""
    from gbif_data_validator_spark.operators.metrics import tfidf_top_terms

    return tfidf_top_terms(_docs_spread(spark, sf_dir), "doc_id", "text", k=3).orderBy(
        "doc_id", "term"
    )


def _q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication health: fraction of a source's docs whose
    (corpus-wide) content fingerprint is shared — the number a curator
    reads to decide which sources need aggressive dedup before mixing.
    One window over the fingerprint + one per-source agg; the corpus never
    self-joins."""
    from gbif_data_validator_spark.functions.textstats import content_fingerprint

    d = _docs(spark, sf_dir)
    fp = F.coalesce(content_fingerprint(F.col("text")), F.lit("NULL"))
    w = Window.partitionBy("_fp")
    n_dup = F.count(F.when(F.col("_grp") > 1, 1))
    return (
        d.withColumn("_fp", fp)
        .withColumn("_grp", F.count(F.lit(1)).over(w))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_dup.alias("n_dup_docs"),
            F.round(n_dup.cast("double") / F.count(F.lit(1)), 6).alias("dup_frac"),
        )
        .orderBy("source")
    )


#: per-source epoch weights for the resampling query: even sources
#: downsampled to 0.5 epochs, odd upsampled to 2.5 (exact binary fractions
#: so the frac→bucket threshold is float-exact in both engines)
MIX_WEIGHTS = {f"src{i}": (0.5 if i % 2 == 0 else 2.5) for i in range(20)}


def _q_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic resampling with replacement per MIX_WEIGHTS: copy
    counts are a pure function of (doc_id, source weight)."""
    from gbif_data_validator_spark.operators.sampling import resample_by_weight

    return (
        resample_by_weight(_docs(spark, sf_dir), "doc_id", "source", MIX_WEIGHTS)
        .select("doc_id", "source", F.col("copy").cast("long").alias("copy"))
        .orderBy("doc_id", "copy")
    )


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (16 tokens, overlap 4): per-chunk token
    counts and an md5 of the chunk text."""
    from gbif_data_validator_spark.operators.curation import chunk_documents

    return (
        chunk_documents(_docs_spread(spark, sf_dir), "doc_id", "text",
                        chunk_tokens=16, overlap=4)
        .select(
            "doc_id", "chunk_id", "n_tokens",
            F.md5(F.col("chunk_text")).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_id")
    )


def _q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-aware quality signals: per-doc token count, type-token
    ratio, and unigram token entropy (nats)."""
    from gbif_data_validator_spark.functions.textstats import (
        _ws_tokens,
        token_entropy,
        type_token_ratio,
    )

    d = _docs_spread(spark, sf_dir).where(F.col("text").isNotNull())
    toks = _ws_tokens(F.col("text"))
    return (
        d.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            type_token_ratio(F.col("text")).alias("ttr"),
            token_entropy(F.col("text")).alias("entropy"),
        )
        .where(F.col("n_tokens") > 0)
        .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"), "ttr", "entropy")
        .orderBy("doc_id")
    )


def _q_spreadsheet_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 spreadsheet converter surface: parse the committed xlsx/ods/
    excel-xml/legacy-xls fixture workbooks (binaryFile scan → stdlib zip/XML parse in
    mapInPandas) into one string-typed table under the reference's
    semantics — first sheet, extract-while header, stop at first blank row,
    ISO-instant dates (source/SpreadsheetConverters.java:35-72,
    OdsConverter.java:86-158). The fixture bytes are deterministic
    (scripts/make_spreadsheet_fixtures.py), so the expected output is a
    fixed literal — the oracle states it as VALUES."""
    import os

    from gbif_data_validator_spark.sources.spreadsheets import spreadsheet_table

    fixtures = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "spreadsheets"
    )
    df = spreadsheet_table(spark, fixtures)
    return (
        df.select(
            F.element_at(F.split(F.col("src_file"), "/"), -1).alias("src_name"),
            F.col("src_row").cast("long").alias("src_row"),
            "url", "warc_ts", "text", "lang",
        )
        .orderBy("url")
    )


def _q_dwca_star_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/J1 DwC-A archive surface: open the committed deterministic
    archive (scripts/make_dwca_fixtures.py), map meta.xml's positional
    fields to Term-named columns through Spark's native CSV scan
    (sources/dwca.py — the reference's primary input format,
    source/DataFileFactory.java:121-146 + header mapping :226-248), and
    run the star-schema referential battery over core + 2 extensions.
    Goldens mirror ReferentialIntegrityEvaluatorTest semantics: orphan
    coreid "ZZ", empty coreid → KEY_EMPTY, case-sensitive id linking.
    Fixture bytes are deterministic, so the oracle is a VALUES literal."""
    import os
    import tempfile

    from gbif_data_validator_spark.plans.star import validate_star
    from gbif_data_validator_spark.sources import dwca

    archive = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "dwca", "integrity.zip",
    )
    desc, core, exts = dwca.read_dwca(spark, archive, tempfile.mkdtemp())
    return (
        validate_star(core, exts, core_key=dwca.core_id_column(desc))
        .select("url", "check_id", "expected", "found", "partition_id")
        .orderBy("partition_id", "check_id", "url")
    )


def _q_dwca_record_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-interpretation pass over DwC-A term columns (r04 verdict
    task #2): the reference's per-record battery — COLUMN_MISMATCH from
    raw lines (RecordStructureEvaluator.java:35-56), date
    parse/plausibility, coordinate zero/range/swap, vocabulary membership,
    elevation measurements (OccurrenceInterpretationEvaluator.java:72-138,
    EvaluationType.java:37-77) — wired into validate_dwca as pure Column
    algebra over the archive scan (operators/dwca_interpretation.py).
    Fixture bytes are deterministic (scripts/make_dwca_fixtures.py), so
    the oracle is a VALUES literal of the planted violations."""
    import os
    import tempfile

    from gbif_data_validator_spark.sources import dwca

    archive = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "fixtures", "dwca", "interpretation.zip",
    )
    _, viol = dwca.validate_dwca(
        spark, archive, tempfile.mkdtemp(), record_checks=True
    )
    return (
        viol.select("url", "check_id", "expected", "found", "partition_id")
        .orderBy("url", "check_id", "found")
    )


def _q_dwca_event_registry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 registry breadth pinned as a driver-checkable row: the
    structural battery over the deterministic Event-core fixture archives
    (Event core + MeasurementOrFact/ResourceRelationship/Audubon/
    ChronometricAge extensions — sources/dwca.py::KNOWN_ROWTYPES;
    reference resolves these via dwc/extensions/ExtensionManager). The
    clean archive contributes zero findings; the issues variant (its
    MeasurementOrFact maps measurementRemarks instead of the required
    measurementType) contributes exactly one REQUIRED_TERM_MISSING."""
    import os
    import tempfile

    from gbif_data_validator_spark.sources import dwca

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "fixtures", "dwca")
    rows = []
    for name in ("event-core.zip", "event-core-issues.zip"):
        findings = dwca.structure_findings(
            os.path.join(fix, name), tempfile.mkdtemp()
        )
        rows.extend(
            (name, f["evaluation_type"], f["rowtype"], f["term"])
            for f in findings
        )
    return spark.createDataFrame(
        rows, "archive string, evaluation_type string, rowtype string, "
        "term string",
    ).orderBy("archive", "evaluation_type", "term")


def _q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style URL blocklist gate over deterministically constructed
    urls (documents carry no url column, so both engines build
    ``https://[cdn.]{source}-{doc_id%7}.example.org{path}`` with injected
    block/flag triggers): exact-domain block, subdomain block via the
    dot-suffix equi-join, and a path-pattern flag."""
    from gbif_data_validator_spark.operators.curation import url_blocklist_flags

    d = _docs(spark, sf_dir)
    host = F.concat(F.col("source"), F.lit("-"), (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.org"))
    host = F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("cdn."), host)).otherwise(host)
    path = F.when(F.col("doc_id") % 17 == 0, F.lit("/adult/x")).otherwise(
        F.concat(F.lit("/p/"), F.col("doc_id").cast("string"))
    )
    docs = d.select("doc_id", F.concat(F.lit("https://"), host, path).alias("url"))
    blocked = spark.createDataFrame(
        [("src1-3.example.org",), ("src2-4.example.org",)], "domain string"
    )
    return (
        url_blocklist_flags(docs, blocked, path_patterns=("/adult/",))
        .select("doc_id", "url", "host", "domain_blocked", "path_flagged", "allowed")
        .orderBy("doc_id")
    )


def _q_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-document exact line dedup (keep-first) over pseudo-lines of 4
    tokens (the corpus is single-line word soup; both engines replay the
    re-lining, mirroring c4_clean's construction). Output pins the
    deduped text by md5 so the whole reassembly is hash-checked."""
    from gbif_data_validator_spark.functions.textstats import _ws_tokens
    from gbif_data_validator_spark.operators.curation import dedup_lines_in_doc

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    toks = _ws_tokens(F.col("text"))
    nl = F.floor((F.size(toks) + 3) / F.lit(4)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), nl - 1),
        lambda i: F.array_join(F.slice(toks, i * 4 + 1, 4), " "),
    )
    docs = d.select("doc_id", F.array_join(lines, "\n").alias("text")).where(
        F.size(toks) > 0
    )
    return (
        dedup_lines_in_doc(docs)
        .select(
            "doc_id", "n_lines", "n_dropped",
            F.md5(F.col("text_dedup").cast("binary")).alias("dedup_md5"),
        )
        .orderBy("doc_id")
    )


def _q_nfc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-normalization audit: a decomposed sequence (' cafe'+U+0301)
    is injected on doc_id%7 rows in BOTH engines; the pandas-UDF
    unicodedata NFC must agree with DuckDB's native nfc_normalize on the
    composed text (md5-pinned), the char counts, and the changed flag."""
    from gbif_data_validator_spark.functions.normalize import normalization_report

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    t2 = F.when(
        F.col("doc_id") % 7 == 0,
        # explicitly DECOMPOSED: 'e' + combining acute (U+0301) - NFC composes it
        F.concat(F.col("text"), F.lit(" cafe"), F.lit("\u0301")),
    ).otherwise(F.col("text"))
    docs = d.select("doc_id", t2.alias("text"))
    return (
        normalization_report(docs)
        .select(
            "doc_id", "changed", "len_before", "len_after",
            F.md5(F.col("text_nfc").cast("binary")).alias("nfc_md5"),
        )
        .orderBy("doc_id")
    )


def _q_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency check: does ``source`` determine ``lang``?
    (It shouldn't — every violating source comes back with its row count,
    distinct-RHS count, and the min/max RHS as bounded evidence.)"""
    from gbif_data_validator_spark.operators.constraints import fd_violations

    return (
        fd_violations(_docs(spark, sf_dir), ["source"], "lang")
        .select("source", "n_rows", "n_rhs_distinct", "rhs_min", "rhs_max")
        .orderBy("source")
    )


def _q_changeset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changeset EXTRACTION (apply_changeset's inverse): two
    deterministic snapshots derived from orders — every 11th key missing
    from old (→ upsert/add), every 13th missing from new (→ delete),
    every 7th price-perturbed (→ upsert/change) — and the delta that
    turns old into new. The oracle recomputes the delta with column-wise
    IS DISTINCT FROM, proving the md5-of-JSON fingerprint detects exactly
    the rows whose payload differs."""
    from gbif_data_validator_spark.operators.snapshot import extract_changeset

    o = _tbl(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = o.where(F.col("o_orderkey") % 11 != 0)
    new = o.where(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1
        ).otherwise(F.col("o_totalprice")),
    )
    return extract_changeset(old, new, "o_orderkey").orderBy(
        "op", "o_orderkey"
    )


def _q_fd_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-FD strength (Kivinen–Mannila g3) of source → lang —
    fd_check lists WHICH sources break the rule; this one row says HOW
    BROKEN it is in exact integer micro-units: the minimum fraction of
    rows to delete so the dependency holds exactly."""
    from gbif_data_validator_spark.operators.constraints import fd_strength

    return fd_strength(_docs(spark, sf_dir), ["source"], "lang")


def _q_mask_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-mask census over ``events.props`` (JSON strings, so digit
    runs of varying width yield a real mask distribution): mask, row
    count, distinct raw values, deterministic min-value example."""
    from gbif_data_validator_spark.operators.constraints import mask_profile

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return mask_profile(ev, "props", max_masks=50)


def _q_k_anon_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity equivalence classes over customer with quasi-identifiers
    (c_nationkey, c_mktsegment) and sensitive column c_acctbal: one row per
    class with its size, l-diversity, and the risky/homogeneous flags.
    Exact integer counts — SQL-replayable bit-for-bit."""
    from gbif_data_validator_spark.operators.privacy import k_anonymity_classes

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return k_anonymity_classes(
        cust, ["c_nationkey", "c_mktsegment"], k=5, sensitive_col="c_acctbal"
    ).orderBy("c_nationkey", "c_mktsegment")


def _q_k_anon_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release-gate face of the same audit: ONE row (n_rows, n_classes,
    min_k = the table's k-anonymity, rows_below_k, exact micro-ratio,
    min_l, rows_homogeneous)."""
    from gbif_data_validator_spark.operators.privacy import k_anonymity_summary

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return k_anonymity_summary(
        cust, ["c_nationkey", "c_mktsegment"], k=5, sensitive_col="c_acctbal"
    )


def _q_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-counting agreement (precision/recall/dice/Rand, exact integer
    micro-units) between EXACT dedup (md5 of raw text) and
    NORMALIZATION-INSENSITIVE dedup (md5 of lowercased,
    whitespace-collapsed text) over documents. Disagreement is planted
    in-query so the statistic discriminates: every 50th doc gains an
    upper-cased double-spaced variant (same normalized cluster, new exact
    cluster) and every 97th an exact clone (same cluster under both)."""
    from gbif_data_validator_spark.operators.classifier import (
        cluster_pair_agreement,
    )

    docs = (
        _docs(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    variants = docs.where(F.col("doc_id") % 50 == 0).select(
        F.concat(F.upper("text"), F.lit("  ")).alias("text")
    )
    clones = docs.where(F.col("doc_id") % 97 == 0).select("text")
    lab = (
        docs.select("text")
        .unionByName(variants)
        .unionByName(clones)
        .select(
            F.md5("text").alias("a"),
            F.md5(
                F.lower(F.trim(F.regexp_replace("text", "[ \t\n\r]+", " ")))
            ).alias("b"),
        )
    )
    return cluster_pair_agreement(lab, "a", "b")


def _q_suggest_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint suggestion over ``nation``: expects
    NOT_NULL everywhere, UNIQUE on key+name, RANGE on the int columns,
    IN_SET on the 5-value region key."""
    from gbif_data_validator_spark.operators.constraints import suggest_constraints

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return suggest_constraints(nation, ["n_nationkey", "n_name", "n_regionkey"])


def _q_verify_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-VerificationSuite analog: a declared rule battery (the rules
    ``suggest_constraints`` emits for clean ``nation``) verified against
    nation PLUS one planted bad row (duplicate key 0, NULL name, region 99)
    — one conditional-aggregate scan. Expected: UNIQUE(n_nationkey),
    RANGE(n_regionkey), IN_SET(n_regionkey) and MATCHES(n_regionkey) each
    catch 1 violation; COMPLETENESS_GE(n_name, 0.96) records 1 null yet
    still passes (25/26 = 0.961538); LENGTH_BETWEEN counts the short
    names; QUANTILE_BETWEEN passes at the median and fails at the max
    (the planted region 99)."""
    from gbif_data_validator_spark.operators.constraints import verify_constraints

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    bad = spark.createDataFrame(
        [(0, None, 99)], "n_nationkey int, n_name string, n_regionkey int"
    )
    rules = [
        ("n_nationkey", "NOT_NULL", ""),
        ("n_nationkey", "RANGE", "0..24"),
        ("n_nationkey", "UNIQUE", ""),
        ("n_nationkey", "QUANTILE_BETWEEN", "0.5:0..24"),
        ("n_name", "COMPLETENESS_GE", "0.960000"),
        ("n_name", "UNIQUE", ""),
        ("n_name", "LENGTH_BETWEEN", "5..25"),
        ("n_regionkey", "NOT_NULL", ""),
        ("n_regionkey", "RANGE", "0..4"),
        ("n_regionkey", "IN_SET", "0,1,2,3,4"),
        ("n_regionkey", "MATCHES", "^[0-4]$"),
        ("n_regionkey", "QUANTILE_BETWEEN", "1.0:0..4"),
    ]
    return verify_constraints(nation.union(bad), rules)


def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance over ``l_extendedprice`` — digit
    extracted from the string form (immune to libm log10 divergence),
    fractions and expectations quantized to 6 dp on both engines."""
    from gbif_data_validator_spark.operators.constraints import benford_deviation

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return benford_deviation(li, "l_extendedprice")


def _q_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outliers on ``events.value`` (long-tailed, so the cut
    is non-empty at every SF): exact percentile bounds (Spark
    ``percentile`` == DuckDB ``quantile_cont`` linear interpolation),
    fences rounded to 6 dp before the comparison."""
    from gbif_data_validator_spark.operators.constraints import iqr_outlier_rows

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    return iqr_outlier_rows(events, "value", id_cols=["event_id"]).orderBy(
        "event_id"
    )


def _q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup: five URL variant classes are constructed per
    doc_id (uppercase host + default port + fragment + unsorted params;
    the already-canonical spelling of the same page; non-default port;
    percent-encoded query; a malformed non-URL that must pass through
    unchanged). The real pandas-UDF canonicalizer runs Spark-side; the
    oracle states the EXPECTED canonical form per variant, so every rule
    (lowercase, port-strip, fragment-strip, query-sort/re-encode,
    path-default, malformed-passthrough) is bit-pinned. Dup grouping is a
    window count over the canonical key — variants 0 and 1 collapse."""
    from pyspark.sql import Window

    from gbif_data_validator_spark.functions.url import canonicalize_url_udf

    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    v = did % 5
    url = (
        F.when(v == 0, F.concat(F.lit("HTTP://WWW.Example.ORG:80/shared?b=2&a=1#f"),
                                did.cast("string")))
        .when(v == 1, F.lit("http://www.example.org/shared?a=1&b=2"))
        .when(v == 2, F.concat(F.lit("https://Example.org:443/p/"), did.cast("string")))
        .when(v == 3, F.concat(F.lit("https://example.org/q"), did.cast("string"),
                               F.lit("?x=%20y")))
        .otherwise(F.concat(F.lit("not a url "), did.cast("string")))
    )
    built = d.select("doc_id", url.alias("url_in"))
    canon = built.withColumn("url_canon", canonicalize_url_udf(F.col("url_in")))
    w = Window.partitionBy("url_canon")
    return (
        canon.select(
            "doc_id", "url_in", "url_canon",
            F.count(F.lit(1)).over(w).alias("n_same_canon"),
        )
        .orderBy("doc_id")
    )


def _q_warc_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC source surface: parse the committed Common-Crawl-convention
    fixture archive (gzip member per record) into the engine's pages
    layout — warcinfo/request/metadata records skipped, response records
    emitted with the HTTP envelope stripped. The fixture bytes are
    deterministic (scripts/make_warc_fixtures.py), so the oracle states
    the expected table as VALUES."""
    import os

    from gbif_data_validator_spark.sources.warc import read_warc_files

    fixtures = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "warc"
    )
    df = read_warc_files(spark, fixtures)
    return (
        df.where(F.col("error").isNull())
        .select(
            "url",
            "warc_ts",
            F.col("html").cast("string").alias("html_text"),
            F.length("html").cast("long").alias("n_bytes"),
        )
        .orderBy("url")
    )


def _q_cdx_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX-JSON crawl-index source: the committed cdxj fixture shards
    parsed into the typed capture table — pure Column algebra, zero
    Exchange, every malformed line an ERROR ROW (sources/cdx.py).
    Deterministic fixtures (scripts/make_cdx_fixtures.py) → VALUES
    oracle."""
    import os

    from gbif_data_validator_spark.sources.cdx import read_cdx_files

    fixtures = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "cdx"
    )
    return read_cdx_files(spark, fixtures).orderBy(
        "src_file", "error", "surt", "capture_ts"
    )


def _q_fetch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesced WARC range-read plan from the CDX fixture captures
    (max_gap 1000 B exercises both merge and split): the request-
    coalescing step between index and bytes (sources/cdx.py:fetch_plan).
    Oracle: the same gap-break running sum as a window over the capture
    VALUES."""
    import os

    from gbif_data_validator_spark.sources.cdx import fetch_plan, read_cdx_files

    fixtures = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "cdx"
    )
    return fetch_plan(read_cdx_files(spark, fixtures), max_gap_bytes=1000).orderBy(
        "filename", "range_start"
    )


def _q_cdx_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The record-structure pass for the INDEX itself (sources/cdx.py:
    cdx_checks): parse errors forwarded + SURT-recompute / status /
    digest-base32 / length / ts-epoch checks over the fixture shards —
    2 planted digest violations, 4 parse errors, zero false positives
    on the SURT recomputation. VALUES oracle (byte-deterministic
    fixtures)."""
    import os

    from gbif_data_validator_spark.sources.cdx import cdx_checks, read_cdx_files

    fixtures = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests", "fixtures", "cdx"
    )
    return cdx_checks(read_cdx_files(spark, fixtures)).orderBy("check_id", "surt")


def _q_best_captures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-side URL dedup before fetching (sources/cdx.py:
    best_captures): one capture per url under the deterministic policy
    (status-200 first, then latest, then min (filename, offset)) over a
    doc-derived capture table with ~13 recrawls per url and planted 404s.
    Oracle: the same construction + QUALIFY window."""
    from gbif_data_validator_spark.sources.cdx import best_captures

    idc = F.col("doc_id")
    cdx = _tbl(spark, sf_dir, "documents").select(
        F.concat(F.lit("https://ex.org/p"), (idc % 37).cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1_700_000_000) + idc * 3600).alias("capture_ts"),
        F.when(idc % 7 == 0, F.lit(404)).otherwise(F.lit(200)).cast("int").alias(
            "status"
        ),
        F.concat(F.lit("crawl-"), (idc % 3).cast("string"), F.lit(".warc.gz")).alias(
            "filename"
        ),
        (idc * 100).cast("long").alias("offset"),
        F.lit(None).cast("string").alias("error"),
    )
    return best_captures(cdx).select(
        "url", "capture_ts", "status", "filename", "offset"
    ).orderBy("url")


def _q_checklist_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checklist-graph evaluator (ChecklistEvaluator.java:74-130 reimagined
    relationally): a 3-level taxonomy is built from region→nation→customer
    with deterministically injected anomalies — orphan parents (%97),
    self-cycles (%101), species-under-species (%103), a 2-cycle between
    nations 23/24, synonym chains (%89/%178) — then checked for orphan
    pointers, chained synonyms, unterminated ancestor chains, and rank
    order. The oracle replays the construction and walks parents with a
    depth-capped recursive CTE."""
    from gbif_data_validator_spark.operators.checklist import checklist_graph_checks

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nul = F.lit(None).cast("long")
    reg_nodes = region.select(
        (F.col("r_regionkey") + 1).cast("long").alias("node_id"),
        nul.alias("parent_id"), nul.alias("accepted_id"),
        F.lit("kingdom").alias("rank"),
    )
    nat_nodes = nation.select(
        (F.col("n_nationkey") + 100).cast("long").alias("node_id"),
        F.when(F.col("n_nationkey") == 23, F.lit(124))
        .when(F.col("n_nationkey") == 24, F.lit(123))
        .otherwise(F.col("n_regionkey") + 1)
        .cast("long").alias("parent_id"),
        nul.alias("accepted_id"),
        F.lit("family").alias("rank"),
    )
    c = F.col("c_custkey")
    cust_nodes = customer.select(
        (c + 1000).cast("long").alias("node_id"),
        F.when(c % 97 == 0, c + 9000000)
        .when(c % 101 == 0, c + 1000)
        .when(c % 103 == 0, c + 1001)
        .otherwise(F.col("c_nationkey") + 100)
        .cast("long").alias("parent_id"),
        F.when(c % 178 == 0, c + 1089)
        .when(c % 89 == 0, c + 1001)
        .otherwise(nul)
        .cast("long").alias("accepted_id"),
        F.lit("species").alias("rank"),
    )
    nodes = reg_nodes.unionByName(nat_nodes).unionByName(cust_nodes)
    return checklist_graph_checks(
        nodes, rank_order=["kingdom", "family", "species"], max_depth=64
    ).orderBy("node_id", "check_id")


def _q_taxon_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backbone name matching (TaxonomyInterpreter shape,
    EvaluatorFactory.java:200-207): part names are the backbone; probes are
    deterministic perturbations — unknown tokens (%13 → NONE), case/
    punctuation noise (%7 → FUZZY), first-token-only (%11 → HIGHERRANK),
    else verbatim (EXACT)."""
    from gbif_data_validator_spark.operators.checklist import taxon_match

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    backbone = part.select(
        F.col("p_partkey").alias("taxon_id"), F.col("p_name").alias("name")
    )
    k = F.col("p_partkey")
    probes = part.select(
        k.alias("rec_id"),
        F.when(k % 13 == 0, F.concat(F.lit("zzzz"), k.cast("string")))
        .when(k % 7 == 0, F.upper(F.col("p_name")))
        .when(k % 11 == 0, F.concat(F.get(F.split(F.col("p_name"), " "), 0), F.lit(" zzz qq")))
        .otherwise(F.col("p_name"))
        .alias("name"),
    )
    return taxon_match(probes, backbone).orderBy("rec_id")


def _q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality filter: train an add-0.5-smoothed unigram LM
    on the deterministic lower hash-bucket half of the corpus, score the
    upper half's perplexity."""
    from gbif_data_validator_spark.operators.lm import lm_perplexity, train_unigram_lm
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    lm, oov, _ = train_unigram_lm(d.where(b < 50))
    return lm_perplexity(d.where(b >= 50), lm, oov).orderBy("doc_id")


def _q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style supervised quality filter: train a multinomial
    Naive Bayes classifier on the deterministic lower hash-bucket half
    (seed label = lang='en'), score the upper half's log-odds. Pure
    DataFrame aggregation train + broadcast-join scoring — exactly
    SQL-expressible, so the scores hash-check against DuckDB."""
    from gbif_data_validator_spark.operators.classifier import nb_score, nb_train
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    model = nb_train(d.where(b < 50).withColumn("_lbl", F.col("lang") == "en"), "_lbl")
    return (
        nb_score(d.where(b >= 50), model)
        .select("doc_id", "n_tokens", F.round("log_odds", 6).alias("log_odds"), "pred")
        .orderBy("doc_id")
    )


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights toward the English slice: hashed-bigram
    feature distributions (4096 md5 buckets), add-0.5 smoothing, per-doc
    log weight vs. the whole corpus as source."""
    from gbif_data_validator_spark.operators.lm import dsir_log_weights

    d = _docs(spark, sf_dir)
    return dsir_log_weights(d, d.where(F.col("lang") == "en")).orderBy("doc_id")


def _lined_docs(df: DataFrame) -> DataFrame:
    """Deterministic pseudo-page construction shared by the C4/funnel
    queries: the corpus is single-line word soup, so pseudo-lines of 8
    tokens are built in-query with injected rule triggers — unterminated
    lines (%3), 'javascript' lines (%11), lorem-ipsum pages (%37),
    curly-brace pages (%41). Both engines replay the construction. Input
    needs (doc_id, text); all other columns pass through, with the raw
    text preserved as ``raw``."""
    from gbif_data_validator_spark.functions.textstats import _ws_tokens

    toks = _ws_tokens(F.col("text"))
    doc = F.col("doc_id")
    nl = F.floor((F.size(toks) + 7) / F.lit(8)).cast("int")

    def line(i):
        base = F.array_join(F.slice(toks, i * 8 + 1, 8), " ")
        return (
            F.when((doc + i) % 11 == 0, F.concat(base, F.lit(" javascript.")))
            .when((doc + i) % 3 == 0, base)
            .otherwise(F.concat(base, F.lit(".")))
        )

    text2 = F.concat(
        F.array_join(F.transform(F.sequence(F.lit(0), nl - 1), line), "\n"),
        F.when(doc % 37 == 0, F.lit("\nlorem ipsum dolor sit amet.")).otherwise(F.lit("")),
        F.when(doc % 41 == 0, F.lit("\nif (x) { return 1; }")).otherwise(F.lit("")),
    )
    passthrough = [c for c in df.columns if c not in ("doc_id", "text")]
    return (
        df.where(F.col("text").isNotNull())
        .where(F.size(toks) > 0)
        .select(
            "doc_id", *passthrough,
            F.col("text").alias("raw"), text2.alias("text"),
        )
    )


def _q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning battery over deterministically re-lined documents (see
    ``_lined_docs`` for the injected rule triggers); both engines replay
    the construction, then the rules."""
    from gbif_data_validator_spark.functions.cleaning import c4_clean

    lined = _lined_docs(
        _docs(spark, sf_dir).select("doc_id", "text")
    ).select("doc_id", "text")
    return (
        c4_clean(lined)
        .select(
            "doc_id", "kept", F.md5(F.col("clean_text")).alias("clean_md5"),
            "n_lines_kept", "n_lines_dropped", "n_sentences",
            "has_lorem_ipsum", "has_curly",
        )
        .orderBy("doc_id")
    )


def _q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality gates (Rae et al. 2021 Table A1) over the raw docs."""
    from gbif_data_validator_spark.functions.cleaning import gopher_gates

    return gopher_gates(_docs(spark, sf_dir).where(F.col("text").isNotNull())).orderBy(
        "doc_id"
    )


def _q_cross_dedup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl exact dedup: the hash-bucket lower half plays the
    already-validated reference corpus; each upper-half (new) doc is
    flagged if its normalization fingerprint already exists there."""
    from gbif_data_validator_spark.operators.dedup import exact_cross_flags
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    return (
        exact_cross_flags(d.where(b >= 50), d.where(b < 50), "doc_id", "text")
        .orderBy("doc_id")
    )


def _q_minhash_cross_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination shape: near-dup pairs between the two bucket
    halves of the corpus (train-vs-benchmark analog), est_jaccard ≥ 0.5."""
    from gbif_data_validator_spark.operators.dedup import minhash_lsh_cross_pairs
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs_spread(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    return minhash_lsh_cross_pairs(
        d.where(b >= 50), d.where(b < 50), "doc_id", "text", threshold=0.5
    )


def _q_index_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-snapshot dedup via the PERSISTED MinHash band
    index (operators/dedup.py:write_minhash_index/dedup_vs_index): the
    prior crawl (bucket < 50) writes its signature index once; the new
    crawl (bucket ≥ 50) probes it with zero prior-text rescan. Same
    fixture and threshold as minhash_cross_pairs, and the oracle is the
    SAME cross-pairs SQL — so "the index path loses nothing vs the
    two-corpus join" is a hash-checked fact, not a claim."""
    import tempfile

    from gbif_data_validator_spark.operators.dedup import (
        dedup_vs_index,
        write_minhash_index,
    )
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs_spread(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    path = tempfile.mkdtemp(prefix="mh_index_")
    write_minhash_index(d.where(b < 50), path, "doc_id", "text")
    return (
        dedup_vs_index(d.where(b >= 50), path, "doc_id", "text", threshold=0.5)
        .select(
            F.col("new_id").alias("left_id"),
            F.col("index_id").alias("right_id"),
            "est_jaccard",
        )
        .orderBy("left_id", "right_id")
    )


def _q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints, exploded to (doc_id, fp) rows. The hash is
    md5-prefix-based (operators/dedup._hash64_array), so the whole pipeline —
    k-gram split, hashing, sliding-window minima, dedup — is bit-exact
    replicable in the DuckDB oracle."""
    from gbif_data_validator_spark.functions.textstats import winnow_fingerprint_udf

    d = _docs_spread(spark, sf_dir)
    return d.select(
        "doc_id", F.explode(winnow_fingerprint_udf(F.col("text"))).alias("fp")
    ).orderBy("doc_id", "fp")


def _q_cosine_dup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed embedding cosine dedup (scale path; approximate →
    rows-only; recall vs exact asserted in tests)."""
    from gbif_data_validator_spark.operators.dedup import embedding_cosine_pairs_lsh

    emb = _tbl(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs_lsh(
        emb, "vec_id", "embedding", dim=64, threshold=0.3, n_planes=6, n_tables=4
    )


def _q_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN scale path: k-means coarse quantizer + n_probe inverted lists
    (approximate → rows-only check; recall vs brute force asserted in tests)."""
    from gbif_data_validator_spark.operators.similarity import ivf_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    return ivf_topk(emb, q, k=3, n_lists=8, n_probe=3)


def _q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means clusters + in-cluster cosine pruning; survivors
    ordered by id (k-means not SQL-reproducible → rows-only; golden-
    structure behavior asserted in tests/test_similarity.py)."""
    from gbif_data_validator_spark.operators.similarity import semantic_dedup

    return (
        semantic_dedup(
            _tbl(spark, sf_dir, "embeddings"), n_clusters=8, threshold=0.9
        )
        .select("vec_id")
        .orderBy("vec_id")
    )


def _q_tdigest_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest UDAF (explicit partial/merge/final) quantiles of
    lineitem.l_extendedprice — approximate → rows-only."""
    from gbif_data_validator_spark.operators.tdigest import t_digest_quantiles

    li = _tbl(spark, sf_dir, "lineitem")
    qs = t_digest_quantiles(li, "l_extendedprice", [0.1, 0.5, 0.9, 0.99])
    return spark.createDataFrame(
        [(p, round(v, 2)) for p, v in qs], schema="p double, q double"
    )


def _q_profile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/rollup profile: per-partition + grand-total column stats (HLL
    distinct, null/non-blank counts, length sketches) in ONE aggregation
    scan — approx sketches → rows-only check. Array-typed sketch columns are
    serialized with to_json so the driver canonicalizer can hash the rows;
    the grand-total (rollup NULL) key is labeled 'ALL' for stability."""
    from gbif_data_validator_spark.operators.metrics import partitioned_profile

    prof = partitioned_profile(_docs(spark, sf_dir), "lang")
    return prof.withColumn(
        "text_len_quantiles", F.to_json("text_len_quantiles")
    ).withColumn("lang", F.coalesce("lang", F.lit("ALL")))


def _q_profile_rollup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact half of the rollup profile, DuckDB-oracled: per-lang +
    grand-total row counts, non-blank counts, null counts, and EXACT distinct
    counts in one ROLLUP aggregation (the sketch half — HLL + quantiles —
    stays in profile_rollup's rows-only check)."""
    from gbif_data_validator_spark.functions.predicates import non_blank

    d = _docs(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in ["doc_id", "text", "source", "n_chars"]:
        aggs.append(F.count(F.when(non_blank(F.col(c)), 1)).alias(f"{c}_non_blank"))
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls"))
        aggs.append(F.countDistinct(c).alias(f"{c}_distinct"))
    return (
        d.rollup("lang")
        .agg(*aggs)
        .withColumn("lang", F.coalesce("lang", F.lit("ALL")))
        .orderBy("lang")
    )


def _q_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.operators.similarity import lsh_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    return lsh_topk(emb, q, dim=64, k=3, n_planes=6, multiprobe=6)


def _q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ ANN (compressed-domain scale path): candidates shuffle as m
    small ints, never raw vectors; ADC scoring from per-query lookup
    tables. Approximate — recall vs brute force pinned in pytest."""
    from gbif_data_validator_spark.operators.similarity import pq_ivf_topk

    emb = _tbl(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 8)
    return pq_ivf_topk(emb, q, dim=64, k=3, n_lists=8, n_probe=4)


def _q_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gbif_data_validator_spark.operators.drift import ks_drift

    e = _tbl(spark, sf_dir, "events")
    return ks_drift(
        e, metric=F.col("value"), ts_col="ts", window_fmt="yyyy-MM-dd", min_rows=10
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction over mapInPandas, exploded to one row
    per (doc_id, feature index). The deterministic fake decode (byte-
    histogram moments over a seeded payload) is bit-exact replicable in
    DuckDB — payload = 'media-payload-' || sha256(doc_id || '42'), features =
    high-nibble histogram / payload length as float32 — so the whole Arrow
    plumbing path gets a real value-hash correctness row."""
    from gbif_data_validator_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    feats = extract_media_features(synth_media(spark, 500))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.posexplode("features").alias("feat_idx", "feat_val"),
    ).withColumn("feat_idx", F.col("feat_idx").cast("long")).orderBy(
        "doc_id", "feat_idx"
    )


def _q_pages_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full engine pass battery on a synthesized pages table (the primary
    north-star workload; synthetic because testdata has no html column).
    ORACLED as a VALUES table (the house pattern for non-parquet fixtures,
    like ``warc_pages``): ``synth_pages(3000, with_violations=True)`` is
    deterministic, and its per-check counts are the same goldens the
    verify-skill pins — 4 per planted check class, 3 duplicate-key rows,
    1 drift window."""
    from gbif_data_validator_spark.plans.engine import EngineConfig, ValidationEngine
    from gbif_data_validator_spark.sources.synthetic import synth_pages

    from gbif_data_validator_spark.sources.lang_dim import lang_dim

    pages = synth_pages(spark, 3000, with_violations=True).drop("expected_issue")
    eng = ValidationEngine(spark, EngineConfig(check_extraction=True))
    return (
        eng.build_violations(pages, lang_dim(spark))
        .groupBy("check_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("check_id")
    )


def _q_bloom_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-filtered big-big referential (the explicit runtime-filter
    shape): bit-identical result to ``lapsed_customers``, but definite
    misses exit at a scan-side probe and only |matches| + ~1% of orphans
    reach the anti-join shuffle."""
    from gbif_data_validator_spark.operators.bloom import orphan_rows_bloom

    c = _tbl(spark, sf_dir, "customer")
    recent = _tbl(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2001-01-01 00:00:00").cast("timestamp")
    )
    return (
        orphan_rows_bloom(c, recent.select("o_custkey"), "c_custkey", "o_custkey")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


#: tables covered by the physical-layout audit (single parquet files in the
#: driver's testdata — the oracle below hard-codes that 1-file layout, the
#: Spark side measures it for real via input_file_name()).
_AUDIT_TABLES = ("customer", "documents", "events", "lineitem", "orders")


def _q_file_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical-layout audit: per-table file census (small-file detector)
    over input_file_name() — zero data columns read."""
    from gbif_data_validator_spark.operators.layout import layout_audit

    tables = {t: f"{sf_dir}/{t}.parquet" for t in _AUDIT_TABLES}
    return layout_audit(spark, tables).orderBy("table")


def _q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of lineitem.l_orderkey: top-10 heaviest groups
    + share of total — the decision input for salting (SURVEY.md §4.2)."""
    from gbif_data_validator_spark.operators.layout import key_skew_audit

    return key_skew_audit(_tbl(spark, sf_dir, "lineitem"), "l_orderkey", top_k=10)


def _q_corr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ ``Correlation`` analyzer, engine-portable: Pearson r of
    (l_quantity, l_extendedprice) per return flag from EXACT decimal
    moments — the five sums are order-independent integers, so the value
    hash-checks across engines/cluster sizes where a naive double-sum
    ``corr()`` would drift in the low bits. One grouped aggregation scan."""
    from gbif_data_validator_spark.operators.constraints import correlation_exact

    return correlation_exact(
        _tbl(spark, sf_dir, "lineitem"),
        "l_quantity",
        "l_extendedprice",
        ["l_returnflag"],
    ).orderBy("l_returnflag")


#: null_patterns fixture — deterministic planted missingness (the driver's
#: parquet tables carry no NULLs, so the census demos on the house VALUES
#: pattern like warc_pages/pages_validation). (s, v, t): three columns, five
#: distinct co-occurrence patterns.
_NULLPAT_FIXTURE: list[tuple] = [
    ("a", 1.0, "x"), ("b", 2.0, "y"), ("c", 3.0, "z"),   # 000 ×3
    ("d", None, "x"), ("e", None, "y"),                   # 010 ×2
    (None, None, "x"),                                    # 110
    ("f", 4.0, None),                                     # 001
    (None, None, None), (None, None, None),               # 111 ×2
]


def _q_null_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-pattern census over the planted fixture: which NULLs
    co-occur row-wise — the completeness view per-column null counts can't
    express. Oracle recomputes the same patterns from the same VALUES."""
    from gbif_data_validator_spark.operators.constraints import null_pattern_census

    df = spark.createDataFrame(_NULLPAT_FIXTURE, "s string, v double, t string")
    return null_pattern_census(df, ["s", "v", "t"])


#: dtype_census fixture — one value per classification branch: integrals
#: (signed, leading zeros), fractionals (bare point, exponent, overflow
#: literal '1e309' — regex says fractional, try_cast engines disagree,
#: which is WHY the classifier is regex-based), booleans (any case),
#: strings (empty, padded ' 42' — anchors reject unstripped input), NULL.
_DTYPE_FIXTURE: list[str | None] = [
    "42", "-7", "+10", "0007", "3.14", ".5", "10.", "2e3", "1e309",
    "TRUE", "false", "abc", "", " 42", None,
]


def _q_dtype_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ ``DataType`` analyzer over the planted string fixture: per-class
    counts + the most-specific covering type, one conditional-agg scan.
    Oracle replays the identical anchored ASCII regexes in DuckDB."""
    from gbif_data_validator_spark.operators.constraints import dtype_census

    df = spark.createDataFrame([(v,) for v in _DTYPE_FIXTURE], "v string")
    return dtype_census(df, "v")


def _q_interval_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2/validity-epoch invariant: per-supplier shipment intervals
    (l_shipdate .. +l_linenumber days) must not overlap; every violating
    row is convicted by the running max of earlier interval ends — one
    window per key, catching containment chains the adjacent-lag shortcut
    misses. Restricted to suppliers < 30 to bound the exhibit."""
    from gbif_data_validator_spark.operators.sequence import interval_overlaps

    iv = (
        _tbl(spark, sf_dir, "lineitem")
        .where(F.col("l_suppkey") < 30)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.col("l_shipdate").alias("valid_from"),
            F.timestamp_add(
                "DAY", F.col("l_linenumber"), F.col("l_shipdate")
            ).alias("valid_to"),
        )
    )
    return interval_overlaps(
        iv, ["l_suppkey"], "valid_from", "valid_to",
        tiebreak=["l_orderkey", "l_linenumber"],
    ).orderBy("l_suppkey", "valid_from", "l_orderkey", "l_linenumber")


def _q_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-completeness census: holes in the event_id sequence after
    deterministically knocking out every 97th id plus the 3000-3499 block
    (spans five buckets at bucket=1000, exercising the boundary-stitch
    path). Bucketed two-level plan — no global sort of the ids."""
    from gbif_data_validator_spark.operators.sequence import id_gaps

    ev = _tbl(spark, sf_dir, "events").where(
        (F.col("event_id") % 97 != 0)
        & ~F.col("event_id").between(3000, 3499)
    )
    return id_gaps(ev, "event_id", bucket=1000).orderBy("gap_start")


def _q_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arrival census: per event_type, in event_id (arrival) order,
    rows whose ts is behind the running high-water mark — what a streaming
    watermark would have dropped, attributed row-by-row with exact
    microsecond lateness. The corpus arrives time-ordered, so lateness is
    planted in-query by a deterministic jitter (+(event_id %% 13) × 10
    min) both engines replay — the c4_clean trigger-injection discipline."""
    from gbif_data_validator_spark.operators.sequence import out_of_order_rows

    ev = _tbl(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.timestamp_add(
            "MINUTE", (F.col("event_id") % 13) * 10, F.col("ts")
        ).alias("ts"),
    )
    return out_of_order_rows(ev, ["event_type"], "event_id", "ts").orderBy(
        "event_type", "event_id"
    )


def _q_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type freshness/cadence verdict against the global max
    timestamp (deterministic 'now'): lag in exact microseconds, mean
    inter-arrival gap, stale = lag > 3 mean gaps. One grouped agg + a
    1-row broadcast crossJoin."""
    from gbif_data_validator_spark.operators.sequence import freshness_by_group

    return freshness_by_group(
        _tbl(spark, sf_dir, "events"), "event_type", "ts", stale_factor=3.0
    ).orderBy("group_key")


def _q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed FineWeb-shape cleaning recipe as ONE auditable funnel:
    C4 → Gopher → language → exact dedup, each doc attributed to the FIRST
    stage that dropped it, censused into (stage, n_docs, share). Runs over
    the re-lined pseudo-pages (``_lined_docs`` triggers) plus planted
    clones (doc_id %% 7 → +100000, same raw text) so the dedup stage has
    work; Gopher's stopword gate is relaxed to 0 because the synthetic
    vocabulary contains none of the published eight stopwords (the
    threshold exists for exactly this corpus-calibration purpose). Dedup
    fingerprints the RAW text — clones whose re-lined variants pass the
    filters are convicted by the surviving original."""
    from gbif_data_validator_spark.operators.curation import (
        curation_funnel,
        funnel_census,
    )

    base = _docs(spark, sf_dir).select("doc_id", "lang", "text").where(
        F.col("text").isNotNull()
    )
    cloned = base.unionByName(
        base.where(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
    )
    lined = _lined_docs(cloned).withColumn(
        "fp", F.md5(F.coalesce(F.col("raw"), F.lit("")))
    )
    staged = curation_funnel(
        lined,
        allowed_langs=("en",),
        fingerprint_col="fp",
        gopher_kwargs={"min_stopword_hits": 0},
    )
    return funnel_census(staged).orderBy("stage")


#: agg_rules battery — Deequ hasMin/hasMax/hasMean/hasSum + GE row-count +
#: freshness envelopes, mixed pass/fail on real lineitem aggregates
#: (sf0.01: n=60000, min qty 1, max qty 50, mean qty 25.40225,
#: sum price 3,183,256,271.63, max shipdate 2001-11-04)
_AGG_RULES: list[tuple[str, str, str]] = [
    ("l_quantity", "MIN_BETWEEN", "1..1"),
    ("l_quantity", "MAX_BETWEEN", "1..49"),            # max is 50 → fail
    ("l_quantity", "MEAN_BETWEEN", "20..30"),
    ("l_extendedprice", "SUM_BETWEEN", "0..2000000000"),  # 3.18e9 → fail
    ("*", "N_ROWS_BETWEEN", "1..100000000"),
    ("l_shipdate", "FRESH_WITHIN", "2002-01-01 00:00:00|31536000"),  # ≤1y → pass
    ("l_shipdate", "FRESH_WITHIN", "2005-01-01 00:00:00|86400"),     # stale → fail
    ("*", "COMPLIANCE_GE", "l_discount <= 0.08|0.8"),   # 0.8527 ≥ 0.8 → pass
    ("l_orderkey", "UNIQUE_RATIO_GE", "0.5"),           # 0.2457 < 0.5 → fail
]


def _q_agg_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregate-envelope rule kinds (Deequ hasMin/hasMax/hasMean/
    hasSum, GE row-count, freshness-vs-pinned-now) in the SAME one-scan
    battery as the counting kinds. MEAN/SUM sums accumulate in quantized
    DECIMAL(38,0) (the correlation_exact discipline) so the verdicts
    hash-check across engines and partitionings."""
    from gbif_data_validator_spark.operators.constraints import verify_constraints

    return verify_constraints(_tbl(spark, sf_dir, "lineitem"), _AGG_RULES)


#: key-discovery search space over orders (10 combos at arity ≤ 2):
#: o_orderkey is the one true minimal key; every pair containing it is a
#: key but not minimal; nothing else reaches n_distinct == n
_KEY_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")


def _q_key_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unique-column-combination discovery (Deequ KeyDiscovery / HyUCC,
    bounded): every arity-≤2 combo's exact distinct count in ONE
    aggregation scan, keys and MINIMAL keys flagged. The oracle replays
    the counts and the fixed subset lattice."""
    from gbif_data_validator_spark.operators.constraints import candidate_keys

    return candidate_keys(
        _tbl(spark, sf_dir, "orders"), list(_KEY_COLS), max_arity=2
    )


def _q_lang_script_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared-language vs observed-writing-system cross-check: the
    corpus is Latin word soup with langs assigned independently, so every
    zh-labeled doc would mismatch; consistency is planted in-query
    (zh docs with even doc_id get genuinely CJK-dominant text, which both
    engines replay) so the check discriminates instead of blanket-firing."""
    from gbif_data_validator_spark.operators.record_checks import (
        lang_script_mismatch,
    )

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    t2 = F.when(
        (F.col("lang") == "zh") & (F.col("doc_id") % 2 == 0),
        F.lit("中文网页测试 " * 40),
    ).otherwise(F.col("text"))
    return lang_script_mismatch(
        d.select("doc_id", "lang", t2.alias("text")), id_cols=["doc_id"]
    ).orderBy("doc_id")


def _q_js_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between two crawls' source distributions
    — the bounded, symmetric drift alarm that stays finite when a NEW
    category appears (planted: the odd-doc crawl relabels every 19th doc
    'newsrc'). Deterministic value-sorted fold, hash-exact at 6 dp."""
    from gbif_data_validator_spark.operators.drift import js_divergence

    d = _docs(spark, sf_dir)
    a = d.where(F.col("doc_id") % 2 == 0)
    b = d.where(F.col("doc_id") % 2 == 1).withColumn(
        "source",
        F.when(F.col("doc_id") % 19 == 0, F.lit("newsrc")).otherwise(
            F.col("source")
        ),
    )
    return js_divergence(a, b, "source")


def _q_chisq_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square homogeneity statistic between two crawls'
    source distributions — the sampling-noise-aware drift alarm (grows
    with N, compare vs the chi-square quantile at dof). Planted shift:
    the odd-doc crawl relabels every 13th doc to 'src0', moving mass
    toward an EXISTING category (the case js_drift's new-category plant
    doesn't cover). Deterministic value-sorted fold, hash-exact at 6 dp."""
    from gbif_data_validator_spark.operators.drift import chisq_drift

    d = _docs(spark, sf_dir)
    a = d.where(F.col("doc_id") % 2 == 0)
    b = d.where(F.col("doc_id") % 2 == 1).withColumn(
        "source",
        F.when(F.col("doc_id") % 13 == 0, F.lit("src0")).otherwise(
            F.col("source")
        ),
    )
    return chisq_drift(a, b, "source")


#: domain_census fixture — one url per registered-domain rule branch:
#: multi-level public suffix (3+ labels), plain 2-label, deep subdomain,
#: vhost collapse (two hosts, one owner), IPv4 literal, single-label
#: intranet host, port/query/fragment noise, and a no-host malformed row
#: IDN/homoglyph spoof fixture — every detection branch exercised:
#: punycode at ^ and mid-host, xn-- NOT at a label start (must NOT flag),
#: Latin+Cyrillic and Latin+Greek mixed labels, a pure-Cyrillic label
#: (legitimate IDN: non_ascii only), benign ASCII, and a non-url.
_SPOOF_FIXTURE: list[str] = [
    "https://good.example.com/a",
    "https://good.example.com/b",
    "https://xn--pypal-4ve.example.com/x",
    "https://sub.xn--80ak6aa92e.com/y",
    "https://axn--fake.example.com/z",
    "https://pаypal.example.com/login",
    "https://πshop.example.org/",
    "https://кириллица.example.ru/",
    "http://plain.example.net/q",
    "not a url at all",
]

#: the same confusable class / mixed-label regex functions/url.py compiles,
#: spelled for the DuckDB replay (RE2 and Java read these constructs
#: identically — literal chars, [.], alternation)
_SPOOF_CONF = "Ѐ-ӿͰ-Ͽ"
_SPOOF_MIXED_RE = (
    "(^|[.])[^.]*([a-z][^.]*[" + _SPOOF_CONF + "]|[" + _SPOOF_CONF + "][^.]*[a-z])"
)


def _q_host_spoof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN/homoglyph host spoof census over the planted url fixture —
    (host, n_pages, punycode, mixed_script, non_ascii), flagged hosts
    only; the oracle replays host extraction AND all three detection
    regexes over the same VALUES fixture."""
    from gbif_data_validator_spark.operators.curation import idn_spoof_census

    df = spark.createDataFrame([(u,) for u in _SPOOF_FIXTURE], "url string")
    return idn_spoof_census(df, "url")


_DOMAIN_FIXTURE: list[str] = [
    "https://www.news.bbc.co.uk/politics/story",
    "http://media.bbc.co.uk/img.png",
    "https://example.com/",
    "https://a.b.c.example.com/deep?q=1#f",
    "http://shop.example.com:8080/cart",
    "https://EXAMPLE.com/UPPER",
    "http://192.168.10.20/admin",
    "http://intranet/wiki",
    "https://www.com.au.evil.org/phish",
    "not a url at all",
]


def _synth_param_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic URL fixture for the query-param census: every doc
    gets an id-like param, residue classes add a low-cardinality utm
    param, a blank-valued ref, a content param (page), a tracking token
    (fbclid), and a bare flag (debug); every 17th doc has no query string
    at all. The oracle replays the identical construction."""
    idc = F.col("doc_id")
    s = idc.cast("string")
    host = F.concat(F.lit("h"), (idc % 37).cast("string"), F.lit(".example.com"))
    base = F.concat(F.lit("https://"), host, F.lit("/p/"), s)
    params = F.concat(
        F.lit("id="), s,
        F.when(idc % 2 == 0,
               F.concat(F.lit("&utm_source=s"), (idc % 3).cast("string"))
               ).otherwise(F.lit("")),
        F.when(idc % 5 == 0, F.lit("&ref=")).otherwise(F.lit("")),
        F.when(idc % 7 == 0,
               F.concat(F.lit("&page="), (idc % 4).cast("string"))
               ).otherwise(F.lit("")),
        F.when(idc % 11 == 0, F.concat(F.lit("&fbclid=x"), s)
               ).otherwise(F.lit("")),
        F.when(idc % 13 == 0, F.lit("&debug")).otherwise(F.lit("")),
    )
    url = F.when(idc % 17 == 0, base).otherwise(
        F.concat(base, F.lit("?"), params)
    )
    return _tbl(spark, sf_dir, "documents").select(url.alias("url"))


def _q_url_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-string parameter census over the fixture URLs — the
    evidence table behind URL canonicalization: params whose
    distinct_ratio_micro → 1e6 across many hosts are tracking tokens to
    strip before URL-keyed dedup (id, fbclid plant that shape); page/
    utm_source plant the low-ratio content-param shape; ref plants the
    blank value; debug the bare flag; every 17th doc has no query
    string. Raw-key semantics by contract (no decode / case fold)."""
    from gbif_data_validator_spark.operators.curation import url_param_census

    return url_param_census(
        _synth_param_urls(spark, sf_dir), "url"
    ).orderBy("param")


def _q_domain_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain (eTLD+1) census over the fixture urls →
    (domain, n_pages, n_hosts) — the grain politeness/quota/salting
    decisions operate at. Every suffix-rule branch is exercised; the
    oracle replays the identical split + suffix-list algebra."""
    from gbif_data_validator_spark.functions.url import registered_domain, url_host

    df = spark.createDataFrame([(u,) for u in _DOMAIN_FIXTURE], "url string")
    return (
        df.select(
            registered_domain(F.col("url")).alias("domain"),
            F.lower(url_host(F.col("url"))).alias("host"),
        )
        .where(F.col("domain").isNotNull())
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("host").alias("n_hosts"),
        )
        .orderBy("domain")
    )


def _q_reconcile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-vs-rollup reconciliation summary: lineitem's per-order
    extendedprice sum against orders.o_totalprice (the synthetic tables
    are independent, so everything present on both sides mismatches — the
    exhibit is the DELTA census). One row: status counts + exact max/sum
    of |delta| (decimal-summed, hash-portable)."""
    from gbif_data_validator_spark.operators.referential import (
        reconcile_aggregates,
    )

    rec = reconcile_aggregates(
        _tbl(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        _tbl(spark, sf_dir, "orders"),
        ["o_orderkey"],
        "l_extendedprice",
        "o_totalprice",
    )
    absd = F.abs(F.col("delta"))
    absq = F.when(absd.isNotNull(), F.round(absd * F.lit(1e6))).cast(
        "decimal(38,0)"
    )
    return rec.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.count(F.when(F.col("status") == "matched", 1)).alias("n_matched"),
        F.count(F.when(F.col("status") == "mismatched", 1)).alias("n_mismatched"),
        F.count(F.when(F.col("status") == "fact_only", 1)).alias("n_fact_only"),
        F.count(F.when(F.col("status") == "rollup_only", 1)).alias("n_rollup_only"),
        F.round(F.max(absd), 6).alias("max_abs_delta"),
        F.round(F.sum(absq).cast("double") / F.lit(1e6), 6).alias("sum_abs_delta"),
    )


def _synth_link_html(idc: F.Column) -> F.Column:
    """Deterministic html-with-links fixture over a doc_id column (house
    replay-over-parquet pattern, like checklist_checks): 1-4 absolute
    anchors to a 23-host universe, a single-quoted anchor every 5th doc,
    and a relative link on every doc that must drop out (NULL host)."""
    link = lambda k: F.concat(  # noqa: E731 — tiny local template
        F.lit('<a class="c" href="https://h'),
        ((idc * 7 + k * 13) % 23).cast("string"),
        F.lit(".example.org/p"),
        k.cast("string"),
        F.lit('">link</a>'),
    )
    links = F.array_join(
        F.transform(F.sequence(F.lit(1).cast("long"), idc % 4 + 1), link), ""
    )
    squote = F.when(
        idc % 5 == 0,
        F.concat(
            F.lit("<a href='https://h"),
            ((idc * 11) % 23).cast("string"),
            F.lit(".example.org/q'>x</a>"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        F.lit("<html><body>"),
        links,
        squote,
        F.lit('<a href="/local/1">r</a></body></html>'),
    )


def _synth_titled_html(idc: F.Column) -> F.Column:
    """Deterministic titled-page fixture over a doc_id column: a <title>
    on all but every 11th doc (every 13th carries tag attributes + messy
    whitespace that must normalize away), 1-3 anchors with VARYING anchor
    text into the 23-host universe, and a relative link that must drop."""
    n37 = (idc % 37).cast("string")
    title = (
        F.when(idc % 11 == 0, F.lit(""))
        .when(
            idc % 13 == 0,
            F.concat(
                F.lit('<title data-x="1">  Title\t'), n37, F.lit("  </title>")
            ),
        )
        .otherwise(F.concat(F.lit("<title>Title "), n37, F.lit("</title>")))
    )
    link = lambda k: F.concat(  # noqa: E731 — tiny local template
        F.lit('<a href="https://h'),
        ((idc * 7 + k * 13) % 23).cast("string"),
        F.lit(".example.org/p"),
        k.cast("string"),
        F.lit('">Anchor  '),
        ((idc + k) % 5).cast("string"),
        F.lit("</a>"),
    )
    links = F.array_join(
        F.transform(F.sequence(F.lit(1).cast("long"), idc % 3 + 1), link), ""
    )
    return F.concat(
        F.lit("<html><head>"),
        title,
        F.lit("</head><body>"),
        links,
        F.lit('<a href="/rel">skip</a></body></html>'),
    )


def _titled_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    idc = F.col("doc_id")
    return _tbl(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://h"),
            (idc % 23).cast("string"),
            F.lit(".example.org/d"),
            idc.cast("string"),
        ).alias("url"),
        _synth_titled_html(idc).alias("html"),
    )


def _q_dup_titles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-<title> census: the zero-model template/scrape detector
    — titles shared by 2+ pages with page/host counts and a deterministic
    example url. Fixture html is synthesized from doc_id (titles repeat
    mod 37 across the 23-host universe, every 13th doc exercises the
    attribute+whitespace normalization path); the oracle replays the
    construction, extraction, and normalization with RE2 regexes."""
    from gbif_data_validator_spark.operators.curation import (
        duplicate_title_census,
    )

    return duplicate_title_census(_titled_pages(spark, sf_dir)).orderBy(
        "title"
    )


def _q_anchor_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 anchor texts per target host — what the web CALLS each host,
    the off-page description signal link-spam triage ranks on. The census
    aggregates at (host, text) grain, then cuts with a deterministic
    window (n_links desc, text asc); the oracle replays construction,
    the two-capture-group extraction (list_zip alignment), normalization,
    and the ROW_NUMBER cut."""
    from gbif_data_validator_spark.operators.graph import anchor_text_census

    return anchor_text_census(
        _titled_pages(spark, sf_dir), top_k=3
    ).orderBy("host", "rank")


def _q_outlink_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level outlink census: anchor hrefs extracted from html with
    pure Column regexes (functions/extraction.py:outlinks/link_host) →
    per-host link count + distinct-source count — the ingestion half of
    the host reputation graph (operators/graph.py:outlink_census) and the
    link-farm detector on its own. Fixture html is synthesized
    deterministically from documents.doc_id; the oracle replays BOTH the
    construction and the extraction with RE2 regexes."""
    from gbif_data_validator_spark.operators.graph import outlink_census

    docs = _tbl(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", _synth_link_html(F.col("doc_id")).alias("html")
    )
    return (
        outlink_census(pages, html_col="html", id_col="doc_id")
        .orderBy("host")
    )


def _q_noindex_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-robots directive scan (the web-native input to the reference's
    "indexable" verdict): <meta name="robots"> parsed case-insensitively
    in either attribute order; named-crawler metas (googlebot) are out of
    scope by contract and must NOT flag. Returns flagged docs only."""
    from gbif_data_validator_spark.functions.extraction import (
        robots_directives,
    )

    idc = F.col("doc_id")
    meta = (
        F.when(idc % 7 == 0, F.lit('<meta name="robots" content="noindex">'))
        .when(
            idc % 7 == 1,
            F.lit('<meta name="ROBOTS" content="NOINDEX, NOFOLLOW">'),
        )
        .when(idc % 7 == 2, F.lit('<meta content="nofollow" name="robots">'))
        .when(idc % 7 == 3, F.lit('<meta name="googlebot" content="noindex">'))
        .otherwise(F.lit('<meta charset="utf-8">'))
    )
    html = F.concat(
        F.lit("<html><head>"), meta, F.lit("</head><body><p>b</p></body></html>")
    )
    d = (
        _tbl(spark, sf_dir, "documents")
        .select("doc_id", robots_directives(html).alias("d"))
        .select("doc_id", F.col("d.noindex").alias("noindex"),
                F.col("d.nofollow").alias("nofollow"))
    )
    return d.where(F.col("noindex") | F.col("nofollow")).orderBy("doc_id")


def _linked_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared fixture for the web-graph referential queries: documents
    get the deterministic link html (`_synth_link_html`, hosts h0..h22)
    plus their OWN url on the smaller h0..h16 universe — so six hosts
    (h17..h22) are linked-to but never owned, a planted crawl frontier."""
    docs = _tbl(spark, sf_dir, "documents")
    idc = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (idc % 17).cast("string"),
            F.lit(".example.org/page/"), idc.cast("string"),
        ).alias("url"),
        _synth_link_html(idc).alias("html"),
    )


def _q_frontier_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dangling-outlink referential (operators/graph.py:frontier_hosts):
    hosts the corpus links to but does not contain — outlink census
    anti-joined against the corpus' own host dimension, both at host
    grain. The oracle replays construction, extraction, and anti-join."""
    from gbif_data_validator_spark.operators.graph import frontier_hosts

    return frontier_hosts(
        _linked_pages(spark, sf_dir), html_col="html", url_col="url"
    ).orderBy("host")


def _q_reciprocal_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal host-pair census (operators/graph.py:reciprocal_links):
    unordered host pairs linked in BOTH directions with per-direction
    multiplicities — the link-exchange signal, emitted once per pair via
    host_a < host_b over a self-join of the directed host-edge agg."""
    from gbif_data_validator_spark.operators.graph import reciprocal_links

    return reciprocal_links(
        _linked_pages(spark, sf_dir), html_col="html", url_col="url"
    ).orderBy("host_a", "host_b")


#: robots.txt fixture — one document per grammar branch: comments + CR +
#: empty-Disallow + non-star record (h0), multi-UA run including * (h1),
#: no star record at all (h2), case-insensitive fields + wildcard rule
#: (h3), empty file (h4)
_ROBOTS_FIXTURE: list[tuple[str, str]] = [
    (
        "h0.example.org",
        "# crawl policy\nUser-agent: *\r\nDisallow: /private/\n"
        "Disallow:\n\nUser-agent: bot\nDisallow: /botonly/\n",
    ),
    ("h1.example.org", "User-agent: bot\nUser-agent: *\nDisallow: /secret\n"),
    ("h2.example.org", "User-agent: bot\nDisallow: /x\n"),
    (
        "h3.example.org",
        "user-AGENT:   *\nDISALLOW: /Case/\ndisallow: /wild*card\n",
    ),
    ("h4.example.org", ""),
]


#: Allow/Disallow interplay fixture for the RFC 9309 precedence query
_ROBOTS_RFC_FIXTURE: list[tuple[str, str]] = [
    (
        "a0.example.org",
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
        "Disallow: /private/pub/sec\n",
    ),
    ("a1.example.org", "User-agent: *\nAllow: /\nDisallow: /tmp\n"),
    ("a2.example.org", "User-agent: *\nDisallow: /a\nAllow: /a\n"),
]


def _q_robots_rfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 group-member precedence
    (operators/robots.py:robots_blocked_rfc): longest matching rule
    wins, Allow beats Disallow on equal length — ``Disallow: /private/``
    + ``Allow: /private/pub/`` + ``Disallow: /private/pub/sec`` layer
    three levels deep, and the ``/a`` allow/disallow tie resolves to
    allowed. Page urls derive from documents (host = doc_id%3, path =
    doc_id%6 branch). Oracle replays the whole relational parse AND the
    precedence window."""
    from gbif_data_validator_spark.operators.robots import (
        robots_blocked_rfc,
        robots_rules_full,
    )

    robots = spark.createDataFrame(
        _ROBOTS_RFC_FIXTURE, "host string, text string"
    )
    rules = robots_rules_full(robots)
    idc = F.col("doc_id")
    path = (
        F.when(idc % 6 == 0, F.lit("/private/x"))
        .when(idc % 6 == 1, F.lit("/private/pub/x"))
        .when(idc % 6 == 2, F.lit("/private/pub/secret"))
        .when(idc % 6 == 3, F.lit("/tmp/x"))
        .when(idc % 6 == 4, F.lit("/a/z"))
        .otherwise(F.lit("/ok"))
    )
    pages = _tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://a"), (idc % 3).cast("string"),
            F.lit(".example.org"), path,
        ).alias("url"),
    )
    return robots_blocked_rfc(pages, rules).orderBy("doc_id")


def _q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parse (operators/robots.py:robots_rules): Disallow
    rules from records whose user-agent set includes '*' — posexplode +
    one host-grain window, RFC 9309 interoperable core (multi-UA runs,
    case-insensitive fields, comment/CR strip, empty-Disallow = allow,
    wildcards surfaced not matched). Oracle replays the whole relational
    parse over the same VALUES fixture."""
    from gbif_data_validator_spark.operators.robots import robots_rules

    robots = spark.createDataFrame(_ROBOTS_FIXTURE, "host string, text string")
    return robots_rules(robots).orderBy("host", "rule")


def _q_robots_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt compliance audit (operators/robots.py:robots_blocked):
    corpus pages whose path a star-record Disallow rule prefix-matches —
    the per-host politeness check beside noindex_pages' per-page one.
    Page urls derive from documents (host = doc_id%5, path = doc_id%7
    branch: blocked prefix / prefix-extension / case-miss / wildcard /
    bare-root / clean); join is host-equi + in-join prefix predicate."""
    from gbif_data_validator_spark.operators.robots import (
        robots_blocked,
        robots_rules,
    )

    robots = spark.createDataFrame(_ROBOTS_FIXTURE, "host string, text string")
    rules = robots_rules(robots)
    idc = F.col("doc_id")
    path = (
        F.when(idc % 7 == 0, F.lit("/private/a"))
        .when(idc % 7 == 1, F.lit("/secret-page"))
        .when(idc % 7 == 2, F.lit("/Case/x"))
        .when(idc % 7 == 3, F.lit("/case/x"))
        .when(idc % 7 == 4, F.lit("/wildXcard/z"))
        .when(idc % 7 == 5, F.lit(""))
        .otherwise(F.lit("/ok"))
    )
    pages = _tbl(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (idc % 5).cast("string"),
            F.lit(".example.org"), path,
        ).alias("url"),
    )
    return robots_blocked(pages, rules).orderBy("doc_id")


def _q_canonical_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publisher-declared duplicate clusters (operators/curation.py:
    canonical_census): pages grouped by <link rel="canonical"> target
    with off-host syndication counts. Fixture covers both attribute
    orders, case/quote variants, rel-first precedence, a stylesheet
    link that must NOT match, and own-host canonicals; the oracle
    replays construction and extraction."""
    from gbif_data_validator_spark.operators.curation import canonical_census

    idc = F.col("doc_id")
    target = F.concat(
        F.lit("https://c"), (idc % 9).cast("string"),
        F.lit(".example.org/page"),
    )
    own = F.concat(
        F.lit("https://s"), (idc % 4).cast("string"),
        F.lit(".example.org/canon"),
    )
    meta = (
        F.when(idc % 6 == 0, F.concat(
            F.lit('<link rel="canonical" href="'), target, F.lit('">')))
        .when(idc % 6 == 1, F.concat(
            F.lit('<link href="'), target, F.lit('" rel="canonical">')))
        .when(idc % 6 == 2, F.concat(
            F.lit("<LINK REL='canonical' HREF='"), target, F.lit("'>")))
        .when(idc % 6 == 3,
              F.lit('<link rel="stylesheet" href="https://x.com/s.css">'))
        .when(idc % 6 == 4, F.concat(
            F.lit('<link rel="canonical" href="'), own, F.lit('">')))
        .otherwise(F.concat(
            F.lit('<link rel="canonical" href="'), target,
            F.lit('"><link href="https://loser.example.org/x" rel="canonical">'),
        ))
    )
    pages = _tbl(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://s"), (idc % 4).cast("string"),
            F.lit(".example.org/p/"), idc.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("<html><head>"), meta, F.lit("</head><body>b</body></html>")
        ).alias("html"),
    )
    return canonical_census(pages).orderBy("canonical")


#: crawl-delay fixture — star record with delay + rules (h0), delay with
#: an unparseable duplicate that try_cast drops (h1), non-star record
#: whose delay must NOT apply (h2), star record with no delay (h3), and
#: a second non-star record whose bigger delay must NOT win (h4)
_ROBOTS_DELAY_FIXTURE: list[tuple[str, str]] = [
    ("h0.example.org", "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"),
    ("h1.example.org", "User-agent: *\nCrawl-delay: 2.5\nCrawl-delay: oops\n"),
    ("h2.example.org", "User-agent: bot\nCrawl-delay: 9\n"),
    ("h3.example.org", "User-agent: *\nDisallow: /y\n"),
    (
        "h4.example.org",
        "User-agent: *\nCrawl-delay: 1\nUser-agent: zbot\nCrawl-delay: 99\n",
    ),
]


def _q_crawl_delay_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay politeness audit (operators/robots.py:
    robots_crawl_delay + crawl_delay_violations): per-host declared
    delays from star records (max wins, try_cast drops junk), then
    fetches whose gap to the previous fetch (host-grain window,
    (ts, url)-deterministic order) undercuts the delay. Fetch times
    derive from events via the md5 epoch-offset construction so gaps
    are dense; the oracle replays parse, fixture, and window."""
    from gbif_data_validator_spark.operators.robots import (
        crawl_delay_violations,
        robots_crawl_delay,
    )

    robots = spark.createDataFrame(
        _ROBOTS_DELAY_FIXTURE, "host string, text string"
    )
    delays = robots_crawl_delay(robots)
    ev = _tbl(spark, sf_dir, "events")
    eid = F.col("event_id")
    fetch_ts = F.timestamp_seconds(
        F.lit(1_600_000_000)
        + F.conv(F.substring(F.md5(eid.cast("string")), 1, 8), 16, 10)
          .cast("long") % 50_000
    )
    pages = ev.select(
        F.concat(
            F.lit("https://h"), (F.col("user_id") % 5).cast("string"),
            F.lit(".example.org/u/"), eid.cast("string"),
        ).alias("url"),
        fetch_ts.alias("warc_ts"),
    )
    return crawl_delay_violations(pages, delays).orderBy(
        "host", "fetch_ts", "url"
    )


def _q_sitemap_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap coverage audit (operators/robots.py:sitemap_coverage):
    per host, how many of its published <loc> urls the corpus contains —
    the inverse of frontier_hosts. Fixture: VALUES sitemaps (dup entry,
    case/whitespace variants, a wrong-host entry, a never-crawled url,
    a loc-free host that must emit nothing) against doc-derived corpus
    urls; the oracle replays extraction, dedup, join, and census."""
    from gbif_data_validator_spark.operators.robots import sitemap_coverage

    sitemaps = spark.createDataFrame(
        [
            (
                "h0.example.org",
                '<?xml version="1.0"?><urlset>'
                "<url><loc>https://h0.example.org/p/0</loc></url>"
                "<url><LOC>  https://h0.example.org/p/4\n</LOC></url>"
                "<url><loc>https://h0.example.org/p/9</loc></url>"
                "<url><loc>https://h0.example.org/p/0</loc></url></urlset>",
            ),
            (
                "h1.example.org",
                "<urlset><loc>https://h1.example.org/p/1</loc>"
                "<loc>https://h1.example.org/p/99999</loc></urlset>",
            ),
            ("h2.example.org", "<urlset><notloc>x</notloc></urlset>"),
        ],
        "host string, text string",
    )
    idc = F.col("doc_id")
    pages = _tbl(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://h"), (idc % 4).cast("string"),
            F.lit(".example.org/p/"), idc.cast("string"),
        ).alias("url")
    )
    return sitemap_coverage(pages, sitemaps).orderBy("host")


def _q_fk_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationship-cardinality census (Deequ relationship checks):
    customers bucketed by how many orders reference them (0 / 1 / 2-3 /
    4+) plus a fact_orphan row counting distinct o_custkey values with no
    customer — the contract check behind "orders→customer is N:1 and
    total"."""
    from gbif_data_validator_spark.operators.referential import (
        relationship_cardinality,
    )

    return relationship_cardinality(
        _tbl(spark, sf_dir, "customer"),
        _tbl(spark, sf_dir, "orders"),
        "c_custkey",
        "o_custkey",
        bounds=(1, 2, 4),
    ).orderBy("card_class")


def _q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-rate control chart over events: per-day row counts flagged
    by the robust-z (median ± k·1.4826·MAD) rule computed over the bucket
    series itself — one input scan, stats via window passes over the tiny
    bucket table (operators/sequence.py:rate_anomaly)."""
    from gbif_data_validator_spark.operators.sequence import rate_anomaly

    return rate_anomaly(
        _tbl(spark, sf_dir, "events"), "ts", window="day", k=2.0
    ).orderBy("bucket")


def _q_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift detector over per-day event volumes: exact
    integer ``S_k = n_buckets·cum_k − k·total`` per bucket, change point
    at the deterministic argmax, side means in integer micro-units — the
    sustained-shift counterpart of the rate_anomaly single-window flag
    (operators/sequence.py:cusum_changepoint)."""
    from gbif_data_validator_spark.operators.sequence import cusum_changepoint

    return cusum_changepoint(
        _tbl(spark, sf_dir, "events"), "ts", window="day"
    ).orderBy("bucket")


def _q_neyman_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal sample allocation across sources for estimating
    mean document length: budget ∝ N_h·σ_h (exact DECIMAL moments, one
    IEEE sqrt per stratum), largest-remainder rounding sums to the budget
    EXACTLY (operators/sampling.py:neyman_allocation)."""
    from gbif_data_validator_spark.operators.sampling import neyman_allocation

    return neyman_allocation(
        _docs(spark, sf_dir), "source", "n_chars", total_n=100
    ).orderBy("stratum")


def _q_evolving_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution-aware union: two synthetic crawl months with
    drifted schemas (int→long key, int→double measure, a column added
    later) read as ONE table under deterministic widening rules — the
    Iceberg-native behavior emulated over raw parquet, plan-level only
    (sources/evolution.py:evolving_union; no Exchange by test)."""
    from gbif_data_validator_spark.operators.sampling import hash_bucket
    from gbif_data_validator_spark.sources.evolution import evolving_union

    d = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    month1 = d.where(b < 50).select(
        F.col("doc_id").cast("int").alias("doc_id"),
        F.col("n_chars").cast("int").alias("n_chars"),
        "lang",
    )
    month2 = d.where(b >= 50).select(
        "doc_id",
        F.col("n_chars").cast("double").alias("n_chars"),
        "lang",
        "source",
    )
    out, _findings = evolving_union([month1, month2])
    return out.orderBy("doc_id")


def _q_group_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM level shifts: which series shifted to a new
    volume level and when — the grouped face of cusum_shift (a host whose
    volume halved is invisible in the global series when another doubled);
    all windows partition by key, no SinglePartition pass
    (operators/sequence.py:group_cusum_shifts)."""
    from gbif_data_validator_spark.operators.sequence import group_cusum_shifts

    return group_cusum_shifts(
        _tbl(spark, sf_dir, "events"), "event_type", "ts", window="day"
    ).orderBy("key")


def _q_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish pre-tokens per whitespace
    word in exact micro-units — the per-language token-budget multiplier
    training-mix planners need (a corpus 'balanced by words' can be 2-3x
    skewed in tokens). One conditional-agg scan at lang grain
    (functions/textstats.py:bpe_token_count / ws_token_count)."""
    from gbif_data_validator_spark.functions.textstats import (
        bpe_token_count,
        ws_token_count,
    )

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(ws_token_count(F.col("text"))).cast("long").alias("ws_tokens"),
            F.sum(bpe_token_count(F.col("text"))).cast("long").alias("bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "ws_tokens",
            "bpe_tokens",
            F.when(
                F.col("ws_tokens") > 0,
                F.expr("(1000000 * bpe_tokens) div ws_tokens"),
            ).alias("fertility_micro"),
        )
        .orderBy("lang")
    )


def _q_style_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows-Delta stylometric distance between sources: L1 distance of
    exact micro-unit relative-frequency profiles over the global top-50
    vocabulary — the mirror-network / same-generator detector content
    dedup misses (operators/metrics.py:style_distance_census)."""
    from gbif_data_validator_spark.operators.metrics import style_distance_census

    return style_distance_census(
        _docs_spread(spark, sf_dir), "source", "text", vocab_k=50
    ).orderBy("group_a", "group_b")


def _q_compression_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deflate-compressibility quality gate per document: exact micro-unit
    zlib ratio + band verdict (too_repetitive / keep / too_random) — the
    cheap information-density filter Gopher-family pipelines run before
    anything model-based. Rows-only (DuckDB has no deflate); the exact
    ratio arithmetic and band ordering are pinned in pytest
    (functions/textstats.py:compression_ratio_micro)."""
    from gbif_data_validator_spark.functions.textstats import (
        compression_ratio_micro,
    )

    r = compression_ratio_micro(F.col("text"))
    return (
        _docs_spread(spark, sf_dir)
        .select(
            "doc_id",
            r.alias("ratio_micro"),
            F.when(r.isNull(), F.lit("empty"))
            .when(r < 200_000, F.lit("too_repetitive"))
            .when(r > 650_000, F.lit("too_random"))
            .otherwise(F.lit("keep"))
            .alias("band"),
        )
        .orderBy("doc_id")
    )


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the deterministic host graph with two
    pendant tiers (p-/q-hosts) grafted on so the peel cascades ~7 rounds
    before the 23-host core stabilizes — organic-core vs peripheral-chaff
    separation, per-node peel depth included
    (operators/graph.py:kcore_membership). Oracle: the identical 10
    synchronous peel rounds unrolled as chained CTEs."""
    from gbif_data_validator_spark.operators.graph import kcore_membership

    idc = F.col("doc_id")
    docs = _tbl(spark, sf_dir, "documents")
    h_edges = docs.select(
        idc,
        F.explode(F.sequence(F.lit(1).cast("long"), idc % 3 + 1)).alias("k"),
    ).select(
        F.concat(F.lit("h"), (idc % 23).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((idc * 7 + F.col("k") * 13) % 23).cast("string")).alias(
            "dst"
        ),
    )
    p_edges = docs.where(idc % 5 == 0).select(
        F.concat(F.lit("p"), (idc % 97).cast("string")).alias("src"),
        F.concat(F.lit("h"), (idc % 23).cast("string")).alias("dst"),
    )
    q_edges = docs.where(idc % 3 == 0).select(
        F.concat(F.lit("q"), (idc % 53).cast("string")).alias("src"),
        F.concat(F.lit("p"), (idc % 97).cast("string")).alias("dst"),
    )
    edges = h_edges.unionByName(p_edges).unionByName(q_edges)
    return kcore_membership(edges, k=3, max_rounds=10).orderBy("node")


def _q_label_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label-propagation communities (RAK, deterministic
    max-label tie-break) after exactly 4 rounds over the same
    deterministic host graph as the kcore query — the mirror-network /
    link-farm partitioner between PageRank (ranks) and connected
    components (glues everything reachable)
    (operators/graph.py:label_propagation). Oracle: the identical 4
    synchronous rounds unrolled as chained window-CTEs."""
    from gbif_data_validator_spark.operators.graph import label_propagation

    idc = F.col("doc_id")
    docs = _tbl(spark, sf_dir, "documents")
    h_edges = docs.select(
        idc,
        F.explode(F.sequence(F.lit(1).cast("long"), idc % 3 + 1)).alias("k"),
    ).select(
        F.concat(F.lit("h"), (idc % 23).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((idc * 7 + F.col("k") * 13) % 23).cast("string")).alias(
            "dst"
        ),
    )
    p_edges = docs.where(idc % 5 == 0).select(
        F.concat(F.lit("p"), (idc % 97).cast("string")).alias("src"),
        F.concat(F.lit("h"), (idc % 23).cast("string")).alias("dst"),
    )
    q_edges = docs.where(idc % 3 == 0).select(
        F.concat(F.lit("q"), (idc % 53).cast("string")).alias("src"),
        F.concat(F.lit("p"), (idc % 97).cast("string")).alias("dst"),
    )
    edges = h_edges.unionByName(p_edges).unionByName(q_edges)
    return label_propagation(edges, rounds=4).orderBy("node")


def _lpa_oracle_sql(rounds: int = 4) -> str:
    """Unrolled synchronous label-propagation replay: round r counts
    neighbor labels from l_{r-1} and every node takes the (max count, then
    max label) winner — identical semantics to label_propagation's bounded
    loop."""
    parts = [
        """
            WITH e0 AS MATERIALIZED (
              SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
                     'h' || CAST((doc_id * 7 + kk * 13) % 23 AS VARCHAR) AS dst
              FROM (SELECT doc_id,
                           unnest(range(1, (doc_id % 3 + 1) + 1)) AS kk
                    FROM documents)
              UNION ALL
              SELECT 'p' || CAST(doc_id % 97 AS VARCHAR),
                     'h' || CAST(doc_id % 23 AS VARCHAR)
              FROM documents WHERE doc_id % 5 = 0
              UNION ALL
              SELECT 'q' || CAST(doc_id % 53 AS VARCHAR),
                     'p' || CAST(doc_id % 97 AS VARCHAR)
              FROM documents WHERE doc_id % 3 = 0
            ),
            e AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e0 WHERE src <> dst
            ),
            inc AS MATERIALIZED (
              SELECT a AS node, b AS nbr FROM e
              UNION ALL
              SELECT b, a FROM e
            ),
            l0 AS MATERIALIZED (
              SELECT DISTINCT node, node AS label FROM inc
            )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
            cnt{r} AS MATERIALIZED (
              SELECT i.node, l.label, COUNT(*) AS cnt
              FROM inc i JOIN l{r - 1} l ON i.nbr = l.node
              GROUP BY 1, 2
            ),
            l{r} AS MATERIALIZED (
              SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (
                         PARTITION BY node ORDER BY cnt DESC, label DESC
                       ) AS rn
                FROM cnt{r})
              WHERE rn = 1
            )"""
        )
    parts.append(
        f"""
            SELECT node, label FROM l{rounds} ORDER BY node"""
    )
    return "".join(parts)


def _kcore_oracle_sql(k: int = 3, rounds: int = 10) -> str:
    """Unrolled synchronous-peel replay: round r recomputes alive-degrees
    from the incidence list restricted to a_{r-1} and peels everything
    under k — identical semantics to kcore_membership's bounded loop (an
    early-converged round peels nothing, so bounded == converged)."""
    parts = [
        """
            WITH e0 AS MATERIALIZED (
              SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
                     'h' || CAST((doc_id * 7 + kk * 13) % 23 AS VARCHAR) AS dst
              FROM (SELECT doc_id,
                           unnest(range(1, (doc_id % 3 + 1) + 1)) AS kk
                    FROM documents)
              UNION ALL
              SELECT 'p' || CAST(doc_id % 97 AS VARCHAR),
                     'h' || CAST(doc_id % 23 AS VARCHAR)
              FROM documents WHERE doc_id % 5 = 0
              UNION ALL
              SELECT 'q' || CAST(doc_id % 53 AS VARCHAR),
                     'p' || CAST(doc_id % 97 AS VARCHAR)
              FROM documents WHERE doc_id % 3 = 0
            ),
            e AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e0 WHERE src <> dst
            ),
            inc AS MATERIALIZED (
              SELECT a AS node, b AS nbr FROM e
              UNION ALL
              SELECT b, a FROM e
            ),
            a0 AS MATERIALIZED (SELECT DISTINCT node FROM inc)"""
    ]
    # every round CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    # a{r} referencing a{r-1} three times would plan 3^rounds copies
    for r in range(1, rounds + 1):
        parts.append(
            f""",
            deg{r} AS MATERIALIZED (
              SELECT i.node, COUNT(*) AS deg
              FROM inc i
              JOIN a{r - 1} x ON i.node = x.node
              JOIN a{r - 1} y ON i.nbr = y.node
              GROUP BY i.node
            ),
            rem{r} AS MATERIALIZED (
              SELECT a.node, {r} AS r
              FROM a{r - 1} a LEFT JOIN deg{r} d ON a.node = d.node
              WHERE COALESCE(d.deg, 0) < {k}
            ),
            a{r} AS MATERIALIZED (
              SELECT node FROM a{r - 1} EXCEPT SELECT node FROM rem{r}
            )"""
        )
    removed = "\n              UNION ALL\n              ".join(
        f"SELECT node, r FROM rem{r}" for r in range(1, rounds + 1)
    )
    parts.append(
        f""",
            removed AS (
              {removed}
            )
            SELECT node, CAST(r AS BIGINT) AS removed_round,
                   FALSE AS in_kcore
            FROM removed
            UNION ALL
            SELECT node, CAST(NULL AS BIGINT), TRUE FROM a{rounds}
            ORDER BY node"""
    )
    return "".join(parts)


def _q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cross-crawl overlap census at the content-fingerprint grain:
    hash-bucket halves with a deliberate 20-bucket overlap play two
    monthly crawls; one fingerprint-grain shuffle + 1-row fold yields the
    Jaccard/containment numbers that decide whether a full cross-corpus
    dedup join is worth running (operators/overlap.py:corpus_overlap)."""
    from gbif_data_validator_spark.operators.overlap import corpus_overlap
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    return corpus_overlap(d.where(b < 60), d.where(b >= 40), "text")


def _q_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV bottom-k sketch estimate of the same census — fixed k·8 bytes
    per side instead of a fingerprint-grain shuffle. Round 4: the
    engine-portable md5-prefix hash path makes the ENTIRE estimator —
    bottom-k sketches, mergeable union sketch, (k−1)/u_k estimates,
    Jaccard sample — a hard oracle row (DuckDB replays every value
    bit-for-bit); xxhash64 stays the production default with identical
    semantics (operators/overlap.py:kmv_overlap)."""
    from gbif_data_validator_spark.operators.overlap import kmv_overlap
    from gbif_data_validator_spark.operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"), 100)
    return kmv_overlap(
        d.where(b < 60), d.where(b >= 40), "text", k=256, hash_fn="md5"
    )


def _q_cms_point_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min-Sketch point estimates beside exact truth for the 50 most
    frequent tokens: the sketch is built with md5-derived cell hashing so
    every cell count and MIN-over-rows estimate is one canonical integer —
    DuckDB replays the entire construction bit-for-bit, pinning both the
    estimator and its one-sided error (est >= exact always)
    (operators/cms.py:cms_build/cms_query)."""
    from gbif_data_validator_spark.operators.cms import cms_build, cms_query

    toks = (
        _docs_spread(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "term"
            )
        )
        .where(F.col("term") != "")
    )
    sketch = cms_build(toks, "term", width=1024, depth=4)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top = exact.orderBy(F.desc("exact_cnt"), "term").limit(50)
    est = cms_query(sketch, top.select("term"), "term", width=1024, depth=4)
    return (
        top.join(est, "term")
        .select("term", "exact_cnt", "cms_est")
        .orderBy("term")
    )


def _q_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend + Mann–Kendall direction over per-day event
    volumes: lower-median pairwise slope in exact integer micro-units,
    Sen intercept, and the S statistic — "is the crawl drifting, and how
    fast", completing the rate_anomaly / cusum_shift monitoring triad
    (operators/sequence.py:theil_sen_trend)."""
    from gbif_data_validator_spark.operators.sequence import theil_sen_trend

    return theil_sen_trend(_tbl(spark, sf_dir, "events"), "ts", window="day")


def _q_seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly (ISO weekday × hour) arrival-rhythm fingerprint with exact
    integer per-weekday shares and deterministic peak-hour flags — the
    scheduler-bug / replayed-batch detector
    (operators/sequence.py:seasonality_profile)."""
    from gbif_data_validator_spark.operators.sequence import seasonality_profile

    return seasonality_profile(_tbl(spark, sf_dir, "events"), "ts").orderBy(
        "dow", "hour"
    )


def _q_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion of hourly arrival counts — Poisson-ness of the
    arrival process as one exact micro-unit scalar, DECIMAL(38,0)/HUGEINT
    numerator with a division-exact quotient so both engines agree bit-for-
    bit (operators/sequence.py:dispersion_census)."""
    from gbif_data_validator_spark.operators.sequence import dispersion_census

    return dispersion_census(_tbl(spark, sf_dir, "events"), "ts", window="hour")


#: doc_id%7 → injected mojibake fragment (single source of truth with the
#: DuckDB oracle, which replays the same CASE as string concat).  One class
#: per residue: latin-1 digraph (repairable), cp1252 trigraphs (repairable),
#: digraph + dangling lead byte (signal but malformed → NOT repairable),
#: U+FFFD (already lost), bare C1 control, NBSP artifact (repairable);
#: residue 6 stays clean.
_MOJIBAKE_FRAGMENTS = [
    " cafÃ© au lait",
    " donâ€™t â€” ever",
    " naÃ¯ ve Ã",
    " bad � byte",
    " x \x85 y",
    " Â padded",
]


def _q_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding-column health (operators/vectors.py) over the
    embeddings table with deterministically injected defects — NULL
    vectors, truncated dimensions, all-zero vectors, trailing NaN — by
    vec_id residue (pure list algebra both engines replay identically).
    Norm stats aggregate as integer micro-units, so the whole battery is
    exact despite the float math."""
    from gbif_data_validator_spark.operators.vectors import embedding_health

    e = F.col("embedding").cast("array<double>")
    vid = F.col("vec_id")
    corrupted = (
        F.when(vid % 97 == 0, F.lit(None).cast("array<double>"))
        .when(vid % 89 == 0, F.slice(e, 1, 32))
        .when(vid % 83 == 0, F.transform(e, lambda x: F.lit(0.0)))
        .when(
            vid % 79 == 0,
            F.concat(F.slice(e, 1, 63), F.array(F.lit(float("nan")))),
        )
        .otherwise(e)
    )
    df = _tbl(spark, sf_dir, "embeddings").select(
        "label", corrupted.alias("embedding")
    )
    return embedding_health(
        df, "embedding", ["label"], expected_dim=64
    ).orderBy("label")


def _q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-SPACE drift between consecutive vec_id windows
    (operators/vectors.py:embedding_drift) with a deterministically
    injected encoder swap over the second half of the id range
    (``x -> 0.8*x + 0.05`` — pure list algebra both engines replay
    identically): scalar marginals barely move, centroid alignment
    drops at the swap boundary.  The whole battery is integer-exact:
    milli-quantized elements, floor-divided centroids, one rounded
    double expression per cosine."""
    from gbif_data_validator_spark.operators.vectors import embedding_drift

    emb = _tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    b = emb.agg(F.max("vec_id").alias("_mx"))
    swapped = (
        emb.crossJoin(F.broadcast(b))
        .select(
            "vec_id",
            F.when(
                F.col("vec_id") > F.col("_mx") / F.lit(2),
                F.transform(e, lambda x: x * F.lit(0.8) + F.lit(0.05)),
            )
            .otherwise(e)
            .alias("embedding"),
        )
    )
    return embedding_drift(swapped, "vec_id", "embedding", n_windows=5)


def _q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding outliers (operators/vectors.py:
    embedding_outliers) with deterministically injected mislabeled
    points — every ``vec_id % 101 == 0`` vector scaled ×5, pushing it
    far from its label centroid (pure list algebra both engines replay
    identically).  Distances, group stats, and the 3σ threshold are all
    exact micro-unit arithmetic."""
    from gbif_data_validator_spark.operators.vectors import embedding_outliers

    emb = _tbl(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    corrupted = emb.select(
        "vec_id",
        "label",
        F.when(
            F.col("vec_id") % 101 == 0,
            F.transform(e, lambda x: x * F.lit(5.0)),
        )
        .otherwise(e)
        .alias("embedding"),
    )
    return embedding_outliers(corrupted, "vec_id", "embedding", "label")


def _q_manifest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-manifest integrity (operators/layout.py:manifest_audit)
    over the lineitem table: the manifest is derived from the actual
    file census with a deterministic drift (+7 rows declared for
    even-length basenames) plus a ghost entry, exercising the
    FILE_MISSING and ROWCOUNT_MISMATCH classes; FILE_ORPHAN is pinned
    by pytest (needs a multi-file table). The actual side is one narrow
    input_file_name() count — no data columns read."""
    from gbif_data_validator_spark.operators.layout import (
        file_rowcounts,
        manifest_audit,
    )

    li = _tbl(spark, sf_dir, "lineitem")
    fc = file_rowcounts(li)
    manifest = fc.select(
        "file",
        (
            F.col("n_rows")
            + F.when(F.length("file") % 2 == 0, F.lit(7)).otherwise(F.lit(0))
        ).alias("n_rows"),
    ).unionByName(
        spark.createDataFrame(
            [("ghost-000.parquet", 123)], "file string, n_rows long"
        )
    )
    return manifest_audit(li, manifest)


def _q_media_checks_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-vs-content media validation
    (operators/multimodal.py:media_meta_checks) made HASH-CHECKABLE: the
    payloads are deterministically CONSTRUCTED Column-algebra PPM bytes
    (valid 2x2 / truncated-header / empty / unsniffable by doc_id
    residue), so the real decode path runs end-to-end and every finding
    string — including the decoder's own error message — is pinned by
    the oracle. Converts the family's rows-only `media_meta_violations`
    into a hard correctness row."""
    from gbif_data_validator_spark.operators.multimodal import (
        media_meta_checks,
    )

    k = F.col("doc_id") % 8
    ppm = F.concat(
        F.encode(F.lit("P6\n2 2\n255\n"), "UTF-8"),
        F.unhex(F.lit("102030405060708090A0B0C0")),
    )
    # real 2x2 VP8L lossless webp (encode_webp_lossless output, fixed
    # bytes) + the same stream with the bitstream cut mid-code — the
    # round-4 WebP decode branch, dims + error string pinned by oracle
    webp_ok = ("5249464692000000574542505650384C850000002F01400000F04010000000"
               "00000000400000001000000004000000010000000000000000000000000000"
               "00000000000078200800000000000008000000020000800000002000000000"
               "0000000000000000000000000000003C100400000000000000004000000010"
               "000000040000000100000000000000000000000000000000FD0F40AD7E00")
    webp_trunc = "5249464618000000574542505650384C0C0000002F01400000F0401000000000"
    payload = (
        F.when(k == 3, F.unhex(F.lit("")))
        # 14 bytes (past sniff's minimum) but the maxval token never
        # arrives (comment runs to EOF) -> the decoder's own header guard
        .when(k == 4, F.encode(F.lit("P6\n2 2\n#aaaaaa"), "UTF-8"))
        .when(k == 5, F.encode(F.lit("zzzzzzzzzzzz"), "UTF-8"))
        .when(k == 6, F.unhex(F.lit(webp_ok)))
        .when(k == 7, F.unhex(F.lit(webp_trunc)))
        .otherwise(ppm)
    )
    meta = F.struct(
        F.when(k == 2, F.lit("audio/wav"))
        .when(k == 5, F.lit("image/jpeg"))
        .when((k == 6) | (k == 7), F.lit("image/webp"))
        .otherwise(F.lit("image/ppm"))
        .alias("media_type"),
        F.when((k == 1) | (k == 6), F.lit(3))
        .otherwise(F.lit(2)).cast("int").alias("width"),
        F.lit(2).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )
    media = _tbl(spark, sf_dir, "documents").select(
        "doc_id", payload.alias("media"), meta.alias("meta")
    )
    return media_meta_checks(media).orderBy("doc_id")


def _q_jpeg_progressive_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 progressive JPEG (SOF2) branch of the media battery: the
    payloads are fixed hex literals from encode_jpeg_gray(progressive=True)
    on a deterministic 8x8 gradient — a REAL SOF2 spectral-selection
    stream the from-scratch decoder (operators/multimodal.py::_decode_jpeg,
    T.81 G) decodes through the multi-scan path. Residues: k=0 progressive
    dims-match (silent), k=1 progressive dims-mismatch, k=2 truncated
    progressive (decode-error finding, message pinned), k=3 the BASELINE
    encoding of the same image with the same dims-mismatch — pinning that
    both modes land the identical finding."""
    from gbif_data_validator_spark.operators.multimodal import (
        media_meta_checks,
    )

    prog = ("ffd8ffdb0043000302020302020303030304030304050805050404050a0707"
            "06080c0a0c0c0b0a0b0b0d0e12100d0e110e0b0b1016101113141515150c0f"
            "171816141812141514ffc2000b080008000801011100ffc4001400000000000"
            "0000001000000000000000003ffc4001a1000000000000000070000000000000"
            "0000006092532a3f0ffda0008010100000000005fffda0008010100013f00016"
            "c09b60801ac15807fffd9")
    base = ("ffd8ffdb0043000302020302020303030304030304050805050404050a0707"
            "06080c0a0c0c0b0a0b0b0d0e12100d0e110e0b0b1016101113141515150c0f"
            "171816141812141514ffc0000b080008000801011100ffc4001400000000000"
            "0000001000000000000000003ffc4001a1000000000000000070000000000000"
            "0000006092532a3f0ffda0008010100003f0000402d8136c1003582b00fffd9")
    trunc = prog[:168]
    k = F.col("doc_id") % 4
    payload = (
        F.when(k == 2, F.unhex(F.lit(trunc)))
        .when(k == 3, F.unhex(F.lit(base)))
        .otherwise(F.unhex(F.lit(prog)))
    )
    meta = F.struct(
        F.lit("image/jpeg").alias("media_type"),
        F.when(k == 0, F.lit(8)).when(k == 2, F.lit(8))
        .otherwise(F.lit(4)).cast("int").alias("width"),
        F.when(k == 0, F.lit(8)).when(k == 2, F.lit(8))
        .otherwise(F.lit(4)).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )
    media = (
        _tbl(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 2000)
        .select("doc_id", payload.alias("media"), meta.alias("meta"))
    )
    return media_meta_checks(media).orderBy("doc_id")


def _q_mojibake_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang mojibake census + repairability over documents with
    deterministically injected double-decode artifacts (the testdata corpus
    is pure ASCII, so the corruption is added by doc_id residue — pure
    string concat both engines replay bit-identically).  Census itself is
    one WholeStageCodegen projection + one map-side-combinable aggregate
    (functions/encoding.py:mojibake_census)."""
    from gbif_data_validator_spark.functions.encoding import mojibake_census

    frag = F.lit("")
    for i, f in enumerate(_MOJIBAKE_FRAGMENTS):
        frag = F.when(F.col("doc_id") % 7 == i, F.lit(f)).otherwise(frag)
    docs = _docs(spark, sf_dir).select(
        "lang", F.concat(F.col("text"), frag).alias("text")
    )
    return mojibake_census(docs, "text", ["lang"]).orderBy("lang")


def _q_term_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index keyword search (operators/search.py): build the
    persisted term index, then answer the conjunctive query
    ['join','merge'] — top-10 by exact rational TF-IDF micro-units.
    The oracle recomputes the same scoring from the raw table, proving
    index write→pruned read→score equals the from-scratch definition."""
    import tempfile

    from gbif_data_validator_spark.operators.search import (
        build_term_index,
        search_term_index,
    )

    path = tempfile.mkdtemp(prefix="termidx_")
    build_term_index(_docs(spark, sf_dir), "doc_id", "text", path)
    return search_term_index(spark, path, ["join", "merge"], k=10)


def _q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search (operators/search.py): build the
    (term, doc_id, pos) postings, then find the exact consecutive phrase
    "table table" — a REPEATED term, so the anchor trick's
    distinct-offset witness requirement is what the oracle checks (a
    naive contains-both would overcount). Top-10 by occurrence count."""
    import tempfile

    from gbif_data_validator_spark.operators.search import (
        build_positional_index,
        phrase_search,
    )

    path = tempfile.mkdtemp(prefix="posidx_")
    build_positional_index(_docs(spark, sf_dir), "doc_id", "text", path)
    return phrase_search(spark, path, ["table", "table"], k=10)


def _q_kwic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-in-context snippets (operators/search.py:kwic_snippets):
    first case-insensitive occurrence of "merge batch" per doc with ±30
    chars of context — zero-shuffle Column algebra (instr + substring),
    char-position semantics identical to DuckDB strpos/substr."""
    from gbif_data_validator_spark.operators.search import kwic_snippets

    return kwic_snippets(
        _docs(spark, sf_dir), "doc_id", "text", "merge batch", radius=30
    ).orderBy("doc_id")


def _q_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host co-citation census (operators/graph.py:cocitation_census):
    distinct source pages linking to BOTH hosts of a pair, over the same
    deterministic html-with-links fixture as outlink_census — top-30
    pairs by co-source count with full (count desc, a, b) tie-break.
    The oracle replays construction, extraction, per-source DISTINCT
    host sets, the degree gate, and the a<b pairing."""
    from gbif_data_validator_spark.operators.graph import cocitation_census

    docs = _tbl(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", _synth_link_html(F.col("doc_id")).alias("html")
    )
    return (
        cocitation_census(pages, html_col="html", id_col="doc_id")
        .orderBy(F.desc("n_cosources"), "host_a", "host_b")
        .limit(30)
    )


def _q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition (Markov bigram) census
    (operators/sequence.py:transition_census), (ts, event_id, type)
    total order so ties are deterministic."""
    from gbif_data_validator_spark.operators.sequence import transition_census

    e = _tbl(spark, sf_dir, "events")
    return transition_census(e, "user_id", "ts", "event_type", "event_id").orderBy(
        "from_type", "to_type"
    )


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-sequential signup→view→click→purchase funnel
    (operators/sequence.py:funnel_counts): per-step surviving-user counts,
    each step's event strictly after the previous step's completion."""
    from gbif_data_validator_spark.operators.sequence import funnel_counts

    e = _tbl(spark, sf_dir, "events")
    return funnel_counts(
        e, "user_id", "ts", "event_type", ["signup", "view", "click", "purchase"]
    ).orderBy("step_idx")


def _q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention matrix (operators/sequence.py:cohort_retention): users by
    first-event date cohort, counted once per day-offset active."""
    from gbif_data_validator_spark.operators.sequence import cohort_retention

    e = _tbl(spark, sf_dir, "events")
    return (
        cohort_retention(e, "user_id", "ts", max_offset=30)
        .select(
            F.col("cohort_date").cast("string").alias("cohort_date"),
            "offset_days",
            "n_users",
        )
        .orderBy("cohort_date", "offset_days")
    )


def _q_continuation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-article chaining (operators/curation.py:continuation_pairs):
    plant continuation pages (doc tail-48 becomes the new page's head)
    for every 10th doc, then detect the tail→head pairs — the directed
    signature near-dup detectors miss because the bodies don't overlap."""
    from gbif_data_validator_spark.operators.curation import continuation_pairs

    base = (
        _docs(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select("doc_id", F.trim("text").alias("t"))
    )
    cont = base.where((F.col("doc_id") % 10 == 0) & (F.length("t") >= 200)).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.concat(F.substring("t", -48, 48), F.substring("t", 1, 150)).alias("t"),
    )
    corpus = base.unionByName(cont)
    return continuation_pairs(corpus, "doc_id", "t", k=48).orderBy("doc_a", "doc_b")


def _q_term_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-association census (operators/metrics.py:term_cooccurrence):
    top-30 co-occurring pairs over the top-100 vocabulary by rational
    lift (PMI's argument, in exact micro-units — no bit-unportable log),
    deterministic (lift desc, word_a, word_b) total order."""
    from gbif_data_validator_spark.operators.metrics import term_cooccurrence

    return (
        term_cooccurrence(_docs(spark, sf_dir), "doc_id", "text", top_n=100, min_pair=2)
        .orderBy(F.desc("lift_ppm"), F.asc("word_a"), F.asc("word_b"))
        .limit(30)
    )


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARI readability census per lang (operators/metrics.py:
    readability_census): grade-level outliers flag OCR garbage and
    template farms; per-doc scores floor-quantized to integer ppm
    before aggregation so every stat is bit-exact."""
    from gbif_data_validator_spark.operators.metrics import readability_census

    return readability_census(_docs(spark, sf_dir), "text", ["lang"]).orderBy("lang")


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus k-gram novelty census per lang (operators/dedup.py:
    ngram_novelty): what fraction of 8-gram instances are verbatim
    repeats — the snapshot-level memorization-risk summary behind
    ExactSubstr dedup, with dup_rate in exact integer micro-units."""
    from gbif_data_validator_spark.operators.dedup import ngram_novelty

    return ngram_novelty(_docs(spark, sf_dir), "text", k=8, group_cols=["lang"]).orderBy(
        "lang"
    )


def _q_bpe_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training pass 1 — the distributed word-type frequency table
    (operators/tokenizer.py:word_frequencies), top 20 types under the
    deterministic (cnt DESC, word ASC) total order. One explode + one
    partial-aggable groupBy; the shuffle carries word TYPES (bounded by
    vocabulary), never token instances — this is the sufficient statistic
    every real BPE trainer reduces the corpus to before its merge loop."""
    from gbif_data_validator_spark.operators.tokenizer import word_frequencies

    return (
        word_frequencies(_docs(spark, sf_dir))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(20)
        .select("word", F.col("cnt").cast("long").alias("cnt"))
    )


def _q_bpe_token_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-tokenizer token accounting: train a 64-merge BPE on the corpus
    (driver merge loop over the bounded word-type table, deterministic
    tie-breaks), then the per-doc census — n_tokens under the LEARNED
    merges plus chars/token (compression) and tokens/word (fertility).
    Rows-only by nature (the merge loop is iterative, like PageRank);
    determinism + the Sennrich golden are pinned in tests/test_tokenizer.py."""
    from gbif_data_validator_spark.operators.tokenizer import (
        bpe_train,
        token_census,
    )

    docs = _docs(spark, sf_dir)
    model = bpe_train(docs, n_merges=64)
    return token_census(_docs_spread(spark, sf_dir), model).orderBy("doc_id")


#: BM25 session-13 fixture: one term per frequency band (sorted, so tf_i
#: column order is stable between engines)
BM25_TERMS = ["hash", "slow", "vector"]
BM25_K = 20

#: token blocklist for the C4-style gate: two present terms + one absent
#: ('spill' never appears in the synthetic vocabulary — the census must
#: NOT emit a zero row for it)
BLOCKED_TERMS = ["dup", "slow", "spill"]


def _q_bm25_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 for a 3-term disjunctive query over documents —
    (doc_id, n_matched, score_micro). The oracle replays tf/dl/df/avgdl
    and the saturation formula with the identical fixed op order; idf's
    ln runs on C libm on BOTH sides (driver-side Python here, DuckDB
    there — never the JVM's non-portable Math.log intrinsic)."""
    from gbif_data_validator_spark.operators.search import bm25_topk

    return bm25_topk(_docs_spread(spark, sf_dir), BM25_TERMS, k=BM25_K)


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade census per document in
    exact micro-units, with the integer word/sentence/syllable counts the
    formulas consume (vowel-group syllable estimator; punctuation-run
    sentence counter with a floor of 1 — this corpus is word salad, so
    the floor branch is the live one; pytest covers real sentences)."""
    from gbif_data_validator_spark.functions.textstats import readability_exprs

    ex = readability_exprs(F.col("text"))
    return (
        _docs_spread(spark, sf_dir)
        .select("doc_id", *[v.alias(k) for k, v in ex.items()])
        .orderBy("doc_id")
    )


def _q_blocklist_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style token-blocklist gate per document: occurrence and
    distinct-term counts against BLOCKED_TERMS plus the keep decision —
    exact whole-token matching on the house tokenization, zero-shuffle."""
    from gbif_data_validator_spark.operators.curation import term_blocklist_flags

    return term_blocklist_flags(_docs_spread(spark, sf_dir), BLOCKED_TERMS).orderBy(
        "doc_id"
    )


#: the four battery checks, declared so zero-violation checks still get an
#: estimate row (the upper bound is the informative part)
DOC_CHECK_IDS = [
    "LANG_UNKNOWN",
    "N_CHARS_MISMATCH",
    "SOURCE_UNKNOWN",
    "TEXT_EMPTY",
]


def _q_sampled_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate validation: the documents battery over a deterministic
    30% hash sample, per-check violation-rate estimates with Wilson 95%
    bounds in exact micro-units — the triage mode that decides which
    checks merit the full 100-TB pass. The oracle replays the md5-bucket
    sample, the battery, and the interval formula (sqrt is IEEE-correct,
    so even it is bit-portable)."""
    from gbif_data_validator_spark.operators.sampling import (
        sampled_violation_estimate,
    )

    return sampled_violation_estimate(
        _docs(spark, sf_dir), _doc_battery, DOC_CHECK_IDS, pct=30
    )


#: mirror-census fixture: a.com/b.com true mirrors (two shared texts, one
#: with case/whitespace noise the normalizer must fold), c.com a subset
#: mirror, d.com unrelated, and an 'error 404' boilerplate fp on ALL four
#: hosts — past the max_hosts_per_fp=3 cap, so it must NOT create pairs
_MIRROR_FIXTURE: "list[tuple[str, str]]" = [
    ("https://a.com/1", "the original article text"),
    ("https://b.com/1", "The  ORIGINAL article   text"),
    ("https://a.com/2", "second shared piece"),
    ("https://b.com/2", "second shared piece"),
    ("https://c.com/1", "second shared piece"),
    ("https://a.com/3", "content only a has"),
    ("https://d.com/1", "entirely unrelated content"),
    ("https://a.com/err", "error 404"),
    ("https://b.com/err", "error 404"),
    ("https://c.com/err", "error 404"),
    ("https://d.com/err", "error 404"),
]


def _q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site census over the planted fixture: host pairs sharing
    exact normalized content, overlap coefficient in exact micro-units;
    the 4-host 'error 404' boilerplate fp sits past max_hosts_per_fp=3
    and must contribute nothing. Oracle replays host extraction, the md5
    normalization fingerprint, the cap, and the pair algebra."""
    from gbif_data_validator_spark.operators.curation import mirror_census

    df = spark.createDataFrame(_MIRROR_FIXTURE, "url string, text string")
    return mirror_census(df, min_shared=1, max_hosts_per_fp=3)


def _q_blocklist_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reviewer's view of the blocklist gate: per blocked term, how many
    documents and occurrences it would condemn (present terms only — the
    planted never-occurring term must not produce a zero row)."""
    from gbif_data_validator_spark.operators.curation import term_blocklist_census

    return term_blocklist_census(_docs_spread(spark, sf_dir), BLOCKED_TERMS)


def _q_media_meta_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-vs-content media battery over a planted fixture: dims
    mismatch (real PPM decode), declared-type vs sniffed-family mismatch,
    empty payload, truncated-container decode error; clean and
    unsniffable rows silent. Rows-only by nature (decoder-dependent);
    branch coverage pinned in tests/test_multimodal.py."""
    import struct

    import numpy as np

    from gbif_data_validator_spark.operators.multimodal import (
        encode_ppm,
        media_meta_checks,
    )

    img = np.zeros((8, 6, 3), dtype=np.uint8)
    pcm = (np.zeros(100) * 32767).astype("<i2").tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rows = [
        (1, bytearray(encode_ppm(img)),
         {"media_type": "image/x-portable-pixmap", "width": "6", "height": "8"}),
        (2, bytearray(encode_ppm(img)),
         {"media_type": "image/x-portable-pixmap", "width": "640", "height": "480"}),
        (3, bytearray(wav), {"media_type": "image/png"}),
        (4, None, {"media_type": "image/png"}),
        (5, bytearray(wav[:20]), {"media_type": "audio/wav"}),
        (6, bytearray(b"\xff\xd8unknowncodec"), {"media_type": "image/jpeg"}),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media binary, meta map<string,string>"
    )
    return media_meta_checks(df).orderBy("doc_id", "check_id")


def _q_image_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (dHash + the simhash pigeonhole core) over
    the synthetic media table with two planted duplicate payloads — the
    planted pairs must surface at hamming 0. Rows-only by nature (the
    signature needs the decoder); recall/determinism pinned in
    tests/test_multimodal.py."""
    from gbif_data_validator_spark.operators.multimodal import (
        image_dhash_pairs,
        synth_media,
    )

    media = synth_media(spark, 200)
    images = media.where(F.col("meta.media_type").startswith("image/"))
    planted = images.orderBy("doc_id").limit(2).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "media", "meta"
    )
    return (
        image_dhash_pairs(images.unionByName(planted), max_hamming=4)
        .orderBy("doc_a", "doc_b")
    )


def _q_image_dhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup made HASH-CHECKABLE (the media_checks_exact
    move applied to the dHash family): payloads are deterministically
    CONSTRUCTED 2x2 gray PPMs in four gradient classes (by doc_id%4, one
    slot overridden to a truncated payload), so the REAL decode -> dHash
    -> pigeonhole Hamming pairing runs end-to-end while the oracle
    recomputes every signature (hand-derivable for a 2x2 image: only the
    9x8 resample's column-4 transition compares distinct pixels) and the
    exact pair set with bit_count(xor). Converts the family's rows-only
    checks into a hard correctness row."""
    from gbif_data_validator_spark.operators.dedup import hamming_sig_pairs
    from gbif_data_validator_spark.operators.multimodal import image_dhash

    d = _tbl(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    k = F.col("doc_id") % 4
    hdr = F.encode(F.lit("P6\n2 2\n255\n"), "UTF-8")
    body = (
        F.when(k == 0, F.unhex(F.lit("C8C8C8646464C8C8C8646464")))
        .when(k == 1, F.unhex(F.lit("C8C8C8646464646464C8C8C8")))
        .when(k == 2, F.unhex(F.lit("646464C8C8C8C8C8C8646464")))
        .otherwise(F.unhex(F.lit("646464C8C8C8646464C8C8C8")))
    )
    payload = F.when(
        # sniffable ppm, truncated raster: real decode fails -> sig NULL,
        # row excluded from pairing (finding-not-crash)
        F.col("doc_id") % 31 == 5, F.concat(hdr, F.unhex(F.lit("FF")))
    ).otherwise(F.concat(hdr, body))
    meta = F.struct(
        F.lit("image/x-portable-pixmap").alias("media_type"),
        F.lit(2).cast("int").alias("width"),
        F.lit(2).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )
    media = d.select("doc_id", payload.alias("media"), meta.alias("meta"))
    return (
        hamming_sig_pairs(image_dhash(media), max_hamming=4)
        .orderBy("doc_a", "doc_b")
    )


def _q_audio_hash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio twin of image_dhash_exact: constructed RIFF/WAVE PCM16
    payloads in five envelope classes (alternating up/down staircases,
    monotone ramps, and a half-gain copy of class A — 130 samples, 2 per
    envelope window, so every window mean and every comparison bit is
    hand-derivable), plus a sniffable-but-corrupt slot hashing to NULL.
    The REAL wav decode -> energy-envelope hash -> pigeonhole pairing
    runs end-to-end; the oracle carries the hand-derived 64-bit
    signatures as literals and recomputes the exact pair set with
    bit_count(xor). The half-gain class pairs with class A at hamming 0
    — gain invariance pinned by the oracle itself."""
    from gbif_data_validator_spark.operators.dedup import hamming_sig_pairs
    from gbif_data_validator_spark.operators.multimodal import audio_hash

    d = _tbl(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    k = F.col("doc_id") % 5
    wav_a = (
        "524946462801000057415645666D74201000000001000100401F0000803E0000"
        "0200100064617461040100000020002000400040002000200040004000200020"
        "0040004000200020004000400020002000400040002000200040004000200020"
        "0040004000200020004000400020002000400040002000200040004000200020"
        "0040004000200020004000400020002000400040002000200040004000200020"
        "0040004000200020004000400020002000400040002000200040004000200020"
        "0040004000200020004000400020002000400040002000200040004000200020"
        "0040004000200020004000400020002000400040002000200040004000200020"
        "0040004000200020004000400020002000400040002000200040004000200020"
        "00400040002000200040004000200020"
    )
    wav_b = (
        "524946462801000057415645666D74201000000001000100401F0000803E0000"
        "0200100064617461040100000040004000200020004000400020002000400040"
        "0020002000400040002000200040004000200020004000400020002000400040"
        "0020002000400040002000200040004000200020004000400020002000400040"
        "0020002000400040002000200040004000200020004000400020002000400040"
        "0020002000400040002000200040004000200020004000400020002000400040"
        "0020002000400040002000200040004000200020004000400020002000400040"
        "0020002000400040002000200040004000200020004000400020002000400040"
        "0020002000400040002000200040004000200020004000400020002000400040"
        "00200020004000400020002000400040"
    )
    wav_c = (
        "524946462801000057415645666D74201000000001000100401F0000803E0000"
        "0200100064617461040100000001000100020002000300030004000400050005"
        "00060006000700070008000800090009000A000A000B000B000C000C000D000D"
        "000E000E000F000F001000100011001100120012001300130014001400150015"
        "00160016001700170018001800190019001A001A001B001B001C001C001D001D"
        "001E001E001F001F002000200021002100220022002300230024002400250025"
        "00260026002700270028002800290029002A002A002B002B002C002C002D002D"
        "002E002E002F002F003000300031003100320032003300330034003400350035"
        "00360036003700370038003800390039003A003A003B003B003C003C003D003D"
        "003E003E003F003F0040004000410041"
    )
    wav_d = (
        "524946462801000057415645666D74201000000001000100401F0000803E0000"
        "020010006461746104010000004200420041004100400040003F003F003E003E"
        "003D003D003C003C003B003B003A003A00390039003800380037003700360036"
        "003500350034003400330033003200320031003100300030002F002F002E002E"
        "002D002D002C002C002B002B002A002A00290029002800280027002700260026"
        "002500250024002400230023002200220021002100200020001F001F001E001E"
        "001D001D001C001C001B001B001A001A00190019001800180017001700160016"
        "001500150014001400130013001200120011001100100010000F000F000E000E"
        "000D000D000C000C000B000B000A000A00090009000800080007000700060006"
        "00050005000400040003000300020002"
    )
    wav_e = (
        "524946462801000057415645666D74201000000001000100401F0000803E0000"
        "0200100064617461040100000010001000200020001000100020002000100010"
        "0020002000100010002000200010001000200020001000100020002000100010"
        "0020002000100010002000200010001000200020001000100020002000100010"
        "0020002000100010002000200010001000200020001000100020002000100010"
        "0020002000100010002000200010001000200020001000100020002000100010"
        "0020002000100010002000200010001000200020001000100020002000100010"
        "0020002000100010002000200010001000200020001000100020002000100010"
        "0020002000100010002000200010001000200020001000100020002000100010"
        "00200020001000100020002000100010"
    )
    corrupt = "5249464614000000574156456761726261676567617262616765"
    payload = F.when(F.col("doc_id") % 41 == 3, F.unhex(F.lit(corrupt))).otherwise(
        F.unhex(
            F.when(k == 0, F.lit(wav_a))
            .when(k == 1, F.lit(wav_b))
            .when(k == 2, F.lit(wav_c))
            .when(k == 3, F.lit(wav_d))
            .otherwise(F.lit(wav_e))
        )
    )
    meta = F.struct(
        F.lit("audio/wav").alias("media_type"),
        F.lit(0).cast("int").alias("width"),
        F.lit(0).cast("int").alias("height"),
        F.lit(16).cast("int").alias("duration_ms"),
    )
    media = d.select("doc_id", payload.alias("media"), meta.alias("meta"))
    return (
        hamming_sig_pairs(audio_hash(media), max_hamming=4)
        .orderBy("doc_a", "doc_b")
    )


def _q_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral (DCT pHash) twin of image_dup_pairs over the same planted
    corpus — dHash keys on gradients, pHash on low-frequency structure;
    running both covers blur/resize copies gradients miss. Rows-only by
    nature; blur/upscale robustness + recall pinned in
    tests/test_multimodal.py."""
    from gbif_data_validator_spark.operators.multimodal import (
        image_phash_pairs,
        synth_media,
    )

    media = synth_media(spark, 200)
    images = media.where(F.col("meta.media_type").startswith("image/"))
    planted = images.orderBy("doc_id").limit(2).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "media", "meta"
    )
    return (
        image_phash_pairs(images.unionByName(planted), max_hamming=4)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------


#: Driver-window rotation for round 5 (the r04 verdict's task #1): slots
#: 1-50 are oracled queries that NEVER had a driver CORRECTNESS row in
#: r01-r04 (recomputed from the actual union of the four CORRECTNESS
#: files: 66 such queries remain), led by the family heads the verdict
#: named (lsh_recall, weighted_jaccard/minhash, incr_clusters,
#: index_dedup_pairs, kmv/cms/corpus overlap sketches, mojibake_census,
#: embedding_health, bpe_word_freq, the search triple, record_linkage,
#: time_travel, changeset_extract, fk_cardinality, the robots family and
#: the web-census rows), plus the three r04-window entries that fell just
#: past slot 50 when dwca_star_check landed (agg_rules, lang_script_check,
#: fd_strength). The 16 stragglers past the window stay judge-rehearsal-
#: verified (scripts/check_oracles.py, 215/215 bit-exact in r04).
_R05_WINDOW = [
    "lsh_recall", "weighted_jaccard", "weighted_minhash", "incr_clusters",
    "index_dedup_pairs", "kmv_overlap", "cms_point_est", "corpus_overlap",
    "mojibake_census", "embedding_health", "bpe_word_freq",
    "term_search", "phrase_search", "kwic",
    "record_linkage", "time_travel", "changeset_extract", "fk_cardinality",
    "robots_rules", "robots_blocked", "crawl_delay_audit", "noindex_pages",
    "domain_census", "url_params", "outlink_census", "anchor_census",
    "frontier_hosts", "canonical_census", "sitemap_coverage",
    "mirror_hosts", "blocklist_census", "dup_titles",
    "agg_rules", "lang_script_check", "fd_strength",
    "cosine_dup_pairs_det", "minhash_cross_pairs", "dedup_weights",
    "threshold_sweep", "dedup_rate_by_source",
    "tfidf_top_terms", "lexical_diversity", "repetition_stats",
    "strip_boilerplate", "fertility_by_lang", "ngram_novelty",
    "term_cooccurrence", "continuation_pairs", "style_distance",
    "lang_kappa",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "pages_validation": _q_pages_validation,
        "pagerank_entities": _q_pagerank_entities,
        "manifest_audit": _q_manifest_audit,
        "robots_rfc": _q_robots_rfc,
        "media_checks_exact": _q_media_checks_exact,
        "curation_funnel": _q_curation_funnel,
        "key_discovery": _q_key_discovery,
        "grouped_constraints": _q_grouped_constraints,
        # round-4 addition: the last reference input format gets a real
        # reader + driver row on landing (fd_strength moves just past the
        # window; it stays locally bit-exact via the full rehearsal)
        "dwca_star_check": _q_dwca_star_check,
        "dwca_record_checks": _q_dwca_record_checks,
        "jpeg_progressive_check": _q_jpeg_progressive_check,
        "dwca_event_registry": _q_dwca_event_registry,
        "image_dhash_exact": _q_image_dhash_exact,
        "audio_hash_exact": _q_audio_hash_exact,
        "psi_drift": _q_psi_drift,
        "js_drift": _q_js_drift,
        "chisq_drift": _q_chisq_drift,
        "emd_drift": _q_emd_drift,
        "cusum_shift": _q_cusum_shift,
        "group_cusum": _q_group_cusum,
        "hits_entities": _q_hits_entities,
        "triangles": _q_triangles,
        "kcore": _q_kcore,
        "label_communities": _q_label_communities,
        "assortativity": _q_assortativity,
        "cocitation": _q_cocitation,
        "crawl_depth": _q_crawl_depth,
        "reciprocal_links": _q_reciprocal_links,
        "out_of_order": _q_out_of_order,
        "freshness": _q_freshness,
        "id_gaps": _q_id_gaps,
        "interval_overlaps": _q_interval_overlaps,
        "rate_anomaly": _q_rate_anomaly,
        "volume_trend": _q_volume_trend,
        "seasonality_profile": _q_seasonality_profile,
        "dispersion": _q_dispersion,
        "funnel": _q_funnel,
        "transitions": _q_transitions,
        "cohort_retention": _q_cohort_retention,
        "embedding_outliers": _q_embedding_outliers,
        "salted_join_rollup": _q_salted_join_rollup,
        "quality_survivors": _q_quality_survivors,
        "k_anon_classes": _q_k_anon_classes,
        "host_spoof": _q_host_spoof,
        "edit_dup_pairs": _q_edit_dup_pairs,
        "join_audit": _q_join_audit,
        "json_rules": _q_json_rules,
        "lang_heavy_hitters": _q_lang_heavy_hitters,
        "group_quantiles": _q_group_quantiles,
        "mad_outliers": _q_mad_outliers,
        "corr_exact": _q_corr_exact,
        "null_patterns": _q_null_patterns,
        "dtype_census": _q_dtype_census,
        "agg_rules": _q_agg_rules,
        "lang_script_check": _q_lang_script_check,
        "fd_strength": _q_fd_strength,
        # --- past the driver window: prior-round driver-green or
        # locally re-verified bit-exact (full-rehearsal protocol) ---
        "spreadsheet_pages": _q_spreadsheet_pages,
        "checklist_checks": _q_checklist_checks,
        "taxon_match": _q_taxon_match,
        "bloom_lapsed_customers": _q_bloom_lapsed_customers,
        "pii_scan": _q_pii_scan,
        "c4_clean": _q_c4_clean,
        "gopher_quality": _q_gopher_quality,
        "lm_quality": _q_lm_quality,
        "dsir_weights": _q_dsir_weights,
        "cross_dedup_flags": _q_cross_dedup_flags,
        "file_audit": _q_file_audit,
        "skew_audit": _q_skew_audit,
        "minhash_pairs": _q_minhash_pairs,
        "lsh_pair_budget": _q_lsh_pair_budget,
        "lsh_budget_census": _q_lsh_budget_census,
        "boilerplate_lines": _q_boilerplate_lines,
        "sampled_violations": _q_sampled_violations,
        "bm25_docs": _q_bm25_docs,
        "readability": _q_readability,
        "blocklist_flags": _q_blocklist_flags,
        "top_ngram": _q_top_ngram,
        "ann_recall": _q_ann_recall,
        "nb_quality": _q_nb_quality,
        "warc_pages": _q_warc_pages,
        "cdx_scan": _q_cdx_scan,
        "fetch_plan": _q_fetch_plan,
        "best_captures": _q_best_captures,
        "cdx_violations": _q_cdx_violations,
        "url_filter": _q_url_filter,
        "doc_line_dedup": _q_doc_line_dedup,
        "nfc_report": _q_nfc_report,
        "fd_check": _q_fd_check,
        "mask_profile": _q_mask_profile,
        "k_anon_gate": _q_k_anon_gate,
        "suggest_constraints": _q_suggest_constraints,
        "verify_constraints": _q_verify_constraints,
        "url_canonical": _q_url_canonical,
        "benford_check": _q_benford,
        "iqr_outliers": _q_iqr_outliers,
        "dup_spans": _q_dup_spans,
        "strip_spans": _q_strip_spans,
        "snapshot_churn": _q_snapshot_churn,
        "apply_changeset": _q_apply_changeset,
        "host_lang_mismatch": _q_host_lang_mismatch,
        "zipf_fit": _q_zipf_fit,
        "calibration": _q_calibration,
        "script_census": _q_script_census,
        "entropy_mi": _q_entropy_mi,
        "heavy_hitters": _q_heavy_hitters,
        "prefix_jaccard": _q_prefix_jaccard,
        "dedup_agreement": _q_dedup_agreement,
        "embedding_drift": _q_embedding_drift,
        "source_quota": _q_source_quota,
        "stratified_sample": _q_stratified_sample,
        "weighted_sample": _q_weighted_sample,
        "cosine_dup_pairs_det": _q_cosine_dup_pairs_det,
        "blocklist_census": _q_blocklist_census,
        "mirror_hosts": _q_mirror_hosts,
        "minhash_cross_pairs": _q_minhash_cross_pairs,
        "index_dedup_pairs": _q_index_dedup_pairs,
        "tfidf_top_terms": _q_tfidf_top_terms,
        "lexical_diversity": _q_lexical_diversity,
        "dedup_rate_by_source": _q_dedup_rate_by_source,
        "repetition_stats": _q_repetition_stats,
        "source_rollup": _q_source_rollup,
        "strip_boilerplate": _q_strip_boilerplate,
        "mix_resample": _q_mix_resample,
        "doc_chunks": _q_doc_chunks,
        "term_frequency": _q_term_frequency,
        "profile_nulls_distinct": _q_profile_nulls_distinct,
        "uniqueness_lineitem": _q_uniqueness_lineitem,
        "doc_violations": _q_doc_violations,
        "doc_check_counts": _q_doc_check_counts,
        "verbatim_samples": _q_verbatim_samples,
        "events_props_extract": _q_events_props_extract,
        "asof_attribution": _q_asof_attribution,
        "interval_join_incidents": _q_interval_join_incidents,
        "star_referential": _q_star_referential,
        "dedup_exact_groups": _q_dedup_exact_groups,
        "cosine_topk": _q_cosine_topk,
        "uniqueness_sorted": _q_uniqueness_sorted,
        "drift_exact": _q_drift_exact,
        "categorical_drift": _q_categorical_drift,
        "ref_orphans_source": _q_ref_orphans_source,
        "doc_samples": _q_doc_samples,
        "interpreted_counts": _q_interpreted_counts,
        "events_ts_unlikely": _q_events_ts_unlikely,
        "events_windows": _q_events_windows,
        "data_field_uniqueness": _q_data_field_uniqueness,
        "frequent_values": _q_frequent_values,
        "length_histogram": _q_length_histogram,
        "top_orders_per_cust": _q_top_orders_per_cust,
        "lapsed_customers": _q_lapsed_customers,
        "profile_rollup_exact": _q_profile_rollup_exact,
        "pricing_summary": _q_pricing_summary,
        "top_revenue_orders": _q_top_revenue_orders,
        "events_sessionize": _q_events_sessionize,
        "events_rollup": _q_events_rollup,
        "regional_revenue": _q_regional_revenue,
        "fingerprints": _q_fingerprints,
        "paragraph_dupes": _q_paragraph_dupes,
        "token_stats": _q_token_stats,
        "quality_scores": _q_quality_scores,
        "quality_rank_norm": _q_quality_rank_norm,
        "mixture_plan": _q_mixture_plan,
        "lang_id": _q_lang_id,
        "lang_kappa": _q_lang_kappa,
        "partition_advice": _q_partition_advice,
        "time_travel": _q_time_travel,
        "record_linkage": _q_record_linkage,
        "concentration": _q_concentration,
        "join_advice": _q_join_advice,
        "ngram_jaccard": _q_ngram_jaccard,
        "weighted_jaccard": _q_weighted_jaccard,
        "weighted_minhash": _q_weighted_minhash,
        "lsh_recall": _q_lsh_recall,
        "ngram_containment": _q_ngram_containment,
        "cosine_dup_pairs": _q_cosine_dup_pairs,
        "dedup_survivors": _q_dedup_survivors,
        "winnow_fingerprints": _q_winnow_fingerprints,
        "media_features": _q_media_features,
        "simhash_pairs": _q_simhash_pairs,
        "winnow_pairs": _q_winnow_pairs,
        "dedup_clusters": _q_dedup_clusters,
        "incr_clusters": _q_incr_clusters,
        "dedup_weights": _q_dedup_weights,
        "threshold_sweep": _q_threshold_sweep,
        "hash_sample": _q_hash_sample,
        "hash_split": _q_hash_split,
        "pack_bins": _q_pack_bins,
        "shard_plan": _q_shard_plan,
        "contamination": _q_contamination,
        "changeset_extract": _q_changeset,
        "domain_census": _q_domain_census,
        "url_params": _q_url_params,
        "reconcile_rollup": _q_reconcile_rollup,
        "outlink_census": _q_outlink_census,
        "dup_titles": _q_dup_titles,
        "anchor_census": _q_anchor_census,
        "frontier_hosts": _q_frontier_hosts,
        "noindex_pages": _q_noindex_pages,
        "robots_rules": _q_robots_rules,
        "robots_blocked": _q_robots_blocked,
        "crawl_delay_audit": _q_crawl_delay_audit,
        "canonical_census": _q_canonical_census,
        "sitemap_coverage": _q_sitemap_coverage,
        "fk_cardinality": _q_fk_cardinality,
        "corpus_overlap": _q_corpus_overlap,
        "kmv_overlap": _q_kmv_overlap,
        "cms_point_est": _q_cms_point_est,
        "compression_gate": _q_compression_gate,
        "style_distance": _q_style_distance,
        "fertility_by_lang": _q_fertility_by_lang,
        "evolving_union": _q_evolving_union,
        "neyman_plan": _q_neyman_plan,
        "mojibake_census": _q_mojibake_census,
        "embedding_health": _q_embedding_health,
        "bpe_word_freq": _q_bpe_word_freq,
        "ngram_novelty": _q_ngram_novelty,
        "readability": _q_readability,
        "term_cooccurrence": _q_term_cooccurrence,
        "continuation_pairs": _q_continuation_pairs,
        "term_search": _q_term_search,
        "phrase_search": _q_phrase_search,
        "kwic": _q_kwic,
        "rep_signals": _q_rep_signals,
        "bpe_token_census": _q_bpe_token_census,
        "cosine_dup_pairs_lsh": _q_cosine_dup_pairs_lsh,
        "ivf_ann": _q_ivf_ann,
        "semantic_dedup": _q_semantic_dedup,
        "profile_rollup": _q_profile_rollup,
        "tdigest_profile": _q_tdigest_profile,
        "lsh_ann": _q_lsh_ann,
        "pq_ann": _q_pq_ann,
        "drift_events": _q_drift_events,
        "image_dup_pairs": _q_image_dup_pairs,
        "media_meta_violations": _q_media_meta_violations,
        "image_phash_pairs": _q_image_phash_pairs,
    }
    ordered = {k: base[k] for k in _R05_WINDOW}
    ordered.update((k, v) for k, v in base.items() if k not in ordered)
    return ordered

def _sql_lit(v) -> str:
    """One fixture value as a SQL literal (single-quote escaping only —
    the fixtures are code-owned constants, not user input)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    return "'" + str(v).replace("'", "''") + "'"


def _nullpat_values_sql() -> str:
    """VALUES clause replaying ``_NULLPAT_FIXTURE`` — single source of
    truth with the Spark query's createDataFrame."""
    return ", ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in _NULLPAT_FIXTURE
    )


def _dtype_values_sql() -> str:
    return ", ".join(f"({_sql_lit(v)})" for v in _DTYPE_FIXTURE)


def _pagerank_oracle_sql(iterations: int = 5) -> str:
    """Generate the unrolled DuckDB replay of
    ``operators/graph.py::pagerank`` at a fixed iteration count over the
    customer↔supplier co-occurrence graph (both directions, deduped).

    Per iteration i: ``d{i}`` is the dangling mass (rank of vertices with
    no out-edge, a 1-row scalar), ``c{i}`` the in-mass sums, ``r{i+1}``
    the damped update. Every literal is forced to DOUBLE so DuckDB never
    routes through DECIMAL arithmetic, and the expression tree matches the
    Spark/Python operation order token for token."""
    ctes = [
        """eb AS (
              SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                     's' || CAST(l_suppkey AS VARCHAR) AS dst
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            )""",
        """e AS (
              SELECT DISTINCT src, dst FROM (
                SELECT src, dst FROM eb
                UNION ALL
                SELECT dst AS src, src AS dst FROM eb
              )
            )""",
        """verts AS (
              SELECT DISTINCT vertex FROM (
                SELECT src AS vertex FROM e
                UNION ALL
                SELECT dst AS vertex FROM e
              )
            )""",
        "nv AS (SELECT COUNT(*) AS n FROM verts)",
        "od AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        """r0 AS (
              SELECT vertex, CAST(1.0 AS DOUBLE) / (SELECT n FROM nv) AS rank
              FROM verts
            )""",
    ]
    for i in range(iterations):
        ctes.append(
            f"""d{i} AS (
              SELECT COALESCE(SUM(r.rank), CAST(0.0 AS DOUBLE)) AS dm
              FROM r{i} r LEFT JOIN od ON r.vertex = od.src
              WHERE od.deg IS NULL
            )"""
        )
        ctes.append(
            f"""c{i} AS (
              SELECT e.dst AS dst, SUM(r.rank / od.deg) AS in_mass
              FROM r{i} r JOIN od ON r.vertex = od.src JOIN e ON e.src = od.src
              GROUP BY e.dst
            )"""
        )
        ctes.append(
            f"""r{i + 1} AS (
              SELECT v.vertex,
                     ((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nv)
                      + CAST(0.85 AS DOUBLE) * (SELECT dm FROM d{i}) / (SELECT n FROM nv))
                     + CAST(0.85 AS DOUBLE) * COALESCE(c.in_mass, CAST(0.0 AS DOUBLE)) AS rank
              FROM verts v LEFT JOIN c{i} c ON v.vertex = c.dst
            )"""
        )
    return (
        "WITH "
        + ",\n            ".join(ctes)
        + f"""
            SELECT vertex, ROUND(rank, 8) AS rank FROM r{iterations}
            ORDER BY 2 DESC, 1 LIMIT 25
        """
    )


def _hits_oracle_sql(iterations: int = 5) -> str:
    """Unrolled DuckDB replay of ``operators/graph.py::hits`` over the
    directed customer→supplier graph: per iteration i, ``a{i}``/``ta{i}``
    are the raw auth sums and their L1 total, ``A{i}`` the normalized auth
    table; ``b{i}``/``tb{i}``/``h{i+1}`` the hub half. Every literal is
    DOUBLE and the COALESCE-then-divide order matches the Spark side. All
    CTEs are MATERIALIZED: inlined (DuckDB's default) each iteration
    re-expands the whole prior chain ~4x and 5 iterations take minutes;
    materialized, the replay is sub-second."""
    ctes = [
        """e AS MATERIALIZED (
              SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                     's' || CAST(l_suppkey AS VARCHAR) AS dst
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            )""",
        """verts AS MATERIALIZED (
              SELECT DISTINCT vertex FROM (
                SELECT src AS vertex FROM e
                UNION ALL
                SELECT dst AS vertex FROM e
              )
            )""",
        "h0 AS MATERIALIZED (SELECT vertex, CAST(1.0 AS DOUBLE) AS hub FROM verts)",
    ]
    for i in range(iterations):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
              SELECT e.dst AS v, SUM(h.hub) AS s
              FROM h{i} h JOIN e ON e.src = h.vertex GROUP BY e.dst
            )"""
        )
        ctes.append(f"ta{i} AS MATERIALIZED (SELECT SUM(s) AS t FROM a{i})")
        ctes.append(
            f"""na{i} AS MATERIALIZED (
              SELECT v.vertex,
                     COALESCE(a.s, CAST(0.0 AS DOUBLE)) / (SELECT t FROM ta{i}) AS auth
              FROM verts v LEFT JOIN a{i} a ON v.vertex = a.v
            )"""
        )
        ctes.append(
            f"""b{i} AS MATERIALIZED (
              SELECT e.src AS v, SUM(a.auth) AS s
              FROM na{i} a JOIN e ON e.dst = a.vertex GROUP BY e.src
            )"""
        )
        ctes.append(f"tb{i} AS MATERIALIZED (SELECT SUM(s) AS t FROM b{i})")
        ctes.append(
            f"""h{i + 1} AS MATERIALIZED (
              SELECT v.vertex,
                     COALESCE(b.s, CAST(0.0 AS DOUBLE)) / (SELECT t FROM tb{i}) AS hub
              FROM verts v LEFT JOIN b{i} b ON v.vertex = b.v
            )"""
        )
    last = iterations - 1
    return (
        "WITH "
        + ",\n            ".join(ctes)
        + f"""
            SELECT a.vertex, ROUND(a.auth, 8) AS auth, ROUND(h.hub, 8) AS hub
            FROM na{last} a JOIN h{iterations} h ON a.vertex = h.vertex
            ORDER BY 2 DESC, 3 DESC, 1 LIMIT 25
        """
    )


def oracle_sql() -> dict[str, str]:
    from gbif_data_validator_spark.functions.pii import PII_PATTERNS
    from gbif_data_validator_spark.operators.dedup import minhash_constants

    # PII fragments generated from the same PII_PATTERNS the Spark side
    # uses (patterns are written in the Java-regex ∩ RE2 dialect)
    pii_count_exprs = ",\n              ".join(
        f"len(regexp_extract_all(t, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    pii_total_expr = " + ".join(
        f"len(regexp_extract_all(t, '{pat}'))" for name, pat, _ in PII_PATTERNS
    )
    pii_red_expr = "t"
    for _, pat, mask in PII_PATTERNS:
        pii_red_expr = f"regexp_replace({pii_red_expr}, '{pat}', '{mask}', 'g')"

    # script-census fragments generated from the same SCRIPT_RANGES the
    # Spark side uses; non-ASCII range endpoints render as RE2 \x{hex}
    from gbif_data_validator_spark.functions.textstats import SCRIPT_RANGES

    def _re2_class(body: str) -> str:
        return "".join(
            ch if ord(ch) < 128 else "\\x{%04X}" % ord(ch) for ch in body
        )

    script_count_exprs = ",\n              ".join(
        f"length(regexp_replace(t, '[^{_re2_class(body)}]', '', 'g')) AS n_{name}"
        for name, body in sorted(SCRIPT_RANGES.items())
    )
    script_dom_list = ", ".join(
        f"struct_pack(n := n_{name}, s := '{name}')"
        for name in sorted(SCRIPT_RANGES)
    )
    script_out_cols = ", ".join(f"n_{name}" for name in sorted(SCRIPT_RANGES))

    mh_a, mh_b = minhash_constants(n_hashes=64, seed=42)
    mh_consts = ", ".join(
        f"({i}, {mh_a[i]}, {mh_b[i]})" for i in range(64)
    )
    sources_sql = "[" + ",".join(f"'{s}'" for s in KNOWN_SOURCES) + "]"
    stop_sql = "[" + ",".join(f"'{w}'" for w in STOPWORDS) + "]"
    doc_viol = _DOC_VIOLATIONS_SQL.format(sources=sources_sql)

    marker_sql = {
        code: "[" + ",".join(f"'{w}'" for w in ws) + "]"
        for code, ws in LANG_MARKERS.items()
    }
    lang_structs = ", ".join(
        "{score: len(list_filter(words, w -> list_contains(" + marker_sql[c] + ", w))), code: '" + c + "'}"
        for c in LANG_MARKERS
    )

    # shared text-feature fragments (DuckDB)
    ws_tokens = ("CASE WHEN text IS NULL OR NOT regexp_matches(text, '\\S') THEN 0 "
                 "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END")
    punct_ratio = ("CASE WHEN length(text) > 0 THEN "
                   "CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) "
                   "ELSE 0.0 END")
    sw_ratio = (f"CASE WHEN {ws_tokens} > 0 THEN "
                f"CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), "
                f"w -> list_contains({stop_sql}, w))) AS DOUBLE) / ({ws_tokens}) ELSE 0.0 END")
    mwl = (f"CASE WHEN {ws_tokens} > 0 THEN "
           f"CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / ({ws_tokens}) ELSE 0.0 END")
    quality = (
        f"round(0.3 * least(({ws_tokens}) / 100.0, 1.0) "
        f"+ 0.2 * (CASE WHEN ({mwl}) >= 3.0 AND ({mwl}) <= 10.0 THEN 1.0 ELSE 0.5 END) "
        f"+ 0.25 * least(({sw_ratio}) * 4.0, 1.0) "
        f"+ 0.25 * greatest(0.0, 1.0 - ({punct_ratio}) * 4.0), 4)"
    )
    # quality at the function's native 6-decimal rounding (quality_score
    # itself rounds 6; the quality_scores query adds a round-4 on top)
    quality6 = quality[:-2] + "6)"
    strata_case = (
        "CASE source "
        + " ".join(f"WHEN '{k}' THEN {v}" for k, v in STRATA_RATES.items())
        + " ELSE 5 END"
    )
    bucket_expr = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
    )

    # mojibake_census fragments: patterns come straight from the module
    # (pure-ASCII \x{hex} regex syntax, valid in both Java regex and RE2);
    # non-ASCII literal chars are rendered as chr(codepoint) concats so no
    # raw control bytes land in the SQL text.
    from gbif_data_validator_spark.functions import encoding as _enc

    def _duck_str(s: str) -> str:
        parts: list[str] = []
        buf = ""
        for ch in s:
            if 32 <= ord(ch) < 127 and ch != "'":
                buf += ch
            else:
                if buf:
                    parts.append(f"'{buf}'")
                    buf = ""
                parts.append(f"chr({ord(ch)})")
        if buf:
            parts.append(f"'{buf}'")
        return " || ".join(parts) or "''"

    moji_frag_case = (
        "CASE doc_id % 7 "
        + " ".join(
            f"WHEN {i} THEN {_duck_str(f)}"
            for i, f in enumerate(_MOJIBAKE_FRAGMENTS)
        )
        + " ELSE '' END"
    )
    moji_sql = f"""
            WITH corrupted AS (
              SELECT lang, text || ({moji_frag_case}) AS t FROM documents
            ),
            sig AS (
              SELECT lang,
                len(regexp_extract_all(t, '{_enc.PAT_LATIN1_DIGRAPH}')) AS n_latin1,
                len(regexp_extract_all(t, '{_enc.PAT_TRIGRAPH}')) AS n_tri,
                len(regexp_extract_all(t, '{_enc.PAT_C1}')) AS n_c1,
                len(regexp_extract_all(t, '{_enc.PAT_FFFD}')) AS n_fffd,
                len(regexp_extract_all(t, '{_enc.PAT_NBSP_ARTIFACT}')) AS n_nbsp,
                regexp_matches(
                  translate(t, {_duck_str(_enc._CP1252_CHARS)}, {_duck_str(_enc._C1_CHARS)}),
                  '{_enc.PAT_WELLFORMED_UTF8}') AS wf
              FROM corrupted
            )
            SELECT lang,
              CAST(SUM(n_latin1) AS BIGINT) AS n_latin1_digraphs,
              CAST(SUM(n_tri) AS BIGINT) AS n_trigraphs,
              CAST(SUM(n_c1) AS BIGINT) AS n_c1_controls,
              CAST(SUM(n_fffd) AS BIGINT) AS n_fffd,
              CAST(SUM(n_nbsp) AS BIGINT) AS n_nbsp_artifacts,
              CAST(SUM(CASE WHEN n_latin1 + n_tri + n_c1 + n_fffd > 0 THEN 1 ELSE 0 END) AS BIGINT) AS rows_affected,
              CAST(SUM(CASE WHEN n_latin1 + n_tri > 0 AND wf THEN 1 ELSE 0 END) AS BIGINT) AS rows_repairable,
              CAST(COUNT(*) AS BIGINT) AS n_rows
            FROM sig GROUP BY lang ORDER BY lang
        """

    out = {
        "term_frequency": """
            SELECT
              count(CASE WHEN doc_id IS NOT NULL AND regexp_matches(CAST(doc_id AS VARCHAR),'\\S') THEN 1 END) AS doc_id,
              count(CASE WHEN text   IS NOT NULL AND regexp_matches(text,'\\S') THEN 1 END) AS text,
              count(CASE WHEN lang   IS NOT NULL AND regexp_matches(lang,'\\S') THEN 1 END) AS lang,
              count(CASE WHEN source IS NOT NULL AND regexp_matches(source,'\\S') THEN 1 END) AS source,
              count(CASE WHEN n_chars IS NOT NULL AND regexp_matches(CAST(n_chars AS VARCHAR),'\\S') THEN 1 END) AS n_chars
            FROM documents
        """,
        "profile_nulls_distinct": """
            SELECT count(*) AS n_rows,
              count(CASE WHEN doc_id IS NULL THEN 1 END) AS doc_id_nulls, count(DISTINCT doc_id) AS doc_id_distinct,
              count(CASE WHEN text   IS NULL THEN 1 END) AS text_nulls,   count(DISTINCT text)   AS text_distinct,
              count(CASE WHEN lang   IS NULL THEN 1 END) AS lang_nulls,   count(DISTINCT lang)   AS lang_distinct,
              count(CASE WHEN source IS NULL THEN 1 END) AS source_nulls, count(DISTINCT source) AS source_distinct,
              count(CASE WHEN n_chars IS NULL THEN 1 END) AS n_chars_nulls, count(DISTINCT n_chars) AS n_chars_distinct
            FROM documents
        """,
        "uniqueness_lineitem": """
            SELECT l_orderkey, count(*) AS dup_count FROM lineitem
            GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey
        """,
        "uniqueness_sorted": """
            SELECT l_orderkey, count(*) AS dup_count FROM lineitem
            GROUP BY l_orderkey HAVING count(*) > 1 ORDER BY l_orderkey
        """,
        "drift_exact": _KS_EXACT_SQL,
        "categorical_drift": """
            WITH obs AS (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS win,
                     event_type AS cat, count(*) AS c
              FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
              GROUP BY 1, 2
            ),
            wn AS (SELECT win, sum(c) AS n_w FROM obs GROUP BY win),
            pooled AS (SELECT cat, sum(c) AS c_pool FROM obs GROUP BY cat),
            tot AS (SELECT sum(c_pool) AS total, count(*) AS n_cats FROM pooled),
            grid AS (SELECT wn.win, wn.n_w, pooled.cat, pooled.c_pool
                     FROM wn CROSS JOIN pooled),
            m AS (
              SELECT g.win, g.n_w, g.cat, g.c_pool,
                     CAST(COALESCE(obs.c, 0) AS DOUBLE) AS cd
              FROM grid g LEFT JOIN obs ON obs.win = g.win AND obs.cat = g.cat
            ),
            t AS (
              SELECT m.win, m.n_w,
                     (cd + 0.5) / (n_w + 0.5 * n_cats) AS p_w,
                     (CAST(c_pool AS DOUBLE) + 0.5) / (total + 0.5 * n_cats) AS p_p,
                     CAST(n_w AS DOUBLE) * c_pool / total AS exp_c, cd
              FROM m CROSS JOIN tot
            )
            SELECT win AS "window", CAST(n_w AS BIGINT) AS n,
                   round(sum((p_w - p_p) * ln(p_w / p_p)), 6) AS psi,
                   round(sum((cd - exp_c) * (cd - exp_c) / exp_c), 6) AS chi2
            FROM t GROUP BY win, n_w ORDER BY "window"
        """,
        "ref_orphans_source": f"""
            SELECT source, count(*) AS n_docs FROM documents
            WHERE source IS NOT NULL AND regexp_matches(source, '\\S')
              AND NOT list_contains({sources_sql}, source)
            GROUP BY source ORDER BY source
        """,
        "doc_violations": doc_viol + " ORDER BY doc_id, check_id",
        "doc_check_counts": f"""
            SELECT check_id, count(*) AS n FROM ({doc_viol}) GROUP BY check_id ORDER BY check_id
        """,
        "doc_samples": f"""
            WITH v AS (
              SELECT lpad(CAST(doc_id AS VARCHAR), 10, '0') AS url, check_id, found,
                     concat_ws('-', coalesce(found, 'NULL'), '') AS input_key
              FROM ({doc_viol})
            ), firsts AS (
              SELECT *, (row_number() OVER (PARTITION BY check_id, input_key ORDER BY url) = 1) AS is_first
              FROM v
            )
            SELECT check_id, url, found,
                   row_number() OVER (PARTITION BY check_id ORDER BY is_first DESC, url) AS sample_rank
            FROM firsts
            QUALIFY sample_rank <= 10
        """,
        "verbatim_samples": f"""
            WITH v AS (
              SELECT lpad(CAST(doc_id AS VARCHAR), 10, '0') AS url, check_id, found,
                     concat_ws('-', coalesce(found, 'NULL'), '') AS input_key
              FROM ({doc_viol})
            ), firsts AS (
              SELECT *, (row_number() OVER (PARTITION BY check_id, input_key ORDER BY url) = 1) AS is_first
              FROM v
            ), samp AS (
              SELECT check_id, url,
                     row_number() OVER (PARTITION BY check_id ORDER BY is_first DESC, url) AS sample_rank
              FROM firsts QUALIFY sample_rank <= 10
            ), j AS (
              SELECT s.check_id, s.url, d.lang, d.source, d.n_chars
              FROM documents d JOIN samp s ON lpad(CAST(d.doc_id AS VARCHAR), 10, '0') = s.url
            )
            SELECT check_id, url, lang, source, n_chars
            FROM (SELECT *, row_number() OVER (PARTITION BY check_id ORDER BY url) AS rn FROM j)
            WHERE rn <= 10 ORDER BY check_id, url
        """,
        "interpreted_counts": """
            SELECT count(ts) AS ts_ok,
                   count(CASE WHEN TRY_CAST(value AS DOUBLE) IS NOT NULL THEN 1 END) AS value_ok,
                   count(TRY_CAST(event_type AS TIMESTAMP)) AS event_type_as_ts
            FROM events
        """,
        "events_ts_unlikely": f"""
            SELECT event_type, count(*) AS n FROM events
            WHERE ts < TIMESTAMP '{TS_LO}' OR ts >= TIMESTAMP '{TS_HI}'
            GROUP BY event_type ORDER BY event_type
        """,
        "events_windows": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY day, event_type
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
        """,
        "top_orders_per_cust": """
            SELECT o_custkey, o_orderkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
                   row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
            FROM orders WHERE o_custkey < 50
            QUALIFY rank <= 3 ORDER BY o_custkey, rank
        """,
        "data_field_uniqueness": """
            SELECT o_custkey, count(*) AS dup_count FROM orders
            GROUP BY o_custkey HAVING count(*) > 1 ORDER BY o_custkey
        """,
        "frequent_values": """
            SELECT event_type AS value, count(*) AS n,
                   row_number() OVER (ORDER BY count(*) DESC, event_type) AS rank
            FROM events WHERE event_type IS NOT NULL
            GROUP BY event_type QUALIFY rank <= 5 ORDER BY rank
        """,
        "length_histogram": """
            SELECT CAST(floor(n_chars / 50) AS BIGINT) AS bucket, count(*) AS n,
                   min(n_chars) AS lo, max(n_chars) AS hi
            FROM documents WHERE n_chars IS NOT NULL
            GROUP BY 1 ORDER BY bucket
        """,
        "dedup_survivors": """
            SELECT doc_id, lang, source FROM (
              SELECT doc_id, lang, source,
                     min(doc_id) OVER (
                       PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
                     ) AS keep
              FROM documents
            ) WHERE doc_id = keep ORDER BY doc_id
        """,
        "top_revenue_orders": """
            SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
              AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id, ts, event_id,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
              FROM events WHERE ts IS NOT NULL
            ), s AS (
              SELECT user_id, ts, event_id,
                     CAST(sum(CASE WHEN gap IS NULL OR gap >= 1800 * 1000000 THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS sess_id
              FROM g
            )
            SELECT user_id, sess_id, count(*) AS n_events,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start
            FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_id
        """,
        "asof_attribution": """
            WITH clicks AS (
              SELECT event_id AS click_id, user_id, ts AS click_ts
              FROM events WHERE event_type = 'click'
            ), errors AS (
              SELECT user_id, ts, event_id AS err_id, value AS err_value
              FROM events WHERE event_type = 'error'
            )
            SELECT c.click_id, c.user_id, c.click_ts,
                   e.ts AS err_ts, e.err_id, e.err_value
            FROM clicks c JOIN errors e
              ON c.user_id = e.user_id AND e.ts <= c.click_ts
            QUALIFY row_number() OVER (
              PARTITION BY c.click_id ORDER BY e.ts DESC, e.err_id DESC) = 1
            ORDER BY click_id
        """,
        "interval_join_incidents": """
            WITH inc AS (
              SELECT event_id AS incident_id, ts AS incident_start,
                     ts + INTERVAL 60 MINUTE AS incident_end
              FROM events WHERE event_type = 'error'
              ORDER BY value DESC, event_id LIMIT 50
            ), clicks AS (
              SELECT event_id AS click_id, user_id, ts AS click_ts
              FROM events WHERE event_type = 'click'
            )
            SELECT c.click_id, c.user_id, c.click_ts,
                   i.incident_id, i.incident_start
            FROM clicks c JOIN inc i
              ON c.click_ts >= i.incident_start AND c.click_ts < i.incident_end
            ORDER BY click_id, incident_id
        """,
        "star_referential": """
            SELECT 'ext:lineitem' AS partition_id,
                   'RECORD_REFERENTIAL_INTEGRITY_VIOLATION' AS check_id,
                   count(*) AS n, count(DISTINCT l_orderkey) AS n_keys
            FROM lineitem l
            WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_orderkey = l.l_orderkey
                  AND o.o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
              )
            HAVING count(*) > 0
            ORDER BY partition_id, check_id
        """,
        "lapsed_customers": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
            ) ORDER BY c_custkey
        """,
        # bloom_lapsed_customers: EXACT same semantics as lapsed_customers —
        # the bloom pre-filter changes the physical plan, never the result.
        "bloom_lapsed_customers": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (
              SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
            ) ORDER BY c_custkey
        """,
        # file_audit: the driver's testdata tables are single parquet files
        # (TESTDATA.md); the oracle hard-codes that 1-file layout while the
        # Spark side measures it for real via input_file_name().
        "file_audit": """
            WITH a AS (
              SELECT 'customer' AS t, count(*) AS n FROM customer
              UNION ALL SELECT 'documents', count(*) FROM documents
              UNION ALL SELECT 'events', count(*) FROM events
              UNION ALL SELECT 'lineitem', count(*) FROM lineitem
              UNION ALL SELECT 'orders', count(*) FROM orders
            )
            SELECT t AS "table", CAST(1 AS BIGINT) AS n_files, n AS n_rows,
                   n AS min_file_rows, n AS max_file_rows,
                   CAST(CASE WHEN n < 100000 THEN 1 ELSE 0 END AS BIGINT)
                     AS n_small_files
            FROM a ORDER BY "table"
        """,
        "skew_audit": """
            WITH c AS (
              SELECT CAST(l_orderkey AS VARCHAR) AS key, count(*) AS n
              FROM lineitem GROUP BY 1
            ), t AS (
              SELECT CAST(sum(n) AS DOUBLE) AS total, count(*) AS n_groups FROM c
            )
            SELECT key, n, round(n / total, 6) AS share, n_groups
            FROM c CROSS JOIN t ORDER BY n DESC, key ASC LIMIT 10
        """,
        "regional_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE c_nationkey = s_nationkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY n_name ORDER BY revenue DESC, n_name
        """,
        "events_props_extract": """
            SELECT event_type,
                   count(CAST(json_extract(props, '$.k') AS INT)) AS n_parsed,
                   CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   min(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
                   max(CAST(json_extract(props, '$.k') AS INT)) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "events_rollup": """
            SELECT coalesce(day, 'ALL') AS day,
                   coalesce(event_type, 'ALL') AS event_type,
                   n
            FROM (
              SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                     event_type, count(*) AS n
              FROM events WHERE ts IS NOT NULL
              GROUP BY ROLLUP (day, event_type)
            ) ORDER BY day, event_type
        """,
        "fingerprints": """
            SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
            FROM documents ORDER BY doc_id
        """,
        "dedup_exact_groups": """
            SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
                   count(*) AS n_docs,
                   CAST(to_json(list_slice(list_sort(list(doc_id)), 1, 3)) AS VARCHAR) AS ids_json,
                   count(*) > 3 AS ids_truncated
            FROM documents GROUP BY 1 HAVING count(*) > 1
        """,
        "paragraph_dupes": """
            WITH p AS (
              SELECT doc_id,
                     md5(regexp_replace(lower(trim(s)), '\\s+', ' ', 'g')) AS fingerprint
              FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '\\. ')) AS s
                    FROM documents)
              WHERE length(trim(s)) >= 40
            ), d AS (SELECT DISTINCT doc_id, fingerprint FROM p)
            SELECT fingerprint, count(*) AS n_docs,
                   CAST(to_json(list_slice(list_sort(list(doc_id)), 1, 3)) AS VARCHAR) AS ids_json,
                   count(*) > 3 AS ids_truncated
            FROM d GROUP BY fingerprint HAVING count(*) > 1
            ORDER BY fingerprint
        """,
        "token_stats": f"""
            SELECT doc_id,
                   {ws_tokens} AS ws_tokens,
                   CASE WHEN text IS NULL THEN 0 ELSE len(regexp_extract_all(text, '{BPE_RE}')) END AS bpe_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_scores": f"""
            SELECT doc_id, {quality} AS quality FROM documents ORDER BY doc_id
        """,
        "quality_rank_norm": f"""
            WITH q AS (
              SELECT doc_id, source, {quality} AS quality FROM documents
            )
            SELECT doc_id, source, quality,
                   percent_rank() OVER (
                     PARTITION BY source ORDER BY quality, doc_id
                   ) AS quality_rank
            FROM q ORDER BY doc_id
        """,
        "mixture_plan": _mixture_plan_oracle_sql(),
        "lang_id": f"""
            SELECT doc_id,
                   CASE WHEN best.score > 0 THEN best.code ELSE 'und' END AS lang_pred
            FROM (
              SELECT doc_id, list_sort([{lang_structs}])[-1] AS best
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
            ) ORDER BY doc_id
        """,
        # triangles: edge construction + a<b canonicalization + wedge
        # build/close replayed relationally; each triangle counted once
        "triangles": """
            WITH e0 AS (
              SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
                     'h' || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR) AS dst
              FROM (SELECT doc_id,
                           unnest(range(1, (doc_id % 3 + 1) + 1)) AS k
                    FROM documents)
            ),
            e AS (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e0 WHERE src <> dst
            ),
            w AS (
              SELECT x.a AS wa, x.b AS wb, y.b AS wc
              FROM e x JOIN e y ON x.b = y.a
            ),
            tri AS (
              SELECT wa, wb, wc FROM w JOIN e z ON wa = z.a AND wc = z.b
            ),
            corners AS (
              SELECT unnest([wa, wb, wc]) AS vertex FROM tri
            )
            SELECT vertex, CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM corners GROUP BY vertex ORDER BY vertex
        """,
        # record_linkage: Fellegi–Sunter evidence chain with shared
        # driver-computed weight literals
        "record_linkage": _linkage_oracle_sql(),
        # join_advice: exact side/key stats + exact join cardinality from
        # the two key histograms; verdict CASE chain with the same
        # thresholds
        "join_advice": """
            WITH lc AS (
              SELECT CAST(l_orderkey AS VARCHAR) AS key, COUNT(*) AS n_l
              FROM lineitem GROUP BY 1
            ),
            rc AS (
              SELECT CAST(o_orderkey AS VARCHAR) AS key, COUNT(*) AS n_r
              FROM orders GROUP BY 1
            ),
            ls AS (
              SELECT CAST(SUM(n_l) AS BIGINT) AS n_left,
                     CAST(COUNT(CASE WHEN key IS NOT NULL THEN 1 END) AS BIGINT) AS n_left_keys,
                     CAST(COALESCE(SUM(CASE WHEN key IS NULL THEN n_l END), 0) AS BIGINT) AS n_left_null_keys
              FROM lc
            ),
            rs AS (
              SELECT CAST(SUM(n_r) AS BIGINT) AS n_right,
                     CAST(COUNT(CASE WHEN key IS NOT NULL THEN 1 END) AS BIGINT) AS n_right_keys,
                     CAST(COALESCE(SUM(CASE WHEN key IS NULL THEN n_r END), 0) AS BIGINT) AS n_right_null_keys
              FROM rc
            ),
            m AS (
              SELECT CAST(COALESCE(SUM(n_l * n_r), 0) AS BIGINT) AS est_out_rows,
                     CAST(COALESCE(MAX(n_l * n_r), 0) AS BIGINT) AS max_out
              FROM lc JOIN rc USING (key)
              WHERE key IS NOT NULL
            )
            SELECT n_left, n_right, n_left_keys, n_right_keys,
                   n_left_null_keys, n_right_null_keys, est_out_rows,
                   CASE WHEN est_out_rows > 0
                        THEN (1000000 * max_out) // est_out_rows
                        ELSE 0 END AS max_key_out_share_micro,
                   CASE WHEN n_right <= 100 THEN 'broadcast_right'
                        WHEN n_left <= 100 THEN 'broadcast_left'
                        WHEN (CASE WHEN est_out_rows > 0
                              THEN (1000000 * max_out) // est_out_rows
                              ELSE 0 END) > 900000 THEN 'salted_shuffle'
                        ELSE 'shuffle' END AS verdict
            FROM ls, rs, m
        """,
        # concentration: ascending-rank Gini + top-k share, all exact
        # integers (rank ties are ordered (x, g) but Σi·x is invariant)
        "concentration": """
            WITH c AS (
              SELECT CAST(source AS VARCHAR) AS g, COUNT(*) AS x
              FROM documents WHERE source IS NOT NULL GROUP BY source
            ),
            r AS (SELECT g, x, ROW_NUMBER() OVER (ORDER BY x, g) AS i FROM c),
            t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(x) AS BIGINT) AS tot,
                         CAST(SUM(i * x) AS BIGINT) AS s FROM r),
            tp AS (SELECT CAST(COALESCE(SUM(x), 0) AS BIGINT) AS topk
                   FROM r WHERE i > (SELECT n FROM t) - 3)
            SELECT n AS n_groups, tot AS n_rows,
                   (1000000 * (2 * s - (n + 1) * tot)) // (n * tot) AS gini_micro,
                   topk AS topk_rows,
                   (1000000 * topk) // tot AS topk_share_micro
            FROM t, tp
        """,
        # time_travel: CDC log replay — latest (ts, op-DESC tie) event at
        # or before the instant, deletes filtered after the window
        "time_travel": """
            WITH log AS (
              SELECT o_orderkey, TIMESTAMP '2024-01-01' AS ts,
                     'upsert' AS op, o_totalprice
              FROM orders
              UNION ALL
              SELECT o_orderkey, TIMESTAMP '2024-01-02', 'upsert',
                     o_totalprice + 10
              FROM orders WHERE o_orderkey % 2 = 0
              UNION ALL
              SELECT o_orderkey, TIMESTAMP '2024-01-02', 'delete',
                     CAST(NULL AS DOUBLE)
              FROM orders WHERE o_orderkey % 5 = 0
            ),
            r AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderkey ORDER BY ts DESC, op DESC) AS rn
              FROM log WHERE ts <= TIMESTAMP '2024-01-02 23:59:59'
            )
            SELECT o_orderkey, o_totalprice FROM r
            WHERE rn = 1 AND op <> 'delete' ORDER BY o_orderkey
        """,
        # crawl_depth: bounded BFS replayed as WITH RECURSIVE; MIN(dist)
        # per vertex = first-reached hop, exact integers
        "crawl_depth": """
            WITH RECURSIVE e AS (
              SELECT DISTINCT
                     'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
                     'h' || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR) AS dst
              FROM (SELECT doc_id,
                           unnest(range(1, (doc_id % 3 + 1) + 1)) AS k
                    FROM documents)
            ),
            d AS (
              SELECT vertex, 0 AS dist FROM (VALUES ('h0'), ('h1')) s(vertex)
              UNION
              SELECT e.dst, d.dist + 1 FROM d JOIN e ON e.src = d.vertex
              WHERE d.dist < 6
            )
            SELECT vertex, CAST(MIN(dist) AS INTEGER) AS dist
            FROM d GROUP BY vertex ORDER BY dist, vertex
        """,
        # assortativity: exact integer moments over both orientations,
        # then Newman's r in the Spark operation order (sqrt is IEEE
        # correctly-rounded on both engines)
        "assortativity": """
            WITH e0 AS (
              SELECT 'h' || CAST(doc_id % 23 AS VARCHAR) AS src,
                     'h' || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR) AS dst
              FROM (SELECT doc_id,
                           unnest(range(1, (doc_id % 3 + 1) + 1)) AS k
                    FROM documents)
            ),
            e AS (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM e0 WHERE src <> dst
            ),
            deg AS (
              SELECT v, COUNT(*) AS deg FROM (
                SELECT a AS v FROM e UNION ALL SELECT b FROM e
              ) GROUP BY v
            ),
            sym AS (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
            xy AS (
              SELECT dx.deg AS x, dy.deg AS y
              FROM sym JOIN deg dx ON sym.a = dx.v JOIN deg dy ON sym.b = dy.v
            ),
            mo AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS m,
                     CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx,
                     CAST(SUM(y * y) AS BIGINT) AS syy
              FROM xy
            ),
            nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM deg)
            SELECT m // 2 AS n_edges, n_vertices,
                   ROUND(CASE WHEN (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0.0
                               AND (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0.0
                         THEN (CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / (sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                         END, 6) AS r
            FROM mo, nv
        """,
        # partition_advice: per-candidate group stats in exact integers,
        # shares in micro-units via floor division, verdict precedence
        # replayed as a CASE chain
        "partition_advice": """
            WITH u AS (
              SELECT 'event_type' AS col, CAST(event_type AS VARCHAR) AS val FROM events
              UNION ALL
              SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
              UNION ALL
              SELECT 'props', CAST(props AS VARCHAR) FROM events
            ),
            c AS (SELECT col, val, COUNT(*) AS c FROM u GROUP BY col, val),
            st AS (
              SELECT col,
                     CAST(SUM(c) AS BIGINT) AS n_rows,
                     CAST(COALESCE(SUM(CASE WHEN val IS NULL THEN c END), 0) AS BIGINT) AS n_nulls,
                     CAST(COUNT(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT) AS n_distinct,
                     CAST(COALESCE(MAX(CASE WHEN val IS NOT NULL THEN c END), 0) AS BIGINT) AS max_group_rows
              FROM c GROUP BY col
            )
            SELECT col AS "column", n_rows, n_nulls, n_distinct, max_group_rows,
                   (1000000 * max_group_rows) // n_rows AS skew_micro,
                   (1000000 * n_nulls) // n_rows AS null_micro,
                   CASE WHEN n_distinct < 4 THEN 'too_few_values'
                        WHEN n_distinct > 10000 THEN 'too_many_values'
                        WHEN (1000000 * n_nulls) // n_rows > 200000 THEN 'high_null'
                        WHEN (1000000 * max_group_rows) // n_rows > 500000 THEN 'skewed'
                        ELSE 'good' END AS verdict
            FROM st ORDER BY col
        """,
        # lang_kappa: confusion-matrix marginals in exact integers, then
        # po/pe/kappa as DOUBLEs in the Spark operation order, rounded 6
        "lang_kappa": f"""
            WITH pred AS (
              SELECT doc_id,
                     CASE WHEN best.score > 0 THEN best.code ELSE 'und' END AS lang_pred
              FROM (
                SELECT doc_id, list_sort([{lang_structs}])[-1] AS best
                FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              )
            ),
            cm AS (
              SELECT d.lang AS a, p.lang_pred AS b, COUNT(*) AS c
              FROM documents d JOIN pred p USING (doc_id)
              WHERE d.lang IS NOT NULL AND p.lang_pred IS NOT NULL
              GROUP BY 1, 2
            ),
            rm AS (SELECT a, SUM(c) AS row_c FROM cm GROUP BY a),
            colm AS (SELECT b, SUM(c) AS col_c FROM cm GROUP BY b),
            prod AS (SELECT SUM(row_c * col_c) AS s_prod
                     FROM rm JOIN colm ON rm.a = colm.b),
            tot AS (SELECT SUM(c) AS n,
                           SUM(CASE WHEN a = b THEN c END) AS n_agree
                    FROM cm)
            SELECT CAST(n AS BIGINT) AS n,
                   CAST(COALESCE(n_agree, 0) AS BIGINT) AS n_agree,
                   ROUND(CAST(COALESCE(n_agree, 0) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS po,
                   ROUND(CAST(s_prod AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS pe,
                   ROUND(CASE WHEN CAST(s_prod AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) <> 1.0
                         THEN (CAST(COALESCE(n_agree, 0) AS DOUBLE) / CAST(n AS DOUBLE)
                               - CAST(s_prod AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                              / (CAST(1.0 AS DOUBLE)
                                 - CAST(s_prod AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                         END, 6) AS kappa
            FROM tot, prod
        """,
        "ngram_jaccard": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
            FROM inter
            JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
            JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "weighted_jaccard": """
            WITH g AS (
              SELECT doc_id,
                     [array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)] AS grams
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), tf AS (
              SELECT doc_id, gram, count(*) AS tf
              FROM (SELECT doc_id, unnest(grams) AS gram FROM g)
              GROUP BY 1, 2
            ), tot AS (
              SELECT doc_id, SUM(tf) AS tot FROM tf GROUP BY 1
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     SUM(LEAST(a.tf, b.tf)) AS s_min
              FROM tf a JOIN tf b ON a.gram = b.gram AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(CAST(s_min AS DOUBLE) / (ta.tot + tb.tot - s_min), 6) AS wjaccard
            FROM inter
            JOIN tot ta ON ta.doc_id = doc_a
            JOIN tot tb ON tb.doc_id = doc_b
            WHERE CAST(s_min AS DOUBLE) / (ta.tot + tb.tot - s_min) >= 0.4
            ORDER BY doc_a, doc_b
        """,
        "threshold_sweep": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), p AS (
              SELECT doc_a, doc_b, n_inter,
                     sa.n + sb.n - n_inter AS u
              FROM inter
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
            ), grid(threshold_pct) AS (
              VALUES (30), (40), (50), (60), (70), (80), (90)
            ), cleared AS (
              SELECT g.threshold_pct, p.doc_a, p.doc_b
              FROM p JOIN grid g ON p.n_inter * 100 >= g.threshold_pct * p.u
            )
            SELECT g.threshold_pct,
                   CAST(COALESCE(c.n_pairs, 0) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(d.n_docs, 0) AS BIGINT) AS n_docs
            FROM grid g
            LEFT JOIN (SELECT threshold_pct, COUNT(*) AS n_pairs
                       FROM cleared GROUP BY 1) c USING (threshold_pct)
            LEFT JOIN (SELECT threshold_pct, COUNT(DISTINCT doc) AS n_docs
                       FROM (SELECT threshold_pct, doc_a AS doc FROM cleared
                             UNION ALL
                             SELECT threshold_pct, doc_b FROM cleared)
                       GROUP BY 1) d USING (threshold_pct)
            ORDER BY threshold_pct
        """,
        # prefix_jaccard: intentionally the SAME exact all-pairs SQL as
        # ngram_jaccard — the prefix filter is lossless by theorem, and this
        # row is the hash-exact proof of that claim on real data
        "prefix_jaccard": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter), 6) AS jaccard
            FROM inter
            JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
            JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "ngram_containment": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
                   round(CAST(n_inter AS DOUBLE) / least(sa.n, sb.n), 6) AS containment
            FROM inter
            JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
            JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
            WHERE CAST(n_inter AS DOUBLE) / least(sa.n, sb.n) >= 0.8
            ORDER BY doc_a, doc_b
        """,
        "cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
            scored AS (
              SELECT q.query_id, c.vec_id AS neighbor_id,
                     round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos6
              FROM q JOIN embeddings c ON c.vec_id <> q.query_id
            )
            SELECT query_id, neighbor_id, round(cos6, 4) AS cosine,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id) AS rank
            FROM scored QUALIFY rank <= 3 ORDER BY query_id, rank
        """,
        # deterministic multi-probe sign-LSH recall@5 vs exact brute force:
        # integer-quantized vectors + LCG Rademacher hyperplanes make the
        # buckets (and therefore the ANN picks) bit-identical across engines
        "ann_recall": """
            WITH qv AS (
              SELECT vec_id, embedding,
                     [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS q
              FROM embeddings
            ),
            buck AS (
              SELECT vec_id, embedding,
                     list_sum([
                       CASE WHEN list_sum([
                         q[d + 1] * (CASE WHEN ((b * 10007 + d + 1) * 1103515245 + 12345) % 2147483648 >= 1073741824 THEN 1 ELSE -1 END)
                         for d in range(64)]) > 0
                       THEN 1 << b ELSE 0 END
                       for b in range(4)]) AS bucket
              FROM qv
            ),
            probes AS (
              SELECT query_id, qe, unnest([qb, xor(qb, 1), xor(qb, 2), xor(qb, 4), xor(qb, 8)]) AS pb
              FROM (SELECT vec_id AS query_id, embedding AS qe, bucket AS qb FROM buck WHERE vec_id < 16)
            ),
            ann AS (
              SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id) AS rnk
                FROM (
                  SELECT p.query_id, c.vec_id AS neighbor_id,
                         round(list_cosine_similarity(CAST(p.qe AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos6
                  FROM probes p JOIN buck c ON c.bucket = p.pb AND c.vec_id <> p.query_id
                )
              ) WHERE rnk <= 5
            ),
            exact AS (
              SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id ORDER BY cos6 DESC, neighbor_id) AS rnk
                FROM (
                  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cos6
                  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
                  WHERE q.vec_id < 16
                )
              ) WHERE rnk <= 5
            )
            SELECT e.query_id,
                   coalesce(a.n_ann, 0) AS n_ann,
                   coalesce(h.n_hit, 0) AS n_hit,
                   round(coalesce(h.n_hit, 0) * 1.0 / e.n_exact, 6) AS recall
            FROM (SELECT query_id, count(*) AS n_exact FROM exact GROUP BY 1) e
            LEFT JOIN (SELECT query_id, count(*) AS n_ann FROM ann GROUP BY 1) a USING (query_id)
            LEFT JOIN (
              SELECT query_id, count(*) AS n_hit
              FROM exact SEMI JOIN ann USING (query_id, neighbor_id) GROUP BY 1
            ) h USING (query_id)
            ORDER BY query_id
        """,
        "cosine_dup_pairs": """
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   round(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6), 4) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
            ORDER BY doc_a, doc_b
        """,
        # connected components over the ngram-Jaccard pair list (recursive
        # min-reachable-id), matching duplicate_clusters' min-label fixpoint
        "dedup_clusters": """
            WITH RECURSIVE sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), p AS (
              SELECT doc_a, doc_b
              FROM inter
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
              WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
            ), e AS (
              SELECT doc_a AS a, doc_b AS b FROM p
              UNION
              SELECT doc_b, doc_a FROM p
            ), reach AS (
              SELECT a AS id, a AS r FROM e
              UNION
              SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
            )
            SELECT id AS doc_id, min(r) AS cluster_id
            FROM reach GROUP BY id ORDER BY doc_id
        """,
        "hash_sample": """
            SELECT doc_id,
                   CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
            FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
            ORDER BY doc_id
        """,
        "hash_split": """
            SELECT CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 10
                        THEN 'test' ELSE 'train' END AS split,
                   count(*) AS n, count(DISTINCT doc_id) AS n_ids
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "pack_bins": """
            WITH t AS (
              SELECT doc_id, n_chars,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS shard
              FROM documents
            ), w AS (
              SELECT doc_id, n_chars, shard,
                     sum(n_chars) OVER (PARTITION BY shard ORDER BY n_chars DESC, doc_id) AS cum
              FROM t
            )
            SELECT doc_id, shard,
                   CAST(floor(CAST(cum - n_chars AS DOUBLE) / 2000) AS BIGINT) AS bin_id,
                   n_chars AS tokens
            FROM w ORDER BY doc_id
        """,
        "shard_plan": """
            SELECT doc_id, CAST(n_chars AS BIGINT) AS size,
                   CAST((sum(CAST(n_chars AS BIGINT)) OVER
                           (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         - n_chars) // 25000 AS BIGINT) AS shard
            FROM documents ORDER BY doc_id
        """,
        "contamination": """
            WITH bench AS (
              SELECT DISTINCT unnest(list_distinct([array_to_string(words[i:i+7], ' ') for i in range(1, len(words) - 6)])) AS g
              FROM (SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS words
                    FROM documents WHERE doc_id < 20)
              WHERE len(words) >= 8
            ), corpus AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+7], ' ') for i in range(1, len(words) - 6)]) AS sh
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
                    FROM documents WHERE doc_id >= 20)
              WHERE len(words) >= 8
            ), ex AS (
              SELECT doc_id, len(sh) AS n_grams, unnest(sh) AS g FROM corpus
            )
            SELECT ex.doc_id, CAST(ex.n_grams AS BIGINT) AS n_grams,
                   count(bench.g) AS n_hits,
                   round(count(bench.g) / CAST(ex.n_grams AS DOUBLE), 6) AS ratio
            FROM ex LEFT JOIN bench ON ex.g = bench.g
            GROUP BY ex.doc_id, ex.n_grams
            ORDER BY ex.doc_id
        """,
        # SimHash (Charikar 2002) is fully deterministic given the md5-prefix
        # token hash, and the pigeonhole candidate scheme is EXACT for
        # hamming <= 3 with 4 chunks — so brute-force SQL over recomputed
        # signatures is a bit-exact oracle for the distributed operator.
        "simhash_pairs": """
            WITH words AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            tf AS (
              SELECT doc_id, w, count(*) AS cnt
              FROM (SELECT doc_id, unnest(ws) AS w FROM words WHERE len(ws) > 0)
              GROUP BY doc_id, w
            ),
            h AS (
              SELECT doc_id, cnt,
                     CAST(('0x' || substr(md5(w), 1, 16)) AS UBIGINT) AS hv
              FROM tf
            ),
            bits AS (
              SELECT doc_id, b.bit,
                     sum(CASE WHEN (hv >> b.bit) & 1 = 1 THEN cnt ELSE -cnt END) AS acc
              FROM h CROSS JOIN (SELECT range AS bit FROM range(0, 64)) b
              GROUP BY doc_id, b.bit
            ),
            -- sum(UHUGEINT) degrades to DOUBLE in DuckDB (low-bit loss), so
            -- the signature is assembled in BIGINT: bits 0-62 summed
            -- directly, bit 63 folded in as the two's-complement sign term
            sig AS (
              SELECT doc_id,
                     CAST(sum(CASE WHEN acc > 0 AND bit < 63
                                   THEN (1::BIGINT << CAST(bit AS INT))
                                   ELSE 0 END) AS BIGINT)
                     + CASE WHEN bool_or(bit = 63 AND acc > 0)
                            THEN -9223372036854775807 - 1 ELSE 0 END AS s
              FROM bits GROUP BY doc_id
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.s, b.s)) AS INT) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.s, b.s)) <= 3
            ORDER BY doc_a, doc_b
        """,
        # winnow_pairs: documents sharing >= 2 winnowing fingerprints, with
        # the max_df=1000 posting-list cap (never binding at this corpus
        # size, modeled anyway for semantic parity)
        "winnow_pairs": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            g AS (
              SELECT doc_id, len(ws) - 4 AS m,
                     unnest(generate_series(1, len(ws) - 4)) AS i, ws
              FROM w WHERE len(ws) >= 5
            ),
            h AS (
              SELECT doc_id, m, i,
                     CAST(CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 16)) AS UBIGINT)
                          % (1::UBIGINT << 62) AS BIGINT) AS hv
              FROM g
            ),
            mins AS (
              SELECT doc_id, m, i,
                     min(hv) OVER (PARTITION BY doc_id) AS min_all,
                     min(hv) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS min_win
              FROM h
            ),
            fps AS (
              SELECT DISTINCT doc_id,
                     CASE WHEN m <= 4 THEN min_all ELSE min_win END AS fp
              FROM mins WHERE m <= 4 OR i >= 4
            ),
            df AS (SELECT fp, count(*) AS n FROM fps GROUP BY fp)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
            FROM fps a
            JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
            JOIN df ON df.fp = a.fp AND df.n BETWEEN 2 AND 1000
            GROUP BY 1, 2 HAVING count(*) >= 2
            ORDER BY doc_a, doc_b
        """,
        # pii_scan: the augmentation CASEs mirror _pii_augmented_text
        # verbatim; counts/redaction are generated from PII_PATTERNS
        "pii_scan": f"""
            WITH aug AS (
              SELECT doc_id,
                coalesce(text, '')
                || CASE WHEN doc_id % 7 = 0 THEN ' reach me at user' || CAST(doc_id AS VARCHAR) || '@crawl-mail.example.com' ELSE '' END
                || CASE WHEN doc_id % 11 = 0 THEN ' origin 192.168.' || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
                || CASE WHEN doc_id % 13 = 0 THEN ' tel +1 555 ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' 0199' ELSE '' END
                || CASE WHEN doc_id % 17 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
                || CASE WHEN doc_id % 19 = 0 THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
                AS t
              FROM documents
            )
            SELECT doc_id,
              {pii_count_exprs},
              {pii_total_expr} AS n_pii,
              md5({pii_red_expr}) AS redacted_md5,
              length({pii_red_expr}) AS redacted_len
            FROM aug ORDER BY doc_id
        """,
        # stratified_sample: per-source keep rates generated from the same
        # STRATA_RATES dict the Spark side compiles into its MAP literal
        "stratified_sample": f"""
            SELECT doc_id, source, {bucket_expr} AS bucket
            FROM documents
            WHERE {bucket_expr} < ({strata_case})
            ORDER BY doc_id
        """,
        # source_rollup: integer-sum/order-statistic aggregates only, so
        # both engines are summation-order-independent; the mean derives
        # from the exact integer sum
        "source_rollup": f"""
            SELECT source AS stratum,
                   count(*) AS n_docs,
                   count(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
                   CAST(sum(coalesce(n_chars, 0)) AS BIGINT) AS sum_size,
                   count(DISTINCT lang) AS n_langs,
                   CAST(sum({ws_tokens}) AS BIGINT) AS sum_ws_tokens,
                   count(CASE WHEN ({quality6}) >= 0.5 THEN 1 END) AS n_hi_quality,
                   round(CAST(sum(coalesce(n_chars, 0)) AS DOUBLE) / count(*), 6) AS avg_size
            FROM documents GROUP BY source ORDER BY stratum
        """,
        # mix_resample: copy count = floor(w) + (hash bucket < frac(w)*100),
        # replicas generated by range-unnest; weights are exact binary
        # fractions so the frac threshold is float-exact in both engines
        "mix_resample": f"""
            WITH c AS (
              SELECT doc_id, source,
                     CAST(CASE source {' '.join(f"WHEN '{k}' THEN {v}" for k, v in MIX_WEIGHTS.items())} ELSE 1.0 END AS DOUBLE) AS w,
                     {bucket_expr} AS b
              FROM documents
            ),
            n AS (
              SELECT doc_id, source,
                     CAST(floor(w) AS BIGINT)
                     + CASE WHEN b < CAST((w - floor(w)) * 100 AS BIGINT) THEN 1 ELSE 0 END AS n_copies
              FROM c
            )
            SELECT doc_id, source, CAST(t.i AS BIGINT) AS copy
            FROM n, unnest(range(n_copies)) AS t(i)
            ORDER BY doc_id, copy
        """,
        # doc_chunks: 16-token windows with stride 12 over the same
        # whitespace tokenizer; chunk count = 1 + ceil((n-16)/12) for n>16
        "doc_chunks": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            nz AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
            ch AS (
              SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_id,
                     ws[(CAST(t.i AS BIGINT)*12+1):(CAST(t.i AS BIGINT)*12+16)] AS ct
              FROM nz, unnest(range(
                CASE WHEN n <= 16 THEN 1
                     ELSE 1 + CAST(ceil((n - 16) / 12.0) AS BIGINT) END)) AS t(i)
            )
            SELECT doc_id, chunk_id,
                   CAST(len(ct) AS BIGINT) AS n_tokens,
                   md5(array_to_string(ct, ' ')) AS chunk_md5
            FROM ch ORDER BY doc_id, chunk_id
        """,
        # dedup_rate_by_source: corpus-wide fingerprint group sizes (null
        # text → sentinel group, matching the Spark coalesce), attributed
        # per source
        "dedup_rate_by_source": """
            WITH f AS (
              SELECT doc_id, source,
                     coalesce(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 'NULL') AS fp
              FROM documents
            ),
            c AS (SELECT fp, count(*) AS n FROM f GROUP BY fp)
            SELECT source,
                   count(*) AS n_docs,
                   count(CASE WHEN c.n > 1 THEN 1 END) AS n_dup_docs,
                   round(CAST(count(CASE WHEN c.n > 1 THEN 1 END) AS DOUBLE) / count(*), 6) AS dup_frac
            FROM f JOIN c USING (fp)
            GROUP BY source ORDER BY source
        """,
        # tfidf_top_terms: same tokenizer; df = docs-per-term from the
        # (doc,term) counts, tfidf = tf*ln(N/df) rounded to 6 (cross-engine
        # stable, ln ulp noise vanishes under the rounding), top-3 per doc
        # with the (tfidf desc, term) tie-break
        "tfidf_top_terms": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            tf AS (
              SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id, unnest(ws) AS term FROM w)
              GROUP BY 1, 2
            ),
            df_t AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(*) AS n FROM w),
            s AS (
              SELECT tf.doc_id, tf.term, tf.tf, df_t.df,
                     round(tf.tf * ln(CAST(n.n AS DOUBLE) / df_t.df), 6) AS tfidf
              FROM tf JOIN df_t USING (term) CROSS JOIN n
            )
            SELECT doc_id, term, tf, df, tfidf,
                   CAST(row_number() OVER (
                     PARTITION BY doc_id ORDER BY tfidf DESC, term
                   ) AS BIGINT) AS rk
            FROM s
            QUALIFY rk <= 3
            ORDER BY doc_id, term
        """,
        # source_quota: greedy per-source token-budget selection — rank by
        # (round-6 quality desc, doc_id), running ROWS-frame token sum,
        # selected iff the inclusive total stays <= 400
        "source_quota": f"""
            WITH s AS (
              SELECT doc_id, source, {ws_tokens} AS tokens, ({quality6}) AS q
              FROM documents
            ),
            r AS (
              SELECT doc_id, source,
                     CAST(row_number() OVER (
                       PARTITION BY source ORDER BY q DESC NULLS LAST, doc_id
                     ) AS BIGINT) AS rank,
                     CAST(sum(tokens) OVER (
                       PARTITION BY source ORDER BY q DESC NULLS LAST, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                     ) AS BIGINT) AS cum_tokens
              FROM s
            )
            SELECT doc_id, source, rank, cum_tokens,
                   (cum_tokens <= 400) AS selected
            FROM r ORDER BY doc_id
        """,
        # boilerplate census: same 2-word pseudo-line tokenizer as
        # repetition_stats; per-doc DISTINCT lines, per-(source,line) doc
        # counts >= 3, capped at the 50 most widespread per domain with the
        # (n_docs desc, line) tie-break the Spark window uses
        "boilerplate_lines": """
            WITH w AS (
              SELECT doc_id, source,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            l AS (
              SELECT doc_id, source,
                     list_transform(range(0, (len(ws) + 1) // 2),
                                    i -> array_to_string(ws[i*2+1 : i*2+2], ' ')) AS lines
              FROM w
            ),
            c AS (
              SELECT source AS domain, line, count(*) AS n_docs
              FROM (SELECT doc_id, source, unnest(list_distinct(lines)) AS line FROM l)
              WHERE line <> ''
              GROUP BY 1, 2
              HAVING count(*) >= 3
            )
            SELECT domain, line, n_docs FROM c
            QUALIFY row_number() OVER (PARTITION BY domain ORDER BY n_docs DESC, line) <= 50
            ORDER BY domain, line
        """,
        # strip_boilerplate: the same census, then a positional keep-filter
        # per doc (blank lines always kept) and an md5 of the re-joined
        # cleaned text; docs whose line array is empty still emit a row
        "strip_boilerplate": """
            WITH w AS (
              SELECT doc_id, source,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            l AS (
              SELECT doc_id, source,
                     list_transform(range(0, (len(ws) + 1) // 2),
                                    i -> array_to_string(ws[i*2+1 : i*2+2], ' ')) AS lines
              FROM w
            ),
            c AS (
              SELECT source AS domain, line, count(*) AS n_docs
              FROM (SELECT doc_id, source, unnest(list_distinct(lines)) AS line FROM l)
              WHERE line <> ''
              GROUP BY 1, 2
              HAVING count(*) >= 3
            ),
            bl AS (
              SELECT domain, line FROM c
              QUALIFY row_number() OVER (PARTITION BY domain ORDER BY n_docs DESC, line) <= 50
            ),
            p AS (
              SELECT l.doc_id, l.source, i.i AS pos, l.lines[i.i] AS line
              FROM l, LATERAL (SELECT unnest(range(1, len(l.lines) + 1)) AS i) i
            ),
            k AS (
              SELECT p.doc_id, p.pos, p.line,
                     (p.line = '' OR bl.line IS NULL) AS keep
              FROM p LEFT JOIN bl ON bl.domain = p.source AND bl.line = p.line
            ),
            a AS (
              SELECT doc_id,
                     count(*) FILTER (WHERE keep) AS n_kept,
                     md5(coalesce(string_agg(line, ' ' ORDER BY pos) FILTER (WHERE keep), '')) AS clean_md5
              FROM k GROUP BY doc_id
            )
            SELECT l.doc_id, len(l.lines) AS n_lines,
                   coalesce(a.n_kept, 0) AS n_kept,
                   coalesce(a.clean_md5, md5('')) AS clean_md5
            FROM l LEFT JOIN a USING (doc_id) ORDER BY l.doc_id
        """,
        # repetition_stats: 2-word pseudo-lines (mirrors _q_repetition_stats),
        # sorted-neighbor duplicate flags; DuckDB lambda indexes are 1-based
        # where Spark's transform/filter indexes are 0-based
        "repetition_stats": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            l AS (
              SELECT doc_id,
                     list_transform(range(0, (len(ws) + 1) // 2),
                                    i -> array_to_string(ws[i*2+1 : i*2+2], ' ')) AS lines
              FROM w
            ),
            s AS (
              SELECT doc_id, lines, list_sort(lines) AS sl, len(lines) AS n
              FROM l
            ),
            d AS (
              SELECT doc_id, lines, n,
                     list_filter(sl, (x, i) -> (i > 1 AND x = sl[i-1])
                                            OR (i < n AND x = sl[i+1])) AS dup
              FROM s
            )
            SELECT doc_id,
                   n AS n_lines,
                   round(CASE WHEN n > 0
                              THEN CAST(len(dup) AS DOUBLE) / n ELSE 0.0 END, 6) AS dup_line_frac,
                   round(CASE WHEN coalesce(list_sum(list_transform(lines, x -> length(x))), 0) > 0
                              THEN CAST(coalesce(list_sum(list_transform(dup, x -> length(x))), 0) AS DOUBLE)
                                   / list_sum(list_transform(lines, x -> length(x)))
                              ELSE 0.0 END, 6) AS dup_line_char_frac
            FROM d ORDER BY doc_id
        """,
        # top_ngram: same tokenizer, same (count desc, len desc, gram) tie
        "top_ngram": """
            WITH w AS (
              SELECT doc_id, length(text) AS nc,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            g AS (
              SELECT doc_id, nc, ws[r.i] || ' ' || ws[r.i+1] AS gram
              FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i) r
              WHERE len(ws) >= 2
            ),
            c AS (
              SELECT doc_id, gram, nc, count(*) AS n_occurrences
              FROM g GROUP BY 1, 2, 3
            ),
            rk AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY n_occurrences DESC, length(gram) DESC, gram
              ) AS rk FROM c
            )
            SELECT doc_id, gram AS top_gram, n_occurrences,
                   round(n_occurrences * length(gram) / CAST(nc AS DOUBLE), 6) AS char_frac
            FROM rk WHERE rk = 1 ORDER BY doc_id
        """,
        # minhash_pairs: bit-exact brute-force reimplementation of the
        # MinHash-LSH candidate scheme (operators/dedup.minhash_lsh_pairs,
        # k=3 word-shingles, 64 hashes, 16 bands x 4 rows, threshold 0.5,
        # max_bucket 1000). The signature is fully deterministic given the
        # md5-prefix shingle hash and the shared minhash_constants() family;
        # numpy's uint64 arithmetic wraps mod 2**64 BEFORE the Mersenne
        # mod, replicated here in HUGEINT. Band collision == equality of
        # the 4-value signature slice, modeled as the comma-joined slice
        # string; est_jaccard = n/64 is exact at 6 decimals (1/64 =
        # 0.015625), so round(.,6) is the identity on both engines.
        # spreadsheet_pages: the fixture workbooks are deterministic bytes,
        # so the expected parse is a fixed literal table — this checks the
        # whole stdlib zip/XML parse chain (shared strings, date serials,
        # repeated columns, ss:Index gaps, stop-at-blank) end to end
        # url_filter: replay the url construction; subdomain block via
        # exact-or-dot-suffix match against the 2-domain list
        "url_filter": """
            WITH built AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 5 = 0 THEN 'cdn.' ELSE '' END
                       || source || '-' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS host,
                     CASE WHEN doc_id % 17 = 0 THEN '/adult/x'
                          ELSE '/p/' || CAST(doc_id AS VARCHAR) END AS path
              FROM documents
            ),
            b AS (SELECT * FROM (VALUES ('src1-3.example.org'), ('src2-4.example.org')) AS t(domain)),
            flags AS (
              SELECT doc_id, 'https://' || host || path AS url, host,
                     EXISTS (SELECT 1 FROM b WHERE built.host = b.domain
                             OR built.host LIKE '%.' || b.domain) AS domain_blocked,
                     path LIKE '/adult/%' AS path_flagged
              FROM built
            )
            SELECT doc_id, url, host, domain_blocked, path_flagged,
                   (NOT domain_blocked AND NOT path_flagged) AS allowed
            FROM flags ORDER BY doc_id
        """,
        # doc_line_dedup: replay the 4-token re-lining, keep-first filter
        # via list_position == own index, md5-pin the reassembled text
        "doc_line_dedup": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            lined AS (
              SELECT doc_id,
                     [array_to_string(ws[(i * 4 + 1):(i * 4 + 4)], ' ')
                      for i in range(0, CAST(floor((len(ws) + 3) / 4) AS BIGINT))] AS lines
              FROM toks WHERE len(ws) > 0
            ),
            dd AS (
              SELECT doc_id, lines,
                     [lines[i] for i in range(1, len(lines) + 1)
                      if list_position(lines, lines[i]) = i] AS kept
              FROM lined
            )
            SELECT doc_id,
                   CAST(len(lines) AS BIGINT) AS n_lines,
                   CAST(len(lines) - len(kept) AS BIGINT) AS n_dropped,
                   md5(array_to_string(kept, chr(10))) AS dedup_md5
            FROM dd ORDER BY doc_id
        """,
        # nfc_report: native nfc_normalize vs the pandas-UDF unicodedata
        # path; the decomposed ' cafe'+U+0301 suffix is injected on %7 rows
        "nfc_report": """
            WITH built AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN text || ' cafe' || chr(769)
                          ELSE text END AS t
              FROM documents WHERE text IS NOT NULL
            )
            SELECT doc_id,
                   nfc_normalize(t) <> t AS changed,
                   CAST(length(t) AS BIGINT) AS len_before,
                   CAST(length(nfc_normalize(t)) AS BIGINT) AS len_after,
                   md5(nfc_normalize(t)) AS nfc_md5
            FROM built ORDER BY doc_id
        """,
        # fd_check: SQL functional-dependency replay — groups with >1
        # distinct RHS, with min/max RHS as the bounded evidence
        "fd_check": """
            SELECT source, COUNT(*) AS n_rows,
                   COUNT(DISTINCT lang) AS n_rhs_distinct,
                   MIN(lang) AS rhs_min, MAX(lang) AS rhs_max
            FROM documents
            GROUP BY source
            HAVING COUNT(DISTINCT lang) > 1
            ORDER BY source
        """,
        # changeset_extract: delta recomputed with column-wise IS DISTINCT
        # FROM — proves the md5-of-JSON fingerprint flags exactly the
        # changed payloads
        "changeset_extract": """
            WITH base AS (
              SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
            ), old AS (
              SELECT * FROM base WHERE o_orderkey % 11 <> 0
            ), new AS (
              SELECT o_orderkey, o_orderstatus,
                     CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                          ELSE o_totalprice END AS o_totalprice
              FROM base WHERE o_orderkey % 13 <> 0
            )
            SELECT * FROM (
              SELECT 'upsert' AS op, n.o_orderkey, n.o_orderstatus,
                     n.o_totalprice
              FROM new n LEFT JOIN old o USING (o_orderkey)
              WHERE o.o_orderkey IS NULL
                 OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
                 OR n.o_totalprice IS DISTINCT FROM o.o_totalprice
              UNION ALL
              SELECT 'delete', o.o_orderkey, CAST(NULL AS VARCHAR),
                     CAST(NULL AS DOUBLE)
              FROM old o LEFT JOIN new n USING (o_orderkey)
              WHERE n.o_orderkey IS NULL
            )
            ORDER BY op, o_orderkey
        """,
        # fd_strength: g3 = 1 - sum(per-group plurality)/n, exact integer
        # micro-units via floor division
        "fd_strength": """
            WITH pair AS (
              SELECT source, lang, count(*) AS n
              FROM documents WHERE lang IS NOT NULL
              GROUP BY source, lang
            ), grp AS (
              SELECT source, sum(n) AS rows_, max(n) AS kept,
                     count(*) AS n_rhs
              FROM pair GROUP BY source
            )
            SELECT 'source' AS lhs, 'lang' AS rhs,
                   CAST(sum(rows_) AS BIGINT) AS n_rows,
                   count(*) AS n_groups,
                   count(*) FILTER (n_rhs > 1) AS n_violating_groups,
                   CAST(sum(kept) AS BIGINT) AS n_kept,
                   (1000000 * (CAST(sum(rows_) AS BIGINT)
                               - CAST(sum(kept) AS BIGINT)))
                     // CAST(sum(rows_) AS BIGINT) AS g3_micro
            FROM grp
        """,
        # mask_profile: same 3-class regex mask (A/a/9), deterministic
        # (n DESC, mask) cut at 50
        "mask_profile": """
            SELECT regexp_replace(regexp_replace(regexp_replace(
                     props, '[A-Z]', 'A', 'g'), '[a-z]', 'a', 'g'),
                     '[0-9]', '9', 'g') AS mask,
                   COUNT(*) AS n_rows,
                   COUNT(DISTINCT props) AS n_values,
                   MIN(props) AS example
            FROM events WHERE props IS NOT NULL
            GROUP BY 1
            ORDER BY n_rows DESC, mask
            LIMIT 50
        """,
        # dedup_agreement: pair-counting replay — same planted variants,
        # same md5 labels, C(x,2) in HUGEINT, floor micro-quotients
        "dedup_agreement": """
            WITH lab AS (
              SELECT md5(text) AS a,
                     md5(lower(trim(regexp_replace(text, '[ \t\n\r]+', ' ', 'g')))) AS b
              FROM (
                SELECT text FROM documents WHERE text IS NOT NULL
                UNION ALL
                SELECT upper(text) || '  ' FROM documents
                WHERE text IS NOT NULL AND doc_id % 50 = 0
                UNION ALL
                SELECT text FROM documents
                WHERE text IS NOT NULL AND doc_id % 97 = 0
              )
            ), cells AS (
              SELECT a, b, COUNT(*) AS n FROM lab GROUP BY a, b
            ), sa AS (SELECT a, SUM(n) AS s FROM cells GROUP BY a),
               sb AS (SELECT b, SUM(n) AS s FROM cells GROUP BY b),
               f AS (
              SELECT (SELECT CAST(COALESCE(SUM(n), 0) AS HUGEINT) FROM cells) AS total,
                     (SELECT COUNT(*) FROM cells) AS n_cells,
                     (SELECT COUNT(*) FROM sa) AS ka,
                     (SELECT COUNT(*) FROM sb) AS kb,
                     (SELECT CAST(COALESCE(SUM(CAST(s AS HUGEINT) * (s - 1) // 2), 0) AS HUGEINT) FROM sa) AS pa,
                     (SELECT CAST(COALESCE(SUM(CAST(s AS HUGEINT) * (s - 1) // 2), 0) AS HUGEINT) FROM sb) AS pb,
                     (SELECT CAST(COALESCE(SUM(CAST(n AS HUGEINT) * (n - 1) // 2), 0) AS HUGEINT) FROM cells) AS pboth
            )
            SELECT CAST(total AS BIGINT) AS n_items,
                   CAST(n_cells AS BIGINT) AS n_cells,
                   CAST(ka AS BIGINT) AS n_clusters_a,
                   CAST(kb AS BIGINT) AS n_clusters_b,
                   CAST(pa AS BIGINT) AS pairs_a,
                   CAST(pb AS BIGINT) AS pairs_b,
                   CAST(pboth AS BIGINT) AS pairs_both,
                   CASE WHEN pb > 0 THEN CAST(1000000 * pboth // pb AS BIGINT) END AS precision_micro,
                   CASE WHEN pa > 0 THEN CAST(1000000 * pboth // pa AS BIGINT) END AS recall_micro,
                   CASE WHEN pa + pb > 0 THEN CAST(2000000 * pboth // (pa + pb) AS BIGINT) END AS dice_micro,
                   CASE WHEN total >= 2 THEN CAST(
                     1000000 * (total * (total - 1) // 2 - pa - pb + 2 * pboth)
                     // (total * (total - 1) // 2) AS BIGINT) END AS rand_micro
            FROM f
        """,
        # host_spoof: host extraction + all three detection regexes
        # replayed over the same VALUES fixture (patterns restricted to
        # Java/RE2-identical constructs)
        "host_spoof": """
            WITH u AS (
              SELECT * FROM (VALUES
                """
        + ",\n                ".join(f"('{u}')" for u in _SPOOF_FIXTURE)
        + """
              ) t(url)
            ), h AS (
              SELECT lower(regexp_extract(url,
                '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#\\s]+)', 1)) AS host
              FROM u
            ), g AS (
              SELECT host, COUNT(*) AS n_pages FROM h
              WHERE host <> '' GROUP BY host
            ), f AS (
              SELECT host, n_pages,
                     regexp_matches(host, '(^|[.])xn--') AS punycode,
                     regexp_matches(host, '"""
        + _SPOOF_MIXED_RE
        + """') AS mixed_script,
                     regexp_matches(host, '[^\\x00-\\x7f]') AS non_ascii
              FROM g
            )
            SELECT * FROM f
            WHERE punycode OR mixed_script OR non_ascii
            ORDER BY host
        """,
        # k_anon_classes: the audit IS a GROUP BY — replay it verbatim
        "k_anon_classes": """
            SELECT c_nationkey, c_mktsegment,
                   COUNT(*) AS class_size,
                   COUNT(DISTINCT c_acctbal) AS l_diversity,
                   COUNT(*) < 5 AS risky,
                   COUNT(DISTINCT c_acctbal) <= 1 AS homogeneous
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
            ORDER BY c_nationkey, c_mktsegment
        """,
        # k_anon_gate: fold the class table to the one-row release gate;
        # micro ratio is exact integer floor division
        "k_anon_gate": """
            WITH cls AS (
              SELECT COUNT(*) AS class_size,
                     COUNT(DISTINCT c_acctbal) AS l_diversity
              FROM customer
              GROUP BY c_nationkey, c_mktsegment
            )
            SELECT CAST(COALESCE(SUM(class_size), 0) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_classes,
                   MIN(class_size) AS min_k,
                   CAST(COALESCE(SUM(CASE WHEN class_size < 5
                                          THEN class_size ELSE 0 END), 0)
                        AS BIGINT) AS rows_below_k,
                   MIN(l_diversity) AS min_l,
                   CAST(COALESCE(SUM(CASE WHEN l_diversity <= 1
                                          THEN class_size ELSE 0 END), 0)
                        AS BIGINT) AS rows_homogeneous,
                   CASE WHEN CAST(COALESCE(SUM(class_size), 0) AS BIGINT) > 0
                        THEN (1000000 * CAST(COALESCE(SUM(CASE WHEN class_size < 5
                                   THEN class_size ELSE 0 END), 0) AS BIGINT))
                             // CAST(SUM(class_size) AS BIGINT)
                   END AS pct_below_k_micro
            FROM cls
        """,
        # suggest_constraints: replay the suggestion rules per column
        # (NOT_NULL / COMPLETENESS_GE / UNIQUE / RANGE / IN_SET) from one
        # stats CTE — conditions mirror operators/constraints.py exactly
        "suggest_constraints": """
            WITH s AS (
              SELECT COUNT(*) AS n,
                     COUNT(n_nationkey) AS k_nn, COUNT(DISTINCT n_nationkey) AS k_nd,
                     CAST(MIN(n_nationkey) AS VARCHAR) AS k_min,
                     CAST(MAX(n_nationkey) AS VARCHAR) AS k_max,
                     COUNT(n_name) AS nm_nn, COUNT(DISTINCT n_name) AS nm_nd,
                     MIN(length(n_name)) AS nm_lmin, MAX(length(n_name)) AS nm_lmax,
                     COUNT(n_regionkey) AS r_nn, COUNT(DISTINCT n_regionkey) AS r_nd,
                     CAST(MIN(n_regionkey) AS VARCHAR) AS r_min,
                     CAST(MAX(n_regionkey) AS VARCHAR) AS r_max,
                     array_to_string(list_sort(list(DISTINCT CAST(n_regionkey AS VARCHAR))), ',') AS r_set
              FROM nation
            )
            SELECT * FROM (
              SELECT 'n_nationkey' AS "column", 'NOT_NULL' AS "constraint", '' AS detail
                FROM s WHERE n > 0 AND k_nn = n
              UNION ALL SELECT 'n_nationkey', 'COMPLETENESS_GE', printf('%.6f', ROUND(k_nn * 1.0 / n, 6))
                FROM s WHERE n > 0 AND k_nn < n
              UNION ALL SELECT 'n_nationkey', 'UNIQUE', '' FROM s WHERE k_nn > 0 AND k_nd = k_nn
              UNION ALL SELECT 'n_nationkey', 'RANGE', k_min || '..' || k_max FROM s WHERE k_nn > 0
              UNION ALL SELECT 'n_name', 'NOT_NULL', '' FROM s WHERE n > 0 AND nm_nn = n
              UNION ALL SELECT 'n_name', 'COMPLETENESS_GE', printf('%.6f', ROUND(nm_nn * 1.0 / n, 6))
                FROM s WHERE n > 0 AND nm_nn < n
              UNION ALL SELECT 'n_name', 'UNIQUE', '' FROM s WHERE nm_nn > 0 AND nm_nd = nm_nn
              UNION ALL SELECT 'n_name', 'LENGTH_BETWEEN', nm_lmin || '..' || nm_lmax
                FROM s WHERE nm_nn > 0
              UNION ALL SELECT 'n_regionkey', 'NOT_NULL', '' FROM s WHERE n > 0 AND r_nn = n
              UNION ALL SELECT 'n_regionkey', 'COMPLETENESS_GE', printf('%.6f', ROUND(r_nn * 1.0 / n, 6))
                FROM s WHERE n > 0 AND r_nn < n
              UNION ALL SELECT 'n_regionkey', 'UNIQUE', '' FROM s WHERE r_nn > 0 AND r_nd = r_nn
              UNION ALL SELECT 'n_regionkey', 'RANGE', r_min || '..' || r_max FROM s WHERE r_nn > 0
              UNION ALL SELECT 'n_regionkey', 'IN_SET', r_set
                FROM s WHERE r_nd BETWEEN 1 AND 10 AND r_nd < r_nn
            ) ORDER BY "column", "constraint"
        """,
        # dup_spans: the identical seed->diagonal->island algebra in SQL --
        # positional 8-grams (lower/trim/\s+ exactly as the Spark side),
        # occurrence-count stop-gram cap, islands via pos_a - row_number()
        "dup_spans": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
              FROM documents WHERE text IS NOT NULL
            ),
            g AS (
              SELECT doc_id, CAST(i AS INT) AS pos,
                     array_to_string(w[i:i + 7], ' ') AS gram
              FROM (
                SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
                FROM toks WHERE len(w) >= 8
              )
            ),
            eligible AS (
              SELECT gram FROM g GROUP BY gram
              HAVING COUNT(*) >= 2 AND COUNT(*) <= 1000
            ),
            ge AS (SELECT g.* FROM g JOIN eligible USING (gram)),
            seeds AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM ge a JOIN ge b USING (gram)
              WHERE a.doc_id < b.doc_id
            ),
            runs AS (
              SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
                     pos_a - ROW_NUMBER() OVER (
                       PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
                     ) AS island
              FROM seeds
            )
            SELECT doc_a, doc_b, MIN(pos_a) AS start_a, MIN(pos_b) AS start_b,
                   COUNT(*) + 7 AS n_tokens
            FROM runs GROUP BY doc_a, doc_b, diag, island
            HAVING COUNT(*) + 7 >= 16
            ORDER BY doc_a, doc_b, start_a, start_b
        """,
        # strip_spans: the removal half replayed end-to-end -- the same
        # span CTEs as dup_spans, then interval-union per doc_b (prev-hi
        # island trick, identical to the Spark window), positional token
        # rebuild via unnest + anti-semijoin on range membership, md5 over
        # the space-rejoined survivors
        "strip_spans": """
            WITH toks AS (
              SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
              FROM documents WHERE text IS NOT NULL
            ),
            g AS (
              SELECT doc_id, CAST(i AS INT) AS pos,
                     array_to_string(w[i:i + 7], ' ') AS gram
              FROM (
                SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i
                FROM toks WHERE len(w) >= 8
              )
            ),
            eligible AS (
              SELECT gram FROM g GROUP BY gram
              HAVING COUNT(*) >= 2 AND COUNT(*) <= 1000
            ),
            ge AS (SELECT g.* FROM g JOIN eligible USING (gram)),
            seeds AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.pos AS pos_a, b.pos AS pos_b
              FROM ge a JOIN ge b USING (gram)
              WHERE a.doc_id < b.doc_id
            ),
            runs AS (
              SELECT doc_a, doc_b, pos_a, pos_b, pos_a - pos_b AS diag,
                     pos_a - ROW_NUMBER() OVER (
                       PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
                     ) AS island
              FROM seeds
            ),
            spans AS (
              SELECT doc_b, MIN(pos_b) AS start_b, COUNT(*) + 7 AS n_tok
              FROM runs GROUP BY doc_a, doc_b, diag, island
              HAVING COUNT(*) + 7 >= 16
            ),
            rm0 AS (
              SELECT doc_b AS doc_id, start_b AS lo,
                     start_b + n_tok - 1 AS hi
              FROM spans
            ),
            isl AS (
              SELECT doc_id, lo, hi,
                     SUM(CASE WHEN prev_hi IS NULL OR lo > prev_hi
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY doc_id ORDER BY lo, hi
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS island
              FROM (
                SELECT doc_id, lo, hi,
                       MAX(hi) OVER (PARTITION BY doc_id ORDER BY lo, hi
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev_hi
                FROM rm0
              )
            ),
            ranges AS (
              SELECT doc_id, MIN(lo) AS lo, MAX(hi) AS hi
              FROM isl GROUP BY doc_id, island
            ),
            pos AS (
              SELECT doc_id, w[i] AS tok, i
              FROM (
                SELECT doc_id, w,
                       CAST(unnest(range(1, len(w) + 1)) AS BIGINT) AS i
                FROM toks
              )
            ),
            kept AS (
              SELECT p.doc_id, p.i, p.tok
              FROM pos p
              WHERE NOT EXISTS (
                SELECT 1 FROM ranges r
                WHERE r.doc_id = p.doc_id AND p.i BETWEEN r.lo AND r.hi
              )
            )
            SELECT t.doc_id,
                   CAST(len(t.w) AS INT) AS n_tokens,
                   CAST(len(t.w) - COUNT(k.i) AS INT) AS n_removed,
                   md5(COALESCE(string_agg(k.tok, ' ' ORDER BY k.i), ''))
                     AS clean_md5
            FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
            GROUP BY t.doc_id, len(t.w)
            ORDER BY t.doc_id
        """,
        # snapshot_churn: identical grain->full-outer-join algebra -- each
        # snapshot collapses to (key, MIN(md5(text)), COUNT(*)), the "new"
        # snapshot replays the same deterministic derivation, fingerprints
        # compare null-safe (IS NOT DISTINCT FROM <=> eqNullSafe)
        "snapshot_churn": """
            WITH old_g AS (
              SELECT doc_id AS key, MIN(md5(CAST(text AS VARCHAR))) AS fp,
                     COUNT(*) AS n
              FROM documents WHERE doc_id IS NOT NULL GROUP BY doc_id
            ),
            new_src AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END
                       AS text
              FROM documents WHERE doc_id % 10 <> 0
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents
              WHERE doc_id % 13 = 0
            ),
            new_g AS (
              SELECT doc_id AS key, MIN(md5(CAST(text AS VARCHAR))) AS fp,
                     COUNT(*) AS n
              FROM new_src WHERE doc_id IS NOT NULL GROUP BY doc_id
            )
            SELECT COALESCE(o.key, n.key) AS doc_id,
                   CASE WHEN o.key IS NULL THEN 'added'
                        WHEN n.key IS NULL THEN 'removed'
                        WHEN o.fp IS NOT DISTINCT FROM n.fp THEN 'unchanged'
                        ELSE 'changed' END AS status,
                   COALESCE(o.n, 0) AS n_old,
                   COALESCE(n.n, 0) AS n_new
            FROM old_g o FULL OUTER JOIN new_g n ON o.key = n.key
            ORDER BY doc_id
        """,
        # calibration: replay the md5 score/label construction, the
        # micro-unit quantization, and the integer binning
        "calibration": """
            WITH s AS (
              SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 1000 AS b1,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'y'), 1, 8))
                          AS BIGINT) % 100 AS by
              FROM documents
            ),
            r AS (
              -- DuckDB CAST(double AS BIGINT) ROUNDS; Spark's cast
              -- truncates — replay with explicit floor
              SELECT b1 / 1000.0 AS p,
                     CASE WHEN by < CAST(floor(b1 / 10) AS BIGINT)
                          THEN 1 ELSE 0 END AS y
              FROM s
            ),
            q AS (
              SELECT CAST(round(p * 1000000.0, 0) AS BIGINT) AS q, y FROM r
            ),
            b AS (
              SELECT LEAST(GREATEST(CAST(floor(q * 10 / 1000000) AS BIGINT), 0), 9)
                       AS bin, q, y
              FROM q
            )
            SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                   round(CAST(SUM(q) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
                     AS mean_pred,
                   round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos
            FROM b GROUP BY bin ORDER BY bin
        """,
        # zipf_fit: same tokenization, top-k cut, rank-sorted folds, and
        # closed-form OLS operation order
        "zipf_fit": r"""
            WITH terms AS (
              SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                       AS term
              FROM documents
            ),
            t2 AS (SELECT term FROM terms WHERE term <> ''),
            counts AS (SELECT term, COUNT(*) AS n FROM t2 GROUP BY term),
            top AS (
              SELECT term, n FROM counts ORDER BY n DESC, term LIMIT 500
            ),
            ranked AS (
              SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, term) AS rank
              FROM top
            ),
            xy AS (
              SELECT rank, ln(CAST(rank AS DOUBLE)) AS x,
                     ln(CAST(n AS DOUBLE)) AS y
              FROM ranked
            ),
            one AS (
              SELECT list_sort(list(struct_pack(rank := rank, x := x, y := y)))
                       AS g
              FROM xy
            ),
            sums AS (
              SELECT CAST(len(g) AS BIGINT) AS k_int,
                     CAST(len(g) AS DOUBLE) AS k,
                     list_reduce(list_transform(g, s -> s.x), (a, b) -> a + b) + 0.0 AS sx,
                     list_reduce(list_transform(g, s -> s.y), (a, b) -> a + b) + 0.0 AS sy,
                     list_reduce(list_transform(g, s -> s.x * s.y), (a, b) -> a + b) + 0.0 AS sxy,
                     list_reduce(list_transform(g, s -> s.x * s.x), (a, b) -> a + b) + 0.0 AS sxx,
                     list_reduce(list_transform(g, s -> s.y * s.y), (a, b) -> a + b) + 0.0 AS syy
              FROM one
            ),
            vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_terms FROM counts)
            SELECT v.n_terms, s.k_int AS k,
                   CASE WHEN s.k_int >= 2 THEN
                     round((s.k * s.sxy - s.sx * s.sy)
                           / (s.k * s.sxx - s.sx * s.sx), 6) END AS slope,
                   CASE WHEN s.k_int >= 2 THEN
                     round((s.sy - ((s.k * s.sxy - s.sx * s.sy)
                                    / (s.k * s.sxx - s.sx * s.sx)) * s.sx)
                           / s.k, 6) END AS intercept,
                   CASE WHEN s.k_int >= 2 THEN
                     round(((s.k * s.sxy - s.sx * s.sy) * (s.k * s.sxy - s.sx * s.sy))
                           / ((s.k * s.sxx - s.sx * s.sx) * (s.k * s.syy - s.sy * s.sy)),
                           6) END AS r2
            FROM vocab v, sums s
        """,
        # host_lang_mismatch: same count-table algebra — one (group,
        # value) agg, window total + deterministic argmax, minority join
        "host_lang_mismatch": """
            WITH counts AS (
              SELECT source AS "group", CAST(lang AS VARCHAR) AS value,
                     COUNT(*) AS n
              FROM documents WHERE lang IS NOT NULL GROUP BY 1, 2
            ),
            r AS (
              SELECT *, CAST(SUM(n) OVER (PARTITION BY "group") AS BIGINT)
                          AS n_group,
                     ROW_NUMBER() OVER (PARTITION BY "group"
                                        ORDER BY n DESC, value ASC) AS rn
              FROM counts
            ),
            maj AS (
              SELECT "group", value AS majority_value, n AS n_majority
              FROM r WHERE rn = 1
            )
            SELECT r."group", r.value, r.n,
                   m.majority_value, m.n_majority, r.n_group
            FROM r JOIN maj m ON r."group" = m."group"
            WHERE r.rn > 1 AND r.n_group >= 5
            ORDER BY 1, 2
        """,
        # apply_changeset: replay the changeset construction, then the
        # merge algebra — survivors (NOT EXISTS) ∪ upsert rows
        "apply_changeset": """
            WITH changes AS (
              SELECT doc_id, text, lang, source, n_chars, 'delete' AS op
              FROM documents WHERE doc_id % 11 = 0
              UNION ALL
              SELECT doc_id, text, lang, 'patched', n_chars + 1, 'upsert'
              FROM documents WHERE doc_id % 11 <> 0 AND doc_id % 7 = 0
              UNION ALL
              SELECT doc_id + 100000, text, lang, 'inserted', n_chars, 'upsert'
              FROM documents WHERE doc_id % 13 = 0
            )
            SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM changes c WHERE c.doc_id = d.doc_id)
            UNION ALL
            SELECT doc_id, text, lang, source, n_chars
            FROM changes WHERE op = 'upsert'
            ORDER BY doc_id
        """,
        # script_census: counts from the SAME SCRIPT_RANGES dict (rendered
        # as RE2 \x{hex} classes); dominant via list_max over (n, name)
        # structs == Spark's array_max tie-break; all-integer, so bit-exact
        "script_census": f"""
            WITH d AS (
              SELECT doc_id,
                     concat(COALESCE(text, ''),
                       CASE doc_id % 6
                         WHEN 1 THEN ' привет мир'
                         WHEN 2 THEN ' 中文网页测试'
                         WHEN 3 THEN ' مرحبا بالعالم'
                         WHEN 4 THEN ' γεια σου κοσμε'
                         WHEN 5 THEN ' 안녕하세요 세계'
                         ELSE '' END) AS t
              FROM documents
            ),
            c AS (
              SELECT doc_id,
              {script_count_exprs}
              FROM d
            ),
            m AS (SELECT *, list_max([{script_dom_list}]) AS mx FROM c)
            SELECT doc_id, {script_out_cols},
                   CASE WHEN mx['n'] > 0 THEN mx['s'] ELSE 'und' END
                     AS dominant
            FROM m ORDER BY doc_id
        """,
        # entropy_mi: identical integer group counts, then the identical
        # value-sorted left fold (list_sort + list_reduce == sort_array +
        # aggregate-with-0.0-init; trailing +0.0 normalizes -0.0) — the
        # floats hash-check because the op ORDER matches, not by tolerance
        "entropy_mi": """
            WITH el AS (
              SELECT CAST(lang AS VARCHAR) AS v, COUNT(*) AS c
              FROM documents WHERE lang IS NOT NULL GROUP BY 1
            ),
            el1 AS (
              SELECT list_sort(list(struct_pack(v := v, c := c))) AS g,
                     CAST(SUM(c) AS BIGINT) AS n
              FROM el
            ),
            es AS (
              SELECT CAST(source AS VARCHAR) AS v, COUNT(*) AS c
              FROM documents WHERE source IS NOT NULL GROUP BY 1
            ),
            es1 AS (
              SELECT list_sort(list(struct_pack(v := v, c := c))) AS g,
                     CAST(SUM(c) AS BIGINT) AS n
              FROM es
            ),
            j AS (
              SELECT CAST(lang AS VARCHAR) AS vx, CAST(source AS VARCHAR) AS vy,
                     COUNT(*) AS cxy
              FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL
              GROUP BY 1, 2
            ),
            jm AS (
              SELECT vx, vy, cxy,
                     CAST(SUM(cxy) OVER (PARTITION BY vx) AS BIGINT) AS cx,
                     CAST(SUM(cxy) OVER (PARTITION BY vy) AS BIGINT) AS cy
              FROM j
            ),
            j1 AS (
              SELECT list_sort(list(struct_pack(
                       vx := vx, vy := vy, cxy := cxy, cx := cx, cy := cy
                     ))) AS g,
                     CAST(SUM(cxy) AS BIGINT) AS n
              FROM jm
            )
            SELECT * FROM (
              SELECT 'entropy' AS analyzer, 'lang' AS "column", n AS n_rows,
                     CAST(len(g) AS BIGINT) AS n_groups,
                     round(list_reduce(list_transform(g, s ->
                       -(CAST(s.c AS DOUBLE) / CAST(n AS DOUBLE))
                       * ln(CAST(s.c AS DOUBLE) / CAST(n AS DOUBLE))),
                       (a, x) -> a + x) + 0.0, 6) AS value
              FROM el1
              UNION ALL
              SELECT 'entropy', 'source', n, CAST(len(g) AS BIGINT),
                     round(list_reduce(list_transform(g, s ->
                       -(CAST(s.c AS DOUBLE) / CAST(n AS DOUBLE))
                       * ln(CAST(s.c AS DOUBLE) / CAST(n AS DOUBLE))),
                       (a, x) -> a + x) + 0.0, 6)
              FROM es1
              UNION ALL
              SELECT 'mutual_information', 'lang|source', n,
                     CAST(len(g) AS BIGINT),
                     round(list_reduce(list_transform(g, s ->
                       (CAST(s.cxy AS DOUBLE) / CAST(n AS DOUBLE))
                       * ln((CAST(s.cxy AS DOUBLE) * CAST(n AS DOUBLE))
                            / (CAST(s.cx AS DOUBLE) * CAST(s.cy AS DOUBLE)))),
                       (a, x) -> a + x) + 0.0, 6)
              FROM j1
            ) ORDER BY analyzer, "column"
        """,
        # cosine_dup_pairs_det: the identical det-LSH bucket algebra the
        # ann_recall oracle pins (floor-quantized ints, LCG Rademacher
        # planes), bucket equi-join with the <=1000 size cap, exact cosine
        # round(.,6) threshold then round(.,4) output like cosine_dup_pairs
        "cosine_dup_pairs_det": """
            WITH qv AS (
              SELECT vec_id, embedding,
                     [CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) for x in embedding] AS q
              FROM embeddings
            ),
            buck AS (
              SELECT vec_id, embedding,
                     list_sum([
                       CASE WHEN list_sum([
                         q[d + 1] * (CASE WHEN ((b * 10007 + d + 1) * 1103515245 + 12345) % 2147483648 >= 1073741824 THEN 1 ELSE -1 END)
                         for d in range(64)]) > 0
                       THEN 1 << b ELSE 0 END
                       for b in range(4)]) AS bucket
              FROM qv
            ),
            ok AS (
              SELECT bucket FROM buck GROUP BY bucket HAVING COUNT(*) <= 1000
            ),
            kept AS (SELECT buck.* FROM buck JOIN ok USING (bucket))
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
                   round(round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6), 4) AS cosine
            FROM kept a JOIN kept b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
            ORDER BY doc_a, doc_b
        """,
        # weighted_sample: the identical A-ES draw — u from the md5 prefix
        # ('0x'||hex cast, the hash_sample idiom), key = round(u^(1/w), 9),
        # id tie-break so libm pow ulps can't flip the top-k cut
        "weighted_sample": """
            WITH keyed AS (
              SELECT doc_id, n_chars,
                     round(pow(
                       (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                         / 4294967296.0,
                       1.0 / CAST(n_chars AS DOUBLE)), 9) AS sample_key
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0
            )
            SELECT doc_id, n_chars, sample_key FROM keyed
            ORDER BY sample_key DESC, doc_id LIMIT 50
        """,
        # edit_dup_pairs: same candidate CTE as the Jaccard family at the
        # 0.3 bar, then DuckDB's levenshtein == Spark's (classic DP, integer)
        "edit_dup_pairs": """
            WITH sh AS (
              SELECT doc_id, text,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), cand AS (
              SELECT doc_a, doc_b FROM inter
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
              WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.3
            )
            SELECT doc_a, doc_b,
                   round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                         / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE), 6) AS edit_sim
            FROM cand JOIN sh a ON a.doc_id = cand.doc_a
                      JOIN sh b ON b.doc_id = cand.doc_b
            WHERE round(1.0 - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                        / CAST(greatest(length(a.text), length(b.text)) AS DOUBLE), 6) >= 0.95
            ORDER BY doc_a, doc_b
        """,
        "lang_heavy_hitters": r"""
            SELECT lang, tok AS value, count(*) AS n
            FROM (
              SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
              FROM documents WHERE text IS NOT NULL
            )
            WHERE tok <> ''
            GROUP BY lang, tok HAVING count(*) >= 30
            ORDER BY lang, value
        """,
        # json_rules: json_extract_string == get_json_object (both unquote
        # scalars), TRY_CAST == try_cast; verdict rows replayed via UNION ALL
        "json_rules": """
            WITH s AS (
              SELECT
                count(CASE WHEN props IS NOT NULL
                           AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NULL
                      THEN 1 END) AS v_k,
                count(CASE WHEN props IS NOT NULL
                           AND TRY_CAST(json_extract_string(props, '$.missing') AS BIGINT) IS NULL
                      THEN 1 END) AS v_miss,
                count(CASE WHEN props IS NOT NULL
                           AND TRY_CAST(json_extract_string(props, '$.k') AS TIMESTAMP) IS NULL
                      THEN 1 END) AS v_ts
              FROM events
            )
            SELECT * FROM (
              SELECT 'props' AS "column", 'JSON_KEY' AS "constraint",
                     '$.k:BIGINT' AS detail, v_k AS n_violations, v_k = 0 AS passed
              FROM s
              UNION ALL
              SELECT 'props', 'JSON_KEY', '$.k:TIMESTAMP', v_ts, v_ts = 0 FROM s
              UNION ALL
              SELECT 'props', 'JSON_KEY', '$.missing:BIGINT', v_miss, v_miss = 0 FROM s
            )
            ORDER BY "column", "constraint", detail
        """,
        # audio_hash_exact: hand-derived envelope signatures as literals
        # (130 samples, 2/window: each window mean and comparison bit is
        # arithmetic on the class definition, not code output); pair set
        # is exact bit_count(xor) algebra; half-gain class E shares A's
        # signature, pinning gain invariance in the oracle
        "audio_hash_exact": """
            WITH s AS (
              SELECT doc_id, CASE doc_id % 5
                WHEN 0 THEN CAST(-6148914691236517206 AS BIGINT)
                WHEN 1 THEN CAST(6148914691236517205 AS BIGINT)
                WHEN 2 THEN CAST(0 AS BIGINT)
                WHEN 3 THEN CAST(-1 AS BIGINT)
                ELSE CAST(-6148914691236517206 AS BIGINT) END AS sig
              FROM documents WHERE doc_id < 200 AND doc_id % 41 <> 3
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 4
            ORDER BY doc_a, doc_b
        """,
        # image_dhash_exact: 2x2 constructed PPMs — the dHash of a 2x2
        # image reduces to two gradient bits (cols 4.. of the 9x8
        # resample), so each class's 64-bit signature is a hand-derived
        # literal and the pair set is exact bit_count(xor) algebra
        "image_dhash_exact": """
            WITH s AS (
              SELECT doc_id,
                     CASE doc_id % 4
                       WHEN 0 THEN 1157442765409226768
                       WHEN 1 THEN 269488144
                       WHEN 2 THEN 1157442765139738624
                       ELSE 0 END AS sig
              FROM documents
              WHERE doc_id < 200 AND doc_id % 31 <> 5
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sig, b.sig)) <= 4
            ORDER BY doc_a, doc_b
        """,
        # dwca_star_check: the fixture archive is deterministic bytes
        # (scripts/make_dwca_fixtures.py), so the expected star-referential
        # violations are a fixed literal — 'NULL' is the empty-key sentinel
        # string the violations schema uses, not SQL NULL
        "dwca_star_check": """
            SELECT * FROM (VALUES
              ('NULL', 'KEY_EMPTY', 'non-empty id', 'NULL', 'ext:Identification'),
              ('ZZ', 'RECORD_REFERENTIAL_INTEGRITY_VIOLATION', 'id present in core.id', 'ZZ', 'ext:Identification'),
              ('1', 'RECORD_REFERENTIAL_INTEGRITY_VIOLATION', 'id present in core.id', '1', 'ext:Identifier'),
              ('2', 'RECORD_REFERENTIAL_INTEGRITY_VIOLATION', 'id present in core.id', '2', 'ext:Identifier')
            ) AS t(url, check_id, expected, found, partition_id)
            ORDER BY partition_id, check_id, url
        """,
        # dwca_record_checks: deterministic interpretation.zip fixture →
        # the planted per-record interpretation violations are a fixed
        # literal (one class per row; r12 hits both elevation columns)
        "dwca_record_checks": """
            SELECT * FROM (VALUES
              ('r02', 'RECORDED_DATE_INVALID', 'parseable date', '12 Floreal X'),
              ('r03', 'RECORDED_DATE_UNLIKELY', 'date in [1600-01-01, 2030-12-31]', '1492-10-12'),
              ('r04', 'PRESUMED_SWAPPED_COORDINATE', 'lat in ±90, lon in ±180', '91.5,12.0'),
              ('r05', 'COORDINATE_INVALID', 'numeric decimal degrees', 'abc,12.0'),
              ('r06', 'ZERO_COORDINATE', 'non-(0,0) coordinate', '0,0'),
              ('r07', 'COORDINATE_OUT_OF_RANGE', 'lat in ±90, lon in ±180', '200,12.0'),
              ('r08', 'BASIS_OF_RECORD_INVALID', 'BasisOfRecord vocabulary', 'FlyingSaucer'),
              ('r09', 'COUNTRY_INVALID', 'ISO 3166-1 alpha-2 code', 'XX'),
              ('r10', 'ELEVATION_NON_NUMERIC', 'numeric meters', 'high'),
              ('r11', 'ELEVATION_MIN_MAX_SWAPPED', 'min <= max', '500/100'),
              ('r12', 'ELEVATION_UNLIKELY', 'meters in [-430.0, 8850.0]', '9999'),
              ('r12', 'ELEVATION_UNLIKELY', 'meters in [-430.0, 8850.0]', '9999'),
              ('r13', 'COLUMN_MISMATCH', '9', '10'),
              ('r14', 'COLUMN_MISMATCH', '9', '6')
            ) AS t(url, check_id, expected, found)
            CROSS JOIN (VALUES ('core:Occurrence')) AS p(partition_id)
            ORDER BY url, check_id, found
        """,
        # dwca_event_registry: fixture archives are deterministic bytes,
        # so the registry battery's findings are a fixed literal — the
        # one planted required-term miss; 'rowtype' is the full URI
        "dwca_event_registry": """
            SELECT * FROM (VALUES
              ('event-core-issues.zip', 'REQUIRED_TERM_MISSING',
               'http://rs.tdwg.org/dwc/terms/MeasurementOrFact',
               'measurementType')
            ) AS t(archive, evaluation_type, rowtype, term)
            ORDER BY archive, evaluation_type, term
        """,
        # jpeg_progressive_check: payloads are fixed hex literals, so the
        # expected findings are pure residue arithmetic; k=0 rows are
        # silent, k=2's decode-error message is pinned verbatim
        "jpeg_progressive_check": """
            SELECT doc_id,
                   CASE WHEN doc_id % 4 = 2 THEN 'MEDIA_DECODE_ERROR'
                        ELSE 'MEDIA_DIMS_MISMATCH' END AS check_id,
                   CASE WHEN doc_id % 4 = 2 THEN 'decodable jpeg'
                        ELSE '4x4' END AS expected,
                   CASE WHEN doc_id % 4 = 2 THEN 'jpeg: no scan data'
                        ELSE '8x8' END AS found
            FROM documents
            WHERE doc_id < 2000 AND doc_id % 4 IN (1, 2, 3)
            ORDER BY doc_id
        """,
        # psi_drift: identical floor-bucket math, round-6 + eps-floored
        # proportions, and the list_sort+list_reduce ordered fold
        "psi_drift": """
            WITH rb AS (
              SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
                          WHEN CAST(value AS DOUBLE) >= 500.0 THEN 11
                          ELSE CAST(floor(CAST(value AS DOUBLE) / 50.0) AS BIGINT) + 1 END AS bucket,
                     count(*) AS n_ref
              FROM events
              WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16 00:00:00'
              GROUP BY 1
            ), cb AS (
              SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
                          WHEN CAST(value AS DOUBLE) >= 500.0 THEN 11
                          ELSE CAST(floor(CAST(value AS DOUBLE) / 50.0) AS BIGINT) + 1 END AS bucket,
                     count(*) AS n_cur
              FROM events
              WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16 00:00:00'
              GROUP BY 1
            ), m AS (
              SELECT coalesce(rb.bucket, cb.bucket) AS bucket,
                     coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
              FROM rb FULL OUTER JOIN cb ON rb.bucket = cb.bucket
            ), t AS (
              SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
                     CAST(sum(n_cur) AS BIGINT) AS tc FROM m
            ), s2 AS (
              SELECT bucket, n_ref, n_cur,
                     greatest(round(CAST(n_ref AS DOUBLE) / tr, 6), 1e-6) AS p_ref,
                     greatest(round(CAST(n_cur AS DOUBLE) / tc, 6), 1e-6) AS p_cur
              FROM m, t
            ), s3 AS (
              SELECT *, round((p_ref - p_cur) * ln(p_ref / p_cur), 6) AS term FROM s2
            ), tot AS (
              SELECT round(list_reduce(list_sort(list(term)), (a, x) -> a + x) + 0.0, 6) AS psi
              FROM s3
            )
            SELECT bucket, n_ref, n_cur, p_ref, p_cur, term, psi
            FROM s3, tot ORDER BY bucket
        """,
        # emd_drift: dense bucket spine, exact-integer window cumsums, one
        # rounded double op per term, list_sort+list_reduce ordered fold
        "emd_drift": """
            WITH spine AS (
              SELECT CAST(range AS BIGINT) AS bucket FROM range(0, 12)
            ), rb AS (
              SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
                          WHEN CAST(value AS DOUBLE) >= 500.0 THEN 11
                          ELSE CAST(floor(CAST(value AS DOUBLE) / 50.0) AS BIGINT) + 1 END AS bucket,
                     count(*) AS n_ref
              FROM events
              WHERE value IS NOT NULL AND ts < TIMESTAMP '2024-01-16 00:00:00'
              GROUP BY 1
            ), cb AS (
              SELECT CASE WHEN CAST(value AS DOUBLE) < 0.0 THEN 0
                          WHEN CAST(value AS DOUBLE) >= 500.0 THEN 11
                          ELSE CAST(floor(CAST(value AS DOUBLE) / 50.0) AS BIGINT) + 1 END AS bucket,
                     count(*) AS n_cur
              FROM events
              WHERE value IS NOT NULL AND ts >= TIMESTAMP '2024-01-16 00:00:00'
              GROUP BY 1
            ), m AS (
              SELECT spine.bucket,
                     coalesce(n_ref, 0) AS n_ref, coalesce(n_cur, 0) AS n_cur
              FROM spine
              LEFT JOIN rb ON spine.bucket = rb.bucket
              LEFT JOIN cb ON spine.bucket = cb.bucket
            ), c AS (
              SELECT bucket, n_ref, n_cur,
                     CAST(sum(n_ref) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ref,
                     CAST(sum(n_cur) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cur
              FROM m
            ), t AS (
              SELECT CAST(sum(n_ref) AS BIGINT) AS tr,
                     CAST(sum(n_cur) AS BIGINT) AS tc FROM m
            ), s3 AS (
              SELECT bucket, n_ref, n_cur, cum_ref, cum_cur,
                     round(abs(CAST(cum_ref AS DOUBLE) / tr
                               - CAST(cum_cur AS DOUBLE) / tc) * 50.0, 6) AS term
              FROM c, t
            ), tot AS (
              SELECT round(list_reduce(list_sort(list(term)), (a, x) -> a + x) + 0.0, 6) AS emd
              FROM s3
            )
            SELECT bucket, n_ref, n_cur, cum_ref, cum_cur, term, emd
            FROM s3, tot ORDER BY bucket
        """,
        "join_audit": """
            WITH l AS (
              SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS n_left
              FROM events WHERE user_id IS NOT NULL GROUP BY 1
            ), r AS (
              SELECT CAST(o_custkey AS VARCHAR) AS key, count(*) AS n_right
              FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1
            ), m AS (
              SELECT key, n_left, n_right, n_left * n_right AS n_out
              FROM l JOIN r USING (key)
            ), t AS (
              SELECT CAST(sum(n_out) AS BIGINT) AS total_out FROM m
            )
            SELECT key, n_left, n_right, n_out, total_out,
                   round(CAST(n_out AS DOUBLE) / total_out, 6) AS share
            FROM m, t
            ORDER BY n_out DESC, key LIMIT 10
        """,
        "group_quantiles": """
            SELECT source, count(CAST(n_chars AS DOUBLE)) AS n,
                   round(quantile_cont(CAST(n_chars AS DOUBLE), 0.25), 6) AS q25,
                   round(quantile_cont(CAST(n_chars AS DOUBLE), 0.50), 6) AS q50,
                   round(quantile_cont(CAST(n_chars AS DOUBLE), 0.75), 6) AS q75
            FROM documents GROUP BY source ORDER BY source
        """,
        # mad_outliers: the ROUNDED center feeds the MAD so both engines
        # measure deviations from the identical quantized median
        "mad_outliers": """
            WITH med AS (
              SELECT round(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS center
              FROM events
            ),
            spread AS (
              SELECT center,
                     round(3.0 * 1.4826 * round(
                       quantile_cont(abs(CAST(value AS DOUBLE) - center), 0.5), 6
                     ), 6) AS spread
              FROM events, med GROUP BY center
            )
            SELECT event_id, value, center, spread
            FROM events, spread
            WHERE abs(CAST(value AS DOUBLE) - center) > spread
            ORDER BY event_id
        """,
        # quality_survivors: the dedup_clusters recursive-CTE reachability
        # plus per-cluster argmax(quality, -doc_id) via max(struct_pack);
        # survivors = everything except non-winning cluster members
        "quality_survivors": f"""
            WITH RECURSIVE sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), p AS (
              SELECT doc_a, doc_b
              FROM inter
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
              WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
            ), e AS (
              SELECT doc_a AS a, doc_b AS b FROM p
              UNION
              SELECT doc_b, doc_a FROM p
            ), reach AS (
              SELECT a AS id, a AS r FROM e
              UNION
              SELECT e.a, reach.r FROM e JOIN reach ON reach.id = e.b
            ), comp AS (
              SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
            ), q AS (
              SELECT doc_id, {quality} AS quality FROM documents
            ), member AS (
              SELECT comp.doc_id, comp.cluster_id, q.quality
              FROM comp JOIN q USING (doc_id)
            ), best AS (
              SELECT cluster_id,
                     max(struct_pack(s := quality, nid := -doc_id)) AS b
              FROM member GROUP BY cluster_id
            ), winners AS (
              SELECT -struct_extract(b, 'nid') AS doc_id FROM best
            ), losers AS (
              SELECT doc_id FROM member
              WHERE doc_id NOT IN (SELECT doc_id FROM winners)
            )
            SELECT doc_id, lang, source FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM losers)
            ORDER BY doc_id
        """,
        # salted_join_rollup: salting is invisible to the result — the
        # oracle is the plain join + rollup
        "salted_join_rollup": """
            SELECT c_nationkey, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        # grouped_constraints: per-source conditional aggregates unpivoted
        # via UNION ALL, one verdict row per (source, rule); quantile_cont
        # matches Spark's exact percentile (25 rows/group → an exact order
        # statistic, no interpolation), and only the boolean verdict is
        # emitted so the comparison is float-free
        "grouped_constraints": """
            WITH s AS (
              SELECT source,
                     count(*) AS n,
                     count(doc_id) - count(DISTINCT doc_id) AS v_unique,
                     count(CASE WHEN lang IS NOT NULL
                                AND lang NOT IN ('en','de','fr') THEN 1 END) AS v_inset,
                     count(CASE WHEN n_chars IS NOT NULL
                                AND (n_chars < 60 OR n_chars > 600) THEN 1 END) AS v_range,
                     count(CASE WHEN text IS NULL THEN 1 END) AS v_comp,
                     count(text) AS nn_text,
                     quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS q_med
              FROM documents GROUP BY source
            )
            SELECT * FROM (
              SELECT source, 'doc_id' AS "column", 'UNIQUE' AS "constraint",
                     '' AS detail, v_unique AS n_violations, v_unique = 0 AS passed
              FROM s
              UNION ALL
              SELECT source, 'lang', 'IN_SET', 'en,de,fr', v_inset, v_inset = 0 FROM s
              UNION ALL
              SELECT source, 'n_chars', 'RANGE', '60..600', v_range, v_range = 0 FROM s
              UNION ALL
              SELECT source, 'text', 'COMPLETENESS_GE', '0.9', v_comp,
                     round(CAST(nn_text AS DOUBLE) / n, 6) >= 0.9 FROM s
              UNION ALL
              SELECT source, 'n_chars', 'QUANTILE_BETWEEN', '0.5:250..400',
                     CAST(CASE WHEN q_med IS NULL
                               OR (q_med >= 250.0 AND q_med <= 400.0)
                          THEN 0 ELSE 1 END AS BIGINT),
                     q_med IS NULL OR (q_med >= 250.0 AND q_med <= 400.0) FROM s
            )
            ORDER BY source, "column", "constraint"
        """,
        # heavy_hitters: the bucket pruning is invisible to the result by
        # the exactness theorem (final filter is on exact per-value counts),
        # so the oracle is the plain GROUP BY ... HAVING census
        "heavy_hitters": r"""
            SELECT tok AS value, count(*) AS n
            FROM (
              SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
              FROM documents WHERE text IS NOT NULL
            )
            WHERE tok <> ''
            GROUP BY tok HAVING count(*) >= 50
            ORDER BY value
        """,
        # verify_constraints: per-rule conditional-aggregate replay over
        # nation + the same planted bad row; COMPLETENESS_GE passes on the
        # rounded ratio while still reporting its null as a violation count
        "verify_constraints": """
            WITH t AS (
              SELECT n_nationkey, n_name, n_regionkey FROM nation
              UNION ALL
              SELECT 0, NULL, 99
            ),
            s AS (
              SELECT COUNT(*) AS n,
                     COUNT(CASE WHEN n_nationkey IS NULL THEN 1 END) AS nk_nulls,
                     COUNT(CASE WHEN n_nationkey IS NOT NULL
                                AND (n_nationkey < 0 OR n_nationkey > 24) THEN 1 END) AS nk_range,
                     COUNT(n_nationkey) - COUNT(DISTINCT n_nationkey) AS nk_dups,
                     COUNT(CASE WHEN n_name IS NULL THEN 1 END) AS nm_nulls,
                     COUNT(n_name) AS nm_nn,
                     COUNT(n_name) - COUNT(DISTINCT n_name) AS nm_dups,
                     COUNT(CASE WHEN n_regionkey IS NULL THEN 1 END) AS rk_nulls,
                     COUNT(CASE WHEN n_regionkey IS NOT NULL
                                AND (n_regionkey < 0 OR n_regionkey > 4) THEN 1 END) AS rk_range,
                     COUNT(CASE WHEN n_regionkey IS NOT NULL
                                AND CAST(n_regionkey AS VARCHAR) NOT IN ('0','1','2','3','4') THEN 1 END) AS rk_inset,
                     COUNT(CASE WHEN n_name IS NOT NULL
                                AND (length(CAST(n_name AS VARCHAR)) < 5
                                     OR length(CAST(n_name AS VARCHAR)) > 25) THEN 1 END) AS nm_len,
                     COUNT(CASE WHEN n_regionkey IS NOT NULL
                                AND NOT regexp_matches(CAST(n_regionkey AS VARCHAR), '^[0-4]$') THEN 1 END) AS rk_match,
                     quantile_cont(CAST(n_nationkey AS DOUBLE), 0.5) AS nk_q50,
                     quantile_cont(CAST(n_regionkey AS DOUBLE), 1.0) AS rk_q100
              FROM t
            )
            SELECT * FROM (
              SELECT 'n_nationkey' AS "column", 'NOT_NULL' AS "constraint", '' AS detail,
                     nk_nulls AS n_violations, nk_nulls = 0 AS passed FROM s
              UNION ALL
              SELECT 'n_nationkey', 'QUANTILE_BETWEEN', '0.5:0..24',
                     CASE WHEN nk_q50 IS NULL OR nk_q50 BETWEEN 0 AND 24
                          THEN 0 ELSE 1 END,
                     nk_q50 IS NULL OR nk_q50 BETWEEN 0 AND 24 FROM s
              UNION ALL
              SELECT 'n_nationkey', 'RANGE', '0..24', nk_range, nk_range = 0 FROM s
              UNION ALL
              SELECT 'n_nationkey', 'UNIQUE', '', nk_dups, nk_dups = 0 FROM s
              UNION ALL
              SELECT 'n_name', 'COMPLETENESS_GE', '0.960000', nm_nulls,
                     ROUND(CAST(nm_nn AS DOUBLE) / n, 6) >= 0.96 FROM s
              UNION ALL
              SELECT 'n_name', 'LENGTH_BETWEEN', '5..25', nm_len, nm_len = 0 FROM s
              UNION ALL
              SELECT 'n_name', 'UNIQUE', '', nm_dups, nm_dups = 0 FROM s
              UNION ALL
              SELECT 'n_regionkey', 'IN_SET', '0,1,2,3,4', rk_inset, rk_inset = 0 FROM s
              UNION ALL
              SELECT 'n_regionkey', 'MATCHES', '^[0-4]$', rk_match, rk_match = 0 FROM s
              UNION ALL
              SELECT 'n_regionkey', 'NOT_NULL', '', rk_nulls, rk_nulls = 0 FROM s
              UNION ALL
              SELECT 'n_regionkey', 'QUANTILE_BETWEEN', '1.0:0..4',
                     CASE WHEN rk_q100 IS NULL OR rk_q100 BETWEEN 0 AND 4
                          THEN 0 ELSE 1 END,
                     rk_q100 IS NULL OR rk_q100 BETWEEN 0 AND 4 FROM s
              UNION ALL
              SELECT 'n_regionkey', 'RANGE', '0..4', rk_range, rk_range = 0 FROM s
            ) ORDER BY "column", "constraint", detail
        """,
        # benford_check: first [1-9] of the string form on both engines;
        # frac/expected/abs_dev all quantized round(.,6) identically
        "benford_check": """
            WITH d AS (
              SELECT regexp_extract(CAST(l_extendedprice AS VARCHAR), '[1-9]', 0) AS digit
              FROM lineitem WHERE l_extendedprice IS NOT NULL
            ),
            counted AS (
              SELECT digit, COUNT(*) AS n_rows FROM d WHERE digit <> '' GROUP BY digit
            )
            SELECT digit, n_rows,
                   ROUND(n_rows * 1.0 / SUM(n_rows) OVER (), 6) AS frac,
                   ROUND(log10(1 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected,
                   ROUND(ABS(ROUND(n_rows * 1.0 / SUM(n_rows) OVER (), 6)
                             - ROUND(log10(1 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6) AS abs_dev
            FROM counted ORDER BY digit
        """,
        # iqr_outliers: quantile_cont == Spark's exact percentile (linear
        # interpolation); fences rounded to 6 dp before the cut
        "iqr_outliers": """
            WITH s AS (
              SELECT quantile_cont(value, 0.25) AS q1,
                     quantile_cont(value, 0.75) AS q3
              FROM events
            ),
            b AS (
              SELECT ROUND(q1 - 1.5 * (q3 - q1), 6) AS lo,
                     ROUND(q3 + 1.5 * (q3 - q1), 6) AS hi
              FROM s
            )
            SELECT event_id, value, lo, hi
            FROM events, b
            WHERE value < lo OR value > hi
            ORDER BY event_id
        """,
        # url_canonical: the oracle STATES the expected canonical form per
        # constructed variant (lowercase host, default-port strip,
        # fragment strip, query sort + re-encode %20→+, malformed
        # passthrough), then replays the window dup count
        "url_canonical": """
            WITH built AS (
              SELECT doc_id,
                CASE CAST(doc_id % 5 AS INTEGER)
                  WHEN 0 THEN 'HTTP://WWW.Example.ORG:80/shared?b=2&a=1#f' || CAST(doc_id AS VARCHAR)
                  WHEN 1 THEN 'http://www.example.org/shared?a=1&b=2'
                  WHEN 2 THEN 'https://Example.org:443/p/' || CAST(doc_id AS VARCHAR)
                  WHEN 3 THEN 'https://example.org/q' || CAST(doc_id AS VARCHAR) || '?x=%20y'
                  ELSE 'not a url ' || CAST(doc_id AS VARCHAR)
                END AS url_in,
                CASE CAST(doc_id % 5 AS INTEGER)
                  WHEN 0 THEN 'http://www.example.org/shared?a=1&b=2'
                  WHEN 1 THEN 'http://www.example.org/shared?a=1&b=2'
                  WHEN 2 THEN 'https://example.org/p/' || CAST(doc_id AS VARCHAR)
                  WHEN 3 THEN 'https://example.org/q' || CAST(doc_id AS VARCHAR) || '?x=+y'
                  ELSE 'not a url ' || CAST(doc_id AS VARCHAR)
                END AS url_canon
              FROM documents
            )
            SELECT doc_id, url_in, url_canon,
                   COUNT(*) OVER (PARTITION BY url_canon) AS n_same_canon
            FROM built ORDER BY doc_id
        """,
        "warc_pages": """
            SELECT * FROM (VALUES
              ('https://warc.example/a', TIMESTAMP '2024-01-02 03:04:05', '<html><body><p>alpha page</p></body></html>', CAST(43 AS BIGINT)),
              ('https://warc.example/b', TIMESTAMP '2024-02-03 04:05:06', '<html><body><p>beta page</p></body></html>', CAST(42 AS BIGINT)),
              ('https://warc.example/c', TIMESTAMP '2024-03-04 05:06:07', '<p>gamma</p>', CAST(12 AS BIGINT))
            ) AS t(url, warc_ts, html_text, n_bytes)
            ORDER BY url
        """,
        "cdx_scan": """
            SELECT * FROM (VALUES
              ('index-00.cdxj', 'com,example)/', TIMESTAMP '2024-01-02 03:04:05', 'https://example.com/', 'text/html', CAST(200 AS INTEGER), 'AAAABBBB', CAST(1234 AS BIGINT), CAST(0 AS BIGINT), 'crawl-00.warc.gz', CAST(NULL AS VARCHAR)),
              ('index-00.cdxj', 'com,example)/about', TIMESTAMP '2024-01-02 03:04:06', 'https://example.com/about', 'text/html', CAST(301 AS INTEGER), 'CCCCDDDD', CAST(321 AS BIGINT), CAST(1234 AS BIGINT), 'crawl-00.warc.gz', CAST(NULL AS VARCHAR)),
              ('index-00.cdxj', CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), 'CDX_LINE_SHORT'),
              ('index-00.cdxj', CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), 'CDX_TS_INVALID'),
              ('index-01.cdxj', 'net,cdn)/asset', TIMESTAMP '2024-02-15 12:00:03', 'https://cdn.net/asset', 'image/png', CAST(200 AS INTEGER), '11112222', CAST(204800 AS BIGINT), CAST(4096 AS BIGINT), 'crawl-01.warc.gz', CAST(NULL AS VARCHAR)),
              ('index-01.cdxj', 'org,wiki)/page', TIMESTAMP '2024-02-15 12:00:00', 'https://wiki.org/page', 'text/plain', CAST(200 AS INTEGER), 'FFFF0000', CAST(77 AS BIGINT), CAST(99 AS BIGINT), 'crawl-01.warc.gz', CAST(NULL AS VARCHAR)),
              ('index-01.cdxj', CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), 'CDX_JSON_INVALID'),
              ('index-01.cdxj', CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), 'CDX_URL_MISSING')
            ) AS t(src_file, surt, capture_ts, url, mime, status, digest, length, "offset", filename, error)
            ORDER BY src_file, error, surt, capture_ts
        """,
        "fetch_plan": """
            WITH cap(filename, off, len) AS (VALUES
              ('crawl-00.warc.gz', CAST(0 AS BIGINT), CAST(1234 AS BIGINT)),
              ('crawl-00.warc.gz', CAST(1234 AS BIGINT), CAST(321 AS BIGINT)),
              ('crawl-01.warc.gz', CAST(99 AS BIGINT), CAST(77 AS BIGINT)),
              ('crawl-01.warc.gz', CAST(4096 AS BIGINT), CAST(204800 AS BIGINT))
            ),
            w AS (
              SELECT filename, off, len,
                     CASE WHEN lag(off + len) OVER
                              (PARTITION BY filename ORDER BY off, len) IS NULL
                            OR off > lag(off + len) OVER
                              (PARTITION BY filename ORDER BY off, len) + 1000
                          THEN 1 ELSE 0 END AS brk
              FROM cap
            ),
            r AS (
              SELECT filename, off, len,
                     SUM(brk) OVER (PARTITION BY filename ORDER BY off, len) AS rid
              FROM w
            )
            SELECT filename,
                   MIN(off) AS range_start,
                   MAX(off + len) AS range_end,
                   CAST(COUNT(*) AS BIGINT) AS n_captures,
                   MAX(off + len) - MIN(off) AS range_bytes
            FROM r GROUP BY filename, rid
            ORDER BY filename, range_start
        """,
        "cdx_violations": """
            SELECT * FROM (VALUES
              (CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'CDX_JSON_INVALID', CAST(NULL AS VARCHAR)),
              (CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'CDX_LINE_SHORT', CAST(NULL AS VARCHAR)),
              (CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'CDX_TS_INVALID', CAST(NULL AS VARCHAR)),
              (CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), 'CDX_URL_MISSING', CAST(NULL AS VARCHAR)),
              ('net,cdn)/asset', 'https://cdn.net/asset', 'DIGEST_MALFORMED', '11112222'),
              ('org,wiki)/page', 'https://wiki.org/page', 'DIGEST_MALFORMED', 'FFFF0000')
            ) AS t(surt, url, check_id, found)
            ORDER BY check_id, surt
        """,
        "best_captures": """
            WITH cdx AS (
              SELECT 'https://ex.org/p' || CAST(doc_id % 37 AS VARCHAR) AS url,
                     make_timestamp((1700000000 + doc_id * 3600) * 1000000) AS capture_ts,
                     CAST(CASE WHEN doc_id % 7 = 0 THEN 404 ELSE 200 END AS INTEGER) AS status,
                     'crawl-' || CAST(doc_id % 3 AS VARCHAR) || '.warc.gz' AS filename,
                     CAST(doc_id * 100 AS BIGINT) AS "offset"
              FROM documents
            )
            SELECT url, capture_ts, status, filename, "offset"
            FROM cdx
            QUALIFY row_number() OVER (
              PARTITION BY url
              ORDER BY CASE WHEN status = 200 THEN 0 ELSE 1 END,
                       capture_ts DESC, filename, "offset"
            ) = 1
            ORDER BY url
        """,
        "spreadsheet_pages": """
            SELECT * FROM (VALUES
              ('pages_a.xlsx', CAST(1 AS BIGINT), 'https://example.org/a', '1990-01-02T12:00:00Z', 'hello world', 'en'),
              ('pages_a.xlsx', CAST(2 AS BIGINT), 'https://example.org/b', '1991-01-01T00:00:00Z', '42', 'TRUE'),
              ('pages_b.ods',  CAST(1 AS BIGINT), 'https://example.org/c', '1990-01-02T00:00:00Z', 'dup', 'dup'),
              ('pages_b.ods',  CAST(2 AS BIGINT), 'https://example.org/d', '1991-03-04T05:06:07Z', '2.5', 'FALSE'),
              ('pages_c.xml',  CAST(1 AS BIGINT), 'https://example.org/e', '1992-05-06T00:00:00.000Z', '', 'de'),
              ('pages_d.xls',  CAST(1 AS BIGINT), 'https://example.org/f', '1990-01-02T12:00:00Z', '99', 'fr')
            ) AS t(src_name, src_row, url, warc_ts, text, lang)
            ORDER BY url
        """,
        # checklist_checks: replay the node construction, then express each
        # graph check relationally; PARENT_CYCLE = the parent walk is still
        # alive (non-null, resolvable) at depth 63 — exactly "no root
        # within 64 hops", matching the 6-round pointer doubling
        "checklist_checks": """
            WITH RECURSIVE nodes AS (
              SELECT CAST(r_regionkey + 1 AS BIGINT) AS node_id,
                     CAST(NULL AS BIGINT) AS parent_id,
                     CAST(NULL AS BIGINT) AS accepted_id,
                     'kingdom' AS rank
              FROM region
              UNION ALL
              SELECT CAST(n_nationkey + 100 AS BIGINT),
                     CAST(CASE WHEN n_nationkey = 23 THEN 124
                               WHEN n_nationkey = 24 THEN 123
                               ELSE n_regionkey + 1 END AS BIGINT),
                     CAST(NULL AS BIGINT), 'family'
              FROM nation
              UNION ALL
              SELECT CAST(c_custkey + 1000 AS BIGINT),
                     CAST(CASE WHEN c_custkey % 97 = 0 THEN c_custkey + 9000000
                               WHEN c_custkey % 101 = 0 THEN c_custkey + 1000
                               WHEN c_custkey % 103 = 0 THEN c_custkey + 1001
                               ELSE c_nationkey + 100 END AS BIGINT),
                     CAST(CASE WHEN c_custkey % 178 = 0 THEN c_custkey + 1089
                               WHEN c_custkey % 89 = 0 THEN c_custkey + 1001
                               ELSE NULL END AS BIGINT),
                     'species'
              FROM customer
            ),
            walk(start_id, cur_parent, depth) AS (
              SELECT node_id, parent_id, 0 FROM nodes
              UNION ALL
              SELECT w.start_id, n.parent_id, w.depth + 1
              FROM walk w JOIN nodes n ON n.node_id = w.cur_parent
              WHERE w.depth < 63
            ),
            ranks AS (
              SELECT * FROM (VALUES ('kingdom', 0), ('family', 1), ('species', 2)) AS r(rank, idx)
            ),
            findings AS (
              SELECT node_id, 'PARENT_ID_INVALID' AS check_id,
                     'existing node id' AS expected,
                     CAST(parent_id AS VARCHAR) AS found
              FROM nodes
              WHERE parent_id IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM nodes i WHERE i.node_id = nodes.parent_id)
              UNION ALL
              SELECT node_id, 'ACCEPTED_ID_INVALID', 'existing node id',
                     CAST(accepted_id AS VARCHAR)
              FROM nodes
              WHERE accepted_id IS NOT NULL
                AND NOT EXISTS (SELECT 1 FROM nodes i WHERE i.node_id = nodes.accepted_id)
              UNION ALL
              SELECT a.node_id, 'CHAINED_SYNONYM',
                     'accepted usage that is not itself a synonym',
                     CAST(a.accepted_id AS VARCHAR) || '->' || CAST(b.accepted_id AS VARCHAR)
              FROM nodes a JOIN nodes b ON a.accepted_id = b.node_id
              WHERE b.accepted_id IS NOT NULL
              UNION ALL
              SELECT start_id, 'PARENT_CYCLE',
                     'ancestor chain reaching a root within 64 hops',
                     'unterminated parent chain'
              FROM walk WHERE depth = 63 AND cur_parent IS NOT NULL
              UNION ALL
              SELECT c.node_id, 'CLASSIFICATION_RANK_ORDER_INVALID',
                     'parent of strictly higher rank',
                     p.rank || '<=' || c.rank
              FROM nodes c
              JOIN nodes p ON c.parent_id = p.node_id
              JOIN ranks rc ON rc.rank = c.rank
              JOIN ranks rp ON rp.rank = p.rank
              WHERE rp.idx >= rc.idx
            )
            SELECT node_id, check_id, expected, found
            FROM findings ORDER BY node_id, check_id
        """,
        # taxon_match: three-tier backbone lookup; ties resolve to
        # min(taxon_id) on both sides; canonical form = lower + collapse
        # non-alphanumerics
        "taxon_match": """
            WITH backbone AS (
              SELECT p_partkey AS taxon_id, p_name AS name FROM part
            ),
            probes AS (
              SELECT p_partkey AS rec_id,
                     CASE WHEN p_partkey % 13 = 0 THEN 'zzzz' || CAST(p_partkey AS VARCHAR)
                          WHEN p_partkey % 7 = 0 THEN upper(p_name)
                          WHEN p_partkey % 11 = 0 THEN str_split(p_name, ' ')[1] || ' zzz qq'
                          ELSE p_name END AS name
              FROM part
            ),
            ex AS (SELECT name AS ex_name, min(taxon_id) AS ex_id FROM backbone GROUP BY 1),
            cn AS (SELECT trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')) AS cn_name,
                          min(taxon_id) AS cn_id FROM backbone GROUP BY 1),
            tk AS (SELECT str_split(trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')), ' ')[1] AS tk_name,
                          min(taxon_id) AS tk_id FROM backbone GROUP BY 1)
            SELECT rec_id, p.name AS name,
                   CASE WHEN ex_id IS NOT NULL THEN 'EXACT'
                        WHEN cn_id IS NOT NULL THEN 'FUZZY'
                        WHEN tk_id IS NOT NULL THEN 'HIGHERRANK'
                        ELSE 'NONE' END AS match_type,
                   COALESCE(ex_id, cn_id, tk_id) AS matched_id
            FROM probes p
            LEFT JOIN ex ON p.name = ex_name
            LEFT JOIN cn ON trim(regexp_replace(lower(p.name), '[^a-z0-9]+', ' ', 'g')) = cn_name
            LEFT JOIN tk ON str_split(trim(regexp_replace(lower(p.name), '[^a-z0-9]+', ' ', 'g')), ' ')[1] = tk_name
            ORDER BY rec_id
        """,
        # lm_quality: train slice = hash bucket < 50; denom = total +
        # 0.5*(V+1); OOV mass = one reserved smoothing bucket. Sums of
        # float64 logs differ across engines only at ~1e-13 — round(.,6)
        # absorbs it (same argument as lexical_diversity's entropy)
        "lm_quality": """
            WITH cnts AS (
              SELECT tok AS token, count(*) AS cnt
              FROM (
                SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS tok
                FROM documents
                WHERE text IS NOT NULL
                  AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
              ) GROUP BY tok
            ),
            scal AS (SELECT sum(cnt) + 0.5 * (count(*) + 1) AS denom FROM cnts),
            ev AS (
              SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token
              FROM documents
              WHERE text IS NOT NULL
                AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 >= 50
            ),
            scored AS (
              SELECT e.doc_id,
                     COALESCE(ln((c.cnt + 0.5) / s.denom), ln(0.5 / s.denom)) AS logp
              FROM ev e CROSS JOIN scal s LEFT JOIN cnts c ON e.token = c.token
            )
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(logp), 6) AS log_prob,
                   round(exp(-sum(logp) / count(*)), 6) AS ppl
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        # nb_quality: multinomial Naive Bayes replayed relationally — seed
        # labels lang='en' on the lower md5-bucket half, add-0.5 smoothing
        # with one OOV bucket per class (train_unigram_lm's formulation),
        # scores = prior delta + summed per-token log-likelihood deltas
        "nb_quality": """
            WITH seed AS (
              SELECT (lang = 'en') AS pos, text FROM documents
              WHERE text IS NOT NULL
                AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
            ),
            cnts AS (
              SELECT token,
                     sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_cnt,
                     sum(CASE WHEN pos THEN 0 ELSE 1 END) AS neg_cnt
              FROM (
                SELECT pos,
                       unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token
                FROM seed
              ) GROUP BY token
            ),
            scal AS (
              SELECT sum(pos_cnt) + 0.5 * (count(*) + 1) AS dp,
                     sum(neg_cnt) + 0.5 * (count(*) + 1) AS dn
              FROM cnts
            ),
            prior AS (
              SELECT ln(sum(CASE WHEN pos THEN 1 ELSE 0 END) + 0.5)
                     - ln(sum(CASE WHEN pos THEN 0 ELSE 1 END) + 0.5) AS pr
              FROM seed
            ),
            ev AS (
              SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS token
              FROM documents
              WHERE text IS NOT NULL
                AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 >= 50
            ),
            scored AS (
              SELECT e.doc_id,
                     COALESCE(ln((c.pos_cnt + 0.5) / s.dp) - ln((c.neg_cnt + 0.5) / s.dn),
                              ln(0.5 / s.dp) - ln(0.5 / s.dn)) AS dlogp
              FROM ev e CROSS JOIN scal s LEFT JOIN cnts c ON e.token = c.token
            )
            SELECT sc.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   round(sum(sc.dlogp) + p.pr, 6) AS log_odds,
                   (sum(sc.dlogp) + p.pr) > 0 AS pred
            FROM scored sc CROSS JOIN prior p
            GROUP BY sc.doc_id, p.pr ORDER BY sc.doc_id
        """,
        # dsir_weights: hashed bigram buckets (md5-prefix % 4096, the
        # hash_bucket mirror); target = lang='en', source = all docs;
        # add-0.5 smoothing over 4096 buckets on both distributions
        "dsir_weights": """
            WITH grams AS (
              SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(g), 1, 8)) AS BIGINT) % 4096 AS b
              FROM (
                SELECT doc_id, lang,
                       unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS g
                FROM (
                  SELECT doc_id, lang,
                         list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
                  FROM documents WHERE text IS NOT NULL
                )
              )
            ),
            t AS (SELECT b, count(*) AS t_cnt FROM grams WHERE lang = 'en' GROUP BY b),
            s AS (SELECT b, count(*) AS s_cnt FROM grams GROUP BY b),
            tot AS (
              SELECT (SELECT sum(t_cnt) FROM t) + 0.5 * 4096 AS t_denom,
                     (SELECT sum(s_cnt) FROM s) + 0.5 * 4096 AS s_denom
            ),
            ratio AS (
              SELECT s.b,
                     ln((COALESCE(t.t_cnt, 0) + 0.5) / tot.t_denom)
                     - ln((s.s_cnt + 0.5) / tot.s_denom) AS log_ratio
              FROM s LEFT JOIN t ON s.b = t.b CROSS JOIN tot
            ),
            df AS (SELECT doc_id, b, count(*) AS c FROM grams GROUP BY doc_id, b)
            SELECT df.doc_id,
                   CAST(sum(df.c) AS BIGINT) AS n_feats,
                   round(sum(df.c * r.log_ratio), 6) AS log_weight
            FROM df JOIN ratio r ON df.b = r.b
            GROUP BY df.doc_id ORDER BY df.doc_id
        """,
        # c4_clean: replay the pseudo-line construction (8-token lines,
        # %11 javascript lines, %3 unterminated, %37 lorem pages, %41
        # curly pages), then the C4 rules; clean_text compared via md5
        "c4_clean": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            nz AS (SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
            lined AS (
              SELECT doc_id,
                     array_to_string(
                       list_transform(range(CAST(ceil(n / 8.0) AS BIGINT)),
                         i -> array_to_string(ws[(i*8+1):(i*8+8)], ' ')
                              || CASE WHEN (doc_id + i) % 11 = 0 THEN ' javascript.'
                                      WHEN (doc_id + i) % 3 = 0 THEN ''
                                      ELSE '.' END),
                       chr(10))
                     || CASE WHEN doc_id % 37 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
                     || CASE WHEN doc_id % 41 = 0 THEN chr(10) || 'if (x) { return 1; }' ELSE '' END AS text
              FROM nz
            ),
            rules AS (
              SELECT doc_id, text,
                     list_filter(regexp_split_to_array(text, chr(10)),
                                 l -> regexp_matches(l, '\\S')) AS lines
              FROM lined
            ),
            kp AS (
              SELECT doc_id, text, lines,
                     list_filter(lines, l ->
                        regexp_matches(l, '[.!?"]\\s*$')
                        AND len(list_filter(regexp_split_to_array(trim(l), '\\s+'), x -> x <> '')) >= 5
                        AND NOT contains(lower(l), 'javascript')) AS kept_lines
              FROM rules
            ),
            -- array_to_string([]) is NULL in DuckDB but '' in Spark
            kt AS (
              SELECT *, COALESCE(array_to_string(kept_lines, chr(10)), '') AS ct
              FROM kp
            )
            SELECT doc_id,
                   (NOT contains(lower(text), 'lorem ipsum'))
                     AND (NOT contains(text, '{'))
                     AND (len(regexp_extract_all(ct, '[.!?]')) >= 3) AS kept,
                   md5(ct) AS clean_md5,
                   CAST(len(kept_lines) AS BIGINT) AS n_lines_kept,
                   CAST(len(lines) - len(kept_lines) AS BIGINT) AS n_lines_dropped,
                   CAST(len(regexp_extract_all(ct, '[.!?]')) AS BIGINT) AS n_sentences,
                   contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
                   contains(text, '{') AS has_curly
            FROM kt ORDER BY doc_id
        """,
        # gopher_quality: every gate is a closed-form ratio/threshold both
        # engines compute identically in float64
        "gopher_quality": """
            WITH d AS (
              SELECT doc_id, text,
                     list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS words,
                     list_filter(regexp_split_to_array(text, chr(10)),
                                 l -> regexp_matches(l, '\\S')) AS lines
              FROM documents WHERE text IS NOT NULL
            ),
            g AS (
              SELECT doc_id,
                     len(words) AS n_words,
                     CASE WHEN len(words) > 0
                          THEN CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(words)
                          ELSE 0.0 END AS mwl,
                     len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) AS n_sym,
                     CASE WHEN len(lines) > 0
                          THEN CAST(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS DOUBLE) / len(lines)
                          ELSE 0.0 END AS bullet_frac,
                     CASE WHEN len(lines) > 0
                          THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS DOUBLE) / len(lines)
                          ELSE 0.0 END AS ellipsis_frac,
                     CASE WHEN len(words) > 0
                          THEN CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / len(words)
                          ELSE 0.0 END AS alpha_frac,
                     len(list_filter(list_distinct(list_transform(words, w -> lower(w))),
                         w -> list_contains(['the','be','to','of','and','that','have','with'], w))) AS sw_hits
              FROM d
            )
            SELECT doc_id,
                   CAST(n_words AS BIGINT) AS n_words,
                   n_words >= 50 AND n_words <= 100000 AS gate_word_count,
                   mwl >= 3.0 AND mwl <= 10.0 AS gate_mean_word_len,
                   CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE) / n_words <= 0.1 ELSE TRUE END AS gate_symbol_ratio,
                   bullet_frac <= 0.9 AS gate_bullets,
                   ellipsis_frac <= 0.3 AS gate_ellipsis,
                   alpha_frac >= 0.8 AS gate_alpha_words,
                   sw_hits >= 2 AS gate_stopwords,
                   (n_words >= 50 AND n_words <= 100000)
                     AND (mwl >= 3.0 AND mwl <= 10.0)
                     AND (CASE WHEN n_words > 0 THEN CAST(n_sym AS DOUBLE) / n_words <= 0.1 ELSE TRUE END)
                     AND bullet_frac <= 0.9
                     AND ellipsis_frac <= 0.3
                     AND alpha_frac >= 0.8
                     AND sw_hits >= 2 AS passes
            FROM g ORDER BY doc_id
        """,
        # lexical_diversity: token histogram per doc; entropy as
        # -sum(p*ln(p)) in float64 on both engines, rounded 6
        "lexical_diversity": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            t AS (
              SELECT doc_id, len(ws) AS n, unnest(ws) AS tok
              FROM w WHERE len(ws) > 0
            ),
            c AS (SELECT doc_id, n, tok, count(*) AS cnt FROM t GROUP BY doc_id, n, tok)
            SELECT doc_id,
                   CAST(max(n) AS BIGINT) AS n_tokens,
                   round(CAST(count(*) AS DOUBLE) / max(n), 6) AS ttr,
                   round(-sum((CAST(cnt AS DOUBLE) / n) * ln(CAST(cnt AS DOUBLE) / n)), 6) AS entropy
            FROM c GROUP BY doc_id ORDER BY doc_id
        """,
        # cross_dedup_flags: lower bucket half = reference corpus, upper
        # half = new docs; EXISTS (not IN) so null fingerprints stay
        # trivially novel instead of three-valued-logic NULL
        "cross_dedup_flags": f"""
            WITH t AS (
              SELECT doc_id,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
                     {bucket_expr} AS b
              FROM documents
            ),
            ref AS (SELECT DISTINCT fingerprint FROM t WHERE b < 50 AND fingerprint IS NOT NULL)
            SELECT t.doc_id, t.fingerprint,
                   EXISTS (SELECT 1 FROM ref WHERE ref.fingerprint = t.fingerprint) AS seen_in_ref
            FROM t WHERE b >= 50 ORDER BY doc_id
        """,
        # minhash_cross_pairs: same signature/banding pipeline as
        # minhash_pairs, sides from the hash-bucket halves; bucket-size cap
        # counts BOTH sides (the Spark op caps the unioned posting list)
        "minhash_cross_pairs": f"""
            WITH consts(i, a, b) AS (VALUES {mh_consts}),
            w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws,
                     CASE WHEN {bucket_expr} >= 50 THEN 'L' ELSE 'R' END AS side
              FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
              SELECT DISTINCT doc_id, side, ws[r.i] || ' ' || ws[r.i+1] || ' ' || ws[r.i+2] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r
              WHERE len(ws) >= 3
            ),
            hx AS (
              SELECT doc_id, side,
                     CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT)
                       % 2305843009213693951 AS x
              FROM grams
            ),
            mh AS (
              SELECT doc_id, side, c.i,
                     min(CAST(((CAST(c.a AS HUGEINT) * x + c.b) % 18446744073709551616)
                              % 2305843009213693951 AS BIGINT)) AS v
              FROM hx CROSS JOIN consts c GROUP BY doc_id, side, c.i
            ),
            sig AS (SELECT doc_id, side, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id, side),
            bands AS (
              SELECT doc_id, side, sig, bd.band,
                     array_to_string(sig[bd.band*4+1 : bd.band*4+4], ',') AS key
              FROM sig, (SELECT unnest(range(0, 16)) AS band) bd
            ),
            bsz AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
            cand AS (
              SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id,
                              a.sig AS sa, b.sig AS sb
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.key = b.key
                          AND a.side = 'L' AND b.side = 'R'
              JOIN bsz s ON s.band = a.band AND s.key = a.key
              WHERE s.c BETWEEN 2 AND 1000
            )
            SELECT left_id, right_id,
                   round(len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0, 6) AS est_jaccard
            FROM cand
            WHERE len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0 >= 0.5
            ORDER BY left_id, right_id
        """,
        # index_dedup_pairs: the SAME cross-corpus pipeline, except the
        # bucket cap is the INDEX path's — index-side (R) member count
        # ≤ max_bucket, no lower bound (a 1-member index bucket still
        # pairs with a probing new doc)
        "index_dedup_pairs": f"""
            WITH consts(i, a, b) AS (VALUES {mh_consts}),
            w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws,
                     CASE WHEN {bucket_expr} >= 50 THEN 'L' ELSE 'R' END AS side
              FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
              SELECT DISTINCT doc_id, side, ws[r.i] || ' ' || ws[r.i+1] || ' ' || ws[r.i+2] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r
              WHERE len(ws) >= 3
            ),
            hx AS (
              SELECT doc_id, side,
                     CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT)
                       % 2305843009213693951 AS x
              FROM grams
            ),
            mh AS (
              SELECT doc_id, side, c.i,
                     min(CAST(((CAST(c.a AS HUGEINT) * x + c.b) % 18446744073709551616)
                              % 2305843009213693951 AS BIGINT)) AS v
              FROM hx CROSS JOIN consts c GROUP BY doc_id, side, c.i
            ),
            sig AS (SELECT doc_id, side, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id, side),
            bands AS (
              SELECT doc_id, side, sig, bd.band,
                     array_to_string(sig[bd.band*4+1 : bd.band*4+4], ',') AS key
              FROM sig, (SELECT unnest(range(0, 16)) AS band) bd
            ),
            bsz AS (SELECT band, key, count(*) AS c FROM bands
                    WHERE side = 'R' GROUP BY band, key),
            cand AS (
              SELECT DISTINCT a.doc_id AS left_id, b.doc_id AS right_id,
                              a.sig AS sa, b.sig AS sb
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.key = b.key
                          AND a.side = 'L' AND b.side = 'R'
              JOIN bsz s ON s.band = a.band AND s.key = a.key
              WHERE s.c <= 1000
            )
            SELECT left_id, right_id,
                   round(len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0, 6) AS est_jaccard
            FROM cand
            WHERE len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0 >= 0.5
            ORDER BY left_id, right_id
        """,
        # lsh_recall: BOTH pair pipelines replayed (exact all-pairs Jaccard
        # + the md5-family minhash/banding/cap/estimate) and folded to the
        # 1-row µ-recall — the approximate family's quality, hash-pinned
        "lsh_recall": f"""
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([array_to_string(words[i:i+2], ' ') for i in range(1, len(words) - 1)]) AS s
              FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words FROM documents)
              WHERE len(words) >= 3
            ), ex AS (
              SELECT doc_id, unnest(s) AS g FROM sh
            ), inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            ), exact AS (
              SELECT doc_a, doc_b
              FROM inter
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sa ON sa.doc_id = doc_a
              JOIN (SELECT doc_id, len(s) AS n FROM sh) sb ON sb.doc_id = doc_b
              WHERE CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) >= 0.5
            ),
            consts(i, a, b) AS (VALUES {mh_consts}),
            w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
              SELECT DISTINCT doc_id, ws[r.i] || ' ' || ws[r.i+1] || ' ' || ws[r.i+2] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r
              WHERE len(ws) >= 3
            ),
            hx AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT)
                       % 2305843009213693951 AS x
              FROM grams
            ),
            mh AS (
              SELECT doc_id, c.i,
                     min(CAST(((CAST(c.a AS HUGEINT) * x + c.b) % 18446744073709551616)
                              % 2305843009213693951 AS BIGINT)) AS v
              FROM hx CROSS JOIN consts c GROUP BY doc_id, c.i
            ),
            sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, sig, bd.band,
                     array_to_string(sig[bd.band*4+1 : bd.band*4+4], ',') AS key
              FROM sig, (SELECT unnest(range(0, 16)) AS band) bd
            ),
            bsz AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
            lsh AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
              JOIN bsz s ON s.band = a.band AND s.key = a.key
              WHERE s.c BETWEEN 2 AND 1000
                AND len(list_filter(range(1, 65), i -> a.sig[i] = b.sig[i])) / 64.0 >= 0.5
            ),
            ne AS (SELECT count(*) AS n_exact FROM exact),
            nf AS (
              SELECT count(*) AS n_found
              FROM exact e SEMI JOIN lsh l
                ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b
            )
            SELECT CAST(n_exact AS BIGINT) AS n_exact,
                   CAST(n_found AS BIGINT) AS n_found,
                   CASE WHEN n_exact > 0
                        THEN CAST((n_found * 1000000) // n_exact AS BIGINT)
                   END AS recall_micro
            FROM ne, nf
        """,
        # weighted_minhash: the minhash_pairs replay over tf-EXPANDED gram
        # multisets — gram g with tf c contributes g||chr(0)||0..c-1, the
        # reduction that makes set resemblance equal weighted Jaccard
        "weighted_minhash": f"""
            WITH consts(i, a, b) AS (VALUES {mh_consts}),
            w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            tf AS (
              SELECT doc_id, g, count(*) AS tf FROM (
                SELECT doc_id, ws[r.i] || ' ' || ws[r.i+1] || ' ' || ws[r.i+2] AS g
                FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r
                WHERE len(ws) >= 3
              ) GROUP BY doc_id, g
            ),
            grams AS (
              SELECT doc_id, g || chr(0) || CAST(r.j AS VARCHAR) AS ge
              FROM tf, LATERAL (SELECT unnest(range(0, tf)) AS j) r
            ),
            hx AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(ge), 1, 16)) AS UBIGINT)
                       % 2305843009213693951 AS x
              FROM grams
            ),
            mh AS (
              SELECT doc_id, c.i,
                     min(CAST(((CAST(c.a AS HUGEINT) * x + c.b) % 18446744073709551616)
                              % 2305843009213693951 AS BIGINT)) AS v
              FROM hx CROSS JOIN consts c GROUP BY doc_id, c.i
            ),
            sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, sig, bd.band,
                     array_to_string(sig[bd.band*4+1 : bd.band*4+4], ',') AS key
              FROM sig, (SELECT unnest(range(0, 16)) AS band) bd
            ),
            bsz AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.sig AS sa, b.sig AS sb
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
              JOIN bsz s ON s.band = a.band AND s.key = a.key
              WHERE s.c BETWEEN 2 AND 1000
            )
            SELECT doc_a, doc_b,
                   round(len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0, 6) AS est_wjaccard
            FROM cand
            WHERE len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0 >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "minhash_pairs": f"""
            WITH consts(i, a, b) AS (VALUES {mh_consts}),
            w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
              SELECT DISTINCT doc_id, ws[r.i] || ' ' || ws[r.i+1] || ' ' || ws[r.i+2] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r
              WHERE len(ws) >= 3
            ),
            hx AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT)
                       % 2305843009213693951 AS x
              FROM grams
            ),
            mh AS (
              SELECT doc_id, c.i,
                     min(CAST(((CAST(c.a AS HUGEINT) * x + c.b) % 18446744073709551616)
                              % 2305843009213693951 AS BIGINT)) AS v
              FROM hx CROSS JOIN consts c GROUP BY doc_id, c.i
            ),
            sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, sig, bd.band,
                     array_to_string(sig[bd.band*4+1 : bd.band*4+4], ',') AS key
              FROM sig, (SELECT unnest(range(0, 16)) AS band) bd
            ),
            bsz AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.sig AS sa, b.sig AS sb
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
              JOIN bsz s ON s.band = a.band AND s.key = a.key
              WHERE s.c BETWEEN 2 AND 1000
            )
            SELECT doc_a, doc_b,
                   round(len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0, 6) AS est_jaccard
            FROM cand
            WHERE len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0 >= 0.5
            ORDER BY doc_a, doc_b
        """,
        # lsh_pair_budget / lsh_budget_census: the minhash_pairs replay plus
        # the round-5 budget math IN SQL — bucket-size histogram, running
        # pair sum over sizes ascending, greatest(max size within budget, 2)
        # as the cut; pairs only from buckets <= cut, census of the rest
        "lsh_pair_budget": f"""
            WITH consts(i, a, b) AS (VALUES {mh_consts}),
            w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
              SELECT DISTINCT doc_id, ws[r.i] || ' ' || ws[r.i+1] || ' ' || ws[r.i+2] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r
              WHERE len(ws) >= 3
            ),
            hx AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT)
                       % 2305843009213693951 AS x
              FROM grams
            ),
            mh AS (
              SELECT doc_id, c.i,
                     min(CAST(((CAST(c.a AS HUGEINT) * x + c.b) % 18446744073709551616)
                              % 2305843009213693951 AS BIGINT)) AS v
              FROM hx CROSS JOIN consts c GROUP BY doc_id, c.i
            ),
            sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, sig, bd.band,
                     array_to_string(sig[bd.band*4+1 : bd.band*4+4], ',') AS key
              FROM sig, (SELECT unnest(range(0, 16)) AS band) bd
            ),
            bsz AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
            hist AS (
              SELECT c, count(*) AS nb FROM bsz
              WHERE c BETWEEN 2 AND 1000 GROUP BY c
            ),
            cum AS (
              SELECT c, sum((c*(c-1)//2) * nb) OVER (ORDER BY c) AS cumpairs
              FROM hist
            ),
            cutv AS (
              SELECT greatest(coalesce(max(c), 2), 2) AS cut
              FROM cum WHERE cumpairs <= 320
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                              a.sig AS sa, b.sig AS sb
              FROM bands a
              JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
              JOIN bsz s ON s.band = a.band AND s.key = a.key
              WHERE s.c BETWEEN 2 AND 1000 AND s.c <= (SELECT cut FROM cutv)
            )
            SELECT doc_a, doc_b,
                   round(len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0, 6) AS est_jaccard
            FROM cand
            WHERE len(list_filter(range(1, 65), i -> sa[i] = sb[i])) / 64.0 >= 0.5
            ORDER BY doc_a, doc_b
        """,
        "lsh_budget_census": f"""
            WITH consts(i, a, b) AS (VALUES {mh_consts}),
            w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
              SELECT DISTINCT doc_id, ws[r.i] || ' ' || ws[r.i+1] || ' ' || ws[r.i+2] AS g
              FROM w, LATERAL (SELECT unnest(range(1, len(ws) - 1)) AS i) r
              WHERE len(ws) >= 3
            ),
            hx AS (
              SELECT doc_id,
                     CAST(('0x' || substr(md5(g), 1, 16)) AS UBIGINT)
                       % 2305843009213693951 AS x
              FROM grams
            ),
            mh AS (
              SELECT doc_id, c.i,
                     min(CAST(((CAST(c.a AS HUGEINT) * x + c.b) % 18446744073709551616)
                              % 2305843009213693951 AS BIGINT)) AS v
              FROM hx CROSS JOIN consts c GROUP BY doc_id, c.i
            ),
            sig AS (SELECT doc_id, list(v ORDER BY i) AS sig FROM mh GROUP BY doc_id),
            bands AS (
              SELECT doc_id, bd.band,
                     array_to_string(sig[bd.band*4+1 : bd.band*4+4], ',') AS key
              FROM sig, (SELECT unnest(range(0, 16)) AS band) bd
            ),
            bsz AS (SELECT band, key, count(*) AS c FROM bands GROUP BY band, key),
            hist AS (
              SELECT c, count(*) AS nb FROM bsz
              WHERE c BETWEEN 2 AND 1000 GROUP BY c
            ),
            cum AS (
              SELECT c, sum((c*(c-1)//2) * nb) OVER (ORDER BY c) AS cumpairs
              FROM hist
            ),
            cutv AS (
              SELECT greatest(coalesce(max(c), 2), 2) AS cut
              FROM cum WHERE cumpairs <= 320
            )
            SELECT band, CAST(c AS INTEGER) AS n_docs,
                   count(*) AS n_buckets,
                   CAST(sum(c*(c-1)//2) AS BIGINT) AS pairs_cut
            FROM bsz, cutv
            WHERE c BETWEEN 2 AND 1000 AND c > cut
            GROUP BY band, c ORDER BY band, c
        """,
        # winnowing (Schleimer et al. 2003): word 5-grams hashed with the
        # md5-8-byte-prefix scheme of operators/dedup._hash64_array, masked to
        # 62 bits, sliding-window (w=4) minima, per-doc dedup. Exploded rows.
        "winnow_fingerprints": """
            WITH w AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            g AS (
              SELECT doc_id, len(ws) - 4 AS m,
                     unnest(generate_series(1, len(ws) - 4)) AS i, ws
              FROM w WHERE len(ws) >= 5
            ),
            h AS (
              SELECT doc_id, m, i,
                     CAST(CAST(('0x' || substr(md5(array_to_string(ws[i:i+4], ' ')), 1, 16)) AS UBIGINT)
                          % (1::UBIGINT << 62) AS BIGINT) AS hv
              FROM g
            ),
            mins AS (
              SELECT doc_id, m, i,
                     min(hv) OVER (PARTITION BY doc_id) AS min_all,
                     min(hv) OVER (PARTITION BY doc_id ORDER BY i
                                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS min_win
              FROM h
            )
            SELECT DISTINCT doc_id,
                   CASE WHEN m <= 4 THEN min_all ELSE min_win END AS fp
            FROM mins WHERE m <= 4 OR i >= 4
            ORDER BY doc_id, fp
        """,
        # deterministic fake media decode: payload = 'media-payload-' ||
        # sha256(doc_id || '42') (ASCII, 78 bytes); features = high-nibble
        # byte histogram / length as float32 (multimodal._features_from_bytes)
        "media_features": """
            WITH ids AS (SELECT range AS doc_id FROM range(0, 500)),
            p AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 3 = 0 THEN 'image/jpeg'
                          WHEN doc_id % 3 = 1 THEN 'audio/wav'
                          ELSE 'video/mp4' END AS media_type,
                     'media-payload-' || sha256(CAST(doc_id AS VARCHAR) || '42') AS payload
              FROM ids
            ),
            b AS (
              SELECT doc_id, length(payload) AS n,
                     ord(substr(payload, unnest(generate_series(1, length(payload))), 1)) // 16 AS bucket
              FROM p
            ),
            h AS (SELECT doc_id, n, bucket, count(*) AS cnt FROM b GROUP BY ALL),
            grid AS (
              SELECT p.doc_id, p.media_type, length(p.payload) AS n, gs.bucket
              FROM p CROSS JOIN (SELECT range AS bucket FROM range(0, 16)) gs
            )
            SELECT g.doc_id, g.media_type, CAST(g.n AS BIGINT) AS n_bytes,
                   g.bucket AS feat_idx,
                   CAST(CAST(coalesce(h.cnt, 0) AS DOUBLE) / g.n AS FLOAT) AS feat_val
            FROM grid g LEFT JOIN h ON h.doc_id = g.doc_id AND h.bucket = g.bucket
            ORDER BY g.doc_id, feat_idx
        """,
        "profile_rollup_exact": """
            SELECT coalesce(lang, 'ALL') AS lang,
                   count(*) AS n_rows,
                   count(doc_id) AS doc_id_non_blank,
                   count(CASE WHEN doc_id IS NULL THEN 1 END) AS doc_id_nulls,
                   count(DISTINCT doc_id) AS doc_id_distinct,
                   count(CASE WHEN text IS NOT NULL AND regexp_matches(text, '\\S') THEN 1 END) AS text_non_blank,
                   count(CASE WHEN text IS NULL THEN 1 END) AS text_nulls,
                   count(DISTINCT text) AS text_distinct,
                   count(CASE WHEN source IS NOT NULL AND regexp_matches(source, '\\S') THEN 1 END) AS source_non_blank,
                   count(CASE WHEN source IS NULL THEN 1 END) AS source_nulls,
                   count(DISTINCT source) AS source_distinct,
                   count(n_chars) AS n_chars_non_blank,
                   count(CASE WHEN n_chars IS NULL THEN 1 END) AS n_chars_nulls,
                   count(DISTINCT n_chars) AS n_chars_distinct
            FROM documents GROUP BY ROLLUP (lang) ORDER BY lang
        """,
        # pages_validation: VALUES oracle over the deterministic synthetic
        # fixture (no parquet input exists for it) — the engine's golden
        # per-check counts at n=3000, the same ones the verify skill pins
        "pages_validation": """
            SELECT * FROM (VALUES
              ('DRIFT_WINDOW', CAST(1 AS BIGINT)),
              ('KEY_EMPTY', 4),
              ('LANG_UNKNOWN', 4),
              ('RECORD_NOT_UNIQUELY_IDENTIFIED', 3),
              ('TEXT_EMPTY', 4),
              ('TEXT_EXTRACTION_MISMATCH', 4),
              ('URL_MALFORMED', 4),
              ('WARC_TS_INVALID', 4),
              ('WARC_TS_UNLIKELY', 4)
            ) AS t(check_id, n) ORDER BY check_id
        """,
        # pagerank_entities: fixed-iteration damped power iteration unrolled
        # into chained CTEs. Arithmetic mirrors operators/graph.py::pagerank
        # exactly: base uses (1.0 - 0.85) computed IN DOUBLES (Python's
        # 1.0-0.85 == 0.15000000000000002, NOT the decimal literal 0.15),
        # (0.85*dm)/n left-assoc, rank/deg double-by-bigint. Sub-ulp
        # summation-order noise is absorbed by the ROUND(.,8) before the
        # top-25 sort (ordinal ORDER BY so the alias, not r5.rank, sorts).
        "pagerank_entities": _pagerank_oracle_sql(iterations=5),
        # hits_entities: L1-normalized mutual reinforcement unrolled into
        # chained CTEs (same fixed-iteration trick as pagerank)
        "hits_entities": _hits_oracle_sql(iterations=5),
        # corr_exact: identical moment algebra — quantize to 1e6-grain
        # integers (same double multiply + half-away round), sum in
        # HUGEINT (≡ Spark DECIMAL(38,0): exact, order-free), then ONE
        # closed-form double expression per group
        "corr_exact": """
            WITH q AS (
              SELECT l_returnflag,
                     CAST(round(CAST(l_quantity AS DOUBLE) * 1e6) AS HUGEINT) AS xq,
                     CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6) AS HUGEINT) AS yq
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            ),
            m AS (
              SELECT l_returnflag, COUNT(*) AS n, SUM(xq) AS sx, SUM(yq) AS sy,
                     SUM(xq * xq) AS sxx, SUM(yq * yq) AS syy, SUM(xq * yq) AS sxy
              FROM q GROUP BY l_returnflag
            )
            SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                   CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                         AND (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                        THEN round(
                          (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
                   END AS "corr"
            FROM m ORDER BY l_returnflag
        """,
        # null_patterns: pattern recomputed from the same VALUES fixture
        "null_patterns": f"""
            WITH t(s, v, t2) AS (VALUES {_nullpat_values_sql()}),
            census AS (
              SELECT CASE WHEN s IS NULL THEN '1' ELSE '0' END
                     || CASE WHEN v IS NULL THEN '1' ELSE '0' END
                     || CASE WHEN t2 IS NULL THEN '1' ELSE '0' END AS pattern,
                     COUNT(*) AS n_rows
              FROM t GROUP BY 1
            )
            SELECT pattern, CAST(n_rows AS BIGINT) AS n_rows,
                   round(CAST(n_rows AS DOUBLE) / SUM(n_rows) OVER (), 6) AS share
            FROM census ORDER BY n_rows DESC, pattern
        """,
        # dtype_census: the SAME anchored ASCII regexes (Java and RE2 run
        # the same automaton on [0-9]) + Deequ's covering-type inference
        "dtype_census": f"""
            WITH t(v) AS (VALUES {_dtype_values_sql()}),
            c AS (
              SELECT v,
                     regexp_matches(v, '^(?i)(true|false)$') AS b,
                     regexp_matches(v, '^[+-]?[0-9]+$') AS i,
                     regexp_matches(v, '^[+-]?([0-9]+\\.[0-9]*|[0-9]*\\.[0-9]+|[0-9]+)([eE][+-]?[0-9]+)?$')
                       AND NOT regexp_matches(v, '^[+-]?[0-9]+$') AS f
              FROM t
            ),
            a AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                     CAST(SUM(CASE WHEN v IS NOT NULL AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_boolean,
                     CAST(SUM(CASE WHEN v IS NOT NULL AND i THEN 1 ELSE 0 END) AS BIGINT) AS n_integral,
                     CAST(SUM(CASE WHEN v IS NOT NULL AND f THEN 1 ELSE 0 END) AS BIGINT) AS n_fractional,
                     CAST(SUM(CASE WHEN v IS NOT NULL AND NOT b AND NOT i AND NOT f
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_string
              FROM c
            )
            SELECT n_rows, n_null, n_boolean, n_integral, n_fractional, n_string,
                   CASE WHEN n_rows - n_null = 0 THEN 'Unknown'
                        WHEN n_string > 0 THEN 'String'
                        WHEN n_boolean = n_rows - n_null THEN 'Boolean'
                        WHEN n_integral = n_rows - n_null THEN 'Integral'
                        WHEN n_boolean = 0 THEN 'Fractional'
                        ELSE 'String' END AS inferred
            FROM a
        """,
        # interval_overlaps: identical running-max window (total order via
        # the same tiebreak) and exact integer-microsecond overlap
        "interval_overlaps": """
            WITH iv AS (
              SELECT l_suppkey, l_orderkey, l_linenumber,
                     l_shipdate AS valid_from,
                     l_shipdate + l_linenumber * INTERVAL 1 DAY AS valid_to
              FROM lineitem WHERE l_suppkey < 30
            ),
            r AS (
              SELECT *,
                     max(valid_to) OVER (
                       PARTITION BY l_suppkey
                       ORDER BY valid_from, l_orderkey, l_linenumber
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS prev_max_end
              FROM iv WHERE valid_to > valid_from
            )
            SELECT l_suppkey, l_orderkey, l_linenumber, valid_from, valid_to,
                   prev_max_end,
                   CAST(epoch_us(least(valid_to, prev_max_end))
                        - epoch_us(valid_from) AS BIGINT) AS overlap_us
            FROM r WHERE prev_max_end > valid_from
            ORDER BY l_suppkey, valid_from, l_orderkey, l_linenumber
        """,
        # id_gaps: the textbook single-ordered-lag formulation — the Spark
        # side must reproduce it exactly from its bucketed two-level plan
        "id_gaps": """
            WITH ids AS (
              SELECT DISTINCT event_id AS id FROM events
              WHERE event_id % 97 <> 0
                AND NOT (event_id BETWEEN 3000 AND 3499)
            ),
            l AS (SELECT id, lag(id) OVER (ORDER BY id) AS prev FROM ids)
            SELECT prev + 1 AS gap_start, id - 1 AS gap_end,
                   id - prev - 1 AS gap_len
            FROM l WHERE id > prev + 1 ORDER BY gap_start
        """,
        # out_of_order: same planted jitter, same strictly-preceding
        # running-max window; lateness in exact integer micros (epoch_us)
        "out_of_order": """
            WITH j AS (
              SELECT event_type, event_id,
                     ts + (event_id % 13) * INTERVAL 10 MINUTE AS ts
              FROM events
            ),
            w AS (
              SELECT event_type, event_id, ts,
                     max(ts) OVER (
                       PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) AS high_water_ts
              FROM j
            )
            SELECT event_type, event_id, ts, high_water_ts,
                   CAST(epoch_us(high_water_ts) - epoch_us(ts) AS BIGINT)
                     AS late_by_us
            FROM w WHERE high_water_ts > ts
            ORDER BY event_type, event_id
        """,
        # freshness: grouped min/max/count + global-max scalar; the mean
        # gap is ONE division then round(6) on both engines (hash-portable)
        "freshness": """
            WITH per AS (
              SELECT event_type AS group_key,
                     CAST(COUNT(*) AS BIGINT) AS n_rows,
                     min(ts) AS min_ts, max(ts) AS max_ts
              FROM events GROUP BY event_type
            ),
            g AS (SELECT max(ts) AS gmax FROM events)
            SELECT group_key, n_rows, min_ts, max_ts,
                   CAST(epoch_us(gmax) - epoch_us(max_ts) AS BIGINT)
                     AS lag_behind_us,
                   round(CASE WHEN n_rows > 1
                              THEN CAST(epoch_us(max_ts) - epoch_us(min_ts) AS DOUBLE)
                                   / (n_rows - 1)
                              ELSE 0.0 END, 6) AS mean_gap_us,
                   n_rows > 1
                     AND CAST(epoch_us(gmax) - epoch_us(max_ts) AS DOUBLE)
                         > 3.0 * round(CASE WHEN n_rows > 1
                                            THEN CAST(epoch_us(max_ts) - epoch_us(min_ts) AS DOUBLE)
                                                 / (n_rows - 1)
                                            ELSE 0.0 END, 6) AS stale
            FROM per CROSS JOIN g ORDER BY group_key
        """,
        # curation_funnel: replay the clone plant + re-lining, then the C4
        # and Gopher batteries (stopword gate relaxed to 0 as on the Spark
        # side), first-failing-stage attribution, conditional-min dedup
        "curation_funnel": r"""
            WITH base AS (
              SELECT doc_id, lang, text FROM documents WHERE text IS NOT NULL
              UNION ALL
              SELECT doc_id + 100000, lang, text FROM documents
              WHERE text IS NOT NULL AND doc_id % 7 = 0
            ),
            w AS (
              SELECT doc_id, lang, text AS raw,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS ws
              FROM base
            ),
            nz AS (SELECT doc_id, lang, raw, ws, len(ws) AS n FROM w WHERE len(ws) > 0),
            lined AS (
              SELECT doc_id, lang, raw,
                     array_to_string(
                       list_transform(range(CAST(ceil(n / 8.0) AS BIGINT)),
                         i -> array_to_string(ws[(i*8+1):(i*8+8)], ' ')
                              || CASE WHEN (doc_id + i) % 11 = 0 THEN ' javascript.'
                                      WHEN (doc_id + i) % 3 = 0 THEN ''
                                      ELSE '.' END),
                       chr(10))
                     || CASE WHEN doc_id % 37 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
                     || CASE WHEN doc_id % 41 = 0 THEN chr(10) || 'if (x) { return 1; }' ELSE '' END AS text
              FROM nz
            ),
            c4k AS (
              SELECT doc_id, text,
                     COALESCE(array_to_string(
                       list_filter(
                         list_filter(regexp_split_to_array(text, chr(10)),
                                     l -> regexp_matches(l, '\S')),
                         l -> regexp_matches(l, '[.!?"]\s*$')
                              AND len(list_filter(regexp_split_to_array(trim(l), '\s+'),
                                                  x -> x <> '')) >= 5
                              AND NOT contains(lower(l), 'javascript')),
                       chr(10)), '') AS ct
              FROM lined
            ),
            c4v AS (
              SELECT doc_id,
                     (NOT contains(lower(text), 'lorem ipsum'))
                       AND (NOT contains(text, '{'))
                       AND (len(regexp_extract_all(ct, '[.!?]')) >= 3) AS kept
              FROM c4k
            ),
            gd AS (
              SELECT doc_id, text,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 x -> x <> '') AS words,
                     list_filter(regexp_split_to_array(text, chr(10)),
                                 l -> regexp_matches(l, '\S')) AS lines
              FROM lined
            ),
            gv AS (
              SELECT doc_id,
                     (len(words) >= 50 AND len(words) <= 100000)
                       AND (CASE WHEN len(words) > 0
                                 THEN CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) / len(words)
                                 ELSE 0.0 END BETWEEN 3.0 AND 10.0)
                       AND (CASE WHEN len(words) > 0
                                 THEN CAST(len(regexp_extract_all(text, '#'))
                                           + len(regexp_extract_all(text, '\.\.\.')) AS DOUBLE)
                                      / len(words) <= 0.1
                                 ELSE TRUE END)
                       AND (CASE WHEN len(lines) > 0
                                 THEN CAST(len(list_filter(lines, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS DOUBLE) / len(lines)
                                 ELSE 0.0 END) <= 0.9
                       AND (CASE WHEN len(lines) > 0
                                 THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\s*$'))) AS DOUBLE) / len(lines)
                                 ELSE 0.0 END) <= 0.3
                       AND (CASE WHEN len(words) > 0
                                 THEN CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(words)
                                 ELSE 0.0 END) >= 0.8 AS passes
              FROM gd
            ),
            pre AS (
              SELECT l.doc_id, md5(COALESCE(l.raw, '')) AS fp,
                     CASE WHEN NOT c4v.kept THEN 'c4'
                          WHEN NOT gv.passes THEN 'gopher'
                          WHEN l.lang NOT IN ('en') THEN 'lang' END AS pre_stage
              FROM lined l JOIN c4v USING (doc_id) JOIN gv USING (doc_id)
            ),
            ded AS (
              SELECT doc_id,
                     COALESCE(pre_stage,
                              CASE WHEN doc_id <> min(CASE WHEN pre_stage IS NULL
                                                           THEN doc_id END)
                                                 OVER (PARTITION BY fp)
                                   THEN 'exact_dup' END,
                              'kept') AS stage
              FROM pre
            )
            SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   round(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 6) AS share
            FROM ded GROUP BY stage ORDER BY stage
        """,
        # agg_rules: the aggregate-envelope kinds — extrema round(6),
        # MEAN/SUM from quantized HUGEINT sums (descale, divide, round —
        # the same fixed operation order), freshness vs the pinned now
        "agg_rules": """
            WITH a AS (
              SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                     round(min(CAST(l_quantity AS DOUBLE)), 6) AS mn,
                     round(max(CAST(l_quantity AS DOUBLE)), 6) AS mx,
                     round((CAST(SUM(CAST(round(CAST(l_quantity AS DOUBLE) * 1e6) AS HUGEINT)) AS DOUBLE) / 1e6)
                           / CAST(COUNT(l_quantity) AS DOUBLE), 6) AS mean_q,
                     round(CAST(SUM(CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6) AS HUGEINT)) AS DOUBLE) / 1e6, 6) AS sum_p,
                     epoch_us(max(l_shipdate)) AS ship_us,
                     CAST(COUNT(CASE WHEN NOT COALESCE(l_discount <= 0.08, FALSE) THEN 1 END) AS BIGINT) AS disc_bad,
                     COUNT(DISTINCT l_orderkey) AS ok_d,
                     COUNT(l_orderkey) AS ok_nn,
                     CAST(COUNT(l_orderkey) - COUNT(DISTINCT l_orderkey) AS BIGINT) AS ok_dups
              FROM lineitem
            )
            SELECT * FROM (
              SELECT 'l_quantity' AS "column", 'MIN_BETWEEN' AS "constraint",
                     '1..1' AS detail,
                     CAST(CASE WHEN mn IS NULL OR mn BETWEEN 1 AND 1 THEN 0 ELSE 1 END AS BIGINT) AS n_violations,
                     mn IS NULL OR mn BETWEEN 1 AND 1 AS passed FROM a
              UNION ALL
              SELECT 'l_quantity', 'MAX_BETWEEN', '1..49',
                     CAST(CASE WHEN mx IS NULL OR mx BETWEEN 1 AND 49 THEN 0 ELSE 1 END AS BIGINT),
                     mx IS NULL OR mx BETWEEN 1 AND 49 FROM a
              UNION ALL
              SELECT 'l_quantity', 'MEAN_BETWEEN', '20..30',
                     CAST(CASE WHEN mean_q IS NULL OR mean_q BETWEEN 20 AND 30 THEN 0 ELSE 1 END AS BIGINT),
                     mean_q IS NULL OR mean_q BETWEEN 20 AND 30 FROM a
              UNION ALL
              SELECT 'l_extendedprice', 'SUM_BETWEEN', '0..2000000000',
                     CAST(CASE WHEN sum_p IS NULL OR sum_p BETWEEN 0 AND 2000000000 THEN 0 ELSE 1 END AS BIGINT),
                     sum_p IS NULL OR sum_p BETWEEN 0 AND 2000000000 FROM a
              UNION ALL
              SELECT '*', 'N_ROWS_BETWEEN', '1..100000000',
                     CAST(CASE WHEN n BETWEEN 1 AND 100000000 THEN 0 ELSE 1 END AS BIGINT),
                     n BETWEEN 1 AND 100000000 FROM a
              UNION ALL
              SELECT 'l_shipdate', 'FRESH_WITHIN', '2002-01-01 00:00:00|31536000',
                     CAST(CASE WHEN ship_us IS NOT NULL
                               AND epoch_us(TIMESTAMP '2002-01-01 00:00:00') - ship_us <= 31536000000000
                               THEN 0 ELSE 1 END AS BIGINT),
                     ship_us IS NOT NULL
                       AND epoch_us(TIMESTAMP '2002-01-01 00:00:00') - ship_us <= 31536000000000 FROM a
              UNION ALL
              SELECT 'l_shipdate', 'FRESH_WITHIN', '2005-01-01 00:00:00|86400',
                     CAST(CASE WHEN ship_us IS NOT NULL
                               AND epoch_us(TIMESTAMP '2005-01-01 00:00:00') - ship_us <= 86400000000
                               THEN 0 ELSE 1 END AS BIGINT),
                     ship_us IS NOT NULL
                       AND epoch_us(TIMESTAMP '2005-01-01 00:00:00') - ship_us <= 86400000000 FROM a
              UNION ALL
              SELECT '*', 'COMPLIANCE_GE', 'l_discount <= 0.08|0.8',
                     disc_bad,
                     CASE WHEN n > 0 THEN round((n - disc_bad) / n, 6) >= 0.8
                          ELSE TRUE END FROM a
              UNION ALL
              SELECT 'l_orderkey', 'UNIQUE_RATIO_GE', '0.5',
                     ok_dups,
                     CASE WHEN ok_nn > 0
                          THEN round(CAST(ok_d AS DOUBLE) / ok_nn, 6) >= 0.5
                          ELSE TRUE END FROM a
            ) ORDER BY "column", "constraint", detail
        """,
        # key_discovery: exact distinct per combo (struct-distinct wrapped
        # in an any-NULL guard to mirror Spark's multi-column COUNT
        # DISTINCT semantics) + the fixed arity-2 subset lattice
        "key_discovery": """
            WITH a AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     COUNT(DISTINCT o_orderkey) AS d_ok,
                     COUNT(DISTINCT o_custkey) AS d_ck,
                     COUNT(DISTINCT o_orderstatus) AS d_os,
                     COUNT(DISTINCT o_orderpriority) AS d_op,
                     COUNT(DISTINCT CASE WHEN o_orderkey IS NOT NULL AND o_custkey IS NOT NULL THEN ROW(o_orderkey, o_custkey) END) AS d_ok_ck,
                     COUNT(DISTINCT CASE WHEN o_orderkey IS NOT NULL AND o_orderstatus IS NOT NULL THEN ROW(o_orderkey, o_orderstatus) END) AS d_ok_os,
                     COUNT(DISTINCT CASE WHEN o_orderkey IS NOT NULL AND o_orderpriority IS NOT NULL THEN ROW(o_orderkey, o_orderpriority) END) AS d_ok_op,
                     COUNT(DISTINCT CASE WHEN o_custkey IS NOT NULL AND o_orderstatus IS NOT NULL THEN ROW(o_custkey, o_orderstatus) END) AS d_ck_os,
                     COUNT(DISTINCT CASE WHEN o_custkey IS NOT NULL AND o_orderpriority IS NOT NULL THEN ROW(o_custkey, o_orderpriority) END) AS d_ck_op,
                     COUNT(DISTINCT CASE WHEN o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL THEN ROW(o_orderstatus, o_orderpriority) END) AS d_os_op
              FROM orders
            )
            SELECT * FROM (
              SELECT 'o_orderkey' AS combo, 1 AS arity, n AS n_rows, d_ok AS n_distinct,
                     d_ok = n AS is_key, d_ok = n AS is_minimal_key FROM a
              UNION ALL
              SELECT 'o_custkey', 1, n, d_ck, d_ck = n, d_ck = n FROM a
              UNION ALL
              SELECT 'o_orderstatus', 1, n, d_os, d_os = n, d_os = n FROM a
              UNION ALL
              SELECT 'o_orderpriority', 1, n, d_op, d_op = n, d_op = n FROM a
              UNION ALL
              SELECT 'o_orderkey,o_custkey', 2, n, d_ok_ck, d_ok_ck = n,
                     (d_ok_ck = n) AND NOT (d_ok = n OR d_ck = n) FROM a
              UNION ALL
              SELECT 'o_orderkey,o_orderstatus', 2, n, d_ok_os, d_ok_os = n,
                     (d_ok_os = n) AND NOT (d_ok = n OR d_os = n) FROM a
              UNION ALL
              SELECT 'o_orderkey,o_orderpriority', 2, n, d_ok_op, d_ok_op = n,
                     (d_ok_op = n) AND NOT (d_ok = n OR d_op = n) FROM a
              UNION ALL
              SELECT 'o_custkey,o_orderstatus', 2, n, d_ck_os, d_ck_os = n,
                     (d_ck_os = n) AND NOT (d_ck = n OR d_os = n) FROM a
              UNION ALL
              SELECT 'o_custkey,o_orderpriority', 2, n, d_ck_op, d_ck_op = n,
                     (d_ck_op = n) AND NOT (d_ck = n OR d_op = n) FROM a
              UNION ALL
              SELECT 'o_orderstatus,o_orderpriority', 2, n, d_os_op, d_os_op = n,
                     (d_os_op = n) AND NOT (d_os = n OR d_op = n) FROM a
            ) ORDER BY arity, combo
        """,
        # lang_script_check: same planted CJK rewrite, same
        # strip-and-measure counts and argmax tie-break as script_census,
        # then the LANG_SCRIPTS consistency map unrolled
        "lang_script_check": r"""
            WITH d AS (
              SELECT doc_id, lang,
                     CASE WHEN lang = 'zh' AND doc_id % 2 = 0
                          THEN repeat('中文网页测试 ', 40)
                          ELSE text END AS t
              FROM documents WHERE text IS NOT NULL
            ),
            c AS (
              SELECT doc_id, lang,
              length(regexp_replace(t, '[^\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic,
              length(regexp_replace(t, '[^\x{4E00}-\x{9FFF}]', '', 'g')) AS n_cjk,
              length(regexp_replace(t, '[^\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
              length(regexp_replace(t, '[^\x{0900}-\x{097F}]', '', 'g')) AS n_devanagari,
              length(regexp_replace(t, '[^\x{0370}-\x{03FF}]', '', 'g')) AS n_greek,
              length(regexp_replace(t, '[^\x{AC00}-\x{D7AF}]', '', 'g')) AS n_hangul,
              length(regexp_replace(t, '[^\x{0590}-\x{05FF}]', '', 'g')) AS n_hebrew,
              length(regexp_replace(t, '[^\x{3040}-\x{30FF}]', '', 'g')) AS n_kana,
              length(regexp_replace(t, '[^A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS n_latin
              FROM d
            ),
            m AS (
              SELECT doc_id, lang,
                     list_max([struct_pack(n := n_arabic, s := 'arabic'),
                               struct_pack(n := n_cjk, s := 'cjk'),
                               struct_pack(n := n_cyrillic, s := 'cyrillic'),
                               struct_pack(n := n_devanagari, s := 'devanagari'),
                               struct_pack(n := n_greek, s := 'greek'),
                               struct_pack(n := n_hangul, s := 'hangul'),
                               struct_pack(n := n_hebrew, s := 'hebrew'),
                               struct_pack(n := n_kana, s := 'kana'),
                               struct_pack(n := n_latin, s := 'latin')]) AS mx
              FROM c
            ),
            dm AS (
              SELECT doc_id, lang,
                     CASE WHEN mx['n'] > 0 THEN mx['s'] ELSE 'und' END AS dominant
              FROM m
            )
            SELECT doc_id, lang, dominant AS dominant_script FROM dm
            WHERE dominant <> 'und' AND (
                 (lang IN ('en','de','fr','es','pt','it','nl','tr') AND dominant <> 'latin')
              OR (lang IN ('ru','uk','bg') AND dominant <> 'cyrillic')
              OR (lang = 'zh' AND dominant <> 'cjk')
              OR (lang = 'ja' AND dominant NOT IN ('kana','cjk'))
              OR (lang = 'ko' AND dominant <> 'hangul')
              OR (lang IN ('ar','fa') AND dominant <> 'arabic')
              OR (lang = 'he' AND dominant <> 'hebrew')
              OR (lang = 'el' AND dominant <> 'greek')
              OR (lang = 'hi' AND dominant <> 'devanagari')
            )
            ORDER BY doc_id
        """,
        # js_drift: same planted relabel, same value-sorted deterministic
        # fold (list_reduce has no init — the leading 0.0+x of Spark's
        # aggregate is IEEE-identical; trailing +0.0 normalizes -0.0)
        "js_drift": """
            WITH a AS (
              SELECT CAST(source AS VARCHAR) AS v, COUNT(*) AS ca
              FROM documents WHERE doc_id % 2 = 0 AND source IS NOT NULL
              GROUP BY 1
            ),
            b0 AS (
              SELECT CASE WHEN doc_id % 19 = 0 THEN 'newsrc'
                          ELSE CAST(source AS VARCHAR) END AS v
              FROM documents WHERE doc_id % 2 = 1 AND source IS NOT NULL
            ),
            b AS (SELECT v, COUNT(*) AS cb FROM b0 GROUP BY 1),
            j AS (
              SELECT COALESCE(a.v, b.v) AS v,
                     COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.v = b.v
            ),
            one AS (
              SELECT list_sort(list(struct_pack(v := v, ca := ca, cb := cb))) AS g,
                     CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
              FROM j
            )
            SELECT 'source' AS "column", na AS n_a, nb AS n_b,
                   CAST(len(g) AS BIGINT) AS n_values,
                   round(list_reduce(list_transform(g, s ->
                       0.5 * (CASE WHEN s.ca > 0
                                   THEN (CAST(s.ca AS DOUBLE) / CAST(na AS DOUBLE))
                                        * ln((CAST(s.ca AS DOUBLE) / CAST(na AS DOUBLE))
                                             / ((CAST(s.ca AS DOUBLE) / CAST(na AS DOUBLE)
                                                 + CAST(s.cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
                                   ELSE 0.0 END)
                       + 0.5 * (CASE WHEN s.cb > 0
                                     THEN (CAST(s.cb AS DOUBLE) / CAST(nb AS DOUBLE))
                                          * ln((CAST(s.cb AS DOUBLE) / CAST(nb AS DOUBLE))
                                               / ((CAST(s.ca AS DOUBLE) / CAST(na AS DOUBLE)
                                                   + CAST(s.cb AS DOUBLE) / CAST(nb AS DOUBLE)) / 2.0))
                                     ELSE 0.0 END)),
                       (acc, x) -> acc + x) + 0.0, 6) AS value
            FROM one
        """,
        "chisq_drift": """
            WITH a AS (
              SELECT CAST(source AS VARCHAR) AS v, COUNT(*) AS ca
              FROM documents WHERE doc_id % 2 = 0 AND source IS NOT NULL
              GROUP BY 1
            ),
            b0 AS (
              SELECT CASE WHEN doc_id % 13 = 0 THEN 'src0'
                          ELSE CAST(source AS VARCHAR) END AS v
              FROM documents WHERE doc_id % 2 = 1 AND source IS NOT NULL
            ),
            b AS (SELECT v, COUNT(*) AS cb FROM b0 GROUP BY 1),
            j AS (
              SELECT COALESCE(a.v, b.v) AS v,
                     COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
              FROM a FULL OUTER JOIN b ON a.v = b.v
            ),
            one AS (
              SELECT list_sort(list(struct_pack(v := v, ca := ca, cb := cb))) AS g,
                     CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
              FROM j
            )
            SELECT 'source' AS "column", na AS n_a, nb AS n_b,
                   CAST(len(g) AS BIGINT) AS n_values,
                   CAST(len(g) - 1 AS BIGINT) AS dof,
                   CASE WHEN na > 0 AND nb > 0 THEN
                     round(list_reduce(list_transform(g, s ->
                         (CAST(s.ca AS DOUBLE)
                          - CAST(na AS DOUBLE) * CAST(s.ca + s.cb AS DOUBLE)
                            / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                         * (CAST(s.ca AS DOUBLE)
                            - CAST(na AS DOUBLE) * CAST(s.ca + s.cb AS DOUBLE)
                              / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                         / (CAST(na AS DOUBLE) * CAST(s.ca + s.cb AS DOUBLE)
                            / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                         + (CAST(s.cb AS DOUBLE)
                            - CAST(nb AS DOUBLE) * CAST(s.ca + s.cb AS DOUBLE)
                              / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                           * (CAST(s.cb AS DOUBLE)
                              - CAST(nb AS DOUBLE) * CAST(s.ca + s.cb AS DOUBLE)
                                / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                           / (CAST(nb AS DOUBLE) * CAST(s.ca + s.cb AS DOUBLE)
                              / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))),
                       (acc, x) -> acc + x) + 0.0, 6)
                   END AS value
            FROM one
        """,
        # domain_census: identical host regex, suffix list, and branch
        # order replayed over the same VALUES fixture
        # url_params: construction + extraction + pair split + grouping
        # replayed; distinct_ratio_micro is exact integer floor division
        "url_params": r"""
            WITH u AS (
              SELECT CASE WHEN doc_id % 17 = 0 THEN base
                          ELSE base || '?' || params END AS url
              FROM (
                SELECT doc_id,
                  'https://h' || CAST(doc_id % 37 AS VARCHAR)
                    || '.example.com/p/' || CAST(doc_id AS VARCHAR) AS base,
                  'id=' || CAST(doc_id AS VARCHAR)
                    || CASE WHEN doc_id % 2 = 0
                         THEN '&utm_source=s' || CAST(doc_id % 3 AS VARCHAR)
                         ELSE '' END
                    || CASE WHEN doc_id % 5 = 0 THEN '&ref=' ELSE '' END
                    || CASE WHEN doc_id % 7 = 0
                         THEN '&page=' || CAST(doc_id % 4 AS VARCHAR)
                         ELSE '' END
                    || CASE WHEN doc_id % 11 = 0
                         THEN '&fbclid=x' || CAST(doc_id AS VARCHAR)
                         ELSE '' END
                    || CASE WHEN doc_id % 13 = 0 THEN '&debug' ELSE '' END
                    AS params
                FROM documents
              )
            ), p AS (
              SELECT url,
                     regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1) AS host,
                     unnest(string_split(regexp_extract(url, '\?([^#]*)', 1), '&')) AS pair
              FROM u
            ), kv AS (
              SELECT url, host,
                     CASE WHEN strpos(pair, '=') > 0
                          THEN substr(pair, 1, strpos(pair, '=') - 1)
                          ELSE pair END AS param,
                     CASE WHEN strpos(pair, '=') > 0
                          THEN substr(pair, strpos(pair, '=') + 1) END AS value
              FROM p WHERE pair <> ''
            )
            SELECT param,
                   count(*) AS n_pairs,
                   count(DISTINCT url) AS n_urls,
                   count(DISTINCT host) AS n_hosts,
                   count(DISTINCT value) AS n_values,
                   count(*) FILTER (value IS NULL OR value = '') AS n_blank,
                   (1000000 * count(DISTINCT value)) // count(*) AS distinct_ratio_micro
            FROM kv GROUP BY param ORDER BY param
        """,
        "domain_census": r"""
            WITH u(url) AS (VALUES
              ('https://www.news.bbc.co.uk/politics/story'),
              ('http://media.bbc.co.uk/img.png'),
              ('https://example.com/'),
              ('https://a.b.c.example.com/deep?q=1#f'),
              ('http://shop.example.com:8080/cart'),
              ('https://EXAMPLE.com/UPPER'),
              ('http://192.168.10.20/admin'),
              ('http://intranet/wiki'),
              ('https://www.com.au.evil.org/phish'),
              ('not a url at all')
            ),
            h AS (
              SELECT lower(regexp_extract(url,
                       '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#\s]+)', 1)) AS host
              FROM u
            ),
            d AS (SELECT host, string_split(host, '.') AS p FROM h),
            r AS (
              SELECT host,
                     CASE WHEN host = '' THEN NULL
                          WHEN regexp_matches(host, '^\d{1,3}(\.\d{1,3}){3}$')
                               THEN host
                          WHEN len(p) >= 3 AND list_contains(
                                 ['ac.uk','co.uk','gov.uk','org.uk',
                                  'com.au','net.au','org.au',
                                  'co.jp','ne.jp','or.jp',
                                  'co.nz','co.in','co.kr','co.za',
                                  'com.ar','com.br','com.cn','com.mx',
                                  'com.sg','com.tr','com.tw'],
                                 p[-2] || '.' || p[-1])
                               THEN p[-3] || '.' || p[-2] || '.' || p[-1]
                          WHEN len(p) >= 2 THEN p[-2] || '.' || p[-1]
                          ELSE host END AS domain
              FROM d
            )
            SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_pages,
                   COUNT(DISTINCT host) AS n_hosts
            FROM r WHERE domain IS NOT NULL
            GROUP BY domain ORDER BY domain
        """,
        # reconcile_rollup: identical quantized-decimal fact sum, round-6
        # delta, same status logic, same decimal |delta| accumulation
        "reconcile_rollup": """
            WITH a AS (
              SELECT l_orderkey AS o_orderkey,
                     round(CAST(SUM(CAST(round(CAST(l_extendedprice AS DOUBLE) * 1e6) AS HUGEINT)) AS DOUBLE) / 1e6, 6) AS actual
              FROM lineitem GROUP BY 1
            ),
            e AS (
              SELECT o_orderkey, round(CAST(o_totalprice AS DOUBLE), 6) AS expected
              FROM orders
            ),
            j AS (
              SELECT COALESCE(a.o_orderkey, e.o_orderkey) AS k, actual, expected,
                     round(actual - expected, 6) AS delta
              FROM a FULL OUTER JOIN e ON a.o_orderkey = e.o_orderkey
            ),
            s AS (
              SELECT *,
                     CASE WHEN actual IS NULL THEN 'rollup_only'
                          WHEN expected IS NULL THEN 'fact_only'
                          WHEN abs(delta) > 0.01 THEN 'mismatched'
                          ELSE 'matched' END AS status
              FROM j
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(COUNT(CASE WHEN status = 'matched' THEN 1 END) AS BIGINT) AS n_matched,
                   CAST(COUNT(CASE WHEN status = 'mismatched' THEN 1 END) AS BIGINT) AS n_mismatched,
                   CAST(COUNT(CASE WHEN status = 'fact_only' THEN 1 END) AS BIGINT) AS n_fact_only,
                   CAST(COUNT(CASE WHEN status = 'rollup_only' THEN 1 END) AS BIGINT) AS n_rollup_only,
                   round(max(abs(delta)), 6) AS max_abs_delta,
                   round(CAST(SUM(CAST(round(abs(delta) * 1e6) AS HUGEINT)) AS DOUBLE) / 1e6, 6) AS sum_abs_delta
            FROM s
        """,
        # outlink_census: replay the html construction AND the regex
        # extraction (RE2 ≡ Java for these negated-class patterns)
        # dup_titles / anchor_census: replay construction (titled-page
        # fixture), RE2 extraction, whitespace normalization, and the
        # grain aggs; anchor pairs align via list_zip's positional structs
        "dup_titles": r"""
            WITH p AS (
              SELECT 'https://h' || CAST(doc_id % 23 AS VARCHAR)
                     || '.example.org/d' || CAST(doc_id AS VARCHAR) AS url,
                     '<html><head>'
                     || CASE WHEN doc_id % 11 = 0 THEN ''
                          WHEN doc_id % 13 = 0
                          THEN '<title data-x="1">  Title' || chr(9)
                               || CAST(doc_id % 37 AS VARCHAR) || '  </title>'
                          ELSE '<title>Title ' || CAST(doc_id % 37 AS VARCHAR)
                               || '</title>' END
                     || '</head><body></body></html>' AS html
              FROM documents
            ),
            t AS (
              SELECT url,
                     lower(regexp_extract(
                       url, '(?i)^https?://([^/?#]+)', 1)) AS host,
                     NULLIF(trim(regexp_replace(
                       regexp_extract(html,
                         '(?i)<title[^>]*>([^<]*)</title>', 1),
                       '\s+', ' ', 'g')), '') AS title
              FROM p
            )
            SELECT title, CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(COUNT(DISTINCT host) AS BIGINT) AS n_hosts,
                   MIN(url) AS example_url
            FROM t WHERE title IS NOT NULL
            GROUP BY title HAVING COUNT(*) >= 2
            ORDER BY title
        """,
        "anchor_census": r"""
            WITH p AS (
              SELECT doc_id,
                     'https://h' || CAST(doc_id % 23 AS VARCHAR)
                     || '.example.org/d' || CAST(doc_id AS VARCHAR) AS url,
                     '<html><head></head><body>'
                     || array_to_string(list_transform(
                          range(1, (doc_id % 3 + 1) + 1),
                          k -> '<a href="https://h'
                               || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR)
                               || '.example.org/p' || CAST(k AS VARCHAR)
                               || '">Anchor  '
                               || CAST((doc_id + k) % 5 AS VARCHAR)
                               || '</a>'), '')
                     || '<a href="/rel">skip</a></body></html>' AS html
              FROM documents
            ),
            z AS (
              SELECT url, unnest(list_zip(
                regexp_extract_all(html,
                  '(?i)<a\s[^>]*href=["'']([^"'']+)["''][^>]*>([^<]*)</a>', 1),
                regexp_extract_all(html,
                  '(?i)<a\s[^>]*href=["'']([^"'']+)["''][^>]*>([^<]*)</a>', 2)
              )) AS a FROM p
            ),
            rows_ AS (
              SELECT lower(regexp_extract(
                       url, '(?i)^https?://([^/?#]+)', 1)) AS src_host,
                     NULLIF(lower(regexp_extract(
                       a[1], '(?i)^https?://([^/?#]+)', 1)), '') AS host,
                     trim(regexp_replace(lower(a[2]), '\s+', ' ', 'g')) AS text
              FROM z
            ),
            counts AS (
              SELECT host, text, CAST(COUNT(*) AS BIGINT) AS n_links,
                     CAST(COUNT(DISTINCT src_host) AS BIGINT) AS n_src_hosts
              FROM rows_ WHERE host IS NOT NULL AND text <> ''
              GROUP BY host, text
            )
            SELECT host, text, n_links, n_src_hosts, CAST(rank AS INTEGER) AS rank
            FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY host ORDER BY n_links DESC, text ASC) AS rank
              FROM counts
            ) WHERE rank <= 3
            ORDER BY host, rank
        """,
        "outlink_census": r"""
            WITH h AS (
              SELECT doc_id,
                     '<html><body>'
                     || array_to_string(list_transform(
                          range(1, (doc_id % 4 + 1) + 1),
                          k -> '<a class="c" href="https://h'
                               || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR)
                               || '.example.org/p' || CAST(k AS VARCHAR)
                               || '">link</a>'), '')
                     || CASE WHEN doc_id % 5 = 0
                          THEN '<a href=''https://h'
                               || CAST((doc_id * 11) % 23 AS VARCHAR)
                               || '.example.org/q''>x</a>'
                          ELSE '' END
                     || '<a href="/local/1">r</a></body></html>' AS html
              FROM documents
            ),
            x AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                       html, '(?i)<a\s[^>]*href=["'']([^"'']+)["'']', 1)) AS href
              FROM h
            ),
            hosts AS (
              SELECT doc_id,
                     lower(regexp_extract(
                       href, '(?i)^https?://([^/?#]+)', 1)) AS host
              FROM x
            )
            SELECT host, CAST(COUNT(*) AS BIGINT) AS n_links,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_src_pages
            FROM hosts WHERE host IS NOT NULL AND host <> ''
            GROUP BY host ORDER BY host
        """,
        # cocitation: replay construction + extraction + per-source
        # DISTINCT host sets + degree gate + a<b pairing
        "cocitation": r"""
            WITH h AS (
              SELECT doc_id,
                     '<html><body>'
                     || array_to_string(list_transform(
                          range(1, (doc_id % 4 + 1) + 1),
                          k -> '<a class="c" href="https://h'
                               || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR)
                               || '.example.org/p' || CAST(k AS VARCHAR)
                               || '">link</a>'), '')
                     || CASE WHEN doc_id % 5 = 0
                          THEN '<a href=''https://h'
                               || CAST((doc_id * 11) % 23 AS VARCHAR)
                               || '.example.org/q''>x</a>'
                          ELSE '' END
                     || '<a href="/local/1">r</a></body></html>' AS html
              FROM documents
            ),
            x AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(
                       html, '(?i)<a\s[^>]*href=["'']([^"'']+)["'']', 1)) AS href
              FROM h
            ),
            hosts AS (
              SELECT DISTINCT doc_id,
                     lower(regexp_extract(
                       href, '(?i)^https?://([^/?#]+)', 1)) AS host
              FROM x
              WHERE regexp_extract(href, '(?i)^https?://([^/?#]+)', 1) <> ''
            ),
            deg AS (
              SELECT doc_id, COUNT(*) AS c FROM hosts GROUP BY doc_id
            ),
            ok AS (
              SELECT hosts.* FROM hosts JOIN deg USING (doc_id)
              WHERE deg.c BETWEEN 2 AND 64
            ),
            p AS (
              SELECT a.doc_id, a.host AS host_a, b.host AS host_b
              FROM ok a JOIN ok b
                ON a.doc_id = b.doc_id AND a.host < b.host
            )
            SELECT host_a, host_b, CAST(COUNT(*) AS BIGINT) AS n_cosources
            FROM p GROUP BY host_a, host_b
            ORDER BY n_cosources DESC, host_a, host_b LIMIT 30
        """,
        # frontier_hosts / reciprocal_links: replay the html+url
        # construction, the regex extraction, and the host-grain joins
        "frontier_hosts": r"""
            WITH h AS (
              SELECT doc_id,
                     'https://h' || CAST(doc_id % 17 AS VARCHAR)
                     || '.example.org/page/' || CAST(doc_id AS VARCHAR) AS url,
                     '<html><body>'
                     || array_to_string(list_transform(
                          range(1, (doc_id % 4 + 1) + 1),
                          k -> '<a class="c" href="https://h'
                               || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR)
                               || '.example.org/p' || CAST(k AS VARCHAR)
                               || '">link</a>'), '')
                     || CASE WHEN doc_id % 5 = 0
                          THEN '<a href=''https://h'
                               || CAST((doc_id * 11) % 23 AS VARCHAR)
                               || '.example.org/q''>x</a>'
                          ELSE '' END
                     || '<a href="/local/1">r</a></body></html>' AS html
              FROM documents
            ),
            x AS (
              SELECT url,
                     unnest(regexp_extract_all(
                       html, '(?i)<a\s[^>]*href=["'']([^"'']+)["'']', 1)) AS href
              FROM h
            ),
            census AS (
              SELECT lower(regexp_extract(
                       href, '(?i)^https?://([^/?#]+)', 1)) AS host,
                     CAST(COUNT(*) AS BIGINT) AS n_links,
                     CAST(COUNT(DISTINCT url) AS BIGINT) AS n_src_pages
              FROM x
              WHERE lower(regexp_extract(href, '(?i)^https?://([^/?#]+)', 1)) <> ''
              GROUP BY 1
            ),
            own AS (
              SELECT DISTINCT lower(regexp_extract(
                       url, '(?i)^https?://([^/?#]+)', 1)) AS host
              FROM h
            )
            SELECT c.host, c.n_links, c.n_src_pages
            FROM census c
            WHERE NOT EXISTS (SELECT 1 FROM own o WHERE o.host = c.host)
            ORDER BY c.host
        """,
        "reciprocal_links": r"""
            WITH h AS (
              SELECT doc_id,
                     'https://h' || CAST(doc_id % 17 AS VARCHAR)
                     || '.example.org/page/' || CAST(doc_id AS VARCHAR) AS url,
                     '<html><body>'
                     || array_to_string(list_transform(
                          range(1, (doc_id % 4 + 1) + 1),
                          k -> '<a class="c" href="https://h'
                               || CAST((doc_id * 7 + k * 13) % 23 AS VARCHAR)
                               || '.example.org/p' || CAST(k AS VARCHAR)
                               || '">link</a>'), '')
                     || CASE WHEN doc_id % 5 = 0
                          THEN '<a href=''https://h'
                               || CAST((doc_id * 11) % 23 AS VARCHAR)
                               || '.example.org/q''>x</a>'
                          ELSE '' END
                     || '<a href="/local/1">r</a></body></html>' AS html
              FROM documents
            ),
            x AS (
              SELECT lower(regexp_extract(
                       url, '(?i)^https?://([^/?#]+)', 1)) AS src,
                     unnest(regexp_extract_all(
                       html, '(?i)<a\s[^>]*href=["'']([^"'']+)["'']', 1)) AS href
              FROM h
            ),
            e AS (
              SELECT src,
                     lower(regexp_extract(
                       href, '(?i)^https?://([^/?#]+)', 1)) AS dst,
                     CAST(COUNT(*) AS BIGINT) AS n_links
              FROM x
              WHERE lower(regexp_extract(href, '(?i)^https?://([^/?#]+)', 1)) <> ''
                AND lower(regexp_extract(href, '(?i)^https?://([^/?#]+)', 1)) <> src
              GROUP BY 1, 2
            )
            SELECT a.src AS host_a, a.dst AS host_b,
                   a.n_links AS ab_links, b.n_links AS ba_links
            FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
            WHERE a.src < a.dst
            ORDER BY host_a, host_b
        """,
        # robots_rules / robots_blocked: replay the relational robots.txt
        # parse (explode + lag/cumsum record ids) and the prefix-match
        # audit over the same fixture
        "robots_rules": r"""
            WITH robots(host, txt) AS (VALUES
              ('h0.example.org', e'# crawl policy\nUser-agent: *\r\nDisallow: /private/\nDisallow:\n\nUser-agent: bot\nDisallow: /botonly/\n'),
              ('h1.example.org', e'User-agent: bot\nUser-agent: *\nDisallow: /secret\n'),
              ('h2.example.org', e'User-agent: bot\nDisallow: /x\n'),
              ('h3.example.org', e'user-AGENT:   *\nDISALLOW: /Case/\ndisallow: /wild*card\n'),
              ('h4.example.org', '')
            ),
            sp AS (SELECT host, string_split(txt, chr(10)) AS l FROM robots),
            lines AS (
              SELECT host, i AS pos,
                     trim(regexp_replace(regexp_replace(l[i], '\r', ''),
                                         '#.*$', '')) AS line
              FROM sp, UNNEST(range(1, len(l) + 1)) AS r(i)
            ),
            f AS (
              SELECT host, pos,
                     lower(regexp_extract(line, '^([A-Za-z-]+)\s*:', 1)) AS field,
                     trim(regexp_extract(line, '^[A-Za-z-]+\s*:\s*(.*)$', 1)) AS value
              FROM lines
            ),
            m AS (
              SELECT *, CASE WHEN field = 'user-agent' THEN 1 ELSE 0 END AS is_ua
              FROM f
            ),
            m2 AS (
              SELECT *, COALESCE(LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), 0)
                          AS prev_ua
              FROM m
            ),
            m3 AS (
              SELECT *, SUM(CASE WHEN is_ua = 1 AND prev_ua = 0 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY host ORDER BY pos) AS rec
              FROM m2
            ),
            star AS (
              SELECT DISTINCT host, rec FROM m3
              WHERE field = 'user-agent' AND value = '*'
            )
            SELECT DISTINCT m3.host, m3.value AS rule,
                   regexp_matches(m3.value, '[*$]') AS has_wildcard
            FROM m3 JOIN star ON m3.host = star.host AND m3.rec = star.rec
            WHERE m3.field = 'disallow' AND m3.value <> ''
            ORDER BY 1, 2
        """,
        "robots_blocked": r"""
            WITH robots(host, txt) AS (VALUES
              ('h0.example.org', e'# crawl policy\nUser-agent: *\r\nDisallow: /private/\nDisallow:\n\nUser-agent: bot\nDisallow: /botonly/\n'),
              ('h1.example.org', e'User-agent: bot\nUser-agent: *\nDisallow: /secret\n'),
              ('h2.example.org', e'User-agent: bot\nDisallow: /x\n'),
              ('h3.example.org', e'user-AGENT:   *\nDISALLOW: /Case/\ndisallow: /wild*card\n'),
              ('h4.example.org', '')
            ),
            sp AS (SELECT host, string_split(txt, chr(10)) AS l FROM robots),
            lines AS (
              SELECT host, i AS pos,
                     trim(regexp_replace(regexp_replace(l[i], '\r', ''),
                                         '#.*$', '')) AS line
              FROM sp, UNNEST(range(1, len(l) + 1)) AS r(i)
            ),
            f AS (
              SELECT host, pos,
                     lower(regexp_extract(line, '^([A-Za-z-]+)\s*:', 1)) AS field,
                     trim(regexp_extract(line, '^[A-Za-z-]+\s*:\s*(.*)$', 1)) AS value
              FROM lines
            ),
            m AS (
              SELECT *, CASE WHEN field = 'user-agent' THEN 1 ELSE 0 END AS is_ua
              FROM f
            ),
            m2 AS (
              SELECT *, COALESCE(LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), 0)
                          AS prev_ua
              FROM m
            ),
            m3 AS (
              SELECT *, SUM(CASE WHEN is_ua = 1 AND prev_ua = 0 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY host ORDER BY pos) AS rec
              FROM m2
            ),
            star AS (
              SELECT DISTINCT host, rec FROM m3
              WHERE field = 'user-agent' AND value = '*'
            ),
            rules AS (
              SELECT DISTINCT m3.host, m3.value AS rule,
                     regexp_matches(m3.value, '[*$]') AS has_wildcard
              FROM m3 JOIN star ON m3.host = star.host AND m3.rec = star.rec
              WHERE m3.field = 'disallow' AND m3.value <> ''
            ),
            pages AS (
              SELECT doc_id,
                     'https://h' || CAST(doc_id % 5 AS VARCHAR) || '.example.org'
                     || CASE doc_id % 7
                          WHEN 0 THEN '/private/a' WHEN 1 THEN '/secret-page'
                          WHEN 2 THEN '/Case/x'    WHEN 3 THEN '/case/x'
                          WHEN 4 THEN '/wildXcard/z' WHEN 5 THEN ''
                          ELSE '/ok' END AS url
              FROM documents
            ),
            p2 AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url, '(?i)^https?://([^/?#]+)', 1)) AS host,
                     CASE WHEN regexp_extract(url,
                            '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^#]*)?', 1) = ''
                          THEN '/'
                          ELSE regexp_extract(url,
                            '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^#]*)?', 1) END AS path
              FROM pages
            )
            SELECT p2.doc_id, p2.url, p2.host, p2.path
            FROM p2
            WHERE EXISTS (SELECT 1 FROM rules r
                          WHERE NOT r.has_wildcard AND r.host = p2.host
                            AND starts_with(p2.path, r.rule))
            ORDER BY p2.doc_id
        """,
        # sitemap_coverage: replay <loc> extraction, dedup, url-grain
        # membership join, and the host census
        "sitemap_coverage": r"""
            WITH sm(host, txt) AS (VALUES
              ('h0.example.org',
               '<?xml version="1.0"?><urlset><url><loc>https://h0.example.org/p/0</loc></url><url><LOC>  https://h0.example.org/p/4' || chr(10) || '</LOC></url><url><loc>https://h0.example.org/p/9</loc></url><url><loc>https://h0.example.org/p/0</loc></url></urlset>'),
              ('h1.example.org',
               '<urlset><loc>https://h1.example.org/p/1</loc><loc>https://h1.example.org/p/99999</loc></urlset>'),
              ('h2.example.org', '<urlset><notloc>x</notloc></urlset>')
            ),
            listed AS (
              SELECT DISTINCT host,
                     unnest(regexp_extract_all(txt,
                       '(?i)<loc>\s*([^<\s]+)\s*</loc>', 1)) AS url
              FROM sm
            ),
            corpus AS (
              SELECT DISTINCT
                     'https://h' || CAST(doc_id % 4 AS VARCHAR)
                     || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url
              FROM documents
            )
            SELECT l.host,
                   CAST(COUNT(*) AS BIGINT) AS n_listed,
                   CAST(COUNT(c.url) AS BIGINT) AS n_crawled,
                   CAST(COUNT(*) - COUNT(c.url) AS BIGINT) AS n_missing
            FROM listed l LEFT JOIN corpus c ON l.url = c.url
            GROUP BY l.host ORDER BY l.host
        """,
        # canonical_census: replay the html construction and BOTH
        # attribute-order regexes (rel-first precedence) + the host math
        "canonical_census": r"""
            WITH h AS (
              SELECT doc_id,
                     'https://s' || CAST(doc_id % 4 AS VARCHAR)
                       || '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
                     '<html><head>' ||
                     CASE doc_id % 6
                       WHEN 0 THEN '<link rel="canonical" href="https://c'
                                   || CAST(doc_id % 9 AS VARCHAR)
                                   || '.example.org/page">'
                       WHEN 1 THEN '<link href="https://c'
                                   || CAST(doc_id % 9 AS VARCHAR)
                                   || '.example.org/page" rel="canonical">'
                       WHEN 2 THEN '<LINK REL=''canonical'' HREF=''https://c'
                                   || CAST(doc_id % 9 AS VARCHAR)
                                   || '.example.org/page''>'
                       WHEN 3 THEN '<link rel="stylesheet" href="https://x.com/s.css">'
                       WHEN 4 THEN '<link rel="canonical" href="https://s'
                                   || CAST(doc_id % 4 AS VARCHAR)
                                   || '.example.org/canon">'
                       ELSE '<link rel="canonical" href="https://c'
                            || CAST(doc_id % 9 AS VARCHAR)
                            || '.example.org/page"><link href="https://loser.example.org/x" rel="canonical">'
                     END || '</head><body>b</body></html>' AS html
              FROM documents
            ),
            x AS (
              SELECT url, html,
                     regexp_extract(html,
                       '(?i)<link\s[^>]*rel=["'']canonical["''][^>]*href=["'']([^"'']+)["'']',
                       1) AS rel_first,
                     regexp_extract(html,
                       '(?i)<link\s[^>]*href=["'']([^"'']+)["''][^>]*rel=["'']canonical["'']',
                       1) AS href_first
              FROM h
            ),
            c AS (
              SELECT lower(regexp_extract(url, '(?i)^https?://([^/?#]+)', 1))
                       AS src_host,
                     CASE WHEN rel_first <> '' THEN rel_first
                          WHEN href_first <> '' THEN href_first END AS canonical
              FROM x
            )
            SELECT canonical,
                   CAST(COUNT(*) AS BIGINT) AS n_pages,
                   CAST(COUNT(DISTINCT src_host) AS BIGINT) AS n_src_hosts,
                   CAST(COUNT(CASE WHEN
                     lower(regexp_extract(canonical, '(?i)^https?://([^/?#]+)', 1)) <> ''
                     AND lower(regexp_extract(canonical, '(?i)^https?://([^/?#]+)', 1))
                         <> src_host THEN 1 END) AS BIGINT) AS n_offhost
            FROM c WHERE canonical IS NOT NULL
            GROUP BY canonical ORDER BY canonical
        """,
        # crawl_delay_audit: replay the star-record parse with try_cast,
        # max-per-host delay, md5 fetch-time construction, and the
        # host-grain lag window
        "crawl_delay_audit": r"""
            WITH robots(host, txt) AS (VALUES
              ('h0.example.org', e'User-agent: *\nCrawl-delay: 10\nDisallow: /x\n'),
              ('h1.example.org', e'User-agent: *\nCrawl-delay: 2.5\nCrawl-delay: oops\n'),
              ('h2.example.org', e'User-agent: bot\nCrawl-delay: 9\n'),
              ('h3.example.org', e'User-agent: *\nDisallow: /y\n'),
              ('h4.example.org', e'User-agent: *\nCrawl-delay: 1\nUser-agent: zbot\nCrawl-delay: 99\n')
            ),
            sp AS (SELECT host, string_split(txt, chr(10)) AS l FROM robots),
            lines AS (
              SELECT host, i AS pos,
                     trim(regexp_replace(regexp_replace(l[i], '\r', ''),
                                         '#.*$', '')) AS line
              FROM sp, UNNEST(range(1, len(l) + 1)) AS r(i)
            ),
            f AS (
              SELECT host, pos,
                     lower(regexp_extract(line, '^([A-Za-z-]+)\s*:', 1)) AS field,
                     trim(regexp_extract(line, '^[A-Za-z-]+\s*:\s*(.*)$', 1)) AS value
              FROM lines
            ),
            m AS (
              SELECT *, CASE WHEN field = 'user-agent' THEN 1 ELSE 0 END AS is_ua
              FROM f
            ),
            m2 AS (
              SELECT *, COALESCE(LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), 0)
                          AS prev_ua
              FROM m
            ),
            m3 AS (
              SELECT *, SUM(CASE WHEN is_ua = 1 AND prev_ua = 0 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY host ORDER BY pos) AS rec
              FROM m2
            ),
            star AS (
              SELECT DISTINCT host, rec FROM m3
              WHERE field = 'user-agent' AND value = '*'
            ),
            delays AS (
              SELECT m3.host, MAX(TRY_CAST(m3.value AS DOUBLE)) AS crawl_delay_s
              FROM m3 JOIN star ON m3.host = star.host AND m3.rec = star.rec
              WHERE m3.field = 'crawl-delay'
                AND TRY_CAST(m3.value AS DOUBLE) > 0
              GROUP BY m3.host
            ),
            pages AS (
              SELECT 'https://h' || CAST(user_id % 5 AS VARCHAR)
                       || '.example.org/u/' || CAST(event_id AS VARCHAR) AS url,
                     make_timestamp((1600000000
                       + CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                              AS BIGINT) % 50000) * 1000000) AS fetch_ts
              FROM events
            ),
            p2 AS (
              SELECT lower(regexp_extract(url, '(?i)^https?://([^/?#]+)', 1)) AS host,
                     url, fetch_ts
              FROM pages
            ),
            j AS (
              SELECT p2.host, p2.url, p2.fetch_ts, d.crawl_delay_s
              FROM p2 JOIN delays d ON p2.host = d.host
            ),
            g AS (
              SELECT *,
                     CAST(epoch(fetch_ts) AS DOUBLE)
                     - LAG(CAST(epoch(fetch_ts) AS DOUBLE)) OVER
                         (PARTITION BY host ORDER BY fetch_ts, url) AS gap_s
              FROM j
            )
            SELECT host, url, fetch_ts, gap_s, crawl_delay_s
            FROM g WHERE gap_s IS NOT NULL AND gap_s < crawl_delay_s
            ORDER BY host, fetch_ts, url
        """,
        # noindex_pages: same two attribute-order regexes, lowercased
        # content, googlebot meta must not flag
        "noindex_pages": r"""
            WITH h AS (
              SELECT doc_id,
                     '<html><head>'
                     || CASE doc_id % 7
                          WHEN 0 THEN '<meta name="robots" content="noindex">'
                          WHEN 1 THEN '<meta name="ROBOTS" content="NOINDEX, NOFOLLOW">'
                          WHEN 2 THEN '<meta content="nofollow" name="robots">'
                          WHEN 3 THEN '<meta name="googlebot" content="noindex">'
                          ELSE '<meta charset="utf-8">' END
                     || '</head><body><p>b</p></body></html>' AS html
              FROM documents
            ),
            r AS (
              SELECT doc_id,
                     lower(CASE WHEN regexp_extract(html,
                         '(?i)<meta\s[^>]*name=["'']robots["''][^>]*content=["'']([^"'']*)["'']', 1) <> ''
                       THEN regexp_extract(html,
                         '(?i)<meta\s[^>]*name=["'']robots["''][^>]*content=["'']([^"'']*)["'']', 1)
                       ELSE regexp_extract(html,
                         '(?i)<meta\s[^>]*content=["'']([^"'']*)["''][^>]*name=["'']robots["'']', 1)
                       END) AS content
              FROM h
            )
            SELECT doc_id,
                   contains(content, 'noindex') AS noindex,
                   contains(content, 'nofollow') AS nofollow
            FROM r
            WHERE contains(content, 'noindex') OR contains(content, 'nofollow')
            ORDER BY doc_id
        """,
        # fk_cardinality: same class cuts; fact_orphan is a global agg so
        # it emits a row even at count 0 (matches the Spark union branch)
        "fk_cardinality": """
            WITH pk AS (
              SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1
            ),
            dk AS (SELECT DISTINCT c_custkey AS k FROM customer),
            j AS (
              SELECT dk.k AS dkk, COALESCE(pk.n, 0) AS n,
                     dk.k IS NOT NULL AS in_dim
              FROM dk FULL OUTER JOIN pk ON dk.k = pk.k
            ),
            dim_side AS (
              SELECT CASE WHEN n < 1 THEN '0'
                          WHEN n < 2 THEN '1'
                          WHEN n < 4 THEN '2-3'
                          ELSE '4+' END AS card_class,
                     CAST(COUNT(*) AS BIGINT) AS n_keys
              FROM j WHERE in_dim GROUP BY 1
            ),
            orphans AS (
              SELECT 'fact_orphan' AS card_class,
                     CAST(COUNT(*) AS BIGINT) AS n_keys
              FROM j WHERE NOT in_dim
            )
            SELECT * FROM dim_side UNION ALL SELECT * FROM orphans
            ORDER BY card_class
        """,
        # rate_anomaly: quantile_cont ≡ F.percentile; identical round-6
        # quantization at every stage and identical multiply order
        "rate_anomaly": """
            WITH c AS (
              SELECT date_trunc('day', ts) AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            m AS (
              SELECT round(quantile_cont(CAST(n AS DOUBLE), 0.5), 6) AS center
              FROM c
            ),
            s AS (
              SELECT center,
                     round(2.0 * 1.4826 * round(
                       quantile_cont(abs(CAST(n AS DOUBLE) - center), 0.5), 6
                     ), 6) AS spread
              FROM c, m GROUP BY center
            )
            SELECT bucket, n, center, spread,
                   abs(CAST(n AS DOUBLE) - center) > spread AS is_anomaly
            FROM c, s ORDER BY bucket
        """,
        # cusum_shift: all-BIGINT CUSUM (S_k scaled ×n_buckets so no float
        # forms); integer div (//) replays Spark's `div`; argmax rank order
        # (abs desc, bucket asc) identical in both engines
        "cusum_shift": """
            WITH c AS (
              SELECT date_trunc('day', ts) AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            s AS (
              SELECT bucket, n,
                     CAST(ROW_NUMBER() OVER (ORDER BY bucket) AS BIGINT) AS k,
                     CAST(SUM(n) OVER (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                     CAST(SUM(n) OVER () AS BIGINT) AS total,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n_buckets
              FROM c
            ),
            t AS (
              SELECT bucket, k, n,
                     n_buckets * cum - k * total AS cusum_scaled,
                     (1000000 * cum) // k AS mean_before_micro,
                     CASE WHEN k < n_buckets
                          THEN (1000000 * (total - cum)) // (n_buckets - k)
                     END AS mean_after_micro
              FROM s
            )
            SELECT bucket, k, n, cusum_scaled,
                   mean_before_micro, mean_after_micro,
                   ROW_NUMBER() OVER (ORDER BY abs(cusum_scaled) DESC, bucket ASC) = 1
                     AS is_change_point
            FROM t ORDER BY bucket
        """,
        # neyman_plan: exact HUGEINT moments (v_micro = n_chars*10^6, no
        # rounding ambiguity on an int column), one IEEE sqrt per
        # stratum, stratum-ordered list_reduce fold for the share
        # denominator (Spark's aggregate+0.0 discipline), floor + largest
        # remainder with (frac desc, stratum asc) ties; weight/quota
        # deliberately UNROUNDED (round(x,6) boundary behavior differs
        # across engines; the raw IEEE doubles are identical)
        "neyman_plan": """
            WITH s AS (
              SELECT source AS stratum,
                     CAST(COUNT(*) AS BIGINT) AS n_rows,
                     SUM(CAST(n_chars AS HUGEINT) * 1000000) AS s1,
                     SUM((CAST(n_chars AS HUGEINT) * 1000000)
                         * (CAST(n_chars AS HUGEINT) * 1000000)) AS s2,
                     CAST(COUNT(n_chars) AS BIGINT) AS n_vals
              FROM documents GROUP BY 1
            ),
            w AS (
              SELECT stratum, n_rows,
                     sqrt(greatest(0.0,
                       CAST(CAST(n_vals AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)))
                       AS weight
              FROM s
            ),
            ft AS (
              SELECT list(weight ORDER BY stratum) AS ws,
                     list(n_rows ORDER BY stratum) AS ns
              FROM w
            ),
            tot AS (
              SELECT list_reduce(list_prepend(0.0, ws), (a, x) -> a + x)
                       + 0.0 AS w_total,
                     list_reduce(list_prepend(CAST(0 AS BIGINT), ns),
                                 (a, x) -> a + x) AS n_total
              FROM ft
            ),
            q AS (
              SELECT w.stratum, w.n_rows, w.weight,
                     100 * (CASE WHEN t.w_total > 0
                                 THEN w.weight / t.w_total
                                 ELSE CAST(w.n_rows AS DOUBLE)
                                      / CAST(t.n_total AS DOUBLE) END)
                       AS quota_raw
              FROM w CROSS JOIN tot t
            ),
            b AS (
              SELECT stratum, n_rows, weight,
                     quota_raw AS quota,
                     CAST(floor(quota_raw) AS BIGINT) AS base,
                     quota_raw - floor(quota_raw) AS frac
              FROM q
            )
            SELECT stratum, n_rows, weight, quota,
                   base + CASE WHEN ROW_NUMBER() OVER
                       (ORDER BY frac DESC, stratum ASC)
                       <= 100 - SUM(base) OVER () THEN 1 ELSE 0 END
                     AS alloc_n,
                   (base + CASE WHEN ROW_NUMBER() OVER
                       (ORDER BY frac DESC, stratum ASC)
                       <= 100 - SUM(base) OVER () THEN 1 ELSE 0 END)
                     > n_rows AS over_allocated
            FROM b ORDER BY stratum
        """,
        # evolving_union: the widening rules replayed as explicit casts +
        # NULL fill in a UNION ALL (doc_id int+long->BIGINT, n_chars
        # int+double->DOUBLE, source added later -> NULL for month 1)
        "evolving_union": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS DOUBLE) AS n_chars,
                   lang,
                   CAST(NULL AS VARCHAR) AS source
            FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 50
            UNION ALL
            SELECT doc_id, CAST(n_chars AS DOUBLE), lang, source
            FROM documents
            WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 >= 50
            ORDER BY doc_id
        """,
        # group_cusum: the cusum_shift algebra partitioned by key; same
        # integer scaling, same (abs desc, bucket asc) per-key argmax
        "group_cusum": """
            WITH c AS (
              SELECT event_type AS key, date_trunc('day', ts) AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            s AS (
              SELECT key, bucket, n,
                     CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY bucket)
                       AS BIGINT) AS k,
                     CAST(SUM(n) OVER (PARTITION BY key ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum,
                     CAST(SUM(n) OVER (PARTITION BY key) AS BIGINT) AS total,
                     CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT)
                       AS n_buckets
              FROM c
            ),
            t AS (
              SELECT key, bucket, k, n_buckets,
                     n_buckets * cum - k * total AS cusum_scaled,
                     (1000000 * cum) // k AS mean_before_micro,
                     CASE WHEN k < n_buckets
                          THEN (1000000 * (total - cum)) // (n_buckets - k)
                     END AS mean_after_micro
              FROM s WHERE n_buckets >= 4
            )
            SELECT key, n_buckets, bucket, k, cusum_scaled,
                   mean_before_micro, mean_after_micro,
                   mean_after_micro - mean_before_micro AS shift_micro
            FROM (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY key ORDER BY abs(cusum_scaled) DESC, bucket ASC
              ) AS rk FROM t
            ) WHERE rk = 1
            ORDER BY key
        """,
        # fertility_by_lang: ws token count replayed as non-blank split
        # length, bpe count as the shared ASCII-safe regex (Java/RE2
        # agree); integer micro quotient
        "fertility_by_lang": r"""
            SELECT lang,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\s+'))
                            END) AS BIGINT) AS ws_tokens,
                   CAST(SUM(len(regexp_extract_all(
                       text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
                     AS bpe_tokens,
                   CASE WHEN CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                                  ELSE len(regexp_split_to_array(trim(text), '\s+'))
                                  END) AS BIGINT) > 0
                        THEN (1000000 * CAST(SUM(len(regexp_extract_all(
                               text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT))
                             // CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                                  ELSE len(regexp_split_to_array(trim(text), '\s+'))
                                  END) AS BIGINT)
                   END AS fertility_micro
            FROM documents WHERE text IS NOT NULL
            GROUP BY lang ORDER BY lang
        """,
        # style_distance: identical tokenization (lower + \s+ split, empty
        # dropped), identical top-50 vocabulary tie-break (count desc,
        # word asc), integer micro profiles, L1 fold — HUGEINT sums cast
        # down
        "style_distance": """
            WITH c AS (
              SELECT grp, word, CAST(COUNT(*) AS BIGINT) AS n
              FROM (SELECT source AS grp,
                           unnest(list_filter(
                             regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '')) AS word
                    FROM documents WHERE text IS NOT NULL)
              GROUP BY 1, 2
            ),
            t AS (SELECT grp, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY grp),
            v AS (
              SELECT word FROM (
                SELECT word,
                       ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, word ASC) AS rk
                FROM c GROUP BY word
              ) WHERE rk <= 50
            ),
            g AS (SELECT t.grp, t.total, v.word FROM t CROSS JOIN v),
            p AS (
              SELECT g.grp, g.word,
                     (1000000 * COALESCE(c.n, 0)) // g.total AS f
              FROM g LEFT JOIN c ON c.grp = g.grp AND c.word = g.word
            )
            SELECT a.grp AS group_a, b.grp AS group_b,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(ABS(a.f - b.f)) AS BIGINT) AS delta_micro
            FROM p a JOIN p b ON a.word = b.word AND a.grp < b.grp
            GROUP BY 1, 2
            ORDER BY 1, 2
        """,
        # kcore: 10 identical synchronous peel rounds unrolled as CTEs
        # (generator above); bounded == converged because an empty round
        # is a fixpoint
        "kcore": _kcore_oracle_sql(k=3, rounds=10),
        "label_communities": _lpa_oracle_sql(rounds=4),
        # corpus_overlap: identical fingerprint (md5 of normalized text),
        # identical hash_bucket replay, same tag->union->membership->fold
        # algebra; micro ratios guarded on 0 denominators
        "corpus_overlap": """
            WITH tagged AS (
              SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f,
                     1 AS in_a, 0 AS in_b
              FROM documents
              WHERE text IS NOT NULL
                AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 60
              UNION ALL
              SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
                     0, 1
              FROM documents
              WHERE text IS NOT NULL
                AND CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 >= 40
            ),
            m AS (
              SELECT f, MAX(in_a) AS in_a, MAX(in_b) AS in_b
              FROM tagged GROUP BY f
            ),
            folded AS (
              SELECT CAST(COALESCE(SUM(in_a), 0) AS BIGINT) AS n_a,
                     CAST(COALESCE(SUM(in_b), 0) AS BIGINT) AS n_b,
                     CAST(COALESCE(SUM(in_a * in_b), 0) AS BIGINT) AS n_common,
                     CAST(COUNT(*) AS BIGINT) AS n_union
              FROM m
            )
            SELECT n_a, n_b, n_common, n_union,
                   CASE WHEN n_union > 0
                        THEN (1000000 * n_common) // n_union END AS jaccard_micro,
                   CASE WHEN n_a > 0
                        THEN (1000000 * n_common) // n_a END AS containment_a_micro,
                   CASE WHEN n_b > 0
                        THEN (1000000 * n_common) // n_b END AS containment_b_micro
            FROM folded
        """,
        # cms_point_est: the ENTIRE sketch construction replayed -- same
        # tokenizer, same md5(term || ':' || row) 60-bit cell hash mod
        # width, same cell groupBy, same MIN-over-rows estimator; the
        # top-50 cut uses the identical (cnt DESC, term) tie-break
        # kmv_overlap (round 4): the md5-prefix hash path replays the WHOLE
        # KMV estimator — bottom-k sketches, mergeable union, (k-1)/u_k,
        # Jaccard sample — bit-for-bit; 2^60 = 1152921504606846976
        "kmv_overlap": """
            WITH fp AS (
              SELECT doc_id,
                     md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
              FROM documents WHERE text IS NOT NULL
            ),
            bkt AS (
              SELECT fp,
                     CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                          AS BIGINT) % 100 AS b
              FROM fp
            ),
            ska AS (
              SELECT DISTINCT CAST(('0x' || substr(md5(fp), 1, 15)) AS BIGINT) AS h
              FROM bkt WHERE b < 60 ORDER BY h LIMIT 256
            ),
            skb AS (
              SELECT DISTINCT CAST(('0x' || substr(md5(fp), 1, 15)) AS BIGINT) AS h
              FROM bkt WHERE b >= 40 ORDER BY h LIMIT 256
            ),
            sa AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM ska),
            sb AS (SELECT COUNT(*) AS n, MAX(h) AS hk FROM skb),
            sku AS (
              SELECT DISTINCT h FROM (
                SELECT h FROM ska UNION ALL SELECT h FROM skb
              ) ORDER BY h LIMIT 256
            ),
            bth AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
                     CAST(COALESCE(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
                                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_both,
                     MAX(u.h) AS h_k
              FROM sku u
              LEFT JOIN ska a ON u.h = a.h
              LEFT JOIN skb b ON u.h = b.h
            )
            SELECT CAST(256 AS INTEGER) AS k,
                   k_used,
                   (SELECT CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                           ELSE CAST(255 AS DOUBLE)
                                / (CAST(hk AS DOUBLE) / 1152921504606846976.0)
                           END FROM sa) AS est_a,
                   (SELECT CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                           ELSE CAST(255 AS DOUBLE)
                                / (CAST(hk AS DOUBLE) / 1152921504606846976.0)
                           END FROM sb) AS est_b,
                   CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
                        ELSE CAST(255 AS DOUBLE)
                             / (CAST(h_k AS DOUBLE) / 1152921504606846976.0)
                        END AS est_union,
                   CASE WHEN k_used > 0 THEN
                        (CASE WHEN k_used < 256 THEN CAST(k_used AS DOUBLE)
                              ELSE CAST(255 AS DOUBLE)
                                   / (CAST(h_k AS DOUBLE) / 1152921504606846976.0)
                              END
                         * CAST(n_both AS DOUBLE)) / CAST(k_used AS DOUBLE)
                        END AS est_intersection,
                   CASE WHEN k_used > 0 THEN (1000000 * n_both) // k_used
                        END AS est_jaccard_micro
            FROM bth
        """,
        "cms_point_est": """
            WITH toks AS (
              SELECT term FROM (
                SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                       AS term
                FROM documents WHERE text IS NOT NULL
              ) WHERE term <> ''
            ),
            tf AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM toks GROUP BY term
            ),
            top AS (
              SELECT term, exact_cnt FROM tf
              ORDER BY exact_cnt DESC, term LIMIT 50
            ),
            rows_j AS (SELECT unnest([0, 1, 2, 3]) AS j),
            cells AS (
              SELECT j AS row_idx,
                     CAST(('0x' || substr(md5(term || ':' || j), 1, 15))
                          AS BIGINT) % 1024 AS col_idx
              FROM toks, rows_j
            ),
            sk AS (
              SELECT row_idx, col_idx, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM cells GROUP BY row_idx, col_idx
            ),
            probe AS (
              SELECT t.term, j AS row_idx,
                     CAST(('0x' || substr(md5(t.term || ':' || j), 1, 15))
                          AS BIGINT) % 1024 AS col_idx
              FROM top t, rows_j
            ),
            est AS (
              SELECT p.term,
                     MIN(COALESCE(sk.cnt, 0)) AS cms_est
              FROM probe p LEFT JOIN sk USING (row_idx, col_idx)
              GROUP BY p.term
            )
            SELECT top.term, top.exact_cnt, est.cms_est
            FROM top JOIN est USING (term)
            ORDER BY term
        """,
        # volume_trend: pairwise slopes in integer micro-units (DuckDB //
        # == Spark div, both truncate toward zero incl. negatives); lower
        # median under (slope, ka, kb); Sen intercept = lower median of
        # residuals at the chosen slope; Mann-Kendall S as an exact CASE
        # sum — no float ever forms in either engine
        "volume_trend": """
            WITH c AS (
              SELECT date_trunc('day', ts) AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            s AS (
              SELECT bucket, n,
                     CAST(ROW_NUMBER() OVER (ORDER BY bucket) AS BIGINT) AS k
              FROM c
            ),
            p AS (
              SELECT a.k AS ka, b.k AS kb,
                     (1000000 * (b.n - a.n)) // (b.k - a.k) AS slope_micro,
                     CAST(CASE WHEN b.n > a.n THEN 1
                               WHEN b.n < a.n THEN -1 ELSE 0 END AS BIGINT) AS sgn
              FROM s a JOIN s b ON b.k > a.k
            ),
            pr AS (
              SELECT slope_micro, sgn,
                     CAST(ROW_NUMBER() OVER
                       (ORDER BY slope_micro, ka, kb) AS BIGINT) AS r,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n_pairs
              FROM p
            ),
            sl AS (
              SELECT MAX(n_pairs) AS n_pairs,
                     MAX(CASE WHEN r = (n_pairs + 1) // 2
                              THEN slope_micro END) AS slope_micro,
                     CAST(SUM(sgn) AS BIGINT) AS mk_s
              FROM pr
            ),
            resid AS (
              SELECT sl.n_pairs, sl.slope_micro, sl.mk_s,
                     1000000 * s.n - sl.slope_micro * s.k AS resid_micro,
                     s.k,
                     CAST(ROW_NUMBER() OVER
                       (ORDER BY 1000000 * s.n - sl.slope_micro * s.k, s.k)
                       AS BIGINT) AS r,
                     CAST(COUNT(*) OVER () AS BIGINT) AS n_buckets
              FROM s CROSS JOIN sl
            )
            SELECT MAX(n_buckets) AS n_buckets,
                   MAX(n_pairs) AS n_pairs,
                   MAX(slope_micro) AS slope_micro,
                   MAX(CASE WHEN r = (n_buckets + 1) // 2
                            THEN resid_micro END) AS intercept_micro,
                   MAX(mk_s) AS mk_s,
                   CASE WHEN MAX(mk_s) > 0 THEN 'increasing'
                        WHEN MAX(mk_s) < 0 THEN 'decreasing'
                        ELSE 'flat' END AS trend
            FROM resid
        """,
        # seasonality_profile: DuckDB isodow (Mon=1..Sun=7) == Spark
        # weekday()+1; integer micro shares; peak rank (n desc, hour asc)
        "seasonality_profile": """
            WITH cells AS (
              SELECT CAST(isodow(ts) AS BIGINT) AS dow,
                     CAST(hour(ts) AS BIGINT) AS hour,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1, 2
            ),
            t AS (
              SELECT dow, hour, n,
                     CAST(SUM(n) OVER (PARTITION BY dow) AS BIGINT) AS dow_total
              FROM cells
            )
            SELECT dow, hour, n, dow_total,
                   (1000000 * n) // dow_total AS share_micro,
                   ROW_NUMBER() OVER
                     (PARTITION BY dow ORDER BY n DESC, hour ASC) = 1
                     AS is_peak_hour
            FROM t ORDER BY dow, hour
        """,
        # dispersion: numerator in HUGEINT (exact, mirrors Spark's
        # DECIMAL(38,0)); quotient made division-exact via num - num%den
        # before // so no rounding mode can disagree
        "dispersion": """
            WITH c AS (
              SELECT date_trunc('hour', ts) AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1
            ),
            f AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
                     CAST(SUM(n) AS BIGINT) AS total,
                     SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS sum_sq
              FROM c
            ),
            g AS (
              SELECT n_buckets, total,
                     (1000000 * total) // n_buckets AS mean_micro,
                     CAST(1000000 AS HUGEINT)
                       * (CAST(n_buckets AS HUGEINT) * sum_sq
                          - CAST(total AS HUGEINT) * CAST(total AS HUGEINT))
                       AS num,
                     CAST(n_buckets AS HUGEINT) * CAST(total AS HUGEINT) AS den
              FROM f
            )
            SELECT n_buckets, total, mean_micro,
                   CAST((num - num % den) // den AS BIGINT) AS dispersion_micro,
                   CASE WHEN CAST((num - num % den) // den AS BIGINT) > 1500000
                          THEN 'overdispersed'
                        WHEN CAST((num - num % den) // den AS BIGINT) < 500000
                          THEN 'underdispersed'
                        ELSE 'poisson-like' END AS regime
            FROM g
        """,
        # mojibake_census: identical injection CASE, identical Java∩RE2
        # regex patterns; repairability replayed as signal ∧ UTF-8
        # well-formedness of the cp1252→C1-translated byte stream (the
        # guard in functions/encoding.py:fix_mojibake, which implies the
        # strictly-shorter decode the Spark side also checks)
        "mojibake_census": moji_sql,
        # embedding_health: identical defect-injection CASE; per-row norm
        # fold replayed with list_reduce seeded exactly like Spark's
        # aggregate (0.0 + x1² == x1² in IEEE, so first-element reduce is
        # identical); all aggregation in integer micro-units (corr_exact
        # discipline)
        "embedding_health": """
            WITH base AS (
              SELECT label,
                CASE WHEN vec_id % 97 = 0 THEN NULL
                     WHEN vec_id % 89 = 0 THEN e[1:32]
                     WHEN vec_id % 83 = 0 THEN list_transform(e, x -> 0.0)
                     WHEN vec_id % 79 = 0 THEN list_append(e[1:63], 'NaN'::DOUBLE)
                     ELSE e END AS v
              FROM (SELECT label, vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings)
            ),
            rows_ AS (
              SELECT label, v,
                v IS NULL AS is_null,
                CASE WHEN v IS NOT NULL THEN len(v) END AS dims,
                CASE WHEN v IS NOT NULL
                     THEN len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0
                     ELSE FALSE END AS nonfin,
                v IS NOT NULL AND len(v) != 64 AS dimbad
              FROM base
            ),
            rq AS (
              SELECT label, is_null, dims, nonfin, dimbad,
                CASE WHEN NOT is_null AND NOT nonfin THEN
                  CAST(round(sqrt(CASE WHEN len(dv) = 0 THEN 0.0
                    ELSE list_reduce(list_transform(dv, x -> x * x),
                                     (acc, x) -> acc + x) END) * 1e6) AS BIGINT)
                END AS nq,
                CASE WHEN NOT is_null AND NOT nonfin
                     THEN len(list_filter(dv, x -> x != 0.0)) = 0
                     ELSE FALSE END AS is_zero
              FROM (SELECT *, COALESCE(v, []) AS dv FROM rows_)
            )
            SELECT label,
              CAST(COUNT(*) AS BIGINT) AS n_rows,
              CAST(SUM(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT) AS n_null_vec,
              MIN(dims) AS dims_min,
              MAX(dims) AS dims_max,
              CAST(SUM(CASE WHEN dimbad THEN 1 ELSE 0 END) AS BIGINT) AS n_dim_mismatch,
              CAST(SUM(CASE WHEN nonfin THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
              CAST(SUM(CASE WHEN is_zero THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
              CAST(MIN(nq) AS DOUBLE) / 1e6 AS norm_min,
              CAST(MAX(nq) AS DOUBLE) / 1e6 AS norm_max,
              CASE WHEN COUNT(nq) > 0 THEN
                round(CAST(SUM(nq) AS DOUBLE) / CAST(COUNT(nq) AS DOUBLE) / 1e6, 6)
              END AS norm_avg
            FROM rq GROUP BY label ORDER BY label
        """,
        # embedding_drift: exploded integer sums replay the Spark plan
        # cell-for-cell; every float op is the same IEEE expression on
        # the same exact integers (dot/sq sums are order-free HUGEINTs)
        "embedding_drift": """
            WITH b AS (
              SELECT max(vec_id) AS mx,
                     CAST(ceil((max(vec_id) + 1) / 5) AS BIGINT) AS w
              FROM embeddings
            ),
            src AS (
              SELECT vec_id,
                CASE WHEN vec_id > mx / 2
                     THEN list_transform(e, x -> x * 0.8 + 0.05)
                     ELSE e END AS v
              FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings), b
            ),
            f AS (
              SELECT CAST(floor(vec_id / w) AS BIGINT) AS win,
                list_transform(v, x -> CAST(round(x * 1000) AS BIGINT)) AS q,
                CAST(round(sqrt(list_reduce(
                    list_transform(v, x -> x * x), (acc, x) -> acc + x))
                  * 1e6) AS BIGINT) AS nq
              FROM src, b
              WHERE v IS NOT NULL AND len(v) > 0
                AND len(list_filter(v, x -> isnan(x) OR isinf(x))) = 0
            ),
            cells AS (
              SELECT win, pos, SUM(val) AS s, COUNT(*) AS n
              FROM (SELECT win, generate_subscripts(q, 1) - 1 AS pos,
                           unnest(q) AS val FROM f)
              GROUP BY win, pos
            ),
            cent AS (
              SELECT win, pos,
                CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
                  AS c
              FROM cells
            ),
            sq AS (SELECT win, SUM(c * c) AS s2 FROM cent GROUP BY win),
            dots AS (
              SELECT x.win AS win, SUM(x.c * y.c) AS dot
              FROM cent x JOIN cent y
                ON y.win = x.win - 1 AND y.pos = x.pos
              GROUP BY x.win
            ),
            norms AS (
              SELECT win, COUNT(*) AS n,
                CAST(floor(CAST(SUM(nq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                  AS BIGINT) AS mean_norm_micro
              FROM f GROUP BY win
            )
            SELECT cn.win AS win,
              CAST(pn.n AS BIGINT) AS n_prev,
              CAST(cn.n AS BIGINT) AS n_cur,
              CASE WHEN csq.s2 > 0 AND psq.s2 > 0 THEN
                CAST(round(CAST(d.dot AS DOUBLE)
                  / sqrt(CAST(csq.s2 AS DOUBLE) * CAST(psq.s2 AS DOUBLE))
                  * 1e6) AS BIGINT)
              END AS centroid_cos_micro,
              pn.mean_norm_micro AS mean_norm_prev_micro,
              cn.mean_norm_micro AS mean_norm_cur_micro
            FROM norms cn
            JOIN norms pn ON cn.win = pn.win + 1
            JOIN sq csq ON csq.win = cn.win
            JOIN sq psq ON psq.win = pn.win
            JOIN dots d ON d.win = cn.win
            ORDER BY win
        """,
        # embedding_outliers: same quantize/floor-centroid replay as
        # embedding_drift; distances join exploded cells relationally
        # (integer sums are order-free, so the SQL SUM equals Spark's
        # ordered zip_with fold)
        "embedding_outliers": """
            WITH src AS (
              SELECT vec_id, label,
                CASE WHEN vec_id % 101 = 0
                     THEN list_transform(e, x -> x * 5.0)
                     ELSE e END AS v
              FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
                    FROM embeddings)
            ),
            f AS (
              SELECT vec_id, label,
                list_transform(v, x -> CAST(round(x * 1000) AS BIGINT)) AS q
              FROM src
              WHERE v IS NOT NULL AND len(v) > 0 AND label IS NOT NULL
                AND len(list_filter(v, x -> isnan(x) OR isinf(x))) = 0
            ),
            ex AS (
              SELECT vec_id, label, generate_subscripts(q, 1) - 1 AS pos,
                     unnest(q) AS val
              FROM f
            ),
            cent AS (
              SELECT label, pos,
                CAST(floor(CAST(SUM(val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                  AS BIGINT) AS c
              FROM ex GROUP BY label, pos
            ),
            dist AS (
              SELECT ex.label AS label, ex.vec_id AS id,
                CAST(round(sqrt(CAST(SUM((ex.val - cent.c) * (ex.val - cent.c))
                  AS DOUBLE)) / 1000 * 1e6) AS BIGINT) AS dist_micro
              FROM ex JOIN cent ON cent.label = ex.label AND cent.pos = ex.pos
              GROUP BY ex.label, ex.vec_id
            ),
            stats AS (
              SELECT label, COUNT(*) AS n_group,
                CAST(SUM(dist_micro) AS DOUBLE) / COUNT(*) AS mean_,
                greatest(
                  CAST(SUM(dist_micro * dist_micro) AS DOUBLE) / COUNT(*)
                    - (CAST(SUM(dist_micro) AS DOUBLE) / COUNT(*))
                      * (CAST(SUM(dist_micro) AS DOUBLE) / COUNT(*)),
                  0.0) AS var_
              FROM dist GROUP BY label
            )
            SELECT d.label AS "group", d.id AS id, d.dist_micro,
              CAST(round(s.mean_) AS BIGINT) AS mean_micro,
              CAST(round(sqrt(s.var_)) AS BIGINT) AS std_micro,
              CAST(s.n_group AS BIGINT) AS n_group
            FROM dist d JOIN stats s ON s.label = d.label
            WHERE d.dist_micro >
              CAST(round(s.mean_ + 3000000.0 / 1e6 * sqrt(s.var_)) AS BIGINT)
            ORDER BY d.label, d.id
        """,
        # robots_rfc: full parse replay (same CTE chain as robots_blocked,
        # extended to Allow) + the precedence argmax as a window — longest
        # rule DESC, allow DESC, rule DESC mirrors Spark's struct
        # array_max on (length, allow, rule)
        "robots_rfc": r"""
            WITH robots(host, txt) AS (VALUES
              ('a0.example.org',
               e'User-agent: *\nDisallow: /private/\nAllow: /private/pub/\nDisallow: /private/pub/sec\n'),
              ('a1.example.org', e'User-agent: *\nAllow: /\nDisallow: /tmp\n'),
              ('a2.example.org', e'User-agent: *\nDisallow: /a\nAllow: /a\n')
            ),
            sp AS (SELECT host, string_split(txt, chr(10)) AS l FROM robots),
            lines AS (
              SELECT host, i AS pos,
                     trim(regexp_replace(regexp_replace(l[i], '\r', ''),
                                         '#.*$', '')) AS line
              FROM sp, UNNEST(range(1, len(l) + 1)) AS r(i)
            ),
            f AS (
              SELECT host, pos,
                     lower(regexp_extract(line, '^([A-Za-z-]+)\s*:', 1)) AS field,
                     trim(regexp_extract(line, '^[A-Za-z-]+\s*:\s*(.*)$', 1)) AS value
              FROM lines
            ),
            m AS (
              SELECT *, CASE WHEN field = 'user-agent' THEN 1 ELSE 0 END AS is_ua
              FROM f
            ),
            m2 AS (
              SELECT *, COALESCE(LAG(is_ua) OVER (PARTITION BY host ORDER BY pos), 0)
                          AS prev_ua
              FROM m
            ),
            m3 AS (
              SELECT *, SUM(CASE WHEN is_ua = 1 AND prev_ua = 0 THEN 1 ELSE 0 END)
                          OVER (PARTITION BY host ORDER BY pos) AS rec
              FROM m2
            ),
            star AS (
              SELECT DISTINCT host, rec FROM m3
              WHERE field = 'user-agent' AND value = '*'
            ),
            rules AS (
              SELECT DISTINCT m3.host, m3.value AS rule,
                     m3.field = 'allow' AS allow,
                     regexp_matches(m3.value, '[*$]') AS has_wildcard
              FROM m3 JOIN star ON m3.host = star.host AND m3.rec = star.rec
              WHERE m3.field IN ('allow', 'disallow') AND m3.value <> ''
            ),
            pages AS (
              SELECT doc_id,
                     'https://a' || CAST(doc_id % 3 AS VARCHAR) || '.example.org'
                     || CASE doc_id % 6
                          WHEN 0 THEN '/private/x'
                          WHEN 1 THEN '/private/pub/x'
                          WHEN 2 THEN '/private/pub/secret'
                          WHEN 3 THEN '/tmp/x'
                          WHEN 4 THEN '/a/z'
                          ELSE '/ok' END AS url
              FROM documents
            ),
            p2 AS (
              SELECT doc_id, url,
                     lower(regexp_extract(url, '(?i)^https?://([^/?#]+)', 1)) AS host,
                     CASE WHEN regexp_extract(url,
                            '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^#]*)?', 1) = ''
                          THEN '/'
                          ELSE regexp_extract(url,
                            '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^#]*)?', 1) END AS path
              FROM pages
            ),
            cand AS (
              SELECT p2.doc_id, p2.url, p2.host, p2.path, r.rule, r.allow
              FROM p2 JOIN rules r
                ON r.host = p2.host AND NOT r.has_wildcard
               AND starts_with(p2.path, r.rule)
            ),
            win AS (
              SELECT *, row_number() OVER (
                PARTITION BY doc_id
                ORDER BY length(rule) DESC, allow DESC, rule DESC) AS rn
              FROM cand
            )
            SELECT doc_id, url, host, path, rule
            FROM win WHERE rn = 1 AND NOT allow
            ORDER BY doc_id
        """,
        # media_checks_exact: the payloads are constructed per residue
        # class, so the expected finding per class — including the
        # decoder's own error string — is a pure CASE over doc_id; any
        # drift in the decode path or check logic breaks the hash
        "media_checks_exact": """
            SELECT doc_id,
              CASE doc_id % 8
                WHEN 1 THEN 'MEDIA_DIMS_MISMATCH'
                WHEN 2 THEN 'MEDIA_TYPE_MISMATCH'
                WHEN 3 THEN 'MEDIA_PAYLOAD_EMPTY'
                WHEN 4 THEN 'MEDIA_DECODE_ERROR'
                WHEN 6 THEN 'MEDIA_DIMS_MISMATCH'
                WHEN 7 THEN 'MEDIA_DECODE_ERROR'
              END AS check_id,
              CASE doc_id % 8
                WHEN 1 THEN '3x2'
                WHEN 2 THEN 'image/* (sniffed ppm)'
                WHEN 3 THEN 'non-empty payload'
                WHEN 4 THEN 'decodable ppm'
                WHEN 6 THEN '3x2'
                WHEN 7 THEN 'decodable webp'
              END AS expected,
              CASE doc_id % 8
                WHEN 1 THEN '2x2'
                WHEN 2 THEN 'audio/wav'
                WHEN 3 THEN '0 bytes'
                WHEN 4 THEN 'ppm: truncated header'
                WHEN 6 THEN '2x2'
                WHEN 7 THEN 'webp: bitstream truncated'
              END AS found
            FROM documents
            WHERE doc_id % 8 IN (1, 2, 3, 4, 6, 7)
            ORDER BY doc_id
        """,
        # manifest_audit: exploits the one-file-per-table testdata layout
        # (same convention as the file_audit oracle) — the actual side is
        # the table count under its known basename
        "manifest_audit": """
            WITH actual AS (
              SELECT 'lineitem.parquet' AS file,
                     CAST(count(*) AS BIGINT) AS n_rows_actual
              FROM lineitem
            ),
            mani AS (
              SELECT file,
                n_rows_actual + CASE WHEN length(file) % 2 = 0
                                     THEN 7 ELSE 0 END AS n_rows_declared
              FROM actual
              UNION ALL
              SELECT 'ghost-000.parquet', CAST(123 AS BIGINT)
            )
            SELECT COALESCE(m.file, a.file) AS file,
              CASE WHEN a.file IS NULL THEN 'FILE_MISSING'
                   WHEN m.file IS NULL THEN 'FILE_ORPHAN'
                   WHEN m.n_rows_declared != a.n_rows_actual
                     THEN 'ROWCOUNT_MISMATCH' END AS finding,
              m.n_rows_declared, a.n_rows_actual
            FROM mani m FULL OUTER JOIN actual a ON a.file = m.file
            WHERE (CASE WHEN a.file IS NULL THEN 'FILE_MISSING'
                        WHEN m.file IS NULL THEN 'FILE_ORPHAN'
                        WHEN m.n_rows_declared != a.n_rows_actual
                          THEN 'ROWCOUNT_MISMATCH' END) IS NOT NULL
            ORDER BY COALESCE(m.file, a.file)
        """,
        # term_search: the index is just materialized postings — the oracle
        # recomputes the identical rational scoring from the raw table
        "term_search": r"""
            WITH tok AS (
              SELECT doc_id, w AS term
              FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
                FROM documents WHERE text IS NOT NULL
              )
              WHERE w <> ''
            ),
            tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, COUNT(*) AS n_doc_terms FROM tok GROUP BY 1),
            nd AS (
              SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
            ),
            q AS (SELECT unnest(['join', 'merge']) AS term),
            posts AS (
              SELECT tf.doc_id, tf.term, tf.tf, dl.n_doc_terms
              FROM tf JOIN dl USING (doc_id) JOIN q USING (term)
            ),
            dfreq AS (SELECT term, COUNT(*) AS df FROM posts GROUP BY 1),
            contrib AS (
              SELECT p.doc_id,
                     CAST(FLOOR((1e6 * (CAST(p.tf AS DOUBLE) * nd.n_docs))
                            / (CAST(p.n_doc_terms AS DOUBLE) * d.df))
                       AS BIGINT) AS c
              FROM posts p JOIN dfreq d USING (term), nd
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matched,
                   CAST(SUM(c) AS BIGINT) AS score_ppm
            FROM contrib GROUP BY doc_id HAVING COUNT(*) = 2
            ORDER BY score_ppm DESC, doc_id ASC LIMIT 10
        """,
        # phrase_search: anchor trick replayed relationally — a posting
        # for phrase[i] at pos p votes for anchor p-i; an anchor holding
        # ALL distinct offsets is one occurrence of the phrase
        "phrase_search": r"""
            WITH tok AS (
              SELECT doc_id,
                     list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            pos AS (
              SELECT doc_id, i.i - 1 AS pos, ws[i.i] AS term
              FROM tok, LATERAL (SELECT unnest(range(1, len(tok.ws) + 1)) AS i) i
            ),
            q AS (SELECT * FROM (VALUES (0, 'table'), (1, 'table')) AS q(off, term)),
            anchors AS (
              SELECT p.doc_id, p.pos - q.off AS a, q.off
              FROM pos p JOIN q USING (term)
              WHERE p.pos - q.off >= 0
            ),
            occ AS (
              SELECT doc_id, a FROM anchors
              GROUP BY doc_id, a HAVING COUNT(DISTINCT off) = 2
            )
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
                   CAST(MIN(a) AS BIGINT) AS first_pos
            FROM occ GROUP BY doc_id
            ORDER BY n_occurrences DESC, doc_id ASC LIMIT 10
        """,
        # kwic: strpos/substr char semantics match Spark instr/substring
        "kwic": """
            SELECT doc_id,
                   CAST(strpos(lower(text), 'merge batch') AS BIGINT) AS match_pos,
                   substr(text,
                          GREATEST(1, strpos(lower(text), 'merge batch') - 30),
                          30 + 11 + 30) AS snippet
            FROM documents
            WHERE text IS NOT NULL AND strpos(lower(text), 'merge batch') > 0
            ORDER BY doc_id
        """,
        # transitions: same (ts, event_id, type) total order in the replay
        "transitions": """
            SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM (
              SELECT LAG(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id, event_type
                     ) AS from_type,
                     event_type AS to_type
              FROM events
              WHERE ts IS NOT NULL AND event_type IS NOT NULL
            )
            WHERE from_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # funnel: the chained min-agg/strictly-after joins replayed as CTEs
        "funnel": """
            WITH s0 AS (
              SELECT user_id AS u, MIN(ts) AS t FROM events
              WHERE event_type = 'signup' GROUP BY 1
            ),
            s1 AS (
              SELECT e.user_id AS u, MIN(e.ts) AS t
              FROM events e JOIN s0 ON e.user_id = s0.u
              WHERE e.event_type = 'view' AND e.ts > s0.t GROUP BY 1
            ),
            s2 AS (
              SELECT e.user_id AS u, MIN(e.ts) AS t
              FROM events e JOIN s1 ON e.user_id = s1.u
              WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
            ),
            s3 AS (
              SELECT e.user_id AS u, MIN(e.ts) AS t
              FROM events e JOIN s2 ON e.user_id = s2.u
              WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
            )
            SELECT 0 AS step_idx, 'signup' AS step,
                   CAST(COUNT(*) AS BIGINT) AS n_users FROM s0
            UNION ALL SELECT 1, 'view', CAST(COUNT(*) AS BIGINT) FROM s1
            UNION ALL SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM s2
            UNION ALL SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM s3
            ORDER BY step_idx
        """,
        # cohort_retention: UTC-pinned dates; distinct at (cohort,offset,user)
        "cohort_retention": """
            WITH ev AS (
              SELECT user_id AS u, CAST(ts AS DATE) AS d
              FROM events WHERE ts IS NOT NULL
            ),
            coh AS (SELECT u, MIN(d) AS cohort_date FROM ev GROUP BY u)
            SELECT CAST(cohort_date AS VARCHAR) AS cohort_date, offset_days,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM (
              SELECT DISTINCT ev.u, coh.cohort_date,
                     CAST(date_diff('day', coh.cohort_date, ev.d) AS INT)
                       AS offset_days
              FROM ev JOIN coh ON ev.u = coh.u
              WHERE date_diff('day', coh.cohort_date, ev.d) <= 30
            )
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # continuation_pairs: planting + trim/eligibility/cap/join replayed
        # whole (Spark trim and DuckDB trim both strip ASCII space only)
        "continuation_pairs": r"""
            WITH base AS (
              SELECT doc_id, trim(text) AS t
              FROM documents WHERE text IS NOT NULL
            ),
            corpus AS (
              SELECT doc_id, t FROM base
              UNION ALL
              SELECT doc_id + 10000000, right(t, 48) || substr(t, 1, 150)
              FROM base WHERE doc_id % 10 = 0 AND length(t) >= 200
            ),
            el AS (
              SELECT doc_id, trim(t) AS t FROM corpus
              WHERE length(trim(t)) >= 96
            ),
            tails AS (
              SELECT doc_id, right(t, 48) AS boundary_key FROM el
              QUALIFY COUNT(*) OVER (PARTITION BY right(t, 48)) <= 100
            ),
            heads AS (
              SELECT doc_id, substr(t, 1, 48) AS boundary_key FROM el
              QUALIFY COUNT(*) OVER (PARTITION BY substr(t, 1, 48)) <= 100
            )
            SELECT ta.doc_id AS doc_a, he.doc_id AS doc_b, ta.boundary_key
            FROM tails ta JOIN heads he USING (boundary_key)
            WHERE ta.doc_id <> he.doc_id
            ORDER BY doc_a, doc_b
        """,
        # term_cooccurrence: presence/top-N/pair construction replayed
        # whole; rational lift with the same pinned double operation order
        "term_cooccurrence": r"""
            WITH pres AS (
              SELECT DISTINCT doc_id, w AS word
              FROM (
                SELECT doc_id,
                       unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
                FROM documents WHERE text IS NOT NULL
              )
              WHERE w <> ''
            ),
            nd AS (
              SELECT COUNT(*) AS n_docs FROM documents WHERE text IS NOT NULL
            ),
            top AS (
              SELECT word, CAST(COUNT(*) AS BIGINT) AS n_term
              FROM pres GROUP BY word
              ORDER BY n_term DESC, word ASC LIMIT 100
            ),
            pt AS (
              SELECT p.doc_id, p.word, t.n_term
              FROM pres p JOIN top t USING (word)
            ),
            pairs AS (
              SELECT a.word AS word_a, b.word AS word_b,
                     a.n_term AS n_a, b.n_term AS n_b,
                     CAST(COUNT(*) AS BIGINT) AS n_ab
              FROM pt a JOIN pt b
                ON a.doc_id = b.doc_id AND a.word < b.word
              GROUP BY 1, 2, 3, 4
              HAVING COUNT(*) >= 2
            )
            SELECT word_a, word_b, n_ab,
                   CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
                   CAST(FLOOR((1e6 * (CAST(n_ab AS DOUBLE) * n_docs))
                          / (CAST(n_a AS DOUBLE) * n_b)) AS BIGINT) AS lift_ppm
            FROM pairs, nd
            ORDER BY lift_ppm DESC, word_a, word_b LIMIT 30
        """,
        # readability: ARI battery replayed with the same RE2∩Java regex
        # counts and the same pinned float operation order; per-doc scores
        # floor-quantized to ppm BEFORE aggregation
        "readability": r"""
            WITH pd AS (
              SELECT lang,
                     (text IS NOT NULL AND w >= 1 AND s >= 1) AS ok,
                     CASE WHEN text IS NOT NULL AND w >= 1 AND s >= 1
                          THEN CAST(FLOOR(1e6 * (4.71 * (c * 1.0 / w)
                                 + 0.5 * (w * 1.0 / s) - 21.43)) AS BIGINT)
                     END AS ari_ppm
              FROM (
                SELECT lang, text,
                       len(regexp_extract_all(text, '[A-Za-z0-9]')) AS c,
                       len(regexp_extract_all(text, '\S+')) AS w,
                       len(regexp_extract_all(text, '[.!?]')) AS s
                FROM documents
              )
            )
            SELECT lang,
                   CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_skipped,
                   CAST(SUM(ari_ppm) AS BIGINT) AS sum_ari_ppm,
                   CAST(MIN(ari_ppm) AS BIGINT) AS min_ari_ppm,
                   CAST(MAX(ari_ppm) AS BIGINT) AS max_ari_ppm,
                   CAST(FLOOR(SUM(ari_ppm) * 1.0
                          / SUM(CASE WHEN ok THEN 1 ELSE 0 END)) AS BIGINT)
                     AS avg_ari_ppm
            FROM pd GROUP BY lang ORDER BY lang
        """,
        # ngram_novelty: same tokenizer/gram construction as dup_spans
        # (proven Java∩RE2 parity); micro-unit floor keeps the rate integer
        "ngram_novelty": r"""
            WITH toks AS (
              SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS w
              FROM documents WHERE text IS NOT NULL
            ),
            g AS (
              SELECT lang, array_to_string(w[i:i + 7], ' ') AS gram
              FROM (
                SELECT lang, w, unnest(range(1, len(w) - 6)) AS i
                FROM toks WHERE len(w) >= 8
              )
            ),
            pg AS (SELECT lang, gram, COUNT(*) AS cnt FROM g GROUP BY lang, gram)
            SELECT lang,
                   CAST(SUM(cnt) AS BIGINT) AS total_grams,
                   CAST(COUNT(*) AS BIGINT) AS distinct_grams,
                   CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS dup_grams,
                   CAST(FLOOR(1e6 * (SUM(cnt) - COUNT(*)) / SUM(cnt)) AS BIGINT)
                     AS dup_rate_ppm
            FROM pg GROUP BY lang ORDER BY lang
        """,
        # bpe_word_freq: same ASCII-safe pre-tokenizer regex (Java and RE2
        # agree on [A-Za-z0-9] runs and the \s class for ASCII input),
        # same deterministic (cnt DESC, word ASC) total order
        "bpe_word_freq": r"""
            SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
              SELECT unnest(regexp_extract_all(
                       text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS word
              FROM documents WHERE text IS NOT NULL
            )
            GROUP BY word
            ORDER BY cnt DESC, word ASC
            LIMIT 20
        """,
        # rep_signals: the same single tagged gram generation for every n,
        # the same (doc, n, gram) integer counts, the same min-over-
        # (-cnt, gram) deterministic top pick, and the identical
        # INT×INT / DOUBLE round-6 fraction formula
        "rep_signals": r"""
            WITH toks AS (
              SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents WHERE text IS NOT NULL
            ),
            grams AS (
              SELECT t.doc_id, t.n_chars, n.n AS n,
                     UNNEST(list_transform(
                       range(1, len(t.ws) - n.n + 2),
                       i -> array_to_string(t.ws[i : i + n.n - 1], ' ')
                     )) AS gram
              FROM toks t
              CROSS JOIN (SELECT UNNEST([2,3,4,5,6,7,8,9,10]) AS n) n
              WHERE len(t.ws) >= n.n
            ),
            counts AS (
              SELECT doc_id, n_chars, n, gram, COUNT(*) AS cnt
              FROM grams GROUP BY ALL
            ),
            per AS (
              SELECT doc_id, n_chars, n,
                     min(struct_pack(negc := -cnt, gram := gram)) AS top,
                     SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram) END)
                       AS dup_chars
              FROM counts GROUP BY doc_id, n_chars, n
            ),
            fr AS (
              SELECT doc_id, n,
                     round(least(CAST(1.0 AS DOUBLE),
                       CAST((-top.negc) * length(top.gram) AS DOUBLE)
                         / n_chars), 6) AS top_frac,
                     round(least(CAST(1.0 AS DOUBLE),
                       CAST(COALESCE(dup_chars, 0) AS DOUBLE) / n_chars), 6)
                       AS dup_frac
              FROM per
            ),
            wide AS (
              SELECT d.doc_id,
                COALESCE(MAX(CASE WHEN fr.n = 2 THEN fr.top_frac END), 0.0)
                  AS top_2gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 3 THEN fr.top_frac END), 0.0)
                  AS top_3gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 4 THEN fr.top_frac END), 0.0)
                  AS top_4gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 5 THEN fr.dup_frac END), 0.0)
                  AS dup_5gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 6 THEN fr.dup_frac END), 0.0)
                  AS dup_6gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 7 THEN fr.dup_frac END), 0.0)
                  AS dup_7gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 8 THEN fr.dup_frac END), 0.0)
                  AS dup_8gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 9 THEN fr.dup_frac END), 0.0)
                  AS dup_9gram_char_frac,
                COALESCE(MAX(CASE WHEN fr.n = 10 THEN fr.dup_frac END), 0.0)
                  AS dup_10gram_char_frac
              FROM documents d LEFT JOIN fr ON fr.doc_id = d.doc_id
              GROUP BY d.doc_id
            )
            SELECT doc_id,
                   top_2gram_char_frac, top_3gram_char_frac,
                   top_4gram_char_frac, dup_5gram_char_frac,
                   dup_6gram_char_frac, dup_7gram_char_frac,
                   dup_8gram_char_frac, dup_9gram_char_frac,
                   dup_10gram_char_frac,
                   (top_2gram_char_frac <= 0.20) AS gate_top_2gram,
                   (top_3gram_char_frac <= 0.18) AS gate_top_3gram,
                   (top_4gram_char_frac <= 0.16) AS gate_top_4gram,
                   (dup_5gram_char_frac <= 0.15) AS gate_dup_5gram,
                   (dup_6gram_char_frac <= 0.14) AS gate_dup_6gram,
                   (dup_7gram_char_frac <= 0.13) AS gate_dup_7gram,
                   (dup_8gram_char_frac <= 0.12) AS gate_dup_8gram,
                   (dup_9gram_char_frac <= 0.11) AS gate_dup_9gram,
                   (dup_10gram_char_frac <= 0.10) AS gate_dup_10gram,
                   ((top_2gram_char_frac <= 0.20) AND (top_3gram_char_frac <= 0.18)
                    AND (top_4gram_char_frac <= 0.16) AND (dup_5gram_char_frac <= 0.15)
                    AND (dup_6gram_char_frac <= 0.14) AND (dup_7gram_char_frac <= 0.13)
                    AND (dup_8gram_char_frac <= 0.12) AND (dup_9gram_char_frac <= 0.11)
                    AND (dup_10gram_char_frac <= 0.10)) AS rep_passes
            FROM wide ORDER BY doc_id
        """,
    }
    # incr_clusters: intentionally the SAME recursive-CTE SQL as
    # dedup_clusters — the incremental star-edge merge is exact by the
    # identity in merge_clusters' docstring, and this row is the
    # hash-exact proof of that claim on real data
    out["incr_clusters"] = out["dedup_clusters"]
    # dedup_weights: the same clustering + cluster-size µ-weights; built
    # from the dedup_clusters body (strip its trailing ORDER BY) so the
    # two stay pinned to one clustering definition
    out["dedup_weights"] = (
        "WITH labels AS ("
        + out["dedup_clusters"].replace("ORDER BY doc_id", "")
        + """),
        sizes AS (
          SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
          FROM labels GROUP BY cluster_id
        )
        SELECT l.doc_id, l.cluster_id, s.n_members,
               CAST(1000000 // s.n_members AS BIGINT) AS weight_micro
        FROM labels l JOIN sizes s USING (cluster_id)
        ORDER BY l.doc_id
        """
    )
    # bm25_docs: full replay of operators/search.bm25_topk — tf/dl in one
    # doc-grain GROUP BY, corpus stats folded, then the saturation formula
    # with the IDENTICAL left-assoc float-op order; idf's ln runs on C libm
    # on both sides (driver-side math.log there, DuckDB ln here), never the
    # JVM's non-portable Math.log. Constants are the repr() of the Python
    # doubles the operator injects (k1=1.2, b=0.75 → k1+1=2.2, 1-b=0.25).
    _bq = sorted(set(t.lower() for t in BM25_TERMS))
    _tf = ", ".join(
        f"count(*) FILTER (term = '{t}') AS tf_{i}" for i, t in enumerate(_bq)
    )
    _df = ", ".join(
        f"count(*) FILTER (tf_{i} > 0) AS df_{i}" for i in range(len(_bq))
    )
    _contrib = " + ".join(
        f"(ln((s.n - s.df_{i} + 0.5) / (s.df_{i} + 0.5) + 1.0)"
        f" * (CAST(p.tf_{i} AS DOUBLE) * 2.2)"
        f" / (CAST(p.tf_{i} AS DOUBLE) + 1.2 * (0.25 + 0.75 *"
        f" CAST(p.dl AS DOUBLE) / (CAST(s.total AS DOUBLE) / CAST(s.n AS DOUBLE)))))"
        for i in range(len(_bq))
    )
    _matched = " + ".join(f"CAST(p.tf_{i} > 0 AS INT)" for i in range(len(_bq)))
    out["bm25_docs"] = f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                        '\\s+'), x -> x <> '')) AS term
          FROM documents WHERE text IS NOT NULL
        ), p AS (
          SELECT doc_id, count(*) AS dl, {_tf}
          FROM toks GROUP BY doc_id
        ), s AS (
          SELECT count(*) AS n, sum(dl) AS total, {_df} FROM p
        )
        SELECT p.doc_id,
               CAST({_matched} AS BIGINT) AS n_matched,
               CAST(floor(1000000.0 * ({_contrib})) AS BIGINT) AS score_micro
        FROM p, s
        WHERE {_matched} > 0
        ORDER BY score_micro DESC, p.doc_id
        LIMIT {BM25_K}
    """
    # readability: integer word/sentence/syllable counts replayed with the
    # same regexes, then the Flesch formulas in the same fixed op order
    # (division/multiply/subtract only — correctly-rounded IEEE, no ln)
    out["readability"] = """
        WITH c AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS ws,
                 len(regexp_extract_all(lower(text), '[aeiouy]+')) AS vg,
                 len(regexp_extract_all(text, '[.!?]+')) AS pr
          FROM documents
        ), m AS (
          SELECT doc_id, text,
                 CAST(len(ws) AS BIGINT) AS w,
                 CAST(greatest(1, pr) AS BIGINT) AS s,
                 CAST(vg + len(list_filter(ws,
                      x -> regexp_matches(x, '^[^aeiouy]*$'))) AS BIGINT) AS syl
          FROM c
        )
        SELECT doc_id,
               CASE WHEN text IS NULL THEN NULL ELSE w END AS n_words,
               CASE WHEN text IS NULL THEN NULL ELSE s END AS n_sentences,
               CASE WHEN text IS NULL THEN NULL ELSE syl END AS n_syllables,
               CASE WHEN text IS NULL OR w = 0 THEN NULL ELSE
                 CAST(floor(1000000.0 * (206.835
                   - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                   - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE))))
                 AS BIGINT) END AS fre_micro,
               CASE WHEN text IS NULL OR w = 0 THEN NULL ELSE
                 CAST(floor(1000000.0 * (0.39 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                   + 11.8 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) - 15.59))
                 AS BIGINT) END AS fkgl_micro
        FROM m ORDER BY doc_id
    """
    # blocklist_flags / blocklist_census: the C4 bad-words gate replayed
    # with list_contains/list_intersect over the same sorted literal list
    _bl = "[" + ", ".join(
        f"'{t}'" for t in sorted(set(t.lower() for t in BLOCKED_TERMS))
    ) + "]"
    out["blocklist_flags"] = f"""
        WITH c AS (
          SELECT doc_id, text,
                 list_filter(regexp_split_to_array(lower(text), '\\s+'),
                             x -> x <> '') AS ws
          FROM documents
        )
        SELECT doc_id,
               CASE WHEN text IS NULL THEN NULL
                    ELSE CAST(len(ws) AS BIGINT) END AS n_tokens,
               CASE WHEN text IS NULL THEN NULL
                    ELSE CAST(len(list_filter(ws, x -> list_contains({_bl}, x)))
                         AS BIGINT) END AS blocked_hits,
               CASE WHEN text IS NULL THEN NULL
                    ELSE CAST(len(list_intersect(list_distinct(ws), {_bl}))
                         AS BIGINT) END AS blocked_distinct,
               CASE WHEN text IS NULL THEN NULL
                    ELSE len(list_filter(ws, x -> list_contains({_bl}, x))) = 0
                    END AS allowed
        FROM c ORDER BY doc_id
    """
    # sampled_violations: md5-bucket sample → battery → per-check Wilson
    # interval. Every float op (div/mul/add/sub and sqrt) is IEEE
    # correctly-rounded, and the expression structure mirrors the
    # operator's exactly, so the micro values are bit-exact. z²=1.96² is
    # the repr() of the Python double the operator injects.
    _z2 = repr(1.96 * 1.96)
    out["sampled_violations"] = f"""
        WITH sample AS (
          SELECT * FROM documents
          WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 < 30
        ), viol AS ({doc_viol.replace("FROM documents", "FROM sample")}),
        counts AS (
          SELECT check_id, count(*) AS v FROM viol GROUP BY check_id
        ), n AS (SELECT count(*) AS sample_n FROM sample),
        checks AS (SELECT * FROM (VALUES ('LANG_UNKNOWN'), ('N_CHARS_MISMATCH'),
                   ('SOURCE_UNKNOWN'), ('TEXT_EMPTY')) t(check_id)),
        j AS (
          SELECT c.check_id, n.sample_n, COALESCE(ct.v, 0) AS violations
          FROM checks c LEFT JOIN counts ct USING (check_id), n
        ), m AS (
          SELECT check_id, sample_n, violations,
                 CAST(violations AS DOUBLE) / CAST(sample_n AS DOUBLE) AS phat,
                 CAST(sample_n AS DOUBLE) AS nd
          FROM j
        ), wi AS (
          SELECT check_id, sample_n, violations, phat,
                 (phat + {_z2} / (2.0 * nd)) / (1.0 + {_z2} / nd) AS center,
                 (1.96 * sqrt((phat * (1.0 - phat)) / nd
                   + {_z2} / (4.0 * (nd * nd)))) / (1.0 + {_z2} / nd) AS half
          FROM m
        )
        SELECT check_id,
               CAST(sample_n AS BIGINT) AS sample_n,
               CAST(violations AS BIGINT) AS violations,
               CASE WHEN sample_n > 0 THEN CAST(floor(1000000.0 * phat) AS BIGINT)
                    END AS rate_micro,
               CASE WHEN sample_n > 0 THEN CAST(floor(1000000.0 *
                    greatest(0.0, center - half)) AS BIGINT)
                    END AS wilson_lo_micro,
               CASE WHEN sample_n > 0 THEN CAST(floor(1000000.0 *
                    least(1.0, center + half)) AS BIGINT)
                    END AS wilson_hi_micro
        FROM wi ORDER BY check_id
    """
    # mirror_hosts: full replay over the same VALUES fixture — host
    # extraction (the host_spoof regex), md5 normalization fingerprint,
    # distinct (fp, host), the 2..cap size gate, within-fp self-join,
    # per-host totals, exact-integer overlap coefficient
    _mfix = ",\n                ".join(
        f"('{u}', '{t}')" for u, t in _MIRROR_FIXTURE
    )
    out["mirror_hosts"] = f"""
        WITH pages AS (
          SELECT * FROM (VALUES
            {_mfix}
          ) t(url, text)
        ), posts AS (
          SELECT DISTINCT
                 lower(regexp_extract(url,
                   '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#\\s]+)', 1)) AS host,
                 md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
          FROM pages WHERE text IS NOT NULL
        ), posts_h AS (
          SELECT * FROM posts WHERE host <> ''
        ), per_host AS (
          SELECT host, count(*) AS n_fps FROM posts_h GROUP BY host
        ), eligible AS (
          SELECT fp FROM posts_h GROUP BY fp
          HAVING count(*) >= 2 AND count(*) <= 3
        ), shared AS (
          SELECT p.fp, p.host FROM posts_h p JOIN eligible e USING (fp)
        ), pairs AS (
          SELECT a.host AS host_a, b.host AS host_b, count(*) AS n_shared
          FROM shared a JOIN shared b
            ON a.fp = b.fp AND a.host < b.host
          GROUP BY 1, 2
          HAVING count(*) >= 1
        )
        SELECT p.host_a, p.host_b,
               CAST(p.n_shared AS BIGINT) AS n_shared,
               CAST(na.n_fps AS BIGINT) AS n_a,
               CAST(nb.n_fps AS BIGINT) AS n_b,
               CAST((1000000 * p.n_shared) // least(na.n_fps, nb.n_fps)
                    AS BIGINT) AS overlap_micro
        FROM pairs p
        JOIN per_host na ON na.host = p.host_a
        JOIN per_host nb ON nb.host = p.host_b
        ORDER BY host_a, host_b
    """
    out["blocklist_census"] = f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        x -> x <> '' AND list_contains({_bl}, x))) AS term
          FROM documents WHERE text IS NOT NULL
        )
        SELECT term,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM toks GROUP BY term ORDER BY term
    """
    return out
