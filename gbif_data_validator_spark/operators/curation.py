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


def shard_plan(
    df: DataFrame,
    id_col: str,
    size_col: str,
    shard_bytes: int,
    n_buckets: int = 1024,
) -> DataFrame:
    """→ ``(id, size, shard)``: assign documents to output training
    shards of ~``shard_bytes`` each, preserving ONE deterministic global
    order (ascending ``id_col``) — the writer plan for "emit the corpus
    as ordered ~1 GB files" that ``pack_bins`` (hashed shards, bins
    within) deliberately does not give you. A document goes to shard
    ``floor(exclusive_prefix_sum(size) / shard_bytes)``, so shard
    boundaries fall exactly where the running byte total crosses a
    multiple of the budget and every shard except the last holds at
    least ``shard_bytes - max(size)`` bytes.

    The global prefix sum is computed WITHOUT a global sort: (1) one
    cheap min/max agg of ``id_col``; (2) rows map to ``n_buckets``
    order-preserving id-range buckets; (3) one bucket-grain agg whose
    ≤ ``n_buckets`` sums are collected, exclusive-offset-folded
    driver-side (bounded by construction), and broadcast-joined back;
    (4) a window cumsum WITHIN each bucket (parallel sorts of |bucket|
    rows, never |table|). Exclusive prefix = bucket offset + in-bucket
    cumsum − own size; all arithmetic is integer (``div``), so the plan
    replays bit-exactly in ANSI SQL. At 10^12 rows the only shuffles are
    the bucket agg and the bucket-partitioned window — both keyed on the
    bounded bucket id, with AQE free to split the hot ranges of a skewed
    id distribution.

    ``id_col`` must be numeric and unique (it is the global order and
    the tie-break); sizes must be non-negative."""
    if shard_bytes <= 0:
        raise ValueError("shard_plan: shard_bytes must be positive")
    spark = df.sparkSession
    out_schema = f"{id_col} long, size long, shard long"
    stats = df.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if stats.lo is None:
        return spark.createDataFrame([], out_schema)
    lo, hi = int(stats.lo), int(stats.hi)
    span = hi - lo + 1
    idc = F.col(id_col).cast("long")
    bucket = F.expr(
        f"(CAST({id_col} AS BIGINT) - {lo}) * {n_buckets} div {span}"
    )
    sized = df.select(
        idc.alias(id_col),
        F.col(size_col).cast("long").alias("size"),
        bucket.alias("_b"),
    )
    per_bucket = (
        sized.groupBy("_b").agg(F.sum("size").alias("s")).orderBy("_b").collect()
    )
    offsets, running = [], 0
    for r in per_bucket:
        offsets.append((int(r._b), running))
        running += int(r.s)
    off_df = spark.createDataFrame(offsets, "_b long, _off long")
    w = Window.partitionBy("_b").orderBy(id_col)
    cum = F.sum("size").over(w)
    return (
        sized.join(F.broadcast(off_df), "_b")
        .withColumn("_excl", F.col("_off") + cum - F.col("size"))
        .withColumn("shard", F.expr(f"_excl div {shard_bytes}"))
        .select(id_col, "size", "shard")
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

def boilerplate_lines(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    lines_col,
    min_docs: int = 3,
    max_lines: int = 10_000,
) -> DataFrame:
    """→ (domain, line, n_docs): lines that recur across ≥ ``min_docs``
    distinct documents of the same domain — the C4/RefinedWeb-style
    boilerplate census (nav bars, cookie banners, footers repeat on every
    page of a site; body text doesn't). ``lines_col`` is an array<string>
    column (or name) — callers pass ``textstats.nonblank_lines(text)`` for
    real pages or any pseudo-line splitter; the operator is agnostic.

    Counting is per-document (``array_distinct`` before the explode), so a
    line repeated inside one page counts once, and the groupBy count equals
    count(DISTINCT doc) without a distinct aggregate. ``max_lines`` caps
    the census per domain by (n_docs desc, line) — at 100 TB this bounds
    both the result and the downstream broadcast in
    :func:`strip_boilerplate` no matter how degenerate a template site is.

    Plan: one narrow explode of per-doc DISTINCT lines (never the full
    text), one hash agg on (domain, line), one window over the already
    tiny census. Nothing corpus-sized shuffles twice."""
    lines = F.col(lines_col) if isinstance(lines_col, str) else lines_col
    census = (
        df.select(
            F.col(domain_col).alias("domain"),
            F.explode(F.array_distinct(lines)).alias("line"),
        )
        .where(F.col("line") != "")
        .groupBy("domain", "line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )
    w = Window.partitionBy("domain").orderBy(F.col("n_docs").desc(), "line")
    return (
        census.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_lines)
        .drop("_rk")
    )


def strip_boilerplate(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    lines_col,
    min_docs: int = 3,
    max_lines: int = 10_000,
) -> DataFrame:
    """Append ``clean_lines``: the input line array with its domain's
    boilerplate lines removed, order and duplicates preserved (this is a
    filter, not a set-subtract — ``array_except`` would dedupe and reorder
    the body text). Empty-string lines are never boilerplate-eligible and
    are always kept, preserving paragraph structure.

    Plan: the capped census from :func:`boilerplate_lines` collapses to one
    array per domain and BROADCASTS (≤ max_lines × |domains| short strings
    by construction); the corpus pass is then a shuffle-free map — no
    explode, no corpus-sized join. A domain with no boilerplate joins null
    and keeps every line."""
    lines = F.col(lines_col) if isinstance(lines_col, str) else lines_col
    dim = (
        boilerplate_lines(df, id_col, domain_col, lines, min_docs, max_lines)
        .groupBy("domain")
        .agg(F.collect_list("line").alias("_bl"))
    )
    joined = df.join(
        F.broadcast(dim), df[domain_col] == dim["domain"], "left"
    ).drop("domain")
    keep = lambda x: (x == F.lit("")) | ~F.coalesce(
        F.array_contains(F.col("_bl"), x), F.lit(False)
    )
    return joined.withColumn("clean_lines", F.filter(lines, keep)).drop("_bl")

def quota_by_stratum(
    df: DataFrame,
    strata_col: str,
    tokens_col: str,
    budget: int,
    order_by: list,
) -> DataFrame:
    """Append (rank, cum_tokens, selected): greedy per-stratum selection
    under a token budget — the "take the best documents from each source
    until its quota is full" pass that turns mix weights into an actual
    training set. Within each stratum, documents are ranked by ``order_by``
    (pass quality desc + id asc — the tie-break must make the order total,
    or ranks are nondeterministic); a document is selected iff the running
    token total INCLUDING it stays ≤ ``budget`` (no overflow — the first
    document that would cross the line, and everything after it, is out).

    One window over (stratum) — the shuffle moves (id, tokens, order keys),
    never text. Ordered running sums serialize per stratum, which is fine
    when strata are domains/sources (cardinality ≫ cores); for a single
    giant stratum, pre-bucket by a secondary key or raise the budget
    granularity instead."""
    wo = Window.partitionBy(strata_col).orderBy(*order_by)
    wf = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum(F.col(tokens_col).cast("long")).over(wf)
    return (
        df.withColumn("rank", F.row_number().over(wo))
        .withColumn("cum_tokens", cum)
        .withColumn("selected", F.col("cum_tokens") <= F.lit(budget))
    )

def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """→ (id, chunk_id, chunk_text, n_tokens): split each document's
    whitespace tokens into context-window chunks of ≤ ``chunk_tokens``
    with ``overlap`` tokens shared between consecutive chunks (stride =
    chunk_tokens − overlap) — the pre-packing pass that turns over-long
    documents into trainable sequences without dropping their tails.
    The final chunk may be short; documents with no tokens emit no rows.

    Plan: tokenize once, ``explode(sequence(...))`` over the per-doc chunk
    count, slice per chunk — a narrow generate, zero shuffles; output row
    count = Σ ceil((n_i − overlap)/stride). The token arrays never
    shuffle (chunking happens in the scan stage)."""
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    n = F.size(F.col("_t"))
    n_chunks = (
        F.when(n <= chunk_tokens, F.lit(1))
        .otherwise(
            F.lit(1)
            + F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(stride))).cast("int")
        )
    )
    chunk_toks = F.slice(
        F.col("_t"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col), toks.alias("_t"))
        .where(F.size("_t") > 0)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(chunk_toks, " ").alias("chunk_text"),
            F.size(chunk_toks).cast("long").alias("n_tokens"),
        )
    )


def url_blocklist_flags(
    df: DataFrame,
    blocked_domains: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    path_patterns: tuple[str, ...] = (),
) -> DataFrame:
    """UT1-style URL filtering (the blocklist gate crawls apply before any
    content-based quality pass): every input row + ``host``,
    ``domain_blocked`` (host equals a blocked domain OR is a subdomain of
    one), ``path_flagged`` (any of ``path_patterns`` matches the URL,
    case-insensitive), and the combined ``allowed``.

    Plan: subdomain matching is an EQUI-join — the host explodes to its
    dot-suffix set ('a.b.example.org' → 4 candidates, bounded by label
    count) against the (deduped) blocklist dim, so no LIKE-join cross
    product anywhere; only ``(id, suffix)`` rows travel, and the blocklist
    broadcasts at UT1 scale (~4M domains). Pattern flags are a
    zero-shuffle regex battery on the original rows."""
    from ..functions.url import url_host

    host = url_host(F.col(url_col))
    # host 'a.b.example.org' → candidate suffixes [a.b.example.org,
    # b.example.org, example.org, org]: equi-joinable against the list
    labels = F.split(host, r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(0), F.size(labels) - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, F.size(labels)), "."),
    )
    dim = blocked_domains.select(
        F.col(blocked_domains.columns[0]).alias("_blocked_domain")
    ).distinct()
    blocked_ids = (
        df.select(F.col(id_col).alias("_id"), F.explode(suffixes).alias("_suffix"))
        .join(dim, F.col("_suffix") == F.col("_blocked_domain"), "left_semi")
        .select("_id")
        .distinct()
        .withColumn("_blocked", F.lit(True))
    )
    flagged = df.join(blocked_ids, df[id_col] == blocked_ids["_id"], "left").drop("_id")
    path_flag = F.lit(False)
    for pat in path_patterns:
        path_flag = path_flag | F.col(url_col).rlike(f"(?i){pat}")
    is_blocked = F.coalesce(F.col("_blocked"), F.lit(False))
    return flagged.select(
        *df.columns,
        host.alias("host"),
        is_blocked.alias("domain_blocked"),
        path_flag.alias("path_flagged"),
        (~is_blocked & ~path_flag).alias("allowed"),
    )


def dedup_lines_in_doc(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """In-document exact line dedup, first occurrence kept (the
    intra-page face of the cross-corpus boilerplate strip): →
    ``(doc_id, text_dedup, n_lines, n_dropped)``. Pure Column algebra —
    the keep-first filter is ``array_position(lines, x) == own index``
    (first-occurrence test), quadratic in LINES PER DOC (bounded small),
    never in docs; zero shuffles, zero UDFs."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(
        lines,
        lambda x, i: F.array_position(lines, x) == i.cast("long") + 1,
    )
    return df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.array_join(kept, "\n").alias("text_dedup"),
        F.size(lines).cast("long").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("long").alias("n_dropped"),
    )


def survivors_by_score(
    df: DataFrame, pairs: DataFrame, id_col: str, score: Column
) -> DataFrame:
    """Quality-aware near-dup survivor selection: keep the BEST-scoring
    document per connected near-dup cluster (ties → min id), drop the rest
    — what production corpus pipelines actually do with near-dup clusters
    (min-id survivors throw away the best-extracted copy of a page;
    keeping argmax quality retains it). Documents in no cluster pass
    through unchanged; output is ``df``'s own schema.

    Plan: clusters come from ``duplicate_clusters`` over the pair list
    (edges only — a tiny fraction of the corpus); the per-cluster argmax
    is one groupBy over cluster MEMBERS via a ``max(struct(score, -id))``
    (one aggregate, deterministic tie-break to the smallest id); the only
    corpus-sized step is a single left-anti join against the non-survivor
    id list, which is bounded by the number of clustered documents and
    broadcastable in the common low-dup regime."""
    from .dedup import duplicate_clusters

    cl = duplicate_clusters(pairs)
    scored = df.select(F.col(id_col).alias("_sid"), score.alias("_score"))
    member = cl.join(scored, cl["doc_id"] == scored["_sid"]).select(
        "doc_id", "cluster_id", "_score"
    )
    best = member.groupBy("cluster_id").agg(
        F.max(
            F.struct(F.col("_score").alias("s"), (-F.col("doc_id")).alias("nid"))
        ).alias("_b")
    )
    winners = best.select((-F.col("_b.nid")).alias("doc_id"))
    losers = member.select("doc_id").exceptAll(winners)
    return df.join(
        losers.withColumnRenamed("doc_id", "_loser"),
        df[id_col] == F.col("_loser"),
        "left_anti",
    )


def curation_funnel(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    allowed_langs: tuple[str, ...] = ("en",),
    fingerprint_col: str | None = None,
    c4_kwargs: dict | None = None,
    gopher_kwargs: dict | None = None,
) -> DataFrame:
    """The composed corpus-cleaning recipe (C4 → Gopher → language →
    exact dedup) with per-document drop attribution: every doc gets the
    FIRST stage that rejected it — ``'c4'`` | ``'gopher'`` | ``'lang'`` |
    ``'exact_dup'`` — or ``'kept'``. This is the FineWeb/RedPajama
    pipeline shape as ONE operator, so the funnel is auditable instead of
    four opaque chained filters.

    Plan: the three filter batteries are pure Column algebra evaluated in
    a SINGLE projection (no per-battery DataFrame joins — ``c4_exprs`` /
    ``gopher_passes_expr`` compose at expression level, one codegen span,
    zero shuffles). The only Exchange is the dedup stage: one window over
    the content fingerprint whose ``min`` is CONDITIONAL on having passed
    the earlier stages (``min(when(passing, id))``), so dropped docs never
    contend for survivorship and no join is needed. Dedup fingerprints by
    ``fingerprint_col`` (default: md5 of the raw text column) — dedup is
    on original content, not the C4-rewritten text.
    """
    from ..functions.cleaning import c4_exprs, gopher_passes_expr

    text = F.col(text_col)
    c4_kept = c4_exprs(text, **(c4_kwargs or {}))["kept"]
    gopher_ok = gopher_passes_expr(text, **(gopher_kwargs or {}))
    lang_ok = F.col(lang_col).isin(*allowed_langs)
    fp = (
        F.col(fingerprint_col)
        if fingerprint_col
        else F.md5(F.coalesce(text, F.lit("")))
    )
    staged = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        fp.alias("_fp"),
        F.when(~c4_kept, F.lit("c4"))
        .when(~gopher_ok, F.lit("gopher"))
        .when(~lang_ok, F.lit("lang"))
        .alias("_pre_stage"),
    )
    w = Window.partitionBy("_fp")
    survivor = F.min(
        F.when(F.col("_pre_stage").isNull(), F.col("doc_id"))
    ).over(w)
    return staged.select(
        "doc_id",
        F.coalesce(
            F.col("_pre_stage"),
            F.when(F.col("doc_id") != survivor, F.lit("exact_dup")),
            F.lit("kept"),
        ).alias("stage"),
    )


#: funnel stage ordering for the census (pipeline order, then 'kept')
FUNNEL_STAGES = ("c4", "gopher", "lang", "exact_dup", "kept")


def funnel_census(staged: DataFrame) -> DataFrame:
    """Aggregate a ``curation_funnel`` attribution into the funnel view:
    ``(stage, n_docs, share)`` — share of the whole corpus, one groupBy
    over the per-doc stages plus a window sum over the ≤5-row census."""
    census = staged.groupBy("stage").agg(F.count(F.lit(1)).alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    return census.select(
        "stage",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / total, 6).alias("share"),
    )


def canonical_census(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """Publisher-declared duplicate clusters: group pages by their
    ``<link rel="canonical">`` target → ``(canonical, n_pages,
    n_src_hosts, n_offhost)`` — the census of where publishers SAY the
    authoritative copy lives, the complement of content-derived dedup
    (exact/minhash): a canonical cluster of 40 pages is 39 rows a
    curator can drop with the publisher's own blessing, and
    ``n_offhost > 0`` (pages canonicalizing to a DIFFERENT host) is the
    syndication / scraped-content signal.

    Plan: one scan extracts the href with pure Column regexes
    (functions/extraction.py:canonical_href) — pages declaring no
    canonical drop out before the shuffle — then ONE canonical-grain
    hash agg (count, distinct source hosts, off-host count). Nothing
    but (src_host, canonical) ever shuffles; a viral canonical target
    is exactly the AQE skew-split case."""
    from ..functions.extraction import canonical_href, link_host

    rows = pages.select(
        link_host(F.col(url_col)).alias("_src_host"),
        canonical_href(F.col(html_col)).alias("canonical"),
    ).where(F.col("canonical").isNotNull())
    can_host = link_host(F.col("canonical"))
    return rows.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("_src_host").alias("n_src_hosts"),
        F.count(
            F.when(
                can_host.isNotNull() & (can_host != F.col("_src_host")), 1
            )
        ).alias("n_offhost"),
    )


def url_param_census(
    pages: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Query-string parameter census → one row per raw parameter key
    ``(param, n_pairs, n_urls, n_hosts, n_values, n_blank,
    distinct_ratio_micro)`` — the evidence table behind URL
    canonicalization: a param seen on many hosts whose value is almost
    always DISTINCT per URL (``distinct_ratio_micro`` → 1e6) is a
    tracking token (utm_*, fbclid, session ids) that must be stripped
    before URL-keyed dedup, while a low-ratio param (page, sort) carries
    real content addressing. Complements ``canonical_census`` (publisher
    -declared clusters) with the mechanically-derived strip list.

    Raw-key semantics, documented: no percent-decoding or case folding
    (``?ID=`` and ``?id=`` are different keys on some servers — folding
    is the caller's canonicalization decision, this is the census);
    a bare flag (``?debug``) is a key with NULL value; ``?ref=`` is a
    key with a blank value (counted in ``n_blank``, and '' is one of the
    ``n_values`` distinct values). ``distinct_ratio_micro`` is exact
    integer floor-division ``(1e6 · n_values) div n_pairs`` — bit-portable,
    no float fold.

    Plan: ONE scan — query string and host lift out with pure Column
    regexes, pairs explode at ``&`` grain — then ONE param-grain agg.
    The three count-distincts expand the shuffle ×3, but at (param,
    url-id, value) pair grain: page content never shuffles, and a viral
    param (``utm_source`` on half the web) is exactly the AQE skew-split
    case."""
    url = F.col(url_col)
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    host = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", 1)
    pairs = (
        pages.select(
            url.alias("_url"),
            host.alias("_host"),
            F.explode(F.split(qs, "&")).alias("_pair"),
        )
        .where(F.col("_pair") != "")
    )
    pos = F.instr(F.col("_pair"), "=")
    kv = pairs.select(
        "_url",
        "_host",
        F.when(pos > 0, F.expr("substring(_pair, 1, instr(_pair, '=') - 1)"))
        .otherwise(F.col("_pair"))
        .alias("param"),
        F.when(
            pos > 0,
            F.expr("substring(_pair, instr(_pair, '=') + 1, length(_pair))"),
        ).alias("value"),
    )
    return (
        kv.groupBy("param")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("_url").alias("n_urls"),
            F.countDistinct("_host").alias("n_hosts"),
            F.countDistinct("value").alias("n_values"),
            F.count(
                F.when(F.col("value").isNull() | (F.col("value") == ""), 1)
            ).alias("n_blank"),
        )
        .withColumn(
            "distinct_ratio_micro",
            F.expr("(1000000 * n_values) div n_pairs"),
        )
    )


def continuation_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 48,
    max_key: int = 100,
) -> DataFrame:
    """→ ``(doc_a, doc_b, boundary_key)``: document pairs where the LAST
    ``k`` characters of A equal the FIRST ``k`` characters of B — the
    tail→head chaining signature of articles split across pages
    ("…continued on page 2") that near-dup detectors miss because the
    bodies DON'T overlap. Feed the pairs to ``dedup.duplicate_clusters``
    to reassemble full chains.

    Whitespace-trimmed, case-preserved; docs shorter than ``2k`` chars are
    excluded (their head and tail overlap, which would self-chain every
    short template page). Keys shared by more than ``max_key`` docs on
    either side are dropped — a hot boundary key is boilerplate (a shared
    footer start / header end), and the cap bounds the equi-join fan-out
    exactly as the LSH family's ``max_bucket`` does. ``doc_a != doc_b``;
    A→B and B→A are distinct rows (the chain is directed).

    Plan: two narrow projections of the one input scan, per-key window
    counts (the cap), one equi-join on the ``k``-char key. No self-join of
    full rows; only ids + ``k``-char keys shuffle.
    """
    t = F.trim(F.col(text_col))
    eligible = df.where(
        F.col(text_col).isNotNull() & (F.length(t) >= 2 * k)
    ).select(F.col(id_col).alias("id"), t.alias("t"))
    tails = eligible.select("id", F.substring("t", -k, k).alias("boundary_key"))
    heads = eligible.select("id", F.substring("t", 1, k).alias("boundary_key"))
    wk = Window.partitionBy("boundary_key")
    tails = tails.withColumn("n", F.count(F.lit(1)).over(wk)).where(
        F.col("n") <= max_key
    )
    heads = heads.withColumn("n", F.count(F.lit(1)).over(wk)).where(
        F.col("n") <= max_key
    )
    return (
        tails.select(F.col("id").alias("doc_a"), "boundary_key")
        .join(heads.select(F.col("id").alias("doc_b"), "boundary_key"), "boundary_key")
        .where(F.col("doc_a") != F.col("doc_b"))
        .select("doc_a", "doc_b", "boundary_key")
    )


def duplicate_title_census(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    min_pages: int = 2,
) -> DataFrame:
    """Duplicated ``<title>`` census → one row per title text shared by
    ``min_pages``+ pages: ``(title, n_pages, n_hosts, example_url)``.
    The zero-model template/scrape detector: a title on 400 pages across
    40 hosts is boilerplate or syndication, and ``n_hosts = 1`` vs
    ``n_hosts ≫ 1`` separates a site's own template from cross-host
    scraping — the publisher-metadata complement of content dedup
    (minhash/simhash) and of `canonical_census`'s declared clusters.

    Plan: ONE scan extracts + normalizes the title with pure Column
    regexes (functions/extraction.py:title_text — JVM codegen, zero
    Python); titleless pages drop before the shuffle; then ONE
    title-grain hash agg (count, distinct hosts, min url as the
    deterministic example). Only (title, host, url) ever shuffles; a
    mega-template title is the textbook AQE skew-split case."""
    from ..functions.extraction import link_host, title_text

    rows = pages.select(
        F.col(url_col).alias("_url"),
        link_host(F.col(url_col)).alias("_host"),
        title_text(F.col(html_col)).alias("title"),
    ).where(F.col("title").isNotNull())
    return rows.groupBy("title").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("_host").alias("n_hosts"),
        F.min("_url").alias("example_url"),
    ).where(F.col("n_pages") >= min_pages)


def mixture_token_plan(
    df: DataFrame,
    source_col: str,
    token_col: str,
    weights_ppm: dict[str, int],
    budget_tokens: int,
) -> DataFrame:
    """Token-budget mixture planner → one row per source:
    ``(source, available_tokens, weight_ppm, target_tokens, epochs_micro,
    oversubscribed)``.

    The static planning step every mixture-weighted pretraining corpus
    needs (The-Pile/DoReMi-style): given target mixture weights and a
    total token budget, how many tokens to draw from each source, what
    sampling rate / repeat factor that implies against what the source
    actually has, and which sources are OVERSUBSCRIBED (target > available
    — the pipeline will repeat data, a decision that should be loud, not
    emergent).

    Exactness: weights are parts-per-million INTEGERS and all derived
    quantities are integer/decimal arithmetic — ``target_tokens =
    ⌊budget · ppm / 10^6⌋``, ``epochs_micro = ⌊10^6 · target /
    available⌋`` (µ-epochs; 1_000_000 = exactly one pass) — so the plan is
    bit-identical across engines and runs (the float-weight formulation
    would tie the plan to IEEE rounding of someone's YAML). DECIMAL(38,0)
    intermediates keep the products exact past 2^53.

    Plan shape: ONE partial-agg sum per source (the only corpus-sized
    work), then a full outer join against the |weights|-row literal dim —
    sources in the corpus but not the plan get weight 0 (target 0: an
    explicit "drop" row, not a silent omission); sources in the plan but
    not the corpus surface with available 0 and oversubscribed=true."""
    if budget_tokens < 0:
        raise ValueError(f"mixture_token_plan: negative budget {budget_tokens}")
    for s, ppm in weights_ppm.items():
        if ppm < 0:
            raise ValueError(f"mixture_token_plan: negative weight for {s!r}")
    spark = df.sparkSession
    avail = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(F.col(token_col)).cast("long").alias("available_tokens")
    )
    dim = spark.createDataFrame(
        [(s, int(p)) for s, p in sorted(weights_ppm.items())],
        "source string, weight_ppm long",
    )
    j = avail.join(dim, "source", "full_outer").select(
        "source",
        F.coalesce("available_tokens", F.lit(0)).alias("available_tokens"),
        F.coalesce("weight_ppm", F.lit(0)).alias("weight_ppm"),
    )
    dec = "decimal(38,0)"
    target = F.floor(
        (F.lit(int(budget_tokens)).cast(dec) * F.col("weight_ppm").cast(dec))
        / F.lit(1_000_000).cast(dec)
    ).cast("long")
    j = j.withColumn("target_tokens", target)
    epochs = F.when(
        F.col("available_tokens") > 0,
        F.floor(
            (F.col("target_tokens").cast(dec) * F.lit(1_000_000).cast(dec))
            / F.col("available_tokens").cast(dec)
        ).cast("long"),
    )
    return j.select(
        "source",
        "available_tokens",
        "weight_ppm",
        "target_tokens",
        epochs.alias("epochs_micro"),
        (F.col("target_tokens") > F.col("available_tokens")).alias("oversubscribed"),
    )


def rank_normalize(
    df: DataFrame, group_col: str, score_col: str, id_col: str
) -> DataFrame:
    """Per-group percentile normalization of a score column → the input
    plus ``<score>_rank ∈ [0, 1]`` (percent_rank within ``group_col``).

    Quality scores are not comparable across sources — a '0.7' from a
    curated-news source and a '0.7' from a forum dump sit at wildly
    different percentiles of their own distributions, so one global
    threshold over-prunes one source and under-prunes the other. Rank
    normalization makes 'keep the top 40% of EACH source' a single
    threshold on one column.

    Determinism: ties in the score are broken by ``id_col``, making the
    rank a pure function of the data (and SQL-replicable); the rank is
    the raw (rank−1)/(n−1) IEEE double, unrounded, both engines computing
    the identical division. ONE Exchange on ``group_col`` (the window);
    groups are source-grain (thousands at most), and a skewed giant
    source is one sorted partition — acceptable because the window needs
    no frame, only rank order; for a pathological single-source corpus
    use a global sort instead."""
    w = Window.partitionBy(group_col).orderBy(score_col, id_col)
    return df.withColumn(f"{score_col}_rank", F.percent_rank().over(w))


def idn_spoof_census(df: DataFrame, url_col: str = "url") -> DataFrame:
    """IDN / homoglyph spoof census → one row per FLAGGED host:
    ``(host, n_pages, punycode, mixed_script, non_ascii)``.

    The URL battery's adversarial face: `URL_MALFORMED` catches broken
    urls, this catches urls built to LOOK right — punycode (``xn--``)
    labels hiding an IDN from ASCII-only review, labels mixing Latin
    with Cyrillic/Greek confusables (``paypаl``), and the broad
    any-non-ASCII feed. Pure-Cyrillic/Greek labels are legitimate IDNs:
    non_ascii=true, mixed_script=false — the flags separate "foreign"
    from "spoof-shaped". No reference analog (its urls are occurrence
    fields, not an attack surface); detection regexes live in
    functions/url.py restricted to Java/RE2-identical constructs so the
    oracle replays them.

    Plan: one url-column scan → host projection → ONE host-grain groupBy
    (map-side combinable); the three flags are recomputed FROM the host
    key after grouping (host-deterministic, so flag-then-group and
    group-then-flag agree — the latter keeps the pre-shuffle row narrow).
    Output is host-grain, bounded by distinct flagged hosts.
    """
    from ..functions.url import (
        host_mixed_script,
        host_non_ascii,
        host_punycode,
        url_host,
    )

    host = F.lower(url_host(F.col(url_col)))
    grouped = (
        df.select(host.alias("host"))
        .where(F.col("host") != "")
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    h = F.col("host")
    return (
        grouped.withColumn("punycode", host_punycode(h))
        .withColumn("mixed_script", host_mixed_script(h))
        .withColumn("non_ascii", host_non_ascii(h))
        .where(F.col("punycode") | F.col("mixed_script") | F.col("non_ascii"))
        .orderBy("host")
    )


def term_blocklist_flags(
    df: DataFrame,
    blocked_terms: "list[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-level blocklist gate (the text-side complement of
    `url_blocklist_flags` — C4 drops any page containing a "bad words"
    list token; Raffel et al. 2020 §2.2): every input row →
    ``(id, n_tokens, blocked_hits, blocked_distinct, allowed)`` where
    ``blocked_hits`` counts OCCURRENCES of blocked tokens,
    ``blocked_distinct`` counts distinct blocked terms present, and
    ``allowed`` is the C4 keep decision (zero hits).

    Exact whole-token matching on the whitespace tokenization (the
    house tokenizer) — no substring matches, so 'class' never trips
    'ass'-style lists. The blocklist is a tiny in-plan literal array
    (hundreds of terms), NOT a join dimension: the whole gate is
    zero-shuffle Column algebra over one scan, the plan you want when
    the corpus is 10^12 rows and the list is 10^2.
    """
    if not blocked_terms:
        raise ValueError("term_blocklist_flags: empty blocklist")
    blocked = F.array(
        *[F.lit(t.lower()) for t in sorted(set(t.lower() for t in blocked_terms))]
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    hits = F.size(F.filter(toks, lambda t: F.array_contains(blocked, t)))
    distinct = F.size(F.array_intersect(F.array_distinct(toks), blocked))
    has_text = F.col(text_col).isNotNull()
    return df.select(
        id_col,
        F.when(has_text, F.size(toks).cast("long")).alias("n_tokens"),
        F.when(has_text, hits.cast("long")).alias("blocked_hits"),
        F.when(has_text, distinct.cast("long")).alias("blocked_distinct"),
        F.when(has_text, hits == 0).alias("allowed"),
    )


def term_blocklist_census(
    df: DataFrame,
    blocked_terms: "list[str]",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-blocked-term corpus census → ``(term, n_docs, n_occurrences)``,
    blocked terms actually present only. The reviewer's view of the gate:
    which list entries do the damage, before committing to the drop.

    Plan: tokens are filtered to the blocklist BEFORE the explode (the
    literal-array membership test runs inside the scan's codegen), so
    only blocked-token rows exist post-explode; then ONE term-grain
    groupBy — output bounded by the blocklist length, shuffle input
    bounded by blocked-token occurrences, never corpus token count.
    """
    if not blocked_terms:
        raise ValueError("term_blocklist_census: empty blocklist")
    blocked = F.array(
        *[F.lit(t.lower()) for t in sorted(set(t.lower() for t in blocked_terms))]
    )
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda t: (t != "") & F.array_contains(blocked, t),
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("_id"), F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(
            F.count_distinct("_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy("term")
    )


def _mirror_posts(df: DataFrame, url_col: str, text_col: str) -> DataFrame:
    """Distinct (fp, host) posting rows for the mirror census — md5
    normalization fingerprint (functions/textstats.content_fingerprint)
    per page, host extracted + lowercased, one row per distinct pair."""
    from ..functions.textstats import content_fingerprint
    from ..functions.url import url_host

    host = F.lower(url_host(F.col(url_col)))
    return (
        df.where(F.col(text_col).isNotNull())
        .select(
            host.alias("host"),
            content_fingerprint(F.col(text_col)).alias("fp"),
        )
        .where(F.col("host") != "")
        .distinct()
    )


def mirror_census(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    min_shared: int = 2,
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """Mirror-site census → one row per host pair sharing exact content:
    ``(host_a, host_b, n_shared, n_a, n_b, overlap_micro)`` with
    ``host_a < host_b``, ``n_shared >= min_shared``.

    The exact-content complement of `metrics.style_distance_census`
    (style catches same-template-different-words; this catches the
    mirrors, scrapers, and CDN aliases that serve the SAME text from
    different hosts — the crawl-curation signal that decides which host
    to keep before page-level dedup throws darts). ``overlap_micro`` is
    the exact-integer overlap coefficient ``(10^6·n_shared) div
    min(n_a, n_b)`` — 10^6 means one host's distinct content is a subset
    of the other's.

    Plan (the dedup posting-list discipline): distinct (fp, host) rows →
    fingerprint-grain size census keeps only fps on 2..``max_hosts_per_fp``
    hosts (hotter fps are boilerplate — empty pages, error templates —
    and would explode the pair space quadratically; account for them with
    `mirror_census_dropped`, never silently) → within-fp equi-self-join
    fans out ≤ cap²/2 pairs per fp → ONE pair-grain groupBy → two
    host-grain joins attach the per-host distinct-fp totals. No
    all-pairs anywhere; every join is an equi-join.
    """
    if min_shared < 1:
        raise ValueError(f"mirror_census: min_shared must be >= 1, got {min_shared}")
    posts = _mirror_posts(df, url_col, text_col)
    per_host = posts.groupBy("host").agg(F.count(F.lit(1)).alias("n_fps"))
    eligible = (
        posts.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
        .where((F.col("n_hosts") >= 2) & (F.col("n_hosts") <= max_hosts_per_fp))
        .select("fp")
    )
    shared = posts.join(eligible, "fp")
    a = shared.select("fp", F.col("host").alias("host_a"))
    b = shared.select("fp", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    na = per_host.select(
        F.col("host").alias("host_a"), F.col("n_fps").alias("n_a")
    )
    nb = per_host.select(
        F.col("host").alias("host_b"), F.col("n_fps").alias("n_b")
    )
    return (
        pairs.join(na, "host_a")
        .join(nb, "host_b")
        .select(
            "host_a",
            "host_b",
            "n_shared",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("(1000000 * n_shared) div least(n_a, n_b)")
            .cast("long")
            .alias("overlap_micro"),
        )
        .orderBy("host_a", "host_b")
    )


def mirror_census_dropped(
    df: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    max_hosts_per_fp: int = 50,
) -> DataFrame:
    """Fingerprints `mirror_census`'s cap dropped, with their host counts
    (``(fp, n_hosts)``) — the no-silent-caps report: a fp on more hosts
    than the cap is boilerplate by construction, but the CALLER decides
    that after seeing the census, not the operator by omission."""
    return (
        _mirror_posts(df, url_col, text_col)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_hosts"))
        .where(F.col("n_hosts") > max_hosts_per_fp)
        .select("fp", F.col("n_hosts").cast("long").alias("n_hosts"))
        .orderBy("fp")
    )
