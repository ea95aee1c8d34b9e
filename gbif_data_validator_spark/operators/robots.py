"""robots.txt compliance audit: parse crawl-politeness rules, flag
corpus pages a host's robots.txt disallows.

Web-native validation the reference's "indexable" verdict implies but
never computes (its inputs are archives, not crawls): a Common-Crawl
style corpus SHOULD contain no page its own robots.txt snapshot
disallows — every hit is either a crawler-politeness bug or a stale
rules snapshot, and both are findings. The meta-robots scan
(``functions/extraction.py:robots_directives``) covers the per-page
opt-out; this module covers the per-host one.

Grammar (deliberately the interoperable core of RFC 9309, documented
here as the contract):
- lines split on ``\n``; a trailing ``\r`` and ``#``-comments strip;
  field names are case-insensitive; whitespace around ``:`` collapses.
- a RECORD is a maximal run of consecutive ``User-agent:`` lines
  followed by its directive lines (so ``User-agent: a\nUser-agent: *\n
  Disallow: /x`` applies ``/x`` to both agents — the multi-UA run case
  naive parsers drop).
- only records naming agent ``*`` contribute; only ``Disallow`` rules
  are extracted; an EMPTY ``Disallow:`` means allow-everything and
  yields no rule. Path matching is prefix match (no ``*``/``$``
  wildcards — they are extensions; rules containing them are surfaced
  with ``has_wildcard = true`` so the caller can route them to a
  stricter matcher instead of silently mis-applying them).

Scale shape: parsing is one ``posexplode`` over robots documents (a
per-HOST table — millions of rows where the pages table has trillions)
plus one window over (host, line order) to assign record ids: the only
shuffle is host-grain and tiny. The page-side audit is an equi-join on
host with the rule table (broadcast under a guard — the global rule
table of a 10^8-host crawl still fits in memory bucketed per host; past
the guard it degrades to a shuffle join) and a prefix predicate that
stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: refuse to force-broadcast a rule table larger than this many rows
MAX_BROADCAST_RULES = 20_000_000


def _norm_line(line: F.Column) -> F.Column:
    """Strip comment + CR, collapse whitespace, lowercase the FIELD part
    only (paths are case-sensitive per RFC 9309)."""
    bare = F.trim(F.regexp_replace(F.regexp_replace(line, "\r", ""), "#.*$", ""))
    return bare


def _star_record_lines(
    robots: DataFrame, host_col: str, text_col: str
) -> DataFrame:
    """Shared relational parse → directive lines ``(host, pos, field,
    value)`` restricted to records whose user-agent set includes ``*``
    (record ids assigned with one host-grain lag/cumsum window pass)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    ).select("host", "pos", _norm_line(F.col("raw")).alias("line"))

    field = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    lines = lines.select(
        "host", "pos", field.alias("field"), value.alias("value")
    )

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("field") == "user-agent").cast("int")
    prev_ua = F.coalesce(F.lag(is_ua).over(w), F.lit(0))
    # record id: increments at each ua-run START (ua line not preceded
    # by a ua line); directive lines inherit the current record id
    rec = F.sum(F.when((is_ua == 1) & (prev_ua == 0), 1).otherwise(0)).over(w)
    lines = lines.withColumn("rec", rec)

    star = (
        lines.where((F.col("field") == "user-agent") & (F.col("value") == "*"))
        .select("host", "rec")
        .distinct()
    )
    return lines.join(star, ["host", "rec"])


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Parse robots.txt documents → ``(host, rule, has_wildcard)``, one
    row per ``Disallow`` path in a record whose user-agent set includes
    ``*`` (see module grammar). Deterministic pure-relational parse:
    posexplode + ONE host-grain window pass, no Python."""
    lines = _star_record_lines(robots, host_col, text_col)
    return (
        lines.where((F.col("field") == "disallow") & (F.col("value") != ""))
        .select(
            "host",
            F.col("value").alias("rule"),
            F.col("value").rlike(r"[*$]").alias("has_wildcard"),
        )
        .distinct()
    )


def robots_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Per-host ``Crawl-delay`` from ``*``-records → ``(host,
    crawl_delay_s)``. The directive is non-standard but ubiquitous;
    when a host declares several (multiple star records), the MAXIMUM
    wins — the audit should hold the crawler to the most conservative
    politeness bound it was shown. Unparseable values are ignored
    (``try_cast``): a malformed directive is the host's bug, not a
    reason to invent a delay."""
    lines = _star_record_lines(robots, host_col, text_col)
    delay = F.expr("try_cast(value AS DOUBLE)")
    return (
        lines.where(F.col("field") == "crawl-delay")
        .select("host", delay.alias("_d"))
        .where(F.col("_d").isNotNull() & (F.col("_d") > 0))
        .groupBy("host")
        .agg(F.max("_d").alias("crawl_delay_s"))
    )


def crawl_delay_violations(
    pages: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    force_broadcast: bool | None = None,
) -> DataFrame:
    """Fetches that violated a host's declared ``Crawl-delay`` →
    ``(host, url, fetch_ts, gap_s, crawl_delay_s)``: within each host,
    fetches order by ``(ts, url)`` (the url tie-break makes equal
    timestamps deterministic) and a row is a violation when the gap to
    the PREVIOUS fetch is below the declared delay — the crawler-side
    politeness audit that closes the loop ``robots_crawl_delay`` opens,
    and the per-host counterpart of the corpus-wide arrival-rate
    control chart (``operators/sequence.py``).

    Plan: the delay table is host-grain (broadcast under the same guard
    as ``robots_blocked``); the inner join drops every host with no
    declared delay BEFORE the window, so the per-host sort only runs
    over audited hosts. Per-host ordering is a window over (host), the
    same host-grain-key contract as ``asof_join`` — a single host's
    fetch history sorts on one reducer by design."""
    from ..functions.extraction import link_host

    if force_broadcast is None:
        force_broadcast = delays.count() <= MAX_BROADCAST_RULES
    d = delays.select(F.col("host").alias("_dhost"), "crawl_delay_s")
    if force_broadcast:
        d = F.broadcast(d)

    paged = pages.select(
        link_host(F.col(url_col)).alias("host"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("fetch_ts"),
    ).where(F.col("host").isNotNull())
    joined = paged.join(d, paged.host == d._dhost).drop("_dhost")

    w = Window.partitionBy("host").orderBy("fetch_ts", "url")
    prev = F.lag(F.col("fetch_ts").cast("double")).over(w)
    gap = F.col("fetch_ts").cast("double") - prev
    return (
        joined.withColumn("gap_s", gap)
        .where(F.col("gap_s").isNotNull() & (F.col("gap_s") < F.col("crawl_delay_s")))
        .select("host", "url", "fetch_ts", "gap_s", "crawl_delay_s")
    )


def sitemap_urls(
    sitemaps: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Parse sitemap XML documents → ``(host, url)``, one row per
    distinct ``<loc>`` entry (case-insensitive tag, surrounding
    whitespace stripped; CDATA wrappers and sitemap-index recursion are
    out of scope by contract — an index's ``<loc>`` entries surface as
    urls like any other, so the caller can feed fetched child sitemaps
    back through). Pure Column regex extraction, RE2-portable."""
    locs = F.regexp_extract_all(
        F.col(text_col), F.lit(r"(?i)<loc>\s*([^<\s]+)\s*</loc>"), F.lit(1)
    )
    return (
        sitemaps.select(
            F.col(host_col).alias("host"), F.explode(locs).alias("url")
        )
        .distinct()
    )


def sitemap_coverage(
    pages: DataFrame,
    sitemaps: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Per-host sitemap coverage audit → ``(host, n_listed, n_crawled,
    n_missing)``: of the urls a host PUBLISHES in its sitemap, how many
    the corpus actually contains — the inverse of ``frontier_hosts``
    (which finds what the crawl references but lacks; this finds what
    the host advertises but the crawl lacks). ``n_missing > 0`` is a
    crawl gap or a stale sitemap; either is a finding for the
    completeness story the reference's line-count checks tell at file
    grain.

    Plan: the listed set is sitemap-grain (≪ corpus); membership is one
    url-grain equi-join against the corpus' DISTINCT url projection (the
    only page-sized work — a single narrow column through one Exchange,
    AQE-skew-safe), then one host-grain agg of the ≤ |listed| joined
    rows."""
    listed = sitemap_urls(sitemaps, host_col=host_col, text_col=text_col)
    corpus = pages.select(F.col(url_col).alias("url")).where(
        F.col("url").isNotNull()
    ).distinct().withColumn("_crawled", F.lit(1))
    return (
        listed.join(corpus, "url", "left")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_listed"),
            F.count("_crawled").alias("n_crawled"),
            (F.count(F.lit(1)) - F.count("_crawled")).alias("n_missing"),
        )
    )


def robots_blocked(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    force_broadcast: bool | None = None,
) -> DataFrame:
    """Pages whose path a ``*``-record ``Disallow`` rule prefix-matches
    → the input page rows + ``(host, path)``. Wildcard rules are
    excluded by contract (see module doc); pass them to a custom
    matcher if the corpus needs them.

    The join is equi on host with the prefix predicate evaluated inside
    the join — the rule side is broadcast when it fits (guarded by
    ``MAX_BROADCAST_RULES``; ``force_broadcast`` overrides either way)."""
    from ..functions.extraction import link_host

    exact = rules.where(~F.col("has_wildcard")).select(
        F.col("host").alias("_rhost"), "rule"
    )
    if force_broadcast is None:
        force_broadcast = exact.count() <= MAX_BROADCAST_RULES
    if force_broadcast:
        exact = F.broadcast(exact)

    path = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^#]*)?", 1)
    paged = pages.withColumn("_phost", link_host(F.col(url_col))).withColumn(
        "_path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    hit = paged.join(
        exact,
        (F.col("_phost") == F.col("_rhost"))
        & F.col("_path").startswith(F.col("rule")),
        "left_semi",
    )
    return hit.select(
        *pages.columns,
        F.col("_phost").alias("host"),
        F.col("_path").alias("path"),
    )


def robots_rules_full(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Parse robots.txt documents → ``(host, rule, allow,
    has_wildcard)``: BOTH ``Allow`` and ``Disallow`` paths from records
    whose user-agent set includes ``*`` — the input `robots_verdict`
    needs for RFC 9309 longest-match precedence (`robots_rules` keeps
    its Disallow-only contract for the prefix-census callers). Empty
    values yield no rule either way (an empty Disallow means
    allow-everything; an empty Allow is vacuous). Same deterministic
    pure-relational parse: posexplode + ONE host-grain window pass."""
    lines = _star_record_lines(robots, host_col, text_col)
    return (
        lines.where(
            F.col("field").isin("allow", "disallow") & (F.col("value") != "")
        )
        .select(
            "host",
            F.col("value").alias("rule"),
            (F.col("field") == "allow").alias("allow"),
            F.col("value").rlike(r"[*$]").alias("has_wildcard"),
        )
        .distinct()
    )


def robots_blocked_rfc(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    force_broadcast: bool | None = None,
) -> DataFrame:
    """Pages BLOCKED under RFC 9309 group-member precedence: among all
    ``*``-record rules whose path prefix-matches the page, the LONGEST
    rule wins, ``Allow`` beating ``Disallow`` on equal length; no match
    (or an Allow winner) means the page is fine. This is the
    precedence-aware sibling of `robots_blocked` (which censuses raw
    Disallow prefix hits): ``Disallow: /private`` + ``Allow:
    /private/pub`` blocks ``/private/a`` but not ``/private/pub/x``.

    Output: the input page rows + ``(host, path, rule)`` (the winning
    Disallow). Wildcard rules are excluded by the module contract.

    Scale design: rules aggregate to ONE array per host (host-grain
    shuffle over the tiny rule table), broadcast under the
    ``MAX_BROADCAST_RULES`` guard; the page side is a single broadcast
    equi-join on host with the match-filter + argmax evaluated as
    higher-order Column functions inside codegen — no page-grain
    shuffle, no per-rule row explosion (a page matching k rules never
    materializes k rows).
    """
    from ..functions.extraction import link_host

    exact = rules.where(~F.col("has_wildcard")).select(
        F.col("host").alias("_rhost"), "rule", "allow"
    )
    if force_broadcast is None:
        force_broadcast = exact.count() <= MAX_BROADCAST_RULES
    per_host = exact.groupBy("_rhost").agg(
        F.collect_list(F.struct("rule", "allow")).alias("_rules")
    )
    if force_broadcast:
        per_host = F.broadcast(per_host)

    path = F.regexp_extract(
        F.col(url_col), r"^[a-z][a-z0-9+.-]*://[^/?#]+(/[^#]*)?", 1
    )
    paged = pages.withColumn("_phost", link_host(F.col(url_col))).withColumn(
        "_path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    matches = F.filter(
        F.col("_rules"), lambda r: F.col("_path").startswith(r["rule"])
    )
    # argmax by (length, allow, rule): longest rule wins, Allow beats
    # Disallow on equal length, rule text breaks full ties
    # deterministically
    winner = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r["rule"]).alias("l"),
                r["allow"].cast("int").alias("a"),
                r["rule"].alias("rule"),
            ),
        )
    )
    return (
        paged.join(per_host, F.col("_phost") == F.col("_rhost"))
        .withColumn("_w", winner)
        .where(F.col("_w").isNotNull() & (F.col("_w.a") == 0))
        .select(
            *pages.columns,
            F.col("_phost").alias("host"),
            F.col("_path").alias("path"),
            F.col("_w.rule").alias("rule"),
        )
    )
