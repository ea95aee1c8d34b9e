"""robots.txt parse + compliance-audit tests (operators/robots.py).

Covers the RFC 9309 interoperable-core grammar the module documents:
multi-UA records, case-insensitive field names, CR/comment stripping,
empty Disallow, wildcard surfacing, and prefix-match semantics."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.robots import (
    robots_blocked,
    robots_rules,
)


def _robots(spark, rows):
    return spark.createDataFrame(rows, "host string, text string")


def test_rules_star_record_and_comments(spark):
    txt = (
        "# greeting\n"
        "User-agent: *\r\n"
        "Disallow: /private/\n"
        "Disallow:\n"          # empty -> allow-all, no rule
        "\n"
        "User-agent: bot\n"
        "Disallow: /botonly/\n"
    )
    got = robots_rules(_robots(spark, [("h", txt)])).collect()
    assert [(r.host, r.rule, r.has_wildcard) for r in got] == [
        ("h", "/private/", False)
    ]


def test_rules_multi_ua_run_applies_to_star(spark):
    txt = "User-agent: bot\nUser-agent: *\nDisallow: /secret\n"
    got = robots_rules(_robots(spark, [("h", txt)])).collect()
    assert [(r.rule,) for r in got] == [("/secret",)]


def test_rules_no_star_record_yields_nothing(spark):
    txt = "User-agent: bot\nDisallow: /x\n"
    assert robots_rules(_robots(spark, [("h", txt)])).count() == 0


def test_rules_case_insensitive_field_and_wildcard_flag(spark):
    txt = "user-AGENT:   *\nDISALLOW: /wild*card\ndisallow: /plain\n"
    got = {r.rule: r.has_wildcard for r in
           robots_rules(_robots(spark, [("h", txt)])).collect()}
    assert got == {"/wild*card": True, "/plain": False}


def test_blocked_prefix_match_and_wildcard_exclusion(spark):
    rules = robots_rules(_robots(spark, [
        ("a.com", "User-agent: *\nDisallow: /sec\nDisallow: /w*d\n"),
    ]))
    pages = spark.createDataFrame(
        [
            ("https://a.com/sec-page",),    # prefix match (RFC semantics)
            ("https://a.com/Sec/x",),       # case-sensitive: not blocked
            ("https://a.com/wXd/z",),       # wildcard rule excluded
            ("https://b.com/sec",),         # other host
            ("https://a.com/ok",),
        ],
        "url string",
    )
    got = sorted(r.url for r in robots_blocked(pages, rules).collect())
    assert got == ["https://a.com/sec-page"]


def test_blocked_root_path_defaults_to_slash(spark):
    rules = robots_rules(_robots(spark, [("a.com", "User-agent: *\nDisallow: /\n")]))
    pages = spark.createDataFrame(
        [("https://a.com",), ("https://a.com/x",)], "url string"
    )
    got = robots_blocked(pages, rules).collect()
    assert sorted(r.path for r in got) == ["/", "/x"]
    assert all(r.host == "a.com" for r in got)


def test_blocked_shuffle_fallback_same_result(spark):
    rules = robots_rules(_robots(spark, [("a.com", "User-agent: *\nDisallow: /p\n")]))
    pages = spark.createDataFrame([("https://a.com/p1",)], "url string")
    bc = robots_blocked(pages, rules, force_broadcast=True).collect()
    sh = robots_blocked(pages, rules, force_broadcast=False).collect()
    assert bc == sh and len(bc) == 1


def test_crawl_delay_star_records_max_and_junk(spark):
    from gbif_data_validator_spark.operators.robots import robots_crawl_delay

    rows = [
        ("h0", "User-agent: *\nCrawl-delay: 10\nDisallow: /x\n"),
        ("h1", "User-agent: *\nCrawl-delay: 2.5\nCrawl-delay: oops\n"),
        ("h2", "User-agent: bot\nCrawl-delay: 9\n"),       # non-star
        ("h3", "User-agent: *\nDisallow: /y\n"),           # no delay
        # zbot's record must not leak into *'s delay
        ("h4", "User-agent: *\nCrawl-delay: 1\nUser-agent: zbot\nCrawl-delay: 99\n"),
        # two star records -> max wins
        ("h5", "User-agent: *\nCrawl-delay: 3\n\nUser-agent: *\nCrawl-delay: 7\n"),
    ]
    got = {r.host: r.crawl_delay_s
           for r in robots_crawl_delay(_robots(spark, rows)).collect()}
    assert got == {"h0": 10.0, "h1": 2.5, "h4": 1.0, "h5": 7.0}


def test_crawl_delay_violations_window_and_join(spark):
    import datetime as dt

    from gbif_data_validator_spark.operators.robots import (
        crawl_delay_violations,
        robots_crawl_delay,
    )

    delays = robots_crawl_delay(
        _robots(spark, [("a.com", "User-agent: *\nCrawl-delay: 5\n")])
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    pages = spark.createDataFrame(
        [
            ("https://a.com/1", t0),
            ("https://a.com/2", t0 + dt.timedelta(seconds=3)),   # gap 3 < 5
            ("https://a.com/3", t0 + dt.timedelta(seconds=60)),  # gap 57 ok
            ("https://b.com/1", t0),                             # no delay
            ("https://b.com/2", t0 + dt.timedelta(seconds=1)),
        ],
        "url string, warc_ts timestamp",
    )
    got = crawl_delay_violations(pages, delays).collect()
    assert [(r.url, r.gap_s, r.crawl_delay_s) for r in got] == [
        ("https://a.com/2", 3.0, 5.0)
    ]


def test_blocked_plan_broadcasts_rules(spark):
    rules = robots_rules(_robots(spark, [("a.com", "User-agent: *\nDisallow: /p\n")]))
    pages = spark.createDataFrame([("https://a.com/p1",)], "url string")
    plan = (
        robots_blocked(pages, rules, force_broadcast=True)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_sitemap_urls_extraction_variants(spark):
    from gbif_data_validator_spark.operators.robots import sitemap_urls

    sm = spark.createDataFrame(
        [("h",
          "<urlset><loc>https://h/a</loc>"
          "<LOC>  https://h/b\n</LOC>"
          "<loc>https://h/a</loc>"       # dup collapses
          "<notloc>https://h/x</notloc></urlset>")],
        "host string, text string",
    )
    got = sorted(r.url for r in sitemap_urls(sm).collect())
    assert got == ["https://h/a", "https://h/b"]


def test_sitemap_coverage_census(spark):
    from gbif_data_validator_spark.operators.robots import sitemap_coverage

    sm = spark.createDataFrame(
        [("a.com", "<loc>https://a.com/1</loc><loc>https://a.com/2</loc>"
                   "<loc>https://a.com/404</loc>"),
         ("empty.com", "<x/>")],
        "host string, text string",
    )
    pages = spark.createDataFrame(
        [("https://a.com/1",), ("https://a.com/2",), ("https://a.com/extra",)],
        "url string",
    )
    rows = sitemap_coverage(pages, sm).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.host, r.n_listed, r.n_crawled, r.n_missing) == ("a.com", 3, 2, 1)


def test_rfc_precedence_longest_match_and_allow_tie(spark):
    """RFC 9309 group-member precedence: longest rule wins; Allow beats
    Disallow at equal length; no-match and Allow-winner pages pass."""
    from gbif_data_validator_spark.operators.robots import (
        robots_blocked_rfc,
        robots_rules_full,
    )

    robots = spark.createDataFrame(
        [
            (
                "h.example.org",
                "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
                "Disallow: /private/pub/sec\n",
            ),
            ("t.example.org", "User-agent: *\nDisallow: /a\nAllow: /a\n"),
        ],
        "host string, text string",
    )
    rules = robots_rules_full(robots)
    assert {
        (r.host, r.rule, r.allow) for r in rules.collect()
    } == {
        ("h.example.org", "/private/", False),
        ("h.example.org", "/private/pub/", True),
        ("h.example.org", "/private/pub/sec", False),
        ("t.example.org", "/a", False),
        ("t.example.org", "/a", True),
    }
    pages = spark.createDataFrame(
        [
            (0, "https://h.example.org/private/x"),        # blocked
            (1, "https://h.example.org/private/pub/x"),    # allow wins (longer)
            (2, "https://h.example.org/private/pub/secret"),  # deepest disallow
            (3, "https://h.example.org/ok"),               # no match
            (4, "https://t.example.org/a/z"),              # tie -> allow
            (5, "https://u.example.org/private/x"),        # host without rules
        ],
        "id long, url string",
    )
    out = robots_blocked_rfc(pages, rules).orderBy("id").collect()
    assert [(r.id, r.rule) for r in out] == [
        (0, "/private/"),
        (2, "/private/pub/sec"),
    ]


def test_rfc_no_row_explosion_and_no_python(spark):
    """A page matching k rules yields at most one output row; the whole
    match/argmax runs as Column algebra (no Python eval)."""
    from gbif_data_validator_spark.operators.robots import (
        robots_blocked_rfc,
        robots_rules_full,
    )

    robots = spark.createDataFrame(
        [
            (
                "h.example.org",
                "User-agent: *\nDisallow: /p\nDisallow: /pr\nDisallow: /pri\n",
            )
        ],
        "host string, text string",
    )
    rules = robots_rules_full(robots)
    pages = spark.createDataFrame(
        [(0, "https://h.example.org/private/x")], "id long, url string"
    )
    df = robots_blocked_rfc(pages, rules)
    rows = df.collect()
    assert len(rows) == 1 and rows[0].rule == "/pri"
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
