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
