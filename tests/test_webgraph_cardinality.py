"""Session-5 operators: outlink extraction / host census, meta-robots
directives, relationship-cardinality census, arrival-rate control chart."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gbif_data_validator_spark.functions.extraction import (
    link_host,
    outlinks,
    robots_directives,
)
from gbif_data_validator_spark.operators.graph import outlink_census
from gbif_data_validator_spark.operators.referential import (
    relationship_cardinality,
)
from gbif_data_validator_spark.operators.sequence import rate_anomaly


# ---------------------------------------------------------------- outlinks
def test_outlinks_extraction_rules(spark):
    html = (
        '<html><body><a href="https://A.example.org/x">a</a>'
        "<a href='http://b.example.org/y?q=1'>b</a>"
        '<A HREF="https://C.example.org/z#f">caps</A>'
        '<a class="k" href="/relative/path">rel</a>'
        '<a href="mailto:x@example.org">mail</a>'
        "<p>no link</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    row = df.select(
        outlinks(F.col("html")).alias("hrefs"),
        F.transform(outlinks(F.col("html")), link_host).alias("hosts"),
    ).first()
    assert row.hrefs == [
        "https://A.example.org/x",
        "http://b.example.org/y?q=1",
        "https://C.example.org/z#f",
        "/relative/path",
        "mailto:x@example.org",
    ]
    # host: lowercased, query/fragment stripped; relative + mailto → NULL
    assert row.hosts == [
        "a.example.org",
        "b.example.org",
        "c.example.org",
        None,
        None,
    ]


def test_outlink_census_counts_and_self_link_exclusion(spark):
    rows = [
        ("p1", "h1.org", '<a href="https://h2.org/a">x</a><a href="https://h2.org/b">y</a>'),
        ("p2", "h2.org", '<a href="https://h2.org/self">s</a><a href="https://h3.org/c">z</a>'),
        ("p3", "h3.org", '<a href="/rel">r</a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, own string, html string")
    census = {
        r.host: (r.n_links, r.n_src_pages)
        for r in outlink_census(pages, "html", "url").collect()
    }
    assert census == {"h2.org": (3, 2), "h3.org": (1, 1)}
    # with internal_host, p2's self-link to h2.org drops
    census2 = {
        r.host: (r.n_links, r.n_src_pages)
        for r in outlink_census(
            pages, "html", "url", internal_host=F.col("own")
        ).collect()
    }
    assert census2 == {"h2.org": (2, 1), "h3.org": (1, 1)}


# ------------------------------------------------------- robots directives
def test_robots_directives_matrix(spark):
    cases = [
        ('<meta name="robots" content="noindex">', True, False),
        ('<meta name="ROBOTS" content="NOINDEX, NOFOLLOW">', True, True),
        ('<meta content="nofollow" name="robots">', False, True),
        ('<meta name="googlebot" content="noindex">', False, False),
        ('<meta charset="utf-8">', False, False),
        ("", False, False),
    ]
    df = spark.createDataFrame(
        [(h,) for h, _, _ in cases], "html string"
    ).select(robots_directives(F.col("html")).alias("d"))
    got = [(r.d.noindex, r.d.nofollow) for r in df.collect()]
    assert got == [(ni, nf) for _, ni, nf in cases]


# ------------------------------------------------ relationship cardinality
def test_relationship_cardinality_classes(spark):
    dim = spark.createDataFrame([(1,), (2,), (3,), (4,)], "k long")
    fact = spark.createDataFrame(
        [(2,), (3,), (3,), (4,), (4,), (4,), (4,), (9,), (9,)], "fk long"
    )
    got = {
        r.card_class: r.n_keys
        for r in relationship_cardinality(dim, fact, "k", "fk").collect()
    }
    # key 1 → 0 matches, key 2 → 1, key 3 → 2 (class 2-3), key 4 → 4 (4+),
    # fk 9 dangles (1 distinct orphan key)
    assert got == {"0": 1, "1": 1, "2-3": 1, "4+": 1, "fact_orphan": 1}


def test_relationship_cardinality_orphan_row_always_present(spark):
    dim = spark.createDataFrame([(1,)], "k long")
    fact = spark.createDataFrame([(1,)], "fk long")
    got = {
        r.card_class: r.n_keys
        for r in relationship_cardinality(dim, fact, "k", "fk").collect()
    }
    assert got["fact_orphan"] == 0  # emitted even when empty


# ------------------------------------------------------------ rate anomaly
def test_rate_anomaly_flags_planted_spike(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for day in range(10):
        n = 1000 if day == 7 else 100  # day 7 is a 10x spike
        for i in range(n):
            rows.append((base + dt.timedelta(days=day, seconds=i),))
    df = spark.createDataFrame(rows, "ts timestamp")
    out = {r.bucket.day: r for r in rate_anomaly(df, "ts", k=3.0).collect()}
    assert len(out) == 10
    assert out[8].is_anomaly  # Jan 8 == day index 7
    assert sum(1 for r in out.values() if r.is_anomaly) == 1
    # stable-series baseline: MAD of the other nine days is 0, so spread 0
    assert out[1].center == 100.0 and not out[1].is_anomaly
