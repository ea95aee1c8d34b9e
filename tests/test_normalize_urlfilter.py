"""Round-3 curation extras: URL blocklist gate, in-doc line dedup, NFC
normalization. Bit-exact value checks live in the url_filter /
doc_line_dedup / nfc_report driver oracles; these pin semantics."""

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.functions.normalize import nfc, nfkc, normalization_report
from gbif_data_validator_spark.operators.curation import (
    dedup_lines_in_doc,
    url_blocklist_flags,
)


def test_url_blocklist_subdomain_semantics(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://bad.example.org/x"),          # exact match
            (2, "https://cdn.bad.example.org/y"),      # subdomain of blocked
            (3, "https://notbad.example.org/z"),       # suffix but not a label match
            (4, "https://good.example.net/adult/p"),   # path-flagged only
            (5, "https://good.example.net/fine"),      # allowed
        ],
        "doc_id long, url string",
    )
    blocked = spark.createDataFrame([("bad.example.org",)], "domain string")
    got = {
        r.doc_id: (r.domain_blocked, r.path_flagged, r.allowed)
        for r in url_blocklist_flags(docs, blocked, path_patterns=("/adult/",)).collect()
    }
    assert got == {
        1: (True, False, False),
        2: (True, False, False),
        3: (False, False, True),  # 'notbad.example.org' must NOT match
        4: (False, True, False),
        5: (False, False, True),
    }


def test_dedup_lines_keep_first(spark):
    docs = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb\na"), (2, "x"), (3, "s\ns\ns")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup_lines_in_doc(docs).collect()}
    assert got[1].text_dedup == "a\nb\nc" and got[1].n_dropped == 3
    assert got[2].text_dedup == "x" and got[2].n_dropped == 0
    assert got[3].text_dedup == "s" and got[3].n_lines == 3 and got[3].n_dropped == 2


def test_nfc_normalization(spark):
    decomposed = "cafe\u0301"        # e + combining acute
    composed = "caf\u00e9"
    docs = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, None), (4, "ﬁne")],  # ﬁ ligature
        "doc_id long, text string",
    )
    rep = {r.doc_id: r for r in normalization_report(docs).collect()}
    assert set(rep) == {1, 2, 4}  # null text dropped
    assert rep[1].changed is True and rep[1].text_nfc == composed
    assert rep[1].len_before == 5 and rep[1].len_after == 4
    assert rep[2].changed is False and rep[2].text_nfc == composed
    # NFC preserves compatibility chars; NFKC folds the ligature
    assert rep[4].changed is False
    (row,) = docs.where("doc_id = 4").select(nfkc(F.col("text")).alias("k")).collect()
    assert row.k == "fine"


def test_registered_domain_branches(spark):
    from gbif_data_validator_spark.functions.url import registered_domain

    cases = {
        "https://www.news.bbc.co.uk/x": "bbc.co.uk",
        "http://media.bbc.co.uk/y": "bbc.co.uk",
        "https://sub.example.com/": "example.com",
        "https://EXAMPLE.com/U": "example.com",
        "http://shop.example.com:8080/cart": "example.com",
        "http://192.168.10.20/admin": "192.168.10.20",
        "http://intranet/wiki": "intranet",
        # a multi-level suffix MID-host must not trigger the 3-label rule
        "https://www.com.au.evil.org/phish": "evil.org",
        "https://store.com.au/": "store.com.au",
        "not a url at all": None,
    }
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = dict(
        df.select("url", registered_domain(F.col("url")).alias("d")).collect()
    )
    assert got == cases


def test_registered_domain_plan_is_narrow(spark):
    from gbif_data_validator_spark.functions.url import registered_domain

    df = spark.createDataFrame([("https://a.example.com/x",)], "url string")
    plan = (
        df.select(registered_domain(F.col("url")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan \
        and "ArrowEvalPython" not in plan
