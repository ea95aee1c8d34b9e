"""Persisted inverted term index + conjunctive keyword search
(operators/search.py): brute-force equivalence of the exact rational
TF-IDF scoring, AND semantics, determinism of the result page, pruning
of the postings scan to the query terms, and index-scheme guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.search import (
    build_term_index,
    search_term_index,
)

DOCS = [
    (1, "spark join merge join"),
    (2, "merge sort merge merge"),
    (3, "join the club"),
    (4, "spark streaming watermark"),
    (5, None),
    (6, "JOIN   Merge  \t join"),  # case folding + whitespace runs
    (7, ""),
]


def _index(spark, tmp_path, docs=DOCS):
    df = spark.createDataFrame(docs, "doc_id int, text string")
    path = str(tmp_path / "idx")
    build_term_index(df, "doc_id", "text", path, n_buckets=8)
    return path


def _brute(docs, terms, k):
    """From-scratch rational TF-IDF over the same tokenization."""
    toks = {}
    for doc_id, text in docs:
        if text is None:
            continue
        ws = [w for w in text.strip().lower().split() if w]
        if not ws:
            toks[doc_id] = []
        else:
            toks[doc_id] = ws
    n_docs = len(toks)
    q = sorted(set(t.lower() for t in terms))
    df_ = {t: sum(1 for ws in toks.values() if t in ws) for t in q}
    out = []
    for doc_id, ws in toks.items():
        if not all(t in ws for t in q):
            continue
        score = sum(
            math.floor(1e6 * (ws.count(t) * n_docs) / (len(ws) * df_[t]))
            for t in q
        )
        out.append((doc_id, len(q), score))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out[:k]


def test_conjunctive_search_matches_brute_force(spark, tmp_path):
    path = _index(spark, tmp_path)
    got = [
        (r.doc_id, r.n_matched, r.score_ppm)
        for r in search_term_index(spark, path, ["join", "merge"], k=10).collect()
    ]
    assert got == _brute(DOCS, ["join", "merge"], 10)
    # AND semantics: docs 3 (join only) and 2 (merge only) excluded
    assert {d for d, _, _ in got} == {1, 6}


def test_single_term_and_case_fold(spark, tmp_path):
    path = _index(spark, tmp_path)
    got = [
        (r.doc_id, r.n_matched, r.score_ppm)
        for r in search_term_index(spark, path, ["MERGE"], k=10).collect()
    ]
    assert got == _brute(DOCS, ["merge"], 10)
    assert {d for d, _, _ in got} == {1, 2, 6}


def test_duplicate_query_terms_collapse(spark, tmp_path):
    path = _index(spark, tmp_path)
    a = search_term_index(spark, path, ["join", "JOIN", "join"], k=10).collect()
    b = search_term_index(spark, path, ["join"], k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_no_hit_term_returns_empty(spark, tmp_path):
    path = _index(spark, tmp_path)
    assert search_term_index(spark, path, ["join", "zzz"], k=10).count() == 0


def test_empty_query_raises(spark, tmp_path):
    path = _index(spark, tmp_path)
    with pytest.raises(ValueError, match="empty query"):
        search_term_index(spark, path, [])


def test_scheme_guard(spark, tmp_path):
    path = str(tmp_path / "bad")
    spark.createDataFrame(
        [(1, "other-scheme")], "n_docs long, scheme string"
    ).write.parquet(path + "/stats")
    with pytest.raises(ValueError, match="unknown index scheme"):
        search_term_index(spark, path, ["x"])


def test_postings_scan_prunes_to_query_terms(spark, tmp_path):
    """The query plan must push the term filter into the parquet scan
    (PushedFilters In(term, ...)) so posting lists for non-query terms
    are skipped at the reader — the property that makes query cost
    scale with posting size, not corpus size."""
    path = _index(spark, tmp_path)
    plan = search_term_index(spark, path, ["join"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "In(term" in plan or "EqualTo(term" in plan


def test_index_is_idempotent_write_guard(spark, tmp_path):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    path = str(tmp_path / "idx2")
    build_term_index(df, "doc_id", "text", path, n_buckets=4)
    with pytest.raises(Exception):
        build_term_index(df, "doc_id", "text", path, n_buckets=4)
