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


# ------------------------------------------------------------ phrase search


from gbif_data_validator_spark.operators.search import (  # noqa: E402
    build_positional_index,
    kwic_snippets,
    phrase_search,
)

PDOCS = [
    (1, "big table table key table table table end"),  # "table table" x3 (overlapping at 1,2? no: pos 1,2 / 4,5 / 5,6)
    (2, "table key table"),                             # split — no consecutive pair
    (3, "Table TABLE"),                                 # case fold, 1 occurrence
    (4, "merge batch table"),                           # none
    (5, None),
]


def _pindex(spark, tmp_path, docs=PDOCS):
    df = spark.createDataFrame(docs, "doc_id int, text string")
    path = str(tmp_path / "pidx")
    build_positional_index(df, "doc_id", "text", path, n_buckets=8)
    return path


def _brute_phrase(docs, phrase, k):
    terms = [t.lower() for t in phrase]
    out = []
    for doc_id, text in docs:
        if text is None:
            continue
        ws = [w for w in text.strip().lower().split() if w]
        occ = [
            a
            for a in range(0, max(0, len(ws) - len(terms) + 1))
            if ws[a : a + len(terms)] == terms
        ]
        if occ:
            out.append((doc_id, len(occ), occ[0]))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


def test_phrase_search_repeated_term_matches_brute(spark, tmp_path):
    path = _pindex(spark, tmp_path)
    got = [
        (r.doc_id, r.n_occurrences, r.first_pos)
        for r in phrase_search(spark, path, ["table", "table"], k=10).collect()
    ]
    assert got == _brute_phrase(PDOCS, ["table", "table"], 10)
    # doc 1: anchors 1, 4, 5 (overlaps count); doc 2 has NO consecutive pair
    assert got[0] == (1, 3, 1)
    assert 2 not in {d for d, _, _ in got}
    assert (3, 1, 0) in got


def test_phrase_search_distinct_terms_and_order(spark, tmp_path):
    path = _pindex(spark, tmp_path)
    got = [
        tuple(r)
        for r in phrase_search(spark, path, ["BIG", "Table"], k=10).collect()
    ]
    assert got == [(1, 1, 0)]
    # reversed phrase does not match
    assert phrase_search(spark, path, ["table", "big"], k=10).count() == 0


def test_phrase_longer_than_doc_is_empty(spark, tmp_path):
    path = _pindex(spark, tmp_path, docs=[(1, "a b")])
    assert phrase_search(spark, path, ["a", "b", "c"], k=5).count() == 0


def test_phrase_empty_raises_and_scheme_guard(spark, tmp_path):
    path = _pindex(spark, tmp_path)
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_search(spark, path, [])
    # a term-index path is NOT a positional index: scheme guard fires
    tpath = _index(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown index scheme"):
        phrase_search(spark, tpath, ["x"])


def test_positional_scan_prunes_to_phrase_terms(spark, tmp_path):
    path = _pindex(spark, tmp_path)
    plan = (
        phrase_search(spark, path, ["big", "table"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    assert "In(term" in plan or "EqualTo(term" in plan


# -------------------------------------------------------------------- kwic


def test_kwic_first_match_and_window_clamp(spark):
    docs = [
        (1, "merge batch at start"),           # match at pos 1, left clamp
        (2, "x" * 40 + " MERGE BATCH tail"),   # case-insensitive, mid-string
        (3, "no needle here"),
        (4, None),
        (5, "a merge batch b merge batch c"),  # first occurrence only
    ]
    spark_df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.match_pos, r.snippet)
        for r in kwic_snippets(spark_df, "doc_id", "text", "Merge Batch", radius=5).collect()
    }
    assert set(got) == {1, 2, 5}
    assert got[1] == (1, "merge batch at start"[: 5 + 11 + 5])
    p2 = got[2][0]
    assert p2 == 42 and got[2][1] == ("x" * 40 + " MERGE BATCH tail")[p2 - 1 - 5 : p2 - 1 - 5 + 21]
    assert got[5][0] == 3  # 1-based first match


def test_kwic_empty_needle_raises(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="empty needle"):
        kwic_snippets(df, "doc_id", "text", "")


def test_kwic_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a merge b")], "doc_id int, text string")
    plan = (
        kwic_snippets(df, "doc_id", "text", "merge")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


# --------------------------------------------------------------------------
# BM25
# --------------------------------------------------------------------------


def test_bm25_matches_pure_python_replay(spark):
    """Hand corpus vs a pure-Python replay with the operator's exact
    float-op order (each IEEE op is correctly rounded, so same order +
    same inputs == same bits == same micro floor)."""
    from gbif_data_validator_spark.operators.search import bm25_topk

    docs = [(1, "cat cat dog"), (2, "cat mouse"), (3, "bird bird bird bird"), (4, None)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_matched, r.score_micro)
        for r in bm25_topk(df, ["cat", "bird"], k=10).collect()
    }

    corpus = {1: "cat cat dog".split(), 2: "cat mouse".split(),
              3: "bird bird bird bird".split()}
    n, total = len(corpus), sum(len(w) for w in corpus.values())
    avgdl = float(total) / float(n)
    q = sorted({"cat", "bird"})
    dfreq = {t: sum(1 for ws in corpus.values() if t in ws) for t in q}
    exp = {}
    for d, ws in corpus.items():
        dl, score, m = float(len(ws)), 0.0, 0
        for t in q:
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            tf = float(ws.count(t))
            score = score + idf * (tf * 2.2) / (
                tf + 1.2 * (0.25 + 0.75 * dl / avgdl)
            )
            m += t in ws
        if m:
            exp[d] = (m, math.floor(1e6 * score))
    assert got == exp
    # saturation sanity: doc3 (tf=4 of a rarer term) must outrank doc2 (tf=1)
    assert got[3][1] > got[2][1]


def test_bm25_page_is_deterministic_and_k_bounded(spark):
    from gbif_data_validator_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(i, "x y") for i in range(10)], "doc_id int, text string"
    )
    # identical docs → identical scores → page ordered by doc_id
    got = [r.doc_id for r in bm25_topk(df, ["x"], k=4).collect()]
    assert got == [0, 1, 2, 3]


def test_bm25_empty_query_and_empty_corpus_raise(spark):
    from gbif_data_validator_spark.operators.search import bm25_topk

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError, match="empty query"):
        bm25_topk(df, [])
    empty = spark.createDataFrame([(1, None)], "doc_id int, text string")
    with pytest.raises(ValueError, match="no tokenized documents"):
        bm25_topk(empty, ["a"])


def test_bm25_scoring_plan_is_post_shuffle_free(spark):
    """The one corpus-sized shuffle (the doc-grain tf/dl groupBy) runs
    inside the stats job against the localCheckpoint; the RETURNED plan is
    checkpoint-scan → column algebra → TakeOrdered — no Exchange, no Join."""
    from gbif_data_validator_spark.operators.search import bm25_topk

    df = spark.createDataFrame(
        [(i, "a b c") for i in range(20)], "doc_id int, text string"
    )
    plan = (
        bm25_topk(df, ["a", "b"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
