"""Property-based tests (hypothesis) over the pure-Python kernels that the
Arrow-batched UDFs wrap. The reference has no property tests (SURVEY.md §5);
these harden the from-scratch kernels where unit fixtures can't enumerate
the input space. All Spark-free — each example is a plain function call."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gbif_data_validator_spark.functions.extraction import extract_text
from gbif_data_validator_spark.operators.dedup import (
    _minhash_series,
    _simhash_series,
)
from gbif_data_validator_spark.operators.drift import ks_statistic

words = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1,
    max_size=8,
)
docs = st.lists(words, min_size=0, max_size=60).map(" ".join)
quantiles = st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=41, max_size=41
).map(sorted)


@settings(max_examples=200, deadline=None)
@given(quantiles)
def test_ks_identity_is_zero(q):
    assert ks_statistic(q, q) == 0.0


@settings(max_examples=200, deadline=None)
@given(quantiles, quantiles)
def test_ks_bounded_and_symmetric(qa, qb):
    d = ks_statistic(qa, qb)
    assert 0.0 <= d <= 1.0
    assert math.isclose(d, ks_statistic(qb, qa), abs_tol=1e-12)


@settings(max_examples=100, deadline=None)
@given(docs)
def test_minhash_deterministic_and_permutation_invariant(text):
    """Same shingle multiset (order/duplication of shingles irrelevant) →
    same signature; repeated calls identical."""
    s1 = _minhash_series(pd.Series([text]), k=3, n_hashes=16, seed=42)[0]
    s2 = _minhash_series(pd.Series([text]), k=3, n_hashes=16, seed=42)[0]
    assert s1 == s2
    if s1 is not None:
        assert len(s1) == 16
        # doubling the doc adds no new 3-shingles beyond the seam → signature
        # values can only stay equal or decrease (min over a superset)
        s3 = _minhash_series(pd.Series([text + " " + text]), 3, 16, 42)[0]
        assert all(b <= a for a, b in zip(s1, s3))


@settings(max_examples=100, deadline=None)
@given(docs)
def test_simhash_stable_under_token_shuffle(text):
    """SimHash is a bag-of-words signature: token order must not matter."""
    toks = text.split()
    s1 = _simhash_series(pd.Series([text]))[0]
    s2 = _simhash_series(pd.Series([" ".join(reversed(toks))]))[0]
    assert s1 == s2


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=2000))
def test_extract_text_total_and_deterministic(payload):
    """The extractor is a total function of bytes: never raises, always
    returns a str (or None for None), and is bit-stable across calls —
    the byte-identity invariant of input_hint depends on this."""
    a = extract_text(payload)
    b = extract_text(payload)
    assert a == b
    assert a is None or isinstance(a, str)


@settings(max_examples=100, deadline=None)
@given(docs)
def test_extract_roundtrip_plain_text(text):
    """Plain text wrapped in a minimal page comes back whitespace-normalized
    identically to extracting the bare text."""
    bare = extract_text(text.encode("utf-8"))
    wrapped = extract_text(f"<html><body>{text}</body></html>".encode("utf-8"))
    assert bare == wrapped
