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


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(1, 2)),
        min_size=4,
        max_size=40,
    )
)
def test_categorical_psi_nonnegative_and_zero_on_identical(spark_free_counts):
    """PSI computed the operator's way is ~0 when a window IS the pool, and
    the smoothed terms are always finite. Pure-python replication of the
    column arithmetic (same formulas as operators.drift.categorical_drift)."""
    import math

    counts = {}
    for cat, n in spark_free_counts:
        counts[cat] = counts.get(cat, 0) + n
    cats = sorted(counts)
    total = sum(counts.values())
    n_cats = len(cats)
    # window == pool
    psi = 0.0
    for c in cats:
        p_w = (counts[c] + 0.5) / (total + 0.5 * n_cats)
        p_p = (counts[c] + 0.5) / (total + 0.5 * n_cats)
        psi += (p_w - p_p) * math.log(p_w / p_p)
    assert abs(psi) < 1e-12
    # any window vs pool: every term finite, sum >= 0 (each term is
    # (x-y)*log(x/y) with x,y>0 — nonnegative pointwise)
    for w_counts in ({cats[0]: total}, {c: 1 for c in cats}):
        psi = 0.0
        wn = sum(w_counts.values())
        for c in cats:
            p_w = (w_counts.get(c, 0) + 0.5) / (wn + 0.5 * n_cats)
            p_p = (counts[c] + 0.5) / (total + 0.5 * n_cats)
            term = (p_w - p_p) * math.log(p_w / p_p)
            assert math.isfinite(term) and term >= -1e-15
            psi += term
        assert psi >= -1e-12


url_parts = st.tuples(
    st.sampled_from(["http", "https"]),
    st.from_regex(r"[a-zA-Z0-9]([a-zA-Z0-9-]{0,10}[a-zA-Z0-9])?\.(com|org|de)", fullmatch=True),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.sampled_from(["", "/", "/a/b", "/p%20q"]),
    st.sampled_from(["", "?b=2&a=1", "?a=&a=1", "?x=%2F"]),
    st.sampled_from(["", "#frag"]),
)


@settings(max_examples=200, deadline=None)
@given(url_parts)
def test_canonicalize_idempotent_and_fragment_free(parts):
    from gbif_data_validator_spark.functions.url import _canonicalize

    scheme, host, port, path, query, frag = parts
    url = f"{scheme}://{host}{port}{path}{query}{frag}"
    c = _canonicalize(url)
    assert _canonicalize(c) == c          # idempotent
    assert "#" not in c                   # fragments stripped
    assert c.startswith(f"{scheme}://")   # scheme preserved
    # default ports stripped, non-default kept
    if (scheme, port) in (("http", ":80"), ("https", ":443")) or port == "":
        assert ":" not in c.split("//")[1].split("/")[0]
    else:
        assert port in c


# --------------------------------------------------------------------------
# Perceptual media hashes (session 13): total, deterministic, crash-free
# --------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_dhash_total_deterministic_in_range(b):
    """Arbitrary bytes — including prefixes that SNIFF as PPM/BMP/GIF/PNG
    but are corrupt — never raise; result is None or a signed-64 int,
    and repeated calls agree."""
    from gbif_data_validator_spark.operators.multimodal import _dhash_from_bytes

    a = _dhash_from_bytes(b)
    assert a == _dhash_from_bytes(b)
    if a is not None:
        assert -(1 << 63) <= a < (1 << 63)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_audio_hash_total_deterministic_in_range(b):
    from gbif_data_validator_spark.operators.multimodal import (
        _audio_hash_from_bytes,
    )

    a = _audio_hash_from_bytes(b)
    assert a == _audio_hash_from_bytes(b)
    if a is not None:
        assert -(1 << 63) <= a < (1 << 63)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_dhash_ppm_reencode_invariant(h, w, seed):
    """decode→re-encode of a real PPM is byte-exact, so the dHash must be
    identical — the re-encoded-copy dedup property the operator claims."""
    import numpy as np

    from gbif_data_validator_spark.operators.multimodal import (
        _decode_ppm,
        _dhash_from_bytes,
        encode_ppm,
    )

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    ppm = encode_ppm(img)
    again = encode_ppm(_decode_ppm(ppm))
    assert ppm == again
    assert _dhash_from_bytes(ppm) == _dhash_from_bytes(again)


# -- round-4 parser fuzz: error-tier containment -----------------------------
# A poisoned 100 TB corpus must never fail a task with anything other than
# the declared finding-grade errors: decode_image raises ONLY
# ValueError/NotImplementedError on arbitrary bytes (media_meta_checks maps
# both to findings), and the DwC-A/EML parsers raise ONLY their declared
# types on arbitrary XML-ish input.


@given(st.binary(min_size=0, max_size=400))
@settings(max_examples=300, deadline=None)
def test_decode_image_error_tier_on_arbitrary_bytes(payload):
    from gbif_data_validator_spark.operators.multimodal import decode_image

    try:
        img = decode_image(payload, fake=True)
        assert img.ndim == 3 and img.shape[2] == 3
    except (ValueError, NotImplementedError):
        pass  # the declared finding tiers — anything else fails the test


@given(st.binary(min_size=12, max_size=300))
@settings(max_examples=300, deadline=None)
def test_decode_webp_error_tier_on_riff_prefixed_bytes(body):
    """Force the sniffer into the VP8L decoder: RIFF/WEBP magic + random
    bytes must yield only the declared error tiers, never an IndexError/
    KeyError/struct error from deep inside the bit reader."""
    from gbif_data_validator_spark.operators.multimodal import decode_image

    payload = b"RIFF" + len(body).to_bytes(4, "little") + b"WEBP" + body
    try:
        decode_image(payload)
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_meta_xml_parser_error_tier(data):
    from gbif_data_validator_spark.sources.dwca import DwcaError, parse_meta_xml

    try:
        parse_meta_xml(data)
    except DwcaError:
        pass  # the single declared error type


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=200, deadline=None)
def test_eml_validator_never_raises(data):
    from gbif_data_validator_spark.plans.metadata import (
        eml_to_meta,
        validate_eml_document,
    )

    out = validate_eml_document(data)
    assert isinstance(out, list)
    assert isinstance(eml_to_meta(data), dict)


@given(
    st.sampled_from([b"P6", b"BM", b"GIF89a", b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff"]),
    st.binary(min_size=4, max_size=300),
)
@settings(max_examples=400, deadline=None)
def test_decode_image_error_tier_behind_every_magic(magic, body):
    """Same containment with the sniffer forced into EACH real decoder."""
    from gbif_data_validator_spark.operators.multimodal import decode_image

    try:
        img = decode_image(magic + body)
        assert img.ndim == 3 and img.shape[2] == 3
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(min_size=4, max_size=200))
@settings(max_examples=200, deadline=None)
def test_decode_audio_error_tier_behind_wav_magic(body):
    from gbif_data_validator_spark.operators.multimodal import decode_audio

    try:
        decode_audio(b"RIFF" + body[:4] + b"WAVE" + body)
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(min_size=0, max_size=300),
       st.sampled_from([0xC0, 0xC2, 0xC4, 0xDA]))
@settings(max_examples=300, deadline=None)
def test_decode_jpeg_error_tier_on_soi_prefixed_bytes(body, marker):
    """Round-5 progressive paths included: SOI + a frame/table/scan marker
    + arbitrary bytes must yield only the declared error tiers — never an
    IndexError/KeyError from the multi-scan machinery."""
    from gbif_data_validator_spark.operators.multimodal import decode_image

    payload = b"\xff\xd8" + bytes([0xFF, marker]) + body
    try:
        decode_image(payload)
    except (ValueError, NotImplementedError):
        pass


@given(st.binary(min_size=0, max_size=200),
       st.sampled_from(["tiff", "ico", "webp"]))
@settings(max_examples=300, deadline=None)
def test_header_dims_total_on_arbitrary_bytes(body, kind):
    """header_dims is total: arbitrary bytes → None or a positive int
    pair, never an exception (it gates a finding, not a decode)."""
    from gbif_data_validator_spark.operators.multimodal import header_dims

    d = header_dims(body, kind)
    assert d is None or (len(d) == 2
                         and all(isinstance(v, int) and v >= 0 for v in d))
