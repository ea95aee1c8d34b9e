"""HTML→text extraction: pure-function contract + byte-identity invariant
(BASELINE.json input_hint: "byte-identical extracted text per url")."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.functions.extraction import extract_text, extract_text_udf


def test_extract_basic():
    html = b"<html><body><p>Hello <b>world</b></p></body></html>"
    assert extract_text(html) == "Hello world"


def test_extract_drops_script_style_comments():
    html = (
        b"<head><style>p{color:red}</style></head>"
        b"<body><!-- note --><p>keep</p><script>var x='drop';</script></body>"
    )
    assert extract_text(html) == "keep"


def test_extract_entities():
    assert extract_text(b"a &amp; b &lt;c&gt; &#65; &#x42; &quot;q&quot;") == 'a & b <c> A B "q"'
    # unknown / invalid entities are preserved verbatim
    assert extract_text(b"&nope; &#xD800;") == "&nope; &#xD800;"


def test_extract_whitespace_collapse_and_none():
    assert extract_text(b"  a\n\n<b>\t</b>  b  ") == "a b"
    assert extract_text(None) is None
    assert extract_text(b"") == ""


def test_extract_invalid_utf8_is_deterministic():
    out1 = extract_text(b"<p>ok \xff\xfe</p>")
    out2 = extract_text(b"<p>ok \xff\xfe</p>")
    assert out1 == out2 and "ok" in out1


def test_byte_identity_on_clean_fixture_rows(spark, pages):
    """For every clean fixture row: text == extract_text(html), byte-for-byte,
    computed distributedly through the Arrow-batched UDF."""
    clean = pages.where(F.col("expected_issue").isNull())
    mismatches = clean.where(
        extract_text_udf(F.col("html")) != F.col("text")
    ).count()
    assert mismatches == 0
    # and the injected one-byte mismatch rows DO differ
    bad = pages.where(F.col("expected_issue") == "TEXT_EXTRACTION_MISMATCH")
    assert bad.count() > 0
    still_equal = bad.where(extract_text_udf(F.col("html")) == F.col("text")).count()
    assert still_equal == 0


def test_extraction_goldens():
    """Committed golden fixtures pin the extraction contract byte-for-byte
    (SURVEY.md §5 'byte-identical HTML→text extraction against committed
    fixture outputs') — any change to the rules fails here, not silently."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "goldens", "extraction_goldens.json")
    with open(path) as f:
        cases = json.load(f)
    assert len(cases) >= 15
    for case in cases:
        html = bytes.fromhex(case["html_hex"])
        assert extract_text(html) == case["text"], html[:80]


def test_canonicalize_url():
    from gbif_data_validator_spark.functions.url import _canonicalize

    assert _canonicalize("HTTP://Example.COM:80/a?b=2&a=1#frag") == "http://example.com/a?a=1&b=2"
    assert _canonicalize("https://example.com") == "https://example.com/"
    assert _canonicalize("https://example.com:8443/x") == "https://example.com:8443/x"
    # malformed inputs pass through unchanged (never lose the key)
    for bad in ("not a url", "ftp://x/y", "", None):
        assert _canonicalize(bad) == bad
    # idempotent
    c = _canonicalize("http://A.example/path?z=1&y=2")
    assert _canonicalize(c) == c
    # IPv6 hosts keep their brackets (urlsplit().hostname strips them)
    assert _canonicalize("http://[::1]:8080/x") == "http://[::1]:8080/x"
    assert _canonicalize("http://[2001:DB8::1]/x") == "http://[2001:db8::1]/x"
    assert _canonicalize("https://[::1]:443/x") == "https://[::1]/x"


def test_canonicalize_url_udf_feeds_uniqueness(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.functions.url import canonicalize_url_udf
    from gbif_data_validator_spark.operators.uniqueness import duplicate_keys

    df = spark.createDataFrame(
        [("HTTP://A.example:80/p?b=2&a=1",), ("http://a.example/p?a=1&b=2",),
         ("http://other.example/q",)],
        schema="url string",
    )
    canon = df.select(canonicalize_url_udf(F.col("url")).alias("url"))
    dups = duplicate_keys(canon, "url").collect()
    assert len(dups) == 1 and dups[0].dup_count == 2
