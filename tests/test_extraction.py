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
