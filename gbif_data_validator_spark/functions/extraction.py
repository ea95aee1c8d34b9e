"""Deterministic HTML → text extraction.

The per-row invariant from BASELINE.json input_hint: extracted text must be
byte-identical per url across runs and across engines. Reference analog: the
interpreters normalize verbatim values into interpreted values
(evaluator/record/OccurrenceInterpretationEvaluator.java:118-138); here the
"interpretation" is extracting visible text from the stored html bytes.

``extract_text`` is a pure, version-pinned, locale-independent Python
function (no external parser libraries — determinism over completeness).
It is applied distributedly through an Arrow-batched pandas UDF
(``extract_text_udf``), never per-row Python in a Spark ``udf``.

Rules (fixed contract — goldens are committed under tests/goldens/):
  1. bytes are decoded UTF-8 with errors="replace"
  2. <script>/<style>/<!-- --> content dropped entirely
  3. every other tag is replaced by a single space
  4. the five standard entities + &#NNN; / &#xHH; are decoded
  5. whitespace runs collapse to one space; result is stripped
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_DROP_RE = re.compile(
    r"<script\b[^>]*>.*?</script\s*>|<style\b[^>]*>.*?</style\s*>|<!--.*?-->",
    re.DOTALL | re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENTITY_RE = re.compile(r"&(amp|lt|gt|quot|apos|#x[0-9a-fA-F]+|#[0-9]+);")

_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def _decode_entity(m: re.Match) -> str:
    body = m.group(1)
    if body in _NAMED:
        return _NAMED[body]
    try:
        if body.startswith("#x") or body.startswith("#X"):
            cp = int(body[2:], 16)
        else:
            cp = int(body[1:])
        if 0 < cp <= 0x10FFFF and not (0xD800 <= cp <= 0xDFFF):
            return chr(cp)
    except ValueError:
        pass
    return m.group(0)


def extract_text(html: bytes | None) -> str | None:
    """Pure deterministic extraction; see module docstring for the contract."""
    if html is None:
        return None
    s = html.decode("utf-8", errors="replace")
    s = _DROP_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    if "&" in s:  # entity pass only when an entity can exist
        s = _ENTITY_RE.sub(_decode_entity, s)
    # whitespace-collapse + strip. str.split() and regex \s use the same
    # whitespace predicate (Py_UNICODE_ISSPACE), so this is byte-identical
    # to `_WS_RE.sub(" ", s).strip()` at ~10x the speed — the \s+ sub was
    # 90% of per-doc extraction cost (one match object per word gap).
    return " ".join(s.split())


def _extract_series(html: pd.Series) -> pd.Series:
    # Series.map over an Arrow batch: one Python call per row *within* a
    # vectorized batch transfer — the sanctioned pattern for logic that
    # built-ins can't express (SURVEY.md §2.6 "Text extraction").
    return html.map(extract_text, na_action="ignore")


#: Arrow-batched pandas UDF: html:binary -> extracted text:string.
extract_text_udf = F.pandas_udf(_extract_series, returnType=StringType())


def _extract_md5(html: bytes) -> str:
    import hashlib

    return hashlib.md5(extract_text(html).encode("utf-8")).hexdigest()


def _extract_md5_series(html: pd.Series) -> pd.Series:
    return html.map(_extract_md5, na_action="ignore")


#: html:binary -> lowercase hex md5 of the extracted text's UTF-8 bytes.
#: The byte-identity check compares this against `md5(encode(text,'utf-8'))`
#: computed JVM-side: the UDF then returns 32 chars per row instead of the
#: multi-KB extracted string — ~100x less Arrow return traffic and a
#: constant-width JVM comparison, with identical verdicts (equal digests ⇔
#: equal bytes, modulo md5 collision odds that are negligible for a
#: validation flag). `extract_text_udf` remains the full-text surface.
extract_text_md5_udf = F.pandas_udf(_extract_md5_series, returnType=StringType())


# --------------------------------------------------------------------------
# Link / directive extraction — pure Column regex algebra (JVM-side, zero
# shuffle, zero Python). Patterns are deliberately restricted to constructs
# Java regex and RE2 (DuckDB) interpret identically, so census operators
# built on these hash-check against a SQL oracle replay.
# --------------------------------------------------------------------------

#: href values of anchor tags, double- or single-quoted. `(?i)` + negated
#: char classes only — no backrefs/lookaround, portable to RE2.
_HREF_PATTERN = r"""(?i)<a\s[^>]*href=["']([^"']+)["']"""

#: host part of an absolute http(s) URL (scheme-insensitive).
_HOST_PATTERN = r"(?i)^https?://([^/?#]+)"

#: <meta name="robots" content="..."> with the two attributes in either
#: order (two alternatives — attribute order is free in HTML).
_ROBOTS_NAME_FIRST = (
    r"""(?i)<meta\s[^>]*name=["']robots["'][^>]*content=["']([^"']*)["']"""
)
_ROBOTS_CONTENT_FIRST = (
    r"""(?i)<meta\s[^>]*content=["']([^"']*)["'][^>]*name=["']robots["']"""
)


def outlinks(html: F.Column) -> F.Column:
    """``html:string`` → ``array<string>`` of anchor hrefs, document order.

    Reference analog: the crawler-facing side of the indexability verdict
    (ValidationResultElement "indexable"); here the raw material for the
    host link graph (``operators/graph.py:outlink_census``)."""
    return F.regexp_extract_all(html, F.lit(_HREF_PATTERN), F.lit(1))


def link_host(href: F.Column) -> F.Column:
    """Absolute-URL host, or NULL for relative/other schemes. A plain
    regex (not ``functions.url.url_host``) so SQL oracles can replay it
    verbatim with RE2."""
    h = F.regexp_extract(href, _HOST_PATTERN, 1)
    return F.when(h != "", F.lower(h))


_CANON_REL_FIRST = (
    r"""(?i)<link\s[^>]*rel=["']canonical["'][^>]*href=["']([^"']+)["']"""
)
_CANON_HREF_FIRST = (
    r"""(?i)<link\s[^>]*href=["']([^"']+)["'][^>]*rel=["']canonical["']"""
)


def canonical_href(html: F.Column) -> F.Column:
    """``html:string`` → the page's ``<link rel="canonical">`` href
    (either attribute order, any case; rel-first wins when both forms
    match), or NULL when the page declares none. The publisher-declared
    duplicate-cluster key — input to ``operators/curation.py:
    canonical_census``."""
    first = F.regexp_extract(html, _CANON_REL_FIRST, 1)
    pick = F.when(first != "", first).otherwise(
        F.regexp_extract(html, _CANON_HREF_FIRST, 1)
    )
    return F.when(pick != "", pick)


def robots_directives(html: F.Column) -> F.Column:
    """``html:string`` → ``struct<noindex:boolean, nofollow:boolean>``
    from the page's ``<meta name="robots">`` tag (either attribute order,
    any case). Only the *robots* meta counts — ``googlebot``/other named
    crawler directives are out of scope by contract. Pages without the
    tag yield (false, false): absence of a directive means indexable,
    matching the reference's default-pass verdict semantics."""
    content = F.lower(
        F.when(
            F.regexp_extract(html, _ROBOTS_NAME_FIRST, 1) != "",
            F.regexp_extract(html, _ROBOTS_NAME_FIRST, 1),
        ).otherwise(F.regexp_extract(html, _ROBOTS_CONTENT_FIRST, 1))
    )
    return F.struct(
        content.contains("noindex").alias("noindex"),
        content.contains("nofollow").alias("nofollow"),
    )


#: <title> text (any attributes on the tag, plain-text body only — a title
#: containing markup is malformed and correctly yields no match).
_TITLE_PATTERN = r"(?i)<title[^>]*>([^<]*)</title>"

#: anchor href + plain-text body, both capture groups from ONE pattern so
#: the two regexp_extract_all arrays align index-for-index.
_ANCHOR_PATTERN = r"""(?i)<a\s[^>]*href=["']([^"']+)["'][^>]*>([^<]*)</a>"""


def title_text(html: F.Column) -> F.Column:
    """``html:string`` → the page's ``<title>`` text, inner whitespace
    collapsed to single spaces and trimmed; NULL when absent or empty.
    The publisher-written one-line summary — duplicated titles across
    hosts are the cheapest template/scraped-content signal there is
    (input to ``operators/curation.py:duplicate_title_census``)."""
    t = F.trim(
        F.regexp_replace(
            F.regexp_extract(html, _TITLE_PATTERN, 1), r"\s+", " "
        )
    )
    return F.when(t != "", t)


def anchor_texts(html: F.Column) -> F.Column:
    """``html:string`` → ``array<struct<href:string, text:string>>`` of
    anchors with a plain-text body, document order. Both fields come from
    ONE pattern's two capture groups, so the arrays align by construction;
    anchors wrapping further markup (``<a><img/></a>``) yield no row —
    they carry no anchor TEXT to aggregate."""
    hrefs = F.regexp_extract_all(html, F.lit(_ANCHOR_PATTERN), F.lit(1))
    texts = F.regexp_extract_all(html, F.lit(_ANCHOR_PATTERN), F.lit(2))
    return F.zip_with(
        hrefs,
        texts,
        lambda h, t: F.struct(h.alias("href"), t.alias("text")),
    )
