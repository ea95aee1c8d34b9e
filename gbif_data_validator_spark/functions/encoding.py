"""Mojibake detection + repair: pure Column algebra, zero shuffle.

Reference analog: the validator flags non-UTF-8 input once at charset
sniff time (``TEXT_NOT_UTF8``, see operators/record_checks.py:128-140 and
reference evaluator chain in
validator-processor/src/main/java/org/gbif/validation/evaluator/).  That
catches *byte-level* breakage, but the far more common web-corpus defect
is text that decoded *successfully* through the wrong codec upstream:
UTF-8 bytes read as Latin-1 / Windows-1252 ("café" → "cafÃ©",
"don’t" → "donâ€™t").  The result is valid UTF-8 — no replacement chars,
no finding — yet the text is corrupted.  This module adds the census and
the repair as Column expressions:

- ``mojibake_exprs(text)`` — per-row signal battery (counts of the
  classic double-decode digraphs, C1 controls, U+FFFD, NBSP artifacts).
  Every signal is a ``regexp_count`` over literal Unicode patterns, so a
  SQL oracle (DuckDB ``regexp_extract_all``) reproduces it bit-exactly.
- ``fix_mojibake(text)`` — the inverse transform, entirely JVM-side with
  no Python UDF: translate the 27 cp1252-only punctuation codepoints down
  to their C1 byte positions, re-encode as ISO-8859-1 (recovering the
  original UTF-8 byte stream), and decode as UTF-8.  Guarded three ways so
  it can never corrupt clean text: it only fires when (a) a mojibake
  digraph signal is present, (b) every char is Latin-1/cp1252
  representable (a single ``rlike``), and (c) the round-trip output is
  strictly shorter and free of U+FFFD.  Rows failing any guard pass
  through unchanged.

At 100 TB this matters because both census and repair live inside one
WholeStageCodegen projection over the scan — no shuffle, no Python
worker, no second pass.  The census aggregates map-side like any other
count battery.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# cp1252 bridge: the 27 codepoints Windows-1252 places in 0x80-0x9F.
# Index i maps _CP1252_CHARS[i] -> chr(0x80 + offset) so that a subsequent
# encode(ISO-8859-1) emits the original byte.  0x81/0x8D/0x8F/0x90/0x9D are
# undefined in cp1252 and never appear in mojibake text.
# --------------------------------------------------------------------------
_CP1252 = {
    0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8A: "Š", 0x8B: "‹", 0x8C: "Œ",
    0x8E: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9A: "š", 0x9B: "›",
    0x9C: "œ", 0x9E: "ž", 0x9F: "Ÿ",
}
_CP1252_CHARS = "".join(_CP1252.values())
_C1_CHARS = "".join(chr(b) for b in _CP1252)

#: UTF-8 continuation byte read as Latin-1 => a char in U+0080..U+00BF.
#: As cp1252-mojibake the C1 half of that range surfaces as the punctuation
#: above instead, so the continuation class is [80-BF range] ∪ cp1252 set.
_CONT = "\\x{0080}-\\x{00bf}" + "".join(
    "\\x{%04x}" % ord(c) for c in _CP1252_CHARS
)

#: 2-byte UTF-8 lead bytes 0xC2..0xC3 read as Latin-1 (Â Ã) — covers all of
#: Latin-1 Supplement, i.e. every Western-European accented letter.
PAT_LATIN1_DIGRAPH = "[\\x{00c2}\\x{00c3}][" + _CONT + "]"
#: 3-byte UTF-8 lead bytes 0xE0..0xEF read as Latin-1 (à..ï) + 2 continuations
#: — covers General Punctuation (’ “ ” … –), CJK, etc.
PAT_TRIGRAPH = "[\\x{00e0}-\\x{00ef}][" + _CONT + "]{2}"
#: bare C1 controls — never legitimate in web text.
PAT_C1 = "[\\x{0080}-\\x{009f}]"
#: U+FFFD replacement char — upstream decoder already gave up.
PAT_FFFD = "\\x{fffd}"
#: "Â " — 0xC2 0xA0 (UTF-8 NBSP) read as Latin-1; the single most common
#: mojibake artifact on the web.
PAT_NBSP_ARTIFACT = "\\x{00c2}\\x{00a0}"

#: The classic UTF-8 well-formedness grammar (RFC 3629 table), written over
#: chars U+0000..U+00FF (i.e. the byte stream viewed through Latin-1).  A
#: string matching this anchored pattern round-trips encode(ISO-8859-1) →
#: decode(UTF-8) with no error and no U+FFFD — required because Spark 4's
#: decode RAISES on malformed input instead of substituting.
PAT_WELLFORMED_UTF8 = (
    "^(?:[\\x{0000}-\\x{007f}]"
    "|[\\x{00c2}-\\x{00df}][\\x{0080}-\\x{00bf}]"
    "|\\x{00e0}[\\x{00a0}-\\x{00bf}][\\x{0080}-\\x{00bf}]"
    "|[\\x{00e1}-\\x{00ec}][\\x{0080}-\\x{00bf}]{2}"
    "|\\x{00ed}[\\x{0080}-\\x{009f}][\\x{0080}-\\x{00bf}]"
    "|[\\x{00ee}-\\x{00ef}][\\x{0080}-\\x{00bf}]{2}"
    "|\\x{00f0}[\\x{0090}-\\x{00bf}][\\x{0080}-\\x{00bf}]{2}"
    "|[\\x{00f1}-\\x{00f3}][\\x{0080}-\\x{00bf}]{3}"
    "|\\x{00f4}[\\x{0080}-\\x{008f}][\\x{0080}-\\x{00bf}]{3})*$"
)


def mojibake_exprs(text: Column) -> dict[str, Column]:
    """Signal battery → ``{name: int/bool Column}``.  Null text counts 0."""
    t = F.coalesce(text, F.lit(""))
    n_latin1 = F.regexp_count(t, F.lit(PAT_LATIN1_DIGRAPH))
    n_tri = F.regexp_count(t, F.lit(PAT_TRIGRAPH))
    n_c1 = F.regexp_count(t, F.lit(PAT_C1))
    n_fffd = F.regexp_count(t, F.lit(PAT_FFFD))
    n_nbsp = F.regexp_count(t, F.lit(PAT_NBSP_ARTIFACT))
    return {
        "n_latin1_digraphs": n_latin1,
        "n_trigraphs": n_tri,
        "n_c1_controls": n_c1,
        "n_fffd": n_fffd,
        "n_nbsp_artifacts": n_nbsp,
        "has_mojibake": (n_latin1 + n_tri + n_c1 + n_fffd) > 0,
    }


def fix_mojibake(text: Column) -> Column:
    """Repair double-decoded UTF-8 (Latin-1 *and* cp1252 flavours) without
    leaving the JVM: translate cp1252 punctuation to C1, ISO-8859-1 encode
    (recovering the original bytes), UTF-8 decode.  Triple-guarded — rows
    where the transform would not be an exact inverse pass through
    unchanged, so ``fix_mojibake`` is idempotent and safe on clean text."""
    c1_form = F.translate(text, _CP1252_CHARS, _C1_CHARS)
    signal = (
        F.regexp_count(text, F.lit(PAT_LATIN1_DIGRAPH))
        + F.regexp_count(text, F.lit(PAT_TRIGRAPH))
    ) > 0
    # Spark 4 encode/decode RAISE on unmappable chars / malformed bytes
    # (MALFORMED_CHARACTER_CODING) rather than substituting, so the codec
    # must never see a row that won't round-trip: gate the INPUT on full
    # UTF-8 well-formedness of the recovered byte stream, not just the
    # output selection.  PAT_WELLFORMED_UTF8 implies Latin-1 encodability
    # (every class is <= U+00FF) and a clean UTF-8 decode.
    ok = text.isNotNull() & signal & c1_form.rlike(PAT_WELLFORMED_UTF8)
    safe_in = F.when(ok, c1_form).otherwise(F.lit(""))
    candidate = F.decode(F.encode(safe_in, "ISO-8859-1"), "UTF-8")
    # well-formed multi-byte input always shrinks on decode; keep the
    # length check as the final belt so a no-op round-trip passes through.
    return F.when(ok & (F.length(candidate) < F.length(text)), candidate).otherwise(
        text
    )


def mojibake_census(
    df: DataFrame, text_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group mojibake census: affected-row count + per-signal totals +
    how many rows the JVM round-trip repair would fix.  One projection +
    one map-side-combinable aggregate — the scan stays a single pass."""
    sig = mojibake_exprs(F.col(text_col))
    repaired = fix_mojibake(F.col(text_col))
    proj = df.select(
        *(group_cols or []),
        *[c.alias(k) for k, c in sig.items()],
        (repaired != F.coalesce(F.col(text_col), F.lit(""))).alias("_fixed"),
    )
    aggs = [
        F.sum(F.col(k).cast("long")).alias(k)
        for k in (
            "n_latin1_digraphs", "n_trigraphs", "n_c1_controls",
            "n_fffd", "n_nbsp_artifacts",
        )
    ] + [
        F.sum(F.col("has_mojibake").cast("long")).alias("rows_affected"),
        F.sum(F.col("_fixed").cast("long")).alias("rows_repairable"),
        F.count(F.lit(1)).alias("n_rows"),
    ]
    if group_cols:
        return proj.groupBy(*group_cols).agg(*aggs)
    return proj.agg(*aggs)
