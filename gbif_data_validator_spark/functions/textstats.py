"""Text analysis for large-scale training-data pipelines: token counting,
quality scoring, language-ID heuristic, document fingerprinting.

No direct reference analog (the reference validates biodiversity records);
these extend the same per-record interpretation pass (SURVEY.md §2.6) to the
web-text payload. Everything here is JVM-side Column algebra (codegen,
oracle-checkable in SQL) except the winnowing fingerprint, which is an
Arrow-batched pandas UDF.

Scale: all of these are narrow per-row transforms — zero shuffles; they
compose into the single pass-1 scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

# --------------------------------------------------------------------------
# Token counting
# --------------------------------------------------------------------------

#: BPE-ish pre-tokenizer: alnum runs or single non-space symbols (the classic
#: GPT-2-style split, ASCII-simplified so Spark and DuckDB regex agree).
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(text: Column) -> Column:
    """Whitespace token count; blank → 0."""
    return F.when(
        text.isNull() | ~text.rlike(r"\S"), F.lit(0)
    ).otherwise(F.size(F.split(F.trim(text), r"\s+")))


def bpe_token_count(text: Column) -> Column:
    """Regex pre-tokenizer count (approximates BPE token count pre-merges)."""
    return F.coalesce(F.regexp_count(text, F.lit(BPE_TOKEN_RE)), F.lit(0))


# --------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios)
# --------------------------------------------------------------------------

#: tiny English stopword core — enough signal for ratio features
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
             "that", "for", "on", "with", "as", "was", "at", "by", "be"]

_PUNCT_CLASS = r"[^!-/:-@\[-`{-~]"  # complement of ASCII punctuation


def punct_ratio(text: Column) -> Column:
    """ASCII-punctuation chars / total chars (0 for blank)."""
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, _PUNCT_CLASS, ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """Stopword tokens / whitespace tokens (0 for blank)."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    total = ws_token_count(text)
    return F.when(total > 0, hits.cast("double") / total).otherwise(F.lit(0.0))


def mean_word_len(text: Column) -> Column:
    total = ws_token_count(text)
    chars = F.length(F.regexp_replace(text, r"\s", ""))
    return F.when(total > 0, chars.cast("double") / total).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic (Gopher/C4-style cheap filters):
    rewards plausible length, word shape, stopword presence; penalizes
    punctuation soup. Deterministic closed form → SQL-oracle-checkable."""
    n_tok = ws_token_count(text).cast("double")
    len_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    mwl = mean_word_len(text)
    shape_term = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_term = F.least(stopword_ratio(text) * 4.0, F.lit(1.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(text) * 4.0)
    return F.round(
        0.3 * len_term + 0.2 * shape_term + 0.25 * sw_term + 0.25 * punct_term, 6
    )


# --------------------------------------------------------------------------
# Repetition stats (Gopher-style duplicate-line filters)
# --------------------------------------------------------------------------


def nonblank_lines(text: Column, sep: str = "\n") -> Column:
    """text split on ``sep``, blank entries dropped — the production
    line-maker for ``dup_line_stats`` (tests chunk the synthetic word soup
    into fixed-width pseudo-lines instead, since it has no newlines)."""
    return F.filter(
        F.split(F.coalesce(text, F.lit("")), sep),
        lambda l: l.rlike(r"\S"),
    )


def dup_line_stats(lines: Column) -> dict[str, Column]:
    """Gopher-style duplicate-line metrics over an array-of-lines column:

    - ``n_lines``
    - ``dup_line_frac``   — lines whose value occurs >= 2 times / n_lines
    - ``dup_line_char_frac`` — chars in those lines / chars in all lines

    Pure Column algebra, zero shuffles: sort the array once, flag a line as
    duplicated iff it equals a sorted neighbor (O(n log n) per doc instead
    of the naive O(n^2) membership scan). Both engines sort strings by raw
    binary collation, so the oracle reproduces this exactly."""
    s = F.array_sort(lines)
    n = F.size(s)
    dup = F.filter(
        s,
        lambda x, i: ((i > 0) & (x == F.element_at(s, i)))
        | ((i < n - 1) & (x == F.element_at(s, i + 2))),
    )
    chars = F.aggregate(lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    dup_chars = F.aggregate(dup, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    return {
        "n_lines": n,
        "dup_line_frac": F.round(
            F.when(n > 0, F.size(dup).cast("double") / n).otherwise(F.lit(0.0)), 6
        ),
        "dup_line_char_frac": F.round(
            F.when(chars > 0, dup_chars.cast("double") / chars).otherwise(F.lit(0.0)), 6
        ),
    }


# --------------------------------------------------------------------------
# Language-ID heuristic (stopword-profile n-gram scoring)
# --------------------------------------------------------------------------

#: marker words per language — tiny profiles, good enough for a heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "con", "del"],
    "it": ["il", "che", "di", "non", "per", "una", "sono", "con"],
}


def lang_id(text: Column) -> Column:
    """argmax over per-language marker-word hit counts; 'und' (undetermined)
    when nothing matches. Pure Column algebra — one pass, no UDF."""
    words = F.split(F.lower(F.trim(text)), r"\s+")
    scored = []
    for code, markers in LANG_MARKERS.items():
        m = F.array(*[F.lit(w) for w in markers])
        score = F.size(F.filter(words, lambda w: F.array_contains(m, w)))
        scored.append(F.struct(score.alias("score"), F.lit(code).alias("code")))
    # array_max on structs orders by (score, code) lexicographically —
    # deterministic tie-break on the code
    best = F.array_max(F.array(*scored))
    return F.when(best["score"] > 0, best["code"]).otherwise(F.lit("und"))


# --------------------------------------------------------------------------
# Unicode script census (script detection — the writing-system complement
# to the lang_id heuristic: lang_id is marker-word-based and silent on
# non-Latin text; the census classifies by codepoint block)
# --------------------------------------------------------------------------

#: major-script BMP codepoint ranges, as regex character-class bodies.
#: BMP-only by design: Spark's length() and DuckDB's length() both count
#: code points, so counts agree bit-exactly without surrogate reasoning.
SCRIPT_RANGES: dict[str, str] = {
    "arabic": "؀-ۿ",
    "cjk": "一-鿿",
    "cyrillic": "Ѐ-ӿ",
    "devanagari": "ऀ-ॿ",
    "greek": "Ͱ-Ͽ",
    "hangul": "가-힯",
    "hebrew": "֐-׿",
    "kana": "぀-ヿ",
    "latin": "A-Za-zÀ-ɏ",
}


def script_counts(text: Column) -> dict[str, Column]:
    """{script: codepoint count} — strip-and-measure (length of the text
    with everything OUTSIDE the script's class removed). Pure codegen
    Column algebra, one pass, zero shuffles; long-typed so the counts
    survive any downstream sum at corpus scale."""
    t = F.coalesce(text, F.lit(""))
    return {
        name: F.length(F.regexp_replace(t, f"[^{body}]", "")).cast("long")
        for name, body in SCRIPT_RANGES.items()
    }


def dominant_script(text: Column) -> Column:
    """argmax script by (count, name) — the same array_max-over-structs
    tie-break as lang_id (equal counts pick the lexicographically greatest
    name); 'und' when no script character appears at all."""
    counts = script_counts(text)
    best = F.array_max(
        F.array(
            *[
                F.struct(c.alias("n"), F.lit(name).alias("script"))
                for name, c in counts.items()
            ]
        )
    )
    return F.when(best["n"] > 0, best["script"]).otherwise(F.lit("und"))


# --------------------------------------------------------------------------
# Document fingerprinting
# --------------------------------------------------------------------------


def content_fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercased, whitespace-collapsed
    text — the exact-dedup key (oracle-checkable: DuckDB md5 matches)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


_K = 5          # k-gram length (words)
_WINNOW_W = 4   # winnowing window


def _winnow_series_stable(texts: pd.Series) -> pd.Series:
    """Winnowing fingerprint (Schleimer et al., SIGMOD 2003): stable hash
    over word k-grams, per-window minima, deduplicated. Arrow-batched.
    Python's built-in str hash is salted per process — useless across
    executors — so k-gram strings are hashed with C-speed md5 (same
    ``_hash64_array`` as the minhash/simhash family)."""
    import numpy as np

    from ..operators.dedup import _hash64_array

    def one(t):
        if t is None:
            return None
        words = t.lower().split()
        m = len(words) - _K + 1
        if m <= 0:
            return []
        grams = [" ".join(words[i : i + _K]) for i in range(m)]
        hs = _hash64_array(grams).astype(np.int64)
        hs &= np.int64((1 << 62) - 1)  # non-negative for BIGINT stability
        if len(hs) <= _WINNOW_W:
            return [int(hs.min())]
        mins = np.lib.stride_tricks.sliding_window_view(hs, _WINNOW_W).min(axis=1)
        return sorted(set(int(x) for x in mins))

    return texts.map(one)


#: Arrow-batched winnowing fingerprint: text -> array<long> of selected
#: k-gram hashes (stable across processes/executors — no salted hashing).
winnow_fingerprint_udf = F.pandas_udf(_winnow_series_stable, returnType=ArrayType(LongType()))


# --------------------------------------------------------------------------
# Lexical diversity (repetition-aware quality signals)
# --------------------------------------------------------------------------


def _ws_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens, empties dropped — the family's shared
    tokenizer (same as the dedup/shingle/chunking pipelines)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def type_token_ratio(text: Column) -> Column:
    """Distinct/total lowercased whitespace tokens, rounded 6 — near 0 for
    templated/repetitive text, near 1 for diverse prose. Blank/null → null.
    Pure Column algebra (codegen, zero shuffles)."""
    toks = _ws_tokens(text)
    n = F.size(toks)
    return F.when(
        n > 0,
        F.round(F.size(F.array_distinct(toks)).cast("double") / n, 6),
    ).otherwise(F.lit(None).cast("double"))


def _entropy_series(texts: pd.Series) -> pd.Series:
    """Shannon entropy (nats) of the per-doc token unigram distribution —
    numpy unique+counts per doc, Arrow-batched."""
    import numpy as np

    def one(t):
        if t is None:
            return None
        toks = t.lower().split()
        if not toks:
            return None
        _, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
        p = counts / counts.sum()
        return round(float(-(p * np.log(p)).sum()), 6)

    return texts.map(one)


def token_entropy(text: Column) -> Column:
    """Unigram token entropy in nats (0 = one token repeated; ln(n) =
    all-distinct), rounded 6. Low entropy + high length flags boilerplate
    and keyword-stuffed spam that length/punct ratios miss. Arrow-batched
    pandas UDF (token histograms need per-doc grouping that Column algebra
    can't express without an O(n²) nested filter)."""
    from pyspark.sql.types import DoubleType

    return F.pandas_udf(_entropy_series, returnType=DoubleType())(text)


# --------------------------------------------------------------------------
# Compression-ratio quality gate
# --------------------------------------------------------------------------

#: fixed zlib level — part of the fingerprint's definition; changing it
#: changes every ratio, so it is a constant, not a parameter
_ZLIB_LEVEL = 6


def _compression_ratio_series(texts: pd.Series) -> pd.Series:
    """micro-unit zlib ratio per text: (10^6 · |deflate(utf8)|) // |utf8|.
    Arrow-batched; one C-speed deflate per string. Null/empty → NA (an
    empty document has no compressibility, and TEXT_EMPTY already owns
    that finding)."""
    import zlib

    def one(t):
        if t is None:
            return None
        raw = t.encode("utf-8")
        if not raw:
            return None
        return (1_000_000 * len(zlib.compress(raw, _ZLIB_LEVEL))) // len(raw)

    return pd.Series([one(t) for t in texts], dtype="Int64")


def compression_ratio_micro(text: Column) -> Column:
    """Deflate compressibility of the document in exact micro-units —
    the cheap information-density gate (Gopher-family pipelines drop both
    tails): templated/repeated boilerplate compresses to < ~0.2, organic
    prose sits ~0.3–0.6, and ratios near/above 1.0 mean already-compressed
    or random bytes masquerading as text. zlib output is deterministic
    for a fixed level and library, pinned by property tests (no SQL
    oracle — DuckDB has no deflate)."""
    return F.pandas_udf(_compression_ratio_series, returnType=LongType())(text)


# --------------------------------------------------------------------------
# Readability (Flesch reading ease / Flesch-Kincaid grade)
# --------------------------------------------------------------------------

#: a vowel GROUP approximates one syllable nucleus ('readable' → ea|a|e →
#: 3); 'y' counts as a vowel ('syzygy' → 3). The estimator is the classic
#: cheap one — deterministic and regex-replayable, not a dictionary.
_VOWEL_GROUP_RE = "[aeiouy]+"
#: a sentence boundary is a run of terminal punctuation; texts with none
#: (headlines, word salad) floor at 1 sentence rather than dividing by 0
_SENT_BOUND_RE = "[.!?]+"


def readability_exprs(text: Column) -> "dict[str, Column]":
    """Flesch reading ease + Flesch-Kincaid grade level in exact
    micro-units: ``n_words``, ``n_sentences``, ``n_syllables``,
    ``fre_micro``, ``fkgl_micro``.

    Syllables = vowel-group count over the lowercased text PLUS the count
    of vowel-free tokens (per-word ``max(1, groups)`` — groups never span
    whitespace, so the global count equals the per-word sum). Sentences =
    ``greatest(1, terminal-punctuation runs)``. Both formulas are then
    fixed-order IEEE double arithmetic over exact integer ratios —
    division/multiply/subtract are all correctly rounded, so DuckDB
    replays the micro values bit-exactly (the same discipline as the
    round-6 fractions elsewhere in this module; no ``ln`` anywhere).
    Zero-shuffle Column algebra; NULL/wordless text → NULL scores.
    """
    low = F.lower(text)
    toks = F.filter(F.split(low, r"\s+"), lambda t: t != "")
    n_words = F.size(toks).cast("long")
    vowel_groups = F.size(F.regexp_extract_all(low, F.lit(_VOWEL_GROUP_RE), 0))
    no_vowel = F.size(F.filter(toks, lambda t: t.rlike("^[^aeiouy]*$")))
    n_syll = (vowel_groups + no_vowel).cast("long")
    n_sent = F.greatest(
        F.lit(1), F.size(F.regexp_extract_all(text, F.lit(_SENT_BOUND_RE), 0))
    ).cast("long")
    w = n_words.cast("double")
    wps = w / n_sent.cast("double")
    spw = n_syll.cast("double") / w
    fre = F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw
    fkgl = F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59)
    guard = text.isNotNull() & (n_words > 0)
    return {
        "n_words": F.when(text.isNotNull(), n_words),
        "n_sentences": F.when(text.isNotNull(), n_sent),
        "n_syllables": F.when(text.isNotNull(), n_syll),
        "fre_micro": F.when(guard, F.floor(F.lit(1e6) * fre).cast("long")),
        "fkgl_micro": F.when(guard, F.floor(F.lit(1e6) * fkgl).cast("long")),
    }
