"""C4 cleaning rules and Gopher quality gates — the published corpus-
cleaning batteries, as pure Column algebra (zero shuffles, zero UDFs,
whole-stage codegen; every rule is a closed-form expression so the DuckDB
oracle replays it bit-exactly).

These extend the reference's record-structure predicates
(evaluator/record/RecordStructureEvaluator.java — per-field shape checks)
with the document-level analogs a webtext pipeline applies before indexing:

- ``c4_clean``: Raffel et al. 2020 §2.2 — keep lines that end in terminal
  punctuation, have ≥ ``min_line_words`` words, and don't mention
  "javascript"; drop pages containing "lorem ipsum" or "{", or with fewer
  than ``min_sentences`` sentences after line filtering. (C4's bad-words
  list and its three-sentence-span corpus dedup are deliberately out of
  this operator: the first is a vocabulary dimension — see the referential
  family — and the second is `paragraph_dupes`/`winnow_pairs`.)
- ``gopher_gates``: Rae et al. 2021 Table A1 — word count range, mean word
  length range, symbol-to-word ratio, bullet/ellipsis line fractions,
  alphabetic-word fraction, and a minimal-stopword gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import mean_word_len, nonblank_lines, ws_token_count

#: C4 line-retention: terminal punctuation (., !, ?, or closing quote)
_TERMINAL_RE = r'[.!?"]\s*$'


def c4_keep_line(line: Column, min_line_words: int = 5) -> Column:
    """The C4 per-line predicate."""
    words = F.size(F.filter(F.split(F.trim(line), r"\s+"), lambda w: w != ""))
    return (
        line.rlike(_TERMINAL_RE)
        & (words >= min_line_words)
        & ~F.contains(F.lower(line), F.lit("javascript"))
    )


def c4_exprs(
    text: Column,
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> dict[str, Column]:
    """The C4 verdict as reusable named Column expressions over ``text``
    (``kept`` / ``clean_text`` / ``n_lines_kept`` / ``n_lines_dropped`` /
    ``n_sentences`` / ``has_lorem_ipsum`` / ``has_curly``) — so composers
    like ``curation_funnel`` evaluate the battery inside ONE projection
    instead of joining per-battery DataFrames."""
    lines = nonblank_lines(text)
    kept_lines = F.filter(lines, lambda l: c4_keep_line(l, min_line_words))
    clean_text = F.array_join(kept_lines, "\n")
    n_sentences = F.coalesce(F.regexp_count(clean_text, F.lit(r"[.!?]")), F.lit(0))
    has_lorem = F.coalesce(
        F.contains(F.lower(text), F.lit("lorem ipsum")), F.lit(False)
    )
    has_curly = F.coalesce(F.contains(text, F.lit("{")), F.lit(False))
    return {
        "kept": ~has_lorem & ~has_curly & (n_sentences >= min_sentences),
        "clean_text": clean_text,
        "n_lines_kept": F.size(kept_lines).cast("long"),
        "n_lines_dropped": (F.size(lines) - F.size(kept_lines)).cast("long"),
        "n_sentences": n_sentences.cast("long"),
        "has_lorem_ipsum": has_lorem,
        "has_curly": has_curly,
    }


def c4_clean(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 cleaning verdicts → ``(doc_id, kept, clean_text, n_lines_kept,
    n_lines_dropped, n_sentences, has_lorem_ipsum, has_curly)``.
    ``clean_text`` is the retained lines re-joined; it is materialized even
    for dropped docs so filter decisions stay auditable (the verbatim-
    sample discipline of the violations contract)."""
    ex = c4_exprs(F.col(text_col), min_line_words, min_sentences)
    return docs.select(
        F.col(doc_id_col).alias("doc_id"),
        *[c.alias(name) for name, c in ex.items()],
    )


#: Gopher's minimal stopword gate (Rae et al. 2021: "must contain at least
#: two of"): the published eight-word set
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_gate_exprs(
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> tuple[dict[str, Column], Column]:
    """The Gopher gate battery as reusable Column expressions over
    ``text`` → ``({gate_name: bool_col}, n_words)`` — the composition
    surface ``curation_funnel`` evaluates in one projection."""
    words = F.filter(F.split(F.trim(F.coalesce(text, F.lit(""))), r"\s+"),
                     lambda w: w != "")
    n_words = ws_token_count(text)
    mwl = mean_word_len(text)
    n_sym = (
        F.coalesce(F.regexp_count(text, F.lit("#")), F.lit(0))
        + F.coalesce(F.regexp_count(text, F.lit(r"\.\.\.")), F.lit(0))
    )
    lines = nonblank_lines(text)
    n_lines = F.size(lines)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.ltrim(l).rlike(r"^[-*•]")))
        .cast("double") / n_lines,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$"))).cast("double")
        / n_lines,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / n_words,
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    sw_hits = F.size(
        F.filter(
            F.array_distinct(F.transform(words, F.lower)),
            lambda w: F.array_contains(sw, w),
        )
    )
    gates = {
        "gate_word_count": (n_words >= min_words) & (n_words <= max_words),
        "gate_mean_word_len": (mwl >= min_mean_word_len) & (mwl <= max_mean_word_len),
        "gate_symbol_ratio": F.when(
            n_words > 0, n_sym.cast("double") / n_words <= max_symbol_ratio
        ).otherwise(F.lit(True)),
        "gate_bullets": bullet_frac <= max_bullet_frac,
        "gate_ellipsis": ellipsis_frac <= max_ellipsis_frac,
        "gate_alpha_words": alpha_frac >= min_alpha_frac,
        "gate_stopwords": sw_hits >= min_stopword_hits,
    }
    return gates, n_words


def gopher_passes_expr(text: Column, **thresholds) -> Column:
    """The Gopher conjunction as a single boolean Column."""
    gates, _ = gopher_gate_exprs(text, **thresholds)
    passes = None
    for g in gates.values():
        passes = g if passes is None else (passes & g)
    return passes


def gopher_gates(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """Gopher quality gates → one boolean per rule plus the conjunction.
    Token-less docs fail the word-count gate and every ratio gate holds
    vacuously (0-denominator fractions are defined as 0)."""
    gates, n_words = gopher_gate_exprs(F.col(text_col), **thresholds)
    passes = None
    for g in gates.values():
        passes = g if passes is None else (passes & g)
    return docs.select(
        F.col(doc_id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        *[v.alias(k) for k, v in gates.items()],
        passes.alias("passes"),
    )
