"""Dataset card: the one-command corpus summary a training-data release
ships with (the dataset-card convention popularized by Gebru et al. 2021
"Datasheets for Datasets" — composition/size/provenance stats, not
prose). Composes the engine's existing one-agg operators into three
bounded jobs and renders JSON + markdown; every number is a driver
scalar, so the card is cheap at any corpus size:

1. `column_profile` — per-column non-blank/null/approx-distinct + text
   length quantiles (one scan, sketch shuffle).
2. one corpus agg — docs, exact char/whitespace-token totals, min/max
   `warc_ts`, distinct content fingerprints (the exact-dup rate's
   numerator) in a single Expand aggregation.
3. language mix — `lang` groupBy, top-k + OTHER fold.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import content_fingerprint, ws_token_count

CARD_SCHEMA_VERSION = 1


def dataset_card(df: DataFrame, top_langs: int = 10) -> "dict[str, Any]":
    """→ plain-dict dataset card for a pages-shaped table. Three bounded
    jobs; the returned dict is JSON-ready (no Rows, no numpy)."""
    from ..operators.metrics import column_profile

    prof = {k: v for k, v in column_profile(df).first().asDict().items()}
    totals = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.length("text"), F.lit(0))).alias("total_chars"),
        F.sum(ws_token_count(F.col("text"))).alias("total_ws_tokens"),
        F.min("warc_ts").alias("ts_min"),
        F.max("warc_ts").alias("ts_max"),
        F.count_distinct(content_fingerprint(F.col("text"))).alias(
            "distinct_fingerprints"
        ),
        F.count(F.when(F.col("text").isNotNull(), 1)).alias("n_text_docs"),
    ).first()
    langs = (
        df.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc_nulls_last("lang"))
        .limit(top_langs)
        .collect()
    )
    n_docs = int(totals["n_docs"])
    n_text = int(totals["n_text_docs"])
    n_fp = int(totals["distinct_fingerprints"])
    top = [{"lang": r["lang"], "n": int(r["n"])} for r in langs]
    covered = sum(x["n"] for x in top)
    card: dict[str, Any] = {
        "card_schema_version": CARD_SCHEMA_VERSION,
        "n_docs": n_docs,
        "total_chars": int(totals["total_chars"] or 0),
        "total_ws_tokens": int(totals["total_ws_tokens"] or 0),
        "ts_min": str(totals["ts_min"]) if totals["ts_min"] is not None else None,
        "ts_max": str(totals["ts_max"]) if totals["ts_max"] is not None else None,
        # exact-dup rate over docs WITH text: docs beyond one per
        # distinct fingerprint, in integer micro-units
        "exact_dup_rate_micro": (
            (1_000_000 * (n_text - n_fp)) // n_text if n_text else None
        ),
        "languages": top + (
            [{"lang": "(other)", "n": n_docs - covered}]
            if n_docs > covered
            else []
        ),
        "columns": prof,
    }
    return card


def render_card_markdown(card: "dict[str, Any]") -> str:
    """Human face of the card — compact markdown, one fact per line."""
    lines = [
        "# Dataset card",
        "",
        f"- documents: {card['n_docs']:,}",
        f"- characters: {card['total_chars']:,}",
        f"- whitespace tokens: {card['total_ws_tokens']:,}",
        f"- time range: {card['ts_min']} .. {card['ts_max']}",
    ]
    if card["exact_dup_rate_micro"] is not None:
        pct = card["exact_dup_rate_micro"] / 10_000
        lines.append(f"- exact-duplicate rate: {pct:.2f}%")
    lines += ["", "## Languages", "", "| lang | docs |", "|---|---|"]
    lines += [
        f"| {x['lang'] if x['lang'] is not None else '(null)'} | {x['n']:,} |"
        for x in card["languages"]
    ]
    lines += ["", "## Columns", ""]
    prof = card["columns"]
    n = prof.get("n_rows", 0)
    for c in sorted(
        {k[: -len("_nulls")] for k in prof if k.endswith("_nulls")}
    ):
        lines.append(
            f"- `{c}`: {prof.get(c + '_nulls', 0):,} null / {n:,}; "
            f"~{prof.get(c + '_approx_distinct', 0):,} distinct"
        )
    return "\n".join(lines) + "\n"
