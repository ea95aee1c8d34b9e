"""Dataset card (plans/card.py): exact totals, dup-rate arithmetic,
language OTHER fold, markdown rendering, CLI mode."""

from __future__ import annotations

import datetime as dt
import json

from gbif_data_validator_spark.plans.card import (
    dataset_card,
    render_card_markdown,
)

SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _tiny(spark):
    t = dt.datetime(2024, 3, 1)
    rows = [
        ("u1", t, None, "alpha beta", "en"),
        # lower+whitespace-collapse normalizes to 'alpha beta' == row 1
        ("u2", dt.datetime(2024, 5, 2), None, "alpha  BETA", "en"),
        ("u3", t, None, "gamma", "fr"),
        ("u4", t, None, None, "de"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_dataset_card_exact_numbers(spark):
    card = dataset_card(_tiny(spark), top_langs=2)
    assert card["n_docs"] == 4
    # chars: 10 + 11 + 5 (+0 for NULL text)
    assert card["total_chars"] == 26
    assert card["total_ws_tokens"] == 5
    assert card["ts_min"] == "2024-03-01 00:00:00"
    assert card["ts_max"] == "2024-05-02 00:00:00"
    # 3 text docs, 2 distinct fingerprints ('alpha beta' normalizes equal)
    assert card["exact_dup_rate_micro"] == 1_000_000 * 1 // 3
    langs = {x["lang"]: x["n"] for x in card["languages"]}
    assert langs["en"] == 2 and langs["(other)"] == 1
    assert card["columns"]["n_rows"] == 4

    md = render_card_markdown(card)
    assert "documents: 4" in md and "| en | 2 |" in md
    assert "exact-duplicate rate: 33.33%" in md
    # underscore columns keep their FULL name in the column section
    # (regression: rsplit("_", 2) rendered warc_ts as a bogus `warc`
    # row with zeroed stats)
    assert "- `warc_ts`:" in md and "`warc`:" not in md.replace("`warc_ts`", "")


def test_dataset_card_cli_mode(spark, tmp_path, capsys):
    from gbif_data_validator_spark.cli import main
    from gbif_data_validator_spark.sources.synthetic import synth_pages

    src = str(tmp_path / "cpages")
    synth_pages(spark, 200, with_violations=False).drop(
        "expected_issue"
    ).write.parquet(src)
    assert main(["--table", src, "--dataset-card",
                 "--card-md", str(tmp_path / "cards")]) == 0
    card = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert card["n_docs"] == 200 and card["card_schema_version"] == 1
    md = (tmp_path / "cards" / "cpages.md").read_text()
    assert md.startswith("# Dataset card") and "documents: 200" in md
