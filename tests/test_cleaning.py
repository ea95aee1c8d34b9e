"""C4 cleaning rules and Gopher gates: per-rule goldens plus the no-shuffle
plan contract (both batteries are pure Column algebra)."""

from __future__ import annotations

from gbif_data_validator_spark.functions.cleaning import c4_clean, gopher_gates


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "This line has enough words and ends well.",  # kept
            "Too short line.",                              # <5 words
            "No terminal punctuation here at all",          # no [.!?\"]
            "Please enable javascript to view this page.",  # javascript
            'He said "this quoted line has enough words."',  # kept (quote end)
        ]
    )
    row = c4_clean(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).head()
    assert row.n_lines_kept == 2 and row.n_lines_dropped == 3
    assert row.clean_text.splitlines()[0].startswith("This line")
    # only 2 sentences survive → page dropped (min_sentences=3)
    assert row.n_sentences == 2 and not row.kept


def test_c4_page_rules(spark):
    good = "\n".join(["A good sentence with plenty of words."] * 3)
    rows = {
        r.doc_id: r
        for r in c4_clean(
            spark.createDataFrame(
                [
                    (1, good),
                    (2, good + "\nSome Lorem Ipsum filler text appears."),
                    (3, good + "\nfunction() { return 1; }"),
                    (4, None),
                ],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert rows[1].kept
    assert not rows[2].kept and rows[2].has_lorem_ipsum
    assert not rows[3].kept and rows[3].has_curly
    assert not rows[4].kept and rows[4].n_lines_kept == 0


def test_gopher_gates_each_rule(spark):
    fifty = " ".join(["the quick brown fox jumps over that lazy dog now"] * 5)  # 50 words
    docs = spark.createDataFrame(
        [
            (1, fifty),                                       # passes all
            (2, "short text only"),                           # word count
            (3, " ".join(["a"] * 60)),                        # mean word len < 3
            (4, fifty + " " + "#" * 1 + " ###### ## # # #"),  # symbols
            (5, "\n".join(["- bullet item of the list here"] * 10)),  # bullets
            (6, " ".join(["12345 67890 00000"] * 20)),        # alpha frac
            (7, " ".join(["zebra quokka wombat"] * 20)),      # stopwords
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_gates(docs).collect()}
    assert out[1].passes
    assert not out[2].gate_word_count
    assert not out[3].gate_mean_word_len
    assert not out[4].gate_symbol_ratio
    assert not out[5].gate_bullets and not out[5].passes
    assert not out[6].gate_alpha_words
    assert not out[7].gate_stopwords
    assert all(not out[i].passes for i in range(2, 8))


def test_cleaning_plans_are_narrow(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for out in (c4_clean(df), gopher_gates(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Join" not in plan, plan
