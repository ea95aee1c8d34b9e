"""Fellegi–Sunter record linkage (operators/linkage.py)."""

import math

import pytest

from gbif_data_validator_spark.operators.linkage import (
    fs_weights,
    linkage_dropped_blocks,
    linkage_scores,
)

FIELDS = {"name": (0.9, 0.1), "phone": (0.8, 0.05)}


def test_fs_weights_values_and_contract():
    w = fs_weights(FIELDS)
    assert w["name"][0] == pytest.approx(math.log2(9))
    assert w["name"][1] == pytest.approx(math.log2(0.1 / 0.9))
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fs_weights({"x": (0.1, 0.9)})


def test_linkage_scores_agreement_patterns(spark):
    left = spark.createDataFrame(
        [("b1", "L1", "Ann  Lee", "555"), ("b1", "L2", "Bob", None)],
        "blk string, id string, name string, phone string",
    )
    right = spark.createDataFrame(
        [("b1", "R1", "ann lee", "555"), ("b1", "R2", "Carol", "777")],
        "blk string, id string, name string, phone string",
    )
    got = {
        (r.id_a, r.id_b): (r.n_agree, r.score, r.is_match)
        for r in linkage_scores(
            left, right, "blk", FIELDS, "id", "id", threshold=3.0
        ).collect()
    }
    w = fs_weights(FIELDS)
    # L1-R1: both fields agree (case/space-normalized)
    full = round(w["name"][0] + w["phone"][0], 6)
    assert got[("L1", "R1")] == (2, full, True)
    # L2-R1: name disagrees, phone one-null -> 0 contribution
    assert got[("L2", "R1")] == (0, round(w["name"][1], 6), False)
    # L1-R2: both disagree
    both_d = round(w["name"][1] + w["phone"][1], 6)
    assert got[("L1", "R2")] == (0, both_d, False)
    assert len(got) == 4  # full block pairing, no cross-block leakage


def test_linkage_block_cap_excludes_and_reports(spark):
    left = spark.createDataFrame(
        [("hot", f"L{i}", "x", "1") for i in range(4)]
        + [("ok", "L9", "y", "2")],
        "blk string, id string, name string, phone string",
    )
    right = spark.createDataFrame(
        [("hot", f"R{i}", "x", "1") for i in range(4)]
        + [("ok", "R9", "y", "2")],
        "blk string, id string, name string, phone string",
    )
    scored = linkage_scores(
        left, right, "blk", FIELDS, "id", "id", max_block_pairs=10
    )
    # hot block (16 pairs) excluded ENTIRELY; ok block (1 pair) survives
    assert [(r.id_a, r.id_b) for r in scored.collect()] == [("L9", "R9")]
    dropped = linkage_dropped_blocks(left, right, "blk", 10).collect()
    assert [(r.blk, r.n_left, r.n_right, r.n_pairs) for r in dropped] == [
        ("hot", 4, 4, 16)
    ]


def test_linkage_fuzzy_levenshtein_tier(spark):
    left = spark.createDataFrame(
        [("b1", "L1", "jonathan smith", "x")],
        "blk string, id string, name string, seg string",
    )
    right = spark.createDataFrame(
        [("b1", "R1", "Jonathon  Smith", "x"), ("b1", "R2", "Bob Jones", "x")],
        "blk string, id string, name string, seg string",
    )
    fields = {"name": (0.9, 0.1), "seg": (0.7, 0.2)}
    strict = {
        r.id_b: r.n_agree
        for r in linkage_scores(
            left, right, "blk", fields, "id", "id"
        ).collect()
    }
    fuzz = {
        r.id_b: r.n_agree
        for r in linkage_scores(
            left, right, "blk", fields, "id", "id", fuzzy={"name": 2}
        ).collect()
    }
    # jonathan/jonathon: 1 edit after normalization — fuzzy admits it,
    # strict does not; Bob Jones stays a disagreement either way
    assert strict == {"R1": 1, "R2": 1}
    assert fuzz == {"R1": 2, "R2": 1}
