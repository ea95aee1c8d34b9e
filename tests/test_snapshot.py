"""Snapshot-over-snapshot diff (operators/snapshot.py)."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.snapshot import (
    snapshot_diff,
    snapshot_diff_summary,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_snapshot_diff_four_statuses(spark):
    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "B2"), ("u4", "d")], "url string, text string"
    )
    assert _rows(snapshot_diff(old, new)) == [
        ("u1", "unchanged", 1, 1),
        ("u2", "changed", 1, 1),
        ("u3", "removed", 1, 0),
        ("u4", "added", 0, 1),
    ]
    assert _rows(snapshot_diff_summary(old, new)) == [
        ("added", 1, 0, 1),
        ("changed", 1, 1, 1),
        ("removed", 1, 1, 0),
        ("unchanged", 1, 1, 1),
    ]


def test_snapshot_diff_dup_keys_and_nulls(spark):
    # duplicate keys collapse to the MIN md5 of non-null fingerprints
    # (deterministic regardless of row order); counts expose the dup drift.
    # Null keys are excluded on both sides; null fingerprints compare
    # null-safe (all-null vs all-null = unchanged, all-null vs value =
    # changed).
    old = spark.createDataFrame(
        [("u1", "a"), ("u1", "z"), ("u2", None), ("u3", None), (None, "x")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("u1", "z"), ("u1", "a"), ("u1", "a"), ("u2", None), ("u3", "now"),
         (None, "y")],
        "url string, text string",
    )
    assert _rows(snapshot_diff(old, new)) == [
        ("u1", "unchanged", 2, 3),  # same min-md5 {a,z}; dup drift in counts
        ("u2", "unchanged", 1, 1),  # null fp on both sides — null-safe equal
        ("u3", "changed", 1, 1),  # null fp -> value
    ]


def test_snapshot_diff_identical_snapshots(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(20)], "url long, text string"
    )
    out = snapshot_diff(df, df)
    assert _rows(out.groupBy("status").count()) == [("unchanged", 20)]


def test_snapshot_diff_plan_shape(spark, tmp_path):
    """The scale contract: each snapshot scan projects ONLY the key +
    fingerprint columns (never the wide payload), and the whole diff is
    ONE join."""
    wide = spark.createDataFrame(
        [(f"u{i}", f"t{i}", "payload" * 10, i) for i in range(50)],
        "url string, text string, html string, n long",
    )
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    wide.write.parquet(a)
    wide.write.parquet(b)
    out = snapshot_diff(spark.read.parquet(a), spark.read.parquet(b))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # column pruning reached the parquet scans: payload columns absent
    assert "html" not in plan and plan.count("ReadSchema") == 2
    assert plan.count("url") >= 2 and "text" in plan
    # exactly one join node (full outer on the key)
    assert sum(plan.count(j) for j in
               ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")) == 1


def test_apply_changeset_merge_semantics(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.snapshot import apply_changeset

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "url int, text string"
    )
    changes = spark.createDataFrame(
        [(2, "B2", "upsert"), (3, None, "delete"), (9, "new", "upsert")],
        "url int, text string, op string",
    )
    got = {r.url: r.text for r in apply_changeset(base, changes, "url").collect()}
    assert got == {1: "a", 2: "B2", 9: "new"}


def test_apply_changeset_contract_violations_raise(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.operators.snapshot import apply_changeset

    base = spark.createDataFrame([(1, "a")], "url int, text string")
    dup = spark.createDataFrame(
        [(2, "x", "upsert"), (2, "y", "upsert")], "url int, text string, op string"
    )
    with _pytest.raises(ValueError, match="duplicate-key"):
        apply_changeset(base, dup, "url")
    nul = spark.createDataFrame(
        [(None, "x", "upsert")], "url int, text string, op string"
    )
    with _pytest.raises(ValueError, match="NULL-key"):
        apply_changeset(base, nul, "url")
    bad = spark.createDataFrame(
        [(2, "x", "replace")], "url int, text string, op string"
    )
    with _pytest.raises(ValueError, match="upsert|delete"):
        apply_changeset(base, bad, "url")


def test_apply_changeset_broadcast_guard_falls_back(spark):
    from gbif_data_validator_spark.operators.snapshot import apply_changeset

    base = spark.createDataFrame([(i, "t") for i in range(20)], "url int, text string")
    changes = spark.createDataFrame(
        [(i, "u", "delete") for i in range(5)], "url int, text string, op string"
    )
    # threshold below the changeset size -> shuffle-join path, same result
    out = apply_changeset(base, changes, "url", broadcast_threshold=2)
    assert out.count() == 15
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan


def test_extract_changeset_roundtrip_and_classification(spark):
    from gbif_data_validator_spark.operators.snapshot import (
        apply_changeset,
        extract_changeset,
    )

    old = spark.createDataFrame(
        [("u1", "a"), ("u2", "b"), ("u3", "c")], "url string, text string"
    )
    new = spark.createDataFrame(
        [("u1", "a"), ("u2", "B2"), ("u4", "d")], "url string, text string"
    )
    cs = extract_changeset(old, new, "url")
    got = _rows(cs.select("op", "url", "text"))
    # unchanged u1 emits nothing; changed u2 + added u4 -> upserts;
    # removed u3 -> delete with NULL payload
    assert got == [
        ("delete", "u3", None),
        ("upsert", "u2", "B2"),
        ("upsert", "u4", "d"),
    ]
    # roundtrip law: apply(old, extract(old, new)) == new
    replayed = apply_changeset(old, cs, "url")
    assert _rows(replayed) == _rows(new)


def test_extract_changeset_contract_and_degenerate(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.operators.snapshot import extract_changeset

    ok = spark.createDataFrame([("u1", "a")], "url string, text string")
    dup = spark.createDataFrame(
        [("u1", "a"), ("u1", "b")], "url string, text string"
    )
    nul = spark.createDataFrame([(None, "a")], "url string, text string")
    with _pytest.raises(ValueError, match="duplicate-key"):
        extract_changeset(ok, dup, "url")
    with _pytest.raises(ValueError, match="NULL-key"):
        extract_changeset(nul, ok, "url")
    skewed = spark.createDataFrame([("u1", "b")], "url string, other string")
    with _pytest.raises(ValueError, match="schemas differ"):
        extract_changeset(ok, skewed, "url")
    # identical snapshots -> empty changeset
    assert extract_changeset(ok, ok, "url").count() == 0
    # key-only snapshots: adds/deletes only, no fingerprint payload
    k_old = spark.createDataFrame([("u1",), ("u2",)], "url string")
    k_new = spark.createDataFrame([("u2",), ("u3",)], "url string")
    assert _rows(extract_changeset(k_old, k_new, "url")) == [
        ("delete", "u1"),
        ("upsert", "u3"),
    ]


def test_snapshot_as_of_replays_log_states(spark):
    from gbif_data_validator_spark.operators.snapshot import snapshot_as_of

    log = spark.createDataFrame(
        [
            ("u1", "2024-01-01", "upsert", "a1"),
            ("u1", "2024-01-03", "upsert", "a2"),
            ("u2", "2024-01-01", "upsert", "b1"),
            ("u2", "2024-01-02", "delete", None),
            ("u3", "2024-01-03", "upsert", "c1"),
        ],
        "url string, ts string, op string, text string",
    ).withColumn("ts", F.to_timestamp("ts"))

    def state(day):
        df = snapshot_as_of(log, "url", "ts", f"{day} 23:59:59")
        return {r.url: r.text for r in df.collect()}

    assert state("2024-01-01") == {"u1": "a1", "u2": "b1"}
    assert state("2024-01-02") == {"u1": "a1"}  # u2 deleted
    assert state("2024-01-03") == {"u1": "a2", "u3": "c1"}
    assert state("2023-12-31") == {}


def test_snapshot_as_of_tie_breaks(spark):
    from gbif_data_validator_spark.operators.snapshot import snapshot_as_of

    # same-ts upsert + delete: op DESC -> upsert wins without seq_col
    log = spark.createDataFrame(
        [
            ("u1", "2024-01-01", "delete", None, 2),
            ("u1", "2024-01-01", "upsert", "a", 1),
        ],
        "url string, ts string, op string, text string, seq int",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = snapshot_as_of(log, "url", "ts", "2024-01-02").collect()
    assert [(r.url, r.text) for r in got] == [("u1", "a")]
    # with seq_col the LSN decides: seq 2 (the delete) is latest
    assert (
        snapshot_as_of(log, "url", "ts", "2024-01-02", seq_col="seq").count()
        == 0
    )
