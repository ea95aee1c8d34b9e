"""Layout and skew audits: real multi-file parquet layouts (the unit tests
cover what the single-file driver fixture can't), skew ordering/shares, and
the narrow-scan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.layout import (
    file_rowcounts,
    key_skew_audit,
    layout_audit,
)


def test_file_rowcounts_multifile(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(0, 1000).repartition(4).write.parquet(p)
    rc = file_rowcounts(spark.read.parquet(p)).collect()
    assert len(rc) == 4
    assert sum(r["n_rows"] for r in rc) == 1000
    assert all("/" not in r["file"] for r in rc)  # basenames only


def test_layout_audit_flags_small_files(spark, tmp_path):
    big = str(tmp_path / "big")
    small = str(tmp_path / "small")
    spark.range(0, 2000).coalesce(1).write.parquet(big)
    spark.range(0, 90).repartition(3).write.parquet(small)
    out = {
        r["table"]: r
        for r in layout_audit(
            spark, {"big": big, "small": small}, small_file_rows=100
        ).collect()
    }
    assert out["big"]["n_files"] == 1 and out["big"]["n_small_files"] == 0
    assert out["small"]["n_files"] == 3 and out["small"]["n_small_files"] == 3
    assert out["small"]["n_rows"] == 90
    assert out["big"]["min_file_rows"] == out["big"]["max_file_rows"] == 2000


def _file_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of a column from parquet footer stats — what a
    stats-pruning scan (Spark/Iceberg/DuckDB) actually sees."""
    import duckdb

    rows = duckdb.sql(
        f"""
        SELECT file_name, min(CAST(stats_min AS DOUBLE)), max(CAST(stats_max AS DOUBLE))
        FROM parquet_metadata('{path}/*.parquet')
        WHERE path_in_schema = '{col}' GROUP BY file_name
        """
    ).fetchall()
    return [(r[1], r[2]) for r in rows]


def _mean_coverage(path: str, col: str, lo: float, hi: float) -> float:
    """Average fraction of the global [lo, hi] range a file's stats span —
    1.0 means stats prune nothing, 1/n_files is perfect clustering."""
    spans = _file_ranges(path, col)
    return sum((b - a) / (hi - lo) for a, b in spans) / len(spans)


def test_optimize_layout_range_clustering(spark, tmp_path):
    from gbif_data_validator_spark.operators.layout import optimize_layout

    df = spark.range(0, 40_000).select(
        F.col("id").alias("x"), F.xxhash64("id").alias("noise")
    )
    p = str(tmp_path / "ranged")
    n_files = optimize_layout(df, p, by=["x"], target_rows_per_file=10_000)
    assert n_files == 4
    cov = _mean_coverage(p, "x", 0, 39_999)
    assert cov < 0.30  # ~0.25 ideal; a random layout would be ~1.0


def test_optimize_layout_zorder_skips_both_columns(spark, tmp_path):
    """Z-order: BOTH columns get narrow per-file stats; a plain (x, y)
    sort leaves y's per-file range at ~the full domain."""
    from gbif_data_validator_spark.operators.layout import optimize_layout

    grid = spark.range(0, 65_536).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    zp, lp = str(tmp_path / "z"), str(tmp_path / "linear")
    nz = optimize_layout(grid, zp, by=["x", "y"], target_rows_per_file=4_096, zorder=True)
    optimize_layout(grid, lp, by=["x", "y"], target_rows_per_file=4_096)
    assert nz == 16
    zx, zy = _mean_coverage(zp, "x", 0, 255), _mean_coverage(zp, "y", 0, 255)
    lx, ly = _mean_coverage(lp, "x", 0, 255), _mean_coverage(lp, "y", 0, 255)
    assert lx < 0.15  # linear: leading column clusters perfectly…
    assert ly > 0.8  # …but the second column prunes nothing
    assert zx < 0.5 and zy < 0.5  # zorder: both columns prune (4x4 tiles → ~0.25)


def test_optimize_layout_files_sorted_within(spark, tmp_path):
    from gbif_data_validator_spark.operators.layout import optimize_layout

    df = spark.range(0, 5_000).select(F.col("id").alias("x"))
    p = str(tmp_path / "sorted")
    optimize_layout(df, p, by=["x"], target_rows_per_file=2_500)
    # file ranges must be disjoint (range partitioning, not hash)
    spans = sorted(_file_ranges(p, "x"))
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo


def test_audit_optimize_audit_roundtrip(spark, tmp_path):
    """The ops loop: audit flags a fragmented table → optimize_layout
    rewrites it → re-audit comes back clean with identical data."""
    from gbif_data_validator_spark.operators.layout import optimize_layout

    bad = str(tmp_path / "bad")
    spark.range(0, 10_000).select(F.col("id").alias("x")).repartition(
        50
    ).write.parquet(bad)
    before = layout_audit(spark, {"t": bad}, small_file_rows=1_000).collect()[0]
    assert before["n_files"] == 50 and before["n_small_files"] == 50

    good = str(tmp_path / "good")
    optimize_layout(spark.read.parquet(bad), good, by=["x"], target_rows_per_file=5_000)
    after = layout_audit(spark, {"t": good}, small_file_rows=1_000).collect()[0]
    assert after["n_files"] == 2 and after["n_small_files"] == 0
    assert after["n_rows"] == before["n_rows"] == 10_000
    # data unchanged, just re-clustered
    assert (
        spark.read.parquet(good).exceptAll(spark.read.parquet(bad)).count() == 0
    )


def test_key_skew_audit_orders_and_shares(spark):
    # key "a" ×6, "b" ×3, "c" ×1 → shares .6/.3/.1; null key counts too
    rows = [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1 + [(None,)] * 10
    df = spark.createDataFrame(rows, "k: string")
    got = key_skew_audit(df, "k", top_k=2).collect()
    assert [r["key"] for r in got] == [None, "a"]
    assert got[1]["n"] == 6
    assert abs(got[1]["share"] - 0.3) < 1e-9  # 6 of 20
    assert got[0]["n_groups"] == 4


def test_key_skew_deterministic_ties(spark):
    rows = [("x%d" % i,) for i in range(5) for _ in range(2)]
    df = spark.createDataFrame(rows, "k: string")
    got = [r["key"] for r in key_skew_audit(df, "k", top_k=3).collect()]
    assert got == ["x0", "x1", "x2"]  # ties broken by key ascending


def test_skew_audit_scan_is_narrow(spark, pages):
    """Column pruning: the skew audit over a wide table must read only the
    key column (html stays out of ReadSchema)."""
    plan = (
        key_skew_audit(pages, "lang")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "html" not in plan


def test_zorder_key_auto_reduces_bits(spark):
    """bits*n_cols > 63 would hit the JVM's mod-64 shiftleft wrap and
    silently scramble the Morton order — precision must auto-reduce so
    every interleaved bit lands in a distinct position."""
    from gbif_data_validator_spark.operators.layout import zorder_key

    cols = [f"c{i}" for i in range(6)]
    df = spark.createDataFrame(
        [tuple(float(v) for _ in cols) for v in (0.0, 63.0, 511.0, 1023.0)],
        ", ".join(f"{c} double" for c in cols),
    )
    # default bits=12 × 6 cols = 72 > 63 → auto-reduced to 10; the key must
    # stay strictly monotone for rows that are monotone on every column
    keys = [
        r[0]
        for r in df.select(
            zorder_key(cols, [0.0] * 6, [1023.0] * 6).alias("z")
        ).orderBy("c0").collect()
    ]
    assert keys == sorted(keys) and len(set(keys)) == len(keys)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="too many columns"):
        zorder_key([f"x{i}" for i in range(64)], [0.0] * 64, [1.0] * 64)


def test_join_explosion_audit_exact_totals(spark):
    from gbif_data_validator_spark.operators.layout import join_explosion_audit

    left = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (None,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (2,), (4,), (None,)], "rk long"
    )
    rows = join_explosion_audit(left, right, "k", "rk", top_k=10).collect()
    got = {r.key: (r.n_left, r.n_right, r.n_out) for r in rows}
    # key 3 and 4 unmatched; NULLs never match (SQL equi-join semantics)
    assert got == {"1": (3, 2, 6), "2": (1, 1, 1)}
    # total_out == the actual inner-join row count, on every row
    actual = left.join(right, left.k == right.rk).count()
    assert all(r.total_out == actual == 7 for r in rows)
    assert rows[0].key == "1" and rows[0].share == round(6 / 7, 6)


def test_partition_advisor_verdicts_and_micro_units(spark):
    from gbif_data_validator_spark.operators.layout import partition_advisor

    rows = [
        # good: 4 values, balanced, no nulls
        ("g%d" % (i % 4), "s", None if i < 3 else "f%d" % (i % 5), i)
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "good string, skew string, nullish string, wide int"
    )
    got = {
        r.column: r
        for r in partition_advisor(
            df, ["good", "skew", "nullish", "wide"], max_partitions=8
        ).collect()
    }
    g = got["good"]
    assert (g.n_distinct, g.verdict) == (4, "good")
    assert g.skew_micro == 1000000 * 3 // 12  # 3-row groups of 12
    # constant column -> 1 distinct -> too few
    assert got["skew"].verdict == "too_few_values"
    # 3/12 nulls = 250000 micro > 200000 default -> high_null (5 distinct
    # non-null values keeps it past the too_few gate)
    n = got["nullish"]
    assert (n.n_nulls, n.null_micro, n.verdict) == (3, 250000, "high_null")
    # 12 distinct ints > max_partitions=8 -> too many
    assert got["wide"].verdict == "too_many_values"


def test_partition_advisor_skew_precedence(spark):
    from gbif_data_validator_spark.operators.layout import partition_advisor

    # 10 rows: one value holds 6 -> 600000 micro > 500000 -> skewed
    rows = [("hot" if i < 6 else "c%d" % i,) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    r = partition_advisor(df, ["k"]).first()
    assert (r.max_group_rows, r.skew_micro, r.verdict) == (6, 600000, "skewed")


def test_join_advisor_verdict_precedence_and_exact_cardinality(spark):
    from gbif_data_validator_spark.operators.layout import join_advisor

    left = spark.createDataFrame(
        [("k1",)] * 3 + [("k2",)] * 2 + [(None,)], "k string"
    )
    right = spark.createDataFrame(
        [("k1",)] * 4 + [("k3",)] + [(None,)] * 2, "k string"
    )
    r = join_advisor(left, right, "k").first()
    assert (r.n_left, r.n_right) == (6, 7)
    assert (r.n_left_keys, r.n_right_keys) == (2, 2)
    assert (r.n_left_null_keys, r.n_right_null_keys) == (1, 2)
    assert r.est_out_rows == 12  # only k1 matches: 3*4
    assert r.max_key_out_share_micro == 1000000
    assert r.verdict == "broadcast_right"
    # force past both broadcast gates -> the 100% hot key trips salting
    r2 = join_advisor(left, right, "k", broadcast_threshold_rows=1).first()
    assert r2.verdict == "salted_shuffle"
    # balanced keys under the skew bar -> plain shuffle
    bal_l = spark.createDataFrame([(f"k{i}",) for i in range(10)], "k string")
    bal_r = spark.createDataFrame([(f"k{i}",) for i in range(10)], "k string")
    r3 = join_advisor(
        bal_l, bal_r, "k", broadcast_threshold_rows=1,
        skew_share_micro=200_000,
    ).first()
    assert (r3.est_out_rows, r3.verdict) == (10, "shuffle")
    # disjoint keys: est 0, share 0, no div-by-zero
    dis = join_advisor(
        bal_l,
        spark.createDataFrame([("zz",)], "k string"),
        "k",
        broadcast_threshold_rows=0,
    ).first()
    assert (dis.est_out_rows, dis.max_key_out_share_micro, dis.verdict) == (
        0, 0, "shuffle",
    )


def test_manifest_audit_three_finding_classes(spark, tmp_path):
    """Declared-but-missing, scanned-but-undeclared, and count-drifted
    files each get their finding; agreeing files produce no row."""
    from gbif_data_validator_spark.operators.layout import manifest_audit

    p = str(tmp_path / "t")
    spark.range(100).withColumn("part", F.col("id") % 4).repartition(
        4, "part"
    ).write.parquet(p)
    df = spark.read.parquet(p)
    from gbif_data_validator_spark.operators.layout import file_rowcounts

    actual = {r.file: r.n_rows for r in file_rowcounts(df).collect()}
    files = sorted(actual)
    assert len(files) >= 3  # repartition(4) → 4 data files
    manifest_rows = (
        # files[0]: declared correctly → no finding
        [(files[0], actual[files[0]])]
        # files[1]: declared with a drifted count → ROWCOUNT_MISMATCH
        + [(files[1], actual[files[1]] + 7)]
        # files[2:]: undeclared → FILE_ORPHAN
        # ghost: declared but absent → FILE_MISSING
        + [("ghost-000.parquet", 123)]
    )
    manifest = spark.createDataFrame(manifest_rows, "file string, n_rows long")
    out = manifest_audit(df, manifest).collect()
    by_file = {r.file: r for r in out}
    assert by_file["ghost-000.parquet"].finding == "FILE_MISSING"
    assert by_file["ghost-000.parquet"].n_rows_actual is None
    assert by_file[files[1]].finding == "ROWCOUNT_MISMATCH"
    assert by_file[files[1]].n_rows_declared == actual[files[1]] + 7
    for f in files[2:]:
        assert by_file[f].finding == "FILE_ORPHAN"
        assert by_file[f].n_rows_declared is None
    assert files[0] not in by_file
    assert len(out) == 2 + len(files[2:])


def test_manifest_audit_clean_manifest_empty(spark, tmp_path):
    from gbif_data_validator_spark.operators.layout import (
        file_rowcounts,
        manifest_audit,
    )

    p = str(tmp_path / "t2")
    spark.range(50).write.parquet(p)
    df = spark.read.parquet(p)
    manifest = file_rowcounts(df)
    assert manifest_audit(df, manifest).count() == 0
