"""KS drift over warc_ts windows: exactly the injected drift month is
flagged (FIXTURES.md F2 DRIFT_WINDOW — one window with 3x text lengths)."""

from pyspark.sql import functions as F

from gbif_data_validator_spark.operators.drift import ks_drift
from gbif_data_validator_spark.sources.synthetic import DRIFT_MONTH


def test_drift_month_flagged_and_only_it(spark, pages):
    drift = ks_drift(pages).cache()
    flagged = {r.window for r in drift.where(F.col("drifted")).collect()}
    assert flagged == {DRIFT_MONTH}
    # the drifted window's KS stat is decisively large, others small
    stats = {r.window: r.ks_stat for r in drift.collect()}
    assert stats[DRIFT_MONTH] > 0.5
    others = [v for k, v in stats.items() if k != DRIFT_MONTH]
    # sentence-quantized lengths give coarse ECDFs → per-window noise up to
    # ~1.95/sqrt(n); the drifted window clears it decisively
    assert max(others) < 0.3 < stats[DRIFT_MONTH]
    drift.unpersist()


def test_no_drift_on_clean_uniform_table(spark):
    from gbif_data_validator_spark.sources.synthetic import synth_pages

    # without violations the drift month still exists (it's a property of
    # ts), so test on a metric that is uniform: url length
    clean = synth_pages(spark, 3000, with_violations=False)
    d = ks_drift(clean, metric=F.length("lang"))
    assert d.where(F.col("drifted")).count() == 0


def test_sketch_ks_within_tolerance_of_exact(spark):
    """The sketch KS (equi-probability quantile vectors, N_PROBS=41) must
    track the exact two-sample KS statistic within the sketch's CDF
    resolution (~2/(N_PROBS-1) = 0.05) at matching window granularity —
    the accuracy contract behind the drift_events query's no-oracle status."""
    import datetime as dt

    import numpy as np

    rng = np.random.RandomState(11)
    rows = []
    for day in range(1, 6):
        shift = 10.0 if day == 3 else 0.0
        for i, v in enumerate(rng.normal(100 + shift, 15, 800)):
            rows.append((dt.datetime(2024, 1, day, i % 24), float(v)))
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    sketch = {
        r.window: r.ks_stat
        for r in ks_drift(
            df, metric=F.col("value"), ts_col="ts",
            window_fmt="yyyy-MM-dd", min_rows=10,
        ).collect()
    }

    pdf = df.toPandas()
    pooled = np.sort(pdf.value.values)
    for day, grp in pdf.groupby(pdf.ts.dt.strftime("%Y-%m-%d")):
        w = np.sort(grp.value.values)
        support = np.union1d(w, pooled)
        f_w = np.searchsorted(w, support, side="right") / len(w)
        f_p = np.searchsorted(pooled, support, side="right") / len(pooled)
        exact = float(np.abs(f_w - f_p).max())
        assert abs(sketch[day] - exact) <= 0.05, (day, sketch[day], exact)


def test_categorical_drift_flags_shifted_window(spark):
    from gbif_data_validator_spark.operators.drift import (
        categorical_drift,
        categorical_drift_violations,
    )

    # 3 stable windows with a 50/30/20 category mix; one window flipped
    # to 5/30/65 — decisive PSI shift
    rows = []
    import datetime as dt

    def month(m, mix):
        out = []
        for cat, n in mix:
            out += [(dt.datetime(2024, m, 15), cat)] * n
        return out

    for m in (1, 2, 3):
        rows += month(m, [("en", 100), ("de", 60), ("fr", 40)])
    rows += month(4, [("en", 10), ("de", 60), ("fr", 130)])
    df = spark.createDataFrame(rows, schema="warc_ts timestamp, lang string")

    d = categorical_drift(df, "lang", threshold=0.2).persist()
    flagged = {r.window for r in d.where("drifted").collect()}
    assert flagged == {"2024-04"}
    stats = {r.window: (r.psi, r.chi2) for r in d.collect()}
    assert stats["2024-04"][0] > 0.4 and stats["2024-04"][1] > 50
    assert all(v[0] < 0.1 for k, v in stats.items() if k != "2024-04")
    # violations contract
    v = categorical_drift_violations(d, "lang").collect()
    assert [r.url for r in v] == ["window:2024-04"]
    assert v[0].related_data["column"] == "lang"
    d.unpersist()


def test_categorical_drift_zero_cells_smoothed(spark):
    """A window entirely missing a category must not produce inf/NaN."""
    import datetime as dt

    from gbif_data_validator_spark.operators.drift import categorical_drift

    rows = [(dt.datetime(2024, 1, 1), "en")] * 50 + [
        (dt.datetime(2024, 2, 1), "de")
    ] * 50
    df = spark.createDataFrame(rows, schema="warc_ts timestamp, lang string")
    got = categorical_drift(df, "lang", min_rows=10).collect()
    assert len(got) == 2
    assert all(r.psi == r.psi and abs(r.psi) < 1e9 for r in got)  # finite
    assert all(r.drifted for r in got)  # two disjoint windows → both drifted


def test_psi_drift_identical_distributions(spark):
    from gbif_data_validator_spark.operators.drift import psi_drift

    df = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    rows = psi_drift(df, df, "v", lo=0.0, hi=100.0, n_buckets=10).collect()
    # identical samples: every term 0, psi 0, full bucket accounting
    assert all(r.term == 0.0 for r in rows)
    assert all(r.psi == 0.0 for r in rows)
    assert sum(r.n_ref for r in rows) == 1000


def test_psi_drift_detects_shift_and_attributes_bucket(spark):
    from gbif_data_validator_spark.operators.drift import psi_drift

    ref = spark.createDataFrame([(10.0,)] * 90 + [(90.0,)] * 10, "v double")
    cur = spark.createDataFrame([(10.0,)] * 10 + [(90.0,)] * 90, "v double")
    rows = {r.bucket: r for r in psi_drift(ref, cur, "v", 0.0, 100.0, 10).collect()}
    psi = rows[2].psi
    assert psi > 0.25  # "drifted" by the standard rule of thumb
    # the mass moved between buckets 2 (=10.0) and 10 (=90.0): both attribute
    assert rows[2].term > 0 and rows[10].term > 0
    assert rows[2].n_ref == 90 and rows[2].n_cur == 10


def test_psi_drift_overflow_underflow_buckets(spark):
    from gbif_data_validator_spark.operators.drift import psi_drift

    ref = spark.createDataFrame([(-5.0,), (50.0,), (500.0,)], "v double")
    cur = spark.createDataFrame([(50.0,), (50.0,), (50.0,)], "v double")
    got = {r.bucket: (r.n_ref, r.n_cur)
           for r in psi_drift(ref, cur, "v", 0.0, 100.0, 10).collect()}
    # nothing silently dropped: underflow → 0, overflow → n_buckets+1
    assert got[0] == (1, 0) and got[11] == (1, 0) and got[6] == (1, 3)


def test_psi_drift_rejects_degenerate_envelope(spark):
    """A constant/all-NULL reference has no bucketable envelope — raise,
    never emit NaN buckets."""
    import pytest

    from gbif_data_validator_spark.operators.drift import (
        psi_drift,
        psi_from_sketches,
    )

    df = spark.createDataFrame([(1.0,), (1.0,)], "v double")
    with pytest.raises(ValueError, match="hi > lo"):
        psi_drift(df, df, "v", lo=5.0, hi=5.0)
    with pytest.raises(ValueError, match="hi > lo"):
        psi_from_sketches((2, [1.0]), (2, [1.0]), lo=5.0, hi=2.0)


def test_js_divergence_known_values_and_bounds(spark):
    import math

    from gbif_data_validator_spark.operators.drift import js_divergence

    mk = lambda vals: spark.createDataFrame([(v,) for v in vals], "c string")
    # identical distributions -> 0
    same = js_divergence(mk(["a", "a", "b"]), mk(["a", "a", "b"]), "c").collect()[0]
    assert same.value == 0.0 and same.n_values == 2
    # disjoint supports -> ln 2 (the JSD maximum; KL would be infinite)
    dis = js_divergence(mk(["a", "a"]), mk(["b", "b", "b"]), "c").collect()[0]
    assert dis.value == round(math.log(2), 6)
    assert (dis.n_a, dis.n_b, dis.n_values) == (2, 3, 2)
    # hand-computed asymmetric case: P = {a:1}, Q = {a:.5, b:.5}
    expect = 0.5 * math.log(1 / 0.75) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    )
    got = js_divergence(mk(["a", "a"]), mk(["a", "b"]), "c").collect()[0]
    assert got.value == round(expect, 6)


def test_js_divergence_partitioning_invariant_and_guarded(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.drift import js_divergence

    a = spark.range(0, 2000).select((F.col("id") % 13).cast("string").alias("c"))
    b = spark.range(0, 3000).select((F.col("id") % 17).cast("string").alias("c"))
    v1 = js_divergence(a, b, "c").collect()[0].value
    v2 = js_divergence(a.repartition(11), b.repartition(3), "c").collect()[0].value
    assert v1 == v2 > 0
    with _pytest.raises(ValueError, match="js_divergence"):
        js_divergence(
            spark.range(0, 1000).select(F.col("id").cast("string").alias("c")),
            b, "c", max_groups=10,
        )


def test_chisq_drift_known_value_and_dof(spark):
    from gbif_data_validator_spark.operators.drift import chisq_drift

    mk = lambda vals: spark.createDataFrame([(v,) for v in vals], "c string")
    # identical distributions -> 0 statistic
    same = chisq_drift(mk(["a", "a", "b"]), mk(["a", "a", "b"]), "c").collect()[0]
    assert same.value == 0.0 and same.dof == 1
    # hand-computed 2x2: A = {a:3, b:1}, B = {a:1, b:3}; N=8, col totals 4/4
    # e = 2 everywhere -> chi2 = 4 * (1^2 / 2) = 2.0
    got = chisq_drift(mk(["a"] * 3 + ["b"]), mk(["a"] + ["b"] * 3), "c").collect()[0]
    assert (got.value, got.dof, got.n_a, got.n_b, got.n_values) == (2.0, 1, 4, 4, 2)


def test_chisq_drift_empty_side_null_and_invariance(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.drift import chisq_drift

    a = spark.range(0, 2000).select((F.col("id") % 13).cast("string").alias("c"))
    b = spark.range(0, 3000).select((F.col("id") % 17).cast("string").alias("c"))
    v1 = chisq_drift(a, b, "c").collect()[0].value
    v2 = chisq_drift(a.repartition(11), b.repartition(3), "c").collect()[0].value
    assert v1 == v2 > 0
    # one side empty -> NULL statistic, no division blow-up
    empty = spark.createDataFrame([], "c string")
    row = chisq_drift(a, empty, "c").collect()[0]
    assert row.value is None and row.n_b == 0
    with _pytest.raises(ValueError, match="chisq_drift"):
        chisq_drift(
            spark.range(0, 1000).select(F.col("id").cast("string").alias("c")),
            b, "c", max_groups=10,
        )


def test_emd_drift_identical_distributions(spark):
    from gbif_data_validator_spark.operators.drift import emd_drift

    df = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    rows = emd_drift(df, df, "v", lo=0.0, hi=100.0, n_buckets=10).collect()
    assert all(r.term == 0.0 for r in rows)
    assert all(r.emd == 0.0 for r in rows)
    assert sum(r.n_ref for r in rows) == 1000


def test_emd_drift_exact_transport_value(spark):
    """0.8 mass moved 80 value-units -> W1 = 64 exactly on the grid."""
    from gbif_data_validator_spark.operators.drift import emd_drift

    ref = spark.createDataFrame([(10.0,)] * 90 + [(90.0,)] * 10, "v double")
    cur = spark.createDataFrame([(10.0,)] * 10 + [(90.0,)] * 90, "v double")
    rows = {r.bucket: r for r in emd_drift(ref, cur, "v", 0.0, 100.0, 10).collect()}
    assert rows[0].emd == 64.0
    # transport crosses every edge between bucket 2 and bucket 10
    assert all(rows[b].term == 8.0 for b in range(2, 10))
    assert rows[0].term == rows[1].term == rows[10].term == rows[11].term == 0.0


def test_emd_drift_dense_spine_counts_empty_buckets(spark):
    """Interior buckets empty in BOTH samples still carry transport — the
    spine keeps them; a sparse join would silently skip 90% of the W1."""
    from gbif_data_validator_spark.operators.drift import emd_drift

    ref = spark.createDataFrame([(5.0,)] * 50, "v double")
    cur = spark.createDataFrame([(95.0,)] * 50, "v double")
    rows = sorted(emd_drift(ref, cur, "v", 0.0, 100.0, 10).collect(),
                  key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(12))  # all 12 present
    assert rows[0].emd == 90.0  # full mass moved 90 units
    assert all(r.term == 10.0 for r in rows if 1 <= r.bucket <= 9)


def test_emd_drift_distance_weighting_vs_psi(spark):
    """The family rationale: same amount of mass moved, FARTHER -> bigger
    EMD, while PSI can't tell the two apart (same bucket-pair log terms)."""
    from gbif_data_validator_spark.operators.drift import emd_drift

    ref = spark.createDataFrame([(5.0,)] * 100, "v double")
    near = spark.createDataFrame([(15.0,)] * 100, "v double")
    far = spark.createDataFrame([(95.0,)] * 100, "v double")
    e_near = emd_drift(ref, near, "v", 0.0, 100.0, 10).collect()[0].emd
    e_far = emd_drift(ref, far, "v", 0.0, 100.0, 10).collect()[0].emd
    assert e_near == 10.0 and e_far == 90.0 and e_far > e_near


def test_emd_drift_overflow_underflow_and_envelope_guard(spark):
    import pytest as _pytest

    from gbif_data_validator_spark.operators.drift import emd_drift

    ref = spark.createDataFrame([(-5.0,), (50.0,), (500.0,)], "v double")
    cur = spark.createDataFrame([(50.0,), (50.0,), (50.0,)], "v double")
    got = {r.bucket: (r.n_ref, r.n_cur)
           for r in emd_drift(ref, cur, "v", 0.0, 100.0, 10).collect()}
    assert got[0] == (1, 0) and got[11] == (1, 0) and got[6] == (1, 3)
    with _pytest.raises(ValueError, match="emd_drift"):
        emd_drift(ref, cur, "v", lo=5.0, hi=5.0)


def test_emd_drift_partition_invariance(spark):
    from pyspark.sql import functions as F

    from gbif_data_validator_spark.operators.drift import emd_drift

    a = spark.range(0, 5000).select((F.col("id") % 97).cast("double").alias("v"))
    b = spark.range(0, 7000).select(((F.col("id") * 7) % 89).cast("double").alias("v"))
    v1 = emd_drift(a, b, "v", 0.0, 100.0, 10).collect()[0].emd
    v2 = emd_drift(a.repartition(13), b.repartition(5), "v", 0.0, 100.0, 10).collect()[0].emd
    assert v1 == v2 > 0
