"""Drift detection (KS, ADWIN) and per-segment imputation."""

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import drift, impute


def test_ks_identical_samples_zero(spark):
    rows = [(float(v), g) for v in range(10) for g in (0, 1)]
    df = spark.createDataFrame(rows, "v double, g int")
    out = drift.ks_statistic(df, "v", "g").collect()[0]
    assert out["ks_stat"] == 0.0


def test_ks_disjoint_samples_one(spark):
    rows = [(float(v), 1) for v in range(10)] + [(float(v + 100), 0) for v in range(10)]
    df = spark.createDataFrame(rows, "v double, g int")
    out = drift.ks_statistic(df, "v", "g").collect()[0]
    assert out["ks_stat"] == 1.0


def test_ks_known_half_shift(spark):
    # A = {1..10}, B = {6..15}: max CDF gap = 0.5 at value 5/10 boundary
    rows = [(float(v), 1) for v in range(1, 11)] + [(float(v), 0) for v in range(6, 16)]
    df = spark.createDataFrame(rows, "v double, g int")
    out = drift.ks_statistic(df, "v", "g").collect()[0]
    assert out["ks_stat"] == 0.5


def test_adwin_detects_mean_shift(spark):
    vals = [10.0 + (i % 3) * 0.1 for i in range(60)] + [
        50.0 + (i % 3) * 0.1 for i in range(60)
    ]
    rows = [("g", f"{i:04d}", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "grp string, idx string, v double")
    out = drift.adwin_changes(df, "idx", "v", ["grp"], delta=0.002).collect()
    assert len(out) >= 1
    first = min(int(r["change_index"]) for r in out)
    assert 60 <= first <= 90  # detected shortly after the shift at i=60


def test_impute_per_segment_fills_all_nulls(spark):
    rows = []
    # segment 1: y ~ 2x, one missing y; big enough for iterative path
    for i in range(10):
        rows.append((1, float(i), float(2 * i) if i != 5 else None))
    # segment 2: too small -> global median fallback
    rows.append((2, 1.0, None))
    df = spark.createDataFrame(rows, "segment_id int, x double, y double")
    out = impute.impute_per_segment(df, ["x", "y"], min_rows=5)
    rows_out = out.collect()
    assert all(r["y"] is not None for r in rows_out)
    seg1 = {r["x"]: r["y"] for r in rows_out if r["segment_id"] == 1}
    assert abs(seg1[5.0] - 10.0) < 0.5  # recovered y ~= 2x
    seg2 = [r["y"] for r in rows_out if r["segment_id"] == 2][0]
    assert seg2 is not None  # global median fallback applied


def test_impute_deterministic_across_runs(spark):
    rows = [(1, float(i), float(3 * i + 1) if i % 4 else None) for i in range(12)]
    df = spark.createDataFrame(rows, "segment_id int, x double, y double")
    a = sorted(map(str, impute.impute_per_segment(df, ["x", "y"]).collect()))
    b = sorted(map(str, impute.impute_per_segment(df, ["x", "y"]).collect()))
    assert a == b
