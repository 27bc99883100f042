"""Window operators (W1-W9) on hand-built frames."""

import datetime as dt

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import windows


def _series(spark, vals, start="2024-01-01"):
    rows = [
        ((dt.date.fromisoformat(start) + dt.timedelta(days=i)).isoformat(), v)
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, "date string, v double").withColumn(
        "date", F.col("date").cast("date")
    )


def test_rolling_mean_min_periods_1(spark):
    df = _series(spark, [1.0, 2.0, 3.0, 4.0])
    out = windows.rolling_mean(df, "date", ["v"], window=3).orderBy("date").collect()
    assert [r["v_roll3"] for r in out] == [1.0, 1.5, 2.0, 3.0]


def test_global_zscore_constant_column_is_zero(spark):
    df = _series(spark, [5.0, 5.0, 5.0])
    out = windows.global_zscore(df, ["v"]).collect()
    assert all(r["z_v"] == 0.0 for r in out)


def test_rolling_corr_perfect_and_constant(spark):
    df = _series(spark, [1.0, 2.0, 3.0, 4.0]).withColumn("w", F.col("v") * 2 + 1)
    out = windows.rolling_corr(df, "date", "v", "w", window=3).orderBy("date").collect()
    assert out[0]["corr_v_w"] is None  # single row window: std 0
    assert out[2]["corr_v_w"] == 1.0
    const = _series(spark, [1.0, 2.0, 3.0]).withColumn("w", F.lit(7.0))
    out2 = windows.rolling_corr(const, "date", "v", "w", window=3).collect()
    assert all(r["corr_v_w"] is None for r in out2)


def test_forward_fill(spark):
    df = _series(spark, [1.0, None, None, 4.0, None])
    out = windows.forward_fill(df, "date", ["v"]).orderBy("date").collect()
    assert [r["v"] for r in out] == [1.0, 1.0, 1.0, 4.0, 4.0]


def test_linear_interpolate_gap_and_edges(spark):
    df = _series(spark, [None, 2.0, None, None, 8.0, None])
    out = windows.linear_interpolate(df, "date", "v").orderBy("date").collect()
    assert [r["v_interp"] for r in out] == [2.0, 2.0, 4.0, 6.0, 8.0, 8.0]


def test_gaps_and_islands_month_and_gap_triggers(spark):
    dates = ["2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02",
             "2024-02-05", "2024-02-06"]
    df = spark.createDataFrame([(d, 0.0) for d in dates], "date string, v double").withColumn(
        "date", F.col("date").cast("date")
    )
    seg = windows.gaps_and_islands(df, "date", max_gap_days=1)
    ids = {r["date"].isoformat(): r["segment_id"] for r in seg.collect()}
    assert ids["2024-01-30"] == 1 and ids["2024-01-31"] == 1
    assert ids["2024-02-01"] == 2 and ids["2024-02-02"] == 2  # month break
    assert ids["2024-02-05"] == 3 and ids["2024-02-06"] == 3  # gap > 1d
    summ = {r["segment_id"]: r for r in windows.segment_summary(seg).collect()}
    assert summ[2]["n_days"] == 2 and summ[2]["duration_days"] == 2


def test_sessionize_gap_rule(spark):
    rows = [
        ("2024-01-01 10:00:00", 1),
        ("2024-01-01 10:10:00", 1),
        ("2024-01-01 11:00:00", 1),  # 50 min gap -> new session
        ("2024-01-01 10:00:00", 2),
    ]
    df = spark.createDataFrame(rows, "ts string, user_id int").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = windows.sessionize(df, "ts", "user_id", gap_minutes=30)
    u1 = [r["session_id"] for r in out.filter("user_id=1").orderBy("ts").collect()]
    assert u1 == [1, 1, 2]
    assert out.filter("user_id=2").collect()[0]["session_id"] == 1


def test_lag_baseline(spark):
    df = _series(spark, [1.0, 2.0, 3.0])
    out = windows.lag_baseline(df, "date", "v").orderBy("date").collect()
    assert [r["v_pred"] for r in out] == [None, 1.0, 2.0]


def test_sliding_sequences_drops_short_history(spark):
    df = _series(spark, [float(i) for i in range(5)])
    out = windows.sliding_sequences(df, "date", "v", seq_len=3).orderBy("date").collect()
    assert len(out) == 3
    assert out[0]["sequence"] == [0.0, 1.0, 2.0]
    assert out[-1]["sequence"] == [2.0, 3.0, 4.0]
