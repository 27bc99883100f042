"""Join operators (J1-J9) and set ops on hand-built daily frames."""

import datetime as dt

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import joins


def _daily(spark, rows):
    return spark.createDataFrame(rows, "date string, v double").withColumn(
        "date", F.col("date").cast("date")
    )


def test_date_spine_and_left_join(spark):
    a = _daily(spark, [("2024-01-01", 1.0), ("2024-01-03", 3.0)])
    b = _daily(spark, [("2024-01-02", 2.0)]).withColumnRenamed("v", "w")
    spine = joins.date_spine([a, b])
    assert spine.count() == 3
    out = joins.spine_left_join(spine, [a, b]).orderBy("date").collect()
    assert [r["v"] for r in out] == [1.0, None, 3.0]
    assert [r["w"] for r in out] == [None, 2.0, None]


def test_coalescing_merge_prefers_first_vendor(spark):
    apple = _daily(spark, [("2024-01-01", 10.0), ("2024-01-02", 20.0)])
    zepp = _daily(spark, [("2024-01-02", 99.0), ("2024-01-03", 30.0)])
    out = {r["date"]: r["v"] for r in joins.coalescing_merge(apple, zepp).collect()}
    assert out[dt.date(2024, 1, 2)] == 20.0  # apple wins
    assert out[dt.date(2024, 1, 3)] == 30.0  # zepp fills the gap


def test_union_fusion_mean_vs_sum(spark):
    a = _daily(spark, [("2024-01-01", 10.0)])
    b = _daily(spark, [("2024-01-01", 30.0)])
    mean = joins.union_fusion_mean([a, b], "date", ["v"]).collect()[0]["v"]
    total = joins.union_fusion_sum([a, b], "date", ["v"]).collect()[0]["v"]
    assert mean == 20.0 and total == 40.0


def test_nway_outer_merge_preserves_all_dates(spark):
    a = _daily(spark, [("2024-01-01", 1.0)]).withColumnRenamed("v", "va")
    b = _daily(spark, [("2024-01-02", 2.0)]).withColumnRenamed("v", "vb")
    c = _daily(spark, [("2024-01-03", 3.0)]).withColumnRenamed("v", "vc")
    out = joins.nway_outer_merge([a, b, c])
    assert out.count() == 3
    row = {r["date"]: r for r in out.collect()}[dt.date(2024, 1, 2)]
    assert row["va"] is None and row["vb"] == 2.0 and row["vc"] is None


def test_boundary_range_join_sides(spark):
    df = _daily(
        spark,
        [("2024-01-0%d" % d, float(d)) for d in range(1, 10)],
    )
    bounds = spark.createDataFrame([("2024-01-05",)], "b string").select(
        F.col("b").cast("date").alias("boundary")
    )
    out = joins.boundary_range_join(df, bounds, "date", "boundary", 3)
    sides = {(r["date"], r["side"]) for r in out.collect()}
    assert (dt.date(2024, 1, 2), "before") in sides
    assert (dt.date(2024, 1, 4), "before") in sides
    assert (dt.date(2024, 1, 5), "after") in sides
    assert (dt.date(2024, 1, 7), "after") in sides
    assert not any(r[0] == dt.date(2024, 1, 1) for r in sides)  # < b-3
    assert not any(r[0] == dt.date(2024, 1, 8) for r in sides)  # >= b+3


def test_point_in_interval_join(spark):
    df = _daily(spark, [("2024-01-05", 1.0), ("2024-01-15", 2.0), ("2024-02-20", 3.0)])
    iv = spark.createDataFrame(
        [("2024-01-01", "2024-01-10", "s1"), ("2024-01-11", "2024-01-31", "s2")],
        "start_date string, end_date string, seg string",
    ).select(
        F.col("start_date").cast("date"),
        F.col("end_date").cast("date"),
        "seg",
    )
    out = {r["date"]: r["seg"] for r in joins.point_in_interval_join(df, iv, "date").collect()}
    assert out[dt.date(2024, 1, 5)] == "s1"
    assert out[dt.date(2024, 1, 15)] == "s2"
    assert out[dt.date(2024, 2, 20)] is None  # left join keeps unmatched


def test_missing_days(spark):
    df = _daily(spark, [("2024-01-01", 1.0), ("2024-01-04", 4.0)])
    missing = sorted(r["date"] for r in joins.missing_days(df, "date").collect())
    assert missing == [dt.date(2024, 1, 2), dt.date(2024, 1, 3)]
