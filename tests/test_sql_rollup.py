"""Grouping-sets rollup and the spark.sql SQL surface."""

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark import registry


def test_rollup_levels_are_consistent(spark, sf_dir):
    out = registry.QUERIES["rollup_nation_year"](spark, sf_dir).collect()
    detail = [r for r in out if r["gid"] == 0]
    subtotal = {r["nation"]: r for r in out if r["gid"] == 1}
    grand = [r for r in out if r["gid"] == 3]
    assert len(grand) == 1 and grand[0]["nation"] is None and grand[0]["o_year"] is None
    # each nation subtotal equals the sum of its detail rows
    for nation, sub in subtotal.items():
        rows = [r for r in detail if r["nation"] == nation]
        assert sub["n_orders"] == sum(r["n_orders"] for r in rows)
        assert abs(sub["revenue"] - round(sum(r["revenue"] for r in rows), 2)) < 0.02
    # grand total equals sum of subtotals
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in subtotal.values())


def test_rollup_is_single_expand_aggregate(spark, sf_dir):
    plan = (
        registry.QUERIES["rollup_nation_year"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # rollup must compile to Expand + one aggregate, not per-level re-scans
    assert plan.count("Expand") >= 1
    assert plan.count("FileScan parquet") <= 3  # orders + 2 dims, scanned once


def test_sql_surface_top_order(spark, sf_dir):
    out = registry.QUERIES["sql_top_order_per_customer"](spark, sf_dir)
    rows = out.collect()
    # exactly one row per customer appearing in orders
    custs = [r["o_custkey"] for r in rows]
    assert len(custs) == len(set(custs))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert len(custs) == orders.select("o_custkey").distinct().count()
    # and it is that customer's max price (ties broken by smallest orderkey)
    mx = {
        r["o_custkey"]: r["mx"]
        for r in orders.groupBy("o_custkey").agg(F.max("o_totalprice").alias("mx")).collect()
    }
    assert all(abs(r["o_totalprice"] - mx[r["o_custkey"]]) < 1e-9 for r in rows)
