"""Bucketed co-located join — the shuffle-elimination path for repeated
big-big joins (SURVEY §4 'partition by participant, cluster by date')."""

from pyspark.sql import functions as F


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    fact = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    dim = spark.range(0, 10000, 2).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    try:
        for name, df in (("bt_fact", fact), ("bt_dim", dim)):
            (
                df.write.mode("overwrite")
                .option("path", str(tmp_path / name))
                .bucketBy(8, "k")
                .sortBy("k")
                .saveAsTable(name)
            )
        t1, t2 = spark.table("bt_fact"), spark.table("bt_dim")
        joined = t1.hint("merge").join(t2, "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # bucketing on both sides satisfies the join distribution: the only
        # acceptable plan has NO shuffle exchange
        assert "Exchange hashpartitioning" not in plan, plan[:1500]
        assert joined.count() == 5000
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_fact")
        spark.sql("DROP TABLE IF EXISTS bt_dim")
