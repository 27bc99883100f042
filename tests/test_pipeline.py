"""Medallion lifecycle tests — layer materialization + re-entrancy."""

import os

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark import pipeline
from practicum2_nof1_adhd_bd_spark.operators import joins


def test_medallion_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lake")
    paths = pipeline.run_medallion(spark, sf_dir, out)
    assert set(paths) == {"bronze", "silver", "unified", "labeled", "segments"}
    for p in paths.values():
        assert os.path.isdir(p), p

    bronze = spark.read.parquet(paths["bronze"])
    assert "event_date" in bronze.columns  # partition column survives
    labeled = spark.read.parquet(paths["labeled"])
    assert "pbsi_score" in labeled.columns and "label_3cls" in labeled.columns
    assert labeled.filter(F.col("label_3cls").isNull()).count() == 0
    # quantile labels: both extremes occupied
    classes = {r["label_3cls"] for r in labeled.select("label_3cls").distinct().collect()}
    assert {-1, 1} <= classes

    segs = spark.read.parquet(paths["segments"])
    assert segs.count() >= 1
    # re-entrancy: gold can be rebuilt from silver alone, identically
    gold2 = pipeline.build_gold(spark, paths["silver"], str(tmp_path / "lake2"))
    l2 = spark.read.parquet(gold2["labeled"])
    assert sorted(map(str, l2.collect())) == sorted(map(str, labeled.collect()))


def test_bronze_partition_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "lake")
    bronze_path = pipeline.build_bronze(spark, sf_dir, out)
    bronze = spark.read.parquet(bronze_path)
    plan = (
        bronze.filter(F.col("event_date") == "2024-01-05")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the date filter must reach the scan as a partition filter
    assert "PartitionFilters: [" in plan
    assert "event_date" in plan.split("PartitionFilters")[1][:200]


def test_asof_latest(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10.0),
        (1, "2024-01-05 00:00:00", 20.0),
        (1, "2024-01-25 00:00:00", 99.0),  # after cutoff
        (2, "2024-01-03 00:00:00", 7.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        r["user_id"]: r
        for r in joins.asof_latest(
            df, ["user_id"], "ts", F.lit("2024-01-20 00:00:00").cast("timestamp")
        ).collect()
    }
    assert out[1]["value_at"] == 20.0  # post-cutoff row excluded
    assert out[2]["value_at"] == 7.0


def test_training_shards_token_balanced(spark, tmp_path):
    from practicum2_nof1_adhd_bd_spark.pipeline import write_training_shards

    # skewed doc lengths: a few giants + many small docs
    rows = [(i, "w " * (500 if i % 20 == 0 else 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = write_training_shards(df, str(tmp_path), n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 200
    per = {
        r["shard"]: r["tok"]
        for r in back.groupBy("shard")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("tok"))
        .collect()
    }
    assert set(per) == {0, 1, 2, 3}
    total = sum(per.values())
    # every shard within 2x of the ideal quarter despite 50x length skew
    assert all(abs(v - total / 4) < total / 8 for v in per.values())


def test_pipeline_report_sections(spark, sf_dir):
    from practicum2_nof1_adhd_bd_spark.registry import QUERIES

    out = QUERIES["pipeline_report"](spark, sf_dir).collect()
    by = {(r["section"], r["metric"]): r["value"] for r in out}
    n_days = by[("data_summary", "n_days")]
    assert n_days > 0
    assert by[("data_summary", "span_days")] >= n_days
    # coverage percentages are bounded and consistent with day counts
    for (sec, met), v in by.items():
        if sec == "coverage" and met.startswith("pct_"):
            assert 0.0 <= v <= 100.0
            days = by[("coverage", "days_with_" + met[4:])]
            assert abs(v - round(days * 100.0 / n_days, 6)) < 1e-9
    # label distribution covers all labeled days and pcts sum to ~100
    counts = [v for (s, m), v in by.items()
              if s == "label_dist" and m.startswith("class_") and "pct" not in m]
    pcts = [v for (s, m), v in by.items() if s == "label_dist" and "pct" in m]
    assert sum(counts) == n_days  # every day gets a label in the pbsi chain
    assert abs(sum(pcts) - 100.0) < 1e-3
    # range section: min <= avg <= max
    assert (
        by[("error_range", "daily_mean_min")]
        <= by[("error_range", "daily_mean_avg")]
        <= by[("error_range", "daily_mean_max")]
    )


def test_cli_list_run_audit(spark, sf_dir, capsys, tmp_path):
    """§3.2-3.3 CLI surface: list filters, run prints/writes, audit exits
    with the severity code (reference's make qc-* contract)."""
    from practicum2_nof1_adhd_bd_spark.__main__ import main

    assert main(["list", "daily_event"]) == 0
    out = capsys.readouterr().out
    assert "daily_event_stats\toracle" in out

    assert main(["run", "daily_event_stats", "--sf-dir", sf_dir, "--limit", "3"]) == 0
    assert "value_mean" in capsys.readouterr().out

    dest = str(tmp_path / "out")
    assert main(["run", "dedup_by_key", "--sf-dir", sf_dir, "--out", dest]) == 0
    assert spark.read.parquet(dest).count() > 0

    assert main(["run", "no_such_query"]) == 2

    rc = main(["audit", "--sf-dir", sf_dir])
    rep = capsys.readouterr().out
    assert "hour_coverage_pct" in rep
    assert rc in (0, 1, 2)
