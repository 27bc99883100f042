"""Structured Streaming surfaces validated against their batch twins."""

import datetime as dt

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import daily
from practicum2_nof1_adhd_bd_spark.streaming import daily_stats_stream, sessionize_stream

ROWS = [
    ("2024-01-01 01:00:00", 1, 10.0),
    ("2024-01-01 02:00:00", 1, 20.0),
    ("2024-01-01 02:10:00", 2, 5.0),
    ("2024-01-02 09:00:00", 1, 30.0),
    ("2024-01-02 09:15:00", 1, 40.0),
]
SCHEMA = "ts timestamp, user_id int, value double"


def _write_source(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    batch = spark.createDataFrame(
        [(dt.datetime.fromisoformat(t), u, v) for t, u, v in ROWS], SCHEMA
    )
    batch.write.mode("overwrite").parquet(src)
    return src, batch


def _run_stream(spark, stream_df, name, tmp_path):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_daily_stats_stream_matches_batch(spark, tmp_path):
    src, batch = _write_source(spark, tmp_path)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = _run_stream(spark, daily_stats_stream(stream), "daily_stream_t", tmp_path)
    got = {r["date"]: r for r in out.collect()}
    want = {r["date"]: r for r in daily.daily_stats(batch).collect()}
    assert set(got) == set(want)
    for d in want:
        for c in ("n_events", "value_mean", "value_min", "value_max", "value_std"):
            assert got[d][c] == want[d][c], (d, c)


def test_sessionize_stream_gap_rule(spark, tmp_path):
    src, _ = _write_source(spark, tmp_path)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = _run_stream(
        spark, sessionize_stream(stream, gap="30 minutes"), "sess_stream_t", tmp_path
    )
    rows = out.collect()
    u1 = sorted(
        [r for r in rows if r["user_id"] == 1], key=lambda r: r["session_start"]
    )
    # user 1: (01:00, 02:00 within 60min gap? no — 60 > 30 -> two sessions on day1)
    # then day2 (09:00, 09:15) one session
    assert len(u1) == 3
    assert u1[0]["n_events"] == 1 and u1[1]["n_events"] == 1
    assert u1[2]["n_events"] == 2 and u1[2]["value_sum"] == 70.0
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 1
