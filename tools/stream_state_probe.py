"""Stream-stream join STATE probe — reproduces SCALING.md §2r.

The attribution join's 100-TB claim is that watermark + event-time range
bound the join state at O(key-rate x (watermark + horizon)) instead of
O(stream length). This probe measures that directly from Spark's own
state-store metrics (`lastProgress.stateOperators[].numRowsTotal`): the
same clicks/purchases streams run twice with a short watermark —
once WITH the 2-hour horizon in the join condition (state evictable on
both sides), once with only the >= ordering (Spark accepts the join but
can never evict the click side, so its state grows with the stream).

availableNow + maxFilesPerTrigger splits the snapshot into many
micro-batches so the watermark actually advances mid-run and eviction
has a chance to happen — a single-batch run would show equal state for
both configs and prove nothing.

Prints one JSON line.

Usage: python tools/stream_state_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(spark, src: str, bounded: bool) -> dict:
    import time

    from pyspark.sql import functions as F

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    clicks = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", "1 hour")
        .alias("c")
    )
    purchases = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .alias("p")
    )
    cond = (F.col("c.user_id") == F.col("p.user_id")) & (
        F.col("p.ts") >= F.col("c.ts")
    )
    if bounded:
        cond = cond & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 2 HOURS"))
    joined = clicks.join(purchases, cond, "inner").select(
        F.col("c.event_id").alias("click_id"),
        F.col("p.event_id").alias("purchase_id"),
    )
    name = f"state_probe_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="spark_graft_stateprobe_")
    t0 = time.time()
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("state probe stream did not finish")
        state_rows = None
        n_batches = 0
        for prog in q.recentProgress:
            n_batches += 1
            ops = prog.get("stateOperators") or []
            for op in ops:
                if op.get("numRowsTotal") is not None:
                    state_rows = op["numRowsTotal"]
        n_out = spark.table(name).count()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "final_state_rows": state_rows,
        "matches": n_out,
        "batches_seen": n_batches,
        "sec": round(time.time() - t0, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from practicum2_nof1_adhd_bd_spark.session import get_spark
    from practicum2_nof1_adhd_bd_spark.sources.readers import Catalog

    spark = get_spark("stream-state-probe")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, args.sf_dir)
    src = os.path.join(tempfile.gettempdir(), "spark_graft_stateprobe_src")
    shutil.rmtree(src, ignore_errors=True)
    # sort by ts so file-order arrival roughly follows event time and the
    # watermark advances monotonically across micro-batches
    (
        cat.events.select("event_id", "ts", "user_id", "event_type")
        .repartitionByRange(32, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    out = {
        "sf_dir": args.sf_dir,
        "bounded": run_once(spark, src, bounded=True),
        "unbounded": run_once(spark, src, bounded=False),
    }
    b = out["bounded"]["final_state_rows"]
    u = out["unbounded"]["final_state_rows"]
    if b and u:
        out["state_reduction"] = round(1 - b / u, 4)
    print(json.dumps(out))
    shutil.rmtree(src, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
