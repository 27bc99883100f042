"""Crawl-frontier scale probe — reproduces SCALING.md §2s (mega-host
salted pre-rank) and the §2s streaming-wave row.

Two measurements, one JSON line:

- mega_host: 1M candidates with one host holding 90% (200 small hosts
  share the rest), 60 s horizon. Times the shipped salted-pre-rank
  crawl_frontier against an inline UNBOUNDED variant (single per-host
  rank window over the whole backlog) and asserts the schedules are
  IDENTICAL — the cap is exact, the win is the bounded per-task sort.
- stream_wave: seeds a parquet backlog at two depths (100k / 1M rows,
  200 hosts) and times one frontier_ingest.process_wave with 2k new
  candidates — wall should grow sublinearly (scan-bound) while emitted
  slots stay identical (horizon-bounded output).

Usage: python tools/frontier_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mega_host(spark) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls

    n = 1_000_000
    i = F.col("id")
    host = F.when(i % 10 != 0, F.lit("mega.com")).otherwise(
        F.concat(F.lit("h"), (i % 200).cast("string"), F.lit(".org"))
    )
    u = spark.range(n).select(
        F.concat(
            F.lit("http://"), host, F.lit("/p"), i.cast("string")
        ).alias("url"),
        ((i * 13) % 97).cast("int").alias("priority"),
    )
    robots = spark.createDataFrame(
        [(f"h{j}.org", "User-agent: *\nCrawl-delay: 3\n") for j in range(200)]
        + [("mega.com", "User-agent: *\nCrawl-delay: 1\n")],
        "host string, robots_txt string",
    )

    def unbounded(urls_df, robots_df, horizon_s):
        # the pre-r14 plan: ONE per-host rank window over the whole
        # backlog (a mega-host's candidates sort in a single task)
        delays = urls.crawl_delays(robots_df, "graftbot", 1.0)
        auth = F.regexp_extract(
            F.col("url"), r"^[A-Za-z]+://([^/?#]+)", 1
        )
        uu = urls_df.withColumn(
            "host",
            F.lower(
                F.regexp_replace(
                    F.regexp_replace(auth, r"^[^@]*@", ""), r":\d+$", ""
                )
            ),
        )
        j = uu.join(F.broadcast(delays), "host", "left").withColumn(
            "crawl_delay", F.coalesce("crawl_delay", F.lit(1.0))
        )
        w = Window.partitionBy("host").orderBy(
            F.col("priority").desc(), F.col("url")
        )
        return (
            j.withColumn("slot", F.row_number().over(w) - 1)
            .withColumn(
                "fetch_at_s",
                F.round(F.col("slot") * F.col("crawl_delay"), 6),
            )
            .filter(F.col("fetch_at_s") < horizon_s)
            .select(
                "host", "url", "priority", "slot", "crawl_delay",
                "fetch_at_s",
            )
        )

    out = {"n_candidates": n}
    results = {}
    for name, fn in (
        ("unbounded", unbounded),
        (
            "salted_cap",
            lambda a, b, h: urls.crawl_frontier(
                a, b, "graftbot", horizon_s=h
            ),
        ),
    ):
        best, rows = 1e9, None
        for _ in range(3):
            t0 = time.time()
            rows = sorted(map(tuple, fn(u, robots, 60.0).collect()))
            best = min(best, time.time() - t0)
        results[name] = rows
        out[f"{name}_wall_s"] = round(best, 2)
        out[f"{name}_slots"] = len(rows)
    assert results["unbounded"] == results["salted_cap"], (
        "salted pre-rank changed the schedule"
    )
    out["schedules_identical"] = True
    return out


def _stream_wave(spark) -> dict:
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.streaming import (
        frontier_ingest as fi,
    )

    delays = [(f"h{j}.org", 2.0) for j in range(200)]

    def cand(n, suffix=""):
        i = F.col("id")
        return spark.range(n).select(
            F.concat(
                F.lit("http://h"), (i % 200).cast("string"),
                F.lit(".org/p"), i.cast("string"), F.lit(suffix),
            ).alias("url"),
            ((i * 13) % 97).cast("int").alias("priority"),
        )

    out = {}
    for n in (100_000, 1_000_000):
        work = tempfile.mkdtemp(prefix="frontier_probe_")
        slots = os.path.join(work, "s")
        backlog = os.path.join(work, "b")
        cand(n).coalesce(4).write.parquet(f"{backlog}/state=0")
        new = cand(2000, "x")
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            fi.process_wave(
                spark, new, 1 + rep, delays, slots, backlog,
                horizon_s=60.0, keep_states=10,
            )
            best = min(best, time.time() - t0)
        emitted = spark.read.parquet(f"{slots}/batch=1").count()
        out[f"backlog_{n}"] = {
            "wave_wall_s": round(best, 2),
            "emitted_slots": emitted,
        }
    return out


def _depth(spark, n_waves: int = 120) -> dict:
    """r14 verdict #6: drive n_waves real waves (throttled host -> a
    backlog rides every state snapshot) and show per-wave wall stays
    FLAT with depth — the REPLACE-state design's claim is that wave N
    costs the same as wave 5 because it only ever reads state={N-1},
    never the history. Reports early/late per-wave medians and the max
    state-dir count observed (must be keep_states+1)."""
    import statistics

    from practicum2_nof1_adhd_bd_spark.streaming import (
        frontier_ingest as fi,
    )

    work = tempfile.mkdtemp(prefix="frontier_depth_")
    slots, backlog = os.path.join(work, "s"), os.path.join(work, "b")
    delays = [("slow.com", 4.0)]
    walls, max_dirs = [], 0
    for b in range(n_waves):
        wave = spark.createDataFrame(
            [(f"http://slow.com/w{b}_{j}", 5) for j in range(3)],
            "url string, priority int",
        )
        t0 = time.time()
        fi.process_wave(
            spark, wave, b, delays, slots, backlog,
            horizon_s=8.0, keep_states=2,
            compact_max_dirs=4, keep_last=2,
        )
        walls.append(time.time() - t0)
        max_dirs = max(max_dirs, len(fi._state_ids(spark, backlog)))
    return {
        "n_waves": n_waves,
        "early_median_s": round(statistics.median(walls[5:15]), 3),
        "late_median_s": round(statistics.median(walls[-15:-5]), 3),
        "max_state_dirs": max_dirs,
        "final_backlog_rows": fi.read_backlog(
            spark, backlog, n_waves
        ).count(),
    }


def main() -> None:
    from practicum2_nof1_adhd_bd_spark.session import get_spark

    spark = get_spark("frontier-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        json.dumps(
            {
                "mega_host": _mega_host(spark),
                "stream_wave": _stream_wave(spark),
                "depth": _depth(spark),
            }
        )
    )


if __name__ == "__main__":
    main()
