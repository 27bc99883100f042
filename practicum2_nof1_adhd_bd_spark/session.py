"""SparkSession factory with scale-oriented defaults.

The engine targets a large multi-executor cluster (the reference is
single-node pandas; see BASELINE.md). Defaults here are chosen so the same
logical plans survive a 100x scale-up:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting).
- Arrow on (any Pandas-UDF escape hatch pays batch transfer, not per-row).
- Session timezone pinned to UTC so date truncation is deterministic and
  matches the DuckDB oracle (naive timestamps interpreted identically).
- shuffle partitions default to the local core count; on a real cluster this
  is expected to be overridden (or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # Exact, stable broadcast threshold; small dims (region/nation/daily
    # scalar frames) broadcast, big tables never do.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Keep plans in whole-stage codegen as much as possible.
    "spark.sql.codegen.wholeStage": "true",
    # The generated-class cache defaults to 100 entries JVM-wide; a
    # multi-query session (the 100+-query bench, a long-lived serving
    # session) thrashes it, so every re-execution of an
    # expression-heavy stage pays janino recompilation + a fresh C2
    # warm-up (r15 measured: the 80-aggregate LSH bucket pass decays
    # 3.2 s -> 0.5 s once its class survives between executions, and
    # re-timing at suite END was SLOWER than mid-suite because the
    # class had been evicted again). 10x the cache: generated classes
    # are small; the recompile tax is not.
    "spark.sql.codegen.cache.maxEntries": "1000",
    "spark.sql.parquet.filterPushdown": "true",
    # Testdata events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
    # type, so read as long and convert in the Catalog layer.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # local[32] runs all executor threads in the driver JVM; higher-order
    # array expressions are allocation-heavy, so give the collector room
    # (the host has 128 GiB; override via SPARK_GRAFT_DRIVER_MEM).
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    # PySpark 4 captures the Python call site on EVERY DataFrame/Column
    # API call when this is on (the default) — one extra JVM round-trip
    # per operator, which r13 profiling measured as a material share of
    # driver-side plan-build latency on expression-heavy queries
    # (ann_multiprobe_topk's 80-agg bucket pass). The engine's
    # error-handling does not rely on Python-side call-site origins, so
    # trade the debug breadcrumbs for dispatch latency. (The driver's
    # bare-session oracle gate keeps the Spark default.)
    "spark.python.sql.dataFrameDebugging.enabled": "false",
}


def get_spark(
    app_name: str = "practicum2-nof1-spark",
    master: str | None = None,
    **conf_overrides: str,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster callers pass nothing and spark-submit supplies the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf.update({k: str(v) for k, v in conf_overrides.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
