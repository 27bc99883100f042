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
    # round-5 additions
    "chunk_dedup_profile",
    "snapshot_diff_report",
    "bucket_balanced_sample",
    # round-6 additions
    "snapshot_provenance",
    "etl_audit_report",
    # round-7 additions
    "ann_multitable_topk",
    "ivf_lloyd_topk",
    "embedding_near_dup_bucketed",
    "int8_cosine_topk",
    "apply_mixture_sample",
    "large_volume_customers",
    "calibration_bins",
    # round-8 additions. The three *_index_topk queries serve from an
    # on-disk artifact built once per (sf_dir, knobs): their FIRST repeat
    # pays the build (SCALING.md §2f — commit-bound, e.g. multitable's
    # 2,541-directory write) and shows up as a cold outlier in
    # "repeats"; the median is the warm serve path, which is the number
    # that models build-once/serve-many production use.
    "vector_index_topk",
    "ann_multiprobe_topk",
    "multitable_index_topk",
    "ivf_index_topk",
    "semantic_dedup_ivf",
    "cda_probe",
    "salted_join_revenue",
    "medallion_silver_scan",
    "duplicate_spans",
    "local_supplier_volume",
    # round-9 additions
    "duplicate_span_cut",
    "bloom_screen_decisions",
    "heavy_hitter_tokens",
    "bm25_topk",
    "hybrid_rrf_topk",
    "bigram_surprisal",
    "repetition_profile",
    "volume_shipping",
    "returned_item_report",
    # round-9 third-session additions: PQ serving (fit+encode+ADC each
    # run — the in-memory twin of a build-once artifact, like
    # ann_multiprobe_topk) and the Q8/Q13 join-order shapes
    "pq_adc_topk",
    "ivf_pq_topk",
    "ivfpq_index_topk",
    "market_share",
    "customer_order_distribution",
    "sole_return_supplier",
    # round-11 additions: the last reference analytics module, the TPC-H
    # Q2/Q20 shapes, the split-trained trigram backoff LM
    "temporal_instability_scores",
    "min_cost_supplier",
    "excess_shipment_suppliers",
    "trigram_surprisal",
    "decontaminate_fuzzy",
    "nation_profit_share",
    "dsir_select_topk",
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

    # Each query is timed five times and the MEDIAN recorded: the host VM
    # shows sporadic multi-second CPU-steal stalls (SCALING.md §2 note;
    # r03's minhash 10.5 s was such noise, and r05 measured single-process
    # repeat spreads of 2.3-9.3 s on the same query), so the median must
    # survive up to two stalled repeats. The per-repeat spread is emitted
    # alongside so a noisy box is visible in the record itself.
    timings: dict[str, float] = {}
    repeats: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(5):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            # drop persisted intermediates so reruns don't hit caches
            spark.catalog.clearCache()
        repeats[name] = runs
        timings[name] = sorted(runs)[2]

    total = round(sum(timings.values()), 3)
    # the per-query min is the host's noise floor: on a stall-free box
    # median ~= min, and a large median/min gap flags CPU steal rather
    # than a code regression
    mins = {k: min(v) for k, v in repeats.items()}
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    record = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "repeats": repeats,
        "mins": mins,
        "min_total": round(sum(mins.values()), 3),
        "sf": sf_val,
    }
    # The full record (with per-repeat spreads and mins) outgrew the
    # driver's 2000-char stdout tail, which made past BENCH artifacts
    # non-reproducible (r10 advice). Persist it whole to a sidecar file
    # and keep the stdout line compact: the driver-required fields plus
    # min_total (the noise-floor headline ratios are computed from).
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(full_path, "w") as f:
        json.dump(record, f)
    # stdout medians at 2dp: the driver keeps only a 2000-char stdout
    # tail, and at 3dp the 64-query line already measures ~1950 chars —
    # full 3dp precision lives in BENCH_FULL.json
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in timings.items()},
                "min_total": record["min_total"],
                "sf": sf_val,
                "full_record": "BENCH_FULL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
