"""Sketch-prefilter probe — reproduces SCALING.md §2g.

Measures what the two r09 sketch prefilters actually avoid:

- Bloom screen (`bloom_screen_decisions`): fraction of batch hash-groups
  that test bloom-NEGATIVE (guaranteed new -> skip the anti-join
  entirely), plus the realized false-positive count among the positives.
- CMS heavy hitters (`heavy_hitter_tokens`): fraction of token
  OCCURRENCES whose CMS estimate clears the threshold (only these
  shuffle into the exact groupBy) and fraction of DISTINCT vocabulary
  surviving the prefilter vs the true heavy-hitter count.

Prints one JSON line.

Usage: python tools/sketch_probe.py [--sf-dir /root/testdata/sf0.1]
       [--min-count 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--min-count", type=int, default=100)
    ap.add_argument(
        "--synthetic",
        type=int,
        default=0,
        metavar="N_DOCS",
        help=(
            "instead of the testdata documents (whose fixture vocabulary "
            "is ~31 tokens, all heavy — degenerate for a sketch story), "
            "synthesize N docs with a head/tail split: 20 tokens per doc "
            "drawn from a 30-word head + 5 doc-unique tail tokens, and a "
            "batch where 20%% of docs repeat index content. This is the "
            "shape the prefilters exist for."
        ),
    )
    ap.add_argument(
        "--bloom-merge-partitions",
        type=int,
        default=0,
        metavar="P",
        help=(
            "probe the Bloom build's two-level OR merge: build the bitmap "
            "over P and 10*P input partitions, report per-run driver "
            "collect bytes (vs what a one-level merge would ship) and "
            "bitmap byte-equality across partitionings"
        ),
    )
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import dedup, textops
    from practicum2_nof1_adhd_bd_spark.session import get_spark
    from practicum2_nof1_adhd_bd_spark.sources.readers import Catalog

    spark = get_spark("sketch-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if args.bloom_merge_partitions:
        # Two-level merge probe: the bitmap must be byte-identical no
        # matter how the hash frame is partitioned, while driver collect
        # traffic stays capped at n_groups (<=32) bitmaps instead of one
        # per input partition.
        import time

        p = args.bloom_merge_partitions
        n_bits = 1 << 23
        hashes = spark.range(200_000).select(
            F.md5(F.col("id").cast("string")).alias("text_hash")
        )
        out = {"n_bits": n_bits, "runs": []}
        bitmaps = []
        for parts in (p, 10 * p):
            hf = hashes.repartition(parts)
            t0 = time.time()
            bm = dedup.bloom_bitmap_from_hashes(hf, n_bits=n_bits)
            sec = time.time() - t0
            n_groups = min(32, spark.sparkContext.defaultParallelism)
            out["runs"].append(
                {
                    "partitions": parts,
                    "build_sec": round(sec, 2),
                    "driver_collect_mb": round(
                        n_groups * n_bits / 8 / 1e6, 1
                    ),
                    "one_level_would_collect_mb": round(
                        parts * n_bits / 8 / 1e6, 1
                    ),
                }
            )
            bitmaps.append(bm)
        out["bitmaps_identical_across_partitionings"] = (
            bitmaps[0] == bitmaps[1]
        )
        print(json.dumps(out))
        return
    if args.synthetic:
        head_arr = F.array(*[F.lit(f"w{h}") for h in range(30)])
        # text is a pure function of the EFFECTIVE id: 1-in-5 batch docs
        # (id%50==0, given batch = id%10==0) take index doc id+1's
        # effective id, making them byte-exact dups of an index doc
        eff = F.when(F.col("id") % 50 == 0, F.col("id") + 1).otherwise(
            F.col("id")
        )
        docs = spark.range(args.synthetic).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.element_at(
                        head_arr,
                        (F.pmod(F.xxhash64(eff, F.lit(i)), F.lit(30)) + 1)
                        .cast("int"),
                    )
                    for i in range(20)
                ],
                *[
                    F.concat(F.lit(f"rare-{j}-"), eff.cast("string"))
                    for j in range(5)
                ],
            ).alias("text"),
        )
    else:
        docs = Catalog(spark, args.sf_dir).documents

    # ---- Bloom screen: replicate the query's split and flag stage ----
    n_bits, n_probes = 1 << 20, 4
    new_docs = docs.filter(F.col("doc_id") % 10 == 0)
    index = docs.filter(F.col("doc_id") % 10 != 0)
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    idx_hashes = (
        index.select(F.md5(norm).alias("text_hash"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bm = np.frombuffer(
        dedup.bloom_bitmap_from_hashes(
            idx_hashes, n_bits=n_bits, n_probes=n_probes
        ),
        dtype=np.uint8,
    )
    batch = (
        new_docs.select(F.md5(norm).alias("text_hash"))
        .groupBy("text_hash")
        .count()
    )
    pos = batch.select(
        *[
            F.pmod(F.xxhash64(F.col("text_hash"), F.lit(j)), F.lit(n_bits)).alias(
                f"p{j}"
            )
            for j in range(n_probes)
        ]
    ).collect()
    n_groups = len(pos)
    positives = sum(
        all((bm[r[f"p{j}"] >> 3] >> (r[f"p{j}"] & 7)) & 1 for j in range(n_probes))
        for r in pos
    )
    true_dups = batch.join(idx_hashes, "text_hash", "left_semi").count()

    # ---- CMS heavy hitters: occurrence + vocab survival fractions ----
    depth, width, t = 4, 16384, args.min_count
    ex = docs.select(
        F.explode(textops.tokens(F.lower(F.col("text")))).alias("tok")
    )
    sketch = (
        ex.select(
            F.posexplode(
                F.array(
                    *[
                        F.pmod(F.xxhash64(F.col("tok"), F.lit(j)), F.lit(width))
                        for j in range(depth)
                    ]
                )
            ).alias("j", "p")
        )
        .groupBy("j", "p")
        .agg(F.count(F.lit(1)).alias("cms_n"))
        .toPandas()
    )
    cms = np.zeros((depth, width), dtype=np.int64)
    cms[sketch["j"].to_numpy(), sketch["p"].to_numpy()] = sketch[
        "cms_n"
    ].to_numpy()
    # per-distinct-token estimate, positions computed Spark-side for parity
    est_df = (
        ex.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "tok",
            "n",
            *[
                F.pmod(F.xxhash64(F.col("tok"), F.lit(j)), F.lit(width)).alias(
                    f"p{j}"
                )
                for j in range(depth)
            ],
        )
        .toPandas()
    )
    ests = np.min(
        np.stack(
            [cms[j, est_df[f"p{j}"].to_numpy()] for j in range(depth)], axis=0
        ),
        axis=0,
    )
    n_occ_total = int(est_df["n"].sum())
    n_occ_cand = int(est_df["n"].to_numpy()[ests >= t].sum())
    n_vocab = len(est_df)
    n_cand_tokens = int((ests >= t).sum())
    n_true_heavy = int((est_df["n"].to_numpy() >= t).sum())

    print(
        json.dumps(
            {
                "metric": "sketch_prefilter_probe",
                "sf_dir": args.sf_dir,
                "bloom": {
                    "n_bits": n_bits,
                    "n_probes": n_probes,
                    "batch_hash_groups": n_groups,
                    "bloom_positive": positives,
                    "true_dup_groups": true_dups,
                    "false_positives": positives - true_dups,
                    "join_skipped_fraction": round(
                        1 - positives / max(n_groups, 1), 4
                    ),
                },
                "cms": {
                    "depth": depth,
                    "width": width,
                    "min_count": t,
                    "occurrences_total": n_occ_total,
                    "occurrences_candidate": n_occ_cand,
                    "occurrence_shuffle_fraction": round(
                        n_occ_cand / max(n_occ_total, 1), 4
                    ),
                    "vocab_size": n_vocab,
                    "candidate_tokens": n_cand_tokens,
                    "true_heavy_tokens": n_true_heavy,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
