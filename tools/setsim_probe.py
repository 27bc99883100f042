"""Prefix-filter probe — reproduces SCALING.md §2p.

Measures what the All-Pairs/PPJoin prefix filter buys over the existing
blocking strategies for the SAME exact-Jaccard result (threshold 1/2,
3-word shingles over documents):

- candidate pairs admitted by the prefix filter vs C(n,2) (the
  unblocked cross join) and vs the (lang, source, size-octave)
  attribute blocking that `ngram_jaccard_pairs` uses;
- true pairs, so the candidates-per-true-pair ratio is explicit;
- wall time of the verified prefix join vs the attribute-blocked join
  (NOTE: not result-identical — attribute blocking only pairs within
  lang/source cells, the prefix join is corpus-global and exact).

Prints one JSON line.

Usage: python tools/setsim_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from practicum2_nof1_adhd_bd_spark.operators import dedup
    from practicum2_nof1_adhd_bd_spark.session import get_spark
    from practicum2_nof1_adhd_bd_spark.sources.readers import Catalog

    spark = get_spark("setsim-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = Catalog(spark, args.sf_dir).documents
    n = docs.count()

    # warm the JIT/scan cache so the timed runs compare codegen'd steady
    # state, not first-query JVM startup
    docs.select("doc_id").count()

    t0 = time.time()
    cand = dedup.prefix_join_candidates(docs).count()
    t_cand = time.time() - t0

    t0 = time.time()
    true_pairs = dedup.prefix_jaccard_join(docs).count()
    t_prefix = time.time() - t0

    t0 = time.time()
    blocked_pairs = dedup.ngram_jaccard_pairs(
        docs, bucket_cols=["lang", "source"], k=3, threshold=0.5
    ).count()
    t_blocked = time.time() - t0

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "n_docs": n,
                "cross_join_pairs": n * (n - 1) // 2,
                "prefix_candidates": cand,
                "true_pairs_at_0_5": true_pairs,
                "blocked_pairs_at_0_5": blocked_pairs,
                "candidates_per_true_pair": round(cand / max(true_pairs, 1), 2),
                "reduction_vs_cross_join": round(n * (n - 1) / 2 / max(cand, 1), 1),
                "sec_prefix_candidates": round(t_cand, 2),
                "sec_prefix_verified": round(t_prefix, 2),
                "sec_attribute_blocked": round(t_blocked, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
