"""ANN recall probe — reproduces SCALING.md §2c.

Measures recall@k of each approximate-nearest-neighbor path against the
exact brute-force ranking over the testdata embeddings, across a fixed
query panel. Prints one JSON line.

Usage: python tools/recall_probe.py [--sf-dir /root/testdata/sf0.1]
       [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERY_PANEL = [0, 7, 23, 101, 250, 499, 777, 1024]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--clustered",
        action="store_true",
        help=(
            "run the panel on a CLUSTERED variant of the embeddings "
            "(each vector mixed toward its label centroid, alpha*c + "
            "(1-alpha)*v) — the realistic shape for trained embeddings, "
            "where sign-LSH margins carry signal; the default table is "
            "near-uniform, LSH's worst case (SCALING §2c)"
        ),
    )
    ap.add_argument("--alpha", type=float, default=0.7)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim
    from practicum2_nof1_adhd_bd_spark.session import get_spark
    from practicum2_nof1_adhd_bd_spark.sources.readers import Catalog

    spark = get_spark("recall-probe")
    spark.sparkContext.setLogLevel("ERROR")
    emb = Catalog(spark, args.sf_dir).embeddings
    if args.clustered:
        dim = len(emb.select("embedding").first()[0])
        cent = emb.groupBy("label").agg(
            F.array(
                *[F.avg(F.col("embedding")[i]) for i in range(dim)]
            ).alias("c")
        )
        a = float(args.alpha)
        emb = emb.join(F.broadcast(cent), "label").select(
            "vec_id",
            F.zip_with(
                "embedding",
                "c",
                lambda x, c: (a * c + (1 - a) * x.cast("double")).cast(
                    "float"
                ),
            ).alias("embedding"),
            "label",
        )
    emb = emb.cache()
    emb.count()

    paths = {
        "lsh_d0": lambda q: sim.ann_topk_lsh(
            emb, q, args.k, n_planes=6, plane_source="md5", probe_hamming=0
        ),
        "lsh_d1": lambda q: sim.ann_topk_lsh(
            emb, q, args.k, n_planes=6, plane_source="md5", probe_hamming=1
        ),
        "lsh_d2": lambda q: sim.ann_topk_lsh(
            emb, q, args.k, n_planes=6, plane_source="md5", probe_hamming=2
        ),
        "axis_d0": lambda q: sim.ann_topk_axis(emb, q, args.k, probe_hamming=0),
        "axis_d1": lambda q: sim.ann_topk_axis(emb, q, args.k, probe_hamming=1),
        "ivf_p2": lambda q: sim.ivf_topk(emb, q, args.k, n_probe=2),
        "mt_L2_P6_d1": lambda q: sim.ann_topk_multitable(
            emb, q, args.k, n_tables=2, n_planes=6, probe_hamming=1
        ),
        "mt_L4_P8_d1": lambda q: sim.ann_topk_multitable(
            emb, q, args.k, n_tables=4, n_planes=8, probe_hamming=1
        ),
        "mt_L6_P9_d1": lambda q: sim.ann_topk_multitable(
            emb, q, args.k, n_tables=6, n_planes=9, probe_hamming=1
        ),
        # the shipped ann_multitable_topk setting (SCALING §2c)
        "mt_L5_P8_d1": lambda q: sim.ann_topk_multitable(
            emb, q, args.k, n_tables=5, n_planes=8, probe_hamming=1
        ),
        # query-DIRECTED probing (Lv et al. proper): probe only the
        # lowest-|margin| flips instead of the full Hamming-1 ball
        "mp_L5_P8_m5": lambda q: sim.ann_topk_multiprobe(
            emb, q, args.k, n_tables=5, n_planes=8, n_flips=5
        ),
        "mp_L9_P8_m3": lambda q: sim.ann_topk_multiprobe(
            emb, q, args.k, n_tables=9, n_planes=8, n_flips=3
        ),
        # the shipped ann_multiprobe_topk setting (SCALING §2c)
        "mp_L10_P8_m3": lambda q: sim.ann_topk_multiprobe(
            emb, q, args.k, n_tables=10, n_planes=8, n_flips=3
        ),
        "mp_L10_P8_m4": lambda q: sim.ann_topk_multiprobe(
            emb, q, args.k, n_tables=10, n_planes=8, n_flips=4
        ),
        # the <=14%-budget corner (documented cap ~0.49-0.51 both panels)
        "mp_L10_P8_m2": lambda q: sim.ann_topk_multiprobe(
            emb, q, args.k, n_tables=10, n_planes=8, n_flips=2
        ),
        # int8-quantized storage form: recall here measures ranking
        # fidelity of the 4x-smaller index, not a candidate budget
        "int8_full_rank": lambda q: sim.int8_cosine_topk(emb, q, args.k),
        # ADC re-rank (Jegou et al. 2011): the m=4 directed probe's
        # candidates ranked by int8 ASYMMETRIC cosine, exact re-rank of
        # the top 100 only — the candidate fraction is paid in int8
        # bytes (4x cheaper than float32), exact touches 100/corpus
        "rr_L10_P8_m4_r100": lambda q: sim.int8_rerank_topk(
            emb, q, args.k, n_tables=10, n_planes=8, n_flips=4, rerank=100
        ),
        # product quantization (SCALING §2c): flat PQ full ADC scan vs
        # IVFADC probing 2 of 8 cells — the memory floor of the curve;
        # both pay a 10% exact-rerank budget
        "pq_m4k8_r200": lambda q: sim.pq_adc_topk(
            emb, q, args.k, m=4, k_codes=8, n_iters=2, rerank=200
        ),
        "ivfpq_p2of8_m4k8_r200": lambda q: sim.ivf_pq_topk(
            emb, q, args.k, n_cells=8, n_probe=2, m=4, k_codes=8,
            n_iters=2, rerank=200
        ),
    }
    # candidate-set generators for the paths whose candidate fraction the
    # SCALING table reports (recall means nothing without the budget paid)
    cand_paths = {
        "mt_L2_P6_d1": lambda q: sim.multitable_lsh_candidates(
            emb, q, n_tables=2, n_planes=6, probe_hamming=1
        ),
        "mt_L4_P8_d1": lambda q: sim.multitable_lsh_candidates(
            emb, q, n_tables=4, n_planes=8, probe_hamming=1
        ),
        "mt_L6_P9_d1": lambda q: sim.multitable_lsh_candidates(
            emb, q, n_tables=6, n_planes=9, probe_hamming=1
        ),
        "mt_L5_P8_d1": lambda q: sim.multitable_lsh_candidates(
            emb, q, n_tables=5, n_planes=8, probe_hamming=1
        ),
        "mp_L5_P8_m5": lambda q: sim.multiprobe_candidates(
            emb, q, n_tables=5, n_planes=8, n_flips=5
        )[0],
        "mp_L9_P8_m3": lambda q: sim.multiprobe_candidates(
            emb, q, n_tables=9, n_planes=8, n_flips=3
        )[0],
        "mp_L10_P8_m3": lambda q: sim.multiprobe_candidates(
            emb, q, n_tables=10, n_planes=8, n_flips=3
        )[0],
        "mp_L10_P8_m4": lambda q: sim.multiprobe_candidates(
            emb, q, n_tables=10, n_planes=8, n_flips=4
        )[0],
        "mp_L10_P8_m2": lambda q: sim.multiprobe_candidates(
            emb, q, n_tables=10, n_planes=8, n_flips=2
        )[0],
    }

    def ids(df):
        return {r["vec_id"] for r in df.collect()}

    corpus_n = emb.count()
    totals = {name: 0.0 for name in paths}
    cand_totals = {name: 0.0 for name in cand_paths}
    n = 0
    for q in QUERY_PANEL:
        exact = ids(sim.cosine_topk_bruteforce(emb, q, args.k))
        if not exact:
            continue
        n += 1
        for name, fn in paths.items():
            totals[name] += len(ids(fn(q)) & exact) / len(exact)
        for name, fn in cand_paths.items():
            cand_totals[name] += fn(q).count() / corpus_n
    print(
        json.dumps(
            {
                "metric": "ann_recall_at_k",
                "k": args.k,
                "n_queries": n,
                "corpus_n": corpus_n,
                "recall": {m: round(v / max(n, 1), 3) for m, v in totals.items()},
                "candidate_fraction": {
                    m: round(v / max(n, 1), 4) for m, v in cand_totals.items()
                },
                "sf_dir": args.sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
