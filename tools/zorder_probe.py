"""SCALING §2n probe: row-group/file skipping under Z-order layout.

Writes lineitem twice at the same file count — (a) sorted by l_partkey
(the best 1-D layout) and (b) Z-ordered on (l_partkey, l_suppkey) — then
reads back parquet footer min/max stats with pyarrow and computes, for a
2-D box predicate, the fraction of files whose stats intersect the box
(= the fraction a stats-pruning reader must fetch).

Usage: python tools/zorder_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, ".")


def box_hit_fraction(path: str, box: dict) -> tuple[int, int]:
    import pyarrow.parquet as pq

    hit = total = 0
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in box.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            if ok:
                hit += 1
    return hit, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--files", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import layout
    from practicum2_nof1_adhd_bd_spark.session import get_spark
    from practicum2_nof1_adhd_bd_spark.sources.readers import Catalog

    spark = get_spark("zorder-probe")
    li = Catalog(spark, args.sf_dir).lineitem.select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    pk_max = li.agg(F.max("l_partkey")).first()[0]
    sk_max = li.agg(F.max("l_suppkey")).first()[0]
    # a ~10%-per-dimension box => ~1% of the 2-D domain
    box = {
        "l_partkey": (int(pk_max * 0.45), int(pk_max * 0.55)),
        "l_suppkey": (int(sk_max * 0.45), int(sk_max * 0.55)),
    }

    base = "/tmp/spark_graft_zorder_probe"
    shutil.rmtree(base, ignore_errors=True)
    one_d = os.path.join(base, "sorted_pk")
    z_d = os.path.join(base, "zorder")
    li.repartitionByRange(args.files, "l_partkey").sortWithinPartitions(
        "l_partkey"
    ).write.mode("overwrite").parquet(one_d)
    layout.zorder_repartition(
        li, "l_partkey", "l_suppkey", n_partitions=args.files
    ).write.mode("overwrite").parquet(z_d)

    h1, t1 = box_hit_fraction(one_d, box)
    hz, tz = box_hit_fraction(z_d, box)
    print(f"box (~1% of domain): {box}")
    print(f"1-D sort by l_partkey : {h1}/{t1} row groups must be read")
    print(f"Z-order (pk, sk)      : {hz}/{tz} row groups must be read")
    # 1-D control: a box on the UNSORTED dimension alone
    box_sk = {"l_suppkey": box["l_suppkey"]}
    print(
        f"suppkey-only box — 1-D: {box_hit_fraction(one_d, box_sk)[0]}/{t1},"
        f" Z: {box_hit_fraction(z_d, box_sk)[0]}/{tz}"
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
