"""Runtime bloom-filter join probe — reproduces SCALING.md §2q.

Spark 3.3+ can inject a bloom filter built from a SELECTIVE dimension
side into the fact side's scan (`spark.sql.optimizer.runtime.
bloomFilter.enabled`, on by default here), so fact rows that cannot
match are dropped BEFORE the shuffle — the runtime analogue of a
semi-join reduction. This probe makes the effect visible on the
lineitem ⋈ selective-orders join:

- broadcast is disabled (threshold -1) so the join is shuffle-based,
  the regime where the filter matters;
- ON vs OFF wall time over repeats;
- the plan is checked for the injected `bloomfilter` predicate;
- the analytic row reduction is printed (fact rows matching the
  selective dim vs total), which is what the filter saves from the
  exchange at any scale.

Prints one JSON line.

Usage: python tools/runtime_filter_probe.py [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.session import get_spark
    from practicum2_nof1_adhd_bd_spark.sources.readers import Catalog

    spark = get_spark(
        "runtime-filter-probe",
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # local-mode sizing: the injection gate requires the
            # application (fact) side to look big enough to be worth
            # filtering (10 GB default) — at sf0.1 nothing qualifies, so
            # drop the gate to probe the MECHANISM; the 100 TB fact
            # clears the real default on its own
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, args.sf_dir)

    def query():
        # selective dim: urgent orders from one quarter (~2% of orders)
        dim = cat.orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-04-01")
        ).select("o_orderkey", "o_custkey")
        fact = cat.lineitem.select(
            "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
        )
        return (
            fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
            .groupBy("o_custkey")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
        )

    n_fact = cat.lineitem.count()
    n_match = query().agg(F.count(F.lit(1))).collect()  # warm + JIT
    li = cat.lineitem.select("l_orderkey")
    matching_fact_rows = li.join(
        cat.orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-04-01")
        ).select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_semi",
    ).count()

    results = {}
    for flag in ("true", "false"):
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", flag)
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            query().write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        plan = query()._jdf.queryExecution().executedPlan().toString().lower()
        results[flag] = {
            "median_sec": round(statistics.median(times), 3),
            "plan_has_bloom": "bloomfilter" in plan or "might_contain" in plan,
        }
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")

    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "fact_rows": n_fact,
                "fact_rows_matching_dim": matching_fact_rows,
                "shuffle_reduction": round(1 - matching_fact_rows / n_fact, 4),
                "bloom_on": results["true"],
                "bloom_off": results["false"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
