"""Time a subset of registry queries with the bench methodology.

Usage:
  python tools/microbench.py [-n 5] [--sf-dir DIR] q1 q2 ...

Same timed action as bench.py (noop sink, clearCache between repeats,
median-of-n), so numbers are comparable to BENCH_FULL.json. Prints one
JSON line {name: {"median": s, "min": s, "runs": [...]}}.
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
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from practicum2_nof1_adhd_bd_spark import registry
    from practicum2_nof1_adhd_bd_spark.session import get_spark

    spark = get_spark("microbench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        for b in batches:
            yield b

    spark.range(0, 3200, 1, 32).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out = {}
    for name in args.names:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(args.n):
            spark.sparkContext.setJobDescription(f"microbench: {name}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "median": sorted(runs)[len(runs) // 2],
            "min": min(runs),
            "runs": runs,
        }
        print(f"# {name}: median={out[name]['median']} runs={runs}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
