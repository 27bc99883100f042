"""Same-session interleaved A/B of two code versions of registry queries.

The host shows multi-second CPU-steal waves (documented since r03), so
SESSION-level A/B — one microbench run per code version — confounds the
code delta with whichever contention window each session landed in
(measured r17: medians of IDENTICAL code swing 2-4x between back-to-back
sessions). This tool removes the window confound: it imports the OLD
package from a second checkout, snapshots its query callables, purges
sys.modules, imports the NEW package from the repo root, and then runs
old/new ALTERNATELY inside one warmed JVM — each old/new pair shares its
contention window, so the per-pair ratio is the code signal.

The OLD package is imported under a RENAMED copy (every intra-package
import is relative — verified by grep — so the rename is transparent);
a plain two-path import would break the moment any old function does a
lazy relative import, which re-resolves through sys.modules and would
silently pick up the NEW module. Only valid for queries with no Python
UDFs (both versions' DataFrame plans are built from live module objects;
the JVM sees only expressions), which covers the graph/similarity/
textops paths this round touches.

Usage:
  python tools/ab_interleaved.py --old /tmp/repo_old [-n 5] q1 q2 ...

Prints one JSON line:
  {query: {"old": [...], "new": [...], "pair_ratios": [...],
           "median_pair_ratio": r}}   (ratio > 1 -> NEW is faster)
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

PKG = "practicum2_nof1_adhd_bd_spark"
OLD_PKG = "_ab_old_" + PKG


def _load_old_queries(old_root: str):
    """Copy the OLD checkout's package under a renamed import name and
    load its registry — lazy relative imports inside old functions then
    resolve within the renamed package, never the new one."""
    import importlib
    import shutil
    import tempfile

    stage = tempfile.mkdtemp(prefix="ab_old_pkg_")
    shutil.copytree(
        os.path.join(old_root, PKG), os.path.join(stage, OLD_PKG)
    )
    sys.path.insert(0, stage)
    reg = importlib.import_module(f"{OLD_PKG}.registry")
    return dict(reg.QUERIES)


def _load_new_queries(root: str):
    import importlib

    sys.path.insert(0, root)
    reg = importlib.import_module(f"{PKG}.registry")
    return dict(reg.QUERIES)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", required=True, help="checkout of the OLD code")
    ap.add_argument("-n", type=int, default=5)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    old_q = _load_old_queries(os.path.abspath(args.old))
    new_q = _load_new_queries(here)

    from practicum2_nof1_adhd_bd_spark.session import get_spark

    spark = get_spark("ab-interleaved")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        for b in batches:
            yield b

    spark.range(0, 3200, 1, 32).mapInPandas(_ident, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def run(fn) -> float:
        t0 = time.time()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        return round(dt, 3)

    out = {}
    for name in args.names:
        # one untimed warm pass per version: JIT + codegen cache for BOTH
        # plan shapes before any timed pair
        spark.sparkContext.setJobDescription(f"ab warm: {name}")
        run(old_q[name])
        run(new_q[name])
        olds, news = [], []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"ab old[{i}]: {name}")
            olds.append(run(old_q[name]))
            spark.sparkContext.setJobDescription(f"ab new[{i}]: {name}")
            news.append(run(new_q[name]))
        ratios = [round(o / n, 3) for o, n in zip(olds, news)]
        out[name] = {
            "old": olds,
            "new": news,
            "old_median": statistics.median(olds),
            "new_median": statistics.median(news),
            "pair_ratios": ratios,
            "median_pair_ratio": round(statistics.median(ratios), 3),
        }
        print(
            f"# {name}: old_med={out[name]['old_median']:.2f} "
            f"new_med={out[name]['new_median']:.2f} "
            f"median_pair_ratio={out[name]['median_pair_ratio']:.2f}",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
