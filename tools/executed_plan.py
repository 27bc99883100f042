"""Print the EXECUTED (AQE-final) plan of registry queries.

Usage: python tools/executed_plan.py [--sf-dir DIR] q1 [q2 ...]

capture_plans.py records the pre-execution formatted plan, which cannot
show runtime exchange reuse (ReusedExchange / AQEShuffleRead appear only
once the AdaptiveSparkPlan finalizes). This runs the query to completion
(collect to a noop-style consumer) and re-prints explain("formatted"),
which by then reflects the final plan, plus a summary line counting
Generate / Exchange / ReusedExchange occurrences in the tree section.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if args and args[0] == "--sf-dir":
        sf_dir = args[1]
        args = args[2:]

    from practicum2_nof1_adhd_bd_spark import registry
    from practicum2_nof1_adhd_bd_spark.session import get_spark

    spark = get_spark("executed-plan")
    spark.sparkContext.setLogLevel("ERROR")

    import contextlib
    import io

    for name in args:
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        # the noop write finalized ITS execution (a separate
        # QueryExecution); the df's OWN AdaptiveSparkPlan finalizes only
        # when ITS plan executes. Run the executed plan's RDD entirely in
        # the JVM — unlike collect(), nothing is materialized on the
        # driver (r16 ADVICE: large-output registry queries could OOM it).
        df._jdf.queryExecution().executedPlan().execute().count()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        tree = txt.split("\n\n")[0]
        # count only the AQE-final tree, not the appended initial plan
        if "== Initial Plan ==" in tree:
            tree = tree.split("== Initial Plan ==")[0]
        gens = len(re.findall(r"\bGenerate\b", tree))
        ex = len(re.findall(r"\bExchange\b", tree))
        reuse = len(re.findall(r"ReusedExchange", tree))
        aqeread = len(re.findall(r"AQEShuffleRead", tree))
        final = "isFinalPlan=true" in txt
        print(
            f"=== {name}: final={final} Generate={gens} Exchange={ex} "
            f"ReusedExchange={reuse} AQEShuffleRead={aqeread}"
        )
        print(txt)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
