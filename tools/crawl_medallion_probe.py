"""Crawl-medallion 10x scale probe (SCALING §2t, r13).

Synthesizes the HTML-body WARC fixture at 2,400 and 24,000 records,
builds bronze -> silver -> gold end to end at each size, times each
layer, and audits the silver plan: the URL-dedup verdict's hash
aggregate/join must be the ONLY fact-grain exchange between the bronze
scan and the silver write (status/content-type screens are scan-local
projections, the blocklist is a broadcast anti-join, HTML->text is a
codegen'd projection).

    python tools/crawl_medallion_probe.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def exchanges_at_fact_grain(plan: str) -> list[str]:
    """Exchange lines in a formatted plan, excluding broadcast exchanges
    (dim-side by construction) and the final write's rebalance (AQE
    coalesce reuses the dedup shuffle when present)."""
    out = []
    for line in plan.splitlines():
        s = line.strip().lstrip("+-: *(0123456789) ")
        if s.startswith("Exchange") and "EXECUTOR_BROADCAST" not in line:
            out.append(line.strip())
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark import corpus_pipeline as cp
    from practicum2_nof1_adhd_bd_spark.operators import urls
    from practicum2_nof1_adhd_bd_spark.session import get_spark
    from practicum2_nof1_adhd_bd_spark.sources import warc as warc_src

    spark = get_spark("crawl-medallion-probe")
    spark.sparkContext.setLogLevel("ERROR")
    blocked = spark.createDataFrame(
        [("site3.example",)], "host string"
    )

    for n in (2_400, 2_400, 24_000):  # first 2,400 run is JIT warmup
        work = tempfile.mkdtemp(prefix="crawl_probe_")
        wd = f"{work}/warc"
        warc_src.synthesize_warc(wd, n, html_bodies=True)
        t0 = time.time()
        bronze = cp.build_crawl_bronze(spark, wd, work)
        t1 = time.time()
        silver = cp.build_crawl_silver(spark, bronze, work, blocked)
        t2 = time.time()
        cp.build_crawl_gold(spark, silver, work)
        t3 = time.time()
        rows_b = spark.read.parquet(bronze).count()
        rows_s = spark.read.parquet(silver).count()
        print(
            f"n={n:>6,} bronze={t1-t0:.2f}s ({rows_b} rows) "
            f"silver={t2-t1:.2f}s ({rows_s} rows) gold={t3-t2:.2f}s "
            f"total={t3-t0:.2f}s"
        )
        if n == 24_000:
            # plan audit on the silver transform (pre-write): count
            # non-broadcast exchanges between bronze scan and output
            b = spark.read.parquet(bronze)
            screened = b.filter(
                (F.col("http_status") == 200)
                & (F.col("content_type") == "text/html")
            ).join(
                F.broadcast(
                    blocked.select(F.col("host").alias("canonical_host"))
                ),
                "canonical_host",
                "left_anti",
            )
            keep = (
                urls.url_dedup_decisions(screened, "canonical_url", "doc_id")
                .filter(F.col("keep"))
                .select("doc_id")
            )
            final = screened.join(keep, "doc_id", "left_semi")
            plan = final._jdf.queryExecution().executedPlan().toString()
            ex = exchanges_at_fact_grain(plan)
            print(f"fact-grain exchanges in the silver plan: {len(ex)}")
            for line in ex:
                print("  ", line[:120])
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
