"""Engine CLI — the reference's per-stage module CLIs re-expressed.

Reference entry points (SURVEY.md §3.2-3.3): every pipeline stage is a
``python -m`` CLI (`stage_csv_aggregation.py:1294-1308`,
`stage_unify_daily.py:539-555`, `stage_apply_labels.py:293-308`) and the
Makefile's ``qc-*`` targets gate CI on `etl_audit.py`'s exit code. Here
the uniform surface is the query registry:

    python -m practicum2_nof1_adhd_bd_spark list [substring]
    python -m practicum2_nof1_adhd_bd_spark run <query> [--sf-dir D]
        [--limit N] [--out PARQUET_DIR] [--explain]
    python -m practicum2_nof1_adhd_bd_spark audit [--sf-dir D]
    python -m practicum2_nof1_adhd_bd_spark pipeline ...  (medallion CLI)

``run`` prints the first rows (or writes parquet with --out); ``audit``
runs the full ETL audit battery and exits with the reference's severity
code (2 CRITICAL / 1 WARNING / 0 OK) so schedulers can gate on it. On a
cluster the same module is the ``spark-submit`` payload — the session
factory only builds a local master when none is configured.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="practicum2_nof1_adhd_bd_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("filter", nargs="?", default="")

    p_run = sub.add_parser("run", help="run one registered query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--out", default=None, help="write parquet here instead of printing")
    p_run.add_argument("--explain", action="store_true")

    p_audit = sub.add_parser("audit", help="ETL audit battery; exit code = severity")
    p_audit.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    sub.add_parser("pipeline", add_help=False)

    args, rest = ap.parse_known_args(argv)

    if args.cmd == "pipeline":
        from .pipeline import main as pipeline_main

        return pipeline_main(rest) or 0

    from . import registry

    if args.cmd == "list":
        for name in registry.QUERIES:
            if args.filter in name:
                oracle = "oracle" if name in registry.ORACLES else "rows-only"
                print(f"{name}\t{oracle}")
        return 0

    from .session import get_spark

    spark = get_spark("engine-cli")
    spark.sparkContext.setLogLevel("ERROR")

    if args.cmd == "audit":
        from .operators.audit import audit_exit_code

        report = registry.QUERIES["etl_audit_report"](spark, args.sf_dir)
        for r in report.collect():
            print(f"{r['severity']:8s} {r['check_name']:32s} "
                  f"metric={r['metric']} threshold={r['threshold']}")
        return audit_exit_code(report)

    if args.query not in registry.QUERIES:
        print(f"unknown query: {args.query} (try `list`)", file=sys.stderr)
        return 2
    df = registry.QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
