"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, compares row count, column names, and order-insensitive
values. Usage:

    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, ".")


def normalize(rows, columns):
    """Sort columns by name, then rows; round-trip floats to 9dp strings."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])

    def norm_val(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{round(v, 9):.9f}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    out = sorted(tuple(norm_val(r[i]) for i in idx) for r in rows)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--window",
        action="store_true",
        help="check exactly the first-50 attestation window (the set the "
        "driver's CORRECTNESS gate runs)",
    )
    ap.add_argument("names", nargs="*")
    ap.add_argument(
        "--json-out",
        default="",
        help="also write a machine-readable sweep artifact (r15 verdict "
        "#2: land a committed full-registry sweep record every round)",
    )
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    # Deliberately BARE session (no session.py tuning): the driver supplies
    # one exactly like this, so any conf the engine needs must be set by the
    # engine itself (Catalog.__init__). Mirrors the real gate.
    spark = (
        SparkSession.builder.appName("oracle-check")
        .master("local[32]")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.window:
        names = list(qs)[:50] + args.names
    else:
        names = args.names or list(qs)
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "fail", "err": f"spark: {e}"[:300]}
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            results[name] = {"status": "rows_only", "rows": len(srows)}
            n_rows_only += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            results[name] = {"status": "fail", "err": f"duckdb: {e}"[:300]}
            n_fail += 1
            continue
        status = []
        if sorted(scols) != sorted(dcols):
            status.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not status:
            s_n = normalize(srows, scols)
            d_n = normalize(drows, dcols)
            if s_n != d_n:
                diffs = [
                    (a, b) for a, b in zip(s_n, d_n) if a != b
                ][:3]
                status.append(f"values differ, first diffs: {diffs}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            results[name] = {"status": "fail", "err": "; ".join(status)[:300]}
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            results[name] = {
                "status": "pass",
                "rows": len(srows),
                "sec": round(time.time() - t0, 1),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if args.json_out:
        import json

        with open(args.json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": args.sf_dir,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "n_total": len(names),
                    "queries": results,
                },
                f,
                indent=0,
                sort_keys=True,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
