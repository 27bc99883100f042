"""practicum2_nof1_adhd_bd_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of the
reference pipeline ``rodrigomarquest/practicum2-nof1-adhd-bd`` (a pandas
N-of-1 digital-phenotyping pipeline) as idiomatic Spark: DataFrame/SQL plans
optimized by Catalyst, with Pandas-UDF escape hatches only where built-in
operators cannot express the semantics (sequential drift detectors, iterative
imputation).

Layout
------
- ``session``    : tuned SparkSession factory (AQE, shuffle sizing, Arrow).
- ``sources``    : readers — parquet catalog, permissive CSV, XML record scan.
- ``functions``  : scalar column expression helpers (clip, safe_div, hash64).
- ``operators``  : the operator inventory from SURVEY.md §2 — daily aggs,
                   spine/coalescing joins, window ops, labels, dedup,
                   similarity, text analysis, folds, drift.
- ``streaming``  : Structured Streaming surfaces over the events table.
"""

__version__ = "0.1.0"
