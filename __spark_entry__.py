"""Driver contract for the spark-graft builder (PySpark target).

Thin facade over ``practicum2_nof1_adhd_bd_spark.registry``: every
implemented operator from SURVEY.md §2 registers a Spark callable and (where
SQL-expressible) a DuckDB oracle twin there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from practicum2_nof1_adhd_bd_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    return dict(registry.ORACLES)
