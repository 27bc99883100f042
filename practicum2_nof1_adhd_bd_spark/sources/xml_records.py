"""XML record scan — SURVEY.md §2.1 S3/S4/S9.

The reference scans a 1.5 GB Apple Health export.xml with a hand-rolled
64 MB-chunk binary regex loop (ref stage_csv_aggregation.py:283-366) to
avoid a DOM parse. The Spark-native equivalent: read the file as text with
``lineSep='<Record'`` so every record element becomes one row and the scan
is SPLIT ACROSS EXECUTORS (the reference is single-process), then pull
attributes out with regexp_extract. ~500 MB/s single-core in the reference;
this parallelizes linearly with cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_xml_records(
    spark: SparkSession,
    path: str,
    record_type: str | None = None,
    attrs: tuple[str, ...] = ("type", "value", "startDate", "endDate"),
) -> DataFrame:
    """Scan <Record .../> elements from an Apple-Health-style XML.

    Returns one row per record with one column per requested attribute.
    ``record_type`` filters on the type= attribute (predicate applies before
    any further parsing — the moral equivalent of the reference's typed
    regex prefilter).
    """
    # A custom-lineSep text scan IS splittable. Split size comes from
    # spark.sql.files.maxPartitionBytes (a session conf, not a reader
    # option): at the 128 MB default a 1.5 GB export becomes only ~12
    # tasks; callers scanning one big file on a wide executor pool should
    # lower it (tools/scale_probe.py measures 3x end-to-end from 8 MB
    # splits on a 210 MB file at local[32]).
    raw = spark.read.option("lineSep", "<Record").text(path)
    # Rows before the first <Record (header/prolog) have no attributes.
    rec = raw.filter(F.col("value").contains("="))
    cols = [
        F.regexp_extract(F.col("value"), rf'{a}="([^"]*)"', 1).alias(a) for a in attrs
    ]
    out = rec.select(*cols)
    if "type" in attrs:
        out = out.filter(F.col("type") != "")
    if record_type is not None:
        out = out.filter(F.col("type") == record_type)
    return out


def hr_events_from_xml(spark: SparkSession, path: str) -> DataFrame:
    """HeartRate events with parsed timestamp + numeric value
    (ref stage_csv_aggregation.py:283-366: value=, startDate= extraction)."""
    rec = read_xml_records(
        spark, path, record_type="HKQuantityTypeIdentifierHeartRate"
    )
    return rec.select(
        F.to_timestamp(
            F.col("startDate"), "yyyy-MM-dd HH:mm:ss XX"
        ).alias("ts"),
        F.col("value").cast("double").alias("hr_value"),
    ).filter(F.col("hr_value").isNotNull())
