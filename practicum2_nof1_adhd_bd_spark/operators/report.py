"""Stage-9 run-report rollup — the reference's markdown execution summary
re-expressed as a queryable DataFrame.

Reference: ``scripts/run_full_pipeline.py:1918-2140`` (stage_9_report) builds
RUN_<PID>_<SNAPSHOT>.md from the labeled daily frame: date range + total
days, per-domain coverage counts/percentages (SoM / MEDS / HRV), a domain
value range (HRV SDNN min/max/mean), and the label distribution with
percentages. Here the same summary is a long-format DataFrame
``(section, metric, value)`` so it can be attested against a SQL oracle,
joined, or diffed between snapshots instead of being a write-only markdown
artifact.

Scale: every section aggregates the tiny daily-grain frame (days x
event-types rows after the first aggregate), so the only event-cardinality
work is the two initial scans (daily stats + label chain); all section
unions are scalar-sized. Sums that feed rounded means are cast to
DECIMAL(28,12) first so combine order cannot flip a 6dp rounding boundary
(same discipline as registry._daily_mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


def _rows(df: DataFrame, *triples) -> DataFrame:
    """Explode (section, metric, value) column triples into long rows."""
    structs = [
        F.struct(
            sec.alias("section"),
            met.alias("metric"),
            val.cast("double").alias("value"),
        )
        for sec, met, val in triples
    ]
    return df.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def run_report(
    daily_by_type: DataFrame,
    labeled: DataFrame,
    range_type: str = "error",
    label_col: str = "label_3cls",
) -> DataFrame:
    """Long-format pipeline execution summary.

    ``daily_by_type``: one row per (date, event_type) with ``n`` (event
    count) and ``vmean`` (decimal-exact rounded daily mean) — the engine's
    analog of the per-domain daily CSVs the reference reports over.
    ``labeled``: the flagship label chain output with ``label_col``.

    Sections mirror stage_9_report: ``data_summary`` (range/total days,
    ref :1966-1972), ``coverage`` per domain (ref :1977-2027),
    ``<range_type>_range`` (ref HRV min/max/mean :2030-2035), and
    ``label_dist`` counts + percentages (ref :2040-2051).
    """
    base = daily_by_type.agg(
        F.countDistinct("date").alias("n_days"),
        (F.datediff(F.max("date"), F.min("date")) + F.lit(1)).alias("span_days"),
        F.sum("n").alias("total_events"),
    )
    summary = _rows(
        base,
        (F.lit("data_summary"), F.lit("n_days"), F.col("n_days")),
        (F.lit("data_summary"), F.lit("span_days"), F.col("span_days")),
        (F.lit("data_summary"), F.lit("total_events"), F.col("total_events")),
    )

    cov = (
        daily_by_type.groupBy("event_type")
        .agg(F.countDistinct("date").alias("days_with"))
        .crossJoin(F.broadcast(base.select("n_days")))
    )
    coverage = _rows(
        cov,
        (
            F.lit("coverage"),
            F.concat(F.lit("days_with_"), F.col("event_type")),
            F.col("days_with"),
        ),
        (
            F.lit("coverage"),
            F.concat(F.lit("pct_"), F.col("event_type")),
            F.round(F.col("days_with") * 100.0 / F.col("n_days"), 6),
        ),
    )

    rng = daily_by_type.filter(F.col("event_type") == range_type).agg(
        F.min("vmean").alias("v_min"),
        F.max("vmean").alias("v_max"),
        F.round(
            F.sum(F.col("vmean").cast(_DEC)).cast("double") / F.count("vmean"), 6
        ).alias("v_avg"),
    )
    ranges = _rows(
        rng,
        (F.lit(f"{range_type}_range"), F.lit("daily_mean_min"), F.col("v_min")),
        (F.lit(f"{range_type}_range"), F.lit("daily_mean_max"), F.col("v_max")),
        (F.lit(f"{range_type}_range"), F.lit("daily_mean_avg"), F.col("v_avg")),
    )

    ld = (
        labeled.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(labeled.agg(F.count(F.lit(1)).alias("n_lab"))))
    )
    label_dist = _rows(
        ld,
        (
            F.lit("label_dist"),
            F.concat(F.lit("class_"), F.col(label_col).cast("string")),
            F.col("cnt"),
        ),
        (
            F.lit("label_dist"),
            F.concat(F.lit("class_pct_"), F.col(label_col).cast("string")),
            F.round(F.col("cnt") * 100.0 / F.col("n_lab"), 6),
        ),
    )

    return summary.unionByName(coverage).unionByName(ranges).unionByName(label_dist)
