"""Temporal cross-validation folds — SURVEY.md §2.5 W10/W11.

The reference assigns calendar folds from an anchored start date: fold k
trains on [start + k*step, +train_len) and validates on the following
val_len (ref ml7_analysis.py:148-235; config/settings.yaml: train 120d /
gap 10d / val 60d). Pure date arithmetic -> derived columns, no loops.

Month arithmetic uses integer (year*12 + month) so the DuckDB oracle
matches exactly (fractional months_between differs between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def day_folds(
    df: DataFrame,
    date_col: str,
    train_days: int = 120,
    gap_days: int = 10,
    val_days: int = 60,
) -> DataFrame:
    """Rolling-origin day-grain folds: the timeline is cut into
    (train+gap+val)-day blocks from the global min date; within each block a
    row is train / gap / val by offset. Adds fold_id + split."""
    block = train_days + gap_days + val_days
    anchored = df.crossJoin(
        F.broadcast(df.agg(F.min(F.col(date_col).cast("date")).alias("_anchor")))
    )
    off = F.datediff(F.col(date_col).cast("date"), F.col("_anchor"))
    in_block = off % block
    return (
        anchored.withColumn("fold_id", F.floor(off / block))
        .withColumn(
            "split",
            F.when(in_block < train_days, F.lit("train"))
            .when(in_block < train_days + gap_days, F.lit("gap"))
            .otherwise(F.lit("val")),
        )
        .drop("_anchor")
    )


def month_folds(
    df: DataFrame,
    date_col: str,
    train_months: int = 4,
    val_months: int = 2,
) -> DataFrame:
    """W10 — calendar-month folds: fold k = one (train+val)-month block from
    the anchor month; first train_months are train, rest val
    (ref ml7_analysis.py:148-235)."""
    block = train_months + val_months
    d = F.col(date_col).cast("date")
    months = F.year(d) * 12 + F.month(d)
    anchored = df.crossJoin(
        F.broadcast(
            df.agg(
                F.min(F.year(d) * 12 + F.month(d)).alias("_anchor_m")
            )
        )
    )
    moff = months - F.col("_anchor_m")
    return (
        anchored.withColumn("fold_id", F.floor(moff / block))
        .withColumn(
            "split",
            F.when(moff % block < train_months, F.lit("train")).otherwise(
                F.lit("val")
            ),
        )
        .drop("_anchor_m")
    )


def fold_class_check(
    folded: DataFrame, label_col: str, min_classes: int = 2
) -> DataFrame:
    """W10 class-coverage gate: folds whose val split has < min_classes
    distinct labels are flagged skip (ref ml7_analysis.py:208-214)."""
    per_fold = (
        folded.filter(F.col("split") == "val")
        .groupBy("fold_id")
        .agg(F.countDistinct(label_col).alias("n_classes"))
    )
    return per_fold.withColumn(
        "usable", (F.col("n_classes") >= min_classes).cast("int")
    )
