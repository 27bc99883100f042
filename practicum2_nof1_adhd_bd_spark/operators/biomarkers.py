"""Biomarker derivations — SURVEY.md §2.4 A3 (sleep efficiency) and
A12 (HRV time-domain from an HR event series).

The reference computes HRV metrics with numpy over per-day arrays
(ref src/biomarkers/hrv.py:44-170). Here the whole chain — NN intervals,
successive differences, SDNN/RMSSD/pNN50/CV — is lag-window + groupBy
column algebra: one shuffle on the day key, no Python, exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import clip, safe_div


def hrv_time_domain(
    df: DataFrame,
    ts_col: str = "ts",
    hr_col: str = "value",
    min_samples: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """A12 — per-day HRV time-domain metrics from an HR stream.

    NN[i] = 60000 / HR[i] (ms); diffs over the day's time-ordered series:
    SDNN = stddev_samp(NN); RMSSD = sqrt(mean(diff^2)); pNN50 = % |diff|>50;
    CV = SDNN/mean(NN)*100. Days with < min_samples are gated out
    (ref hrv.py:44-170 incl. the >=10-sample gate).
    """
    d = df.filter(F.col(hr_col) > 0).select(
        F.to_date(ts_col).alias("date"),
        F.col(ts_col).alias("ts"),
        (F.lit(60000.0) / F.col(hr_col)).alias("nn"),
    )
    w = Window.partitionBy("date").orderBy("ts")
    d = d.withColumn("nn_diff", F.col("nn") - F.lag("nn").over(w))
    out = d.groupBy("date").agg(
        F.count("nn").alias("n_samples"),
        F.round(F.stddev_samp("nn"), round_dp).alias("sdnn"),
        F.round(F.sqrt(F.avg(F.col("nn_diff") * F.col("nn_diff"))), round_dp).alias("rmssd"),
        F.round(
            F.avg((F.abs("nn_diff") > 50).cast("double")) * 100, round_dp
        ).alias("pnn50"),
        F.round(
            F.stddev_samp("nn") / F.avg("nn") * 100, round_dp
        ).alias("cv_pct"),
    )
    return out.filter(F.col("n_samples") >= min_samples)


def circadian_midpoint_variability(
    df: DataFrame,
    ts_col: str = "ts",
    window: int = 7,
) -> DataFrame:
    """A15 (circadian) — daily event-midpoint hour and its trailing
    variability (ref src/biomarkers/circadian.py:30-196: sleep-midpoint
    variability as a rhythm-stability marker).

    midpoint = mean second-of-day / 3600; variability = stddev of the
    midpoint over the trailing `window` days. Outputs are scaled integers
    (x1e4) so the oracle comparison is rounding-boundary-proof (see
    registry.rolling_7d_mean_by_user note).
    """
    sec_of_day = F.unix_timestamp(ts_col) % 86400
    daily = df.groupBy(F.to_date(ts_col).alias("date")).agg(
        (F.avg(sec_of_day) / 3600.0).alias("_mid_h"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.orderBy("date").rowsBetween(-(window - 1), 0)
    out = daily.withColumn("_var_h", F.stddev_samp("_mid_h").over(w))
    return out.select(
        "date",
        "n_events",
        F.round(F.col("_mid_h") * 10000, 0).cast("bigint").alias("midpoint_h_x1e4"),
        F.round(F.col("_var_h") * 10000, 0).cast("bigint").alias("roll_std_x1e4"),
    )


def interval_efficiency(
    df: DataFrame,
    ts_col: str,
    state_col: str,
    minutes_col: str,
    active_state: str,
    total_states: list[str],
    round_dp: int = 6,
) -> DataFrame:
    """A3 — per-day duration sums by state + efficiency = active/total*100
    clipped to [0,100] (ref stage_csv_aggregation.py:162-215: asleep vs
    in-bed minutes, efficiency clip)."""
    active = F.sum(F.when(F.col(state_col) == active_state, F.col(minutes_col)))
    total = F.sum(
        F.when(F.col(state_col).isin(total_states), F.col(minutes_col))
    )
    out = df.groupBy(F.to_date(ts_col).alias("date")).agg(
        F.round(F.coalesce(active, F.lit(0.0)), 2).alias("active_min"),
        F.round(F.coalesce(total, F.lit(0.0)), 2).alias("total_min"),
    )
    eff = safe_div(F.col("active_min") * 100.0, F.col("total_min"))
    return out.withColumn(
        "efficiency", F.round(clip(eff, 0.0, 100.0), round_dp)
    )
