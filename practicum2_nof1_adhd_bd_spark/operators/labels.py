"""Label layer — SURVEY.md §2 A7/A8 + the PBSI composite (build_pbsi.py).

The reference computes segment-wise z-scores, weighted linear composites,
and percentile-threshold labels with row-wise pandas applies
(ref src/labels/build_pbsi.py:84-176,224-253). Here everything is pure
column algebra over windows — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalars import clip
from ..sources.readers import fan_out


def segment_zscore(
    df: DataFrame,
    value_cols: list[str],
    segment_col: str = "segment_id",
    round_dp: int = 6,
    prefix: str = "z_",
) -> DataFrame:
    """A7 — per-segment z-score; std==0 or all-null => 0.0
    (ref build_pbsi.py:84-111)."""
    w = Window.partitionBy(segment_col)
    out = df
    for c in value_cols:
        mu, sd = F.avg(c).over(w), F.stddev_samp(c).over(w)
        z = F.when(sd > 0, (F.col(c) - mu) / sd).otherwise(F.lit(0.0))
        out = out.withColumn(f"{prefix}{c}", F.round(z, round_dp))
    return out


def weighted_composite(
    df: DataFrame,
    weights: dict[str, float],
    out_col: str,
    clip_lo: float = -3.0,
    clip_hi: float = 3.0,
    round_dp: int = 6,
) -> DataFrame:
    """§2.8 — weighted linear composite, clipped (ref build_pbsi.py:139-167:
    sleep_sub = 0.6*z_dur + 0.4*z_eff etc., subscores clipped to +-3).
    Null inputs are treated as 0 contribution (reference fills z of missing
    domains with 0)."""
    expr = None
    for c, wgt in weights.items():
        term = F.coalesce(F.col(c), F.lit(0.0)) * F.lit(float(wgt))
        expr = term if expr is None else expr + term
    return df.withColumn(out_col, F.round(clip(expr, clip_lo, clip_hi), round_dp))


def exact_quantile_thresholds(
    df: DataFrame, value_col: str, probs: tuple[float, float] = (0.25, 0.75)
) -> DataFrame:
    """A8 first pass — EXACT interpolated percentiles as a 1-row frame
    (ref build_pbsi.py:233-239 uses pandas quantile = linear interpolation;
    percentile_approx would not hash-match the oracle).

    The partial phase of exact percentile builds a value-count map over every
    row, so the single column is fanned out first: partial maps build in
    parallel and only the merge is single-task. (At 100 TB you'd switch to
    approx_percentile and a tolerance-based gate; exactness is the oracle
    contract here.)"""
    return fan_out(df.select(value_col)).agg(
        F.expr(f"percentile({value_col}, {probs[0]})").alias("p_lo"),
        F.expr(f"percentile({value_col}, {probs[1]})").alias("p_hi"),
    )


def approx_quantile_thresholds(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, float] = (0.25, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """A8 first pass, 100-TB variant — approx_percentile (GK sketch) as a
    1-row frame. Same shape as `exact_quantile_thresholds` but the partial
    state is a bounded sketch (O(accuracy) per task, mergeable), not a
    value-count map over every distinct value, so the merge never becomes a
    single-task bottleneck as the input grows. Error is bounded by
    1/accuracy relative rank."""
    pq = F.expr(
        f"approx_percentile({value_col}, array({probs[0]}, {probs[1]}), {accuracy})"
    )
    return (
        fan_out(df.select(value_col))
        .agg(pq.alias("_pq"))
        .select(
            F.col("_pq")[0].cast("double").alias("p_lo"),
            F.col("_pq")[1].cast("double").alias("p_hi"),
        )
    )


def quantile_3way_label(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, float] = (0.25, 0.75),
    label_col: str = "label_3cls",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """A8 — two-pass percentile labeling: value <= P_lo -> -1, >= P_hi -> +1,
    else 0 (ref build_pbsi.py:173-176,224-253).

    ``exact=True`` reproduces pandas-interpolated percentiles bit-for-bit
    (the oracle contract); ``exact=False`` swaps in the approx_percentile
    sketch — the path you run at 100 TB, where only rows whose rank sits
    within 1/accuracy of a cut point can flip label.

    Second pass is a broadcast cross-join of the 1-row threshold frame —
    the scalar never hits the driver, so the plan is cluster-safe.
    """
    thresholds = (
        exact_quantile_thresholds(df, value_col, probs)
        if exact
        else approx_quantile_thresholds(df, value_col, probs, accuracy)
    )
    labeled = df.crossJoin(F.broadcast(thresholds))
    v = F.col(value_col)
    return labeled.withColumn(
        label_col,
        F.when(v <= F.col("p_lo"), -1).when(v >= F.col("p_hi"), 1).otherwise(0),
    ).drop("p_lo", "p_hi")


def threeway_threshold_label(
    df: DataFrame,
    value_col: str,
    lo: float = -0.33,
    hi: float = 0.33,
    label_col: str = "label_3cls",
) -> DataFrame:
    """§2.8 — fixed 3-way threshold classifier (ref som_from_autoexport.py:
    186-203: valence <= -0.33 / >= +0.33)."""
    v = F.col(value_col)
    return df.withColumn(
        label_col, F.when(v <= lo, -1).when(v >= hi, 1).otherwise(0)
    )


def quality_multiplier(
    df: DataFrame,
    missing_flag_cols: list[str],
    out_col: str = "quality",
    factor: float = 0.8,
    floor: float = 0.5,
) -> DataFrame:
    """§2.8 — data-quality multiplier: *0.8 per missing domain, floored at
    0.5 (ref build_pbsi.py:179-186)."""
    n_missing = None
    for c in missing_flag_cols:
        term = F.coalesce(F.col(c).cast("int"), F.lit(0))
        n_missing = term if n_missing is None else n_missing + term
    return df.withColumn(
        out_col,
        F.round(F.greatest(F.pow(F.lit(factor), n_missing), F.lit(floor)), 6),
    )
