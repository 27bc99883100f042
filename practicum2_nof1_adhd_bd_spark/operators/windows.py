"""Window operators — SURVEY.md §2.5 W1-W9.

The reference's rolling stats / segmenters are pandas ``.rolling`` loops
(ref prejoin_enricher.py:71-92, run_full_pipeline.py:664-708). Here each is a
Spark window expression. Scale notes:

- Every window below takes ``partition_cols``; an *unpartitioned* ordered
  window is a single-task bottleneck at 100 TB, acceptable only for
  daily-grain frames (a few thousand rows after aggregation, by construction).
  Event-grain windows must partition by entity (user/participant).
- Rolling correlation is composed from window aggregates (one shuffle, all
  stats share the same frame) rather than a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _w(order_col: str, partition_cols: list[str] | None, lo: int, hi: int) -> WindowSpec:
    w = Window.partitionBy(*(partition_cols or [])).orderBy(order_col)
    return w.rowsBetween(lo, hi)


def rolling_mean(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    window: int = 7,
    partition_cols: list[str] | None = None,
    min_periods: int = 1,
    round_dp: int | None = 6,
) -> DataFrame:
    """W1 — trailing k-row rolling mean, min_periods=1
    (ref prejoin_enricher.py:71-92: rolling(7, min_periods=1).mean()).
    round_dp=None leaves the raw double (caller handles presentation)."""
    w = _w(order_col, partition_cols, -(window - 1), 0)
    out = df
    for c in value_cols:
        mean = F.avg(c).over(w)
        if min_periods > 1:
            mean = F.when(F.count(c).over(w) >= min_periods, mean)
        if round_dp is not None:
            mean = F.round(mean, round_dp)
        out = out.withColumn(f"{c}_roll{window}", mean)
    return out


def global_zscore(
    df: DataFrame, value_cols: list[str], round_dp: int = 6
) -> DataFrame:
    """W2 — whole-frame z-score per column (ref prejoin_enricher.py:59-68).

    Global moments are computed as a scalar aggregate and broadcast back via
    cross-join — NOT an unpartitioned window, which would funnel every row
    through one task at 100 TB.
    """
    stats = df.agg(
        *[F.avg(c).alias(f"_mu_{c}") for c in value_cols],
        *[F.stddev_samp(c).alias(f"_sd_{c}") for c in value_cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    for c in value_cols:
        mu, sd = F.col(f"_mu_{c}"), F.col(f"_sd_{c}")
        out = out.withColumn(
            f"z_{c}",
            F.round(F.when(sd > 0, (F.col(c) - mu) / sd).otherwise(F.lit(0.0)), round_dp),
        )
    return out.drop(*[f"_mu_{c}" for c in value_cols], *[f"_sd_{c}" for c in value_cols])


def rolling_corr(
    df: DataFrame,
    order_col: str,
    x_col: str,
    y_col: str,
    window: int = 7,
    partition_cols: list[str] | None = None,
    out_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """W3 — trailing k-row Pearson correlation of two columns
    (ref postjoin_enricher.py:18-36: col1.rolling(7).corr(col2)).

    Composed from window moments over ONE shared frame:
    corr = (E[xy]-E[x]E[y]) / (std_pop(x)*std_pop(y)); null when either
    std is 0 (matches pandas NaN on constant windows). Pairwise-complete:
    moments are computed over rows where both x and y are non-null.
    """
    w = _w(order_col, partition_cols, -(window - 1), 0)
    x = F.when(F.col(y_col).isNotNull(), F.col(x_col))
    y = F.when(F.col(x_col).isNotNull(), F.col(y_col))
    exy = F.avg(x * y).over(w)
    ex, ey = F.avg(x).over(w), F.avg(y).over(w)
    sx, sy = F.stddev_pop(x).over(w), F.stddev_pop(y).over(w)
    corr = F.when((sx > 0) & (sy > 0), (exy - ex * ey) / (sx * sy))
    return df.withColumn(out_col or f"corr_{x_col}_{y_col}", F.round(corr, round_dp))


def forward_fill(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """W5 (ffill half) — last non-null carried forward
    (ref postjoin_enricher.py:54-88)."""
    w = Window.partitionBy(*(partition_cols or [])).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def linear_interpolate(
    df: DataFrame,
    order_col: str,
    value_col: str,
    partition_cols: list[str] | None = None,
    out_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """W5 (interpolate half) — linear interpolation across null gaps on an
    evenly-indexable order column, then edges left as nearest non-null
    (ref postjoin_enricher.py:54-88: interpolate(linear, both) + ffill).

    Pure window algebra: previous/next non-null value and their positions via
    last/first(ignorenulls) over backward/forward frames; fill fraction from
    row-number distance.
    """
    parts = partition_cols or []
    pos_w = Window.partitionBy(*parts).orderBy(order_col)
    back = pos_w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = pos_w.rowsBetween(0, Window.unboundedFollowing)
    pos = F.row_number().over(pos_w)
    v = F.col(value_col)
    tagged = df.withColumn("_pos", pos).withColumn(
        "_vpos", F.when(v.isNotNull(), pos)
    )
    prev_v = F.last(value_col, ignorenulls=True).over(back)
    prev_p = F.last("_vpos", ignorenulls=True).over(back)
    next_v = F.first(value_col, ignorenulls=True).over(fwd)
    next_p = F.first("_vpos", ignorenulls=True).over(fwd)
    frac = (F.col("_pos") - prev_p) / (next_p - prev_p)
    interp = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNotNull() & next_v.isNotNull(), prev_v + (next_v - prev_v) * frac)
        .when(prev_v.isNotNull(), prev_v)
        .otherwise(next_v)
    )
    return (
        tagged.withColumn(out_col or f"{value_col}_interp", F.round(interp, round_dp))
        .drop("_pos", "_vpos")
    )


def gaps_and_islands(
    df: DataFrame,
    date_col: str = "date",
    partition_cols: list[str] | None = None,
    max_gap_days: int = 1,
    break_on_month: bool = True,
    id_col: str = "segment_id",
) -> DataFrame:
    """W6 — segment-id assignment: new segment when the date gap exceeds
    ``max_gap_days`` or the calendar month changes
    (ref run_full_pipeline.py:664-708; stage_apply_labels.py:37-81).
    1-indexed running count of triggers. The keystone operator: segments feed
    z-scoring (A7), imputation (A13) and drift windows (J8)."""
    parts = partition_cols or []
    w = Window.partitionBy(*parts).orderBy(date_col)
    d = F.col(date_col)
    prev = F.lag(date_col).over(w)
    gap_trigger = F.datediff(d, prev) > max_gap_days
    month_trigger = (
        (F.month(d) != F.month(prev)) | (F.year(d) != F.year(prev))
        if break_on_month
        else F.lit(False)
    )
    is_new = F.when(prev.isNull() | gap_trigger | month_trigger, 1).otherwise(0)
    cum = Window.partitionBy(*parts).orderBy(date_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(id_col, F.sum(is_new).over(cum))


def segment_summary(
    seg_df: DataFrame,
    date_col: str = "date",
    partition_cols: list[str] | None = None,
    id_col: str = "segment_id",
) -> DataFrame:
    """W6 companion — per-segment start/end/count/duration
    (ref segment_autolog.csv, run_full_pipeline.py:704-708)."""
    parts = partition_cols or []
    return seg_df.groupBy(*parts, id_col).agg(
        F.min(date_col).alias("date_start"),
        F.max(date_col).alias("date_end"),
        F.count(F.lit(1)).alias("n_days"),
        (F.datediff(F.max(date_col), F.min(date_col)) + 1).alias("duration_days"),
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    gap_minutes: int = 30,
    id_col: str = "session_id",
) -> DataFrame:
    """W6 at event grain — per-user session ids with a time-gap rule.
    Generalization of the reference's daily gap segmenter to timestamps;
    partitions by user so it scales horizontally."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    # unix_timestamp over an explicit TIMESTAMP cast handles both TIMESTAMP
    # and TIMESTAMP_NTZ inputs (a bare numeric cast of NTZ is rejected).
    gap = F.unix_timestamp(F.col(ts_col).cast("timestamp")) - F.unix_timestamp(
        prev.cast("timestamp")
    )
    is_new = F.when(prev.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(id_col, F.sum(is_new).over(cum))


def auto_segment_triggers(
    df: DataFrame,
    date_col: str,
    value_col: str,
    partition_cols: list[str] | None = None,
    shift_threshold: float = 8.0,
    min_gap_days: int = 3,
    window: int = 7,
    min_density: int = 5,
    id_col: str = "segment_id",
) -> DataFrame:
    """W7 — rule-based auto-segmentation (ref src/labels/auto_segment.py:29-228).

    Declarative re-expression of the reference's trigger scan: a new segment
    starts on (a) gap recovery — the previous observed day is >= min_gap_days
    behind; (b) sustained signal shift — |mean(next `window` rows) -
    mean(prev `window` rows)| >= shift_threshold with both windows at least
    `min_density` dense. (The reference's 60-day fallback depends on the
    previous boundary — inherently sequential — and is intentionally not
    reproduced; gaps-and-islands covers calendar resets.) Emits
    `trigger_reason` plus a running 1-indexed segment id.
    """
    parts = partition_cols or []
    base = Window.partitionBy(*parts).orderBy(date_col)
    w_prev = base.rowsBetween(-window, -1)
    w_next = base.rowsBetween(0, window - 1)
    prev_day = F.lag(date_col).over(base)
    gap = F.datediff(F.col(date_col), prev_day) >= min_gap_days
    shift = (
        (F.count(value_col).over(w_prev) >= min_density)
        & (F.count(value_col).over(w_next) >= min_density)
        & (
            F.abs(F.avg(value_col).over(w_next) - F.avg(value_col).over(w_prev))
            >= shift_threshold
        )
    )
    reason = (
        F.when(prev_day.isNull(), "start")
        .when(gap, "gap_recovery")
        .when(shift, "signal_shift")
    )
    out = df.withColumn("trigger_reason", reason)
    cum = base.rowsBetween(Window.unboundedPreceding, 0)
    return out.withColumn(
        id_col,
        F.sum(F.col("trigger_reason").isNotNull().cast("int")).over(cum),
    )


def anchor_first_qualifying(
    df: DataFrame,
    date_col: str,
    label_col: str,
    window_rows: int = 180,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """W11 — first date whose next-`window_rows` window holds >= 2 distinct
    labels (ref ml7_analysis.py:172-183). Distinctness over the forward frame
    is expressed as max != min (labels are ordinal -1/0/+1), which both
    engines evaluate without a distinct-over-window. Returns one row per
    partition (or one row total) with the anchor date."""
    parts = partition_cols or []
    fwd = Window.partitionBy(*parts).orderBy(date_col).rowsBetween(0, window_rows - 1)
    qual = (
        (F.count(label_col).over(fwd) == window_rows)
        & (F.max(label_col).over(fwd) != F.min(label_col).over(fwd))
    )
    flagged = df.withColumn("_qual", qual)
    return (
        flagged.filter(F.col("_qual"))
        .groupBy(*parts)
        .agg(F.min(date_col).alias("anchor_date"))
    )


def rolling_modal_label(
    df: DataFrame,
    order_col: str,
    label_col: str,
    window: int = 7,
    partition_cols: list[str] | None = None,
    out_col: str = "modal_label",
) -> DataFrame:
    """W13 — trailing `window`-row modal label EXCLUDING the current row
    (the reference's fallback predictor when the previous day is missing,
    ref pipeline_overview.md:284-292). Labels are the ordinal set -1/0/+1;
    the mode is an argmax over three conditional counts with ties broken
    toward the smaller label — deterministic, and identical CASE logic runs
    on the SQL oracle."""
    w = _w(order_col, partition_cols, -window, -1)
    lab = F.col(label_col)
    c_neg = F.count(F.when(lab == -1, 1)).over(w)
    c_zero = F.count(F.when(lab == 0, 1)).over(w)
    c_pos = F.count(F.when(lab == 1, 1)).over(w)
    modal = (
        F.when(c_neg + c_zero + c_pos == 0, F.lit(None).cast("int"))
        .when((c_neg >= c_zero) & (c_neg >= c_pos), -1)
        .when(c_zero >= c_pos, 0)
        .otherwise(1)
    )
    return df.withColumn(out_col, modal)


def lag_baseline(
    df: DataFrame,
    order_col: str,
    value_col: str,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """W8 — persistence baseline y_hat[t] = y[t-1]
    (ref ml_metrics_extended.py:201-228)."""
    w = Window.partitionBy(*(partition_cols or [])).orderBy(order_col)
    return df.withColumn(f"{value_col}_pred", F.lag(value_col, 1).over(w))


def sliding_sequences(
    df: DataFrame,
    order_col: str,
    feature_col: str,
    seq_len: int = 14,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """W9 — trailing fixed-length sequences ending at each row; rows whose
    history is shorter than seq_len are dropped
    (ref ml7_analysis.py:475-493: 14-day LSTM windows, label = last day)."""
    w = _w(order_col, partition_cols, -(seq_len - 1), 0)
    out = df.withColumn("sequence", F.collect_list(feature_col).over(w))
    return out.filter(F.size("sequence") == seq_len)
