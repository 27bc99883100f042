"""Classification-metric aggregation — SURVEY.md §2.4 A14.

The reference element-wise sums confusion matrices across folds and reports
mean +- std per metric (ref src/etl/ml_metrics_extended.py:276-399). Here the
confusion matrix IS a groupBy((y_true, y_pred)).count() — a tiny relational
table — and the per-class precision/recall/F1 derive from three aggregations
of it. Everything after the first groupBy runs on a frame with at most
n_classes^2 rows, so the heavy input scan happens exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import safe_div


def confusion_matrix(
    df: DataFrame, y_true: str = "y_true", y_pred: str = "y_pred"
) -> DataFrame:
    """CM as a relational table: one row per (true, pred) cell with count."""
    return df.filter(
        F.col(y_true).isNotNull() & F.col(y_pred).isNotNull()
    ).groupBy(y_true, y_pred).agg(F.count(F.lit(1)).alias("n"))


def per_class_report(
    df: DataFrame,
    y_true: str = "y_true",
    y_pred: str = "y_pred",
    round_dp: int = 6,
) -> DataFrame:
    """A14 — per-class TP/FP/FN + precision/recall/F1.

    Classes = union of observed true and predicted labels. Division by zero
    (a class never predicted / never occurring) yields null, matching
    sklearn's undefined-metric semantics before zero_division coercion.
    """
    cm = confusion_matrix(df, y_true, y_pred)
    classes = (
        cm.select(F.col(y_true).alias("label"))
        .union(cm.select(F.col(y_pred).alias("label")))
        .distinct()
    )
    tp = cm.filter(F.col(y_true) == F.col(y_pred)).select(
        F.col(y_true).alias("label"), F.col("n").alias("tp")
    )
    n_true = cm.groupBy(F.col(y_true).alias("label")).agg(
        F.sum("n").alias("n_true")
    )
    n_pred = cm.groupBy(F.col(y_pred).alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    out = (
        classes.join(tp, "label", "left")
        .join(n_true, "label", "left")
        .join(n_pred, "label", "left")
        .fillna(0, subset=["tp", "n_true", "n_pred"])
    )
    precision = safe_div(F.col("tp").cast("double"), F.col("n_pred"))
    recall = safe_div(F.col("tp").cast("double"), F.col("n_true"))
    out = out.withColumn("precision", F.round(precision, round_dp)).withColumn(
        "recall", F.round(recall, round_dp)
    )
    f1 = safe_div(
        2 * F.col("precision") * F.col("recall"),
        F.col("precision") + F.col("recall"),
    )
    return out.withColumn("f1", F.round(f1, round_dp)).withColumn(
        "fp", F.col("n_pred") - F.col("tp")
    ).withColumn("fn", F.col("n_true") - F.col("tp"))


def macro_summary(report: DataFrame, round_dp: int = 6) -> DataFrame:
    """Macro-averaged precision/recall/F1 + accuracy-style totals from a
    per-class report (mean over classes, null metrics excluded — sklearn
    macro semantics). The inputs are already rounded to 6 dp, so summing
    them as DECIMAL(18,6) is exact and order-independent — no float-sum
    wobble at the final round boundary."""

    def _mean(c: str):
        return F.round(
            F.sum(F.col(c).cast("decimal(18,6)")).cast("double") / F.count(c),
            round_dp,
        )

    return report.agg(
        F.count(F.lit(1)).alias("n_classes"),
        _mean("precision").alias("macro_precision"),
        _mean("recall").alias("macro_recall"),
        _mean("f1").alias("macro_f1"),
        F.sum("tp").alias("total_tp"),
        F.sum(F.col("tp") + F.col("fn")).alias("total_support"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str = "score",
    outcome_col: str = "outcome",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins: partition [0, 1] scores into ``n_bins``
    equal-width bins and report, per bin, the count, mean predicted
    score, and observed positive fraction — the table behind calibration
    curves / ECE (Guo et al. 2017 style). A well-calibrated scorer has
    mean_score ~ frac_positive per bin.

    One map-side-combined aggregate over the scored frame; the output is
    at most n_bins rows. Scores are expected pre-rounded (6 dp) so the
    bin edge floor(score * n_bins) is engine-stable; outcomes are 0/1."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        df.filter(F.col(score_col).isNotNull() & F.col(outcome_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # scores are 6dp — summing them as DECIMAL is exact and
            # order-independent, so the final round cannot flip at a
            # half-way boundary (a plain double avg of two 6dp values
            # measured one such flip against the oracle)
            F.round(
                F.sum(F.col(score_col).cast("decimal(18,6)")).cast("double")
                / F.count(score_col),
                6,
            ).alias("mean_score"),
            F.round(F.avg(F.col(outcome_col).cast("int")), 6).alias(
                "frac_positive"
            ),
        )
        .orderBy("bin")
    )


def auc_score(
    df: DataFrame,
    score_col: str = "score",
    outcome_col: str = "outcome",
) -> DataFrame:
    """Binary ROC-AUC without a global sort over rows (ref
    src/nb_common/metrics.py:77 computes sklearn roc_auc_score on the
    collected arrays; this is the distributed form). Mann-Whitney
    identity over DISTINCT scores: with p_s / n_s the positive /
    negative counts at score s and cum_n(s) the negatives strictly
    below s,

        AUC = [ sum_s p_s * cum_n(s) + 0.5 * sum_s p_s * n_s ] / (P*N)

    The heavy input collapses map-side to one row per distinct score
    (bounded by score precision — 1e6+1 rows at 6 dp no matter the
    corpus), and only that tiny frame flows through the ordered window.
    The numerator is kept as the integer 2*sum (ties contribute p*n, an
    integer), so the only float op is one final division — no
    combine-order wobble anywhere."""
    from pyspark.sql import Window

    per_score = (
        df.filter(F.col(score_col).isNotNull() & F.col(outcome_col).isNotNull())
        .groupBy(F.col(score_col).alias("_s"))
        .agg(
            F.sum(F.col(outcome_col).cast("bigint")).alias("_p"),
            F.sum(F.lit(1) - F.col(outcome_col).cast("bigint")).alias("_n"),
        )
    )
    w = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, -1)
    terms = per_score.withColumn(
        "_cum_n", F.coalesce(F.sum("_n").over(w), F.lit(0))
    )
    return terms.agg(
        F.sum("_p").alias("n_pos"),
        F.sum("_n").alias("n_neg"),
        F.round(
            F.sum(2 * F.col("_p") * F.col("_cum_n") + F.col("_p") * F.col("_n"))
            .cast("double")
            / (2.0 * F.sum("_p") * F.sum("_n")),
            6,
        ).alias("auc"),
    )
