"""Unit tests — W7 auto-segmentation, W11 anchor, W13 modal label, A14 metrics."""

import datetime as dt

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import metrics, windows


def _daily(spark, vals, start="2024-01-01", gaps=()):
    d0 = dt.date.fromisoformat(start)
    rows, off = [], 0
    for i, v in enumerate(vals):
        if i in gaps:
            off += 5  # insert a 5-day hole before this row
        rows.append((d0 + dt.timedelta(days=i + off), float(v)))
    return spark.createDataFrame(rows, "date date, v double")


def test_auto_segment_gap_trigger(spark):
    df = _daily(spark, [10] * 10, gaps=(5,))
    out = windows.auto_segment_triggers(
        df, "date", "v", shift_threshold=100.0, min_gap_days=3
    ).orderBy("date").collect()
    reasons = [r["trigger_reason"] for r in out]
    assert reasons[0] == "start"
    assert reasons[5] == "gap_recovery"
    assert {r["segment_id"] for r in out} == {1, 2}


def test_auto_segment_shift_trigger(spark):
    # 10 days at 10.0 then 10 days at 50.0 -> shift trigger at the step
    df = _daily(spark, [10] * 10 + [50] * 10)
    out = windows.auto_segment_triggers(
        df, "date", "v", shift_threshold=8.0, min_gap_days=3
    ).orderBy("date").collect()
    shift_days = [str(r["date"]) for r in out if r["trigger_reason"] == "signal_shift"]
    assert "2024-01-11" in shift_days  # first day of the new regime
    assert out[-1]["segment_id"] >= 2


def test_anchor_first_qualifying(spark):
    # 5 days label 0, then mixed: first 3-row window with 2 classes starts day 3
    rows = [(dt.date(2024, 1, d), lab) for d, lab in
            [(1, 0), (2, 0), (3, 0), (4, 1), (5, 0), (6, 1)]]
    df = spark.createDataFrame(rows, "date date, label int")
    out = windows.anchor_first_qualifying(df, "date", "label", window_rows=3).collect()
    assert str(out[0]["anchor_date"]) == "2024-01-02"  # window 02-04 hits {0,1}


def test_rolling_modal_label_tiebreak(spark):
    rows = [(dt.date(2024, 1, d + 1), lab) for d, lab in
            enumerate([1, 1, -1, -1, 0, 0, 0, 1])]
    df = spark.createDataFrame(rows, "date date, label int")
    out = windows.rolling_modal_label(df, "date", "label", window=7).orderBy("date").collect()
    assert out[0]["modal_label"] is None          # empty trailing window
    assert out[1]["modal_label"] == 1             # only {1}
    assert out[4]["modal_label"] == -1            # {1,1,-1,-1}: tie -> smaller label
    assert out[7]["modal_label"] == 0             # {1,1,-1,-1,0,0,0}: mode 0


def test_per_class_report_known_cm(spark):
    # y_true/y_pred pairs with a known confusion matrix
    pairs = [(1, 1)] * 3 + [(1, 0)] * 1 + [(0, 0)] * 4 + [(0, 1)] * 2
    df = spark.createDataFrame(pairs, "y_true int, y_pred int")
    rep = {r["label"]: r for r in metrics.per_class_report(df).collect()}
    # class 1: tp=3, n_pred=5, n_true=4 -> P=0.6 R=0.75 F1=2*.45/1.35
    assert rep[1]["tp"] == 3 and rep[1]["fp"] == 2 and rep[1]["fn"] == 1
    assert rep[1]["precision"] == 0.6
    assert rep[1]["recall"] == 0.75
    assert abs(rep[1]["f1"] - 2 * 0.6 * 0.75 / 1.35) < 1e-6
    # class 0: tp=4, n_pred=5, n_true=6
    assert rep[0]["precision"] == 0.8
    assert rep[0]["recall"] == round(4 / 6, 6)


def test_per_class_report_never_predicted(spark):
    pairs = [(1, 0), (0, 0), (1, 0)]
    df = spark.createDataFrame(pairs, "y_true int, y_pred int")
    rep = {r["label"]: r for r in metrics.per_class_report(df).collect()}
    assert rep[1]["precision"] is None  # class 1 never predicted -> undefined
    assert rep[1]["recall"] == 0.0
    assert rep[1]["f1"] is None


def test_macro_summary(spark):
    pairs = [(1, 1), (0, 0), (1, 1), (0, 1)]
    df = spark.createDataFrame(pairs, "y_true int, y_pred int")
    rep = metrics.per_class_report(df)
    m = metrics.macro_summary(rep).collect()[0]
    assert m["n_classes"] == 2
    assert m["total_tp"] == 3
    assert m["total_support"] == 4


def test_calibration_report_bins_and_rates(spark):
    """Perfectly calibrated bins report mean_score ~ frac_positive; scores
    at the top edge fold into the last bin."""
    from practicum2_nof1_adhd_bd_spark.operators import metrics

    rows = (
        [(0.05, 0)] * 9 + [(0.05, 1)] * 1      # bin 0: 10% positive
        + [(0.95, 1)] * 9 + [(0.95, 0)] * 1    # bin 9: 90% positive
        + [(1.0, 1)]                           # 1.0 folds into bin 9
    )
    df = spark.createDataFrame(rows, "score double, outcome int")
    out = {r["bin"]: r for r in metrics.calibration_report(df).collect()}
    assert set(out) == {0, 9}
    assert out[0]["n"] == 10 and out[0]["frac_positive"] == 0.1
    assert out[9]["n"] == 11
    assert abs(out[9]["mean_score"] - (10 * 0.95 + 1.0) / 11) < 1e-6
    assert abs(out[9]["frac_positive"] - 10 / 11) < 1e-6


def test_auc_score_known_values(spark):
    """AUC matches hand-computed values: perfect separation -> 1.0,
    reversed -> 0.0, all-tied -> 0.5, and a mixed case with ties matches
    the Mann-Whitney formula."""
    from practicum2_nof1_adhd_bd_spark.operators import metrics

    def auc(rows):
        df = spark.createDataFrame(rows, "score double, outcome int")
        r = metrics.auc_score(df).collect()[0]
        return r["auc"], r["n_pos"], r["n_neg"]

    assert auc([(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])[0] == 1.0
    assert auc([(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)])[0] == 0.0
    assert auc([(0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0)])[0] == 0.5
    # mixed with a tie: pairs (pos>neg)=3 of 4, tied pair contributes 0.5
    # scores: pos {0.8, 0.4}, neg {0.4, 0.1}:
    #   0.8>0.4, 0.8>0.1, 0.4>0.1 -> 3 ; 0.4==0.4 -> 0.5 ; AUC = 3.5/4
    a, p, n = auc([(0.8, 1), (0.4, 1), (0.4, 0), (0.1, 0)])
    assert (a, p, n) == (0.875, 2, 2)
