"""Temporal-CV classification — SURVEY.md §7 step 7 (ML tail).

The reference trains sklearn LogisticRegression(class_weight='balanced',
seed 42) per temporal fold and aggregates F1/balanced-accuracy across folds
(ref scripts/run_full_pipeline.py:1143-1374; src/etl/ml7_analysis.py:148-235).
Here each fold's fit is Spark MLlib (distributed lbfgs); the loop over folds
is driver-side but touches only fold metadata — all data movement stays in
executors. Folds with a single training class are skipped, matching the
reference's class-coverage gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import folds as folds_mod
from . import metrics as metrics_mod


def logreg_fold_cv(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    date_col: str = "date",
    train_days: int = 7,
    gap_days: int = 0,
    val_days: int = 3,
    max_iter: int = 50,
    reg_param: float = 0.01,
) -> DataFrame:
    """Train LogisticRegression per rolling-origin fold; report per-fold
    val-set accuracy and macro-F1. Labels may be any ints (e.g. -1/0/+1);
    they are shifted to a 0-based index for MLlib and shifted back for
    metric grouping. Deterministic: lbfgs on fixed data, no sampling."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    spark = df.sparkSession
    folded = folds_mod.day_folds(df, date_col, train_days, gap_days, val_days)
    folded = folded.withColumn(
        "label_idx", (F.col(label_col) - F.lit(-1)).cast("double")
    ).cache()

    fold_ids = [
        r["fold_id"]
        for r in folded.select("fold_id").distinct().orderBy("fold_id").collect()
    ]
    assembler = VectorAssembler(inputCols=feature_cols, outputCol="_feat_raw")
    scaler = StandardScaler(
        inputCol="_feat_raw", outputCol="_feat", withMean=True, withStd=True
    )

    def run_fold(fid):
        train = folded.filter(
            (F.col("fold_id") == fid) & (F.col("split") == "train")
        )
        val = folded.filter((F.col("fold_id") == fid) & (F.col("split") == "val"))
        n_train, n_val = train.count(), val.count()
        n_classes = train.select("label_idx").distinct().count()
        if n_train < 2 or n_val < 1 or n_classes < 2:
            return (int(fid), n_train, n_val, 0, None, None)
        scaler_model = scaler.fit(assembler.transform(train))
        tr_assembled = scaler_model.transform(assembler.transform(train))
        model = LogisticRegression(
            featuresCol="_feat",
            labelCol="label_idx",
            maxIter=max_iter,
            regParam=reg_param,
            family="multinomial",
        ).fit(tr_assembled)
        va_assembled = scaler_model.transform(assembler.transform(val))
        pred = model.transform(va_assembled).select(
            (F.col("label_idx") + F.lit(-1)).cast("int").alias("y_true"),
            (F.col("prediction") + F.lit(-1)).cast("int").alias("y_pred"),
        )
        acc_row = pred.agg(
            F.avg((F.col("y_true") == F.col("y_pred")).cast("double")).alias("acc")
        ).collect()[0]
        macro = metrics_mod.macro_summary(
            metrics_mod.per_class_report(pred)
        ).collect()[0]
        return (
            int(fid),
            n_train,
            n_val,
            1,
            round(float(acc_row["acc"]), 6),
            float(macro["macro_f1"]) if macro["macro_f1"] is not None else None,
        )

    # folds are independent: submit them as concurrent Spark jobs (the
    # scheduler interleaves their stages across the executor pool; the
    # reference trains folds strictly sequentially)
    from concurrent.futures import ThreadPoolExecutor

    try:
        with ThreadPoolExecutor(max_workers=min(4, max(1, len(fold_ids)))) as pool:
            results = list(pool.map(run_fold, fold_ids))
    finally:
        folded.unpersist()
    return spark.createDataFrame(
        results,
        "fold_id int, n_train bigint, n_val bigint, usable int, "
        "accuracy double, macro_f1 double",
    )
