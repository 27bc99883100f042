"""Per-segment iterative imputation — SURVEY.md §2.4 A13.

The reference runs sklearn IterativeImputer (MICE, max_iter=10, seed 42)
per temporal segment with >= 5 rows; all-NaN columns become 0 and segments
too small fall back to the global median (ref run_full_pipeline.py:910-969).

sklearn is not available in this environment, so the iterative imputer is a
deterministic numpy re-implementation of the same algorithm family: each
feature with missing values is regressed (ridge, closed-form) on the other
features, missing cells are re-estimated, and the loop repeats until
convergence or max_iter. Runs as grouped applyInPandas — one group per
segment, thousands of segments impute in parallel; only the global-median
fallback is a (broadcast) scalar aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _iterative_impute(mat: np.ndarray, max_iter: int = 10, ridge: float = 1e-3,
                      tol: float = 1e-4) -> np.ndarray:
    """Deterministic MICE-style round-robin ridge imputation (numpy only)."""
    mat = mat.astype("float64", copy=True)
    miss = np.isnan(mat)
    n, d = mat.shape
    col_means = np.zeros(d)
    for j in range(d):
        obs = ~miss[:, j]
        col_means[j] = mat[obs, j].mean() if obs.any() else 0.0
        mat[miss[:, j], j] = col_means[j]
    order = [j for j in range(d) if miss[:, j].any() and not miss[:, j].all()]
    for _ in range(max_iter):
        max_delta = 0.0
        for j in order:
            others = [k for k in range(d) if k != j]
            X = np.column_stack([mat[:, others], np.ones(n)])
            obs = ~miss[:, j]
            if obs.sum() < 2:
                continue
            A = X[obs].T @ X[obs] + ridge * np.eye(X.shape[1])
            beta = np.linalg.solve(A, X[obs].T @ mat[obs, j])
            pred = X[~obs] @ beta
            delta = np.abs(mat[~obs, j] - pred).max() if pred.size else 0.0
            max_delta = max(max_delta, float(delta))
            mat[~obs, j] = pred
        if max_delta < tol:
            break
    return mat


def impute_per_segment(
    df: DataFrame,
    feature_cols: list[str],
    segment_col: str = "segment_id",
    min_rows: int = 5,
    max_iter: int = 10,
) -> DataFrame:
    """A13 — per-segment iterative imputation with global-median fallback.

    Segments with >= min_rows impute iteratively; smaller segments (and
    all-null columns) fill with the GLOBAL exact median / 0.0, matching the
    reference's fallback chain. Output schema = input schema with feature
    columns imputed (doubles, no nulls).
    """
    other_cols = [c for c in df.columns if c not in feature_cols]
    medians_row = df.agg(
        *[
            F.expr(f"percentile({c}, 0.5)").alias(f"_med_{c}")
            for c in feature_cols
        ]
    ).collect()[0]
    medians = {
        c: (medians_row[f"_med_{c}"] if medians_row[f"_med_{c}"] is not None else 0.0)
        for c in feature_cols
    }

    out_fields = ", ".join(
        [f"`{c}` {dict(df.dtypes)[c]}" for c in other_cols]
        + [f"`{c}` double" for c in feature_cols]
    )
    schema = StructType.fromDDL(out_fields)

    def impute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        feats = pdf[feature_cols].astype("float64")
        if len(pdf) >= min_rows and feats.notna().any().any():
            mat = _iterative_impute(feats.to_numpy(), max_iter=max_iter)
            imputed = pd.DataFrame(mat, columns=feature_cols, index=pdf.index)
            # all-NaN columns inside a segment: global median fallback
            for c in feature_cols:
                if feats[c].isna().all():
                    imputed[c] = medians[c]
        else:
            imputed = feats
            for c in feature_cols:
                imputed[c] = imputed[c].fillna(medians[c])
        for c in feature_cols:
            pdf[c] = imputed[c]
        return pdf[other_cols + feature_cols]

    return df.groupBy(segment_col).applyInPandas(impute, schema)
