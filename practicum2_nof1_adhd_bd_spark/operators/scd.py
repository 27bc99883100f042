"""Slowly-changing-dimension (Type 2) history build + incremental merge.

The medallion upsert: a 100-TB silver layer cannot rebuild dimension
history from the full change log every batch, so the engine needs
``scd2_merge`` — fold ONE new change batch into the standing SCD2
artifact, touching only current rows and the batch — with the invariant

    scd2_merge(scd2_from_log(log[:t]), log[t:]) == scd2_from_log(log)

which is exactly what the ``scd2_merge_parity`` oracle attests (the
DuckDB twin rebuilds from the full log; the Spark side builds a
dimension from the first half and merges the second half in).

Both operators are pure relational algebra: the no-op collapse ("drop a
change that doesn't change the tracked value") is a single ``lag`` —
keeping rows that differ from their immediate predecessor is
run-length-encoding, so no iteration — and interval construction is a
single ``lead``. All windows partition by the dimension key: state per
task is one key's change history, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SEED_RANK = -1  # seeds sort before every batch change of the same key


def scd2_from_log(
    changes: DataFrame,
    key_col: str,
    order_cols: list[str],
    tracked_col: str,
) -> DataFrame:
    """Build a Type-2 dimension from a change log.

    Consecutive rows (per key, ordered by ``order_cols`` — pass enough
    columns to make the order total, e.g. ``["ts", "event_id"]``) whose
    ``tracked_col`` repeats are no-ops and collapse away; each surviving
    change opens a version valid from its first ``order_cols[0]`` until
    the next change (NULL for the current row).
    """
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    kept = (
        changes.select(key_col, *order_cols, tracked_col)
        .withColumn("_pv", F.lag(tracked_col).over(w))
        .filter(F.col("_pv").isNull() | (F.col(tracked_col) != F.col("_pv")))
    )
    wk = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    return kept.select(
        F.col(key_col),
        F.col(tracked_col),
        F.col(order_cols[0]).alias("valid_from"),
        F.lead(order_cols[0]).over(wk).alias("valid_to"),
        F.row_number().over(wk).alias("version"),
        F.lead(order_cols[0]).over(wk).isNull().cast("int").alias("is_current"),
    )


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    order_cols: list[str],
    tracked_col: str,
) -> DataFrame:
    """Fold a change batch into an existing SCD2 dimension.

    Closed versions (``is_current = 0``) pass through untouched — at
    scale that frame is read-only and never shuffles (the union is a
    plan-level concat). Each key's CURRENT row becomes the collapse seed
    for its batch changes: a first batch change equal to the standing
    value is a no-op (dropped), the first real change closes the current
    row, and later versions chain off the stored version number. Batch
    rows at or before their key's current ``valid_from`` would reorder
    attested history and are rejected loudly.

    New keys (present in the batch, absent from the dimension) seed from
    nothing: their first change is version 1.
    """
    cur = dim.filter(F.col("is_current") == 1).select(
        F.col(key_col),
        F.col(tracked_col),
        F.col("valid_from"),
        F.col("version").alias("_v0"),
    )
    seed = cur.select(
        key_col,
        tracked_col,
        F.col("valid_from").alias("_o0"),
        F.lit(_SEED_RANK).alias("_rk"),
        "_v0",
    )
    batch = changes.select(
        F.col(key_col),
        F.col(tracked_col),
        F.col(order_cols[0]).alias("_o0"),
        F.lit(0).alias("_rk"),
        F.lit(None).cast("int").alias("_v0"),
        *[F.col(c).alias(f"_t{i}") for i, c in enumerate(order_cols[1:])],
    )
    late = batch.join(
        cur.select(key_col, F.col("valid_from").alias("_cur_from")), key_col
    ).filter(F.col("_o0") <= F.col("_cur_from"))
    if late.limit(1).count() > 0:
        raise ValueError(
            "scd2_merge: batch contains changes at or before a key's "
            "current valid_from — history is append-only"
        )
    tie_cols = [f"_t{i}" for i in range(len(order_cols) - 1)]
    tie_types = {
        f"_t{i}": changes.schema[c].dataType
        for i, c in enumerate(order_cols[1:])
    }
    seed_full = seed.select(
        "*", *[F.lit(None).cast(tie_types[c]).alias(c) for c in tie_cols]
    ) if tie_cols else seed
    u = seed_full.unionByName(batch, allowMissingColumns=False)
    order_by = [F.col("_o0"), F.col("_rk")] + [F.col(c) for c in tie_cols]
    w = Window.partitionBy(key_col).orderBy(*order_by)
    kept = (
        u.withColumn("_pv", F.lag(tracked_col).over(w))
        .filter(F.col("_pv").isNull() | (F.col(tracked_col) != F.col("_pv")))
    )
    wk = Window.partitionBy(key_col).orderBy(*order_by)
    wbase = Window.partitionBy(key_col)
    fresh = kept.select(
        F.col(key_col),
        F.col(tracked_col),
        F.col("_o0").alias("valid_from"),
        F.lead("_o0").over(wk).alias("valid_to"),
        # seed (when present) is row 1 and must carry its stored version
        # v0, so later rows chain v0+1, v0+2...; a key with no seed is
        # new and versions start at 1
        F.when(
            F.max("_v0").over(wbase).isNotNull(),
            F.row_number().over(wk) + F.max("_v0").over(wbase) - 1,
        ).otherwise(F.row_number().over(wk)).alias("version"),
        F.lead("_o0").over(wk).isNull().cast("int").alias("is_current"),
    )
    closed = dim.filter(F.col("is_current") == 0).select(
        key_col, tracked_col, "valid_from", "valid_to", "version", "is_current"
    )
    return closed.unionByName(fresh)
