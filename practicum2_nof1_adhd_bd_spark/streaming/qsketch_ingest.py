"""Streaming quantile-sketch maintenance — incremental percentiles over
a live stream, the stored-artifact twin of ``sketches.qhist_sketch``.

The gap this closes (r12 verdict #7): ``approx_percentile``'s KLL state
is engine-private and dies with the query, so corpus-scale percentile
stats (token lengths, doc sizes) had to re-scan history on every
refresh. The fixed-grid sketch's EXACT merge law — qhist(A ∪ B) =
qhist(A) +_bucket qhist(B) — makes the streaming form almost
embarrassingly simple and exactly-once BY CONSTRUCTION:

- each micro-batch writes its OWN batch sketch to a ``batch={id}``
  partition dir with mode=overwrite — a foreachBatch replay of the same
  batch_id replaces its partial output instead of double-counting, with
  no commit marker, no read-modify-write, and no swap protocol (there
  is only one output and addition is idempotent per batch dir);
- the ARTIFACT is the union of batch dirs; any reader merges with one
  bucket-grain sum (``read_merged_sketch``), and the merge law
  guarantees the result equals the sketch of everything ever streamed,
  regardless of how rows were split into batches;
- dir accretion is the decisions-sink problem solved in r13, with the
  SAME layout — ``corpus_ingest.maybe_compact_decisions`` applies
  verbatim (the archive's extra ``src_batch`` column is dropped by the
  bucket-grain merge), wired via ``compact_max_dirs``.

State never lives in executor memory and never grows with row count:
a batch contributes (groups × occupied buckets) rows, bounded by the
grid, not the batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import qhist_sketch
from .corpus_ingest import maybe_compact_decisions, recover_decisions_compaction


def qsketch_stream(
    stream_df: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
    n_buckets: int = 1024,
    lo: float = 0.0,
    hi: float = 1024.0,
    compact_max_dirs: int | None = None,
    keep_last: int = 8,
):
    """foreachBatch wiring: per micro-batch, sketch the batch and land it
    under ``batch={batch_id}`` (overwrite = replay-idempotent). Returns
    the started StreamingQuery. ``compact_max_dirs`` (optional) runs the
    decisions-sink retention policy in the batch gap: old batch dirs
    roll into the ``batch=-1`` archive under the crash-safe
    precompact/swap — counts are summable wherever they live, so
    compaction never changes the merged sketch."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        recover_decisions_compaction(spark, sketch_dir)
        sk = qhist_sketch(batch, group_cols, value_col, n_buckets, lo, hi)
        sk.coalesce(1).write.mode("overwrite").parquet(
            f"{sketch_dir}/batch={batch_id}"
        )
        if compact_max_dirs is not None:
            schema = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in sk.schema
            )
            maybe_compact_decisions(
                spark,
                sketch_dir,
                batch_id,
                max_batch_dirs=compact_max_dirs,
                keep_last=keep_last,
                schema=schema,
            )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_merged_sketch(
    spark, sketch_dir: str, group_cols: list[str]
) -> DataFrame:
    """Merge every landed batch sketch (live ``batch=N`` dirs AND the
    compacted ``batch=-1`` archive) into the current corpus-wide sketch:
    one bucket-grain sum. The merge law makes this equal to sketching
    everything ever streamed in one pass — the property the
    ``streaming_qsketch_stats`` oracle hash-attests."""
    df = spark.read.parquet(sketch_dir)
    return df.groupBy(*group_cols, "bucket").agg(F.sum("n").alias("n"))


def kmv_stream(
    stream_df: DataFrame,
    sketch_dir: str,
    checkpoint_dir: str,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    compact_max_dirs: int | None = None,
    keep_last: int = 8,
):
    """Streaming distinct-count maintenance — the KMV twin of
    ``qsketch_stream``, by the bottom-k merge law: bottomk(A ∪ B) =
    bottomk(bottomk(A) ∪ bottomk(B)), so each micro-batch lands only
    its OWN bottom-k hashes (exploded (group, h) rows, <= k per group)
    under ``batch={id}`` with overwrite (replay-idempotent, same as the
    qhist sink), and any later reader recovers the exact whole-stream
    sketch with one dedup + slice. Per-batch state: <= groups x k
    64-bit hashes — independent of batch row count. Retention reuses
    the decisions archive verbatim: archived rows keep their h values
    and the merged read dedups, so compaction never changes the
    estimate."""
    from ..operators.sketches import kmv_sketch

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        recover_decisions_compaction(spark, sketch_dir)
        sk = kmv_sketch(batch, group_cols, value_col, k).select(
            *group_cols, F.explode("kmin").alias("h")
        )
        sk.coalesce(1).write.mode("overwrite").parquet(
            f"{sketch_dir}/batch={batch_id}"
        )
        if compact_max_dirs is not None:
            schema = ", ".join(
                f"{f.name} {f.dataType.simpleString()}" for f in sk.schema
            )
            maybe_compact_decisions(
                spark,
                sketch_dir,
                batch_id,
                max_batch_dirs=compact_max_dirs,
                keep_last=keep_last,
                schema=schema,
            )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_merged_kmv(
    spark, sketch_dir: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """The whole-stream bottom-k sketch from every landed batch (live
    batch=N dirs and the batch=-1 archive alike): dedup the union of
    per-batch hashes and keep the k smallest per group — exactly
    kmv_sketch's output shape, by the merge law. The collect_set
    buffer is bounded by k x landed dirs per group, never by stream
    volume."""
    df = spark.read.parquet(sketch_dir)
    return df.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_set("h")), 1, k).alias("kmin")
    )
