"""Streaming incremental VECTOR ingestion — semantic (embedding-space)
near-dup screening of an embedding stream against a STORED vector index.

The text pipeline's ``corpus_ingest`` answers "have we ingested this
document (or a near copy) before?" via hash + MinHash signatures. This
module is its embedding-space sibling, the streaming form of SemDeDup
(`semantic_dedup_bucketed`): each micro-batch of vectors is screened
against a disk-backed index of previously admitted vectors, and only
semantically novel ones are admitted and appended. That is how an
embedding-deduplicated training corpus stays deduplicated under
continuous ingestion.

Per micro-batch work:

1. ONE projection over the batch: double vector, axis-sign bucket
   (sim.axis_sign_bucket — deterministic, SQL-replayable), norm.
2. Near screen: bucket-equijoin of batch vs stored index (optionally a
   Hamming-d ball via bit_count for recall), cosine >= threshold on the
   joined pairs — the quadratic compare never crosses buckets, so the
   fan-out is batch x per-bucket index density, not index size.
3. Admitted vectors' (id, bucket, v, nrm) rows append to the index;
   per-vector decisions (admitted / near_dup + matched id) append to the
   decisions sink.

State never lives in executor memory: the index is parquet on disk; at
scale it is written bucket-partitioned so each batch's screen prunes to
the buckets the batch actually touches. Same cold-start discipline as
corpus_ingest: only an ABSENT index dir is cold start — any other read
error fails the micro-batch rather than silently admitting duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import _dot, axis_sign_bucket
from .corpus_ingest import _index_exists

VINDEX_SCHEMA = "vec_id bigint, bucket int, v array<double>, nrm double"
VDECISION_SCHEMA = "vec_id bigint, status string, matched_id bigint"


def _batch_vectors(
    batch: DataFrame, id_col: str, vec_col: str, n_bits: int
) -> DataFrame:
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    b = batch.select(
        F.col(id_col).alias("vec_id"),
        dvec.alias("v"),
        axis_sign_bucket(vec_col, n_bits).cast("int").alias("bucket"),
    )
    return b.withColumn("nrm", F.sqrt(_dot(F.col("v"), F.col("v")))).select(
        "vec_id", "bucket", "v", "nrm"
    )


def screen_vector_batch(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bits: int = 4,
    probe_hamming: int = 0,
    batch_internal: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Screen one vector batch against the stored index.

    Returns ``(decisions, admitted_rows)``: per-vector status frame
    (admitted / near_dup with the min matching index id) and the index
    append payload. ``probe_hamming`` > 0 widens the screen to buckets
    within Hamming distance d (multi-probe — catches near-dups whose
    sign pattern flipped on d axes) at d-ball candidate cost; the
    default single-bucket screen mirrors `semantic_dedup_bucketed`'s
    blocking contract.

    ``batch_internal=True`` additionally screens batch vectors against
    SMALLER-ID batch vectors that passed the index screen (same
    corpus_ingest semantics: two mutually-near vectors arriving in one
    micro-batch then admit only the smaller id, matching what a split
    across batches would decide; one-level rule — under a chain it
    over-drops rather than re-running to a fixed point). Default False:
    with it off, near statuses are batch-partition-invariant only when
    admitted vectors are mutually non-near."""
    vb = _batch_vectors(batch, id_col, vec_col, n_bits)
    vi = index.select(
        F.col("vec_id").alias("_iid"),
        F.col("bucket").alias("_ib"),
        F.col("v").alias("_iv"),
        F.col("nrm").alias("_inrm"),
    )
    cond = (
        F.bit_count(
            F.col("bucket").cast("bigint").bitwiseXOR(F.col("_ib").cast("bigint"))
        )
        <= probe_hamming
        if probe_hamming > 0
        else F.col("bucket") == F.col("_ib")
    )
    pairs = vb.join(vi, cond).withColumn(
        "_cos",
        F.round(
            _dot(F.col("v"), F.col("_iv")) / (F.col("nrm") * F.col("_inrm")), 6
        ),
    )
    near = (
        pairs.filter(F.col("_cos") >= threshold)
        .groupBy("vec_id")
        .agg(F.min("_iid").alias("matched_id"))
        .select("vec_id", F.lit("near_dup").alias("status"), "matched_id")
    )
    admitted_rows = vb.join(near.select("vec_id"), "vec_id", "left_anti")

    internal_near = None
    if batch_internal:
        a = admitted_rows.select(
            F.col("vec_id"), F.col("bucket"), F.col("v"), F.col("nrm")
        )
        bcond = (
            F.bit_count(
                F.col("bucket").cast("bigint").bitwiseXOR(
                    F.col("_jb").cast("bigint")
                )
            )
            <= probe_hamming
            if probe_hamming > 0
            else F.col("bucket") == F.col("_jb")
        )
        pairs_i = a.join(
            a.select(
                F.col("vec_id").alias("_jid"),
                F.col("bucket").alias("_jb"),
                F.col("v").alias("_jv"),
                F.col("nrm").alias("_jnrm"),
            ),
            bcond & (F.col("vec_id") > F.col("_jid")),
        ).withColumn(
            "_cos",
            F.round(
                _dot(F.col("v"), F.col("_jv")) / (F.col("nrm") * F.col("_jnrm")),
                6,
            ),
        )
        internal_near = (
            pairs_i.filter(F.col("_cos") >= threshold)
            .groupBy("vec_id")
            .agg(F.min("_jid").alias("matched_id"))
            .select(
                "vec_id", F.lit("near_dup").alias("status"), "matched_id"
            )
        )
        admitted_rows = admitted_rows.join(
            internal_near.select("vec_id"), "vec_id", "left_anti"
        )

    admitted = admitted_rows.select(
        "vec_id",
        F.lit("admitted").alias("status"),
        F.lit(None).cast("bigint").alias("matched_id"),
    )
    decisions = near.unionByName(admitted)
    if internal_near is not None:
        decisions = decisions.unionByName(internal_near)
    return decisions, admitted_rows


def ingest_vector_stream(
    stream_vectors: DataFrame,
    index_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bits: int = 4,
    probe_hamming: int = 0,
):
    """foreachBatch wiring: read the current index, screen, append
    decisions THEN admissions (appending to index_dir first would
    refresh relations over that path and make the still-lazy decisions
    plan see the batch's own admissions). Batches run sequentially per
    stream, so read-then-append is safe. Returns the started query."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if _index_exists(spark, index_dir):
            index = spark.read.schema(VINDEX_SCHEMA).parquet(index_dir)
        else:
            index = spark.createDataFrame([], VINDEX_SCHEMA)
        decisions, admitted = screen_vector_batch(
            batch, index, id_col, vec_col, threshold, n_bits, probe_hamming
        )
        decisions = decisions.persist()
        admitted = admitted.persist()
        decisions.count()
        admitted.count()
        try:
            decisions.write.mode("append").parquet(decisions_dir)
            admitted.write.mode("append").parquet(index_dir)
        finally:
            decisions.unpersist()
            admitted.unpersist()

    return (
        stream_vectors.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
