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

The index is THE production artifact (operators/similarity.py
VECTOR_INDEX_SCHEMA): int8-quantized vectors + per-vector scale +
precomputed dequantized norm, parquet BUCKET-PARTITIONED by the
axis-sign bucket — the identical layout ``write_vector_index`` builds in
batch mode, so a batch-built index and a continuously-ingested one are
interchangeable and both serve ``query_vector_index``.

Per micro-batch work:

1. ONE projection over the batch quantizes it into index-row form
   (sim.vector_index_rows — deterministic, SQL-replayable), eagerly
   localCheckpointed (several consumers, no session-lifetime cache).
2. The batch's DISTINCT buckets (<= 2^n_bits values, collected as O(1)
   driver scalars) widen to their Hamming-d ball and push into the index
   read as literal partition filters — each batch reads ONLY the
   partition directories it can possibly collide with, so screen IO
   tracks batch diversity, not index size (measured: tools/scale_probe.py
   --vector-ingest-batches reports per-batch pruned vs total bytes).
3. Near screen: bucket-equijoin of batch vs the pruned index (optionally
   a Hamming-d ball via bit_count for recall), cosine >= threshold over
   the DEQUANTIZED int8 vectors — the arithmetic the stored artifact
   actually supports, attested end-to-end by the value-hash oracle.
4. Admitted rows append bucket-partitioned to the index; per-vector
   decisions (admitted / near_dup + matched id) append to the decisions
   sink.

State never lives in executor memory: the index is parquet on disk. Same
cold-start discipline as corpus_ingest: only an ABSENT index dir is cold
start — any other read error fails the micro-batch rather than silently
admitting duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import similarity as sim
from ..operators.similarity import _dot, dequantized, hamming_ball
from .corpus_ingest import (
    _guard_decisions_layout,
    _index_exists,
    batch_committed,
    mark_batch_committed,
    maybe_compact_decisions,
    recover_decisions_compaction,
)

VINDEX_SCHEMA = sim.VECTOR_INDEX_SCHEMA
VDECISION_SCHEMA = "vec_id bigint, status string, matched_id bigint"


def _batch_vectors(
    batch: DataFrame, id_col: str, vec_col: str, n_bits: int
) -> DataFrame:
    """Quantize a raw (id, embedding) frame into index-row form."""
    return sim.vector_index_rows(batch, id_col, vec_col, n_bits)


def _with_dv(df: DataFrame) -> DataFrame:
    """Materialize the dequantized array in its own projection (transform
    lambdas get no CSE — folding over an inline derivation would
    re-multiply per element)."""
    return df.withColumn("dv", dequantized(F.col("qvec"), F.col("scale")))


def screen_vector_batch(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_bits: int = 4,
    probe_hamming: int = 0,
    batch_internal: bool = False,
    prepared: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Screen one vector batch against the stored index.

    Returns ``(decisions, admitted_rows)``: per-vector status frame
    (admitted / near_dup with the min matching index id) and the index
    append payload (VECTOR_INDEX_SCHEMA rows). Cosines compare the
    DEQUANTIZED int8 vectors on BOTH sides — the batch is quantized
    before screening because that is the form it will be stored in, so
    a vector admitted today and re-screened tomorrow compares equal to
    itself. ``probe_hamming`` > 0 widens the screen to buckets within
    Hamming distance d (multi-probe — catches near-dups whose sign
    pattern flipped on d axes) at d-ball candidate cost; the default
    single-bucket screen mirrors `semantic_dedup_bucketed`'s blocking
    contract. ``prepared=True`` means ``batch`` is already in index-row
    form (the streaming path quantizes once, checkpoint-shares it).

    ``batch_internal=True`` additionally screens batch vectors against
    SMALLER-ID batch vectors that passed the index screen (same
    corpus_ingest semantics: two mutually-near vectors arriving in one
    micro-batch then admit only the smaller id, matching what a split
    across batches would decide; one-level rule — under a chain it
    over-drops rather than re-running to a fixed point). Default False:
    with it off, near statuses are batch-partition-invariant only when
    admitted vectors are mutually non-near."""
    vb = batch if prepared else _batch_vectors(batch, id_col, vec_col, n_bits)
    vbd = _with_dv(vb)
    vi = _with_dv(index).select(
        F.col("vec_id").alias("_iid"),
        F.col("bucket").alias("_ib"),
        F.col("dv").alias("_iv"),
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
    pairs = vbd.join(vi, cond).withColumn(
        "_cos",
        F.round(
            _dot(F.col("dv"), F.col("_iv")) / (F.col("nrm") * F.col("_inrm")), 6
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
        a = _with_dv(admitted_rows)
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
                F.col("dv").alias("_jv"),
                F.col("nrm").alias("_jnrm"),
            ),
            bcond & (F.col("vec_id") > F.col("_jid")),
        ).withColumn(
            "_cos",
            F.round(
                _dot(F.col("dv"), F.col("_jv")) / (F.col("nrm") * F.col("_jnrm")),
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


def read_index_pruned(spark, index_dir: str, ball: list[int]) -> DataFrame:
    """The screen's index read: literal bucket membership over the
    partition column compiles to PartitionFilters, so each micro-batch
    reads ONLY the partition directories its Hamming ball touches —
    screen IO tracks batch bucket diversity, not index size
    (plan-asserted in tests/test_plans.py)."""
    return (
        spark.read.schema(VINDEX_SCHEMA)
        .parquet(index_dir)
        .filter(F.col("bucket").isin(ball))
    )


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
    auto_compact_max_files: int | None = None,
    decisions_max_dirs: int | None = None,
    decisions_keep_last: int = 8,
):
    """foreachBatch wiring: quantize the batch once (localCheckpoint —
    shared by the bucket collect, the screen, and the append without a
    session-lifetime cache entry), prune the index read to the batch's
    Hamming ball of partition directories, screen, append decisions THEN
    admissions (appending to index_dir first would refresh relations over
    that path and make the still-lazy decisions plan see the batch's own
    admissions). Batches run sequentially per stream, so read-then-append
    is safe. Returns the started query.

    Same effectively-exactly-once commit protocol as
    ``corpus_ingest.ingest_stream`` (foreachBatch replays a failed batch
    under the SAME batch_id): a batch_id commit marker under the index
    makes replaying a committed batch a no-op, decisions overwrite a
    per-batch directory instead of appending, and the screen excludes
    stored rows whose vec_id is in the current batch so a replay after a
    crash between the index append and the marker still produces the
    uninterrupted run's decisions. ``auto_compact_max_files`` (optional)
    runs the ``maybe_compact_index`` policy in the batch gap after each
    commit, same contract as ``corpus_ingest.ingest_stream``."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        # restore an artifact parked by a crashed compact_index swap
        # BEFORE the existence checks (else cold-start logic rebuilds
        # from an empty index); then refuse legacy flat decisions dirs
        sim.recover_interrupted_compaction(spark, index_dir)
        recover_decisions_compaction(spark, decisions_dir)
        _guard_decisions_layout(spark, decisions_dir)
        if batch_committed(spark, index_dir, batch_id):
            return  # at-least-once replay of a fully committed batch
        vb = _batch_vectors(batch, id_col, vec_col, n_bits).localCheckpoint(
            eager=True
        )
        batch_buckets = [r[0] for r in vb.select("bucket").distinct().collect()]
        ball = hamming_ball(batch_buckets, n_bits, probe_hamming)
        if _index_exists(spark, index_dir):
            # replay shield: stored rows with the batch's own ids can only
            # be this batch's prior admissions (crash after the append,
            # before the marker) — excluding them keeps replayed decisions
            # identical to the uninterrupted run
            own = F.broadcast(vb.select("vec_id").distinct())
            index = read_index_pruned(spark, index_dir, ball).join(
                own, "vec_id", "left_anti"
            )
        else:
            index = spark.createDataFrame([], VINDEX_SCHEMA)
        decisions, admitted = screen_vector_batch(
            vb, index, id_col, vec_col, threshold, n_bits, probe_hamming,
            prepared=True,
        )
        decisions = decisions.persist()
        admitted = admitted.persist()
        decisions.count()
        admitted.count()
        try:
            decisions.write.mode("overwrite").parquet(
                f"{decisions_dir}/batch={batch_id}"
            )
            # cluster by the partition key before the append — the same
            # partitioned-write recipe as the batch builders
            # (similarity.write_vector_index): without it every task of
            # every micro-batch drops one tiny file into every bucket
            # directory (tasks x buckets x batches files), and over
            # thousands of batches the served artifact degrades into the
            # many-file listing stall the read side was built to avoid.
            # Long-running ingest should still compact_index periodically
            # (one file per bucket per batch is the floor of this recipe).
            admitted.repartition("bucket").write.partitionBy(
                "bucket"
            ).mode("append").parquet(index_dir)
            # marker LAST: everything above is durable, replay is a no-op
            mark_batch_committed(spark, index_dir, batch_id)
        finally:
            decisions.unpersist()
            admitted.unpersist()
        if auto_compact_max_files is not None:
            from ..operators.similarity import maybe_compact_index

            maybe_compact_index(
                spark, index_dir, ["bucket"],
                max_files_per_dir=auto_compact_max_files,
                # stored rows carry the canonical vec_id name regardless
                # of the stream's id_col (see VINDEX_SCHEMA)
                dedup_cols=["vec_id"],
                cursor=batch_id,
            )
        if decisions_max_dirs is not None:
            # decisions-side retention, same contract as
            # corpus_ingest.ingest_stream: runs AFTER the commit marker,
            # so every archived batch is final
            maybe_compact_decisions(
                spark, decisions_dir, batch_id,
                max_batch_dirs=decisions_max_dirs,
                keep_last=decisions_keep_last,
                schema=VDECISION_SCHEMA,
            )

    return (
        stream_vectors.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
