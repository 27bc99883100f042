"""Persistent streaming crawl frontier — the politeness scheduler
(``urls.crawl_frontier``) as a keyed ingest stream with a parquet-backed
backlog (r13 verdict #7).

The batch operator schedules ONE wave: candidates in, per-host slots
within the horizon out, everything past the horizon implicitly "re-enters
the next wave's candidate set". This module makes that re-entry real and
durable, the way a crawl loop actually runs:

- each micro-batch (one scheduling WAVE) merges its new candidates with
  the stored backlog, schedules the union, lands the emitted slots under
  ``{slots_dir}/batch={id}`` (overwrite = replay-idempotent, the
  qsketch/decisions-sink device — one output per batch id, replaced
  never added), and lands the unscheduled remainder as the NEXT backlog
  snapshot under ``{backlog_dir}/state={id}``;
- backlog state is REPLACE semantics, versioned by batch id: wave N
  reads ``state={max id < N}`` and overwrites ``state={N}``, so a
  foreachBatch replay of wave N (at-least-once after a crash) recomputes
  from the untouched N-1 snapshot and lands byte-identical outputs — no
  commit marker needed anywhere;
- old state snapshots are pruned in the batch gap (only the immediately
  previous one can ever be re-read), and the slots sink's dir accretion
  is the decisions-sink retention problem solved in r12/r13 —
  ``corpus_ingest.maybe_compact_decisions`` applies verbatim via
  ``compact_max_dirs``.

Scale shape: the backlog is parquet, never executor memory; each wave's
cost is one bounded-dim broadcast join + the salted pre-rank top-cap
window (a mega-host's backlog never sorts whole — urls.frontier_schedule),
and the emitted slots stay bounded by hosts x (horizon / delay) per wave
regardless of backlog size. Candidates dedup by URL at wave entry (max
priority wins — a URL is fetched once; content-grain dedup is the
upstream seen-filter's job, ``streaming_url_seen_decisions``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.urls import frontier_schedule
from .corpus_ingest import (
    _hadoop_fs,
    maybe_compact_decisions,
    recover_decisions_compaction,
)

BACKLOG_SCHEMA = "url string, priority int"
SLOTS_SCHEMA = (
    "host string, url string, priority int, slot int, "
    "crawl_delay double, fetch_at_s double"
)
DELAYS_SCHEMA = "host string, crawl_delay double"


def _state_ids(spark, backlog_dir: str) -> list[int]:
    """Numeric ids of the ``state=N`` backlog snapshots, sorted."""
    fs, path, _ = _hadoop_fs(spark, backlog_dir)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("state="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def read_backlog(spark, backlog_dir: str, before_batch: int) -> DataFrame:
    """The backlog as of the last wave BEFORE ``before_batch`` — i.e. the
    newest ``state=N`` with N < before_batch. Reading strictly below the
    current batch id is what makes replay exact: a crashed wave may have
    left its own state={id} behind, and the recomputation must not read
    its own partial past."""
    ids = [i for i in _state_ids(spark, backlog_dir) if i < before_batch]
    if not ids:
        return spark.createDataFrame([], BACKLOG_SCHEMA)
    return spark.read.schema(BACKLOG_SCHEMA).parquet(
        f"{backlog_dir}/state={max(ids)}"
    )


def _prune_states(spark, backlog_dir: str, below: int) -> None:
    """Delete state snapshots with id < ``below``. Safe in the batch gap:
    wave N only ever re-reads state={N-1}, so anything older is
    unreachable. Deletion is idempotent and crash-tolerant (a leftover
    old state is just re-pruned next wave)."""
    fs, _, jvm = _hadoop_fs(spark, backlog_dir)
    for sid in _state_ids(spark, backlog_dir):
        if sid < below:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(
                    f"{backlog_dir}/state={sid}"
                ),
                True,
            )


def process_wave(
    spark,
    batch: DataFrame,
    batch_id: int,
    delays_rows: list[tuple[str, float]],
    slots_dir: str,
    backlog_dir: str,
    default_delay: float = 1.0,
    horizon_s: float = 60.0,
    keep_states: int = 2,
    compact_max_dirs: int | None = None,
    keep_last: int = 8,
) -> None:
    """One scheduling wave (the foreachBatch body, exposed so tests can
    drive waves — including at-least-once REPLAYS of the same batch_id —
    synchronously): merge new candidates with the stored backlog,
    schedule, land slots under batch={id} and the remainder under
    state={id}, prune unreachable states, run slots retention."""
    recover_decisions_compaction(spark, slots_dir)
    delays = spark.createDataFrame(list(delays_rows) or [], DELAYS_SCHEMA)
    prev = read_backlog(spark, backlog_dir, batch_id)
    cand = (
        batch.select("url", F.col("priority").cast("int").alias("priority"))
        .unionByName(prev)
        .groupBy("url")
        .agg(F.max("priority").alias("priority"))
    )
    wave = frontier_schedule(
        cand, delays, default_delay=default_delay, horizon_s=horizon_s
    )
    wave.coalesce(1).write.mode("overwrite").parquet(
        f"{slots_dir}/batch={batch_id}"
    )
    # overflow = candidates minus what this wave durably emitted — read
    # the landed slots back so a crash between the two writes can never
    # make backlog and slots disagree after replay
    emitted = spark.read.schema(SLOTS_SCHEMA).parquet(
        f"{slots_dir}/batch={batch_id}"
    ).select("url")
    overflow = cand.join(emitted, "url", "left_anti")
    overflow.coalesce(1).write.mode("overwrite").parquet(
        f"{backlog_dir}/state={batch_id}"
    )
    _prune_states(spark, backlog_dir, batch_id - keep_states)
    if compact_max_dirs is not None:
        maybe_compact_decisions(
            spark,
            slots_dir,
            batch_id,
            max_batch_dirs=compact_max_dirs,
            keep_last=keep_last,
            schema=SLOTS_SCHEMA,
        )


def frontier_stream(
    stream_df: DataFrame,
    delays_rows: list[tuple[str, float]],
    slots_dir: str,
    backlog_dir: str,
    checkpoint_dir: str,
    default_delay: float = 1.0,
    horizon_s: float = 60.0,
    keep_states: int = 2,
    compact_max_dirs: int | None = None,
    keep_last: int = 8,
):
    """foreachBatch wiring for the streaming frontier. ``stream_df`` is a
    (url, priority) candidate stream; ``delays_rows`` is the collected
    ``crawl_delays`` dim — bounded (one row per robots host), gathered
    once at stream start and rebuilt per batch via Arrow (robots parsing
    is a batch concern; re-deriving it per wave would re-scan robots
    every trigger). Returns the started StreamingQuery."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        process_wave(
            batch.sparkSession,
            batch,
            batch_id,
            delays_rows,
            slots_dir,
            backlog_dir,
            default_delay=default_delay,
            horizon_s=horizon_s,
            keep_states=keep_states,
            compact_max_dirs=compact_max_dirs,
            keep_last=keep_last,
        )

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_all_slots(spark, slots_dir: str) -> DataFrame:
    """Every emitted slot across waves, with its wave id as the ``batch``
    partition column (archived rows surface their original id from
    src_batch when the retention policy has folded dirs). mergeSchema
    is forced on (r14 ADVICE): only the batch=-1 archive carries the
    src_batch column, and without schema merging Spark takes the schema
    from ONE file footer — provenance would then depend on file-listing
    order (a live footer wins -> archived rows silently read batch=-1)."""
    df = spark.read.option("mergeSchema", "true").parquet(slots_dir)
    if "src_batch" in df.columns:
        df = df.withColumn(
            "batch",
            F.coalesce(F.col("src_batch"), F.col("batch")).cast("int"),
        ).drop("src_batch")
    return df
