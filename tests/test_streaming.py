"""Structured Streaming surfaces validated against their batch twins."""

import datetime as dt

from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import daily
from practicum2_nof1_adhd_bd_spark.streaming import daily_stats_stream, sessionize_stream

ROWS = [
    ("2024-01-01 01:00:00", 1, 10.0),
    ("2024-01-01 02:00:00", 1, 20.0),
    ("2024-01-01 02:10:00", 2, 5.0),
    ("2024-01-02 09:00:00", 1, 30.0),
    ("2024-01-02 09:15:00", 1, 40.0),
]
SCHEMA = "ts timestamp, user_id int, value double"


def _write_source(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    batch = spark.createDataFrame(
        [(dt.datetime.fromisoformat(t), u, v) for t, u, v in ROWS], SCHEMA
    )
    batch.write.mode("overwrite").parquet(src)
    return src, batch


def _run_stream(spark, stream_df, name, tmp_path):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_daily_stats_stream_matches_batch(spark, tmp_path):
    src, batch = _write_source(spark, tmp_path)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = _run_stream(spark, daily_stats_stream(stream), "daily_stream_t", tmp_path)
    got = {r["date"]: r for r in out.collect()}
    want = {r["date"]: r for r in daily.daily_stats(batch).collect()}
    assert set(got) == set(want)
    for d in want:
        for c in ("n_events", "value_mean", "value_min", "value_max", "value_std"):
            assert got[d][c] == want[d][c], (d, c)


def test_sessionize_stream_gap_rule(spark, tmp_path):
    src, _ = _write_source(spark, tmp_path)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = _run_stream(
        spark, sessionize_stream(stream, gap="30 minutes"), "sess_stream_t", tmp_path
    )
    rows = out.collect()
    u1 = sorted(
        [r for r in rows if r["user_id"] == 1], key=lambda r: r["session_start"]
    )
    # user 1: (01:00, 02:00 within 60min gap? no — 60 > 30 -> two sessions on day1)
    # then day2 (09:00, 09:15) one session
    assert len(u1) == 3
    assert u1[0]["n_events"] == 1 and u1[1]["n_events"] == 1
    assert u1[2]["n_events"] == 2 and u1[2]["value_sum"] == 70.0
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["n_events"] == 1


def test_stream_static_join_foreachbatch(spark, tmp_path):
    """Stream-static broadcast enrichment (J6 over a feed) delivered through
    a foreachBatch sink — results must equal the batch join+agg twin."""
    from practicum2_nof1_adhd_bd_spark.streaming import enriched_daily_stream

    src, batch = _write_source(spark, tmp_path)
    dim = spark.createDataFrame(
        [(1, "clinical"), (2, "control")], "user_id int, grp string"
    )
    collected = []

    def sink(bdf, _bid):
        collected.extend(bdf.collect())

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        enriched_daily_stream(stream, dim)
        .writeStream.foreachBatch(sink)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted((str(r["date"]), r["grp"], r["n_events"], r["value_sum"]) for r in collected)
    expect = sorted(
        (str(r["date"]), r["grp"], r["n_events"], r["value_sum"])
        for r in (
            batch.join(dim, "user_id", "left")
            .groupBy(F.to_date("ts").alias("date"), "grp")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("value_sum"),
            )
        ).collect()
    )
    assert got == expect and len(got) == 3


def test_watermark_drops_late_rows(spark, tmp_path):
    """F4-as-watermark: once the watermark closes and evicts a window, a
    very-late row for that window is DROPPED — the emitted count is final
    and no duplicate window row appears. (A late row arriving while the
    window state is still live merges normally; finalization happens at
    eviction, which is the contract append mode exposes.)"""
    import time

    src = str(tmp_path / "late_src")
    batches = [
        # advances watermark to Jan 4 after this batch
        [(dt.datetime(2024, 1, 1, 12), 1, 10.0), (dt.datetime(2024, 1, 5, 12), 1, 20.0)],
        # watermark -> Jan 5; Jan-1 window closes, emits, state evicted
        [(dt.datetime(2024, 1, 6, 12), 1, 30.0)],
        # VERY LATE Jan-1 row (post-eviction) -> dropped, no duplicate emit
        [(dt.datetime(2024, 1, 1, 14), 1, 99.0), (dt.datetime(2024, 1, 7, 12), 1, 40.0)],
    ]
    for i, b in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(b, SCHEMA).coalesce(1).write.mode(mode).parquet(src)
        time.sleep(1.1)  # distinct mtimes keep file->micro-batch order stable
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        daily_stats_stream(stream, watermark="1 day")
        .writeStream.format("memory")
        .queryName("late_t")
        .outputMode("append")  # emits only watermark-closed windows
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        [(str(r["date"]), r["n_events"], r["value_mean"]) for r in
         spark.sql("SELECT * FROM late_t").collect()]
    )
    # Jan-1 emitted EXACTLY ONCE, without the very-late 99.0 row
    assert rows == [("2024-01-01", 1, 10.0), ("2024-01-05", 1, 20.0)]


def test_dedup_stream_matches_batch_exact_dedup(spark, tmp_path):
    from practicum2_nof1_adhd_bd_spark.streaming import dedup_stream

    docs = [
        ("2024-01-01 00:00:01", 1, "the quick brown fox"),
        ("2024-01-01 00:00:02", 2, "THE QUICK  brown fox".lower()),  # same norm? no: double space
        ("2024-01-01 00:00:03", 3, "the quick brown fox"),  # exact dup of 1
        ("2024-01-01 00:00:04", 4, "something else entirely"),
    ]
    schema = "ingest_ts timestamp, doc_id long, text string"
    src = str(tmp_path / "docs_src")
    batch = spark.createDataFrame(
        [(dt.datetime.fromisoformat(t), i, x) for t, i, x in docs], schema
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_stream_t").collect()
    # one survivor per distinct normalized content: docs 1/3 collapse
    hashes = [r["content_md5"] for r in out]
    assert len(hashes) == len(set(hashes)) == 3
    survivors = {r["doc_id"] for r in out}
    assert 4 in survivors and len(survivors & {1, 3}) == 1 and 2 in survivors


def test_incremental_corpus_ingest_stream(spark, tmp_path):
    """foreachBatch incremental ingestion: batch 1 seeds the signature
    index; batch 2 (processed later, same checkpoint) is screened against
    the STORED index — exact copy flagged, near copy flagged via the
    MinHash estimate, novel doc admitted and appended."""
    import json

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    )
    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    dec_dir = str(tmp_path / "decisions")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        tmp = src / f".{name}.tmp"
        with open(tmp, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        tmp.rename(src / name)

    def run_once():
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        q = ci.ingest_stream(stream, index_dir, dec_dir, ckpt)
        assert q.awaitTermination(120)

    land("b1.json", [(1, base), (2, "hi"), (3, base)])
    run_once()
    # same checkpoint -> only the new file is processed as batch 2
    land(
        "b2.json",
        [
            (11, base),
            (12, base + " five"),
            (13, "completely different words entirely here about other topics"),
        ],
    )
    run_once()

    dec = {
        r["doc_id"]: r
        for r in spark.read.parquet(dec_dir).collect()
    }
    assert dec[1]["status"] == "admitted"
    assert dec[2]["status"] == "admitted"  # < k tokens: exact-screen only
    assert dec[3]["status"] == "exact_dup" and dec[3]["matched_id"] == 1
    assert dec[11]["status"] == "exact_dup" and dec[11]["matched_id"] == 1
    assert dec[12]["status"] == "near_dup" and dec[12]["matched_id"] == 1
    assert dec[13]["status"] == "admitted"
    idx = spark.read.schema(ci.INDEX_SCHEMA).parquet(index_dir)
    assert sorted(r["doc_id"] for r in idx.collect()) == [1, 2, 13]


def test_screen_batch_cold_start_and_empty_batch(spark):
    """Cold start (empty index) admits everything; an empty batch yields
    empty decisions without erroring — both are real foreachBatch states
    (first micro-batch ever, and a trigger with no new files)."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    empty_index = spark.createDataFrame([], ci.INDEX_SCHEMA)
    batch = spark.createDataFrame(
        [(1, "one two three four five"), (2, "six seven eight nine ten")],
        "doc_id bigint, text string",
    )
    dec, sigs, cleanup = ci.screen_batch(batch, empty_index)
    try:
        assert {r["status"] for r in dec.collect()} == {"admitted"}
        assert sigs.count() == 2
    finally:
        cleanup()

    empty_batch = spark.createDataFrame([], "doc_id bigint, text string")
    dec2, sigs2, cleanup2 = ci.screen_batch(empty_batch, empty_index)
    try:
        assert dec2.count() == 0
        assert sigs2.count() == 0
    finally:
        cleanup2()


def test_screen_batch_internal_near(spark):
    """batch_internal_near=True: two mutually-near (non-exact) docs in ONE
    batch admit only the smaller id — matching what a split across two
    micro-batches decides — while the default screen admits both (index-only
    near check)."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    empty_index = spark.createDataFrame([], ci.INDEX_SCHEMA)
    batch = spark.createDataFrame(
        [(1, base), (2, base + " extra"), (3, "totally different other words here now")],
        "doc_id bigint, text string",
    )

    dec_def, _s, cl = ci.screen_batch(batch, empty_index)
    try:
        st = {r["doc_id"]: r["status"] for r in dec_def.collect()}
        assert st == {1: "admitted", 2: "admitted", 3: "admitted"}
    finally:
        cl()

    dec_in, sigs_in, cl2 = ci.screen_batch(
        batch, empty_index, batch_internal_near=True
    )
    try:
        rows = {r["doc_id"]: r for r in dec_in.collect()}
        assert rows[1]["status"] == "admitted"
        assert rows[2]["status"] == "near_dup" and rows[2]["matched_id"] == 1
        assert rows[3]["status"] == "admitted"
        # the near-dropped doc's signature must NOT enter the index
        assert sorted(r["doc_id"] for r in sigs_in.collect()) == [1, 3]
    finally:
        cl2()


def test_ingest_stream_cold_start_vs_corrupt_index(spark, tmp_path):
    """ingest_stream treats an ABSENT index dir as cold start (admit all),
    but a present-yet-unreadable index dir must FAIL the micro-batch rather
    than silently screen against an empty index (which would admit
    duplicates and append duplicate signature rows)."""
    import json

    import pytest

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "b1.json", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": "one two three four five"}) + "\n")

    # cold start: index dir absent -> batch admitted, index created
    stream = spark.readStream.schema("doc_id bigint, text string").json(str(src))
    q = ci.ingest_stream(
        stream, str(tmp_path / "index"), str(tmp_path / "dec"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "dec")).collect()[0]["status"] == "admitted"

    # corrupt index: dir exists but holds garbage -> the batch must error
    bad_index = tmp_path / "bad_index"
    bad_index.mkdir()
    with open(bad_index / "part-00000.parquet", "w") as f:
        f.write("this is not parquet")
    stream2 = spark.readStream.schema("doc_id bigint, text string").json(str(src))
    q2 = ci.ingest_stream(
        stream2, str(bad_index), str(tmp_path / "dec2"), str(tmp_path / "ckpt2")
    )
    with pytest.raises(Exception):
        q2.awaitTermination(120)
        q2.stop()
        # foreachBatch errors surface via the query's exception
        if q2.exception() is not None:
            raise RuntimeError(q2.exception().desc)


def test_incremental_vector_ingest_stream(spark, tmp_path):
    """Streaming SemDeDup: batch 1 seeds the vector index; batch 2 (same
    checkpoint, later file) is screened against the STORED index — a copy
    of a batch-1 vector is flagged near_dup against it, an orthogonal
    vector is admitted."""
    import json

    from practicum2_nof1_adhd_bd_spark.streaming import vector_ingest as vi

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    dec_dir = str(tmp_path / "dec")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        tmp = src / f".{name}.tmp"
        with open(tmp, "w") as f:
            for vec_id, v in rows:
                f.write(json.dumps({"vec_id": vec_id, "embedding": v}) + "\n")
        tmp.rename(src / name)

    def run_once():
        stream = spark.readStream.schema(
            "vec_id bigint, embedding array<double>"
        ).json(str(src))
        q = vi.ingest_vector_stream(stream, index_dir, dec_dir, ckpt)
        assert q.awaitTermination(120)

    e1 = [1.0, 0.2, 0.1, 0.05]
    e2 = [-1.0, -0.2, 0.3, 0.4]
    land("b1.json", [(1, e1), (2, e2)])
    run_once()
    land(
        "b2.json",
        [
            (11, [x * 2 for x in e1]),      # same direction as 1 -> near_dup
            (12, [0.05, -1.0, 0.2, -0.3]),  # roughly orthogonal -> admitted
        ],
    )
    run_once()

    dec = {r["vec_id"]: r for r in spark.read.parquet(dec_dir).collect()}
    assert dec[1]["status"] == "admitted"
    assert dec[2]["status"] == "admitted"
    assert dec[11]["status"] == "near_dup" and dec[11]["matched_id"] == 1
    assert dec[12]["status"] == "admitted"
    idx = spark.read.schema(vi.VINDEX_SCHEMA).parquet(index_dir)
    assert sorted(r["vec_id"] for r in idx.collect()) == [1, 2, 12]


def test_screen_vector_batch_internal(spark):
    """batch_internal=True: two same-direction vectors in ONE batch admit
    only the smaller id (matching a split across batches); the default
    index-only screen admits both."""
    from practicum2_nof1_adhd_bd_spark.streaming import vector_ingest as vi

    empty = spark.createDataFrame([], vi.VINDEX_SCHEMA)
    batch = spark.createDataFrame(
        [
            (1, [1.0, 0.1, 0.0, 0.0]),
            (2, [2.0, 0.2, 0.0, 0.0]),     # same direction as 1
            (3, [-0.1, 1.0, 0.3, -0.2]),   # different direction
        ],
        "vec_id bigint, embedding array<double>",
    )
    dec_def, _ = vi.screen_vector_batch(batch, empty, threshold=0.95)
    assert {r["status"] for r in dec_def.collect()} == {"admitted"}

    dec_in, adm = vi.screen_vector_batch(
        batch, empty, threshold=0.95, batch_internal=True
    )
    rows = {r["vec_id"]: r for r in dec_in.collect()}
    assert rows[1]["status"] == "admitted"
    assert rows[2]["status"] == "near_dup" and rows[2]["matched_id"] == 1
    assert rows[3]["status"] == "admitted"
    assert sorted(r["vec_id"] for r in adm.collect()) == [1, 3]


def test_index_compaction_reclaims_files_and_preserves_results(
    spark, tmp_path
):
    """File-hygiene contract for the continuously-ingested index: (a) each
    micro-batch append writes at most ONE file per touched bucket (the
    repartition-before-partitionBy recipe, not tasks x buckets), (b)
    compact_index collapses the per-batch accretion to ~one file per
    bucket, and (c) query_vector_index returns bit-identical rows before
    and after the swap."""
    import json
    import os

    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim
    from practicum2_nof1_adhd_bd_spark.streaming import vector_ingest as vi

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    dec_dir = str(tmp_path / "dec")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        tmp = src / f".{name}.tmp"
        with open(tmp, "w") as f:
            for vec_id, v in rows:
                f.write(json.dumps({"vec_id": vec_id, "embedding": v}) + "\n")
        tmp.rename(src / name)

    def run_once():
        stream = spark.readStream.schema(
            "vec_id bigint, embedding array<double>"
        ).json(str(src))
        # admit ~everything: this test is about file accretion, not the
        # near-dup screen (covered elsewhere)
        q = vi.ingest_vector_stream(
            stream, index_dir, dec_dir, ckpt, threshold=0.99999
        )
        assert q.awaitTermination(120)

    # 6 batches concentrated on TWO sign buckets so each directory
    # accretes one file per batch; magnitudes vary so nothing is an
    # exact duplicate
    signs = [(1.0, 1.0, 1.0, 1.0), (-1.0, 1.0, -1.0, 1.0)]
    for b in range(6):
        rows = []
        for j in range(2):
            s = signs[j]
            rows.append(
                (
                    b * 10 + j,
                    [s[i] * (1.0 + 0.37 * ((b + j + i) % 7)) for i in range(4)],
                )
            )
        land(f"b{b}.json", rows)
        run_once()

    def files_per_bucket():
        out = {}
        for d in os.listdir(index_dir):
            if not d.startswith("bucket="):
                continue
            out[d] = len(
                [
                    f
                    for f in os.listdir(os.path.join(index_dir, d))
                    if f.endswith(".parquet")
                ]
            )
        return out

    before = files_per_bucket()
    # (a) the append recipe: a bucket touched by k batches holds exactly
    # k files (one per append), never tasks-times-more
    assert max(before.values()) > 1          # accretion actually happened
    assert sum(before.values()) <= 12        # <= one file per batch-bucket

    qv = [1.0, 0.3, -0.2, 0.6]
    res_before = sim.query_vector_index(
        spark, index_dir, qv, k=10, probe_hamming=4
    ).collect()

    nb, na = sim.compact_index(spark, index_dir)
    after = files_per_bucket()
    assert nb == sum(before.values())
    assert na == sum(after.values())
    assert na < nb                            # (b) files reclaimed
    assert max(after.values()) == 1           # one well-sized file per dir

    res_after = sim.query_vector_index(
        spark, index_dir, qv, k=10, probe_hamming=4
    ).collect()
    assert res_before == res_after            # (c) serving unchanged


def test_ingest_bloom_sidecar_and_pruned_screen_parity(spark, tmp_path):
    """r09 canonical index layout: cold-start ingest writes hp=xx
    partition dirs plus the _bloom.bin sidecar (invisible to parquet
    reads); a later batch's decisions under the Bloom-pruned exact
    screen are IDENTICAL to screening the full index directly; the
    sidecar has no false negatives over the stored hashes."""
    import json
    import os

    import numpy as np
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import dedup
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    texts = {
        i: f"document number {i} with shared words alpha bravo charlie "
           f"delta echo foxtrot golf hotel india juliet kilo"
        for i in range(20)
    }
    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    with open(src / "b1.json", "w") as f:
        for i in range(20):
            f.write(json.dumps({"doc_id": i, "text": texts[i]}) + "\n")
    stream = spark.readStream.schema("doc_id bigint, text string").json(
        str(src)
    )
    q = ci.ingest_stream(
        stream, index_dir, str(tmp_path / "dec"), str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(120)

    # canonical layout + sidecar
    entries = os.listdir(index_dir)
    assert ci._BLOOM_FILE in entries
    assert any(e.startswith("hp=") for e in entries)
    # parquet read is undisturbed by the sidecar
    idx = spark.read.schema(ci.INDEX_SCHEMA).parquet(index_dir)
    assert idx.count() == 20

    # no false negatives: every stored hash tests positive
    bloom = ci._read_bloom(spark, index_dir)
    assert bloom is not None and len(bloom) == ci.BLOOM_BITS // 8
    assert np.frombuffer(bloom, dtype=np.uint8).any()
    member = idx.select("text_hash").withColumn(
        "_m",
        dedup.bloom_member_expr(
            spark, bloom, "text_hash",
            n_bits=ci.BLOOM_BITS, n_probes=ci.BLOOM_PROBES,
        ),
    )
    assert member.filter(~F.col("_m")).count() == 0

    # batch 2 through the stream (pruned path) vs direct full screen
    b2 = [(100, texts[3]), (101, "completely novel words here today"),
          (102, texts[7])]
    with open(src / ".b2.tmp", "w") as f:
        for d, t in b2:
            f.write(json.dumps({"doc_id": d, "text": t}) + "\n")
    os.rename(src / ".b2.tmp", src / "b2.json")
    full_index = idx.select("doc_id", "text_hash", "sig")
    batch_df = spark.createDataFrame(b2, "doc_id long, text string")
    dec_direct, _sigs, cleanup = ci.screen_batch(batch_df, full_index)
    expected = sorted(map(tuple, dec_direct.collect()))
    cleanup()

    stream2 = spark.readStream.schema("doc_id bigint, text string").json(
        str(src)
    )
    q2 = ci.ingest_stream(
        stream2, index_dir, str(tmp_path / "dec"), str(tmp_path / "ckpt")
    )
    assert q2.awaitTermination(120)
    got = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(str(tmp_path / "dec"))
            .select("doc_id", "status", "matched_id")
            .filter(F.col("doc_id") >= 100)
            .collect(),
        )
    )
    assert got == expected
    assert {d for d, *_ in got} == {100, 101, 102}


def test_corpus_index_compaction_preserves_sidecar_and_decisions(
    spark, tmp_path
):
    """compact_index over the hp-partitioned corpus signature index:
    (a) per-batch file accretion collapses (prefix dirs hit by several
    batches hold several files before, one after), (b) the _bloom.bin
    sidecar SURVIVES the swap byte-identical (compaction never changes
    content, so the membership sidecar stays exactly valid — no
    full-index rebuild on the next screen), and (c) a post-compaction
    batch's decisions are identical to a direct screen of the full
    index."""
    import json
    import os

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    src = tmp_path / "src"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    dec_dir = str(tmp_path / "dec")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        p = src / f".{name}.tmp"
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.rename(p, src / name)

    def run_once():
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        q = ci.ingest_stream(stream, index_dir, dec_dir, ckpt)
        assert q.awaitTermination(120)

    # 3 batches x 30 distinct docs: 90 md5 prefixes over 256 hp dirs, so
    # tens of prefixes are hit by more than one batch (deterministic
    # texts -> deterministic layout) and accrete multiple files
    for b in range(3):
        land(
            f"b{b}.json",
            [
                (b * 100 + i,
                 f"corpus compaction doc {b * 100 + i} alpha bravo")
                for i in range(30)
            ],
        )
        run_once()

    def total_files():
        n = 0
        for d in os.listdir(index_dir):
            if d.startswith("hp="):
                n += len(
                    [
                        f
                        for f in os.listdir(os.path.join(index_dir, d))
                        if f.endswith(".parquet")
                    ]
                )
        return n

    bloom_before = ci._read_bloom(spark, index_dir)
    assert bloom_before is not None
    files_before = total_files()

    nb, na = sim.compact_index(spark, index_dir, partition_cols=["hp"])
    assert nb == files_before
    assert na == total_files() and na < nb          # (a) reclaimed

    # (b) sidecar survived byte-identical — next screen reuses it
    assert ci._read_bloom(spark, index_dir) == bloom_before

    # (c) decisions identical to the direct full-index screen
    idx = (
        spark.read.schema(ci.INDEX_SCHEMA)
        .option("basePath", index_dir)
        .parquet(index_dir)
        .select("doc_id", "text_hash", "sig")
    )
    assert idx.count() == 90
    b3 = [
        (900, "corpus compaction doc 5 alpha bravo"),       # exact dup of 5
        (901, "a genuinely novel document after compaction"),
        (902, "corpus compaction doc 117 alpha bravo"),     # exact dup of 117
    ]
    batch_df = spark.createDataFrame(b3, "doc_id long, text string")
    dec_direct, _sigs, cleanup = ci.screen_batch(batch_df, idx)
    expected = sorted(map(tuple, dec_direct.collect()))
    cleanup()

    land("b3.json", b3)
    run_once()
    got = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(dec_dir)
            .select("doc_id", "status", "matched_id")
            .filter(F.col("doc_id") >= 900)
            .collect(),
        )
    )
    assert got == expected
    statuses = {d: s for d, s, _m in got}
    assert statuses[900] == "exact_dup" and statuses[901] == "admitted"


def test_compact_index_preserves_cell_layout_sidecars(spark, tmp_path):
    """compact_index over the CELL-layout artifacts (write_ivf_index /
    write_ivfpq_index), whose quantizer sidecars are parquet DIRECTORIES
    (_centroids, _codebooks, _store) rather than root-level files: the
    carry loop must copy them recursively, or the post-swap delete of the
    precompact tree destroys the quantizer and serving fails on a missing
    _centroids path. Serving must return bit-identical rows before and
    after the swap for BOTH artifact kinds."""
    import os

    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11) - 5.0 + 0.1 * j for j in range(4)])
            for i in range(24)
        ],
        "vec_id bigint, embedding array<double>",
    )
    qv = [0.2, -0.1, 0.9, 0.4]

    ivf = str(tmp_path / "ivf")
    sim.write_ivf_index(emb, ivf, n_cells=4, n_iters=2)
    before = sim.query_ivf_index(spark, ivf, qv, k=5, n_probe=2).collect()
    nb, na = sim.compact_index(spark, ivf, partition_cols=["cell"])
    assert nb > 0 and na > 0
    assert os.path.isdir(os.path.join(ivf, "_centroids"))
    after = sim.query_ivf_index(spark, ivf, qv, k=5, n_probe=2).collect()
    assert before == after

    ivfpq = str(tmp_path / "ivfpq")
    sim.write_ivfpq_index(emb, ivfpq, n_cells=4, m=2, k_codes=4, n_iters=2)
    before = sim.query_ivfpq_index(
        spark, ivfpq, qv, k=5, n_probe=2, rerank=10
    ).collect()
    nb, na = sim.compact_index(spark, ivfpq, partition_cols=["cell"])
    assert nb > 0 and na > 0
    for side in ("_centroids", "_codebooks", "_store"):
        assert os.path.isdir(os.path.join(ivfpq, side)), side
    after = sim.query_ivfpq_index(
        spark, ivfpq, qv, k=5, n_probe=2, rerank=10
    ).collect()
    assert before == after


def _corpus_ingest_harness(spark, tmp_path, sub):
    """(land, run_once, dirs) helpers for a jsonl-file-fed corpus ingest."""
    import json

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    root = tmp_path / sub
    src = root / "src"
    src.mkdir(parents=True)
    index_dir = str(root / "index")
    dec_dir = str(root / "dec")
    ckpt = str(root / "ckpt")

    def land(name, rows):
        p = src / f".{name}.tmp"
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        p.rename(src / name)

    def run_once(expect_fail=False):
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        q = ci.ingest_stream(stream, index_dir, dec_dir, ckpt)
        if expect_fail:
            failed = False
            try:
                q.awaitTermination(120)
            except Exception:
                failed = True
            assert failed, "stream was expected to fail"
        else:
            assert q.awaitTermination(120)

    return land, run_once, index_dir, dec_dir


def test_ingest_bloom_width_mismatch_still_rejects_stored_dups(
    spark, tmp_path
):
    """A stored sidecar whose width differs from BLOOM_BITS (version bump
    or truncated write) must NOT degrade to a batch-only bitmap — that
    would turn every stored hash bloom-negative, skip their hp dirs in
    the pruned exact screen, and silently admit duplicates. The screen
    rebuilds membership from the full stored index instead: a previously
    stored duplicate is still rejected, and the sidecar comes back at the
    current width."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    land, run_once, index_dir, dec_dir = _corpus_ingest_harness(
        spark, tmp_path, "bloomw"
    )
    base = "the quick brown fox jumps over the lazy dog again and again"
    land("b1.json", [(1, base), (2, "other words entirely here")])
    run_once()

    # corrupt: replace the sidecar with a wrong-width (truncated) bitmap
    ci._write_bloom(spark, index_dir, b"\x00" * 16)

    land("b2.json", [(11, base), (12, "a novel doc after corruption")])
    run_once()

    dec = {
        r["doc_id"]: r for r in spark.read.parquet(dec_dir).collect()
    }
    assert dec[11]["status"] == "exact_dup" and dec[11]["matched_id"] == 1
    assert dec[12]["status"] == "admitted"
    assert len(ci._read_bloom(spark, index_dir)) * 8 == ci.BLOOM_BITS


def test_ingest_crash_between_decisions_and_index_append_is_idempotent(
    spark, tmp_path, monkeypatch
):
    """Crash injection for the foreachBatch commit protocol: batch 2 fails
    BETWEEN the decisions write and the index append, the stream is
    restarted (same checkpoint -> same batch_id replays), and the final
    decisions + index are hash-equal to an uninterrupted control run —
    no double-appended decisions, no duplicate signature rows, no
    self-flagged admissions."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    base = "pack my box with five dozen liquor jugs for the daily run"
    b1 = [(1, base), (2, "completely different content here")]
    b2 = [(11, base), (12, "novel words that match nothing stored")]

    # control: uninterrupted run
    land, run_once, c_index, c_dec = _corpus_ingest_harness(
        spark, tmp_path, "control"
    )
    land("b1.json", b1)
    run_once()
    land("b2.json", b2)
    run_once()

    def read_state(index_dir, dec_dir):
        dec = sorted(
            map(
                tuple,
                spark.read.schema(ci.DECISION_SCHEMA)
                .parquet(dec_dir)
                .select("doc_id", "status", "matched_id")
                .collect(),
            )
        )
        idx = sorted(
            map(
                tuple,
                spark.read.schema(ci.INDEX_SCHEMA)
                .option("basePath", index_dir)
                .parquet(index_dir)
                .select("doc_id", "text_hash")
                .collect(),
            )
        )
        return dec, idx

    want_dec, want_idx = read_state(c_index, c_dec)

    # crash run: write_index raises once, exactly at the injection point
    land, run_once, x_index, x_dec = _corpus_ingest_harness(
        spark, tmp_path, "crash"
    )
    land("b1.json", b1)
    run_once()

    real_write_index = ci.write_index
    state = {"fail": True}

    def failing_write_index(sig_df, index_dir, mode="overwrite"):
        if state["fail"]:
            state["fail"] = False
            raise IOError("injected crash between decisions and index append")
        return real_write_index(sig_df, index_dir, mode)

    monkeypatch.setattr(ci, "write_index", failing_write_index)
    land("b2.json", b2)
    run_once(expect_fail=True)   # decisions written, index append failed
    run_once()                   # restart: same batch_id replays

    got_dec, got_idx = read_state(x_index, x_dec)
    assert got_dec == want_dec
    assert got_idx == want_idx
    # replaying a fully committed batch is a no-op (marker short-circuit)
    assert ci.batch_committed(spark, x_index, 1)
    n_before = spark.read.parquet(x_dec).count()
    run_once()
    assert spark.read.parquet(x_dec).count() == n_before


def test_vector_ingest_crash_before_marker_replay_idempotent(
    spark, tmp_path, monkeypatch
):
    """The worst-window crash for the vector ingest: the index append
    COMMITTED but the batch marker did not. The replay re-screens with
    the batch's own prior admissions excluded (id shield), so decisions
    come out identical to an uninterrupted run and nothing is flagged as
    a duplicate of itself."""
    import json

    from practicum2_nof1_adhd_bd_spark.streaming import vector_ingest as vi

    def harness(sub):
        root = tmp_path / sub
        src = root / "src"
        src.mkdir(parents=True)
        dirs = (str(root / "index"), str(root / "dec"), str(root / "ckpt"))

        def land(name, rows):
            p = src / f".{name}.tmp"
            with open(p, "w") as f:
                for vec_id, v in rows:
                    f.write(
                        json.dumps({"vec_id": vec_id, "embedding": v}) + "\n"
                    )
            p.rename(src / name)

        def run_once(expect_fail=False):
            stream = spark.readStream.schema(
                "vec_id bigint, embedding array<double>"
            ).json(str(src))
            q = vi.ingest_vector_stream(stream, *dirs)
            if expect_fail:
                failed = False
                try:
                    q.awaitTermination(120)
                except Exception:
                    failed = True
                assert failed, "stream was expected to fail"
            else:
                assert q.awaitTermination(120)

        return land, run_once, dirs

    e1 = [0.5, -0.2, 0.8, 0.1]
    b1 = [(1, e1), (2, [-0.6, 0.4, -0.1, 0.9])]
    b2 = [(11, [x * 2 for x in e1]), (12, [0.05, -1.0, 0.2, -0.3])]

    land, run_once, (c_index, c_dec, _) = harness("vcontrol")
    land("b1.json", b1)
    run_once()
    land("b2.json", b2)
    run_once()

    def read_state(index_dir, dec_dir):
        dec = sorted(
            map(
                tuple,
                spark.read.schema(vi.VDECISION_SCHEMA)
                .parquet(dec_dir)
                .select("vec_id", "status", "matched_id")
                .collect(),
            )
        )
        idx = sorted(
            r["vec_id"]
            for r in spark.read.schema(vi.VINDEX_SCHEMA)
            .parquet(index_dir)
            .select("vec_id")
            .distinct()
            .collect()
        )
        return dec, idx

    want_dec, want_idx = read_state(c_index, c_dec)

    land, run_once, (x_index, x_dec, _) = harness("vcrash")
    land("b1.json", b1)
    run_once()

    real_mark = vi.mark_batch_committed
    state = {"fail": True}

    def failing_mark(spark_, index_dir, batch_id):
        if state["fail"]:
            state["fail"] = False
            raise IOError("injected crash after index append, before marker")
        return real_mark(spark_, index_dir, batch_id)

    monkeypatch.setattr(vi, "mark_batch_committed", failing_mark)
    land("b2.json", b2)
    run_once(expect_fail=True)   # index appended, marker missing
    run_once()                   # replay: id shield keeps decisions right

    got_dec, got_idx = read_state(x_index, x_dec)
    assert got_dec == want_dec
    assert got_idx == want_idx


def test_corpus_ingest_crash_before_marker_replay_idempotent(
    spark, tmp_path, monkeypatch
):
    """Worst-window crash for the CORPUS ingest: the index append
    committed but the batch marker did not. The replay must not flag the
    batch's own prior admissions as duplicates of themselves — the
    own-id shield excludes them from both screens — so decisions come
    out identical to an uninterrupted control run."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    base = "sphinx of black quartz judge my vow again and again today"
    b1 = [(1, base), (2, "some other unrelated content entirely")]
    b2 = [(11, base), (12, "fresh novel words matching nothing stored")]

    land, run_once, c_index, c_dec = _corpus_ingest_harness(
        spark, tmp_path, "mcontrol"
    )
    land("b1.json", b1)
    run_once()
    land("b2.json", b2)
    run_once()

    def read_dec(dec_dir):
        return sorted(
            map(
                tuple,
                spark.read.schema(ci.DECISION_SCHEMA)
                .parquet(dec_dir)
                .select("doc_id", "status", "matched_id")
                .collect(),
            )
        )

    want = read_dec(c_dec)

    land, run_once, x_index, x_dec = _corpus_ingest_harness(
        spark, tmp_path, "mcrash"
    )
    land("b1.json", b1)
    run_once()

    real_mark = ci.mark_batch_committed
    state = {"fail": True}

    def failing_mark(spark_, index_dir, batch_id):
        if state["fail"]:
            state["fail"] = False
            raise IOError("injected crash after index append, before marker")
        return real_mark(spark_, index_dir, batch_id)

    monkeypatch.setattr(ci, "mark_batch_committed", failing_mark)
    land("b2.json", b2)
    run_once(expect_fail=True)   # index already holds batch 1's admissions
    run_once()                   # replay: own-id shield keeps decisions right

    assert read_dec(x_dec) == want
    # the stored index may carry duplicate signature ROWS for the batch
    # (documented marker-window residue); the distinct id set must match
    ids = sorted(
        r["doc_id"]
        for r in spark.read.schema(ci.INDEX_SCHEMA)
        .option("basePath", x_index)
        .parquet(x_index)
        .select("doc_id")
        .distinct()
        .collect()
    )
    want_ids = sorted(
        r["doc_id"]
        for r in spark.read.schema(ci.INDEX_SCHEMA)
        .option("basePath", c_index)
        .parquet(c_index)
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert ids == want_ids


def test_maybe_compact_index_policy(spark, tmp_path):
    """The compaction policy fires only past the files-per-directory
    threshold, leaves the artifact untouched below it, and serving stays
    bit-identical across a triggered compaction."""
    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    index_dir = str(tmp_path / "idx")
    for b in range(4):
        batch = spark.createDataFrame(
            [
                # same TEXTS every batch (fresh ids): identical hashes
                # land in the same hp= dirs, so hot dirs accrete one
                # file per append
                (b * 10 + i, f"policy doc {i} alpha bravo charlie")
                for i in range(6)
            ],
            "doc_id long, text string",
        )
        ci.write_index(
            ci._batch_signatures(batch, "text", "doc_id", 8, 3),
            index_dir,
            mode="append",
        )

    # 4 appends -> hot hp dirs hold up to 4 files; generous threshold: no-op
    did, nb, na = sim.maybe_compact_index(
        spark, index_dir, ["hp"], max_files_per_dir=16
    )
    assert did is False and nb == na

    rows_before = sorted(
        map(
            tuple,
            spark.read.schema(ci.INDEX_SCHEMA)
            .option("basePath", index_dir)
            .parquet(index_dir)
            .select("doc_id", "text_hash")
            .collect(),
        )
    )
    # tight threshold: compaction fires and reclaims files
    did, nb, na = sim.maybe_compact_index(
        spark, index_dir, ["hp"], max_files_per_dir=1
    )
    assert did is True and na < nb
    rows_after = sorted(
        map(
            tuple,
            spark.read.schema(ci.INDEX_SCHEMA)
            .option("basePath", index_dir)
            .parquet(index_dir)
            .select("doc_id", "text_hash")
            .collect(),
        )
    )
    assert rows_after == rows_before


def test_ingest_stream_auto_compaction_end_to_end(spark, tmp_path):
    """ingest_stream(auto_compact_max_files=1): compaction triggers in
    the batch gaps of a live stream, the bloom sidecar and commit
    markers survive the swaps, and decisions across batches are
    identical to an uncompacted control run."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    base = "how vexingly quick daft zebras jump over and over again"

    def harness(sub, **kw):
        import json

        root = tmp_path / sub
        src = root / "src"
        src.mkdir(parents=True)
        index_dir = str(root / "index")
        dec_dir = str(root / "dec")
        ckpt = str(root / "ckpt")

        def land(name, rows):
            p = src / f".{name}.tmp"
            with open(p, "w") as f:
                for doc_id, text in rows:
                    f.write(
                        json.dumps({"doc_id": doc_id, "text": text}) + "\n"
                    )
            p.rename(src / name)

        def run_once():
            stream = spark.readStream.schema(
                "doc_id bigint, text string"
            ).json(str(src))
            q = ci.ingest_stream(stream, index_dir, dec_dir, ckpt, **kw)
            assert q.awaitTermination(120)

        return land, run_once, index_dir, dec_dir

    batches = [
        [(1, base), (2, "first batch other content")],
        [(11, base), (12, "second batch novel words")],
        [(21, base), (22, "third batch more novel words")],
    ]

    land, run_once, _c_idx, c_dec = harness("nocompact")
    for b, rows in enumerate(batches):
        land(f"b{b}.json", rows)
        run_once()
    want = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(c_dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )

    land, run_once, x_idx, x_dec = harness(
        "autocompact", auto_compact_max_files=1
    )
    for b, rows in enumerate(batches):
        land(f"b{b}.json", rows)
        run_once()
    got = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(x_dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    assert got == want
    # bloom and markers survived the mid-stream compactions
    assert ci._read_bloom(spark, x_idx) is not None
    assert ci.batch_committed(spark, x_idx, 2)


def test_compact_index_preserves_all_digit_partition_names(spark, tmp_path):
    """Partition directory names must round-trip BYTE-FOR-BYTE through
    compaction. With Spark's partition-column type inference on, an
    artifact whose every hp= value is all-digits ('hp=07', 'hp=12') is
    re-typed int during the compaction read and rewritten unpadded
    ('hp=7') — and the Bloom-pruned exact screen intersects 2-char
    string prefixes against directory names, so those hashes would be
    silently skipped (dup admitted). compact_index reads with inference
    disabled, so string values are exactly the directory-name text."""
    import os

    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim

    index_dir = str(tmp_path / "digit_idx")
    rows = [
        (1, "07" + "a" * 30, [1, 2], "07"),
        (2, "12" + "b" * 30, [3, 4], "12"),
        (3, "99" + "c" * 30, [5, 6], "99"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text_hash string, sig array<bigint>, hp string"
    )
    df.write.partitionBy("hp").parquet(index_dir)
    before = {
        n for n in os.listdir(index_dir) if n.startswith("hp=")
    }
    assert before == {"hp=07", "hp=12", "hp=99"}
    sim.compact_index(spark, index_dir, partition_cols=["hp"])
    after = {n for n in os.listdir(index_dir) if n.startswith("hp=")}
    assert after == before  # 'hp=07' NOT rewritten as 'hp=7'
    got = sorted(
        (r["doc_id"], r["text_hash"])
        for r in spark.read.parquet(index_dir)
        .select("doc_id", "text_hash")
        .collect()
    )
    assert got == sorted((r[0], r[1]) for r in rows)


def test_recover_interrupted_compaction_restores_parked_artifact(
    spark, tmp_path
):
    """A crash between compact_index's two renames leaves the artifact
    parked at path__precompact with path absent — exactly the state the
    ingest cold-start check would misread as 'nothing ingested yet'.
    Recovery renames it back; a committed-swap leftover (both exist) is
    left alone."""
    import os

    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim

    index_dir = str(tmp_path / "park_idx")
    spark.createDataFrame(
        [(1, "ab" + "x" * 30, [1], "ab")],
        "doc_id long, text_hash string, sig array<bigint>, hp string",
    ).write.partitionBy("hp").parquet(index_dir)
    # simulate the crash window: first rename done, second never ran
    os.rename(index_dir, index_dir + "__precompact")
    assert sim.recover_interrupted_compaction(spark, index_dir) is True
    assert os.path.isdir(index_dir)
    assert not os.path.exists(index_dir + "__precompact")
    assert spark.read.parquet(index_dir).count() == 1
    # nothing parked: no-op
    assert sim.recover_interrupted_compaction(spark, index_dir) is False


def test_corpus_ingest_recovers_from_interrupted_compaction(
    spark, tmp_path
):
    """End-to-end: park the corpus signature index (crashed swap), then
    run the NEXT micro-batch — the stream must restore the artifact
    before its cold-start check, so a stored duplicate is still
    rejected instead of the stream silently rebuilding from empty."""
    import json
    import os

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    base = (
        "recovery alpha bravo charlie delta echo foxtrot golf hotel "
        "india juliet kilo lima mike november oscar papa quebec romeo"
    )
    src = tmp_path / "rsrc"
    src.mkdir()
    index_dir = str(tmp_path / "ridx")
    dec_dir = str(tmp_path / "rdec")
    ckpt = str(tmp_path / "rckpt")

    def land(name, rows):
        tmp = src / f".{name}.tmp"
        with open(tmp, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        tmp.rename(src / name)

    def run_once():
        stream = spark.readStream.schema("doc_id bigint, text string").json(
            str(src)
        )
        q = ci.ingest_stream(stream, index_dir, dec_dir, ckpt)
        assert q.awaitTermination(120)

    land("b1.json", [(1, base)])
    run_once()
    # crashed swap: artifact parked, index_dir gone
    os.rename(index_dir, index_dir + "__precompact")
    land("b2.json", [(21, base), (22, "another novel document words")])
    run_once()
    dec = {r["doc_id"]: r for r in spark.read.parquet(dec_dir).collect()}
    assert dec[21]["status"] == "exact_dup" and dec[21]["matched_id"] == 1
    assert dec[22]["status"] == "admitted"
    idx = spark.read.schema(ci.INDEX_SCHEMA).parquet(index_dir)
    assert sorted(r["doc_id"] for r in idx.collect()) == [1, 22]


def test_compact_index_dedup_cols_repairs_replay_duplicates(
    spark, tmp_path
):
    """compact_index(dedup_cols=[id]) drops the full-row-identical
    duplicates the marker-window replay can append, making the ingest
    docstring's 'compaction rewrites them away' claim literally true."""
    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    index_dir = str(tmp_path / "dup_idx")
    batch = spark.createDataFrame(
        [(i, f"dedup doc {i} alpha bravo charlie") for i in range(5)],
        "doc_id long, text string",
    )
    sigs = ci._batch_signatures(batch, "text", "doc_id", 8, 3)
    ci.write_index(sigs, index_dir, mode="append")
    ci.write_index(sigs, index_dir, mode="append")  # replayed append
    assert (
        spark.read.schema(ci.INDEX_SCHEMA).parquet(index_dir).count() == 10
    )
    sim.compact_index(
        spark, index_dir, partition_cols=["hp"], dedup_cols=["doc_id"]
    )
    after = spark.read.schema(ci.INDEX_SCHEMA).parquet(index_dir)
    assert after.count() == 5
    assert sorted(r["doc_id"] for r in after.collect()) == list(range(5))


def test_guard_decisions_layout_rejects_legacy_flat_sink(spark, tmp_path):
    """Pointing the per-batch (batch=N) decisions sink at a pre-existing
    flat-layout decisions dir must fail loudly — mixing root-level data
    files with partition dirs breaks partition discovery for readers."""
    import pytest

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    legacy = str(tmp_path / "legacy_dec")
    spark.createDataFrame(
        [(1, "admitted", None)], ci.DECISION_SCHEMA
    ).coalesce(1).write.parquet(legacy)
    with pytest.raises(ValueError, match="legacy"):
        ci._guard_decisions_layout(spark, legacy)
    # absent dir and per-batch layout both pass
    ci._guard_decisions_layout(spark, str(tmp_path / "never_written"))
    ok = str(tmp_path / "ok_dec")
    spark.createDataFrame(
        [(1, "admitted", None)], ci.DECISION_SCHEMA
    ).write.parquet(f"{ok}/batch=0")
    ci._guard_decisions_layout(spark, ok)


def test_maybe_compact_index_sampling_bounds_listing(spark, tmp_path):
    """With sample_dirs below the directory count, the policy probes a
    rotating window: any single call lists at most sample_dirs dirs, and
    a hot directory is still detected within ceil(n/sample) cursor
    steps — bounded per-batch listing cost at scale."""
    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    index_dir = str(tmp_path / "sample_idx")
    batch = spark.createDataFrame(
        [(i, f"sampling doc {i} alpha bravo charlie") for i in range(8)],
        "doc_id long, text string",
    )
    sigs = ci._batch_signatures(batch, "text", "doc_id", 8, 3)
    for _ in range(3):  # hot dirs accrete 3 files each
        ci.write_index(sigs, index_dir, mode="append")
    n_dirs = len(ci._hp_dirs(spark, index_dir))
    assert n_dirs >= 2

    # sampled probe, generous threshold: never fires, and the probed
    # count is bounded by one directory's files (3), not the artifact's
    did, nb, na = sim.maybe_compact_index(
        spark, index_dir, ["hp"], max_files_per_dir=16, sample_dirs=1,
        cursor=0,
    )
    assert did is False and nb == na <= 3

    # tight threshold: a full cursor rotation must hit a hot dir
    fired_at = None
    for cur in range(n_dirs):
        did, nb, na = sim.maybe_compact_index(
            spark, index_dir, ["hp"], max_files_per_dir=1, sample_dirs=1,
            cursor=cur,
        )
        if did:
            fired_at = cur
            break
    assert fired_at is not None


def test_screen_batch_keyed_grain_url_seen_filter(spark):
    """key_expr switches the dedup grain: the index key is
    md5(canonical_url(url)), near screens are vacuous (null sigs), and
    two spellings of one resource collapse — in-batch (min id wins) and
    against the stored index — while distinct resources admit even when
    their TEXT would be near-identical."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import urls
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    key = urls.canonical_url(F.col("url"))
    index = ci._batch_signatures(
        spark.createDataFrame(
            [(1, "http://a.com/x?id=1")], "doc_id bigint, url string"
        ),
        "url", "doc_id", 8, 3, key_expr=key,
    )
    assert index.filter(F.col("sig").isNotNull()).count() == 0
    batch = spark.createDataFrame(
        [
            (10, "HTTP://A.com:80/x/?id=1&utm_source=s"),  # stored, respelled
            (11, "http://b.com/p?q=1"),                     # new resource
            (12, "http://www.b.com/p?q=1#top"),             # batch twin of 11
            (13, "http://b.com/p?q=2"),  # near-identical TEXT, distinct URL
        ],
        "doc_id bigint, url string",
    )
    dec, sigs, cleanup = ci.screen_batch(batch, index, "url", key_expr=key)
    try:
        d = {r["doc_id"]: r for r in dec.collect()}
        assert d[10]["status"] == "exact_dup" and d[10]["matched_id"] == 1
        assert d[11]["status"] == "admitted"
        assert d[12]["status"] == "exact_dup" and d[12]["matched_id"] == 11
        assert d[13]["status"] == "admitted"
        # admitted signature rows carry the KEY hash and null sigs, so the
        # appended index stays at URL grain
        s = sigs.collect()
        assert sorted(r["doc_id"] for r in s) == [11, 13]
        assert all(r["sig"] is None for r in s)
    finally:
        cleanup()


def test_attribution_join_stream_horizon_edges(spark, tmp_path):
    """Stream-stream interval join semantics: a response exactly AT the
    horizon is included, one second past it is excluded, same-instant
    matches count, and keys never cross."""
    from practicum2_nof1_adhd_bd_spark.streaming import attribution_join_stream

    rows = [
        # (event_id, ts, user_id, kind)
        (1, "2024-01-01 10:00:00", 1, "t"),
        (2, "2024-01-01 12:00:00", 1, "r"),   # exactly +2h -> in
        (3, "2024-01-01 12:00:01", 1, "r"),   # +2h 1s -> out
        (4, "2024-01-01 10:00:00", 1, "r"),   # same instant -> in
        (5, "2024-01-01 09:59:59", 1, "r"),   # before trigger -> out
        (6, "2024-01-01 10:30:00", 2, "r"),   # other user -> out
        (7, "2024-01-01 11:00:00", 2, "t"),
        (8, "2024-01-01 11:05:00", 2, "r2"),  # matches trigger 7
    ]
    schema = "event_id bigint, ts timestamp, user_id bigint, kind string"
    src = str(tmp_path / "attrib_src")
    spark.createDataFrame(
        [(i, dt.datetime.fromisoformat(t), u, k) for i, t, u, k in rows], schema
    ).write.mode("overwrite").parquet(src)

    triggers = spark.readStream.schema(schema).parquet(src).filter(
        F.col("kind") == "t"
    )
    responses = spark.readStream.schema(schema).parquet(src).filter(
        F.col("kind").startswith("r")
    )
    joined = attribution_join_stream(triggers, responses).select(
        F.col("t.event_id").alias("tid"), F.col("r.event_id").alias("rid")
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_attrib"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {(r["tid"], r["rid"]) for r in spark.sql("SELECT * FROM attrib_t").collect()}
    assert got == {(1, 2), (1, 4), (7, 8)}


def test_sliding_stats_stream_overlap_semantics(spark, tmp_path):
    """1-day windows sliding 6h: every event lands in exactly 4 windows,
    and a window's stats only cover events inside [start, start+1d)."""
    from practicum2_nof1_adhd_bd_spark.streaming import sliding_stats_stream

    src, batch = _write_source(spark, tmp_path)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = _run_stream(
        spark, sliding_stats_stream(stream), "sliding_t", tmp_path
    ).collect()
    total_events = sum(r["n_events"] for r in out)
    assert total_events == len(ROWS) * 4  # each event in 4 windows
    by_start = {r["window_start_epoch"]: r for r in out}
    # grid-aligned: every start is a multiple of 6h
    assert all(s % 21600 == 0 for s in by_start)
    # the window starting exactly at 2024-01-01 00:00 UTC covers all
    # three day-1 events and none of day-2's
    import datetime as dt2

    s0 = int(dt2.datetime(2024, 1, 1, tzinfo=dt2.timezone.utc).timestamp())
    assert by_start[s0]["n_events"] == 3
    assert by_start[s0]["value_min"] == 5.0 and by_start[s0]["value_max"] == 20.0


def test_decisions_retention_policy_archives_and_preserves_rows(
    spark, tmp_path
):
    """maybe_compact_decisions: under threshold nothing moves; over it,
    committed batches older than keep_last roll into the batch=-1
    archive with provenance moved to the src_batch column, the contract
    read (explicit schema over the root) returns the identical row
    multiset, and a second invocation is a no-op."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    dec = str(tmp_path / "dec")
    for b in range(10):
        spark.createDataFrame(
            [(100 * b + i, "admitted", None) for i in range(3)],
            ci.DECISION_SCHEMA,
        ).coalesce(1).write.parquet(f"{dec}/batch={b}")
    want = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    # under threshold: untouched
    assert ci.maybe_compact_decisions(spark, dec, 9, max_batch_dirs=16) == 0
    assert ci._decision_batch_dirs(spark, dec) == list(range(10))
    # over threshold: batches 0..(9 - keep_last) archive
    n = ci.maybe_compact_decisions(
        spark, dec, 9, max_batch_dirs=4, keep_last=3
    )
    assert n == 7  # batches 0..6
    assert ci._decision_batch_dirs(spark, dec) == [-1, 7, 8, 9]
    got = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    assert got == want
    # provenance moved into the archive's src_batch column
    arch = spark.read.parquet(f"{dec}/batch=-1")
    assert sorted(
        r["src_batch"] for r in arch.select("src_batch").distinct().collect()
    ) == list(range(7))
    # idempotent: live dirs now under threshold
    assert ci.maybe_compact_decisions(
        spark, dec, 9, max_batch_dirs=4, keep_last=3
    ) == 0
    # re-archiving later batches merges INTO the existing archive
    assert ci.compact_decisions(spark, dec, 8) == 2
    assert ci._decision_batch_dirs(spark, dec) == [-1, 9]
    got2 = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    assert got2 == want


def test_decisions_compaction_crash_recovery(spark, tmp_path):
    """Crash injection around the archive swap: a COMPLETE precompact
    dir (crash after write, before swap) is finished by recovery —
    covered batch dirs deleted, archive in place, no duplicate rows; a
    PARTIAL precompact (no _SUCCESS) is discarded untouched."""
    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    dec = str(tmp_path / "dec")
    for b in range(4):
        spark.createDataFrame(
            [(10 * b + i, "admitted", None) for i in range(2)],
            ci.DECISION_SCHEMA,
        ).coalesce(1).write.parquet(f"{dec}/batch={b}")
    want = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    # simulate the crash: write the combined precompact COMPLETELY
    # (batches 0-1), then "crash" before the swap
    pre = dec + "__decisions_precompact"
    spark.read.schema(ci.DECISION_SCHEMA + ", batch int").option(
        "basePath", dec
    ).parquet(f"{dec}/batch=0", f"{dec}/batch=1").withColumn(
        "src_batch", F.col("batch").cast("int")
    ).drop("batch").write.parquet(pre)
    assert ci.recover_decisions_compaction(spark, dec)
    assert ci._decision_batch_dirs(spark, dec) == [-1, 2, 3]
    got = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    assert got == want
    # partial precompact: discard, sink untouched
    import os
    import shutil

    spark.createDataFrame(
        [(999, "admitted", None, 2)], ci.DECISION_SCHEMA + ", src_batch int"
    ).write.parquet(pre)
    os.remove(os.path.join(pre, "_SUCCESS"))
    assert ci.recover_decisions_compaction(spark, dec)
    assert not os.path.exists(pre)
    assert ci._decision_batch_dirs(spark, dec) == [-1, 2, 3]
    got2 = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    assert got2 == want


def test_ingest_stream_decisions_retention_end_to_end(spark, tmp_path):
    """ingest_stream(decisions_max_dirs=...): the retention policy runs
    in the live stream's batch gaps and the decisions read-back stays
    identical to an unretained control run."""
    import json

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci

    base = "sphinx of black quartz judge my streaming vow"

    def harness(sub, **kw):
        root = tmp_path / sub
        src = root / "src"
        src.mkdir(parents=True)
        dirs = (str(root / "index"), str(root / "dec"), str(root / "ckpt"))

        def land(name, rows):
            p = src / f".{name}.tmp"
            with open(p, "w") as f:
                for doc_id, text in rows:
                    f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
            p.rename(src / name)

        def run_once():
            stream = spark.readStream.schema(
                "doc_id bigint, text string"
            ).json(str(src))
            q = ci.ingest_stream(stream, *dirs, **kw)
            assert q.awaitTermination(120)

        return land, run_once, dirs[1]

    batches = [
        [(1, base), (2, "batch zero unique words")],
        [(11, base), (12, "batch one novel phrasing")],
        [(21, base), (22, "batch two more material")],
        [(31, base), (32, "batch three final text")],
    ]

    land, run_once, c_dec = harness("control")
    for b, rows in enumerate(batches):
        land(f"b{b}.json", rows)
        run_once()
    want = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(c_dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )

    land, run_once, r_dec = harness(
        "retained", decisions_max_dirs=1, decisions_keep_last=1
    )
    for b, rows in enumerate(batches):
        land(f"b{b}.json", rows)
        run_once()
    got = sorted(
        map(
            tuple,
            spark.read.schema(ci.DECISION_SCHEMA)
            .parquet(r_dec)
            .select("doc_id", "status", "matched_id")
            .collect(),
        )
    )
    assert got == want
    # the retained sink really did archive: batch=-1 present, fewer
    # live dirs than batches
    dirs = ci._decision_batch_dirs(spark, r_dec)
    assert -1 in dirs
    assert len([d for d in dirs if d >= 0]) < len(batches)


def test_vector_ingest_decisions_retention_end_to_end(spark, tmp_path):
    """ingest_vector_stream(decisions_max_dirs=...): the retention
    policy runs in the vector stream's batch gaps with the
    VDECISION_SCHEMA (vec_id grain), decisions stay identical to a
    control run, and the archive carries src_batch provenance."""
    import json

    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci
    from practicum2_nof1_adhd_bd_spark.streaming import vector_ingest as vi

    vecs = [
        [1.0, 0.2, 0.1, 0.05],
        [-1.0, -0.2, 0.3, 0.4],
        [0.05, -1.0, 0.2, -0.3],
        [0.3, 0.4, -1.0, 0.1],
    ]

    def harness(sub, **kw):
        root = tmp_path / sub
        src = root / "src"
        src.mkdir(parents=True)
        dirs = (str(root / "index"), str(root / "dec"), str(root / "ckpt"))

        def land(name, rows):
            p = src / f".{name}.tmp"
            with open(p, "w") as f:
                for vec_id, v in rows:
                    f.write(
                        json.dumps({"vec_id": vec_id, "embedding": v}) + "\n"
                    )
            p.rename(src / name)

        def run_once():
            stream = spark.readStream.schema(
                "vec_id bigint, embedding array<double>"
            ).json(str(src))
            q = vi.ingest_vector_stream(stream, *dirs, **kw)
            assert q.awaitTermination(120)

        return land, run_once, dirs[1]

    batches = [
        [(1, vecs[0]), (2, vecs[1])],
        [(11, [x * 2 for x in vecs[0]]), (12, vecs[2])],  # 11 near-dups 1
        [(21, vecs[3]), (22, [x * 3 for x in vecs[2]])],  # 22 near-dups 12
        [(31, [x * 0.5 for x in vecs[1]])],               # near-dups 2
    ]

    land, run_once, c_dec = harness("control")
    for b, rows in enumerate(batches):
        land(f"b{b}.json", rows)
        run_once()
    want = sorted(
        map(
            tuple,
            spark.read.schema(vi.VDECISION_SCHEMA)
            .parquet(c_dec)
            .select("vec_id", "status", "matched_id")
            .collect(),
        )
    )

    land, run_once, r_dec = harness(
        "retained", decisions_max_dirs=1, decisions_keep_last=1
    )
    for b, rows in enumerate(batches):
        land(f"b{b}.json", rows)
        run_once()
    got = sorted(
        map(
            tuple,
            spark.read.schema(vi.VDECISION_SCHEMA)
            .parquet(r_dec)
            .select("vec_id", "status", "matched_id")
            .collect(),
        )
    )
    assert got == want
    dirs = ci._decision_batch_dirs(spark, r_dec)
    assert -1 in dirs
    assert len([d for d in dirs if d >= 0]) < len(batches)
    # archive rows carry vec_id-grain schema + src_batch provenance
    arch = spark.read.parquet(f"{r_dec}/batch=-1")
    assert {"vec_id", "status", "matched_id", "src_batch"} <= set(arch.columns)


def test_qsketch_stream_accumulates_across_batches_and_runs(spark, tmp_path):
    """Incremental percentile maintenance: micro-batches append only
    their own bucket counts; the merged read equals the one-pass sketch
    of everything streamed so far, and a SECOND stream run over newly
    landed files (same checkpoint) continues accumulating without
    re-reading history."""
    import json

    from practicum2_nof1_adhd_bd_spark.operators import sketches
    from practicum2_nof1_adhd_bd_spark.streaming import qsketch_ingest as qi

    src = tmp_path / "src"
    src.mkdir()
    sketch_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    knobs = dict(n_buckets=32, lo=0.0, hi=64.0)

    def land(name, rows):
        p = src / f".{name}.tmp"
        with open(p, "w") as f:
            for g, v in rows:
                f.write(json.dumps({"g": g, "v": v}) + "\n")
        p.rename(src / name)

    def run_once():
        stream = (
            spark.readStream.schema("g string, v double")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = qi.qsketch_stream(
            stream, sketch_dir, ckpt, ["g"], "v", **knobs
        )
        assert q.awaitTermination(120)

    b1 = [("a", float(v)) for v in (1, 5, 5, 9, 33)]
    b2 = [("a", float(v)) for v in (2, 40, 40)] + [("b", 7.0)]
    land("f1.json", b1)
    land("f2.json", b2)
    run_once()

    all_rows = b1 + b2
    whole = sketches.qhist_sketch(
        spark.createDataFrame(all_rows, "g string, v double"),
        ["g"], "v", **knobs,
    )
    merged = qi.read_merged_sketch(spark, sketch_dir, ["g"])
    assert sorted(map(tuple, merged.select("g", "bucket", "n").collect())) \
        == sorted(map(tuple, whole.collect()))

    # second RUN over a newly landed file: the checkpoint consumes only
    # the new file, and the artifact keeps accumulating
    b3 = [("b", float(v)) for v in (7, 7, 50)]
    land("f3.json", b3)
    run_once()
    whole2 = sketches.qhist_sketch(
        spark.createDataFrame(all_rows + b3, "g string, v double"),
        ["g"], "v", **knobs,
    )
    merged2 = qi.read_merged_sketch(spark, sketch_dir, ["g"])
    assert sorted(map(tuple, merged2.select("g", "bucket", "n").collect())) \
        == sorted(map(tuple, whole2.collect()))


def test_qsketch_stream_retention_preserves_merged_sketch(spark, tmp_path):
    """compact_max_dirs wiring: batch dirs roll into the batch=-1
    archive mid-stream and the merged sketch is unchanged — counts are
    summable wherever they live."""
    import json

    from practicum2_nof1_adhd_bd_spark.operators import sketches
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci
    from practicum2_nof1_adhd_bd_spark.streaming import qsketch_ingest as qi

    src = tmp_path / "src"
    src.mkdir()
    sketch_dir = str(tmp_path / "sketch")
    ckpt = str(tmp_path / "ckpt")
    knobs = dict(n_buckets=16, lo=0.0, hi=16.0)
    rows = []
    for b in range(5):
        batch = [("g", float((b * 3 + j) % 16)) for j in range(4)]
        rows += batch
        p = src / f".f{b}.json.tmp"
        with open(p, "w") as f:
            for g, v in batch:
                f.write(json.dumps({"g": g, "v": v}) + "\n")
        p.rename(src / f"f{b}.json")
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = qi.qsketch_stream(
        stream, sketch_dir, ckpt, ["g"], "v",
        compact_max_dirs=1, keep_last=1, **knobs,
    )
    assert q.awaitTermination(120)
    dirs = ci._decision_batch_dirs(spark, sketch_dir)
    assert -1 in dirs and len([d for d in dirs if d >= 0]) < 5
    whole = sketches.qhist_sketch(
        spark.createDataFrame(rows, "g string, v double"), ["g"], "v", **knobs
    )
    merged = qi.read_merged_sketch(spark, sketch_dir, ["g"])
    assert sorted(map(tuple, merged.select("g", "bucket", "n").collect())) \
        == sorted(map(tuple, whole.collect()))


def _frontier_delays():
    # hand-pinned dim: slow.com throttled, others default at join time
    return [("slow.com", 4.0), ("fast.com", 1.0)]


def test_frontier_stream_requeues_overflow_across_waves(spark, tmp_path):
    """The streaming frontier's backlog is real: a capacity-limited host
    (delay 4, horizon 8 -> 2 slots/wave) emits its wave-1 top-2 and
    re-queues the rest; wave 2 schedules the re-queued candidates AHEAD
    of lower-priority new arrivals; the final backlog snapshot holds
    exactly what was never scheduled."""
    from practicum2_nof1_adhd_bd_spark.streaming import frontier_ingest as fi

    slots = str(tmp_path / "slots")
    backlog = str(tmp_path / "backlog")
    w1 = spark.createDataFrame(
        [(f"http://slow.com/a{i}", 10 - i) for i in range(5)],
        "url string, priority int",
    )
    fi.process_wave(
        spark, w1, 0, _frontier_delays(), slots, backlog, horizon_s=8.0
    )
    got0 = {r["url"]: r["slot"] for r in
            spark.read.parquet(f"{slots}/batch=0").collect()}
    # top-2 by priority: a0 (10) slot 0, a1 (9) slot 1
    assert got0 == {"http://slow.com/a0": 0, "http://slow.com/a1": 1}
    # wave 2: new low-priority candidates; re-queued a2 (8) and a3 (7)
    # outrank them
    w2 = spark.createDataFrame(
        [("http://slow.com/b0", 1), ("http://fast.com/c0", 1)],
        "url string, priority int",
    )
    fi.process_wave(
        spark, w2, 1, _frontier_delays(), slots, backlog, horizon_s=8.0
    )
    got1 = {r["url"]: r["slot"] for r in
            spark.read.parquet(f"{slots}/batch=1").collect()}
    assert got1 == {
        "http://slow.com/a2": 0, "http://slow.com/a3": 1,
        "http://fast.com/c0": 0,
    }
    left = {r["url"] for r in
            fi.read_backlog(spark, backlog, before_batch=2).collect()}
    assert left == {"http://slow.com/a4", "http://slow.com/b0"}


def test_frontier_wave_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running wave N with the same
    batch_id (crash replay) must land byte-identical slots AND backlog —
    the replay reads state={N-1}, never its own crashed state={N}."""
    from practicum2_nof1_adhd_bd_spark.streaming import frontier_ingest as fi

    slots = str(tmp_path / "slots")
    backlog = str(tmp_path / "backlog")
    w1 = spark.createDataFrame(
        [(f"http://slow.com/a{i}", i) for i in range(6)],
        "url string, priority int",
    )
    fi.process_wave(
        spark, w1, 0, _frontier_delays(), slots, backlog, horizon_s=8.0
    )
    w2 = spark.createDataFrame(
        [("http://slow.com/z", 99)], "url string, priority int"
    )
    fi.process_wave(
        spark, w2, 1, _frontier_delays(), slots, backlog, horizon_s=8.0
    )
    first_slots = sorted(
        map(tuple, spark.read.parquet(f"{slots}/batch=1").collect())
    )
    first_backlog = sorted(
        map(tuple, fi.read_backlog(spark, backlog, 2).collect())
    )
    # crash replay of wave 1 (state=1 exists from the "crashed" attempt)
    fi.process_wave(
        spark, w2, 1, _frontier_delays(), slots, backlog, horizon_s=8.0
    )
    assert sorted(
        map(tuple, spark.read.parquet(f"{slots}/batch=1").collect())
    ) == first_slots
    assert sorted(
        map(tuple, fi.read_backlog(spark, backlog, 2).collect())
    ) == first_backlog


def test_frontier_stream_retention_and_state_pruning(spark, tmp_path):
    """End-to-end: slots-dir retention reuses the decisions archive
    (batch=-1 + src_batch provenance) and read_all_slots surfaces the
    ORIGINAL wave ids; unreachable backlog snapshots are pruned as waves
    advance (only the last keep_states survive)."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci
    from practicum2_nof1_adhd_bd_spark.streaming import frontier_ingest as fi

    slots = str(tmp_path / "slots")
    backlog = str(tmp_path / "backlog")
    all_expected = []
    for b in range(5):
        wave = spark.createDataFrame(
            [(f"http://fast.com/w{b}_{j}", 5) for j in range(2)],
            "url string, priority int",
        )
        fi.process_wave(
            spark, wave, b, _frontier_delays(), slots, backlog,
            horizon_s=8.0, keep_states=2,
            compact_max_dirs=1, keep_last=1,
        )
        all_expected += [(b, f"http://fast.com/w{b}_{j}") for j in range(2)]
    dirs = ci._decision_batch_dirs(spark, slots)
    assert -1 in dirs and len([d for d in dirs if d >= 0]) < 5
    got = sorted(
        (r["batch"], r["url"])
        for r in fi.read_all_slots(spark, slots).collect()
    )
    assert got == sorted(all_expected)
    # state pruning: the current snapshot plus keep_states=2 prior ones
    assert fi._state_ids(spark, backlog) == [2, 3, 4]


def test_kmv_stream_accumulates_and_respects_retention(spark, tmp_path):
    """Streaming KMV: per-batch bottom-k hashes land under batch=N; the
    merged read equals the one-pass sketch of everything streamed (the
    bottom-k merge law), stays equal after a second run over newly
    landed files, AND after the retention policy folds batch dirs into
    the archive (dedup makes archived rows harmless)."""
    import json

    from practicum2_nof1_adhd_bd_spark.operators import sketches
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci
    from practicum2_nof1_adhd_bd_spark.streaming import qsketch_ingest as qi

    src = tmp_path / "src"
    src.mkdir()
    sketch_dir = str(tmp_path / "kmv")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        p = src / f".{name}.tmp"
        with open(p, "w") as f:
            for g, v in rows:
                f.write(json.dumps({"g": g, "v": v}) + "\n")
        p.rename(src / name)

    def run_once():
        stream = (
            spark.readStream.schema("g string, v long")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = qi.kmv_stream(
            stream, sketch_dir, ckpt, ["g"], "v", k=8,
            compact_max_dirs=1, keep_last=1,
        )
        assert q.awaitTermination(120)

    b1 = [("a", v) for v in (1, 5, 5, 9, 33, 2, 7, 8, 11, 13)]
    b2 = [("a", v) for v in (2, 40, 41, 42, 43, 44)] + [("b", 7)]
    land("f1.json", b1)
    land("f2.json", b2)
    run_once()
    whole = sketches.kmv_sketch(
        spark.createDataFrame(b1 + b2, "g string, v long"), ["g"], "v", k=8
    )
    merged = qi.read_merged_kmv(spark, sketch_dir, ["g"], k=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # second run over a new file keeps accumulating off the checkpoint
    b3 = [("b", v) for v in (7, 50, 51)]
    land("f3.json", b3)
    run_once()
    whole2 = sketches.kmv_sketch(
        spark.createDataFrame(b1 + b2 + b3, "g string, v long"),
        ["g"], "v", k=8,
    )
    merged2 = qi.read_merged_kmv(spark, sketch_dir, ["g"], k=8)
    assert sorted(map(tuple, merged2.collect())) == sorted(
        map(tuple, whole2.collect())
    )
    # retention actually folded dirs (compact_max_dirs=1) and the merged
    # sketch above was read straight through the archive
    dirs = ci._decision_batch_dirs(spark, sketch_dir)
    assert -1 in dirs


def test_frontier_state_depth_flat_at_110_waves(spark, tmp_path):
    """r14 verdict #6: drive 110 real waves through process_wave with a
    persistently-throttled host so the backlog carries work across every
    wave. State-dir count must stay flat at keep_states+1 the whole way
    (never one dir per wave), the slots sink must stay compacted, and
    the wave-grain accounting must close exactly: emitted + final
    backlog == everything ever enqueued."""
    from practicum2_nof1_adhd_bd_spark.streaming import corpus_ingest as ci
    from practicum2_nof1_adhd_bd_spark.streaming import frontier_ingest as fi

    slots = str(tmp_path / "slots")
    backlog = str(tmp_path / "backlog")
    n_waves, per_wave = 110, 3
    # slow.com at delay 4.0 under an 8s horizon -> capacity 2 slots/wave,
    # so each 3-candidate wave leaves one URL for the next wave: a real,
    # growing backlog riding the state snapshots across all 110 waves
    max_state_dirs = 0
    for b in range(n_waves):
        wave = spark.createDataFrame(
            [(f"http://slow.com/w{b}_{j}", 5) for j in range(per_wave)],
            "url string, priority int",
        )
        fi.process_wave(
            spark, wave, b, _frontier_delays(), slots, backlog,
            horizon_s=8.0, keep_states=2,
            compact_max_dirs=4, keep_last=2,
        )
        max_state_dirs = max(max_state_dirs, len(fi._state_ids(spark, backlog)))
    assert max_state_dirs <= 3, "state dirs must stay flat at keep_states+1"
    assert fi._state_ids(spark, backlog) == [107, 108, 109]
    live_dirs = [
        d for d in ci._decision_batch_dirs(spark, slots) if d >= 0
    ]
    assert len(live_dirs) <= 4 + 2, "slots sink must stay compacted"
    emitted = fi.read_all_slots(spark, slots)
    n_emitted = emitted.count()
    final_backlog = fi.read_backlog(spark, backlog, n_waves).count()
    assert n_emitted == 2 * n_waves, "2 slots per wave (capacity-bound)"
    assert n_emitted + final_backlog == n_waves * per_wave
    # provenance intact through compaction at depth: every wave id 0..109
    # appears exactly twice in the folded archive + live dirs
    per_batch = {
        r["batch"]: r["n"]
        for r in emitted.groupBy("batch").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    assert per_batch == {b: 2 for b in range(n_waves)}
