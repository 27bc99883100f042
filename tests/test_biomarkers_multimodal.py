"""Unit tests — biomarkers (A3/A12), multimodal plumbing, imputation (A13)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from practicum2_nof1_adhd_bd_spark.operators import biomarkers, impute, multimodal


def _hr_events(spark, hrs, day="2024-01-01"):
    base = dt.datetime.fromisoformat(day)
    rows = [(base + dt.timedelta(minutes=i), float(h)) for i, h in enumerate(hrs)]
    return spark.createDataFrame(rows, "ts timestamp, value double")


def test_hrv_known_values(spark):
    # constant HR -> SDNN = 0, RMSSD = 0, pNN50 = 0
    out = biomarkers.hrv_time_domain(
        _hr_events(spark, [60.0] * 12), min_samples=10
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 12
    assert r["sdnn"] == 0.0 and r["rmssd"] == 0.0 and r["pnn50"] == 0.0


def test_hrv_rmssd_alternating(spark):
    # alternate 60 <-> 75 bpm: NN alternates 1000 <-> 800 ms, |diff| = 200 > 50
    out = biomarkers.hrv_time_domain(
        _hr_events(spark, [60.0, 75.0] * 6), min_samples=10
    ).collect()[0]
    assert out["rmssd"] == 200.0
    assert out["pnn50"] == 100.0


def test_hrv_min_sample_gate(spark):
    out = biomarkers.hrv_time_domain(
        _hr_events(spark, [60.0] * 5), min_samples=10
    ).collect()
    assert out == []


def test_interval_efficiency_clip(spark):
    rows = [
        ("2024-01-01T00:00:00", "asleep", 400.0),
        ("2024-01-01T01:00:00", "inbed", 100.0),
        ("2024-01-02T00:00:00", "asleep", 0.0),
        ("2024-01-02T01:00:00", "inbed", 480.0),
    ]
    df = spark.createDataFrame(rows, "ts string, state string, mins double").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {
        str(r["date"]): r
        for r in biomarkers.interval_efficiency(
            df, "ts", "state", "mins", "asleep", ["asleep", "inbed"]
        ).collect()
    }
    # 400/500 = 80%; clip keeps it; day 2: 0/480 = 0
    assert out["2024-01-01"]["efficiency"] == 80.0
    assert out["2024-01-02"]["efficiency"] == 0.0


def test_decode_features_deterministic(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "hello world")],
        "doc_id bigint, text string",
    )
    blobs = multimodal.text_to_blob_table(docs)
    out = {r["media_id"]: r for r in multimodal.decode_features(blobs).collect()}
    assert out[1]["content_md5"] == out[3]["content_md5"]
    assert out[1]["n_bytes"] == len("hello world")
    assert out[1]["codec"] == "fake" and out[1]["width"] is None
    assert 0.0 <= out[2]["mean_val"] <= 1.0
    # run twice -> identical (determinism)
    again = {r["media_id"]: r for r in multimodal.decode_features(blobs).collect()}
    assert all(out[k] == again[k] for k in out)


def test_bmp_codec_roundtrip():
    # known pixel grid: decoder must recover header dims + exact stats
    px = bytes(range(16))  # 0..15 gray values, 4x4
    blob = multimodal.make_bmp(px, 4, 4)
    assert blob[:2] == b"BM" and len(blob) == 102
    w, h, mean, std = multimodal._parse_bmp(blob)
    assert (w, h) == (4, 4)
    assert mean == 7.5  # mean of 0..15
    import statistics
    assert std == round(statistics.pstdev(range(16)), 6)


def test_bmp_row_padding_honored():
    # width 3 -> 9-byte rows padded to 12; padding must not pollute stats
    px = bytes([10] * 9)
    blob = multimodal.make_bmp(px, 3, 3)
    w, h, mean, std = multimodal._parse_bmp(blob)
    assert (w, h) == (3, 3)
    assert mean == 10.0 and std == 0.0


def test_wav_codec_roundtrip():
    samples = [(b - 128) * 256 for b in bytes(range(16))]
    blob = multimodal.make_wav(samples)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE" and len(blob) == 76
    rate, n, mean, std = multimodal._parse_wav(blob)
    assert rate == 16000 and n == 16
    import statistics
    assert mean == round(statistics.mean(samples), 6)
    assert std == round(statistics.pstdev(samples), 6)


def test_real_decode_end_to_end(spark):
    docs = spark.createDataFrame(
        [(1, "even"), (2, "odd")],  # len 4 -> bmp, len 3 -> wav
        "doc_id bigint, text string",
    )
    blobs = multimodal.synthetic_media_table(docs)
    out = {r["media_id"]: r for r in multimodal.decode_features(blobs).collect()}
    bmp, wav = out[1], out[2]
    assert bmp["codec"] == "bmp" and (bmp["width"], bmp["height"]) == (4, 4)
    assert bmp["n_bytes"] == 102 and bmp["sample_rate"] is None
    assert wav["codec"] == "wav" and wav["sample_rate"] == 16000
    assert wav["n_samples"] == 16 and wav["width"] is None
    # payload stats must equal digest-byte stats (the generator contract)
    import hashlib
    import statistics
    dig = hashlib.md5(b"even").digest()
    assert bmp["mean_val"] == round(statistics.mean(dig), 6)
    assert bmp["std_val"] == round(statistics.pstdev(dig), 6)


def test_frame_sample_counts(spark):
    docs = spark.createDataFrame(
        # length 23 -> 23 % 3 = 2 -> video, n_frames = 23 % 120 + 1 = 24
        [(1, "x" * 23), (2, "y" * 24)],  # 24 % 3 = 0 -> image, excluded
        "doc_id bigint, text string",
    )
    blobs = multimodal.text_to_blob_table(docs)
    out = multimodal.sample_frames(blobs, every_n=10).collect()
    idx = sorted(r["frame_idx"] for r in out)
    assert idx == [0, 10, 20]
    assert {r["media_id"] for r in out} == {1}


def test_resize_preserves_blob(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id bigint, text string")
    blobs = multimodal.text_to_blob_table(docs)
    out = multimodal.resize_stub(blobs, 224, 224).collect()[0]
    assert out["meta"]["width"] == 224 and out["meta"]["height"] == 224
    assert bytes(out["blob"]) == b"abc"


def test_impute_fills_all_nulls(spark):
    rows = []
    for seg in (1, 2):
        for i in range(10):
            x = float(i) if i % 3 else None
            rows.append((seg, i, x, float(2 * i)))
    df = spark.createDataFrame(rows, "segment_id int, idx int, x double, y double")
    out = impute.impute_per_segment(df, ["x", "y"], "segment_id")
    got = out.collect()
    assert len(got) == 20
    assert all(r["x"] is not None and not math.isnan(r["x"]) for r in got)
    # x ~ linear in y -> imputed values should be near the linear fit
    by_key = {(r["segment_id"], r["idx"]): r["x"] for r in got}
    assert by_key[(1, 3)] == pytest.approx(3.0, abs=0.75)


def test_impute_small_segment_median_fallback(spark):
    rows = [
        (1, 0, 10.0), (1, 1, 20.0), (1, 2, 30.0), (1, 3, 40.0), (1, 4, 50.0),
        (2, 0, None), (2, 1, 100.0),  # segment of 2 < min_rows -> global median
    ]
    df = spark.createDataFrame(rows, "segment_id int, idx int, x double")
    out = {
        (r["segment_id"], r["idx"]): r["x"]
        for r in impute.impute_per_segment(df, ["x"], "segment_id").collect()
    }
    assert out[(2, 0)] == 35.0  # exact median of [10..50, 100]


def test_real_bmp_resize_nearest_neighbor(spark):
    # 2x2 image with distinct gray levels; upscale to 4x4 and downscale back
    src = multimodal.make_bmp(bytes([10, 20, 30, 40]), 2, 2)
    blobs = spark.createDataFrame(
        [(1, bytearray(src), ("image", 2, 2, None, None))],
        "media_id long, blob binary, meta struct<media_type:string,width:int,"
        "height:int,n_frames:int,sample_rate:int>",
    )
    up = multimodal.resize_media(blobs, 4, 4).collect()[0]
    assert up["resized"] and (up["width"], up["height"]) == (4, 4)
    w, h, mean, _ = multimodal._parse_bmp(bytes(up["blob"]))
    assert (w, h) == (4, 4)
    # NN upscale 2x duplicates each pixel 4x -> mean preserved exactly
    assert mean == (10 + 20 + 30 + 40) / 4
    down = multimodal.resize_media(
        spark.createDataFrame(
            [(2, bytearray(bytes(up["blob"])), ("image", 4, 4, None, None))],
            "media_id long, blob binary, meta struct<media_type:string,width:int,"
            "height:int,n_frames:int,sample_rate:int>",
        ),
        2, 2,
    ).collect()[0]
    w2, h2, mean2, _ = multimodal._parse_bmp(bytes(down["blob"]))
    # round-trip restores the original 2x2 grid
    assert (w2, h2) == (2, 2) and mean2 == mean
    # non-BMP passes through byte-identical
    wav = multimodal.make_wav([0, 1000, -1000], 16000)
    out = multimodal.resize_media(
        spark.createDataFrame(
            [(3, bytearray(wav), ("audio", None, None, None, None))],
            "media_id long, blob binary, meta struct<media_type:string,width:int,"
            "height:int,n_frames:int,sample_rate:int>",
        ),
        8, 8,
    ).collect()[0]
    assert not out["resized"] and bytes(out["blob"]) == wav


def test_audio_frame_features_known_values(spark):
    """Hand-checkable clip: 8 samples, frames of 4; non-WAV rows skipped."""
    wav = multimodal.make_wav([100, -100, 200, -200, 0, 0, 0, 50])
    blobs = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"not a wav"))],
        "media_id long, blob binary",
    )
    out = {
        (r["media_id"], r["frame_idx"]): r
        for r in multimodal.audio_frame_features(blobs, frame=4).collect()
    }
    assert set(out) == {(1, 0), (1, 1)}
    f0, f1 = out[(1, 0)], out[(1, 1)]
    # frame 0: [100,-100,200,-200] -> 3 sign flips, peak 200
    assert f0["zero_crossings"] == 3 and f0["peak"] == 200
    assert f0["rms"] == round(
        (sum(x * x for x in (100, -100, 200, -200)) / 4) ** 0.5, 6
    )
    # frame 1: [0,0,0,50] -> zero counted non-negative: 0 flips, peak 50
    assert f1["zero_crossings"] == 0 and f1["peak"] == 50
    assert f1["n_in_frame"] == 4


def test_lzw_roundtrip_fuzz():
    """Codec-pair fuzz across width-boundary crossings, the cScSc
    special case, and the 4096-code table reset — the GIF walker's
    correctness rests on this pair."""
    import math
    import random

    rng = random.Random(7)
    for _ in range(60):
        n = rng.choice([1, 2, 16, 100, 777, 3000, 9000])
        alpha = rng.choice([4, 8, 16, 256])
        mcs = max(2, math.ceil(math.log2(alpha)))
        seq = [rng.randrange(alpha) for _ in range(n)]
        assert multimodal._lzw_decode(
            multimodal._lzw_encode(seq, mcs), mcs, n
        ) == seq
    # pathological repetition drives code == next_code (cScSc) densely
    seq = ([3, 3, 3, 3, 7] * 2000)[:5000]
    assert multimodal._lzw_decode(
        multimodal._lzw_encode(seq, 3), 3, 5000
    ) == seq


def test_gif_walker_samples_and_skips():
    """make_gif -> _walk_gif_frames round trip; every_n skips frames
    WITHOUT decoding them (only sampled indices come back)."""
    import random

    rng = random.Random(3)
    frames = [[rng.randrange(8) for _ in range(16)] for _ in range(5)]
    gif = multimodal.make_gif(frames, 4, 4, 8)
    assert gif[:6] == b"GIF89a" and gif[-1] == 0x3B
    nf, got = multimodal._walk_gif_frames(gif, 1)
    assert nf == 5 and [g[3] for g in got] == frames
    nf, got = multimodal._walk_gif_frames(gif, 2)
    assert [g[0] for g in got] == [0, 2, 4]
    assert [g[3] for g in got] == [frames[0], frames[2], frames[4]]


def test_gif_frame_features_known_values(spark):
    """One synthesized doc, hand-replayed formula: frame pixels are
    md5(f'{text}:{f}') digest bytes mod 8; every_n=2 keeps frames 0, 2."""
    import hashlib

    docs = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    gifs = multimodal.synthetic_gif_table(docs)
    out = {
        r["frame_idx"]: r
        for r in multimodal.gif_frame_features(gifs, every_n=2).collect()
    }
    n_frames = 2 + (len("abcd") % 4)  # = 2
    assert set(out) == ({0} if n_frames == 2 else {0, 2})
    for fidx, r in out.items():
        digest = hashlib.md5(f"abcd:{fidx}".encode()).digest()
        px = [digest[p] % 8 for p in range(16)]
        assert r["n_frames"] == n_frames
        assert r["mean_idx"] == round(sum(px) / 16, 6)
        assert r["px_min"] == min(px) and r["px_max"] == max(px)
        assert r["pos_checksum"] == sum((p + 1) * v for p, v in enumerate(px))
