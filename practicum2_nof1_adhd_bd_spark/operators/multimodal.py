"""Multimodal (image/audio/video) column plumbing (brief §"Beyond").

Media are opaque ``binary`` columns with a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
UDFs so the bytes never cross a Python row boundary one at a time.

The actual codec step is STUBBED: the image/audio libraries are not in this
container, so ``decode_features`` tries Pillow/soundfile and otherwise
falls back to a DETERMINISTIC md5-based fake decode (clearly marked). The
Spark-side contract — schema, batch shape, partitioning, UDF signature —
is real and tested; swapping the fake for a real codec is a one-function
change inside the UDF.

Scale notes: blob tables are partitioned by a content-hash bucket so large
media shuffle evenly; feature extraction is a narrow map (no shuffle);
frame sampling explodes only the sampled indices, never whole frames.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

BLOB_META_DDL = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)


def text_to_blob_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Build a demo blob table from a text corpus: bytes = UTF-8 of the
    text, metadata derived from its length. Stands in for an image/video
    ingest; the schema is the engine's real media contract."""
    n = F.length(text_col)
    return df.select(
        F.col(id_col).alias("media_id"),
        F.col(text_col).cast("binary").alias("blob"),
        F.struct(
            F.when(n % 3 == 0, "image").when(n % 3 == 1, "audio").otherwise("video").alias("media_type"),
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            (n % 120 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
        F.pmod(F.xxhash64(F.col(text_col)), F.lit(64)).alias("bucket"),
    )


def _fake_decode_stats(blob: bytes) -> tuple[str, float, float]:
    """DETERMINISTIC FAKE decode: md5-derived pseudo pixel stats.

    Replace with a real codec (PIL.Image.open etc.) when available; the
    md5-hex derivation keeps the whole pipeline oracle-checkable meanwhile.
    """
    h = hashlib.md5(blob).hexdigest()
    mean_px = int(h[:8], 16) % 256 / 255.0
    std_px = int(h[8:16], 16) % 256 / 255.0
    return h, round(mean_px, 6), round(std_px, 6)


def decode_features(blobs: DataFrame) -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    Tries a real codec first; without one, emits the deterministic fake
    stats. Output: one row per media item with content hash and pixel-stat
    features. Narrow map — no shuffle, scales with input splits.
    """
    try:  # pragma: no cover - not present in this container
        from PIL import Image  # noqa: F401

        real_codec = True
    except ImportError:
        real_codec = False

    schema = StructType.fromDDL(
        "media_id bigint, media_type string, content_md5 string, "
        "mean_px double, std_px double, n_bytes int"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if real_codec:
                raise NotImplementedError(
                    "real codec path: decode pdf['blob'] via PIL/soundfile"
                )
            stats = pdf["blob"].map(_fake_decode_stats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                    "content_md5": stats.map(lambda s: s[0]),
                    "mean_px": stats.map(lambda s: s[1]),
                    "std_px": stats.map(lambda s: s[2]),
                    "n_bytes": pdf["blob"].map(len),
                }
            )

    from ..sources.readers import fan_out

    return fan_out(
        blobs.select("media_id", "blob", "meta"), "media_id"
    ).mapInPandas(extract, schema)


def resize_stub(blobs: DataFrame, width: int, height: int) -> DataFrame:
    """Resize contract: returns the blob table with target dimensions in
    metadata; the byte transform is stubbed (identity) pending a codec.
    Keeps column shapes/partitioning identical to a real resize."""
    return blobs.withColumn(
        "meta",
        F.struct(
            F.col("meta.media_type").alias("media_type"),
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.sample_rate").alias("sample_rate"),
        ),
    )


def sample_frames(blobs: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video blobs: one output row per sampled frame
    index (explodes ONLY the sampled indices — at 100 TB the frame decode
    happens after the explode, on the narrow (media_id, frame_idx) rows)."""
    vids = blobs.filter(F.col("meta.media_type") == "video")
    idx = F.sequence(
        F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
    )
    return vids.select(
        "media_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(idx).alias("frame_idx"),
    )
