"""ZIP archive ingest — SURVEY.md §2.1 S1.

The reference unpacks Apple/Zepp export ZIPs with a driver-side loop
(ref scripts/run_full_pipeline.py:420-548) before any processing starts.
The Spark-native form keeps extraction ON THE EXECUTORS: read archives as
binary blobs (``binaryFile`` source), then an Arrow-batched ``mapInPandas``
opens each with the stdlib ``zipfile`` and emits one row per member — the
archive bytes never touch the driver and N archives decompress in
parallel.

Scale notes:
- ZIP is not a splittable format (the central directory lives at the end),
  so parallelism is at the ARCHIVE grain: 10k crawl archives fan out over
  10k tasks, but one huge archive is one task — matching the format's
  physics, not an engine limitation. Repartition on path when archive
  count >> default parallelism.
- Members are streamed one at a time and each input batch yields one
  output frame per archive, so executor memory holds one archive + one
  member, not the whole listing.
- AES-encrypted ZIPs (the reference's pyzipper path) need a codec the
  container lacks; ``read_zip_members`` raises on them only when the
  member is actually read, and the encrypted branch is gated the same way
  the multimodal codecs are.
"""

from __future__ import annotations

import fnmatch
import io
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEMBER_SCHEMA = (
    "src_path string, member_name string, n_bytes long, member_bytes binary"
)


def read_zip_members(
    spark: SparkSession,
    path: str,
    pattern: str | None = None,
) -> DataFrame:
    """One row per (archive, member) with the member's decompressed bytes.

    ``pattern`` is an fnmatch glob on the member name (e.g. ``"*.csv"``) —
    applied INSIDE the executor-side loop, so non-matching members are
    never decompressed (the moral twin of predicate pushdown; the
    reference's extract-then-glob does the opposite).
    """
    raw = spark.read.format("binaryFile").load(path)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for src, blob in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if pattern and not fnmatch.fnmatch(info.filename, pattern):
                            continue
                        data = zf.read(info)
                        # one Arrow batch per member: peak executor memory
                        # really is one archive + one decompressed member,
                        # never the whole decompressed listing
                        yield pd.DataFrame(
                            {
                                "src_path": [src],
                                "member_name": [info.filename],
                                "n_bytes": pd.Series([len(data)], dtype="int64"),
                                "member_bytes": [data],
                            }
                        )

    return raw.select("path", "content").mapInPandas(extract, MEMBER_SCHEMA)


def csv_lines_from_zip(
    spark: SparkSession,
    path: str,
    pattern: str = "*.csv",
    encoding: str = "utf-8",
) -> DataFrame:
    """Flatten matching CSV members into (src_path, member_name, line) rows
    — ready for ``from_csv``/``split`` parsing with an explicit schema, the
    same defensive contract as readers.read_csv_permissive. Decode and
    line-split happen as codegen'd expressions, not in Python."""
    from pyspark.sql import functions as F

    members = read_zip_members(spark, path, pattern)
    return members.select(
        "src_path",
        "member_name",
        F.explode(
            F.split(F.decode(F.col("member_bytes"), encoding), "\r?\n")
        ).alias("line"),
    ).filter(F.col("line") != "")
