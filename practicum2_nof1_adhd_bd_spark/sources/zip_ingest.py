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
- AES-encrypted ZIPs (the reference's pyzipper path, ref
  run_full_pipeline.py:498-520 ``--zepp-password``) decrypt in the same
  executor-side loop via ``zip_crypto`` (the public WinZip AE-1/AE-2
  scheme: PBKDF2 keys, LE-counter AES-CTR, encrypt-then-MAC) — pass
  ``password=``; the PBKDF2 work factor is per-member and parallelizes
  with the archives. Without a password an encrypted member raises only
  when actually read, same gating as the multimodal codecs.
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
    password: bytes | None = None,
) -> DataFrame:
    """One row per (archive, member) with the member's decompressed bytes.

    ``pattern`` is an fnmatch glob on the member name (e.g. ``"*.csv"``) —
    applied INSIDE the executor-side loop, so non-matching members are
    never decompressed (the moral twin of predicate pushdown; the
    reference's extract-then-glob does the opposite).

    ``password`` unlocks WinZip-AES members (method 99): the PBKDF2 +
    AES-CTR + HMAC-verify pipeline in ``zip_crypto`` runs right here in
    the executor loop, and a wrong password or corrupt member raises
    from the task (fail-loud, like the keybag path in backup_crypto).
    """
    from . import zip_crypto

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
                        if info.compress_type == zip_crypto.AES_METHOD:
                            aes = zip_crypto.parse_aes_extra(info.extra)
                            if aes is None:
                                raise ValueError(
                                    f"{info.filename}: method 99 without a "
                                    "WinZip-AES extra field"
                                )
                            if password is None:
                                raise ValueError(
                                    f"{info.filename} is WinZip-AES "
                                    "encrypted; pass password="
                                )
                            _, strength, actual = aes
                            data = zip_crypto.decrypt_member(
                                zip_crypto.read_raw_member(
                                    blob,
                                    info.header_offset,
                                    info.compress_size,
                                ),
                                password,
                                strength,
                                actual,
                            )
                        else:
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
    password: bytes | None = None,
) -> DataFrame:
    """Flatten matching CSV members into (src_path, member_name, line) rows
    — ready for ``from_csv``/``split`` parsing with an explicit schema, the
    same defensive contract as readers.read_csv_permissive. Decode and
    line-split happen as codegen'd expressions, not in Python."""
    from pyspark.sql import functions as F

    members = read_zip_members(spark, path, pattern, password=password)
    return members.select(
        "src_path",
        "member_name",
        F.explode(
            F.split(F.decode(F.col("member_bytes"), encoding), "\r?\n")
        ).alias("line"),
    ).filter(F.col("line") != "")
