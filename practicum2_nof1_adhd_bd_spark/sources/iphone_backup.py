"""iTunes/iOS backup manifest reader — SURVEY.md §2.1 S13.

Reference: ``src/domains/iphone_backup/iphone_backup.py:1-457``
(EncryptedBackup): opens ``Manifest.db`` — the SQLite catalog at the root
of every iTunes backup, one row per backed-up file in its ``Files`` table
``(fileID, domain, relativePath, flags, file)`` — and serves file lookups
(``:135-157`` relativePath/domain query) plus per-file extraction. The
reference is driver-side and single-backup; the Spark-native form scans
MANY backups in one job:

- ``binaryFile`` source reads each ``Manifest.db`` as a blob (the catalog
  is small — megabytes for a 100 GB backup — so blob-grain is right);
- an Arrow-batched ``mapInPandas`` opens each blob with stdlib
  ``sqlite3`` ON THE EXECUTOR (SQLite can't read from memory-bytes, so
  the blob lands in the worker's tempdir for the duration of the scan —
  the same temp-file trick the reference uses at ``:56-60``) and emits
  one row per Files record;
- the emitted frame is ordinary columnar data: joins/filters/rollups on
  it are plain Catalyst plans.

Scale: parallelism is at the BACKUP grain (one manifest = one task unit),
matching the format — a fleet/forensics corpus of thousands of backups
fans out across executors; per-task memory holds one catalog, never file
payloads. Payload extraction would follow the zip_ingest pattern
(member-grain batches) keyed by fileID; it needs the backup's file tree,
not just the manifest, and is out of the engine's query surface.

Encrypted backups (the reference's main act) require unwrapping the
AES keybag from ``Manifest.plist`` with KDF passes the container's
stdlib cannot do (no ``cryptography``/``pycrypto``); pass
``passphrase=`` and this module raises cleanly instead of guessing —
the gate mirrors the multimodal codec policy.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MANIFEST_SCHEMA = (
    "backup_path string, file_id string, domain string, "
    "relative_path string, flags int"
)

#: Files.flags semantics in real manifests: 1 = file, 2 = directory,
#: 4 = symlink.
FLAG_FILE, FLAG_DIR, FLAG_SYMLINK = 1, 2, 4


def read_backup_manifests(
    spark: SparkSession,
    path: str,
    passphrase: str | None = None,
) -> DataFrame:
    """One row per Files record across every matched ``Manifest.db``.

    ``path`` is a glob for the manifest files themselves (e.g.
    ``"/backups/*/Manifest.db"``). Encrypted backups are refused up
    front — see module docstring.
    """
    if passphrase is not None:
        raise NotImplementedError(
            "encrypted iTunes backups need an AES keybag unwrap "
            "(cryptography lib not present in this environment); "
            "decrypt out-of-band and point at the plain Manifest.db"
        )
    raw = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for src, blob in zip(pdf["path"], pdf["content"]):
                # SQLite needs a real file; one catalog at a time per task
                fd, tmp = tempfile.mkstemp(suffix=".db")
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(blob)
                    con = sqlite3.connect(tmp)
                    try:
                        cur = con.execute(
                            "SELECT fileID, domain, relativePath, flags "
                            "FROM Files ORDER BY domain, relativePath"
                        )
                        while True:
                            rows = cur.fetchmany(10_000)
                            if not rows:
                                break
                            yield pd.DataFrame(
                                {
                                    "backup_path": [src] * len(rows),
                                    "file_id": [r[0] for r in rows],
                                    "domain": [r[1] for r in rows],
                                    "relative_path": [r[2] for r in rows],
                                    "flags": pd.Series(
                                        [r[3] for r in rows], dtype="int32"
                                    ),
                                }
                            )
                    finally:
                        con.close()
                finally:
                    os.unlink(tmp)

    return raw.select("path", "content").mapInPandas(parse, MANIFEST_SCHEMA)


FILES_SCHEMA = (
    "file_id string, backup_path string, domain string, "
    "relative_path string, size bigint, content binary"
)


def read_backup_files(
    spark: SparkSession,
    backup_dir: str,
    shard_glob: str = "[0-9a-f][0-9a-f]/*",
    manifest: DataFrame | None = None,
    passphrase: str | None = None,
) -> DataFrame:
    """Member-grain payload extraction for one backup tree — the
    ``zip_ingest`` pattern applied to the backup's ``xx/fileID`` layout
    (iTunes stores each file at ``<root>/<first-2-hex>/<fileID>``; ref
    ``iphone_backup.py:135-157`` extract path). One row per on-disk
    payload, annotated with its manifest metadata.

    Scale shape: payload blobs are read at FILE grain by the binaryFile
    source (splits fan out across executors; a blob never crosses a
    shuffle), while the manifest metadata — catalog-sized, megabytes for
    a 100 GB backup — joins in as an explicit BROADCAST. The inner join
    also acts as the integrity screen: a payload with no manifest row
    (orphan) is dropped; use ``domain_profile`` + an anti-join the other
    way to audit manifest rows whose payload is missing on disk.
    Encrypted backups are refused up front (module docstring)."""
    from pyspark.sql import functions as F

    if passphrase is not None:
        raise NotImplementedError(
            "encrypted iTunes backups need an AES keybag unwrap "
            "(cryptography lib not present in this environment); "
            "decrypt out-of-band and point at the plain backup tree"
        )
    if manifest is None:
        manifest = read_backup_manifests(
            spark, os.path.join(backup_dir, "Manifest.db")
        )
    payloads = spark.read.format("binaryFile").load(
        os.path.join(backup_dir, shard_glob)
    )
    pay = payloads.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_id"),
        F.element_at(F.split(F.col("path"), "/"), -2).alias("_shard"),
        F.col("length").alias("size"),
        F.col("content"),
    ).filter(
        # shard-dir consistency: the parent dir must be the fileID's
        # first two hex chars (malformed strays are excluded, not joined)
        F.col("_shard") == F.substring(F.col("file_id"), 1, 2)
    ).drop("_shard")
    meta = manifest.filter(F.col("flags") == FLAG_FILE).select(
        "file_id", "backup_path", "domain", "relative_path"
    )
    return pay.join(F.broadcast(meta), "file_id").select(
        "file_id", "backup_path", "domain", "relative_path", "size", "content"
    )


def domain_profile(manifest: DataFrame) -> DataFrame:
    """Per-domain backup profile — the rollup the reference's users build
    by hand over the Files table: record/file/dir counts and total
    relativePath depth (a cheap tree-shape signal)."""
    from pyspark.sql import functions as F

    return manifest.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum((F.col("flags") == FLAG_FILE).cast("bigint")).alias("n_files"),
        F.sum((F.col("flags") == FLAG_DIR).cast("bigint")).alias("n_dirs"),
        F.sum(
            F.size(F.split(F.col("relative_path"), "/")).cast("bigint")
        ).alias("total_path_depth"),
    )
