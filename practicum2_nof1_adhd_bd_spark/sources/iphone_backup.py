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

Encrypted backups (the reference's main act, ref
``iphone_backup.py:56-157``) are handled since r08: pass
``passphrase=`` and each backup's ``Manifest.plist`` keybag is
unlocked ON THE EXECUTOR inside the same mapInPandas (PBKDF2's
millions of iterations are per-backup work — a fleet of backups
derives keys in parallel), the catalog CBC-decrypts to a temp SQLite,
and per-file AES keys unwrap from the ``Files.file`` NSKeyedArchiver
records so ``read_backup_files`` can decrypt payloads at file grain.
All crypto lives in ``backup_crypto.py`` (stdlib pbkdf2 + the
``cryptography`` package's RFC 3394 unwrap); environments without
``cryptography`` get the documented NotImplementedError gate.
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

#: encrypted-manifest rows additionally carry the archived logical size
#: and the UNWRAPPED per-file AES key (null for dirs / keyless rows) so
#: payload decryption never re-opens the catalog
ENC_MANIFEST_SCHEMA = MANIFEST_SCHEMA + ", size bigint, file_key binary"

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
    ``"/backups/*/Manifest.db"``). With ``passphrase`` set, the sibling
    ``Manifest.plist`` of every matched catalog is loaded too (tiny —
    broadcast-joined on the backup dir) and keybag unlock + catalog
    decrypt + per-file key unwrap all run executor-side per backup; the
    result frame then carries ``size`` and the unwrapped ``file_key``
    per row (ENC_MANIFEST_SCHEMA).
    """
    from pyspark.sql import functions as F

    if passphrase is None:
        raw = spark.read.format("binaryFile").load(path)

        def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for src, blob in zip(pdf["path"], pdf["content"]):
                    yield from _sqlite_rows(src, bytes(blob), keybag=None)

        return raw.select("path", "content").mapInPandas(parse, MANIFEST_SCHEMA)

    from . import backup_crypto as bc

    bc._require_crypto()  # fail fast on the driver, not per task
    dbs = spark.read.format("binaryFile").load(path).select(
        F.col("path"),
        F.regexp_replace("path", r"Manifest\.db$", "").alias("_dir"),
        F.col("content").alias("_db"),
    )
    plists = spark.read.format("binaryFile").load(
        path.replace("Manifest.db", "Manifest.plist")
    ).select(
        F.regexp_replace("path", r"Manifest\.plist$", "").alias("_dir"),
        F.col("content").alias("_plist"),
    )
    joined = dbs.join(F.broadcast(plists), "_dir")
    pw = passphrase

    def parse_enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import plistlib
        import struct

        for pdf in batches:
            for src, db_blob, plist_blob in zip(
                pdf["path"], pdf["_db"], pdf["_plist"]
            ):
                mp = plistlib.loads(bytes(plist_blob))
                kb = bc.BackupKeybag(mp["BackupKeyBag"])
                if not kb.unlock(pw):
                    raise ValueError(
                        f"failed to unlock keybag for {src}: "
                        "incorrect passphrase?"
                    )
                # reuse the already-unlocked keybag for the catalog —
                # the double-PBKDF2 unlock (millions of iterations) is
                # the dominant per-backup cost and must run exactly once
                mk = mp["ManifestKey"]
                cls = struct.unpack("<l", mk[:4])[0]
                plain = bc.aes_cbc(
                    bytes(db_blob), kb.unwrap_for_class(cls, mk[4:])
                )
                yield from _sqlite_rows(src, plain, keybag=kb)

    return joined.select("path", "_db", "_plist").mapInPandas(
        parse_enc, ENC_MANIFEST_SCHEMA
    )


def _sqlite_rows(src: str, db_bytes: bytes, keybag) -> Iterator[pd.DataFrame]:
    """Parse one (already-plaintext) catalog into row batches; with a
    ``keybag``, also unwrap each row's per-file key from its Files.file
    record (ENC_MANIFEST_SCHEMA columns). SQLite needs a real file, so
    the bytes land in the worker tempdir for the duration of the scan."""
    from . import backup_crypto as bc

    fd, tmp = tempfile.mkstemp(suffix=".db")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(db_bytes)
        con = sqlite3.connect(tmp)
        try:
            cols = "fileID, domain, relativePath, flags"
            if keybag is not None:
                cols += ", file"
            cur = con.execute(
                f"SELECT {cols} FROM Files ORDER BY domain, relativePath"
            )
            while True:
                rows = cur.fetchmany(10_000)
                if not rows:
                    break
                out = {
                    "backup_path": [src] * len(rows),
                    "file_id": [r[0] for r in rows],
                    "domain": [r[1] for r in rows],
                    "relative_path": [r[2] for r in rows],
                    "flags": pd.Series([r[3] for r in rows], dtype="int32"),
                }
                if keybag is not None:
                    keys, sizes = [], []
                    for r in rows:
                        if r[4] is None:
                            keys.append(None)
                            sizes.append(None)
                        else:
                            k, s = bc.file_key_and_size(bytes(r[4]), keybag)
                            keys.append(k)
                            sizes.append(s)
                    out["size"] = pd.Series(sizes, dtype="object")
                    out["file_key"] = keys
                yield pd.DataFrame(out)
        finally:
            con.close()
    finally:
        os.unlink(tmp)


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

    With ``passphrase`` set, the manifest read carries each row's
    UNWRAPPED per-file AES key (ENC_MANIFEST_SCHEMA) into the broadcast,
    and an Arrow-batched mapInPandas CBC-decrypts every payload where it
    already sits — blobs never shuffle, keys travel in the tiny
    broadcast side, and ``size``/``content`` are the decrypted logical
    values."""
    from pyspark.sql import functions as F

    if manifest is None:
        manifest = read_backup_manifests(
            spark, os.path.join(backup_dir, "Manifest.db"), passphrase
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
    if passphrase is None:
        meta = manifest.filter(F.col("flags") == FLAG_FILE).select(
            "file_id", "backup_path", "domain", "relative_path"
        )
        return pay.join(F.broadcast(meta), "file_id").select(
            "file_id", "backup_path", "domain", "relative_path", "size",
            "content",
        )

    from . import backup_crypto as bc

    meta = manifest.filter(F.col("flags") == FLAG_FILE).select(
        "file_id", "backup_path", "domain", "relative_path",
        F.col("size").alias("_size"), "file_key",
    )
    joined = pay.drop("size").join(F.broadcast(meta), "file_id")

    def decrypt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, sizes = [], []
            for blob, key, size in zip(
                pdf["content"], pdf["file_key"], pdf["_size"]
            ):
                if key is None:
                    plain = bytes(blob)
                else:
                    # nullable bigint arrives from Arrow as float64 with
                    # NaN for missing — `is not None` would pass NaN to
                    # int(); pd.isna routes no-Size records to the
                    # RFC-1423 padding fallback as intended
                    plain = bc.decrypt_file_payload(
                        bytes(blob), bytes(key),
                        None if pd.isna(size) else int(size),
                    )
                contents.append(plain)
                sizes.append(len(plain))
            yield pd.DataFrame(
                {
                    "file_id": pdf["file_id"],
                    "backup_path": pdf["backup_path"],
                    "domain": pdf["domain"],
                    "relative_path": pdf["relative_path"],
                    "size": pd.Series(sizes, dtype="int64"),
                    "content": contents,
                }
            )

    return joined.mapInPandas(decrypt, FILES_SCHEMA)


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
