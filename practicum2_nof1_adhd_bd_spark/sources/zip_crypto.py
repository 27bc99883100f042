"""WinZip-AES encrypted ZIP members — the last gated ingest branch of
SURVEY §2.1 S1 (r15 verdict #5).

The reference extracts password-protected Zepp export ZIPs with pyzipper
driver-side (ref scripts/run_full_pipeline.py:498-520, ``--zepp-password``).
This implements the PUBLIC WinZip AE-1/AE-2 scheme (the format pyzipper
speaks; spec published at winzip.com/aes_info) directly on the raw
archive bytes, so the decrypt runs INSIDE the executor-side mapInPandas
loop of ``zip_ingest.read_zip_members`` — N encrypted archives fan out
over N tasks, and the PBKDF2 cost (the deliberate work factor) is paid
in parallel on the executors, never serially on the driver.

Format, per the public spec:

- A member is AES-encrypted iff its compression method is 99; the
  0x9901 extra field carries (vendor version 1|2, 'AE', strength 1|2|3
  for AES-128/192/256, and the ACTUAL compression method).
- Member data = salt (8/12/16 bytes by strength) + 2-byte password
  verifier + ciphertext + 10-byte auth code.
- Keys: PBKDF2-HMAC-SHA1(password, salt, 1000 iterations) stretched to
  2*keylen+2 bytes — AES key, then HMAC-SHA1 key, then the 2 verifier
  bytes (a fast wrong-password check before any decrypt work).
- Cipher: AES-CTR with a LITTLE-ENDIAN block counter starting at 1 and
  no nonce — NOT the big-endian CTR stock libraries default to, so the
  keystream is produced by ECB-encrypting the LE counter blocks (built
  vectorized in numpy, one cipher.update for the whole member).
- Auth: HMAC-SHA1 over the CIPHERTEXT, truncated to 10 bytes
  (encrypt-then-MAC); AE-2 additionally zeroes the header CRC so the
  only integrity check is the MAC.

``synthesize_encrypted_zip`` writes a real AE-2 archive (local headers,
central directory, EOCD by hand — stdlib zipfile cannot write method 99)
with md5-derived deterministic salts, the attestation fixture for
``encrypted_zip_scan``: the rollup only matches the oracle's record
formula if PBKDF2, the LE-counter keystream, the MAC check and the
post-decrypt inflate all round-trip.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import struct
import zlib

import numpy as np

AES_EXTRA_ID = 0x9901
AES_METHOD = 99
_STRENGTH_BYTES = {1: (8, 16), 2: (12, 24), 3: (16, 32)}  # salt, key


def _require_crypto():
    try:
        from cryptography.hazmat.primitives.ciphers import (  # noqa: F401
            Cipher,
        )
    except ImportError as e:  # pragma: no cover - env without cryptography
        raise NotImplementedError(
            "WinZip-AES members need the 'cryptography' package for AES; "
            "decrypt the archive out-of-band and ingest the plain ZIP"
        ) from e


def _derive_keys(password: bytes, salt: bytes, key_len: int):
    dk = hashlib.pbkdf2_hmac("sha1", password, salt, 1000, 2 * key_len + 2)
    return dk[:key_len], dk[key_len : 2 * key_len], dk[2 * key_len :]


def _ctr_le_keystream(aes_key: bytes, n_bytes: int) -> bytes:
    """WinZip's CTR variant: 16-byte little-endian counter blocks
    1,2,3,... ECB-encrypted in ONE cipher.update call (the counter
    stream is built vectorized; a member never has 2^64 blocks, so the
    low-quadword carry can't occur)."""
    from cryptography.hazmat.primitives.ciphers import (
        Cipher,
        algorithms,
        modes,
    )

    n_blocks = (n_bytes + 15) // 16
    ctr = np.zeros((n_blocks, 2), dtype="<u8")
    ctr[:, 0] = np.arange(1, n_blocks + 1, dtype=np.uint64)
    enc = Cipher(algorithms.AES(aes_key), modes.ECB()).encryptor()
    return (enc.update(ctr.tobytes()) + enc.finalize())[:n_bytes]


def parse_aes_extra(extra: bytes):
    """Return (vendor_version, strength, actual_method) from a 0x9901
    extra field, or None when the member isn't WinZip-AES."""
    off = 0
    while off + 4 <= len(extra):
        ext_id, size = struct.unpack_from("<HH", extra, off)
        if ext_id == AES_EXTRA_ID and size >= 7:
            ver, vendor, strength, method = struct.unpack_from(
                "<H2sBH", extra, off + 4
            )
            if vendor == b"AE":
                return ver, strength, method
        off += 4 + size
    return None


def decrypt_member(
    raw: bytes, password: bytes, strength: int, actual_method: int
) -> bytes:
    """Decrypt + verify + decompress one WinZip-AES member's raw data
    (salt | verifier | ciphertext | authcode). Pure-bytes, executor-safe."""
    _require_crypto()
    salt_len, key_len = _STRENGTH_BYTES[strength]
    if len(raw) < salt_len + 2 + 10:
        raise ValueError("AES member data shorter than salt+verifier+mac")
    salt = raw[:salt_len]
    verifier = raw[salt_len : salt_len + 2]
    ct = raw[salt_len + 2 : -10]
    auth = raw[-10:]
    aes_key, mac_key, check = _derive_keys(password, salt, key_len)
    if check != verifier:
        raise ValueError("wrong password (verifier mismatch)")
    expect = hmac_mod.new(mac_key, ct, hashlib.sha1).digest()[:10]
    if not hmac_mod.compare_digest(expect, auth):
        raise ValueError("authentication code mismatch (corrupt member)")
    ks = _ctr_le_keystream(aes_key, len(ct))
    pt = np.bitwise_xor(
        np.frombuffer(ct, dtype=np.uint8), np.frombuffer(ks, dtype=np.uint8)
    ).tobytes()
    if actual_method == 8:
        return zlib.decompress(pt, -15)
    if actual_method == 0:
        return pt
    raise ValueError(f"unsupported inner compression method {actual_method}")


def read_raw_member(blob: bytes, header_offset: int, comp_size: int) -> bytes:
    """Slice one member's raw (still encrypted) data out of the archive
    bytes via its local header — name/extra lengths in the LOCAL header
    may differ from the central directory's, so they are re-read here."""
    sig, _, _, _, _, _, _, _, _, nlen, elen = struct.unpack_from(
        "<IHHHHHIIIHH", blob, header_offset
    )
    if sig != 0x04034B50:
        raise ValueError("bad local file header signature")
    start = header_offset + 30 + nlen + elen
    return blob[start : start + comp_size]


# ---- fixture: deterministic AE-2 archive synthesis ----


def _encrypt_member(
    plaintext: bytes, password: bytes, salt: bytes, strength: int
):
    """(raw_data, actual_method) — deflate then encrypt-then-MAC."""
    _require_crypto()
    _, key_len = _STRENGTH_BYTES[strength]
    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    deflated = comp.compress(plaintext) + comp.flush()
    aes_key, mac_key, verifier = _derive_keys(password, salt, key_len)
    ks = _ctr_le_keystream(aes_key, len(deflated))
    ct = np.bitwise_xor(
        np.frombuffer(deflated, dtype=np.uint8),
        np.frombuffer(ks, dtype=np.uint8),
    ).tobytes()
    auth = hmac_mod.new(mac_key, ct, hashlib.sha1).digest()[:10]
    return salt + verifier + ct + auth, 8


def synthesize_encrypted_zip(
    path: str,
    members: list[tuple[str, bytes]],
    password: bytes,
    strength: int = 3,
) -> None:
    """Write a WinZip AE-2 archive by hand (method 99 + 0x9901 extra in
    both header sets, CRC zeroed per AE-2). Salts are md5-derived from
    the member name — deterministic fixture, NOT a pattern for real
    archives, where salts must be random."""
    salt_len, _ = _STRENGTH_BYTES[strength]
    extra = struct.pack("<HHH2sBH", AES_EXTRA_ID, 7, 2, b"AE", strength, 8)
    blobs: list[bytes] = []
    central: list[bytes] = []
    offset = 0
    for name, plaintext in members:
        salt = hashlib.md5(name.encode() + b":salt").digest()[:salt_len]
        raw, _ = _encrypt_member(plaintext, password, salt, strength)
        nm = name.encode()
        local = struct.pack(
            "<IHHHHHIIIHH",
            0x04034B50, 51, 0x1, AES_METHOD, 0, 0x21,
            0, len(raw), len(plaintext), len(nm), len(extra),
        ) + nm + extra + raw
        central.append(
            struct.pack(
                "<IHHHHHHIIIHHHHHII",
                0x02014B50, 51, 51, 0x1, AES_METHOD, 0, 0x21,
                0, len(raw), len(plaintext), len(nm), len(extra),
                0, 0, 0, 0, offset,
            ) + nm + extra
        )
        blobs.append(local)
        offset += len(local)
    cd = b"".join(central)
    eocd = struct.pack(
        "<IHHHHIIH",
        0x06054B50, 0, 0, len(members), len(members), len(cd), offset, 0,
    )
    with open(path, "wb") as f:
        f.write(b"".join(blobs) + cd + eocd)
