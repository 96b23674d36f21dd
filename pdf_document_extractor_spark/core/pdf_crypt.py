"""PDF standard security handler — RC4 ("V1"/"V2") with empty user
password, pure stdlib.

A large share of crawled PDFs are "owner-password" encrypted: the user
password is EMPTY, so any reader may decrypt and display them (PDF 32000
7.6.3 — the standard handler derives the file key from the padded user
password). The reference opens these through its PDF backend
(pypdfium2 inside Docling, docling_strategy_processor.py:622-712, which
transparently decrypts empty-user-password documents); without this
module every such document would be a false hard failure.

Scope (documented degrade, core/taxonomy discipline):
- ``/Filter /Standard``, ``V`` 1 or 2, ``R`` 2 or 3 (RC4 40-128 bit):
  decrypted.
- ``V`` 4/5 (``R`` 4/5/6 — AESV2/AESV3 crypt filters): typed
  ``UnsupportedFormatError`` (no AES primitive in the stdlib; implement
  if the corpus demands it).
- Non-empty user password (the ``/U`` check fails): typed
  ``UnsupportedFormatError`` — the document is genuinely locked.
- Only STREAM payloads are decrypted (content streams, ObjStm, ToUnicode
  CMaps, form XObjects — everything the extractor reads). Strings inside
  object dictionaries stay encrypted; none feed the extraction surface
  (document info/metadata strings are not extracted). Cross-reference
  streams are never encrypted (PDF 32000 7.5.8.2) and are parsed outside
  the object store anyway.

All algorithm numbers refer to PDF 32000-1:2008 7.6.3.3-7.6.3.4.
"""

from __future__ import annotations

import hashlib
import struct

from .taxonomy import CorruptedFileError, UnsupportedFormatError

# Algorithm 2 padding string (PDF 32000 7.6.3.3).
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (symmetric)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _file_key(o: bytes, p: int, id0: bytes, r: int, n: int) -> bytes:
    """Algorithm 2: file encryption key for the EMPTY user password.
    ``n`` = key length in bytes (5 for 40-bit R2, /Length/8 for R3)."""
    h = hashlib.md5(
        PAD + o[:32] + struct.pack("<i", p) + id0
    ).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    return h[:n]


def _expected_u(file_key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R3): the /U value for the empty user
    password. R3 compares only the first 16 bytes."""
    if r == 2:
        return rc4(file_key, PAD)
    x = hashlib.md5(PAD + id0).digest()
    x = rc4(file_key, x)
    for i in range(1, 20):
        step = bytes(b ^ i for b in file_key)
        x = rc4(step, x)
    return x  # 16 bytes; stored /U pads to 32 with arbitrary bytes


def object_key(file_key: bytes, num: int, gen: int) -> bytes:
    """Algorithm 1: per-object RC4 key."""
    ext = struct.pack("<I", num)[:3] + struct.pack("<H", gen & 0xFFFF)
    h = hashlib.md5(file_key + ext).digest()
    return h[: min(len(file_key) + 5, 16)]


def _entry_bytes(enc: dict, key: str) -> bytes:
    v = enc.get(key)
    if not isinstance(v, str):
        raise CorruptedFileError(f"/Encrypt missing string entry /{key}")
    return v.encode("latin-1")


def build_decryptor(enc: dict, id0: bytes):
    """/Encrypt dict + first /ID string -> callable(num, gen, data) that
    decrypts a stream payload. Raises typed errors for unsupported
    handlers/versions and for non-empty user passwords."""
    if enc.get("Filter") != "Standard":
        raise UnsupportedFormatError(
            f"non-standard security handler /{enc.get('Filter')}"
        )
    v = enc.get("V", 0)
    r = enc.get("R", 0)
    if v in (4, 5) or r in (4, 5, 6):
        raise UnsupportedFormatError(
            f"AES-encrypted PDF (V={v} R={r}) unsupported"
        )
    if v not in (1, 2) or r not in (2, 3):
        raise UnsupportedFormatError(
            f"unsupported encryption version V={v} R={r}"
        )
    length_bits = enc.get("Length", 40)
    if not isinstance(length_bits, int) or length_bits % 8 or not (
        40 <= length_bits <= 128
    ):
        raise CorruptedFileError(f"bad /Encrypt /Length {length_bits!r}")
    n = 5 if r == 2 else length_bits // 8
    o = _entry_bytes(enc, "O")
    u = _entry_bytes(enc, "U")
    p = enc.get("P")
    if not isinstance(p, int):
        raise CorruptedFileError("/Encrypt missing integer /P")
    key = _file_key(o, p, id0, r, n)
    expect = _expected_u(key, id0, r)
    cmp_len = 32 if r == 2 else 16
    if u[:cmp_len] != expect[:cmp_len]:
        raise UnsupportedFormatError(
            "password-protected PDF (non-empty user password)"
        )

    def decrypt(num: int, gen: int, data: bytes) -> bytes:
        return rc4(object_key(key, num, gen), data)

    return decrypt


def trailer_id0(trailer: dict) -> bytes:
    """First /ID entry as bytes ('' when absent — pre-1.1 files may omit
    /ID; Algorithm 2 then hashes an empty string, which several real
    producers rely on)."""
    ids = trailer.get("ID")
    if isinstance(ids, list) and ids and isinstance(ids[0], str):
        return ids[0].encode("latin-1")
    return b""
