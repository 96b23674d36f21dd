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
- ``V`` 4 ``R`` 4 with ``/AESV2`` (AES-128-CBC), ``/V2`` (RC4) or
  ``/Identity`` stream crypt filters: decrypted (AES implemented below,
  FIPS-197, pure stdlib).
- ``V`` 5 ``R`` 5/6 (``/AESV3``, AES-256-CBC; R6 = ISO 32000-2
  Algorithm 2.B password hashing): decrypted.
- Unknown versions/filters: typed ``UnsupportedFormatError``.
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
from functools import lru_cache

from .taxonomy import CorruptedFileError, UnsupportedFormatError

# OpenSSL-backed fast path (public `cryptography` wheel, optional). The
# pure-stdlib implementation below stays authoritative — it is the
# documented zero-dependency design, it pins the FIPS-197 vectors in
# tests, and it runs wherever the wheel is absent. When the wheel IS
# present, the byte-identical OpenSSL primitives take over the per-block
# work (~100x on AES-CBC / RC4), which dominates the encrypted-PDF
# corpus both at synthesis (writer) and extraction (decryptor).
try:  # pragma: no cover - exercised indirectly by the crypto tests
    from cryptography.hazmat.primitives.ciphers import Cipher as _XCipher
    from cryptography.hazmat.primitives.ciphers import algorithms as _xalg
    from cryptography.hazmat.primitives.ciphers import modes as _xmodes

    try:  # ARC4 lives in the decrepit namespace since cryptography 43
        from cryptography.hazmat.decrepit.ciphers.algorithms import (
            ARC4 as _XARC4,
        )
    except ImportError:
        _XARC4 = _xalg.ARC4
    _OSSL = True
except ImportError:
    _OSSL = False

_AES_KEY_BYTES = (16, 24, 32)  # AES-128/192/256
_ARC4_KEY_BYTES = (5, 7, 8, 10, 16, 20, 24, 32)  # cryptography ARC4 sizes

# Algorithm 2 padding string (PDF 32000 7.6.3.3).
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# --------------------------------------------------------------------------
# AES (FIPS-197) — pure stdlib, needed for /AESV2 (V4/R4) and /AESV3
# (V5/R6) crypt filters. Tables generated at import; correctness pinned
# by the FIPS-197 appendix-C vectors in tests/test_core_pdf.py. Only
# encrypted documents pay this path, and PDF payloads are small — the
# pure-Python cost is bounded per document like every other decode.
# --------------------------------------------------------------------------


def _aes_tables():
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x1B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]

    def rotl8(b, n):
        return ((b << n) | (b >> (8 - n))) & 0xFF

    sbox = [0] * 256
    for a in range(256):
        s = exp[255 - log[a]] if a else 0
        sbox[a] = (
            s ^ rotl8(s, 1) ^ rotl8(s, 2) ^ rotl8(s, 3) ^ rotl8(s, 4) ^ 0x63
        )
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i

    def gmul(a, b):
        if a == 0 or b == 0:
            return 0
        return exp[log[a] + log[b]]

    return sbox, inv_sbox, gmul


_SBOX, _INV_SBOX, _GMUL = _aes_tables()


def _aes_ttables():
    """Combined SubBytes+MixColumns lookup tables (the classic 4x256
    32-bit construction): Algorithm 2.B encrypts tens of thousands of
    blocks per password hash, and the schoolbook round is ~15x slower."""
    t0, t1, t2, t3 = [], [], [], []
    for a in range(256):
        s = _SBOX[a]
        g2, g3 = _GMUL(s, 2), _GMUL(s, 3)
        t0.append((g2 << 24) | (s << 16) | (s << 8) | g3)
        t1.append((g3 << 24) | (g2 << 16) | (s << 8) | s)
        t2.append((s << 24) | (g3 << 16) | (g2 << 8) | s)
        t3.append((s << 24) | (s << 16) | (g3 << 8) | g2)
    return t0, t1, t2, t3


_T0, _T1, _T2, _T3 = _aes_ttables()


def _aes_inv_ttables():
    """Inverse tables (InvSubBytes+InvMixColumns) for the
    equivalent-inverse cipher — stream DECRYPTION is the extraction hot
    path and deserves the same 15x as encryption."""
    t0, t1, t2, t3 = [], [], [], []
    for a in range(256):
        s = _INV_SBOX[a]
        g9, gb = _GMUL(s, 9), _GMUL(s, 11)
        gd, ge = _GMUL(s, 13), _GMUL(s, 14)
        t0.append((ge << 24) | (g9 << 16) | (gd << 8) | gb)
        t1.append((gb << 24) | (ge << 16) | (g9 << 8) | gd)
        t2.append((gd << 24) | (gb << 16) | (ge << 8) | g9)
        t3.append((g9 << 24) | (gd << 16) | (gb << 8) | ge)
    return t0, t1, t2, t3


_IT0, _IT1, _IT2, _IT3 = _aes_inv_ttables()


def _inv_mix_col(col: int) -> int:
    a0, a1 = col >> 24, (col >> 16) & 0xFF
    a2, a3 = (col >> 8) & 0xFF, col & 0xFF
    g = _GMUL
    return (
        ((g(a0, 14) ^ g(a1, 11) ^ g(a2, 13) ^ g(a3, 9)) << 24)
        | ((g(a0, 9) ^ g(a1, 14) ^ g(a2, 11) ^ g(a3, 13)) << 16)
        | ((g(a0, 13) ^ g(a1, 9) ^ g(a2, 14) ^ g(a3, 11)) << 8)
        | (g(a0, 11) ^ g(a1, 13) ^ g(a2, 9) ^ g(a3, 14))
    )


@lru_cache(maxsize=256)
def _aes_inv_key_cols(key: bytes) -> list[tuple[int, int, int, int]]:
    """Equivalent-inverse-cipher round keys: reversed schedule with
    InvMixColumns applied to the middle rounds (FIPS-197 5.3.5)."""
    cols = _aes_expand_key_cols(key)
    nr = len(cols) - 1
    out = [cols[nr]]
    for rnd in range(nr - 1, 0, -1):
        out.append(tuple(_inv_mix_col(c) for c in cols[rnd]))
    out.append(cols[0])
    return out


def _aes_decrypt_cols(
    dk: list[tuple[int, int, int, int]], c0: int, c1: int, c2: int, c3: int
) -> tuple[int, int, int, int]:
    """Equivalent-inverse cipher over column ints (inverse T-tables)."""
    nr = len(dk) - 1
    k = dk[0]
    c0 ^= k[0]
    c1 ^= k[1]
    c2 ^= k[2]
    c3 ^= k[3]
    t0, t1, t2, t3 = _IT0, _IT1, _IT2, _IT3
    for rnd in range(1, nr):
        k = dk[rnd]
        # InvShiftRows gathers row r from column (c - r) % 4 == (c+4-r)%4
        n0 = (
            t0[c0 >> 24] ^ t1[(c3 >> 16) & 0xFF]
            ^ t2[(c2 >> 8) & 0xFF] ^ t3[c1 & 0xFF] ^ k[0]
        )
        n1 = (
            t0[c1 >> 24] ^ t1[(c0 >> 16) & 0xFF]
            ^ t2[(c3 >> 8) & 0xFF] ^ t3[c2 & 0xFF] ^ k[1]
        )
        n2 = (
            t0[c2 >> 24] ^ t1[(c1 >> 16) & 0xFF]
            ^ t2[(c0 >> 8) & 0xFF] ^ t3[c3 & 0xFF] ^ k[2]
        )
        n3 = (
            t0[c3 >> 24] ^ t1[(c2 >> 16) & 0xFF]
            ^ t2[(c1 >> 8) & 0xFF] ^ t3[c0 & 0xFF] ^ k[3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
    sb = _INV_SBOX
    k = dk[nr]
    o0 = (
        (sb[c0 >> 24] << 24) | (sb[(c3 >> 16) & 0xFF] << 16)
        | (sb[(c2 >> 8) & 0xFF] << 8) | sb[c1 & 0xFF]
    ) ^ k[0]
    o1 = (
        (sb[c1 >> 24] << 24) | (sb[(c0 >> 16) & 0xFF] << 16)
        | (sb[(c3 >> 8) & 0xFF] << 8) | sb[c2 & 0xFF]
    ) ^ k[1]
    o2 = (
        (sb[c2 >> 24] << 24) | (sb[(c1 >> 16) & 0xFF] << 16)
        | (sb[(c0 >> 8) & 0xFF] << 8) | sb[c3 & 0xFF]
    ) ^ k[2]
    o3 = (
        (sb[c3 >> 24] << 24) | (sb[(c2 >> 16) & 0xFF] << 16)
        | (sb[(c1 >> 8) & 0xFF] << 8) | sb[c0 & 0xFF]
    ) ^ k[3]
    return o0, o1, o2, o3


@lru_cache(maxsize=256)
def _aes_expand_key_cols(key: bytes) -> list[tuple[int, int, int, int]]:
    """Round keys as 4 big-endian column ints per round (T-table form)."""
    return [
        tuple(
            (rk[4 * c] << 24) | (rk[4 * c + 1] << 16)
            | (rk[4 * c + 2] << 8) | rk[4 * c + 3]
            for c in range(4)
        )
        for rk in _aes_expand_key(key)
    ]


@lru_cache(maxsize=256)
def _aes_expand_key(key: bytes) -> list[list[int]]:
    # cached per key (a document reuses its per-object/file keys across
    # streams); the returned schedule is treated as read-only everywhere
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _GMUL(rcon, 2) if rcon != 0x80 else 0x1B
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    return [
        [b for w in words[4 * r : 4 * r + 4] for b in w]
        for r in range(nr + 1)
    ]


def _aes_encrypt_cols(
    rk: list[tuple[int, int, int, int]], c0: int, c1: int, c2: int, c3: int
) -> tuple[int, int, int, int]:
    """One full encryption over column ints (T-table rounds)."""
    nr = len(rk) - 1
    k = rk[0]
    c0 ^= k[0]
    c1 ^= k[1]
    c2 ^= k[2]
    c3 ^= k[3]
    t0, t1, t2, t3 = _T0, _T1, _T2, _T3
    for rnd in range(1, nr):
        k = rk[rnd]
        n0 = (
            t0[c0 >> 24] ^ t1[(c1 >> 16) & 0xFF]
            ^ t2[(c2 >> 8) & 0xFF] ^ t3[c3 & 0xFF] ^ k[0]
        )
        n1 = (
            t0[c1 >> 24] ^ t1[(c2 >> 16) & 0xFF]
            ^ t2[(c3 >> 8) & 0xFF] ^ t3[c0 & 0xFF] ^ k[1]
        )
        n2 = (
            t0[c2 >> 24] ^ t1[(c3 >> 16) & 0xFF]
            ^ t2[(c0 >> 8) & 0xFF] ^ t3[c1 & 0xFF] ^ k[2]
        )
        n3 = (
            t0[c3 >> 24] ^ t1[(c0 >> 16) & 0xFF]
            ^ t2[(c1 >> 8) & 0xFF] ^ t3[c2 & 0xFF] ^ k[3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
    # final round: SubBytes + ShiftRows, no MixColumns
    sb = _SBOX
    k = rk[nr]
    o0 = (
        (sb[c0 >> 24] << 24) | (sb[(c1 >> 16) & 0xFF] << 16)
        | (sb[(c2 >> 8) & 0xFF] << 8) | sb[c3 & 0xFF]
    ) ^ k[0]
    o1 = (
        (sb[c1 >> 24] << 24) | (sb[(c2 >> 16) & 0xFF] << 16)
        | (sb[(c3 >> 8) & 0xFF] << 8) | sb[c0 & 0xFF]
    ) ^ k[1]
    o2 = (
        (sb[c2 >> 24] << 24) | (sb[(c3 >> 16) & 0xFF] << 16)
        | (sb[(c0 >> 8) & 0xFF] << 8) | sb[c1 & 0xFF]
    ) ^ k[2]
    o3 = (
        (sb[c3 >> 24] << 24) | (sb[(c0 >> 16) & 0xFF] << 16)
        | (sb[(c1 >> 8) & 0xFF] << 8) | sb[c2 & 0xFF]
    ) ^ k[3]
    return o0, o1, o2, o3


def _aes_encrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    """Block-oriented wrapper over the T-table core (used directly only
    by tests; CBC drives _aes_encrypt_cols)."""
    cols = _aes_expand_key_cols_from(rk)
    c = struct.unpack(">IIII", block)
    return struct.pack(">IIII", *_aes_encrypt_cols(cols, *c))


def _aes_expand_key_cols_from(rk: list[list[int]]) -> list[tuple[int, int, int, int]]:
    return [
        tuple(
            (r[4 * c] << 24) | (r[4 * c + 1] << 16)
            | (r[4 * c + 2] << 8) | r[4 * c + 3]
            for c in range(4)
        )
        for r in rk
    ]


def _aes_decrypt_block(rk: list[list[int]], block: bytes) -> bytes:
    """Block wrapper over the equivalent-inverse core (tests/vectors)."""
    cols = _aes_expand_key_cols_from(rk)
    nr = len(cols) - 1
    dk = (
        [cols[nr]]
        + [
            tuple(_inv_mix_col(c) for c in cols[r])
            for r in range(nr - 1, 0, -1)
        ]
        + [cols[0]]
    )
    c = struct.unpack(">IIII", block)
    return struct.pack(">IIII", *_aes_decrypt_cols(dk, *c))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC, NO padding added (callers pad per their spec)."""
    if len(data) % 16:
        raise ValueError("aes_cbc_encrypt requires 16-byte-aligned input")
    if _OSSL and len(key) in _AES_KEY_BYTES:
        enc = _XCipher(_xalg.AES(key), _xmodes.CBC(iv)).encryptor()
        return enc.update(data) + enc.finalize()
    cols = _aes_expand_key_cols(key)
    p0, p1, p2, p3 = struct.unpack(">IIII", iv)
    out = []
    for i in range(0, len(data), 16):
        b0, b1, b2, b3 = struct.unpack_from(">IIII", data, i)
        p0, p1, p2, p3 = _aes_encrypt_cols(
            cols, b0 ^ p0, b1 ^ p1, b2 ^ p2, b3 ^ p3
        )
        out.append(struct.pack(">IIII", p0, p1, p2, p3))
    return b"".join(out)


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC, NO padding stripped."""
    if len(data) % 16:
        raise CorruptedFileError("AES stream length not 16-byte aligned")
    if _OSSL and len(key) in _AES_KEY_BYTES:
        dec = _XCipher(_xalg.AES(key), _xmodes.CBC(iv)).decryptor()
        return dec.update(data) + dec.finalize()
    dk = _aes_inv_key_cols(key)
    p0, p1, p2, p3 = struct.unpack(">IIII", iv)
    out = []
    for i in range(0, len(data), 16):
        b0, b1, b2, b3 = struct.unpack_from(">IIII", data, i)
        d0, d1, d2, d3 = _aes_decrypt_cols(dk, b0, b1, b2, b3)
        out.append(
            struct.pack(">IIII", d0 ^ p0, d1 ^ p1, d2 ^ p2, d3 ^ p3)
        )
        p0, p1, p2, p3 = b0, b1, b2, b3
    return b"".join(out)


def rc4(key: bytes, data: bytes) -> bytes:
    """Plain RC4 (symmetric)."""
    if _OSSL and len(key) in _ARC4_KEY_BYTES:
        enc = _XCipher(_XARC4(key), mode=None).encryptor()
        return enc.update(data) + enc.finalize()
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


def _file_key(
    o: bytes, p: int, id0: bytes, r: int, n: int, extra: bytes = b""
) -> bytes:
    """Algorithm 2: file encryption key for the EMPTY user password.
    ``n`` = key length in bytes (5 for 40-bit R2, /Length/8 for R3/R4);
    ``extra`` = the 4xFF EncryptMetadata-false marker (R4). /P is packed
    as its 32-bit BIT PATTERN — real producers emit it signed OR unsigned
    (e.g. 4294967292 for -4), and both must derive the same key."""
    h = hashlib.md5(
        PAD + o[:32] + struct.pack("<I", p & 0xFFFFFFFF) + id0 + extra
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


_AES_SALT = b"sAlT"  # Algorithm 1 AES extension (PDF 32000 7.6.2)


def _strip_pkcs7(data: bytes) -> bytes:
    if not data:
        raise CorruptedFileError("empty AES plaintext (missing padding)")
    n = data[-1]
    if not (1 <= n <= 16) or n > len(data):
        raise CorruptedFileError(f"bad AES padding byte {n}")
    return data[:-n]


def _aes_object_key(file_key: bytes, num: int, gen: int) -> bytes:
    ext = struct.pack("<I", num)[:3] + struct.pack("<H", gen & 0xFFFF)
    h = hashlib.md5(file_key + ext + _AES_SALT).digest()
    return h[: min(len(file_key) + 5, 16)]


def _aes_stream_decrypt(obj_key: bytes, data: bytes) -> bytes:
    if len(data) < 16:
        raise CorruptedFileError("AES stream shorter than its IV")
    return _strip_pkcs7(aes_cbc_decrypt(obj_key, data[:16], data[16:]))


@lru_cache(maxsize=1024)
def _alg2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """ISO 32000-2 Algorithm 2.B (R6 password hash).

    ~64+ AES-CBC rounds over multi-KB buffers — by far the most
    expensive primitive here in pure Python (~0.2 s). Cached: within a
    worker, documents from the same producer share /U salts (and the
    fixture corpus shares them entirely), so the hash runs once, not
    once per document."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        m = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[m](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _stream_cfm(enc: dict, allowed: tuple, version: str) -> str:
    """Resolve the STREAM crypt-filter method (/StmF through /CF; the
    default /StmF is Identity = streams not encrypted). One definition
    for V4 and V5."""
    cf = enc.get("CF")
    stmf = enc.get("StmF", "Identity")
    cfm = None
    if stmf == "Identity":
        cfm = "Identity"
    elif isinstance(cf, dict) and isinstance(cf.get(stmf), dict):
        cfm = cf[stmf].get("CFM")
    if cfm not in allowed:
        raise UnsupportedFormatError(
            f"unsupported {version} crypt filter method /{cfm}"
        )
    return cfm


def _build_v4(enc: dict, id0: bytes):
    """V4 (R4): named crypt filters — /AESV2 (AES-128-CBC) or /V2 (RC4)
    under /StdCF; key derivation is the R3 algorithm (with the
    /EncryptMetadata false marker)."""
    cfm = _stream_cfm(enc, ("AESV2", "V2", "Identity"), "V4")
    length_bits = enc.get("Length", 128)
    if not isinstance(length_bits, int) or length_bits % 8 or not (
        40 <= length_bits <= 128
    ):
        raise CorruptedFileError(f"bad /Encrypt /Length {length_bits!r}")
    n = length_bits // 8
    o = _entry_bytes(enc, "O")
    u = _entry_bytes(enc, "U")
    p = enc.get("P")
    if not isinstance(p, int):
        raise CorruptedFileError("/Encrypt missing integer /P")
    extra = (
        b"\xff\xff\xff\xff" if enc.get("EncryptMetadata") is False else b""
    )
    key = _file_key(o, p, id0, 4, n, extra)
    if u[:16] != _expected_u(key, id0, 3)[:16]:
        raise UnsupportedFormatError(
            "password-protected PDF (non-empty user password)"
        )
    if cfm == "Identity":
        return lambda num, gen, data: data
    if cfm == "V2":
        return lambda num, gen, data: rc4(object_key(key, num, gen), data)
    return lambda num, gen, data: _aes_stream_decrypt(
        _aes_object_key(key, num, gen), data
    )


def _build_v5(enc: dict, r: int):
    """V5 (R5/R6): AES-256; the file key is unwrapped from /UE with the
    password-derived intermediate key (Algorithm 2.A; R6 passwords hash
    through Algorithm 2.B, legacy R5 through plain SHA-256)."""
    # /StmF /Identity means streams are NOT encrypted — 'decrypting'
    # plaintext would corrupt a readable document
    cfm = _stream_cfm(enc, ("AESV3", "Identity"), "V5")
    u = _entry_bytes(enc, "U")
    ue = _entry_bytes(enc, "UE")
    if len(u) < 48 or len(ue) < 32:
        raise CorruptedFileError("short /U or /UE entry for V5 encryption")
    vsalt, ksalt = u[32:40], u[40:48]

    def pw_hash(pw: bytes, salt: bytes) -> bytes:
        if r == 6:
            return _alg2b(pw, salt, b"")
        return hashlib.sha256(pw + salt).digest()

    if pw_hash(b"", vsalt) != u[:32]:
        raise UnsupportedFormatError(
            "password-protected PDF (non-empty user password)"
        )
    if cfm == "Identity":
        return lambda num, gen, data: data
    intermediate = pw_hash(b"", ksalt)
    file_key = aes_cbc_decrypt(intermediate, b"\x00" * 16, ue[:32])
    return lambda num, gen, data: _aes_stream_decrypt(file_key, data)


# Documents from one producer share their /Encrypt credentials, so the
# file-key derivation + /U validation (R3: 20 RC4 sweeps + 51 MD5s,
# ~1 ms/doc; R6: two Algorithm-2.B hashes, ~0.4 s cold) runs once per
# worker per credential set, not once per document. Keyed by the full
# /Encrypt dict repr + /ID; decryptors are stateless closures, safe to
# share across documents within a worker (round-4 verdict task 6).
_DECRYPTOR_CACHE: dict[tuple[str, bytes], object] = {}
_DECRYPTOR_CACHE_MAX = 256


def _canon_key(v) -> str:
    """Canonical serialization of the /Encrypt values for the cache key:
    PRIMITIVES ONLY. Any non-primitive (e.g. an indirect-ref object with
    an identity-based repr) raises TypeError so the caller falls back to
    uncached — a per-object repr would silently make every document its
    own cache entry and defeat the cache without signal."""
    if v is None or isinstance(v, (bool, int, float, str, bytes)):
        return repr(v)
    if isinstance(v, list):
        return "[" + ",".join(_canon_key(x) for x in v) + "]"
    if isinstance(v, dict):
        if not all(isinstance(k, str) for k in v):
            raise TypeError("non-string dict key in /Encrypt value")
        return (
            "{"
            + ",".join(f"{k!r}:{_canon_key(v[k])}" for k in sorted(v))
            + "}"
        )
    raise TypeError(f"non-primitive /Encrypt value {type(v).__name__}")


def build_decryptor(enc: dict, id0: bytes):
    """Cached front door for :func:`_build_decryptor` — see the cache
    note above. Typed errors are NOT cached: corrupt dicts are cheap to
    re-reject and caching exceptions would mask /Length-repair edits."""
    try:
        ck = (_canon_key(enc), id0)
    except TypeError:
        ck = None
    if ck is not None:
        hit = _DECRYPTOR_CACHE.get(ck)
        if hit is not None:
            return hit
    dec = _build_decryptor(enc, id0)
    if ck is not None:
        if len(_DECRYPTOR_CACHE) >= _DECRYPTOR_CACHE_MAX:
            _DECRYPTOR_CACHE.clear()
        _DECRYPTOR_CACHE[ck] = dec
    return dec


def _build_decryptor(enc: dict, id0: bytes):
    """/Encrypt dict + first /ID string -> callable(num, gen, data) that
    decrypts a stream payload. Supports the standard handler V1/V2 (RC4),
    V4 (/AESV2 or /V2 crypt filters), V5 R5/R6 (/AESV3, AES-256). Raises
    typed errors for non-standard handlers, unknown versions, and
    non-empty user passwords."""
    if enc.get("Filter") != "Standard":
        raise UnsupportedFormatError(
            f"non-standard security handler /{enc.get('Filter')}"
        )
    v = enc.get("V", 0)
    r = enc.get("R", 0)
    if v == 4 and r == 4:
        return _build_v4(enc, id0)
    if v == 5 and r in (5, 6):
        return _build_v5(enc, r)
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
