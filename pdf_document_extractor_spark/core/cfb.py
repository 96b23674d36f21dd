"""OLE2 / CFB (Compound File Binary, MS-CFB) container: reader + writer.

The reference dispatches legacy ``application/msword`` (.doc) and
``application/vnd.ms-excel`` (.xls) as first-class MIME types
(lib/models/mime_type.py:7,9; routing at mime_type_utils.py:36-77). Both
live inside this container format. The reader is from-scratch stdlib over
MS-CFB v3/v4 structures; the writer is a fixture generator (like
pdf_write.py) emitting exactly the dialect the reader supports.

Reader dialect: 512- and 4096-byte sectors, header + chained DIFAT, FAT
chains, directory tree (scanned flat — sibling pointers are not trusted),
mini stream + miniFAT for streams under the 4096-byte cutoff. Cycles,
out-of-range sector ids, and truncated sectors raise CorruptedFileError
(poison-pill discipline: a crafted chain loop must cost a failure row,
not a hung executor).
"""

from __future__ import annotations

import struct

from .taxonomy import CorruptedFileError

CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD
DIFSECT = 0xFFFFFFFC

MINI_CUTOFF = 4096
MINI_SECTOR = 64

# Chain-walk bomb guard: more sectors than the buffer can hold is a loop.
_MAX_CHAIN = 1 << 22


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def _sector(data: bytes, sid: int, ssz: int) -> bytes:
    off = (sid + 1) * ssz
    if off + ssz > len(data):
        raise CorruptedFileError(f"sector {sid} beyond EOF")
    return data[off : off + ssz]


def _walk_chain(fat: list[int], start: int, limit: int) -> list[int]:
    """FAT/miniFAT chain from ``start``; guards cycles and range."""
    out: list[int] = []
    sid = start
    while sid != ENDOFCHAIN:
        if sid >= len(fat) or sid >= _MAX_CHAIN or len(out) > limit:
            raise CorruptedFileError("corrupt sector chain")
        out.append(sid)
        sid = fat[sid]
    return out


def read_cfb(data: bytes) -> dict[str, bytes]:
    """Parse a CFB container to {stream name: bytes} (directory order,
    first occurrence wins for duplicate names)."""
    if len(data) < 512 or data[:8] != CFB_MAGIC:
        raise CorruptedFileError("not an OLE2 compound file")
    if _u16(data, 28) != 0xFFFE:
        raise CorruptedFileError("bad CFB byte order mark")
    shift = _u16(data, 30)
    if shift not in (9, 12):
        raise CorruptedFileError(f"unsupported CFB sector shift {shift}")
    ssz = 1 << shift
    n_fat = _u32(data, 44)
    dir_start = _u32(data, 48)
    minifat_start = _u32(data, 60)
    n_minifat = _u32(data, 64)
    difat_start = _u32(data, 68)
    n_difat = _u32(data, 72)

    # DIFAT: 109 header entries + chained DIFAT sectors
    difat = [_u32(data, 76 + 4 * i) for i in range(109)]
    sid = difat_start
    seen = 0
    per = ssz // 4 - 1
    while sid not in (ENDOFCHAIN, FREESECT):
        sec = _sector(data, sid, ssz)
        difat.extend(struct.unpack_from(f"<{per}I", sec, 0))
        sid = _u32(sec, ssz - 4)
        seen += 1
        if seen > n_difat + 1 or seen > 4096:
            raise CorruptedFileError("DIFAT chain loop")
    fat_sids = [s for s in difat[: max(n_fat, 0)] if s not in (FREESECT, ENDOFCHAIN)]
    if len(fat_sids) < n_fat:
        raise CorruptedFileError("missing FAT sectors")

    ints_per = ssz // 4
    fat: list[int] = []
    for s in fat_sids:
        fat.extend(struct.unpack_from(f"<{ints_per}I", _sector(data, s, ssz), 0))

    max_chain = len(data) // ssz + 2

    def chain_bytes(start: int, size: int) -> bytes:
        chunks = [_sector(data, s, ssz) for s in _walk_chain(fat, start, max_chain)]
        blob = b"".join(chunks)
        if len(blob) < size:
            raise CorruptedFileError("stream chain shorter than its size")
        return blob[:size]

    # directory: chain of 128-byte entries
    dir_blob = b"".join(
        _sector(data, s, ssz) for s in _walk_chain(fat, dir_start, max_chain)
    )
    entries = []
    for off in range(0, len(dir_blob) - 127, 128):
        name_len = _u16(dir_blob, off + 64)
        etype = dir_blob[off + 66]
        if etype == 0 or name_len < 2 or name_len > 64:
            continue
        name = dir_blob[off : off + name_len - 2].decode("utf-16-le", "replace")
        start = _u32(dir_blob, off + 116)
        size = struct.unpack_from("<Q", dir_blob, off + 120)[0]
        if shift == 9:
            size &= 0xFFFFFFFF  # v3: only the low 32 bits are valid
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    if root is None:
        raise CorruptedFileError("CFB has no root directory entry")
    mini_container = (
        chain_bytes(root[2], root[3]) if root[3] > 0 else b""
    )
    minifat: list[int] = []
    if n_minifat and minifat_start not in (ENDOFCHAIN, FREESECT):
        for s in _walk_chain(fat, minifat_start, max_chain):
            minifat.extend(struct.unpack_from(f"<{ints_per}I", _sector(data, s, ssz), 0))

    def mini_chain_bytes(start: int, size: int) -> bytes:
        limit = len(mini_container) // MINI_SECTOR + 2
        chunks = []
        for s in _walk_chain(minifat, start, limit):
            off = s * MINI_SECTOR
            if off + MINI_SECTOR > len(mini_container):
                raise CorruptedFileError("mini sector beyond mini stream")
            chunks.append(mini_container[off : off + MINI_SECTOR])
        blob = b"".join(chunks)
        if len(blob) < size:
            raise CorruptedFileError("mini chain shorter than stream size")
        return blob[:size]

    out: dict[str, bytes] = {}
    for name, etype, start, size in entries:
        if etype != 2 or name in out:
            continue
        if size == 0:
            out[name] = b""
        elif size < MINI_CUTOFF:
            out[name] = mini_chain_bytes(start, size)
        else:
            out[name] = chain_bytes(start, size)
    return out


# --------------------------------------------------------------------------
# Writer (fixture generator, 512-byte sectors)
# --------------------------------------------------------------------------


def _pad(b: bytes, unit: int) -> bytes:
    rem = len(b) % unit
    return b if rem == 0 else b + b"\x00" * (unit - rem)


def write_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Serialize named streams into a v3 (512-byte-sector) compound file.
    Streams under 4096 bytes go through the mini stream + miniFAT (so the
    reader's mini path is exercised by every fixture); larger ones chain
    through the FAT."""
    ssz = 512
    names = [n for n, _b in streams]
    if len(set(names)) != len(names):
        # the start maps below are keyed by name: duplicates would make
        # every same-named directory entry point at the LAST copy's
        # sectors, quietly contradicting the reader's first-wins rule
        raise ValueError(f"duplicate stream names: {sorted(names)}")
    small = [(n, b) for n, b in streams if 0 < len(b) < MINI_CUTOFF]
    big = [(n, b) for n, b in streams if len(b) >= MINI_CUTOFF]

    # mini stream layout + miniFAT
    mini_blob = bytearray()
    minifat: list[int] = []
    small_start: dict[str, int] = {}
    for name, b in small:
        padded = _pad(b, MINI_SECTOR)
        first = len(mini_blob) // MINI_SECTOR
        nsec = len(padded) // MINI_SECTOR
        small_start[name] = first
        minifat.extend(list(range(first + 1, first + nsec)) + [ENDOFCHAIN])
        mini_blob += padded
    mini_blob = bytearray(_pad(bytes(mini_blob), ssz))

    n_dir_entries = 1 + len(streams)
    n_dir_sectors = max(1, -(-n_dir_entries // 4))
    n_minifat_sectors = -(-len(minifat) // 128) if minifat else 0
    n_mini_sectors = len(mini_blob) // ssz
    big_sizes = [len(_pad(b, ssz)) // ssz for _, b in big]

    # sector layout: [dir][miniFAT][mini stream][big streams][FAT]
    n_data = n_dir_sectors + n_minifat_sectors + n_mini_sectors + sum(big_sizes)
    # fixed point for FAT sector count (FAT covers itself)
    n_fat = 1
    while -(-(n_data + n_fat) // 128) != n_fat:
        n_fat = -(-(n_data + n_fat) // 128)
    if n_fat > 109:
        # the writer fills only the header's 109 DIFAT slots (no chained
        # DIFAT sectors); past that it would emit a container its own
        # reader rejects — fail loudly instead (~7 MB payload ceiling)
        raise ValueError(
            f"write_cfb payload needs {n_fat} FAT sectors; only 109 header "
            "DIFAT slots are implemented"
        )
    total = n_data + n_fat

    fat = [FREESECT] * (n_fat * 128)

    def chain(first: int, count: int) -> None:
        for i in range(first, first + count - 1):
            fat[i] = i + 1
        fat[first + count - 1] = ENDOFCHAIN

    pos = 0
    dir_first = pos
    chain(pos, n_dir_sectors)
    pos += n_dir_sectors
    minifat_first = pos if n_minifat_sectors else ENDOFCHAIN
    if n_minifat_sectors:
        chain(pos, n_minifat_sectors)
        pos += n_minifat_sectors
    mini_first = pos if n_mini_sectors else ENDOFCHAIN
    if n_mini_sectors:
        chain(pos, n_mini_sectors)
        pos += n_mini_sectors
    big_start: dict[str, int] = {}
    for (name, _b), nsec in zip(big, big_sizes):
        big_start[name] = pos
        chain(pos, nsec)
        pos += nsec
    fat_first = pos
    for i in range(n_fat):
        fat[pos + i] = FATSECT

    # directory entries
    def dir_entry(
        name: str, etype: int, start: int, size: int, child: int = -1
    ) -> bytes:
        raw_name = name.encode("utf-16-le") + b"\x00\x00"
        if len(raw_name) > 64:
            raise ValueError(f"stream name too long: {name!r}")
        e = bytearray(128)
        e[0 : len(raw_name)] = raw_name
        struct.pack_into("<H", e, 64, len(raw_name))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<i", e, 68, -1)  # left sibling
        struct.pack_into("<i", e, 72, -1)  # right sibling (patched below)
        struct.pack_into("<i", e, 76, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    mini_data_len = sum(len(_pad(b, MINI_SECTOR)) for _, b in small)
    dirs = [
        bytearray(
            dir_entry(
                "Root Entry", 5,
                mini_first if mini_data_len else ENDOFCHAIN,
                mini_data_len, child=1 if streams else -1,
            )
        )
    ]
    for name, b in streams:
        start = (
            small_start[name] if 0 < len(b) < MINI_CUTOFF
            else big_start.get(name, ENDOFCHAIN)
        )
        dirs.append(bytearray(dir_entry(name, 2, start, len(b))))
    for i in range(1, len(dirs) - 1):  # right-sibling chain
        struct.pack_into("<i", dirs[i], 72, i + 1)
    dir_blob = _pad(b"".join(bytes(d) for d in dirs), ssz)

    # fill unused trailing miniFAT entries with FREESECT per spec
    # (zero-padding would mark them as chain links to sector 0)
    n_minifat_slots = n_minifat_sectors * (ssz // 4)
    minifat_blob = b"".join(
        struct.pack("<I", v)
        for v in minifat + [FREESECT] * (n_minifat_slots - len(minifat))
    )

    body = bytearray()
    body += dir_blob
    if n_minifat_sectors:
        body += minifat_blob
    body += mini_blob
    for _name, b in big:
        body += _pad(b, ssz)
    body += b"".join(struct.pack("<I", v) for v in fat)

    header = bytearray(512)
    header[0:8] = CFB_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # sector shift
    struct.pack_into("<H", header, 32, 6)  # mini sector shift
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_first)
    struct.pack_into("<I", header, 56, MINI_CUTOFF)
    struct.pack_into(
        "<I", header, 60,
        minifat_first if n_minifat_sectors else ENDOFCHAIN,
    )
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i,
            fat_first + i if i < n_fat else FREESECT,
        )
    return bytes(header) + bytes(body)
