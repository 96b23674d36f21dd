"""Fixture writers for legacy OLE2 Office binaries (.doc / .xls).

Like pdf_write.py, these are test-input generators emitting EXACTLY the
dialect ole_extract.py parses: a Word 97-2003 binary with a real FIB +
piece table (one cp1252-compressed piece and one UTF-16 piece, so both
decode paths are always exercised), and a BIFF8 workbook with an SST,
BOUNDSHEET directory and LABELSST/NUMBER cell records.
"""

from __future__ import annotations

import struct

from .cfb import write_cfb

# --------------------------------------------------------------------------
# .doc (MS-DOC): FIB + piece table
# --------------------------------------------------------------------------

_FIB_LEN = 1024  # text starts here in the WordDocument stream


def write_doc(paragraphs: list[str]) -> bytes:
    """Word 97-2003 .doc: text = paragraphs joined+terminated by '\\r'
    paragraph marks, split into TWO pieces (cp1252-compressed then
    UTF-16) through a Clx/PlcPcd piece table in the 1Table stream."""
    text = "\r".join(paragraphs) + "\r"
    # MS-DOC CPs count UTF-16 CODE UNITS, not Python code points — astral
    # chars are 2 units each, and the reader's 2*take byte math follows
    # the format. Mixing the two silently truncated trailing characters.
    k = len(text) // 2
    try:
        text[:k].encode("cp1252")
    except UnicodeEncodeError:
        k = 0  # non-cp1252 text: make the whole document one UTF-16 piece
    piece1 = text[:k].encode("cp1252")  # cp1252 chars are 1 unit each
    off1 = _FIB_LEN
    off2 = off1 + len(piece1)
    if off2 % 2:  # keep the UTF-16 piece 2-byte aligned
        piece1 += b"\x00"
        off2 += 1
    piece2 = text[k:].encode("utf-16-le")
    n = k + len(piece2) // 2  # total CPs in code units

    word = bytearray(_FIB_LEN)
    struct.pack_into("<H", word, 0x00, 0xA5EC)  # wIdent
    struct.pack_into("<H", word, 0x02, 0x00C1)  # nFib (Word 97)
    struct.pack_into("<H", word, 0x0A, 0x0200)  # fWhichTblStm -> 1Table
    struct.pack_into("<H", word, 0x20, 0x000E)  # csw
    struct.pack_into("<H", word, 0x3E, 0x0016)  # cslw
    struct.pack_into("<I", word, 0x40, off2 + len(piece2))  # cbMac
    struct.pack_into("<I", word, 0x4C, n)  # ccpText
    struct.pack_into("<H", word, 0x98, 0x005D)  # cbRgFcLcb (93 pairs)

    # PlcPcd: CPs [0, k, n] + two PCDs (flags, fc, prm)
    cps = [0, k, n] if k else [0, n]
    pcds = []
    if k:
        pcds.append((off1 * 2) | 0x40000000)  # compressed: fc = offset*2
    pcds.append(off2)  # unicode: fc = byte offset
    plcpcd = b"".join(struct.pack("<I", cp) for cp in cps) + b"".join(
        struct.pack("<HIH", 0, fc, 0) for fc in pcds
    )
    clx = b"\x02" + struct.pack("<I", len(plcpcd)) + plcpcd
    struct.pack_into("<I", word, 0x1A2, 0)  # fcClx (offset in 1Table)
    struct.pack_into("<I", word, 0x1A6, len(clx))  # lcbClx

    word_stream = bytes(word) + piece1 + piece2
    return write_cfb([("WordDocument", word_stream), ("1Table", clx)])


# --------------------------------------------------------------------------
# .xls (BIFF8): globals + SST + one substream per sheet
# --------------------------------------------------------------------------


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def _bof(dt: int) -> bytes:
    return _rec(
        0x0809,
        struct.pack("<HHHHII", 0x0600, dt, 0x0DBB, 0x07CC, 0, 0x0600),
    )


def _xl_string(s: str) -> bytes:
    """XLUnicodeRichExtendedString, no rich/ext runs."""
    try:
        raw = s.encode("latin-1")
        flags = 0
    except UnicodeEncodeError:
        raw = s.encode("utf-16-le")
        flags = 1
    return struct.pack("<HB", len(s), flags) + raw


def _sst_segments(
    strings: list[str], total_refs: int, cap: int
) -> list[bytes]:
    """SST payload split into [SST, Continue, ...] segments of <= cap
    bytes, following the MS-XLS split rules: splits at field boundaries
    or inside character data; continued character data restarts with a
    fresh option-flags byte."""
    if cap < 5:
        # 3-byte string header + grbit + one UTF-16 unit must fit a
        # segment; below that the splitter cannot make progress
        raise ValueError(f"sst_record_cap {cap} too small (min 5)")
    segs: list[bytes] = []
    cur = bytearray(struct.pack("<II", total_refs, len(strings)))

    def flush() -> None:
        nonlocal cur
        segs.append(bytes(cur))
        cur = bytearray()

    for s in strings:
        try:
            raw = s.encode("latin-1")
            high = 0
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            high = 1
        if len(cur) + 3 > cap:
            flush()
        cur += struct.pack("<HB", len(s), high)
        unit = 2 if high else 1
        i = 0
        while i < len(s):
            if len(cur) == 0:  # character-data continuation: grbit first
                cur.append(high)
            room = (cap - len(cur)) // unit
            if room <= 0:  # <=: a negative room would walk i backwards
                flush()
                continue
            take = min(len(s) - i, room)
            cur += raw[i * unit : (i + take) * unit]
            i += take
            if i < len(s):
                flush()
    if cur:
        flush()
    return segs


def write_xls(
    sheets: list[tuple[str, list[list[object]]]],
    sst_record_cap: int | None = None,
) -> bytes:
    """BIFF8 workbook: ``sheets`` = [(name, grid)] where grid cells are
    str (-> SST + LABELSST) or int/float (-> NUMBER record).
    ``sst_record_cap`` forces the SST to spill into Continue records at
    that payload size (real writers cap records at 8224 bytes)."""
    strings: list[str] = []
    index: dict[str, int] = {}
    total_refs = 0
    for _name, grid in sheets:
        for row in grid:
            for cell in row:
                if isinstance(cell, str):
                    total_refs += 1
                    if cell not in index:
                        index[cell] = len(strings)
                        strings.append(cell)

    sheet_blobs: list[bytes] = []
    for _name, grid in sheets:
        recs = [_bof(0x0010)]
        for r, row in enumerate(grid):
            for c, cell in enumerate(row):
                if isinstance(cell, str):
                    recs.append(
                        _rec(
                            0x00FD,
                            struct.pack("<HHHI", r, c, 0, index[cell]),
                        )
                    )
                else:
                    recs.append(
                        _rec(
                            0x0203,
                            struct.pack("<HHHd", r, c, 0, float(cell)),
                        )
                    )
        recs.append(_rec(0x000A, b""))
        sheet_blobs.append(b"".join(recs))

    if sst_record_cap is not None:
        sst_segments = _sst_segments(strings, total_refs, sst_record_cap)
    else:
        sst_segments = [
            struct.pack("<II", total_refs, len(strings))
            + b"".join(_xl_string(s) for s in strings)
        ]
    sst_records = _rec(0x00FC, sst_segments[0]) + b"".join(
        _rec(0x003C, seg) for seg in sst_segments[1:]
    )

    def globals_blob(positions: list[int]) -> bytes:
        recs = [_bof(0x0005), sst_records]
        for (name, _g), pos in zip(sheets, positions):
            nb = name.encode("latin-1", "replace")
            recs.append(
                _rec(
                    0x0085,
                    struct.pack("<IBBB", pos, 0, 0, len(nb)) + b"\x00" + nb,
                )
            )
        recs.append(_rec(0x000A, b""))
        return b"".join(recs)

    glen = len(globals_blob([0] * len(sheets)))  # length is position-free
    positions = []
    pos = glen
    for blob in sheet_blobs:
        positions.append(pos)
        pos += len(blob)
    workbook = globals_blob(positions) + b"".join(sheet_blobs)
    return write_cfb([("Workbook", workbook)])
