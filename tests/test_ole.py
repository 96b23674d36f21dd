"""OLE2/CFB container + legacy .doc/.xls extraction (round 3, verdict
task 5 — reference MIME parity for application/msword and
application/vnd.ms-excel)."""

from __future__ import annotations

import struct

import pytest

from pdf_document_extractor_spark.core.cfb import read_cfb, write_cfb
from pdf_document_extractor_spark.core.ole_extract import (
    _fmt_number,
    _rk_value,
    extract_ole2,
)
from pdf_document_extractor_spark.core.ole_write import write_doc, write_xls
from pdf_document_extractor_spark.core.taxonomy import (
    CorruptedFileError,
    EmptyContentError,
    UnsupportedFormatError,
)


def test_cfb_roundtrip_mini_and_fat_paths():
    streams = [
        ("WordDocument", b"A" * 100),  # mini stream
        ("1Table", b"B" * 5000),  # FAT stream
        ("Tiny", b"x"),
        ("Empty", b""),
    ]
    back = read_cfb(write_cfb(streams))
    for n, b in streams:
        assert back[n] == b
    for sz in (63, 64, 65, 4095, 4096, 4097, 70000):
        assert read_cfb(write_cfb([("S", b"q" * sz)]))["S"] == b"q" * sz


def test_cfb_corrupt_guards():
    good = write_cfb([("S", b"hello")])
    with pytest.raises(CorruptedFileError):
        read_cfb(b"\xd0\xcf\x11\xe0not really")
    with pytest.raises(CorruptedFileError):
        read_cfb(good[:300])
    # FAT chain loop: point the directory chain at itself
    looped = bytearray(good)
    fat_off = None
    # find directory start sector from header, corrupt its FAT entry
    dir_first = struct.unpack_from("<I", good, 48)[0]
    n_fat = struct.unpack_from("<I", good, 44)[0]
    fat_sid = struct.unpack_from("<I", good, 76)[0]
    fat_off = (fat_sid + 1) * 512 + 4 * dir_first
    struct.pack_into("<I", looped, fat_off, dir_first)  # self-loop
    with pytest.raises(CorruptedFileError, match="chain"):
        read_cfb(bytes(looped))


def test_doc_mixed_piece_encodings_and_marks():
    # write_doc splits into cp1252 + UTF-16 pieces; é survives via UTF-16
    doc = write_doc(["first paragraph", "café résumé"])
    res = extract_ole2(doc, "0" * 16)
    assert res.doc_type == "doc"
    assert res.pages[0].content == "first paragraph\ncafé résumé"
    (el,) = res.pages[0].elements
    assert (el.char_start, el.char_end) == (0, len(res.pages[0].content))


def test_doc_control_char_transform():
    # cell mark \x07 -> newline; field marks \x13\x14\x15 dropped
    doc = write_doc(["a\x07b", "x\x13y\x14z\x15w"])
    res = extract_ole2(doc, "0" * 16)
    assert res.pages[0].content == "a\nb\nxyzw"


def test_doc_taxonomy():
    with pytest.raises(EmptyContentError):
        extract_ole2(write_doc([""]), "0" * 16)
    # FIB magic broken -> corrupted
    doc = bytearray(write_doc(["hello there"]))
    streams = read_cfb(bytes(doc))
    bad = dict(streams)
    bad["WordDocument"] = b"\x00\x00" + streams["WordDocument"][2:]
    blob = write_cfb(sorted(bad.items()))
    with pytest.raises(CorruptedFileError, match="FIB"):
        extract_ole2(blob, "0" * 16)
    # neither WordDocument nor Workbook -> named unsupported
    with pytest.raises(UnsupportedFormatError, match="WordDocument/Workbook"):
        extract_ole2(write_cfb([("Pictures", b"z" * 10)]), "0" * 16)


def test_xls_cell_record_forms():
    xls = write_xls(
        [("S1", [["k", "v"], ["n", 42], ["f", 2.5], ["big", 1e10]])]
    )
    res = extract_ole2(xls, "0" * 16)
    assert res.doc_type == "xls"
    assert res.pages[0].content == "k v\nn 42\nf 2.5\nbig 10000000000"
    (t,) = res.pages[0].tables
    assert t.headers == ("k", "v") and t.num_rows == 4


def test_xls_sheets_are_pages():
    xls = write_xls([("A", [["x"]]), ("B", [["y", "z"]])])
    res = extract_ole2(xls, "0" * 16)
    assert [(p.page_number, p.content) for p in res.pages] == [
        (1, "x"), (2, "y z"),
    ]
    # table ids continue across sheets
    assert res.pages[1].tables[0].table_id.endswith("_table_1")


def test_xls_unicode_sst_string():
    res = extract_ole2(write_xls([("S", [["中文", "café"]])]), "0" * 16)
    assert res.pages[0].content == "中文 café"


def test_rk_value_forms():
    # integer form: 30-bit signed << 2 | 0b10
    assert _rk_value((42 << 2) | 0x02) == 42.0
    assert _rk_value(((-7) & 0x3FFFFFFF) << 2 | 0x02) == -7.0
    # /100 integer form
    assert _rk_value((250 << 2) | 0x03) == 2.5
    # double form: high 30 bits of IEEE double for 1.0
    hi = struct.unpack("<Q", struct.pack("<d", 1.0))[0] >> 32
    assert _rk_value(hi & 0xFFFFFFFC) == 1.0
    assert _fmt_number(3.0) == "3"
    assert _fmt_number(3.25) == "3.25"


def test_xls_rk_and_mulrk_records():
    """Handcraft RK + MULRK records (the writer emits NUMBER for floats)."""
    from pdf_document_extractor_spark.core.ole_write import (
        _bof,
        _rec,
        _xl_string,
    )

    sst = struct.pack("<II", 1, 1) + _xl_string("hdr")
    globals_recs = (
        _bof(0x0005)
        + _rec(0x00FC, sst)
        + _rec(0x0085, struct.pack("<IBBB", 0, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    sheet = (
        _bof(0x0010)
        + _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 0))  # LABELSST 'hdr'
        + _rec(0x027E, struct.pack("<HHHI", 1, 0, 0, (5 << 2) | 0x02))  # RK 5
        + _rec(
            0x00BD,  # MULRK row 2, cols 0-1: 10 and 0.25 (/100 of 25)
            struct.pack("<HH", 2, 0)
            + struct.pack("<HI", 0, (10 << 2) | 0x02)
            + struct.pack("<HI", 0, (25 << 2) | 0x03)
            + struct.pack("<H", 1),
        )
        + _rec(0x000A, b"")
    )
    glen = len(globals_recs)
    globals_recs = (
        _bof(0x0005)
        + _rec(0x00FC, sst)
        + _rec(0x0085, struct.pack("<IBBB", glen, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    blob = write_cfb([("Workbook", globals_recs + sheet)])
    res = extract_ole2(blob, "0" * 16)
    assert res.pages[0].content == "hdr\n5\n10 0.25"


def test_xls_taxonomy():
    # out-of-range isst
    from pdf_document_extractor_spark.core.ole_write import _bof, _rec

    sst = struct.pack("<II", 0, 0)
    g = (
        _bof(0x0005) + _rec(0x00FC, sst)
        + _rec(0x0085, struct.pack("<IBBB", 0, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    glen = len(g)
    g = (
        _bof(0x0005) + _rec(0x00FC, sst)
        + _rec(0x0085, struct.pack("<IBBB", glen, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    sheet = (
        _bof(0x0010)
        + _rec(0x00FD, struct.pack("<HHHI", 0, 0, 0, 99))
        + _rec(0x000A, b"")
    )
    with pytest.raises(CorruptedFileError, match="isst"):
        extract_ole2(write_cfb([("Workbook", g + sheet)]), "0" * 16)
    with pytest.raises(EmptyContentError):
        extract_ole2(write_xls([("S", [])]), "0" * 16)


def test_dispatch_routes_ole2():
    from pdf_document_extractor_spark.core.dispatch import extract_document

    res = extract_document("u", write_doc(["dispatch works fine"]))
    assert (res.doc_type, res.status) == ("doc", "success")
    res = extract_document("u", write_xls([("S", [["a", "b"]])]))
    assert (res.doc_type, res.status) == ("xls", "success")
    # ole2 with unknown payload -> typed unsupported, not a crash
    res = extract_document("u", write_cfb([("Junk", b"j" * 10)]))
    assert (res.status, res.error_type) == (
        "hard_failure", "UnsupportedFormatError",
    )
    # truncated container -> corrupt
    res = extract_document("u", write_doc(["x y z"])[:600])
    assert res.error_type == "CorruptedFileError"


def test_xls_sst_continue_spill_roundtrip():
    """Real-web workbooks cap records at 8224 bytes and spill the SST
    into Continue records; splits land between fields AND inside
    character data (continuations restart with a fresh fHighByte byte,
    possibly different per span). Caps down to 16 bytes force every
    split shape."""
    grid = [[f"cell{r}_" + "x" * 40, "中" * 30 + f"u{r}"] for r in range(20)]
    want = "\n".join(" ".join(row) for row in grid)
    for cap in (16, 33, 64, 100, 8224):
        blob = write_xls([("S", grid)], sst_record_cap=cap)
        assert extract_ole2(blob, "0" * 16).pages[0].content == want, cap


def test_xls_sst_continue_truncated_is_typed():
    blob = write_xls(
        [("S", [["y" * 500, "z"]])], sst_record_cap=64
    )
    # strip the workbook's final Continue record bytes -> typed failure
    from pdf_document_extractor_spark.core.cfb import read_cfb, write_cfb

    wb = read_cfb(blob)["Workbook"]
    # chop inside the SST spill region (before the BOUNDSHEET tail)
    bad = write_cfb([("Workbook", wb[:200])])
    res_err = None
    try:
        extract_ole2(bad, "0" * 16)
    except (CorruptedFileError, EmptyContentError) as exc:
        res_err = type(exc).__name__
    assert res_err == "CorruptedFileError"


def test_xls_label_record_inline_string():
    """LABEL (0x0204): inline XLUnicodeString cell, both byte widths."""
    from pdf_document_extractor_spark.core.ole_write import (
        _bof,
        _rec,
        _xl_string,
    )

    g = (
        _bof(0x0005)
        + _rec(0x00FC, struct.pack("<II", 0, 0))
        + _rec(0x0085, struct.pack("<IBBB", 0, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    glen = len(g)
    g = (
        _bof(0x0005)
        + _rec(0x00FC, struct.pack("<II", 0, 0))
        + _rec(0x0085, struct.pack("<IBBB", glen, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    sheet = (
        _bof(0x0010)
        + _rec(0x0204, struct.pack("<HHH", 0, 0, 0) + _xl_string("inline"))
        + _rec(0x0204, struct.pack("<HHH", 0, 1, 0) + _xl_string("中文"))
        + _rec(0x000A, b"")
    )
    res = extract_ole2(write_cfb([("Workbook", g + sheet)]), "0" * 16)
    assert res.pages[0].content == "inline 中文"


def test_crafted_fib_and_records_fail_typed():
    """Untrusted csw/payload sizes must become CorruptedFileError, never a
    raw struct.error (whose type name 'error' would leak into the
    taxonomy's error_type column)."""
    import struct as _s

    from pdf_document_extractor_spark.core.ole_write import _bof, _rec

    # WordDocument with valid wIdent but csw pointing past the stream
    word = bytearray(0x200)
    _s.pack_into("<H", word, 0, 0xA5EC)
    _s.pack_into("<H", word, 0x20, 0xFFFF)  # csw bomb
    blob = write_cfb([("WordDocument", bytes(word)), ("0Table", b"\x00" * 16)])
    with pytest.raises(CorruptedFileError, match="out of bounds"):
        extract_ole2(blob, "0" * 16)

    # LABELSST with a 2-byte payload
    g = (
        _bof(0x0005) + _rec(0x00FC, _s.pack("<II", 0, 0))
        + _rec(0x0085, _s.pack("<IBBB", 0, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    glen = len(g)
    g = (
        _bof(0x0005) + _rec(0x00FC, _s.pack("<II", 0, 0))
        + _rec(0x0085, _s.pack("<IBBB", glen, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    sheet = _bof(0x0010) + _rec(0x00FD, b"\x00\x00") + _rec(0x000A, b"")
    with pytest.raises(CorruptedFileError, match="truncated BIFF record fields"):
        extract_ole2(write_cfb([("Workbook", g + sheet)]), "0" * 16)


def test_nan_inf_number_cells_render_via_repr():
    import struct as _s

    from pdf_document_extractor_spark.core.ole_extract import _fmt_number

    assert _fmt_number(float("nan")) == "nan"
    assert _fmt_number(float("inf")) == "inf"
    assert _fmt_number(float("-inf")) == "-inf"

    from pdf_document_extractor_spark.core.ole_write import _bof, _rec

    g = (
        _bof(0x0005) + _rec(0x00FC, _s.pack("<II", 0, 0))
        + _rec(0x0085, _s.pack("<IBBB", 0, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    glen = len(g)
    g = (
        _bof(0x0005) + _rec(0x00FC, _s.pack("<II", 0, 0))
        + _rec(0x0085, _s.pack("<IBBB", glen, 0, 0, 1) + b"\x00S")
        + _rec(0x000A, b"")
    )
    sheet = (
        _bof(0x0010)
        + _rec(0x0203, _s.pack("<HHHd", 0, 0, 0, float("nan")))
        + _rec(0x000A, b"")
    )
    res = extract_ole2(write_cfb([("Workbook", g + sheet)]), "0" * 16)
    assert res.pages[0].content == "nan"


def test_write_cfb_rejects_duplicate_names():
    with pytest.raises(ValueError, match="duplicate"):
        write_cfb([("S", b"aaa"), ("S", b"bbb")])


def test_doc_astral_chars_roundtrip():
    """MS-DOC CPs are UTF-16 code units; astral chars (2 units) must not
    shift the piece boundaries or truncate trailing text."""
    doc = write_doc(["aaa bbb", "x \U0001F600\U0001F601 tail end"])
    res = extract_ole2(doc, "0" * 16)
    assert res.pages[0].content == "aaa bbb\nx \U0001F600\U0001F601 tail end"


def test_sst_cap_too_small_raises_not_hangs():
    with pytest.raises(ValueError, match="too small"):
        write_xls([("S", [["ab"]])], sst_record_cap=2)
    # the minimum workable cap still terminates and roundtrips
    blob = write_xls([("S", [["abcdef", "中文"]])], sst_record_cap=5)
    assert extract_ole2(blob, "0" * 16).pages[0].content == "abcdef 中文"


def test_biff5_bof_is_typed_unsupported():
    """A 'Book' stream with a BIFF5 BOF (vers 0x0500) must degrade TYPED
    (advisor finding): BIFF5 has no SST/LABELSST and its BOUNDSHEET lacks
    the Unicode flags byte — BIFF8-parsing it yields garbage 'success'."""
    good = write_xls([("Sheet1", [["k", "v"]])])
    wb = read_cfb(good)["Workbook"]
    biff5 = bytearray(wb)
    struct.pack_into("<H", biff5, 4, 0x0500)  # BOF vers -> BIFF5
    payload = write_cfb([("Book", bytes(biff5))])
    with pytest.raises(UnsupportedFormatError, match="BIFF version 0x0500"):
        extract_ole2(payload, "0" * 16)
    # BIFF4-era BOF record id entirely
    biff4 = bytearray(wb)
    struct.pack_into("<H", biff4, 0, 0x0409)
    with pytest.raises(UnsupportedFormatError, match="legacy BIFF BOF"):
        extract_ole2(write_cfb([("Book", bytes(biff4))]), "0" * 16)
    # non-BOF leading record: corrupt, not unsupported
    with pytest.raises(CorruptedFileError, match="not BOF"):
        extract_ole2(write_cfb([("Workbook", b"\x00\x00\x00\x00" * 4)]), "0" * 16)
