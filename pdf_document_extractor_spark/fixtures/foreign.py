"""Foreign-producer fixture corpus (round-4 verdict task 3).

``pdf_write.py`` / ``ole_write.py`` emit THIS repo's dialect, so every
parser test so far has been a round-trip against our own serializers. A
real crawl carries documents from other encoders — old Ghostscript,
Adobe Distiller CJK output, Excel 5.0/95 — whose byte layouts differ in
exactly the places a round-trip can't probe: object order, string
escaping, builtin font encodings, predefined CMaps, legacy BIFF
versions. These serializers deliberately mimic those layouts.

The differential invariant is *typed-degrade-never-silently-wrong*:

- :func:`foreign_pdf_ghostscript` — ps2pdf-style PDF 1.3: objects
  emitted content-first, Type1 ``/Times-Roman`` with NO ``/Encoding``
  (builtin StandardEncoding — reference reads these via pypdfium2,
  docling_strategy_processor.py:622-712), octal-escaped literal
  strings, ``TL`` + ``'`` next-line shows, CRLF xref entries. Must
  extract the exact expected text (StandardEncoding == ASCII over the
  printable range).
- :func:`foreign_pdf_gbk` — Distiller-style CJK PDF: Type0
  ``/STSong-Light`` with the predefined ``/GBK-EUC-H`` CMap and no
  ``/ToUnicode``. We ship no GBK tables: must degrade TYPED
  (UnsupportedFormatError), never decode the 2-byte codes latin-1 into
  silent garbage.
- :func:`foreign_xls_biff5` — Excel 5.0/95 workbook: OLE2 container
  holding a BIFF5 ``Book`` stream (BOF version 0x0500, byte-length
  BOUNDSHEET/LABEL shapes). Parsing it as BIFF8 would emit garbage cell
  text as a success row: must hit the typed BIFF-version gate.
"""

from __future__ import annotations

import struct

from ..core.cfb import write_cfb

# --------------------------------------------------------------------------
# PDF assembly in a foreign object order
# --------------------------------------------------------------------------


def _assemble_pdf(
    header: bytes, objects: dict[int, bytes], file_order: list[int],
    trailer_extra: bytes,
) -> bytes:
    """Serialize ``objects`` (num -> body) in ``file_order`` with a
    classic xref whose entries use the CRLF two-byte EOL (both EOL forms
    are spec-legal 20-byte entries; our own writer emits ``" \\n"``)."""
    buf = bytearray(header)
    offsets: dict[int, int] = {}
    for num in file_order:
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num
        buf += objects[num]
        buf += b"\nendobj\n"
    xref_at = len(buf)
    size = max(objects) + 1
    buf += b"xref\r\n0 %d\r\n" % size
    buf += b"0000000000 65535 f\r\n"
    for num in range(1, size):
        if num in offsets:
            buf += b"%010d 00000 n\r\n" % offsets[num]
        else:
            buf += b"0000000000 65535 f\r\n"
    buf += b"trailer\n<< /Size %d " % size + trailer_extra + b" >>\n"
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(buf)


def _octal_literal(s: str) -> bytes:
    """Literal string with the delimiters AND the letter 'a' octal-escaped
    — the escape-heavy shape old Ghostscript emits. Decodes to ``s``."""
    out = bytearray(b"(")
    for ch in s:
        code = ord(ch)
        if code > 0xFF:
            code = 0x3F  # '?' — foreign Type1 fixtures are latin-1 text
        if ch in "()\\a" or not 0x20 <= code < 0x7F:
            out += b"\\%03o" % code
        else:
            out.append(code)
    out += b")"
    return bytes(out)


def foreign_pdf_ghostscript(text: str) -> bytes:
    """ps2pdf-style document showing ``text`` as two 10pt lines (tokens
    [:5] and [5:]) via ``Td``/``TL``/``Tj``/``'``. Expected extraction:
    ``"Page 1\\n\\n" + line1 + "\\n" + line2 + "\\n"``."""
    toks = text.split()
    line1, line2 = " ".join(toks[:5]), " ".join(toks[5:])
    content = (
        b"BT\n/F1 10 Tf\n72 720 Td\n12 TL\n"
        + _octal_literal(line1) + b" Tj\n"
        + _octal_literal(line2) + b" '\nET\n"
    )
    objects = {
        1: b"<< /Type /Catalog /Pages 3 0 R >>",
        2: b"<< /Producer (GPL Ghostscript 9.27) "
           b"/CreationDate (D:20190401120000Z) >>",
        3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        4: b"<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] "
           b"/Contents 5 0 R /Resources << /Font << /F1 6 0 R >> "
           b"/ProcSet [/PDF /Text] >> >>",
        5: b"<< /Length %d >>\nstream\n" % len(content)
           + content + b"endstream",
        # NO /Encoding: builtin StandardEncoding of the base-14 font
        6: b"<< /Type /Font /Subtype /Type1 /Name /F1 "
           b"/BaseFont /Times-Roman >>",
    }
    return _assemble_pdf(
        b"%PDF-1.3\n%\xc7\xec\x8f\xa2\n",
        objects,
        [5, 4, 3, 6, 1, 2],  # content-first: Ghostscript's stream order
        b"/Root 1 0 R /Info 2 0 R",
    )


def foreign_pdf_gbk(text: str) -> bytes:
    """Distiller-style CJK document: Type0 font with the predefined
    /GBK-EUC-H CMap, no /ToUnicode, hex-string 2-byte show codes. The
    expected outcome is the TYPED UnsupportedFormatError degrade."""
    # two plausible GBK 2-byte codes per token count — the bytes are
    # irrelevant (they must never be decoded latin-1)
    codes = b"".join(
        struct.pack(">H", 0xBAFA + (i % 7)) for i in range(len(text.split()))
    )
    content = (
        b"BT\n/F2 12 Tf\n72 720 Td\n<" + codes.hex().encode() + b"> Tj\nET\n"
    )
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F2 5 0 R >> >> >>",
        4: b"<< /Length %d >>\nstream\n" % len(content)
           + content + b"endstream",
        5: b"<< /Type /Font /Subtype /Type0 /BaseFont /STSong-Light "
           b"/Encoding /GBK-EUC-H /DescendantFonts [6 0 R] >>",
        6: b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /STSong-Light "
           b"/CIDSystemInfo << /Registry (Adobe) /Ordering (GB1) "
           b"/Supplement 2 >> >>",
    }
    return _assemble_pdf(
        b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n",
        objects,
        [1, 2, 3, 4, 5, 6],
        b"/Root 1 0 R",
    )


def foreign_pdf_xrefstream_w021(text: str) -> bytes:
    """PDF 1.5 layout in a foreign dialect: the cross-reference STREAM
    uses ``/W [0 2 1]`` (type field width 0 — every entry defaults to
    type 1, a shape pdflatex-family writers emit), a multi-subsection
    ``/Index [1 4 6 1]``, and NO predictor/compression on the stream
    data. Our own 1.5 writer emits /W [1 4 2] with Flate+predictor, so
    this exercises the decoder's width/default handling differentially.
    Same two-line page text as :func:`foreign_pdf_ghostscript`."""
    toks = text.split()
    line1, line2 = " ".join(toks[:5]), " ".join(toks[5:])
    content = (
        b"BT\n/F1 10 Tf\n72 720 Td\n12 TL\n"
        + _octal_literal(line1) + b" Tj\n"
        + _octal_literal(line2) + b" '\nET\n"
    )
    bodies = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
           b"/Contents 4 0 R /Resources << /Font << /F1 6 0 R >> >> >>",
        4: b"<< /Length %d >>\nstream\n" % len(content)
           + content + b"endstream",
        6: b"<< /Type /Font /Subtype /Type1 /Name /F1 "
           b"/BaseFont /Helvetica >>",
    }
    buf = bytearray(b"%PDF-1.5\n%\xd0\xd4\xc5\xd8\n")
    offsets: dict[int, int] = {}
    for num in (1, 2, 3, 4, 6):
        offsets[num] = len(buf)
        buf += b"%d 0 obj\n" % num + bodies[num] + b"\nendobj\n"
    # xref stream = object 5; entries for objects 1-4 then 6 (Index
    # [1 4 6 1]); object 5's own offset appears nowhere (readers locate
    # it via startxref) — 2-byte offsets, 1-byte objstm index, no type
    xref_at = len(buf)
    entries = b"".join(
        struct.pack(">HB", offsets[n], 0) for n in (1, 2, 3, 4, 6)
    )
    sdict = (
        b"<< /Type /XRef /W [0 2 1] /Index [1 4 6 1] /Size 7 "
        b"/Root 1 0 R /Length %d >>" % len(entries)
    )
    buf += b"5 0 obj\n" + sdict + b"\nstream\n" + entries + b"\nendstream\nendobj\n"
    buf += b"startxref\n%d\n%%%%EOF\n" % xref_at
    return bytes(buf)


# --------------------------------------------------------------------------
# BIFF5 (Excel 5.0/95) workbook
# --------------------------------------------------------------------------


def _rec(rid: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rid, len(payload)) + payload


def foreign_xls_biff5(cells: list[str] | None = None) -> bytes:
    """Excel 5.0/95 workbook: OLE2 container with a BIFF5 ``Book``
    stream — BOF version 0x0500, BIFF5 byte-length BOUNDSHEET, BIFF5
    LABEL records (no Unicode flags byte). Must hit the typed
    BIFF-version gate, never parse as BIFF8."""
    cells = cells if cells is not None else ["alpha", "beta"]
    name = b"Sheet1"
    sheet = bytearray()
    sheet += _rec(0x0809, struct.pack("<HH", 0x0500, 0x0010))  # sheet BOF
    for i, c in enumerate(cells):
        raw = c.encode("latin-1", "replace")
        # BIFF5 LABEL: rw, col, ixfe, cch (2 bytes), raw bytes — no
        # grbit/Unicode flags byte (that's the BIFF8 divergence)
        sheet += _rec(
            0x0204,
            struct.pack("<HHHH", i, 0, 0x000F, len(raw)) + raw,
        )
    sheet += _rec(0x000A, b"")
    bof_g = _rec(0x0809, struct.pack("<HH", 0x0500, 0x0005))  # globals BOF
    eof = _rec(0x000A, b"")
    # sheet substream offset = size of the globals substream
    globals_size = len(bof_g) + (4 + 4 + 2 + 1 + len(name)) + len(eof)
    bs = _rec(  # BIFF5 BOUNDSHEET: byte-length name, no flags byte
        0x0085, struct.pack("<IHB", globals_size, 0x0000, len(name)) + name
    )
    return write_cfb([("Book", bytes(bof_g + bs + eof + sheet))])
