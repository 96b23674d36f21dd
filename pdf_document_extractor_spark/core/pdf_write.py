"""Minimal deterministic PDF writer (fixture generator dependency).

Emits EXACTLY the dialects the from-scratch parser (pdf_extract.py)
supports (FIXTURES.md "PDF fixture dialect"):

- ``write_pdf``: classic non-compressed-xref PDF 1.4.
- ``write_pdf_15``: PDF 1.5 modern structure — non-stream objects packed
  into a ``/Type /ObjStm`` object stream, cross-reference STREAM
  (``/Type /XRef``, ``/W [1 4 2]``, FlateDecode, optionally PNG Up
  predictor 12 — the layout real-web PDF producers emit).
- ``append_incremental``: appends an update section (overridden objects +
  a classic xref section with ``/Prev``) — the incremental-save shape.
- ``write_pdf_hex``: classic layout, ``<...>`` HEX show operands.
- ``write_pdf_cid``: Type0/Identity-H composite font, 2-byte CIDs, text
  recoverable only through the embedded ``/ToUnicode`` CMap.
- ``write_pdf_encdiff``: simple font with ``/BaseEncoding
  /WinAnsiEncoding`` + ``/Differences`` glyph-name overrides.

All emit a ``/Type /Page`` tree, content streams raw or FlateDecode, text
via ``BT .. /F1 <size> Tf .. <x> <y> Td .. <operand> Tj .. ET``,
font size carrying the header-vs-body signal. No encryption, no images.

This is a *test-input generator*, not part of the extraction path; it exists
so goldens are self-contained and seeded (FIXTURES.md determinism policy).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

PAGE_WIDTH = 612.0
PAGE_HEIGHT = 792.0

# Pinned fixture font sizes (FIXTURES.md: "18 pt header, 10 pt body").
SIZE_HEADER = 18.0
SIZE_BODY = 10.0
SIZE_TABLE = 9.0


@dataclass
class TextShow:
    """One text-show op: place ``text`` at (x, y) in ``size`` pt."""

    x: float
    y: float
    size: float
    text: str


@dataclass
class PdfPageSpec:
    shows: list[TextShow] = field(default_factory=list)


def _escape_pdf_string(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _content_stream(page: PdfPageSpec, hex_strings: bool = False) -> bytes:
    ops: list[str] = []
    for show in page.shows:
        if hex_strings:
            operand = "<" + show.text.encode("latin-1", "replace").hex() + ">"
        else:
            operand = "(" + _escape_pdf_string(show.text) + ")"
        ops.append(
            "BT /F1 {size:g} Tf {x:g} {y:g} Td {operand} Tj ET".format(
                size=show.size, x=show.x, y=show.y, operand=operand
            )
        )
    # Text is latin-1-safe in the fixture dialect (WinAnsi simple fonts);
    # anything outside is mapped to '?' to stay in-dialect.
    return "\n".join(ops).encode("latin-1", errors="replace")


def _serialize_classic(
    objects: list[bytes], version: str = "1.4", trailer_extra: str = ""
) -> bytes:
    """Number the bodies 1..N and emit a classic-xref PDF.
    ``trailer_extra`` is spliced into the trailer dict (e.g. /Encrypt +
    /ID entries for the RC4 writer)."""
    out = bytearray()
    out += f"%PDF-{version}\n".encode()
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"

    xref_pos = len(out)
    n_objs = len(objects) + 1
    out += f"xref\n0 {n_objs}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n_objs} /Root 1 0 R{trailer_extra} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def write_pdf(pages: list[PdfPageSpec], compress: bool = False) -> bytes:
    """Serialize page specs to PDF bytes with a classic xref table.

    Object numbering: 1=Catalog, 2=Pages, 3=Font, 4..3+n = Page objects,
    4+n..3+2n = content streams (shared with write_pdf_15 via
    ``_doc_objects``)."""
    objects, _ = _doc_objects(pages, compress)
    return _serialize_classic(objects)


def _doc_objects(
    pages: list[PdfPageSpec], compress: bool, hex_strings: bool = False
) -> tuple[list[bytes], int]:
    """Shared object bodies for both writers: 1=Catalog, 2=Pages, 3=Font,
    4..3+n page dicts, 4+n..3+2n content streams. Returns (bodies,
    n_pages); bodies are 1-indexed via position."""
    objects: list[bytes] = []
    n_pages = len(pages)
    page_obj_ids = [4 + i for i in range(n_pages)]
    content_obj_ids = [4 + n_pages + i for i in range(n_pages)]

    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{oid} 0 R" for oid in page_obj_ids)
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i in range(n_pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {PAGE_WIDTH:g} {PAGE_HEIGHT:g}] "
                f"/Contents {content_obj_ids[i]} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
    for page in pages:
        data = _content_stream(page, hex_strings)
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")
    return objects, n_pages


def content_stream_obj(page: PdfPageSpec, compress: bool = False) -> bytes:
    """One content-stream object body (for ``append_incremental``
    overrides)."""
    data = _content_stream(page)
    if compress:
        data = zlib.compress(data, 6)
        head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
    else:
        head = f"<< /Length {len(data)} >>".encode()
    return head + b"\nstream\n" + data + b"\nendstream"


def _png_up_predict(data: bytes, rowlen: int) -> bytes:
    """Apply PNG Up (filter 2) per row — the inverse of the parser's
    predictor-12 decode path."""
    out = bytearray()
    prev = bytes(rowlen)
    for r0 in range(0, len(data), rowlen):
        row = data[r0 : r0 + rowlen]
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def write_pdf_15(
    pages: list[PdfPageSpec],
    compress: bool = True,
    predictor: bool = False,
) -> bytes:
    """Serialize page specs as a PDF 1.5 document: catalog/pages/font/page
    dicts packed into ONE object stream, content streams top-level, and a
    cross-reference stream (``/W [1 4 2]``) instead of a classic table.
    ``predictor=True`` additionally PNG-Up-filters the xref entries
    (``/DecodeParms << /Predictor 12 /Columns 7 >>`` — what pdflatex/
    Acrobat-style producers emit)."""
    bodies, n_pages = _doc_objects(pages, compress)
    n_packed = 3 + n_pages  # catalog + pages + font + page dicts
    objstm_id = 4 + 2 * n_pages
    xref_id = objstm_id + 1

    # --- object stream: header of (num, offset) pairs + serialized bodies
    parts: list[bytes] = []
    header: list[str] = []
    off = 0
    for num in range(1, n_packed + 1):
        body = bodies[num - 1]
        header.append(f"{num} {off}")
        parts.append(body + b"\n")
        off += len(body) + 1
    payload = b" ".join(h.encode() for h in header) + b"\n"
    first = len(payload)
    payload += b"".join(parts)
    zpayload = zlib.compress(payload, 6)
    objstm = (
        f"<< /Type /ObjStm /N {n_packed} /First {first} "
        f"/Length {len(zpayload)} /Filter /FlateDecode >>".encode()
        + b"\nstream\n"
        + zpayload
        + b"\nendstream"
    )

    out = bytearray()
    out += b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n"  # binary-comment convention
    offsets: dict[int, int] = {}
    for i in range(n_pages):  # content streams stay top-level
        num = 4 + n_pages + i
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + bodies[num - 1] + b"\nendobj\n"
    offsets[objstm_id] = len(out)
    out += f"{objstm_id} 0 obj\n".encode() + objstm + b"\nendobj\n"

    # --- xref stream entries: W = [1 4 2]
    size = xref_id + 1
    entries = bytearray()
    for num in range(size):
        if num == 0:
            entries += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        elif 1 <= num <= n_packed:
            idx = num - 1  # position inside the objstm
            entries += bytes([2]) + objstm_id.to_bytes(4, "big") + idx.to_bytes(2, "big")
        elif num == xref_id:
            entries += bytes([1]) + len(out).to_bytes(4, "big") + (0).to_bytes(2, "big")
        else:
            entries += bytes([1]) + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big")
    if predictor:
        filtered = _png_up_predict(bytes(entries), 7)
        zentries = zlib.compress(filtered, 6)
        parms = " /DecodeParms << /Predictor 12 /Columns 7 >>"
    else:
        zentries = zlib.compress(bytes(entries), 6)
        parms = ""
    xref_pos = len(out)
    out += (
        f"{xref_id} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root 1 0 R /Filter /FlateDecode{parms} "
        f"/Length {len(zentries)} >>".encode()
        + b"\nstream\n"
        + zentries
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def append_incremental(base: bytes, overrides: dict[int, bytes]) -> bytes:
    """Append an incremental-update section to ``base``: the overridden
    object bodies plus a classic xref section whose trailer carries
    ``/Prev`` pointing at the previous xref — the shape every PDF editor's
    "save" produces. A body of ``None`` marks the object FREE (deleted)."""
    import re as _re

    m = None
    for m in _re.finditer(rb"startxref\s+(\d+)", base[-2048:]):
        pass
    if m is None:
        raise ValueError("base has no startxref")
    prev_xref = int(m.group(1))

    out = bytearray(base)
    if not out.endswith(b"\n"):
        out += b"\n"
    new_offsets: dict[int, int | None] = {}
    for num in sorted(overrides):
        body = overrides[num]
        if body is None:
            new_offsets[num] = None
            continue
        new_offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"

    xref_pos = len(out)
    out += b"xref\n"
    for num in sorted(new_offsets):  # one subsection per object (simple)
        off = new_offsets[num]
        out += f"{num} 1\n".encode()
        if off is None:
            out += b"0000000000 65535 f \n"
        else:
            out += f"{off:010d} 00000 n \n".encode()
    max_obj = max(new_offsets, default=0)
    out += (
        f"trailer\n<< /Size {max_obj + 1} /Root 1 0 R /Prev {prev_xref} >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def simple_doc(
    page_texts: list[tuple[str | None, list[str]]],
    compress: bool = False,
) -> bytes:
    """Convenience: pages as (header_or_None, body_lines) with standard
    layout (header at top, body lines descending at 14pt leading)."""
    pages: list[PdfPageSpec] = []
    for header, body_lines in page_texts:
        shows: list[TextShow] = []
        y = PAGE_HEIGHT - 72.0
        if header is not None:
            shows.append(TextShow(72.0, y, SIZE_HEADER, header))
            y -= 28.0
        for line in body_lines:
            shows.append(TextShow(72.0, y, SIZE_BODY, line))
            y -= 14.0
        pages.append(PdfPageSpec(shows=shows))
    return write_pdf(pages, compress=compress)


def table_grid(
    rows: list[list[str]],
    x0: float = 72.0,
    y0: float = 600.0,
    col_w: float = 110.0,
    row_h: float = 18.0,
) -> list[TextShow]:
    """Shows for a grid-positioned table (regular x/y grid, 9pt cells)."""
    shows: list[TextShow] = []
    for ri, row in enumerate(rows):
        y = y0 - ri * row_h
        for ci, cell in enumerate(row):
            shows.append(TextShow(x0 + ci * col_w, y, SIZE_TABLE, cell))
    return shows


def _empty_password_o(r: int, n: int) -> bytes:
    """Algorithm 3: /O for empty owner password (falls back to user =
    also empty; both pads are PAD itself)."""
    import hashlib

    from .pdf_crypt import PAD, rc4

    h = hashlib.md5(PAD).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    o_key = h[:n]
    o = rc4(o_key, PAD)
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in o_key), o)
    return o


def _encrypted_doc(
    pages: list[PdfPageSpec],
    enc_fn,
    enc_dict: str,
    trailer_id: bytes | None,
    version: str = "1.4",
) -> bytes:
    """Shared encrypted-fixture assembly: re-emit every content stream
    through ``enc_fn(obj_num, raw) -> bytes``, splice the /Encrypt
    dictionary, serialize with the /Encrypt (+ optional /ID) trailer."""
    objects, n_pages = _doc_objects(pages, compress=False)
    for i in range(n_pages):
        obj_num = 4 + n_pages + i  # content streams, gen 0
        data = enc_fn(obj_num, _content_stream(pages[i]))
        objects[obj_num - 1] = (
            f"<< /Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    enc_num = len(objects) + 1
    objects.append(enc_dict.encode())
    extra = f" /Encrypt {enc_num} 0 R"
    if trailer_id is not None:
        extra += f" /ID [<{trailer_id.hex()}> <{trailer_id.hex()}>]"
    return _serialize_classic(objects, version=version, trailer_extra=extra)


def _aes_iv(obj_num: int) -> bytes:
    import hashlib

    return hashlib.md5(b"iv" + str(obj_num).encode()).digest()


def write_pdf_rc4(
    pages: list[PdfPageSpec], r: int = 3, length_bits: int = 128
) -> bytes:
    """Standard-security-handler encrypted PDF with EMPTY user and owner
    passwords (the ubiquitous "owner-password" crawl shape): valid /O and
    /U entries per PDF 32000 Algorithms 3-5, every stream RC4-encrypted
    with its per-object key (parser: core/pdf_crypt.py). ``r`` 2 => V1
    40-bit, ``r`` 3 => V2 ``length_bits``."""
    from .pdf_crypt import _expected_u, _file_key, object_key, rc4

    if r == 2:
        v, length_bits = 1, 40
    else:
        v = 2
    n = length_bits // 8
    id0 = b"\x01" * 16  # deterministic /ID
    p = -44  # print+extract allowed, typical producer value
    o = _empty_password_o(r, n)
    key = _file_key(o, p, id0, r, n)
    u = _expected_u(key, id0, r)
    if r >= 3:
        u = u + b"\x00" * 16  # R3 /U: 16 significant + 16 arbitrary bytes
    return _encrypted_doc(
        pages,
        lambda num, raw: rc4(object_key(key, num, 0), raw),
        f"<< /Filter /Standard /V {v} /R {r} /Length {length_bits} "
        f"/P {p} /O <{o.hex()}> /U <{u.hex()}> >>",
        id0,
    )


def write_pdf_aes(pages: list[PdfPageSpec]) -> bytes:
    """V4/R4 ``/AESV2`` encrypted PDF, empty passwords: R3-style /O //U
    entries, every stream AES-128-CBC encrypted (deterministic per-object
    IV, PKCS#7 padding) with the Algorithm-1 AES object key."""
    from .pdf_crypt import (
        _aes_object_key,
        _expected_u,
        _file_key,
        aes_cbc_encrypt,
    )

    n = 16  # /Length 128
    id0 = b"\x02" * 16
    p = -44
    o = _empty_password_o(3, n)
    key = _file_key(o, p, id0, 3, n)
    u = _expected_u(key, id0, 3) + b"\x00" * 16

    def enc(num: int, raw: bytes) -> bytes:
        pad = 16 - len(raw) % 16
        iv = _aes_iv(num)
        return iv + aes_cbc_encrypt(
            _aes_object_key(key, num, 0), iv, raw + bytes([pad]) * pad
        )

    return _encrypted_doc(
        pages,
        enc,
        "<< /Filter /Standard /V 4 /R 4 /Length 128 "
        f"/P {p} /O <{o.hex()}> /U <{u.hex()}> "
        "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
        "/StmF /StdCF /StrF /StdCF >>",
        id0,
    )


def write_pdf_aes256(pages: list[PdfPageSpec], r: int = 6) -> bytes:
    """V5 ``/AESV3`` AES-256 encrypted PDF, empty passwords (R6 by
    default; R5 legacy hashing on request): deterministic salts and file
    key, /U //UE //O //OE computed per ISO 32000-2 Algorithms 8-9."""
    import hashlib

    from .pdf_crypt import _alg2b, aes_cbc_encrypt

    def pw_hash(salt: bytes, udata: bytes = b"") -> bytes:
        if r == 6:
            return _alg2b(b"", salt, udata)
        return hashlib.sha256(b"" + salt + udata).digest()

    file_key = bytes(range(32))  # deterministic fixture key
    uvs, uks = b"\x03" * 8, b"\x04" * 8
    u = pw_hash(uvs) + uvs + uks
    ue = aes_cbc_encrypt(pw_hash(uks), b"\x00" * 16, file_key)
    ovs, oks = b"\x05" * 8, b"\x06" * 8
    o = pw_hash(ovs, u[:48]) + ovs + oks
    oe = aes_cbc_encrypt(pw_hash(oks, u[:48]), b"\x00" * 16, file_key)

    def enc(num: int, raw: bytes) -> bytes:
        pad = 16 - len(raw) % 16
        iv = _aes_iv(num)
        return iv + aes_cbc_encrypt(file_key, iv, raw + bytes([pad]) * pad)

    return _encrypted_doc(
        pages,
        enc,
        f"<< /Filter /Standard /V 5 /R {r} /Length 256 /P -44 "
        f"/O <{o.hex()}> /U <{u.hex()}> /OE <{oe.hex()}> "
        f"/UE <{ue.hex()}> "
        "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
        "/StmF /StdCF /StrF /StdCF >>",
        None,
        version="1.7",
    )


def write_pdf_scanned(n_pages: int = 1, width: int = 8, height: int = 8) -> bytes:
    """Scanned-document shape: every page draws ONE /Subtype /Image
    XObject via Do and contains no text operators — the scanner-output
    layout (reference OCRs these via enable_ocr, docling_models.py:48;
    the parser classifies them as ScannedPdfNoTextError). Object layout:
    1=Catalog, 2=Pages, 3=Image, 4..3+n page dicts, 4+n..3+2n content
    streams."""
    pixels = zlib.compress(bytes(width * height), 6)  # 8-bit gray
    img = (
        f"<< /Type /XObject /Subtype /Image /Width {width} "
        f"/Height {height} /ColorSpace /DeviceGray /BitsPerComponent 8 "
        f"/Filter /FlateDecode /Length {len(pixels)} >>".encode()
        + b"\nstream\n" + pixels + b"\nendstream"
    )
    page_obj_ids = [4 + i for i in range(n_pages)]
    content_obj_ids = [4 + n_pages + i for i in range(n_pages)]
    objects: list[bytes] = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{oid} 0 R" for oid in page_obj_ids)
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(img)
    for i in range(n_pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {PAGE_WIDTH:g} {PAGE_HEIGHT:g}] "
                f"/Contents {content_obj_ids[i]} 0 R "
                f"/Resources << /XObject << /Im1 3 0 R >> >> >>"
            ).encode()
        )
    content = (
        f"q {PAGE_WIDTH:g} 0 0 {PAGE_HEIGHT:g} 0 0 cm /Im1 Do Q".encode()
    )
    for _ in range(n_pages):
        objects.append(
            f"<< /Length {len(content)} >>".encode()
            + b"\nstream\n" + content + b"\nendstream"
        )
    return _serialize_classic(objects)


def write_pdf_hex(pages: list[PdfPageSpec], compress: bool = False) -> bytes:
    """Classic layout, but every show operand is a ``<...>`` HEX string —
    the shape pdflatex/Ghostscript emit for subset fonts (parser: hex-string
    Tj/TJ operands, pdf_extract._parse_hex_string_bytes)."""
    objects, _ = _doc_objects(pages, compress, hex_strings=True)
    return _serialize_classic(objects)


# --- Type0/CID (Identity-H) with a /ToUnicode CMap --------------------------
#
# Deterministic CID scheme (synthesis-only, NOT a real font's): space
# encodes as CID 0x0001 (bfchar witness), 'é' as 0x0002 (array-form
# bfrange witness), every other latin-1 char c as 0x0100+ord(c) (plain
# bfrange witness). Unencodable chars fall back to CID 0x0003 (unmapped
# -> U+FFFD in the parser).

_CID_TOUNICODE = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CIDSystemInfo << /Registry (Synth) /Ordering (UCS) /Supplement 0 >> def
/CMapName /Synth-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
1 beginbfchar
<0001> <0020>
endbfchar
2 beginbfrange
<0121> <01FF> <0021>
<0002> <0002> [<00E9>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end"""


def _cid_encode(text: str) -> bytes:
    out = bytearray()
    for c in text:
        o = ord(c)
        if c == " ":
            code = 0x0001
        elif c == "\xe9":  # é via the array-form bfrange entry
            code = 0x0002
        elif 0x21 <= o <= 0xFF:
            code = 0x0100 + o
        else:
            code = 0x0003  # deliberately unmapped -> U+FFFD
        out += code.to_bytes(2, "big")
    return bytes(out)


def write_pdf_cid(pages: list[PdfPageSpec]) -> bytes:
    """Type0 composite font, /Encoding /Identity-H, 2-byte CIDs shown as
    hex strings, text recoverable ONLY through the /ToUnicode CMap — the
    modern subset-embedded-font shape (parser: _font_decoder Type0 branch
    + _parse_tounicode). Objects: 1=Catalog 2=Pages 3=Type0 font
    4=descendant CIDFontType2 5=ToUnicode stream, then page dicts, then
    content streams."""
    n_pages = len(pages)
    page_ids = [6 + i for i in range(n_pages)]
    content_ids = [6 + n_pages + i for i in range(n_pages)]
    objects: list[bytes] = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{oid} 0 R" for oid in page_ids)
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID"
        b" /Encoding /Identity-H /DescendantFonts [4 0 R]"
        b" /ToUnicode 5 0 R >>"
    )
    objects.append(
        b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Synth-CID"
        b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
        b" /Supplement 0 >> >>"
    )
    objects.append(
        f"<< /Length {len(_CID_TOUNICODE)} >>".encode()
        + b"\nstream\n" + _CID_TOUNICODE + b"\nendstream"
    )
    for i in range(n_pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {PAGE_WIDTH:g} {PAGE_HEIGHT:g}] "
                f"/Contents {content_ids[i]} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
    for page in pages:
        ops = []
        for show in page.shows:
            ops.append(
                "BT /F1 {size:g} Tf {x:g} {y:g} Td <{hexcids}> Tj ET".format(
                    size=show.size, x=show.x, y=show.y,
                    hexcids=_cid_encode(show.text).hex(),
                )
            )
        data = "\n".join(ops).encode("ascii")
        objects.append(
            f"<< /Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    return _serialize_classic(objects, version="1.6")


# --- simple font with /Encoding dict (/WinAnsiEncoding + /Differences) ------
#
# Deterministic byte scheme: 'é' encodes as byte 0x81 (undefined in
# cp1252 — readable ONLY through the /Differences [129 /eacute]
# override), every other char through cp1252 itself ('€' -> 0x80, the
# WinAnsi base witness).


def _encdiff_encode(text: str) -> bytes:
    out = bytearray()
    for c in text:
        if c == "\xe9":
            out.append(0x81)
        else:
            out += c.encode("cp1252", "replace")
    return bytes(out)


def write_pdf_encdiff(pages: list[PdfPageSpec]) -> bytes:
    """Simple Type1 font with an /Encoding DICT: /BaseEncoding
    /WinAnsiEncoding plus /Differences [129 /eacute] (parser: _font_decoder
    simple branch, _WINANSI_TABLE, _glyph_to_unicode). Same object layout
    as write_pdf."""
    n_pages = len(pages)
    page_ids = [4 + i for i in range(n_pages)]
    content_ids = [4 + n_pages + i for i in range(n_pages)]
    objects: list[bytes] = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{oid} 0 R" for oid in page_ids)
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding << /BaseEncoding /WinAnsiEncoding"
        b" /Differences [129 /eacute] >> >>"
    )
    for i in range(n_pages):
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {PAGE_WIDTH:g} {PAGE_HEIGHT:g}] "
                f"/Contents {content_ids[i]} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
    for page in pages:
        parts: list[bytes] = []
        for show in page.shows:
            encoded = _encdiff_encode(show.text)
            escaped = (
                encoded.replace(b"\\", rb"\\")
                .replace(b"(", rb"\(")
                .replace(b")", rb"\)")
            )
            parts.append(
                "BT /F1 {size:g} Tf {x:g} {y:g} Td (".format(
                    size=show.size, x=show.x, y=show.y
                ).encode("ascii")
                + escaped
                + b") Tj ET"
            )
        data = b"\n".join(parts)
        objects.append(
            f"<< /Length {len(data)} >>".encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
    return _serialize_classic(objects)


# --- filter-cascade variant (ASCII85 over Flate) ----------------------------


def write_pdf_a85(pages: list[PdfPageSpec]) -> bytes:
    """Classic layout with content streams stored as ASCII85-of-Flate
    (``/Filter [/ASCII85Decode /FlateDecode]`` — decode applies the list
    in order, so the stored bytes are a85(deflate(content)))."""
    import base64

    objects, n_pages = _doc_objects(pages, compress=False)
    for i in range(n_pages):
        idx = 3 + n_pages + i  # content stream bodies (0-based list index)
        body = objects[idx]
        data = body.split(b"\nstream\n", 1)[1].rsplit(b"\nendstream", 1)[0]
        enc = base64.a85encode(zlib.compress(data, 6)) + b"~>"
        objects[idx] = (
            f"<< /Length {len(enc)} "
            f"/Filter [/ASCII85Decode /FlateDecode] >>".encode()
            + b"\nstream\n" + enc + b"\nendstream"
        )
    return _serialize_classic(objects)


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """PDF-dialect LZW encoder (fixture generator for the LZWDecode
    path): MSB-first 9-12-bit codes, clear 256, EOD 257, EarlyChange."""
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # leading clear (what real encoders emit)
    seq = b""
    for b in data:
        nxt = seq + bytes([b])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        table[nxt] = next_code
        next_code += 1
        # same pdfminer/pdf.js width-bump convention as _lzw_decode.
        # The decoder's table is ONE entry behind this dict (it cannot
        # add on the first code after a clear), so its size here is
        # next_code - 1 — bump exactly when the decoder does
        if next_code - 1 + early >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:  # table full: clear
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        seq = bytes([b])
    if seq:
        emit(table[seq])
    emit(257)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


# --- Form-XObject wrapper variant -------------------------------------------


def write_pdf_form(pages: list[PdfPageSpec]) -> bytes:
    """Classic layout but each page's text lives inside ONE /Subtype
    /Form XObject invoked by ``/X1 Do`` (the pdflatex/Ghostscript
    whole-page wrapper shape; parser: _form_xobjects + the Do handler).
    Objects: 1=Catalog 2=Pages 3=Font, then per page: page dict, form
    XObject, page content (just the Do)."""
    n_pages = len(pages)
    page_ids = [4 + 3 * i for i in range(n_pages)]
    objects: list[bytes] = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{oid} 0 R" for oid in page_ids)
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, page in enumerate(pages):
        page_id = 4 + 3 * i
        form_id = page_id + 1
        content_id = page_id + 2
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R "
                f"/MediaBox [0 0 {PAGE_WIDTH:g} {PAGE_HEIGHT:g}] "
                f"/Contents {content_id} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> "
                f"/XObject << /X1 {form_id} 0 R >> >> >>"
            ).encode()
        )
        data = _content_stream(page)
        objects.append(
            (
                f"<< /Type /XObject /Subtype /Form "
                f"/BBox [0 0 {PAGE_WIDTH:g} {PAGE_HEIGHT:g}] "
                f"/Length {len(data)} >>"
            ).encode()
            + b"\nstream\n" + data + b"\nendstream"
        )
        page_content = b"/X1 Do"
        objects.append(
            f"<< /Length {len(page_content)} >>".encode()
            + b"\nstream\n" + page_content + b"\nendstream"
        )
    return _serialize_classic(objects)
