"""Minimal deterministic PDF 1.4 writer (fixture generator dependency).

Emits EXACTLY the dialect the from-scratch parser (pdf_extract.py) supports
(FIXTURES.md "PDF fixture dialect"): classic non-compressed-xref PDF 1.4,
``/Type /Page`` tree, content streams raw or FlateDecode, text via
``BT .. /F1 <size> Tf .. <x> <y> Td .. (txt) Tj .. ET`` with Helvetica,
font size carrying the header-vs-body signal. No encryption, no images,
no CID fonts.

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


def _content_stream(page: PdfPageSpec) -> bytes:
    ops: list[str] = []
    for show in page.shows:
        ops.append(
            "BT /F1 {size:g} Tf {x:g} {y:g} Td ({text}) Tj ET".format(
                size=show.size,
                x=show.x,
                y=show.y,
                text=_escape_pdf_string(show.text),
            )
        )
    # Text is latin-1-safe in the fixture dialect (WinAnsi simple fonts);
    # anything outside is mapped to '?' to stay in-dialect.
    return "\n".join(ops).encode("latin-1", errors="replace")


def write_pdf(pages: list[PdfPageSpec], compress: bool = False) -> bytes:
    """Serialize page specs to PDF bytes with a classic xref table."""
    objects: list[bytes] = []  # 1-indexed bodies, object i = objects[i-1]

    n_pages = len(pages)
    # Object numbering: 1=Catalog, 2=Pages, 3=Font,
    # 4..3+n = Page objects, 4+n..3+2n = content streams.
    page_obj_ids = [4 + i for i in range(n_pages)]
    content_obj_ids = [4 + n_pages + i for i in range(n_pages)]

    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{oid} 0 R" for oid in page_obj_ids)
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
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
        data = _content_stream(page)
        if compress:
            data = zlib.compress(data, 6)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray()
    out += b"%PDF-1.4\n"
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
        f"trailer\n<< /Size {n_objs} /Root 1 0 R >>\n"
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
