"""Minimal deterministic DOCX writer (fixture generator dependency).

Emits exactly the dialect ``core/office_extract.py`` parses: a stored
(uncompressed) zip with fixed timestamps containing ``[Content_Types].xml``
and ``word/document.xml`` — paragraphs as ``<w:p><w:r><w:t>``, tables as
``<w:tbl><w:tr><w:tc>``. Test-input generator only, not an extraction path.
"""

from __future__ import annotations

import io
import zipfile
from xml.sax.saxutils import escape

_W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)

_ZIP_EPOCH = (1980, 1, 1, 0, 0, 0)  # determinism: fixed zip timestamps


def _p(text: str) -> str:
    return (
        f'<w:p><w:r><w:t xml:space="preserve">{escape(text)}</w:t></w:r></w:p>'
    )


def _tbl(rows: list[list[str]]) -> str:
    trs = []
    for row in rows:
        tcs = "".join(f"<w:tc>{_p(cell)}</w:tc>" for cell in row)
        trs.append(f"<w:tr>{tcs}</w:tr>")
    return f"<w:tbl>{''.join(trs)}</w:tbl>"


def document_xml(
    paragraphs: list[str], tables: list[list[list[str]]] = ()
) -> str:
    body = "".join(_p(t) for t in paragraphs)
    body += "".join(_tbl(rows) for rows in tables)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{body}</w:body></w:document>'
    )


def write_docx(
    paragraphs: list[str], tables: list[list[list[str]]] = ()
) -> bytes:
    """Serialize paragraphs (+ optional tables) to deterministic DOCX
    bytes."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("word/document.xml", document_xml(paragraphs, tables)),
        ):
            info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            zf.writestr(info, payload)
    return buf.getvalue()


def write_xlsx_stub() -> bytes:
    """A zip that IS a spreadsheet container (for the named-unsupported
    taxonomy path) — workbook part present, no word/document.xml."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        info = zipfile.ZipInfo("xl/workbook.xml", date_time=_ZIP_EPOCH)
        zf.writestr(info, "<workbook/>")
    return buf.getvalue()
