"""Minimal deterministic OOXML writers (fixture generator dependency).

Emit exactly the dialects ``core/office_extract.py`` parses: stored
(uncompressed) zips with fixed timestamps —

- ``write_docx``: ``word/document.xml`` with ``<w:p><w:r><w:t>``
  paragraphs and ``<w:tbl><w:tr><w:tc>`` tables.
- ``write_xlsx``: ``xl/workbook.xml`` + rels + ``xl/sharedStrings.xml`` +
  one ``xl/worksheets/sheetN.xml`` per sheet (all strings shared, the
  real-world layout).
- ``write_pptx``: ``ppt/presentation.xml`` + rels + one
  ``ppt/slides/slideN.xml`` per slide with ``<a:p><a:r><a:t>`` runs.

Test-input generators only, not extraction paths.
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


def _tbl(rows: list[list[str]], merged: bool = False) -> str:
    trs = []
    for ri, row in enumerate(rows):
        tcs = []
        for ci, cell in enumerate(row):
            # merged signal: a w:gridSpan on the first cell of the first
            # row (text extraction ignores tcPr; only the merged-cell
            # metadata flag changes)
            pr = (
                '<w:tcPr><w:gridSpan w:val="2"/></w:tcPr>'
                if merged and ri == 0 and ci == 0
                else ""
            )
            tcs.append(f"<w:tc>{pr}{_p(cell)}</w:tc>")
        trs.append(f"<w:tr>{''.join(tcs)}</w:tr>")
    return f"<w:tbl>{''.join(trs)}</w:tbl>"


def document_xml(
    paragraphs: list[str],
    tables: list[list[list[str]]] = (),
    merged: bool = False,
) -> str:
    body = "".join(_p(t) for t in paragraphs)
    body += "".join(_tbl(rows, merged) for rows in tables)
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{body}</w:body></w:document>'
    )


def write_docx(
    paragraphs: list[str],
    tables: list[list[list[str]]] = (),
    merged: bool = False,
) -> bytes:
    """Serialize paragraphs (+ optional tables) to deterministic DOCX
    bytes. ``merged`` stamps a w:gridSpan on the first cell of each table
    (merged-cell metadata signal; cell text is unchanged)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in (
            ("[Content_Types].xml", _CONTENT_TYPES),
            ("word/document.xml", document_xml(paragraphs, tables, merged)),
        ):
            info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            zf.writestr(info, payload)
    return buf.getvalue()


def _write_zip(parts: list[tuple[str, str]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, payload in parts:
            info = zipfile.ZipInfo(name, date_time=_ZIP_EPOCH)
            zf.writestr(info, payload)
    return buf.getvalue()


def write_xlsx_stub() -> bytes:
    """A spreadsheet container with an EMPTY workbook (no sheets) — the
    empty-content taxonomy path for the xlsx extractor."""
    return _write_zip([("xl/workbook.xml", "<workbook/>")])


_XLSX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "</Types>"
)

_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def write_xlsx(sheets: list[list[list[str]]], merged: bool = False) -> bytes:
    """Sheets (rows of string cells) -> deterministic XLSX bytes. All cell
    values go through xl/sharedStrings.xml (t=\"s\"), the layout real
    producers emit. ``merged`` appends a <mergeCells> block (A1:B1) to
    each sheet (merged-cell metadata signal; cell text unchanged)."""
    strings: list[str] = []
    index: dict[str, int] = {}

    def sid(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    sheet_parts = []
    for si, rows in enumerate(sheets, start=1):
        xml_rows = []
        for ri, row in enumerate(rows, start=1):
            cells = "".join(
                f'<c r="{chr(64 + ci)}{ri}" t="s"><v>{sid(cell)}</v></c>'
                for ci, cell in enumerate(row, start=1)
            )
            xml_rows.append(f'<row r="{ri}">{cells}</row>')
        sheet_parts.append(
            (
                f"xl/worksheets/sheet{si}.xml",
                '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
                'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
                + "".join(xml_rows)
                + "</sheetData>"
                + (
                    '<mergeCells count="1"><mergeCell ref="A1:B1"/>'
                    "</mergeCells>"
                    if merged
                    else ""
                )
                + "</worksheet>",
            )
        )
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.'
        f'org/spreadsheetml/2006/main" count="{len(strings)}" '
        f'uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    wb_sheets = "".join(
        f'<sheet name="Sheet{i}" sheetId="{i}" r:id="rId{i}"/>'
        for i in range(1, len(sheets) + 1)
    )
    workbook = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main" '
        f'xmlns:r="{_REL_NS}"><sheets>{wb_sheets}</sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
        'openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="{_REL_NS}/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, len(sheets) + 1)
        )
        + "</Relationships>"
    )
    return _write_zip(
        [
            ("[Content_Types].xml", _XLSX_CT),
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", rels),
            ("xl/sharedStrings.xml", sst),
            *sheet_parts,
        ]
    )


_A_NS = "http://schemas.openxmlformats.org/drawingml/2006/main"


def write_pptx(slides: list[list[str]]) -> bytes:
    """Slides (lists of paragraph strings) -> deterministic PPTX bytes."""
    slide_parts = []
    for si, paragraphs in enumerate(slides, start=1):
        ps = "".join(
            f"<a:p><a:r><a:t>{escape(t)}</a:t></a:r></a:p>"
            for t in paragraphs
        )
        slide_parts.append(
            (
                f"ppt/slides/slide{si}.xml",
                '<?xml version="1.0"?><p:sld xmlns:p="http://schemas.'
                'openxmlformats.org/presentationml/2006/main" '
                f'xmlns:a="{_A_NS}"><p:cSld><p:spTree><p:sp><p:txBody>'
                + ps
                + "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>",
            )
        )
    sld_ids = "".join(
        f'<p:sldId id="{255 + i}" r:id="rId{i}"/>'
        for i in range(1, len(slides) + 1)
    )
    presentation = (
        '<?xml version="1.0"?><p:presentation xmlns:p="http://schemas.'
        'openxmlformats.org/presentationml/2006/main" '
        f'xmlns:r="{_REL_NS}"><p:sldIdLst>{sld_ids}</p:sldIdLst>'
        "</p:presentation>"
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.'
        'openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="{_REL_NS}/slide" '
            f'Target="slides/slide{i}.xml"/>'
            for i in range(1, len(slides) + 1)
        )
        + "</Relationships>"
    )
    return _write_zip(
        [
            ("[Content_Types].xml", _XLSX_CT),
            ("ppt/presentation.xml", presentation),
            ("ppt/_rels/presentation.xml.rels", rels),
            *slide_parts,
        ]
    )
