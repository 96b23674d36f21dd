"""TXT and DOCX extraction (reference MIME-table parity).

The reference dispatches 10 MIME types (lib/models/mime_type.py:4-14,
routing at lib/models/mime_type_utils.py:36-77); beyond pdf/html the two a
web crawl actually yields in volume are plain text and Word documents.
Both are implemented stdlib-only: TXT is a charset-sniffed passthrough,
DOCX is ``zipfile`` + ``xml.etree`` over ``word/document.xml`` (the same
per-document semantics Docling's DOCX backend extracts for the reference:
docling_strategy_processor.py:622-712 convert; tables per the headers rule
at :1699-1726).

PINNED SEMANTICS (byte-identical invariant surface):

TXT:
 1. Bytes decode BOM-aware (UTF-8/UTF-16LE/BE BOM wins and is stripped),
    else UTF-8 with errors="replace" (shares html_extract's decoder; a
    ``<`` in the head would have routed to HTML, so the meta-charset arm
    never fires).
 2. ``content`` = the decoded text UNCHANGED (passthrough — no whitespace
    normalization); whitespace-only content raises EmptyContentError.
 3. Binary-junk guard identical to html_extract pinned rule 7: control
    chars present and (ctrl + U+FFFD) / len > 10% -> UnsupportedFormatError.
 4. One page, one "block" element spanning [0, len(content)).

DOCX:
 5. The payload must be a valid zip (else CorruptedFileError) containing
    ``word/document.xml`` (else a NAMED UnsupportedFormatError: xlsx and
    pptx are recognized by their workbook/presentation parts).
 6. Elements are matched by XML LOCAL name (namespace-prefix agnostic).
    Direct children of <body> in document order: <p> paragraphs and
    <tbl> tables. Paragraph text = concatenated descendant <t> text,
    whitespace-normalized (html_extract rule 4); empty paragraphs drop.
 7. ``content`` = kept paragraph texts joined with "\\n"; tables are
    EXCLUDED from content and emitted into ``tables`` (html rule 8
    parity): rows = <tr>, cells = <tc> (normalized descendant <t>),
    headers = first row, CSV via the shared pinned table_csv.
 8. One page; one "block" element per paragraph with exact char spans.
 9. Malformed XML raises CorruptedFileError.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree

from .html_extract import _CTRL_RE, decode_html_bytes
from .model import (
    DOC_TYPE_DOCX,
    DOC_TYPE_TXT,
    LABEL_BLOCK,
    Element,
    ExtractionResult,
    PageResult,
    TableRef,
    normalize_ws,
    table_csv,
    word_count,
)
from .taxonomy import (
    CorruptedFileError,
    EmptyContentError,
    UnsupportedFormatError,
)


def extract_txt(data: bytes, url_hash: str, config=None) -> ExtractionResult:
    """Plain-text passthrough extraction (pinned rules 1-4). ``config`` is
    accepted for registry uniformity (no format knob)."""
    content = decode_html_bytes(data)
    if not content.strip():
        raise EmptyContentError("empty text document")
    ctrl = len(_CTRL_RE.findall(content))
    if ctrl > 0:
        repl = content.count("�")
        if (ctrl + repl) / len(content) > 0.10:
            raise UnsupportedFormatError(
                "binary payload without recognized magic bytes"
            )
    page = PageResult(
        page_number=1,
        content=content,
        word_count=word_count(content),
        elements=[
            Element(
                text=content,
                label=LABEL_BLOCK,
                page_no=1,
                bbox=None,
                char_start=0,
                char_end=len(content),
            )
        ],
        tables=[],
        figures=[],
    )
    return ExtractionResult(doc_type=DOC_TYPE_TXT, pages=[page])


_XLSX_PARTS = ("xl/workbook.xml",)
_PPTX_PARTS = ("ppt/presentation.xml",)


def _local(tag: str) -> str:
    """XML local name ('{ns}p' -> 'p'); pinned rule 6."""
    return tag.rsplit("}", 1)[-1]


def _node_text(node) -> str:
    """Concatenated descendant <t> text (w:t carries all DOCX run text)."""
    parts = [t.text or "" for t in node.iter() if _local(t.tag) == "t"]
    return normalize_ws("".join(parts))


def extract_docx(data: bytes, url_hash: str, config=None) -> ExtractionResult:
    """DOCX extraction (pinned rules 5-9). Raises typed hard failures.
    ``config`` is accepted for registry uniformity (no format knob)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        names = set(zf.namelist())
    except (zipfile.BadZipFile, ValueError, OSError) as exc:
        raise CorruptedFileError(f"corrupt zip container: {exc}") from exc
    if "word/document.xml" not in names:
        if any(p in names for p in _XLSX_PARTS):
            raise UnsupportedFormatError(
                "xlsx spreadsheet (recognized, not extracted)"
            )
        if any(p in names for p in _PPTX_PARTS):
            raise UnsupportedFormatError(
                "pptx presentation (recognized, not extracted)"
            )
        raise UnsupportedFormatError("zip container without word/document.xml")
    try:
        with zf.open("word/document.xml") as fh:
            root = ElementTree.parse(fh).getroot()
    except (ElementTree.ParseError, zipfile.BadZipFile, OSError) as exc:
        raise CorruptedFileError(f"malformed word/document.xml: {exc}") from exc

    body = next((c for c in root if _local(c.tag) == "body"), None)
    if body is None:
        raise CorruptedFileError("word/document.xml has no <body>")

    paragraphs: list[str] = []
    raw_tables: list[list[list[str]]] = []
    for child in body:
        kind = _local(child.tag)
        if kind == "p":
            text = _node_text(child)
            if text:
                paragraphs.append(text)
        elif kind == "tbl":
            rows = []
            for tr in (n for n in child.iter() if _local(n.tag) == "tr"):
                cells = [
                    _node_text(tc)
                    for tc in tr
                    if _local(tc.tag) == "tc"
                ]
                if cells:
                    rows.append(cells)
            if rows:
                raw_tables.append(rows)

    content = "\n".join(paragraphs)
    if not content:
        raise EmptyContentError("empty extracted content")

    elements: list[Element] = []
    offset = 0
    for text in paragraphs:
        elements.append(
            Element(
                text=text,
                label=LABEL_BLOCK,
                page_no=1,
                bbox=None,
                char_start=offset,
                char_end=offset + len(text),
            )
        )
        offset += len(text) + 1

    tables = [
        TableRef(
            table_id=f"{url_hash}_table_{ti}",
            page_number=1,
            num_rows=len(rows),
            num_cols=max(len(r) for r in rows),
            headers=tuple(rows[0]),
            cell_count=sum(len(r) for r in rows),
            csv=table_csv(rows),
        )
        for ti, rows in enumerate(raw_tables)
    ]

    page = PageResult(
        page_number=1,
        content=content,
        word_count=word_count(content),
        elements=elements,
        tables=tables,
        figures=[],
    )
    return ExtractionResult(doc_type=DOC_TYPE_DOCX, pages=[page])
