"""Typed extraction output model.

Reimplements the output contract of the reference's per-page result model
(reference: lib/models/extraction_models.py:93-118 ``PageExtractionResult``,
:23-33 ``BoundingBox``, :67-78 ``TableReference``, :54-64 ``FigureReference``)
as plain dataclasses. One ``PageResult`` row per (url, page_number);
``content`` is the byte-identical invariant surface.

Determinism policy (FIXTURES.md): no ``uuid4`` and no wall-clock anywhere in
the invariant surface — the reference's nondeterministic figure/table ids
(reference: docling_strategy_processor.py:1550, 1665) are replaced by
``{url_hash}_figure_{idx}`` / ``{url_hash}_table_{idx}``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# Labels for extracted elements.
LABEL_HEADER = "header"
LABEL_BODY = "body"
LABEL_TABLE_CELL = "table_cell"
LABEL_CAPTION = "caption"
LABEL_BLOCK = "block"  # HTML main-content blocks

# Status values (reference call-site enum QUEUED/PROCESSING/SUCCESS/FAILURE,
# kafka_message_handler.py:61; we keep the two terminal document states plus
# the retryable marker).
STATUS_SUCCESS = "success"
STATUS_HARD_FAILURE = "hard_failure"
STATUS_SOFT_FAILURE = "soft_failure"

DOC_TYPE_PDF = "pdf"
DOC_TYPE_HTML = "html"
DOC_TYPE_TXT = "txt"
DOC_TYPE_DOCX = "docx"
DOC_TYPE_XLSX = "xlsx"
DOC_TYPE_PPTX = "pptx"
DOC_TYPE_RTF = "rtf"
DOC_TYPE_OOXML = "ooxml"  # sniffed PK-zip before the part decides subtype
DOC_TYPE_PNG = "png"
DOC_TYPE_JPG = "jpg"
DOC_TYPE_GIF = "gif"


@dataclass(frozen=True)
class BBox:
    """Reference: lib/models/extraction_models.py:23-33."""

    left: float
    top: float
    right: float
    bottom: float
    coord_origin: str = "TOP_LEFT"


@dataclass(frozen=True)
class Element:
    """One extracted text element (reference element dict:
    docling_strategy_processor.py:1482-1510). ``slide_no`` mirrors the
    reference's separate slide counter for presentation sources — set to
    the slide index (== page_no) by the PPTX path, None elsewhere."""

    text: str
    label: str
    page_no: int
    bbox: BBox | None
    char_start: int
    char_end: int
    slide_no: int | None = None


@dataclass(frozen=True)
class TableRef:
    """Reference: TableMetadata headers-rule at
    docling_strategy_processor.py:1699-1726; CSV export at
    asset_storage_service.py:241-285. ``caption``/``bbox``/
    ``has_merged_cells`` complete the reference TableMetadata field set
    (lib/models/extraction_models.py:151-179): caption from the format's
    native caption construct (HTML <caption>; None where the format has
    none), bbox only where the source carries layout (the PDF grid
    detector), has_merged_cells from colspan/rowspan (HTML), gridSpan/
    vMerge (DOCX) or mergeCells (XLSX)."""

    table_id: str
    page_number: int
    num_rows: int
    num_cols: int
    headers: tuple[str, ...]
    cell_count: int
    csv: str | None
    caption: str | None = None
    bbox: BBox | None = None
    has_merged_cells: bool = False


@dataclass(frozen=True)
class FigureRef:
    """Reference: lib/models/extraction_models.py:54-64; the image
    metadata fields mirror FigureMetadata's image_format/image_size/file
    bytes (lib/models/extraction_models.py:121-148) — filled by the
    header probes (core/image_extract.py), None for figures whose pixel
    payload is not part of the document (e.g. HTML <img> references)."""

    figure_id: str
    page_number: int
    caption: str | None
    label: str
    image_format: str | None = None
    image_width: int | None = None
    image_height: int | None = None
    payload_bytes: int | None = None
    # reference FigureMetadata alt_text/bbox (extraction_models.py:135,
    # 121-148): alt_text from HTML <img alt=...>; caption is reserved for
    # a true caption construct (<figure><figcaption>); bbox only where
    # the source carries layout
    alt_text: str | None = None
    bbox: BBox | None = None


@dataclass
class PageResult:
    page_number: int
    content: str
    word_count: int
    elements: list[Element] = field(default_factory=list)
    tables: list[TableRef] = field(default_factory=list)
    figures: list[FigureRef] = field(default_factory=list)


@dataclass
class ExtractionResult:
    """Whole-document result; one per input row.

    ``status``/``error_type`` carry the hard/soft failure taxonomy
    (reference: docling_strategy_processor.py:527-544).
    """

    doc_type: str
    status: str = STATUS_SUCCESS
    error_type: str | None = None
    error_message: str | None = None
    pages: list[PageResult] = field(default_factory=list)

    @property
    def page_count(self) -> int:
        return len(self.pages)


def word_count(content: str) -> int:
    """Python whitespace-split word count — EXACT reference semantics
    (``len(content.split())``, docling_strategy_processor.py:1176)."""
    return len(content.split())


def normalize_ws(text: str) -> str:
    """Collapse whitespace runs to single spaces, strip ends.

    Python ``str.split()`` semantics (handles all Unicode whitespace the way
    the reference's word count does), so the normalized text and the word
    count always agree.
    """
    return " ".join(text.split())


def table_csv(rows: list[list[str]]) -> str | None:
    """CSV export matching pandas ``to_csv(index=False)`` framing: first
    row as header line, QUOTE_MINIMAL, '\\n' line terminator (reference:
    asset_storage_service.py:241-285). Rows are right-padded to the widest
    row. ONE shared implementation — the rule is pinned to the goldens for
    BOTH the PDF and HTML table paths."""
    import csv
    import io

    if not rows:
        return None
    ncols = max(len(r) for r in rows)
    buf = io.StringIO()
    writer = csv.writer(buf, lineterminator="\n")
    for row in rows:
        writer.writerow(row + [""] * (ncols - len(row)))
    return buf.getvalue()
