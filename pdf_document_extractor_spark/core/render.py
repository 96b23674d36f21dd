"""Doc-type-agnostic output renderers (M4 completion for non-PDF types).

The reference exports ANY converted document in the configured output
format (``DoclingOutputFormatEnum``, src/models/docling_models.py:22-28;
dispatch at docling_strategy_processor.py:1454-1465 — the document model
is format-independent). The PDF extractor renders in-extractor because it
can interleave tables positionally (core/pdf_extract.py); every other
doc_type goes through these generic renderers over the page's element
stream + table refs, applied post-extraction (core/dispatch.py).

PINNED SEMANTICS (golden surface for output_format='html'/'json' on
non-PDF types):

html:
 1. One markup line per element in stream order: label 'header' ->
    ``<h1>``, anything else -> ``<p>``; text escaped with
    ``html.escape(quote=False)``.
 2. Then one ``<table>`` per TableRef in table order: ``<tr><td>`` cells
    reconstructed from the pinned CSV export (csv.reader round-trip of
    model.table_csv — exact by construction). Non-PDF extractors don't
    carry table positions, so tables append after the text stream.
 3. Lines joined with '\\n'.

json:
 4. Canonical sorted-key compact dump, identical knobs and keys to the
    PDF renderer (core/pdf_extract._render_json_page): elements carry
    exactly char_end/char_start/label/page_no/text; float/optional
    fields excluded for byte-stability.

Both formats recompute ``word_count`` from the rendered content (M13
invariant: word_count == len(content.split()) always holds).
"""

from __future__ import annotations

import csv
import html
import io
import json

from .model import LABEL_HEADER, PageResult, word_count


def esc_html(s: str) -> str:
    """The ONE pinned escape rule for both renderers (PDF in-extractor
    and generic): stdlib escape, quotes excluded — no attributes are ever
    emitted."""
    return html.escape(s, quote=False)


def _csv_rows(text: str) -> list[list[str]]:
    """Inverse of model.table_csv. csv.reader enforces the module-global
    field_size_limit (128 KiB default) — a crawl table cell can exceed it
    and table_csv wrote it without limit, so raise the limit around the
    read (Spark Python workers are single-threaded; restored either way)
    rather than let the html format hard-fail a document the text format
    extracts fine."""
    old = csv.field_size_limit(1 << 30)
    try:
        return list(csv.reader(io.StringIO(text)))
    finally:
        csv.field_size_limit(old)


def render_page_html(page: PageResult) -> str:
    """Pinned rules 1-3."""
    out: list[str] = []
    for e in page.elements:
        tag = "h1" if e.label == LABEL_HEADER else "p"
        out.append(f"<{tag}>{esc_html(e.text)}</{tag}>")
    for t in page.tables:
        rows = _csv_rows(t.csv) if t.csv else []
        body = "".join(
            "<tr>"
            + "".join(f"<td>{esc_html(c)}</td>" for c in row)
            + "</tr>"
            for row in rows
        )
        out.append(f"<table>{body}</table>")
    return "\n".join(out)


def elements_json(page_number: int, elements) -> str:
    """The ONE canonical json dump (pinned rule 4) — shared by the PDF
    in-extractor renderer and the generic path so the two can never
    drift."""
    obj = {
        "elements": [
            {
                "char_end": e.char_end,
                "char_start": e.char_start,
                "label": e.label,
                "page_no": e.page_no,
                "text": e.text,
            }
            for e in elements
        ],
        "page_number": page_number,
    }
    return json.dumps(obj, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def render_page_json(page: PageResult) -> str:
    return elements_json(page.page_number, page.elements)


def rerender_pages(result, output_format: str) -> None:
    """Apply the html/json renderer in place to a SUCCESS result's pages
    (non-PDF path; PDF renders in-extractor). Element spans keep indexing
    the original text layer — the reference's charspans likewise index
    the document model, not the export."""
    if output_format == "html":
        render = render_page_html
    elif output_format == "json":
        render = render_page_json
    else:
        return
    for page in result.pages:
        page.content = render(page)
        page.word_count = word_count(page.content)
