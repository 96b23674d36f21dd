"""PDF 1.5+ structure: cross-reference streams, object streams, PNG/TIFF
predictors, hybrid-reference files, incremental updates (/Prev chains).

The invariant: every modern-structure serialization of the same page specs
extracts byte-identically to the classic PDF 1.4 serialization — document
STRUCTURE is transport, extraction semantics are pinned elsewhere.
"""

from __future__ import annotations

import re
import zlib

import pytest

from pdf_document_extractor_spark.core.pdf_extract import (
    _unpredict,
    extract_pdf,
)
from pdf_document_extractor_spark.core.pdf_write import (
    PdfPageSpec,
    TextShow,
    append_incremental,
    content_stream_obj,
    write_pdf,
    write_pdf_15,
)
from pdf_document_extractor_spark.core.taxonomy import CorruptedFileError

PAGES = [
    PdfPageSpec(shows=[TextShow(72.0, 720.0, 10.0, "hello world one two")]),
    PdfPageSpec(
        shows=[
            TextShow(72.0, 720.0, 18.0, "Header Line"),
            TextShow(72.0, 692.0, 10.0, "body line follows"),
        ]
    ),
]


def _snapshot(result):
    return [
        (
            p.page_number,
            p.content,
            p.word_count,
            [(e.text, e.label, e.char_start, e.char_end) for e in p.elements],
        )
        for p in result.pages
    ]


@pytest.mark.parametrize(
    "kwargs",
    [
        {"compress": True, "predictor": False},
        {"compress": True, "predictor": True},
        {"compress": False, "predictor": False},
    ],
    ids=["flate", "flate+pred12", "raw-content"],
)
def test_xref_stream_matches_classic(kwargs):
    classic = _snapshot(extract_pdf(write_pdf(PAGES), "h"))
    modern = _snapshot(extract_pdf(write_pdf_15(PAGES, **kwargs), "h"))
    assert modern == classic


def test_incremental_update_overrides_content():
    base = write_pdf(PAGES)
    new_cs = content_stream_obj(
        PdfPageSpec(shows=[TextShow(72.0, 720.0, 10.0, "patched text")])
    )
    # two pages: content streams are objects 6 and 7 (pdf_write numbering)
    inc = extract_pdf(append_incremental(base, {6: new_cs}), "h")
    assert inc.pages[0].content == "Page 1\n\npatched text\n"
    assert inc.pages[1].content == extract_pdf(base, "h").pages[1].content


def test_incremental_over_xref_stream_base():
    base = write_pdf_15(PAGES)
    new_cs = content_stream_obj(
        PdfPageSpec(shows=[TextShow(72.0, 720.0, 10.0, "patched text")]),
        compress=True,
    )
    inc = extract_pdf(append_incremental(base, {6: new_cs}), "h")
    assert inc.pages[0].content == "Page 1\n\npatched text\n"


def test_chained_incremental_updates_newest_wins():
    doc = write_pdf(PAGES)
    for i in range(3):
        doc = append_incremental(
            doc,
            {
                6: content_stream_obj(
                    PdfPageSpec(
                        shows=[TextShow(72.0, 720.0, 10.0, f"rev {i}")]
                    )
                )
            },
        )
    assert extract_pdf(doc, "h").pages[0].content == "Page 1\n\nrev 2\n"


def test_free_tombstone_shadows_older_offset():
    """The xref layer honors the tombstone (object 1 deleted), and the
    reader-repair fallback then SALVAGES the still-present catalog bytes
    (round 4): crawl-first behavior — a deliberate delete whose bytes
    remain recoverable extracts rather than hard-fails. When the catalog
    bytes are genuinely gone, the document stays typed-corrupt."""
    doc = append_incremental(write_pdf(PAGES), {1: None})  # delete catalog
    assert extract_pdf(doc, "h").status == "success"  # repair salvages

    # scrub the catalog object bytes too: nothing left to salvage
    gone = bytearray(doc)
    start = gone.find(b"1 0 obj")
    end = gone.find(b"endobj", start) + len(b"endobj")
    gone[start:end] = b" " * (end - start)
    with pytest.raises(CorruptedFileError):
        extract_pdf(bytes(gone), "h")


def test_hybrid_xrefstm_pointer():
    """Classic trailer with /XRefStm: entries come from the parallel xref
    stream (the PDF 1.5 hybrid-reference layout for legacy viewers)."""
    base = write_pdf_15(PAGES)
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", base[-2048:]):
        pass
    xref_stream_pos = int(m.group(1))
    hybrid = bytearray(base)
    table_pos = len(hybrid)
    hybrid += (
        f"xref\ntrailer\n<< /Size 10 /Root 1 0 R /XRefStm "
        f"{xref_stream_pos} >>\nstartxref\n{table_pos}\n%%EOF\n"
    ).encode()
    assert _snapshot(extract_pdf(bytes(hybrid), "h")) == _snapshot(
        extract_pdf(base, "h")
    )


def test_prev_cycle_raises():
    base = write_pdf(PAGES)
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", base[-2048:]):
        pass
    pos = len(base)
    doc = base + (
        f"xref\ntrailer\n<< /Size 10 /Root 1 0 R /Prev {pos} >>\n"
        f"startxref\n{pos}\n%%EOF\n"
    ).encode()
    # the xref layer detects the /Prev cycle (typed), and since round 4
    # the reader-repair fallback salvages the intact objects
    with pytest.raises(CorruptedFileError):
        from pdf_document_extractor_spark.core.pdf_extract import _parse_xref

        _parse_xref(doc)
    assert extract_pdf(doc, "h").status == "success"


def test_corrupt_xref_stream_taxonomy():
    base = write_pdf_15(PAGES)
    # truncate the xref stream payload -> flate error -> CorruptedFileError
    broken = base[:-200] + base[-40:]
    with pytest.raises(CorruptedFileError):
        extract_pdf(broken, "h")


# --------------------------------------------------------------------------
# Predictor decode unit tests (all PNG row filters + TIFF)
# --------------------------------------------------------------------------

ROWS = [bytes([10, 20, 30, 40]), bytes([15, 25, 35, 45]), bytes([5, 0, 255, 7])]


def _png_filter(rows: list[bytes], ftype: int, bpp: int = 1) -> bytes:
    out = bytearray()
    prev = bytes(len(rows[0]))
    for row in rows:
        out.append(ftype)
        for i, v in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                out.append(v)
            elif ftype == 1:
                out.append((v - a) & 0xFF)
            elif ftype == 2:
                out.append((v - b) & 0xFF)
            elif ftype == 3:
                out.append((v - ((a + b) >> 1)) & 0xFF)
            elif ftype == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((v - pr) & 0xFF)
        prev = row
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_predictor_roundtrip(ftype):
    parms = {"Predictor": 12, "Columns": 4}
    got = _unpredict(_png_filter(ROWS, ftype), parms)
    assert got == b"".join(ROWS)


def test_tiff_predictor():
    original = bytes([10, 20, 30, 40, 100, 90, 80, 70])
    filtered = bytearray()
    for r0 in range(0, len(original), 4):
        row = original[r0 : r0 + 4]
        filtered.append(row[0])
        for i in range(1, 4):
            filtered.append((row[i] - row[i - 1]) & 0xFF)
    got = _unpredict(bytes(filtered), {"Predictor": 2, "Columns": 4})
    assert got == original


def test_bad_png_row_filter_raises():
    data = bytes([9]) + bytes(4)  # filter byte 9 is invalid
    with pytest.raises(CorruptedFileError):
        _unpredict(data, {"Predictor": 12, "Columns": 4})


def test_objstm_stream_roundtrip_is_flate():
    """write_pdf_15 really packs objects in a Flate ObjStm (layout guard)."""
    data = write_pdf_15(PAGES)
    m = re.search(rb"/Type /ObjStm /N (\d+) /First (\d+)", data)
    assert m and int(m.group(1)) == 5  # catalog+pages+font+2 page dicts
    # and the doc still declares PDF 1.5
    assert data.startswith(b"%PDF-1.5")
    # sanity: flate payload decompresses
    s = re.search(rb"stream\n", data[m.start() :])
    start = m.start() + s.end()
    zlib.decompress(data[start : start + 10_000])


def test_flate_bomb_guard(monkeypatch):
    """A stream inflating past the cap must raise OversizeDocumentError
    (classified), not materialize gigabytes."""
    from pdf_document_extractor_spark.core import pdf_extract as pe
    from pdf_document_extractor_spark.core.taxonomy import (
        OversizeDocumentError,
    )

    monkeypatch.setattr(pe, "MAX_DECODED_STREAM", 1024)
    payload = zlib.compress(b"A" * 10_000)
    stream = pe._Stream({"Filter": "FlateDecode"}, payload)
    with pytest.raises(OversizeDocumentError):
        stream.decoded()
    # under the cap: decodes fine
    monkeypatch.setattr(pe, "MAX_DECODED_STREAM", 1 << 20)
    assert stream.decoded() == b"A" * 10_000


def test_objstm_inside_objstm_is_corrupt():
    """Spec-invalid self-nested object streams must fail classified, not
    recurse."""
    from pdf_document_extractor_spark.core.pdf_extract import _Objects
    from pdf_document_extractor_spark.core.taxonomy import (
        CorruptedFileError,
    )

    objs = _Objects(b"", {7: ("objstm", 7, 0), 1: ("objstm", 7, 1)})
    with pytest.raises(CorruptedFileError, match="inside an object stream"):
        objs.get(1)


def test_show_event_bomb_guard(monkeypatch):
    from pdf_document_extractor_spark.core import pdf_extract as pe
    from pdf_document_extractor_spark.core.taxonomy import (
        OversizeDocumentError,
    )

    monkeypatch.setattr(pe, "MAX_SHOWS_PER_PAGE", 10)
    many = PdfPageSpec(
        shows=[TextShow(72.0, 720.0 - i, 10.0, "x") for i in range(11)]
    )
    with pytest.raises(OversizeDocumentError):
        extract_pdf(write_pdf([many]), "h")
    ok = PdfPageSpec(
        shows=[TextShow(72.0, 720.0 - i, 10.0, "x") for i in range(10)]
    )
    assert extract_pdf(write_pdf([ok]), "h").pages[0].word_count > 0


def test_hybrid_free_tombstones_resolve_through_xrefstm():
    """Real hybrid-reference PDFs mark ObjStm-packed objects FREE in the
    classic table (hiding them from pre-1.5 readers, PDF 32000 7.5.8.4);
    the parallel /XRefStm must fill those tombstones."""
    base = write_pdf_15(PAGES)
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", base[-2048:]):
        pass
    xref_stream_pos = int(m.group(1))
    hybrid = bytearray(base)
    table_pos = len(hybrid)
    # classic section marking the packed objects (1..5) FREE — the
    # standard Acrobat hybrid-save shape
    hybrid += b"xref\n1 5\n" + b"0000000000 65535 f \n" * 5
    hybrid += (
        f"trailer\n<< /Size 10 /Root 1 0 R /XRefStm "
        f"{xref_stream_pos} >>\nstartxref\n{table_pos}\n%%EOF\n"
    ).encode()
    assert _snapshot(extract_pdf(bytes(hybrid), "h")) == _snapshot(
        extract_pdf(base, "h")
    )


def test_truncated_flate_stream_is_corrupt_not_partial():
    """A truncated FlateDecode stream must raise (hard-failure row), never
    return partial text that would commit as success."""
    import zlib as _zlib

    from pdf_document_extractor_spark.core.pdf_extract import _Stream

    payload = _zlib.compress(b"A" * 5000)
    broken = _Stream({"Filter": "FlateDecode"}, payload[:-10])
    with pytest.raises(CorruptedFileError, match="truncated"):
        broken.decoded()


def test_page_cumulative_stream_cap(monkeypatch):
    """The flate cap is per stream; the page total gets the same ceiling
    (a /Contents array of many at-cap streams must not accumulate)."""
    from pdf_document_extractor_spark.core import pdf_extract as pe
    from pdf_document_extractor_spark.core.taxonomy import (
        OversizeDocumentError,
    )

    body = PdfPageSpec(
        shows=[TextShow(72.0, 720.0, 10.0, "word " * 40)]
    )
    pdf = write_pdf([body])
    monkeypatch.setattr(pe, "MAX_DECODED_STREAM", 50)
    with pytest.raises(OversizeDocumentError, match="combined"):
        extract_pdf(pdf, "h")


def test_tiff_predictor_partial_row_raises():
    import pytest as _pytest

    from pdf_document_extractor_spark.core.pdf_extract import _unpredict
    from pdf_document_extractor_spark.core.taxonomy import CorruptedFileError

    parms = {"Predictor": 2, "Columns": 4, "Colors": 1}
    assert _unpredict(bytes(8), parms) == bytes(8)  # whole rows ok
    with _pytest.raises(CorruptedFileError, match="whole number of rows"):
        _unpredict(bytes(7), parms)  # trailing partial row
