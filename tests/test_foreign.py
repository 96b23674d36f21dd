"""Foreign-producer corpus differential (round-4 verdict task 3).

Every parser test before this module round-tripped against the repo's
own writers. These fixtures mimic OTHER encoders' byte dialects
(fixtures/foreign.py); the invariant per file is
*typed-degrade-never-silently-wrong*: a foreign document either
extracts the exact expected text, or fails with a TYPED error — never a
success row carrying garbage.
"""

from __future__ import annotations

import pytest

from pdf_document_extractor_spark.core.dispatch import extract_document
from pdf_document_extractor_spark.fixtures.foreign import (
    foreign_pdf_gbk,
    foreign_pdf_ghostscript,
    foreign_xls_biff5,
)

TEXT = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def test_ghostscript_type1_standard_encoding_extracts_exact_text():
    """No /Encoding on a base-14 Type1 font = builtin StandardEncoding;
    over printable ASCII that coincides with the latin-1 default, so the
    foreign document must extract byte-identically — through content-
    first object order, octal-escaped literals, TL/' next-line shows and
    CRLF xref entries."""
    r = extract_document("u", foreign_pdf_ghostscript(TEXT))
    assert r.status == "success" and r.doc_type == "pdf"
    assert r.pages[0].content == (
        "Page 1\n\nalpha bravo charlie delta echo\n"
        "foxtrot golf hotel india juliet\n"
    )
    # both lines are 10pt -> body labels, never headers
    assert {e.label for e in r.pages[0].elements} == {"body"}


def test_explicit_standard_encoding_name_matches_builtin():
    """Many producers write /Encoding /StandardEncoding explicitly where
    others omit it; both spell the Type1 builtin and must extract the
    same text."""
    implicit = foreign_pdf_ghostscript(TEXT)
    explicit = implicit.replace(
        b"/BaseFont /Times-Roman",
        b"/BaseFont /Times-Roman /Encoding /StandardEncoding",
    )
    # same content stream offset math no longer holds -> only compare
    # through a full reparse of the regenerated xref... the explicit
    # variant's xref offsets are stale, exercising the repair path too
    r = extract_document("u", explicit)
    assert r.status == "success"
    assert r.pages[0].content == (
        "Page 1\n\nalpha bravo charlie delta echo\n"
        "foxtrot golf hotel india juliet\n"
    )


def test_gbk_euc_predefined_cmap_degrades_typed_not_garbage():
    """/GBK-EUC-H with no /ToUnicode: the 2-byte codes have no shipped
    tables. Decoding them latin-1 per byte would emit silent mojibake as
    a success row — the required outcome is the typed degrade."""
    r = extract_document("u", foreign_pdf_gbk(TEXT))
    assert r.status == "hard_failure"
    assert r.error_type == "UnsupportedFormatError"
    assert "GBK-EUC-H" in (r.error_message or "")
    assert not r.pages  # no partial garbage pages


def test_predefined_cmap_with_tounicode_still_decodes():
    """A named CMap WITH /ToUnicode keys the same character codes — the
    existing decode-through-ToUnicode path must keep working (only the
    no-ToUnicode case degrades)."""
    from pdf_document_extractor_spark.core.pdf_write import (
        PdfPageSpec,
        TextShow,
        write_pdf_cid,
    )

    doc = write_pdf_cid(
        [PdfPageSpec(shows=[TextShow(72.0, 720.0, 10.0, "mapped text")])]
    )
    assert b"Identity-H" in doc
    foreign = doc.replace(b"/Identity-H", b"/UniGB-UCS2-H")
    r = extract_document("u", foreign)
    assert r.status == "success"
    assert "mapped text" in r.pages[0].content


def test_biff5_workbook_hits_typed_version_gate():
    """Excel 5.0/95 BIFF5 'Book' stream: BOUNDSHEET/LABEL records lack
    the BIFF8 Unicode flags byte — parsing as BIFF8 yields garbage cells
    in a success row. Must degrade typed at the BOF version gate."""
    r = extract_document("u", foreign_xls_biff5(["cell a", "cell b"]))
    assert r.status == "hard_failure"
    assert r.doc_type == "ole2"
    assert r.error_type == "UnsupportedFormatError"
    assert "0x0500" in (r.error_message or "")


def test_biff2_bof_rid_is_typed_too():
    """Ancient BIFF2 (rid 0x0009) BOF: same typed-degrade requirement."""
    import struct

    from pdf_document_extractor_spark.core.cfb import write_cfb

    stream = struct.pack("<HH", 0x0009, 4) + struct.pack("<HH", 0x0002, 0x0010)
    r = extract_document("u", write_cfb([("Book", stream)]))
    assert r.status == "hard_failure"
    assert r.error_type == "UnsupportedFormatError"


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_foreign_mode_rows_match_gate_expectations(k):
    """The pdf_foreign synthesis mode emits exactly the rows the
    extract_pdf_foreign oracle predicts (per-file unit version of the
    gate query): k=0 Ghostscript dialect and k=3 W[0 2 1] xref-stream
    dialect both extract exact text; k=1 GBK CMap and k=2 BIFF5 degrade
    typed."""
    from pdf_document_extractor_spark.operators.extract import extract_rows_py
    from pdf_document_extractor_spark.sources.pages import synth_payload

    doc_id = 40 + k
    url = f"https://synth.example/pdf_foreign/{doc_id}"
    rows = extract_rows_py(url, synth_payload(doc_id, TEXT, "pdf_foreign"))
    assert len(rows) == 1
    row = rows[0]
    if k in (0, 3):
        assert row["status"] == "success" and row["doc_type"] == "pdf"
        assert row["content"].startswith("Page 1\n\nalpha bravo")
        assert row["word_count"] == 12
    else:
        assert row["status"] == "hard_failure"
        assert row["error_type"] == "UnsupportedFormatError"
        assert row["doc_type"] == ("pdf" if k == 1 else "ole2")
        assert row["content"] == ""


def test_word_exported_html_strips_mso_junk():
    """Word's 'Save as Web Page' dialect (mso conditional comments,
    o:p tags, MsoNormal styles, windows-1252 meta) must extract the
    SAME content as the equivalent plain HTML — differential, so the
    invariant holds whatever the plain-HTML semantics are."""
    plain = (
        b"<html><body><p>alpha bravo charlie delta echo</p>"
        b"<p>foxtrot golf hotel india juliet</p></body></html>"
    )
    word = b"""<html xmlns:o="urn:schemas-microsoft-com:office:office"
 xmlns:w="urn:schemas-microsoft-com:office:word">
<head>
<meta http-equiv=Content-Type content="text/html; charset=windows-1252">
<!--[if gte mso 9]><xml><w:WordDocument><w:View>Print</w:View>
</w:WordDocument></xml><![endif]-->
<style><!-- p.MsoNormal {margin:0in; font-family:"Calibri"} --></style>
</head>
<body lang=EN-US style='tab-interval:.5in'>
<div class=WordSection1>
<p class=MsoNormal>alpha bravo charlie delta echo<o:p></o:p></p>
<p class=MsoNormal>foxtrot golf hotel india juliet<o:p></o:p></p>
</div>
</body>
</html>"""
    r_plain = extract_document("u", plain)
    r_word = extract_document("u", word)
    assert r_plain.status == r_word.status == "success"
    assert r_word.pages[0].content == r_plain.pages[0].content
    assert "mso" not in r_word.pages[0].content
    assert "Print" not in r_word.pages[0].content  # the xml island


def test_libreoffice_flavored_docx_extracts():
    """LibreOffice-style package: [Content_Types].xml NOT first in the
    zip, extra parts, single-quoted XML attrs, w14/rsid attributes,
    empty rPr, xml:space='preserve'. Must extract the paragraph text."""
    import io
    import zipfile

    doc_xml = (
        "<?xml version='1.0' encoding='UTF-8' standalone='yes'?>\n"
        "<w:document xmlns:w='http://schemas.openxmlformats.org/"
        "wordprocessingml/2006/main' xmlns:w14='http://schemas.microsoft"
        ".com/office/word/2010/wordml'>\n"
        "<w:body><w:p w14:paraId='00000001' w:rsidR='00AB12CD'><w:pPr>"
        "<w:pStyle w:val='Standard'/></w:pPr><w:r><w:rPr></w:rPr>"
        "<w:t xml:space='preserve'>alpha bravo charlie</w:t></w:r></w:p>\n"
        "<w:p><w:r><w:t>delta echo foxtrot</w:t></w:r></w:p>\n"
        "<w:sectPr><w:pgSz w:w='11906' w:h='16838'/></w:sectPr>"
        "</w:body></w:document>"
    )
    ct = (
        "<?xml version='1.0' encoding='UTF-8'?>\n"
        "<Types xmlns='http://schemas.openxmlformats.org/package/2006/"
        "content-types'><Default Extension='xml' ContentType="
        "'application/xml'/><Override PartName='/word/document.xml' "
        "ContentType='application/vnd.openxmlformats-officedocument."
        "wordprocessingml.document.main+xml'/></Types>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("word/document.xml", doc_xml)
        z.writestr("meta.xml", "<meta/>")
        z.writestr("word/settings.xml", "<w:settings/>")
        z.writestr("[Content_Types].xml", ct)
    r = extract_document("u", buf.getvalue())
    assert r.status == "success" and r.doc_type == "docx"
    assert r.pages[0].content == "alpha bravo charlie\ndelta echo foxtrot"


def test_foreign_xrefstream_w021_multi_index():
    """PDF 1.5 xref stream with /W [0 2 1] (defaulted type field),
    multi-subsection /Index and uncompressed entries — a pdflatex-family
    shape our own 1.5 writer (W [1 4 2], Flate+predictor) never emits.
    Must extract the same two lines as the Ghostscript fixture."""
    from pdf_document_extractor_spark.fixtures.foreign import (
        foreign_pdf_xrefstream_w021,
    )

    r = extract_document("u", foreign_pdf_xrefstream_w021(TEXT))
    assert r.status == "success" and r.doc_type == "pdf"
    assert r.pages[0].content == (
        "Page 1\n\nalpha bravo charlie delta echo\n"
        "foxtrot golf hotel india juliet\n"
    )
