"""XLSX / PPTX / RTF extraction (office_extract rules 10-16, rtf_extract)."""

from __future__ import annotations

import pytest

from pdf_document_extractor_spark.core.dispatch import (
    extract_document,
    sniff_doc_type,
)
from pdf_document_extractor_spark.core.docx_write import write_pptx, write_xlsx
from pdf_document_extractor_spark.core.rtf_extract import (
    extract_rtf,
    rtf_to_text,
)
from pdf_document_extractor_spark.core.taxonomy import EmptyContentError


# -- XLSX -------------------------------------------------------------------


def test_xlsx_sheets_are_pages_with_tables():
    sheets = [
        [["k", "v"], ["lang", "en"], ["source", "src1"]],
        [["only one cell"]],
    ]
    r = extract_document("u", write_xlsx(sheets))
    assert (r.doc_type, r.status) == ("xlsx", "success")
    assert r.page_count == 2
    p1, p2 = r.pages
    assert p1.content == "k v\nlang en\nsource src1"
    assert p2.content == "only one cell"
    (t,) = p1.tables
    assert t.headers == ("k", "v")
    assert (t.num_rows, t.num_cols, t.cell_count) == (3, 2, 6)
    assert t.csv == "k,v\nlang,en\nsource,src1\n"
    assert t.page_number == 1
    # row elements carry exact spans into the page content
    for e in p1.elements:
        assert p1.content[e.char_start : e.char_end] == e.text


def test_xlsx_shared_string_dedup_and_determinism():
    sheets = [[["a", "a"], ["a", "b"]]]
    data = write_xlsx(sheets)
    assert data == write_xlsx(sheets)
    r = extract_document("u", data)
    assert r.pages[0].content == "a a\na b"


def test_xlsx_numeric_and_inline_cells():
    """Hand-built sheet exercising t='n' raw <v> and t='inlineStr'."""
    import io
    import zipfile

    wb = (
        '<workbook xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<Relationships><Relationship Id="rId1" Type="t" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    sheet = (
        "<worksheet><sheetData>"
        '<row r="1"><c r="A1"><v>42</v></c>'
        '<c r="B1" t="inlineStr"><is><t>inline text</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    r = extract_document("u", buf.getvalue())
    assert r.pages[0].content == "42 inline text"


# -- PPTX -------------------------------------------------------------------


def test_pptx_slides_are_pages():
    r = extract_document(
        "u", write_pptx([["title one", "bullet a"], ["slide two text"]])
    )
    assert (r.doc_type, r.status) == ("pptx", "success")
    assert r.page_count == 2
    assert r.pages[0].content == "title one\nbullet a"
    assert r.pages[1].content == "slide two text"
    assert [e.text for e in r.pages[0].elements] == ["title one", "bullet a"]


def test_pptx_empty_raises():
    with pytest.raises(EmptyContentError):
        from pdf_document_extractor_spark.core.office_extract import (
            extract_ooxml,
        )

        extract_ooxml(write_pptx([[]]), "h")


# -- RTF --------------------------------------------------------------------


def test_rtf_sniff_and_basic_text():
    raw = rb"{\rtf1\ansi\deff0 {\fonttbl{\f0 Arial;}}\f0 hello rtf world\par}"
    assert sniff_doc_type(raw) == "rtf"
    r = extract_document("u", raw)
    assert (r.doc_type, r.status) == ("rtf", "success")
    assert r.pages[0].content == "hello rtf world"


def test_rtf_escapes_and_breaks():
    raw = rb"{\rtf1\ansi caf\'e9 line one\par line two\line three\tab x}"
    assert rtf_to_text(raw).strip() == "café line one\nline two\nthree x"


def test_rtf_unicode_escape_with_fallback():
    # \u233? = é with ANSI fallback '?' (consumed per pinned rule 5)
    raw = rb"{\rtf1 caf\u233? au lait}"
    assert rtf_to_text(raw).strip() == "café au lait"


def test_rtf_starred_destination_and_literal_braces():
    raw = rb"{\rtf1 {\*\generator Word 2019;}keep \{this\} text}"
    assert rtf_to_text(raw).strip() == "keep {this} text"


def test_rtf_empty_raises():
    with pytest.raises(EmptyContentError):
        extract_rtf(rb"{\rtf1\ansi {\fonttbl{\f0 A;}}}", "h")


def test_xlsx_negative_shared_string_index_is_corrupt():
    """<v>-1</v> must be a classified failure — Python negative indexing
    would silently return the WRONG shared string."""
    import io
    import zipfile

    wb = (
        '<workbook xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        '<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<Relationships><Relationship Id="rId1" Type="t" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    sst = "<sst><si><t>first</t></si><si><t>last</t></si></sst>"
    sheet = (
        '<worksheet><sheetData><row r="1">'
        '<c r="A1" t="s"><v>-1</v></c></row></sheetData></worksheet>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/_rels/workbook.xml.rels", rels)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    r = extract_document("u", buf.getvalue())
    assert (r.status, r.error_type) == ("hard_failure", "CorruptedFileError")


def test_rtf_word_style_unicode_with_hex_fallback():
    """MS Word writes \\uN\\'hh — the hex escape is the ANSI fallback and
    must be swallowed, not emitted as a second character."""
    raw = rb"{\rtf1\ansi hello \u8364\'80 world\par}"
    assert rtf_to_text(raw).strip() == "hello € world"


def test_rtf_uc0_textedit_form():
    """Apple TextEdit emits \\uc0 (no fallback bytes): the character after
    \\uN is REAL content and must survive (the control word's trailing
    space is its delimiter, never content)."""
    raw = rb"{\rtf1\uc0\u8364?x y}"
    assert rtf_to_text(raw).strip() == "€?x y"


def test_rtf_uc_is_group_scoped():
    raw = rb"{\rtf1 {\uc0\u8364?a}\u8364?b}"
    # inner group: uc=0 -> '?a' kept; outer group: uc back to 1 -> '?' eaten
    assert rtf_to_text(raw).strip() == "€?a€b"


def test_docx_nested_table_rows_not_flattened():
    """A table inside a cell must not inflate the outer TableRef."""
    import io
    import zipfile

    from pdf_document_extractor_spark.core.docx_write import (
        _CONTENT_TYPES,
        _W_NS,
    )

    inner = (
        "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl>"
    )
    doc = (
        f'<w:document xmlns:w="{_W_NS}"><w:body>'
        "<w:p><w:r><w:t>body</w:t></w:r></w:p>"
        "<w:tbl>"
        "<w:tr><w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>h2</w:t></w:r></w:p></w:tc></w:tr>"
        f"<w:tr><w:tc>{inner}</w:tc>"
        "<w:tc><w:p><w:r><w:t>plain</w:t></w:r></w:p></w:tc></w:tr>"
        "</w:tbl></w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("word/document.xml", doc)
    r = extract_document("u", buf.getvalue())
    (t,) = r.pages[0].tables
    assert t.num_rows == 2  # inner table's row NOT counted as an outer row
    assert t.headers == ("h1", "h2")
    # inner text rides the containing cell exactly once
    assert t.csv == "h1,h2\ninner,plain\n"


def test_rtf_word_surrogate_pair_emoji():
    # Word emits astral chars as two \\uN escapes carrying a UTF-16
    # surrogate pair, each with a \\'3f ANSI fallback (ADVICE r2 high).
    raw = (b"{\\rtf1\\ansi a \\u-10179\\'3f\\u-8704\\'3f b}")
    text = rtf_to_text(raw).strip()
    assert text == "a 😀 b"
    text.encode("utf-8")  # must be Arrow/pandas-serializable


def test_rtf_lone_surrogates_become_replacement_char():
    # lone high, lone low, high-then-text, high-at-eof: all must map to
    # U+FFFD so Arrow serialization can never raise outside the taxonomy.
    cases = [
        (b"{\\rtf1\\ansi\\uc0 x\\u-10179 y}", "x�y"),
        (b"{\\rtf1\\ansi\\uc0 x\\u-8704 y}", "x�y"),
        (b"{\\rtf1\\ansi\\uc0 x\\u-10179\\par y}", "x�\ny"),
        (b"{\\rtf1\\ansi\\uc0 x\\u-10179}", "x�"),
    ]
    for raw, want in cases:
        got = rtf_to_text(raw).strip()
        assert got == want, (raw, got, want)
        got.encode("utf-8")


def test_rtf_surrogate_pair_extracts_through_taxonomy():
    raw = b"{\\rtf1\\ansi hi \\u-10179\\'3f\\u-8704\\'3f}"
    res = extract_rtf(raw, "0" * 16)
    assert res.pages[0].content == "hi 😀"
