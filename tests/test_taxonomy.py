"""Failure-taxonomy tests (reference semantics:
docling_strategy_processor.py:527-544 soft markers; hard = poison pill,
kafka_message_handler.py:126-161)."""

from __future__ import annotations

import pytest

from pdf_document_extractor_spark.core.dispatch import extract_document
from pdf_document_extractor_spark.core.taxonomy import (
    CorruptedFileError,
    classify_error,
    is_soft_failure,
)


@pytest.mark.parametrize(
    "msg",
    ["Read timeout", "operation TIMED OUT", "Connection reset by peer"],
)
def test_soft_markers(msg):
    assert is_soft_failure(RuntimeError(msg))
    status, etype, _ = classify_error(RuntimeError(msg))
    assert status == "soft_failure"
    assert etype == "TransientError"


def test_hard_default():
    """Unknown exception classes map to the CLOSED-set catch-all
    InternalError (the failure manifest keys on the closed error_type
    set at scale); the class name survives in the message."""
    status, etype, msg = classify_error(ValueError("bad value"))
    assert status == "hard_failure"
    assert etype == "InternalError"
    assert msg == "ValueError: bad value"


def test_typed_extraction_errors_keep_error_type():
    status, etype, _ = classify_error(CorruptedFileError("broken"))
    assert (status, etype) == ("hard_failure", "CorruptedFileError")


def test_soft_failure_propagates_out_of_extract_document(monkeypatch):
    """Soft failures must RAISE (Spark task retry path; reference: raise =>
    no Kafka commit => redelivery), never become rows."""
    from pdf_document_extractor_spark.core import dispatch

    def boom(data, uh, config=None):
        raise RuntimeError("connection refused by upstream")

    monkeypatch.setitem(dispatch.EXTRACTORS, "html", boom)
    with pytest.raises(RuntimeError, match="connection"):
        extract_document("u", b"<html><body><p>x</p></body></html>")


def test_hard_failure_becomes_row_not_exception():
    r = extract_document("u", b"%PDF-1.4 broken")
    assert r.status == "hard_failure"
    assert r.error_type == "CorruptedFileError"
    assert r.pages == []


def test_known_containers_get_typed_unsupported_failures():
    """D1/D3 parity: the reference's MIME table recognizes images/etc;
    we classify their magic bytes into named hard failures instead of
    letting them bleed into the HTML path."""
    from pdf_document_extractor_spark.core.dispatch import extract_document

    # postscript stays a NAMED unsupported container; gif and gzip became
    # supported formats in round 4 — their malformed shapes now classify
    # as typed corruption instead
    r = extract_document("u", b"%!PS-Adobe")
    assert r.status == "hard_failure"
    assert r.error_type == "UnsupportedFormatError"
    for payload, label in {
        b"GIF89a;;;": "truncated gif",
        b"\x1f\x8b\x08gz": "corrupt gzip",
    }.items():
        r = extract_document("u", payload)
        assert r.status == "hard_failure", label
        assert r.error_type == "CorruptedFileError", label
    # a PARTIAL OLE2 magic (4 of 8 bytes) matches no container rule and
    # falls through to the TXT binary-junk guard — still a typed row
    r = extract_document("u", b"\xd0\xcf\x11\xe0....")
    assert r.status == "hard_failure"
    assert r.error_type == "UnsupportedFormatError"
    assert r.doc_type == "txt"
    # PNG/JPEG route to the image extractor since round 3: truncated
    # payloads are CORRUPT (typed), not unsupported
    for payload, label in {
        b"\x89PNG\r\n\x1a\n....": "png",
        b"\xff\xd8\xff\xe0JFIF": "jpeg",
    }.items():
        r = extract_document("u", payload)
        assert r.status == "hard_failure", label
        assert r.error_type == "CorruptedFileError", label
        assert r.doc_type in ("png", "jpg"), label


def test_zip_containers_route_to_ooxml_extractor():
    """PK magic routes to the OOXML extractor: corrupt zips are
    CorruptedFileError; an empty workbook is an xlsx EmptyContentError;
    an unrecognized zip is a named UnsupportedFormatError."""
    import io
    import zipfile

    from pdf_document_extractor_spark.core.dispatch import extract_document
    from pdf_document_extractor_spark.core.docx_write import write_xlsx_stub

    r = extract_document("u", b"PK\x03\x04not-actually-a-zip")
    assert (r.status, r.doc_type, r.error_type) == (
        "hard_failure",
        "ooxml",
        "CorruptedFileError",
    )
    r = extract_document("u", write_xlsx_stub())
    assert (r.status, r.error_type) == ("hard_failure", "EmptyContentError")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.txt", "not ooxml")
    r = extract_document("u", buf.getvalue())
    assert (r.status, r.error_type) == (
        "hard_failure",
        "UnsupportedFormatError",
    )


def test_ole2_routes_to_cfb_parser():
    """OLE2 magic routes to the CFB doc/xls extractor since round 3; a
    payload with the magic but no valid container is a typed
    CorruptedFileError row (deep parsing in test_ole.py)."""
    from pdf_document_extractor_spark.core.dispatch import extract_document

    r = extract_document("u", b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1junk")
    assert (r.status, r.error_type) == (
        "hard_failure",
        "CorruptedFileError",
    )


def test_document_controlled_text_cannot_promote_hard_to_soft():
    """A typed hard failure whose MESSAGE contains a transient marker
    ('/Connection' stream filter in a crafted PDF) must stay hard — soft
    would retry a deterministic failure and abort the stage."""
    from pdf_document_extractor_spark.core.taxonomy import (
        UnsupportedFormatError,
        classify_error,
        is_soft_failure,
    )

    exc = UnsupportedFormatError("unsupported stream filter /Connection timeout")
    assert not is_soft_failure(exc)
    status, etype, _ = classify_error(exc)
    assert status == "hard_failure" and etype == "UnsupportedFormatError"
    # genuine transient errors still classify soft
    assert is_soft_failure(TimeoutError("connection timed out"))


def test_quarantine_soft_emits_row_instead_of_raising(monkeypatch):
    """P2 dead-letter step: the salvage pass commits soft failures as rows
    once task redelivery is exhausted; the normal pass still raises."""
    import pytest as _pytest

    from pdf_document_extractor_spark.operators import extract as ex

    def boom(url, data, config=None):
        raise TimeoutError("connection timed out fetching shard")

    monkeypatch.setattr(ex, "extract_document", boom)

    with _pytest.raises(TimeoutError):
        ex.extract_rows_py("u", b"<p>x</p>")

    rows = ex.extract_rows_py("u", b"<p>x</p>", quarantine_soft=True)
    assert len(rows) == 1
    assert rows[0]["status"] == "soft_failure"
    assert rows[0]["error_type"] == "TransientError"
    assert rows[0]["byte_count"] == len(b"<p>x</p>")

    # hard failures are NEVER swallowed by the quarantine flag path —
    # they come back as classified hard rows exactly as before
    monkeypatch.undo()
    rows = ex.extract_rows_py("u", b"%PDF-garbage", quarantine_soft=True)
    assert rows[0]["status"] == "hard_failure"
