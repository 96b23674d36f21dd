"""Hard/soft failure taxonomy.

Reimplements the reference's error-classification semantics
(docling_strategy_processor.py:527-544 and :991-1028): an error whose
lowercased message contains a transient-network marker is SOFT (retryable —
in the reference it raises so the Kafka offset is not committed and the
message is redelivered; in Spark a soft failure raises so the task retries
under ``spark.task.maxFailures``). Everything else is HARD (a poison pill —
committed as a failure row and never retried).
"""

from __future__ import annotations

# Substring markers for transient failures (reference:
# docling_strategy_processor.py:534-538 checks "timeout", "timed out",
# "connection").
_SOFT_MARKERS = ("timeout", "timed out", "connection")

# Well-known hard error types (reference classification at
# docling_strategy_processor.py:1010-1027 maps corrupt inputs to a
# corrupted-file error).
ERROR_CORRUPT = "CorruptedFileError"
ERROR_UNSUPPORTED = "UnsupportedFormatError"
ERROR_EMPTY = "EmptyContentError"
ERROR_VALIDATION = "ValidationError"
ERROR_OVERSIZE = "OversizeDocumentError"
ERROR_SCANNED = "ScannedPdfNoTextError"
ERROR_INTERNAL = "InternalError"


class ExtractionError(Exception):
    """Base for typed hard failures raised by the extraction core."""

    error_type = ERROR_INTERNAL


class CorruptedFileError(ExtractionError):
    error_type = ERROR_CORRUPT


class UnsupportedFormatError(ExtractionError):
    error_type = ERROR_UNSUPPORTED


class EmptyContentError(ExtractionError):
    error_type = ERROR_EMPTY


class OversizeDocumentError(ExtractionError):
    error_type = ERROR_OVERSIZE


class ScannedPdfNoTextError(ExtractionError):
    """A PDF whose pages draw only image XObjects and no text operators —
    the scanned-document shape. The reference runs Docling OCR on these
    (``enable_ocr``, src/models/docling_models.py:48; per-type tuning
    src/services/processing_config_manager.py:88-237); OCR is out of scope
    here (no ML), so the failure mode is FIRST-CLASS instead of a generic
    EmptyContentError — downstream consumers can route these rows to an
    OCR system."""

    error_type = ERROR_SCANNED


def is_soft_failure(exc: BaseException) -> bool:
    """True iff the error is transient and must be retried (reference:
    docling_strategy_processor.py:534-538).

    Typed ``ExtractionError``s are NEVER soft: their messages embed
    document-controlled text (stream filter names, parse context), so a
    crafted/garbage document containing e.g. '/Connection' must not be
    promoted into a retry — a deterministic failure that retries exhausts
    spark.task.maxFailures and aborts the whole stage on one poison doc.
    """
    if isinstance(exc, ExtractionError):
        return False
    msg = str(exc).lower()
    return any(marker in msg for marker in _SOFT_MARKERS)


def classify_error(exc: BaseException) -> tuple[str, str, str]:
    """Return ``(status, error_type, error_message)`` for an exception.

    status is ``soft_failure`` for transient errors, else ``hard_failure``.
    Typed hard failures are classified FIRST (see is_soft_failure).
    """
    from .model import STATUS_HARD_FAILURE, STATUS_SOFT_FAILURE

    if isinstance(exc, ExtractionError):
        return STATUS_HARD_FAILURE, exc.error_type, str(exc)
    if is_soft_failure(exc):
        return STATUS_SOFT_FAILURE, "TransientError", str(exc)
    # an exception CLASS outside the taxonomy is an extractor bug that
    # escaped classification: at 10^12 docs the failure manifest keys on
    # the CLOSED error_type set (retry policy, failure dashboards), so
    # record the catch-all InternalError and keep the class name in the
    # message for debugging. The mutation fuzz treats any InternalError
    # row as a test failure, so leaks stay loud in CI (round 5).
    return (
        STATUS_HARD_FAILURE,
        ERROR_INTERNAL,
        f"{type(exc).__name__}: {exc}",
    )
