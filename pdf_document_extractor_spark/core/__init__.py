"""Pure-Python extraction core. ZERO Spark imports by design.

These functions are simultaneously:
  1. the body of the Arrow-batched Spark UDF (operators/extract.py), and
  2. the pytest oracle for the byte-identical golden fixtures,
so the north-rule invariant (byte-identical extracted text per url) holds by
construction rather than by testing luck.
"""

from .model import (
    BBox,
    Element,
    ExtractionResult,
    FigureRef,
    PageResult,
    TableRef,
)
from .dispatch import sniff_doc_type, extract_document
from .taxonomy import classify_error

__all__ = [
    "BBox",
    "Element",
    "ExtractionResult",
    "FigureRef",
    "PageResult",
    "TableRef",
    "sniff_doc_type",
    "extract_document",
    "classify_error",
]
