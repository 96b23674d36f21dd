"""Extraction config — the reference's DoclingConfig surface
(src/models/docling_models.py:41-58) minus ML-only knobs, plus the
per-document-type tuning matrix (processing_config_manager.py:88-237).

One config per run, captured in the UDF closure (the Spark analog of the
reference's broadcast of per-MIME tuned configs). Structure flags gate
STRUCTURE outputs only; ``output_format`` selects the content renderer
(reference ``DoclingOutputFormatEnum``, docling_models.py:22-28) — the
default 'text' is the golden byte-identity surface, 'markdown' renders
the reference's ``"# Page {n}\\n\\n"`` template
(docling_strategy_processor.py:1282-1286), any other value falls through
to the reference's bare ``"\\n"``-join branch (:1293-1294).

Dropped knobs and why: ``enable_ocr`` (Docling ML path — no OCR engine in
scope; scanned PDFs whose pages draw only image XObjects emit the typed
``ScannedPdfNoTextError`` hard failure since round 4, so an OCR system
can consume the manifest), ``provider`` (no multi-backend).
"""

from __future__ import annotations

from dataclasses import dataclass, field

FORMAT_TEXT = "text"
FORMAT_MARKDOWN = "markdown"
# round-4: the remaining two members of the reference enum
# (DoclingOutputFormatEnum markdown/html/text/json,
# src/models/docling_models.py:22-28; export dispatch at
# docling_strategy_processor.py:1454-1465)
FORMAT_HTML = "html"
FORMAT_JSON = "json"


@dataclass(frozen=True)
class ExtractionConfig:
    # emit per-table structure (headers/dims/csv) — reference
    # enable_table_structure (docling_models.py:49)
    enable_table_structure: bool = True
    # emit figure refs — reference enable_figure_extraction (:50)
    enable_figure_extraction: bool = True
    # token-window chunking knobs — reference chunk_size/overlap_size
    # (:52-54); consumed by operators/chunking.py
    chunk_size: int = 20
    overlap_size: int = 5
    # content renderer (reference output_format, docling_models.py:47):
    # 'text' | 'markdown' | 'html' | 'json' (full reference enum);
    # anything else -> bare newline-join fallback
    output_format: str = FORMAT_TEXT

    def for_type(self, doc_type: str) -> "ExtractionConfig":
        """Uniform config: every doc_type gets this config."""
        return self


@dataclass(frozen=True)
class ConfigMatrix:
    """Per-document-type tuning (D4) — the reference keys tuned configs by
    MIME type (processing_config_manager.py:88-237); here by RESULT
    doc_type: 'pdf' | 'html' | 'txt' | 'rtf' | 'docx' | 'xlsx' | 'pptx'
    (never 'ooxml' — the container subtype is resolved inside
    extract_ooxml before any knob applies). Unlisted types fall back to
    ``default``. Duck-typed with ExtractionConfig via ``for_type``."""

    default: ExtractionConfig = ExtractionConfig()
    per_type: dict = field(default_factory=dict)

    def for_type(self, doc_type: str) -> ExtractionConfig:
        return self.per_type.get(doc_type, self.default)


DEFAULT_CONFIG = ExtractionConfig()
