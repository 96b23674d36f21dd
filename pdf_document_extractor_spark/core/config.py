"""Extraction config — the reference's DoclingConfig surface
(src/models/docling_models.py:41-58) minus ML-only knobs.

One config per run, captured in the UDF closure (the Spark analog of the
reference's broadcast of per-MIME tuned configs,
processing_config_manager.py:88-237). Flags gate STRUCTURE outputs only —
``content`` bytes are invariant under every flag combination, so the
golden byte-identity surface never depends on config.

Dropped knobs and why: ``enable_ocr`` (Docling ML path — no OCR engine in
scope; scanned PDFs without text operators become EmptyContentError hard
failures, mirroring the taxonomy), ``provider`` (no multi-backend),
``output_format`` markdown/html/json variants (text is the byte-identity
target; the others are renderers over the same elements).
"""

from __future__ import annotations

from dataclasses import dataclass


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


DEFAULT_CONFIG = ExtractionConfig()
