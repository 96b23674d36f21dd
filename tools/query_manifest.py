"""Query -> implementation-files manifest (round-4 verdict task 2).

``tests/test_staleness.py`` uses this to make the verification-window
policy CHURN-AWARE: a registry query whose implementation files changed
since the commit of its last green CORRECTNESS round must rotate into
the next round's ``queries()[:50]`` window — rotation age alone let the
round-4 EXTRACTED_SCHEMA widening ship with six of its consumers
unverified.

Granularity: each entry lists the files whose edit plausibly changes
the query's RESULT — the shared extract substrate plus the per-format
core parser(s)/writer(s) it exercises. ``__spark_entry__.py`` itself is
deliberately EXCLUDED: it changes every round (registry rotation) and
its query/oracle pairs are what the driver's window directly validates.

A pytest asserts every registry query has an entry, so adding a query
without extending this manifest fails the suite.
"""

from __future__ import annotations

PKG = "pdf_document_extractor_spark"

# shared substrate of every extract_* gate query: the Spark operator,
# dispatch/sniff, taxonomy, result model, config resolution, and the
# pinned synthesis templates
EXTRACT_COMMON = [
    f"{PKG}/operators/extract.py",
    f"{PKG}/core/dispatch.py",
    f"{PKG}/core/taxonomy.py",
    f"{PKG}/core/model.py",
    f"{PKG}/core/config.py",
    f"{PKG}/sources/pages.py",
]

_PDF = [f"{PKG}/core/pdf_extract.py", f"{PKG}/core/pdf_write.py"]
_CRYPT = [f"{PKG}/core/pdf_crypt.py"]
_HTML = [f"{PKG}/core/html_extract.py"]
_OOXML = [f"{PKG}/core/office_extract.py", f"{PKG}/core/docx_write.py"]
_OLE = [
    f"{PKG}/core/ole_extract.py",
    f"{PKG}/core/ole_write.py",
    f"{PKG}/core/cfb.py",
]
_RENDER = [f"{PKG}/core/render.py"]
_IMAGE = [f"{PKG}/core/image_extract.py"]

_ALL_FORMATS = _PDF + _CRYPT + _HTML + _OOXML + _OLE + _IMAGE + [
    f"{PKG}/core/rtf_extract.py",
    f"{PKG}/core/odf_extract.py",
    f"{PKG}/core/epub_extract.py",
]


def _x(*extra: list[str] | str) -> list[str]:
    out = list(EXTRACT_COMMON)
    for e in extra:
        out.extend([e] if isinstance(e, str) else e)
    return sorted(set(out))


MANIFEST: dict[str, list[str]] = {
    # -- mixed-corpus / pipeline-shaped extract queries ---------------------
    "extract_dispatch_mixed": _x(_PDF, _HTML),
    "extract_failure_taxonomy": _x(_PDF, _HTML),
    "extract_heavy_split": _x(_PDF, _HTML, f"{PKG}/operators/skew.py"),
    "extract_salted_invariance": _x(_PDF, _HTML, f"{PKG}/operators/skew.py"),
    "extract_resume_antijoin": _x(_HTML, f"{PKG}/plans/run.py"),
    "extract_lineage_rollup": _x(
        _PDF, _HTML, f"{PKG}/operators/lineage.py"
    ),
    "extract_content_fallback": _x(_PDF, _HTML),
    # -- per-format content queries -----------------------------------------
    "extract_pdf_content": _x(_PDF),
    "extract_pdf_multipage": _x(_PDF),
    "extract_pdf_markdown": _x(_PDF),
    "extract_pdf_headers": _x(_PDF),
    "extract_pdf_tounicode": _x(_PDF),
    "extract_pdf_xrefstream": _x(_PDF),
    "extract_pdf_incremental": _x(_PDF),
    "extract_pdf_hexstrings": _x(_PDF),
    "extract_pdf_encdiff": _x(_PDF),
    "extract_pdf_ascii85": _x(_PDF),
    "extract_pdf_formxobject": _x(_PDF),
    "extract_pdf_grid_tables": _x(_PDF),
    "extract_pdf_scanned": _x(_PDF),
    "extract_pdf_encrypted": _x(_PDF, _CRYPT),
    "extract_pdf_aes": _x(_PDF, _CRYPT),
    "extract_pdf_badxref": _x(_PDF, _CRYPT),
    "extract_pdf_foreign": _x(
        _PDF, _OLE, f"{PKG}/fixtures/foreign.py"
    ),
    "extract_pdf_htmlout": _x(_PDF, _RENDER),
    "extract_pdf_jsonout": _x(_PDF, _RENDER),
    "extract_html_content": _x(_HTML),
    "extract_html_charset": _x(_HTML),
    "extract_html_tables": _x(_HTML),
    "extract_html_figures": _x(_HTML),
    "extract_html_htmlout": _x(_HTML, _RENDER),
    "extract_element_spans": _x(_PDF, _HTML),
    "extract_txt_content": _x(_OOXML),  # extract_txt lives in office_extract
    "extract_docx_content": _x(_OOXML),
    "extract_docx_tables": _x(_OOXML),
    "extract_docx_jsonout": _x(_OOXML, _RENDER),
    "extract_xlsx_cells": _x(_OOXML),
    "extract_pptx_slides": _x(_OOXML),
    "extract_doc_content": _x(_OLE),
    "extract_doc_assembly": _x(_OLE),
    "extract_xls_cells": _x(_OLE),
    "extract_rtf_content": _x(f"{PKG}/core/rtf_extract.py"),
    "extract_odt_content": _x(f"{PKG}/core/odf_extract.py"),
    "extract_ods_cells": _x(f"{PKG}/core/odf_extract.py"),
    "extract_epub_chapters": _x(_HTML, f"{PKG}/core/epub_extract.py"),
    "extract_image_metadata": _x(_IMAGE),
    "extract_gif_metadata": _x(_IMAGE),
    "extract_gzip_content": _x(_HTML),
    # -- training-data pipeline operators -----------------------------------
    "dedup_exact": [f"{PKG}/operators/dedup.py"],
    "dedup_ngram_jaccard": [f"{PKG}/operators/dedup.py"],
    "dedup_minhash_lsh": [f"{PKG}/operators/dedup.py"],
    "dedup_simhash": [f"{PKG}/operators/dedup.py"],
    "dedup_simhash_pairs": [f"{PKG}/operators/dedup.py"],
    "dedup_clusters": [f"{PKG}/operators/dedup.py"],
    "dedup_lines": [f"{PKG}/operators/cleaning.py"],
    "sim_topk_cosine": [f"{PKG}/operators/similarity.py"],
    "sim_embedding_neardup": [f"{PKG}/operators/similarity.py"],
    "sim_ann_lsh_topk": [f"{PKG}/operators/similarity.py"],
    "sim_ann_ivf_topk": [f"{PKG}/operators/similarity.py"],
    "sim_ann_recall": [f"{PKG}/operators/similarity.py"],
    "text_token_stats": [f"{PKG}/operators/textstats.py"],
    "text_language_id": [f"{PKG}/operators/textstats.py"],
    "text_quality_scores": [f"{PKG}/operators/textstats.py"],
    "text_fingerprint": [f"{PKG}/operators/textstats.py"],
    "text_repetition": [f"{PKG}/operators/textstats.py"],
    "text_redact_pii": [f"{PKG}/operators/cleaning.py"],
    "text_chunking": [f"{PKG}/operators/chunking.py"],
    "filter_blocklist": [f"{PKG}/operators/cleaning.py"],
    "url_canonicalize": [f"{PKG}/functions/url.py"],
    "events_asof_join": [f"{PKG}/operators/asof.py"],
    "events_range_join": [f"{PKG}/operators/asof.py"],
    "events_rollup_cascade": [f"{PKG}/operators/asof.py"],
    "sample_stratified": [f"{PKG}/operators/sampling.py"],
    "sample_split": [
        f"{PKG}/operators/sampling.py", f"{PKG}/functions/text.py"
    ],
    "decontaminate": [f"{PKG}/operators/sampling.py"],
    "sketch_ngram_counts": [f"{PKG}/operators/sketch.py"],
    "mm_media_metadata": [f"{PKG}/operators/multimodal.py"],
    "mm_figure_render": _x(
        _PDF,
        f"{PKG}/core/png_codec.py",
        f"{PKG}/operators/multimodal.py",
    ),
    "pipeline_training_corpus": _x(
        _PDF, _HTML,
        f"{PKG}/operators/dedup.py", f"{PKG}/operators/textstats.py",
    ),
    "pipeline_clean_corpus": _x(
        _PDF, _HTML, f"{PKG}/operators/cleaning.py"
    ),
}
