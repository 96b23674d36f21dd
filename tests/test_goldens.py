"""The north-rule invariant: byte-identical extracted text per url vs the
committed golden fixtures — checked for BOTH the pure oracle and the Spark
pipeline (they wrap the same functions; this test proves it stays true)."""

from __future__ import annotations

import json
import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "unit_corpus.jsonl"


def _load_goldens() -> dict:
    rows = {}
    with GOLDEN.open(encoding="utf-8") as fh:
        for line in fh:
            row = json.loads(line)
            rows[(row["url"], row["page_number"])] = row
    return rows


def test_goldens_exist_and_cover_corpus():
    rows = _load_goldens()
    assert len(rows) >= 36  # one row per doc minimum (multipage -> more)
    classes = {r["doc_class"] for r in rows.values()}
    assert {
        "html_simple",
        "html_linkfarm",
        "html_minimal",
        "html_empty",
        "html_badbytes",
        "pdf_onepage",
        "pdf_multipage",
        "pdf_table",
        "pdf_corrupt",
        "oversize",
        "unknown_magic",
    } <= classes


def test_oracle_matches_goldens_byte_identical(unit_corpus):
    from pdf_document_extractor_spark.operators.extract import extract_rows_py

    goldens = _load_goldens()
    seen = set()
    for doc in unit_corpus:
        for row in extract_rows_py(doc.url, doc.html):
            key = (row["url"], row["page_number"])
            seen.add(key)
            g = goldens[key]
            # byte-identical content (UTF-8 encoded comparison per FIXTURES.md)
            assert row["content"].encode("utf-8") == g["content"].encode("utf-8"), key
            for field in (
                "doc_type",
                "word_count",
                "page_count",
                "elements",
                "tables",
                "figures",
                "status",
                "error_type",
                "error_message",
                "byte_count",
            ):
                assert row[field] == g[field], (key, field)
    assert seen == set(goldens)


def test_spark_pipeline_matches_goldens_byte_identical(spark, unit_corpus):
    from pdf_document_extractor_spark.operators.extract import extract_pages
    from pdf_document_extractor_spark.sources.pages import pages_df_from_fixtures

    goldens = _load_goldens()
    pages = pages_df_from_fixtures(spark, unit_corpus).repartition(8, "url")
    got = extract_pages(pages).collect()
    assert len(got) == len(goldens)
    for row in got:
        g = goldens[(row.url, row.page_number)]
        assert row.content.encode("utf-8") == g["content"].encode("utf-8")
        assert row.status == g["status"]
        assert row.word_count == g["word_count"]
        assert row.page_count == g["page_count"]
        assert row.error_type == g["error_type"]
        assert [e.asDict(recursive=True) for e in row.elements] == g["elements"]
        assert [t.asDict(recursive=True) for t in row.tables] == g["tables"]
        assert [f.asDict(recursive=True) for f in row.figures] == g["figures"]


def test_gate_mode_goldens_byte_identical():
    """The driver-gate synthesis modes (FIXTURES.md §5) are frozen by their
    own golden file, independent of the DuckDB oracle equality."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parents[1] / "tools"))
    import make_goldens

    from pdf_document_extractor_spark.operators.extract import extract_rows_py
    from pdf_document_extractor_spark.sources.pages import (
        synth_payload,
        synth_url,
    )

    path = pathlib.Path(__file__).parent / "golden" / "gate_modes.jsonl"
    goldens = {}
    with path.open(encoding="utf-8") as fh:
        for line in fh:
            row = json.loads(line)
            goldens[(row["mode"], row["url"], row["page_number"])] = row

    seen = set()
    for mode in make_goldens.GATE_MODES:
        for doc_id, text in make_goldens.GATE_TEXTS:
            url = synth_url(doc_id, mode)
            payload = synth_payload(doc_id, text, mode, lang="en", source="src1")
            for row in extract_rows_py(url, payload):
                key = (mode, row["url"], row["page_number"])
                seen.add(key)
                g = goldens[key]
                assert row["content"].encode() == g["content"].encode(), key
                assert row["status"] == g["status"], key
                assert row["tables"] == g["tables"], key
                assert row["figures"] == g["figures"], key
                assert row["elements"] == g["elements"], key
    assert seen == set(goldens)
