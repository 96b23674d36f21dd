"""Regenerate the committed golden outputs for the unit fixture corpus.

Run from the repo root:  python tools/make_goldens.py

The goldens freeze the byte-identical invariant surface (FIXTURES.md §3).
Any change to pinned extraction semantics must regenerate them CONSCIOUSLY
and be called out in the commit message.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pdf_document_extractor_spark.fixtures.gen import gen_unit_corpus
from pdf_document_extractor_spark.operators.extract import extract_rows_py
from pdf_document_extractor_spark.sources.pages import synth_payload, synth_url

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"

# Deterministic micro-corpus for the driver-gate synthesis modes
# (FIXTURES.md §5): freezes their byte-identity alongside the oracle check.
GATE_TEXTS = [
    (0, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
    (17, "kilo lima mike november oscar papa quebec romeo sierra tango"),
    (3, "uniform victor whiskey xray yankee zulu one two three four five"),
]
GATE_MODES = [
    "html", "html_charset", "html_table", "html_fig", "pdf", "pdf_xs",
    "pdf_inc", "pdf_hex", "pdf_tounicode", "pdf_encdiff", "pdf2",
    "pdf_hdr", "pdf_table", "pdf_a85", "pdf_form", "pdf_scanned", "pdf_rc4", "pdf_aes", "pdf_badxref", "pdf_foreign", "gzip_html", "gif", "odt", "ods", "epub", "txt",
    "docx", "xlsx", "pptx", "rtf", "doc", "xls", "image", "mixed_fail",
]


def write_gate_mode_goldens() -> int:
    path = OUT / "gate_modes.jsonl"
    n = 0
    with path.open("w", encoding="utf-8") as fh:
        for mode in GATE_MODES:
            for doc_id, text in GATE_TEXTS:
                url = synth_url(doc_id, mode)
                payload = synth_payload(
                    doc_id, text, mode, lang="en", source="src1"
                )
                for row in extract_rows_py(url, payload):
                    row = dict(row)
                    row.pop("partition_id")
                    row["mode"] = mode
                    fh.write(
                        json.dumps(row, sort_keys=True, ensure_ascii=False)
                    )
                    fh.write("\n")
                    n += 1
    return n


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    path = OUT / "unit_corpus.jsonl"
    n = 0
    with path.open("w", encoding="utf-8") as fh:
        for doc in gen_unit_corpus():
            for row in extract_rows_py(doc.url, doc.html):
                row = dict(row)
                row.pop("partition_id")  # placement-dependent, not invariant
                row["doc_class"] = doc.doc_class
                fh.write(json.dumps(row, sort_keys=True, ensure_ascii=False))
                fh.write("\n")
                n += 1
    print(f"wrote {n} golden rows -> {path}")
    m = write_gate_mode_goldens()
    print(f"wrote {m} gate-mode golden rows -> {OUT / 'gate_modes.jsonl'}")


if __name__ == "__main__":
    main()
