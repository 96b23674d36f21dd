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

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "golden"


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


if __name__ == "__main__":
    main()
