"""Build the --py-files zip for spark-submit deployment.

Usage: python tools/package.py [out.zip]   (default dist/pdf_document_extractor_spark.zip)

The zip holds the package at top level, so
``spark-submit --py-files pdf_document_extractor_spark.zip job.py`` makes
``import pdf_document_extractor_spark`` work on driver and executors with
no install step (the north rule's deployment mode).
"""

from __future__ import annotations

import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]
PKG = "pdf_document_extractor_spark"


def build(out: pathlib.Path) -> pathlib.Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / PKG).rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = pathlib.Path(
        sys.argv[1] if len(sys.argv) > 1 else REPO / "dist" / f"{PKG}.zip"
    )
    print(build(dest))
