"""The north-rule launch path: spark-submit --py-files <zip> job.py.

Proves the package deploys to driver + executors from the zip alone (the
subprocess runs OUTSIDE the repo with no PYTHONPATH), the job commits a
snapshot, and lineage reconciles."""

from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import sys

import pytest

from pdf_document_extractor_spark.fixtures.gen import gen_scale_corpus
from pdf_document_extractor_spark.sources.pages import pages_df_from_fixtures

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.fixture()
def corpus_df(spark):
    return pages_df_from_fixtures(spark, gen_scale_corpus(120))

LAUNCHER = """\
import sys
from pdf_document_extractor_spark.plans.run import main
main()
"""


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return str(pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit")


def test_spark_submit_py_files_end_to_end(spark, tmp_path, corpus_df):
    zip_path = tmp_path / "pdf_document_extractor_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "package.py"), str(zip_path)],
        check=True,
        capture_output=True,
    )

    pages_path = str(tmp_path / "pages.parquet")
    corpus_df.write.parquet(pages_path)
    wh = str(tmp_path / "wh")
    launcher = tmp_path / "job.py"
    launcher.write_text(LAUNCHER)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["SPARK_SUBMIT_OPTS"] = "-Dspark.ui.enabled=false"
    res = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[4]",
            "--py-files",
            str(zip_path),
            str(launcher),
            "--pages",
            pages_path,
            "--warehouse",
            wh,
            "--run-id",
            "submit-r1",
            "--num-partitions",
            "4",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(tmp_path),  # NOT the repo: only the zip provides the package
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "committed=True" in res.stdout, res.stdout

    # results visible + lineage reconciles, read back from this session
    from pdf_document_extractor_spark.sources.catalog import SnapshotTable

    ext = SnapshotTable(wh, "extracted").read(spark)
    lin = SnapshotTable(wh, "lineage").read(spark)
    n_docs = ext.select("url").distinct().count()
    assert n_docs == corpus_df.count()
    rollup = {r.partition_id: r for r in lin.collect()}
    assert rollup[-1].doc_count == n_docs  # run-level rollup row
