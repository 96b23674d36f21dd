"""Soft-failure semantics at the Spark task layer (P2).

Hard failures become committed rows (tested elsewhere); SOFT (transient)
failures re-raise from the UDF so the TASK retries — the reference's
raise => no Kafka commit => redelivery (kafka_message_handler.py:147-161).
Local mode defaults to spark.task.maxFailures=1, so this runs a subprocess
job on master local[2,2] (2 threads, maxFailures=2): a shim stage throws a
transient 'connection timed out' exactly once per partition (scratch-file
marker), the retry succeeds, and the job must deliver COMPLETE output.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess
import sys

import pytest

from pdf_document_extractor_spark.fixtures.gen import gen_scale_corpus
from pdf_document_extractor_spark.sources.pages import pages_df_from_fixtures

REPO = pathlib.Path(__file__).resolve().parents[1]

JOB = """\
import os, sys
from pyspark.sql import SparkSession

scratch, pages_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (SparkSession.builder.master("local[2,2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from pdf_document_extractor_spark.operators.extract import extract_pages
from pdf_document_extractor_spark.sources.pages import PAGES_SCHEMA

def flaky_once(batches):
    # transient fault: first attempt of each partition dies with a SOFT
    # (timeout-class) error; Spark retries the task, marker file exists,
    # second attempt passes the batches through untouched
    from pyspark import TaskContext
    pid = TaskContext.get().partitionId()
    marker = os.path.join(scratch, f"p{pid}")
    if not os.path.exists(marker):
        open(marker, "w").close()
        raise TimeoutError("connection timed out fetching shard")
    yield from batches

pages = spark.read.parquet(pages_path)
shimmed = pages.repartition(2).mapInPandas(flaky_once, schema=PAGES_SCHEMA)
extract_pages(shimmed).write.mode("overwrite").parquet(out_path)
print("JOB_OK")
spark.stop()
"""


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return str(pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit")


def test_soft_failure_task_retry_delivers_complete_output(spark, tmp_path):
    docs = gen_scale_corpus(60)
    pages_path = str(tmp_path / "pages.parquet")
    pages_df_from_fixtures(spark, docs).write.parquet(pages_path)
    out_path = str(tmp_path / "out.parquet")
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    job = tmp_path / "job.py"
    job.write_text(JOB)

    res = subprocess.run(
        [
            _spark_submit(),
            "--master",
            "local[2,2]",
            "--py-files",
            _zip(tmp_path),
            str(job),
            str(scratch),
            pages_path,
            out_path,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=420,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "JOB_OK" in res.stdout
    # every partition faulted exactly once...
    assert sorted(p.name for p in scratch.iterdir()) == ["p0", "p1"]
    # ...and the retried job still delivered the complete corpus
    got = spark.read.parquet(out_path)
    assert got.select("url").distinct().count() == 60
    assert got.filter("status = 'success'").count() > 0


def _zip(tmp_path) -> str:
    zip_path = tmp_path / "pkg.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "package.py"), str(zip_path)],
        check=True,
        capture_output=True,
    )
    return str(zip_path)
