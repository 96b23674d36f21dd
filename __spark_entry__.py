"""Driver contract for the spark-graft builder (PySpark target).

Every ``queries()`` entry is an implemented operator from SURVEY.md §2
(survey IDs cited per query); each has a DuckDB ``oracle_sql()`` twin over
the same parquet tables. Extraction queries work by construction: the pages
table is SYNTHESIZED deterministically from ``documents.parquet`` with
SQL-invertible payload templates (sources/pages.py), so the expected output
of the full Spark pipeline (synthesize -> magic-byte dispatch -> parse ->
extract -> assemble) is an exact SQL expression over ``documents``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: N812

SF001 = "/root/testdata/sf0.001"

# Number of words the pinned PDF page template prepends ("Page {n}").
_PDF_TEMPLATE_WORDS = 2


def _doc_id(col: str = "url"):
    return F.element_at(F.split(F.col(col), "/"), -1).cast("long").alias("doc_id")


def _extracted(spark: SparkSession, sf_dir: str, mode: str) -> DataFrame:
    from pdf_document_extractor_spark.operators.extract import extract_pages
    from pdf_document_extractor_spark.sources.pages import (
        synthesize_pages_from_documents,
    )

    pages = synthesize_pages_from_documents(spark, sf_dir, mode=mode)
    return extract_pages(pages).withColumn("doc_id", _doc_id())


# ---------------------------------------------------------------------------
# Extraction queries (SURVEY §2.3 M1-M15, §2.2 D1-D8, §2.6 P1-P3)
# ---------------------------------------------------------------------------


def q_extract_html_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate strip roundtrip (M1/M5/M13/D1): content == text."""
    return _extracted(spark, sf_dir, "html").select(
        "doc_id",
        "doc_type",
        "status",
        "content",
        F.col("word_count").cast("long").alias("word_count"),
        F.col("page_count").cast("long").alias("page_count"),
    )


def q_extract_pdf_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF parse roundtrip (M1/M5): content == 'Page 1\\n\\n' + text + '\\n'."""
    return _extracted(spark, sf_dir, "pdf").select(
        "doc_id",
        "doc_type",
        "status",
        "content",
        F.col("word_count").cast("long").alias("word_count"),
        F.col("page_count").cast("long").alias("page_count"),
    )


def q_extract_dispatch_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte dispatch (D1/D2): even doc_id -> pdf, odd -> html."""
    return _extracted(spark, sf_dir, "mixed").select(
        "doc_id", "doc_type", "status", "content"
    )


def q_extract_failure_taxonomy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-failure taxonomy rows (P2/D3): doc_id%17==0 is corrupt."""
    return _extracted(spark, sf_dir, "mixed_fail").select(
        "doc_id",
        "doc_type",
        "status",
        "error_type",
        F.col("page_number").cast("long").alias("page_number"),
    )


def q_extract_resume_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent resume (P1/A5/S9): anti-join committed urls, extract rest.

    Simulated committed set = docs with doc_id%3==0.
    """
    from pdf_document_extractor_spark.operators.extract import extract_pages
    from pdf_document_extractor_spark.sources.pages import (
        synthesize_pages_from_documents,
    )

    pages = synthesize_pages_from_documents(spark, sf_dir, "html")
    committed = pages.select("url").filter(_doc_id().cast("long") % 3 == 0)
    remaining = pages.join(committed, "url", "left_anti")
    return (
        extract_pages(remaining)
        .withColumn("doc_id", _doc_id())
        .select("doc_id", "status", "content")
    )


def q_extract_heavy_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-doc routing (D6): split on payload bytes, extract per branch
    with its own stage, union — output must be identical to the unsplit
    plan, plus the routing label."""
    from pdf_document_extractor_spark.operators.extract import extract_pages
    from pdf_document_extractor_spark.operators.skew import split_heavy
    from pdf_document_extractor_spark.sources.pages import (
        HTML_TEMPLATE_FIXED_LEN,
        synthesize_pages_from_documents,
    )

    threshold = HTML_TEMPLATE_FIXED_LEN + 300  # heavy iff len(id)+len(text)>300
    pages = synthesize_pages_from_documents(spark, sf_dir, "html")
    light, heavy = split_heavy(pages, threshold)
    out_light = extract_pages(light).withColumn("pass_name", F.lit("light"))
    out_heavy = extract_pages(heavy).withColumn("pass_name", F.lit("heavy"))
    return (
        out_light.unionByName(out_heavy)
        .withColumn("doc_id", _doc_id())
        .select("doc_id", "pass_name", "status", "content")
    )


def q_extract_lineage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-level lineage rollup (A1/A7/S7/P4): totals reconcile exactly."""
    from pdf_document_extractor_spark.operators.lineage import run_rollup

    ext = _extracted(spark, sf_dir, "mixed_fail")
    return run_rollup(ext).select(
        "total_docs", "success_docs", "hard_fail_docs", "total_pages"
    )


def q_extract_element_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element char spans (M7): html mode yields one block element per doc
    spanning [0, len(text))."""
    ext = _extracted(spark, sf_dir, "html")
    el = ext.select("doc_id", F.explode("elements").alias("e"))
    return el.select(
        "doc_id",
        F.col("e.text").alias("text"),
        F.col("e.label").alias("label"),
        F.col("e.page_no").cast("long").alias("page_no"),
        F.col("e.char_start").cast("long").alias("char_start"),
        F.col("e.char_end").cast("long").alias("char_end"),
    )


def q_extract_salted_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew salting is placement-only (P3): salted+bucketed plan produces
    byte-identical output to the oracle (same SQL as dispatch_mixed)."""
    from pdf_document_extractor_spark.operators.extract import extract_pages
    from pdf_document_extractor_spark.operators.skew import (
        hot_hosts,
        salted_repartition,
    )
    from pdf_document_extractor_spark.sources.pages import (
        synthesize_pages_from_documents,
    )

    pages = synthesize_pages_from_documents(spark, sf_dir, "mixed")
    hot = hot_hosts(pages, hot_fraction=0.05)
    placed = salted_repartition(pages, num_partitions=16, hot=hot, salt_buckets=8)
    return (
        extract_pages(placed)
        .withColumn("doc_id", _doc_id())
        .select("doc_id", "doc_type", "status", "content")
    )


def q_extract_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML table extraction (M9/M10): headers rule + CSV export."""
    ext = _extracted(spark, sf_dir, "html_table")
    t = ext.select("doc_id", F.explode("tables").alias("t"))
    return t.select(
        "doc_id",
        F.col("t.num_rows").cast("long").alias("num_rows"),
        F.col("t.num_cols").cast("long").alias("num_cols"),
        F.array_join(F.col("t.headers"), "|").alias("headers_joined"),
        F.col("t.cell_count").cast("long").alias("cell_count"),
        F.col("t.csv").alias("csv"),
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB; views pre-registered: documents, embeddings, ...)
# ---------------------------------------------------------------------------

_WORDS = "CAST(length(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)"

_ORACLES: dict[str, str] = {
    "extract_html_content": f"""
        SELECT doc_id, 'html' AS doc_type, 'success' AS status,
               text AS content,
               {_WORDS} AS word_count,
               CAST(1 AS BIGINT) AS page_count
        FROM documents
    """,
    "extract_pdf_content": f"""
        SELECT doc_id, 'pdf' AS doc_type, 'success' AS status,
               'Page 1' || chr(10) || chr(10) || text || chr(10) AS content,
               {_WORDS} + 2 AS word_count,
               CAST(1 AS BIGINT) AS page_count
        FROM documents
    """,
    "extract_dispatch_mixed": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'pdf' ELSE 'html' END AS doc_type,
               'success' AS status,
               CASE WHEN doc_id % 2 = 0
                    THEN 'Page 1' || chr(10) || chr(10) || text || chr(10)
                    ELSE text END AS content
        FROM documents
    """,
    "extract_failure_taxonomy": """
        SELECT doc_id,
               CASE WHEN doc_id % 17 = 0 THEN 'pdf'
                    WHEN doc_id % 2 = 0 THEN 'pdf' ELSE 'html' END AS doc_type,
               CASE WHEN doc_id % 17 = 0 THEN 'hard_failure'
                    ELSE 'success' END AS status,
               CASE WHEN doc_id % 17 = 0 THEN 'CorruptedFileError'
                    ELSE NULL END AS error_type,
               CASE WHEN doc_id % 17 = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(1 AS BIGINT) END AS page_number
        FROM documents
    """,
    "extract_resume_antijoin": """
        SELECT doc_id, 'success' AS status, text AS content
        FROM documents WHERE doc_id % 3 <> 0
    """,
    "extract_heavy_split": """
        SELECT doc_id,
               CASE WHEN length(CAST(doc_id AS VARCHAR)) + length(text) > 300
                    THEN 'heavy' ELSE 'light' END AS pass_name,
               'success' AS status,
               text AS content
        FROM documents
    """,
    "extract_lineage_rollup": """
        SELECT CAST(count(*) AS BIGINT) AS total_docs,
               CAST(sum(CASE WHEN doc_id % 17 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS success_docs,
               CAST(sum(CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hard_fail_docs,
               CAST(sum(CASE WHEN doc_id % 17 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS total_pages
        FROM documents
    """,
    "extract_element_spans": """
        SELECT doc_id, text AS text, 'block' AS label,
               CAST(1 AS BIGINT) AS page_no,
               CAST(0 AS BIGINT) AS char_start,
               CAST(length(text) AS BIGINT) AS char_end
        FROM documents
    """,
    "extract_salted_invariance": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'pdf' ELSE 'html' END AS doc_type,
               'success' AS status,
               CASE WHEN doc_id % 2 = 0
                    THEN 'Page 1' || chr(10) || chr(10) || text || chr(10)
                    ELSE text END AS content
        FROM documents
    """,
    "extract_html_tables": """
        SELECT doc_id,
               CAST(3 AS BIGINT) AS num_rows,
               CAST(2 AS BIGINT) AS num_cols,
               'k|v' AS headers_joined,
               CAST(6 AS BIGINT) AS cell_count,
               'k,v' || chr(10) || 'lang,' || lang || chr(10) ||
               'source,' || source || chr(10) AS csv
        FROM documents
    """,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full mixed-corpus extraction pipeline on sf0.001."""
    return q_extract_dispatch_mixed(spark, SF001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_html_content": q_extract_html_content,
        "extract_pdf_content": q_extract_pdf_content,
        "extract_dispatch_mixed": q_extract_dispatch_mixed,
        "extract_failure_taxonomy": q_extract_failure_taxonomy,
        "extract_resume_antijoin": q_extract_resume_antijoin,
        "extract_heavy_split": q_extract_heavy_split,
        "extract_lineage_rollup": q_extract_lineage_rollup,
        "extract_element_spans": q_extract_element_spans,
        "extract_salted_invariance": q_extract_salted_invariance,
        "extract_html_tables": q_extract_html_tables,
    }


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
