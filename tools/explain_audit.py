"""Physical-plan audit: regenerates EXPLAIN.md.

For each load-bearing plan, capture .explain("formatted") and assert the
scale-critical properties (column pruning reaches the scan, predicate
pushdown, broadcast joins where a side is small, no shuffle on the fused
extract path). Run: python tools/explain_audit.py
"""

from __future__ import annotations

import contextlib
import io
import os
import pathlib
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SECTIONS: list[tuple[str, str, list[str], str]] = []


def capture(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(title: str, df, must_contain: list[str], note: str) -> None:
    plan = capture(df)
    missing = [m for m in must_contain if m not in plan]
    status = "OK" if not missing else f"MISSING {missing}"
    print(f"{title:45s} {status}")
    SECTIONS.append((title, plan, must_contain, note))
    if missing:
        raise SystemExit(f"plan audit failed: {title}: missing {missing}")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F  # noqa: N812

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config(
            "spark.sql.warehouse.dir",
            tempfile.mkdtemp(prefix="explain-audit-wh-"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pdf_document_extractor_spark.operators.extract import extract_pages
    from pdf_document_extractor_spark.operators.similarity import (
        brute_force_topk,
    )
    from pdf_document_extractor_spark.operators.skew import salted_repartition
    from pdf_document_extractor_spark.sources.pages import (
        synthesize_pages_from_documents,
    )

    tmp = tempfile.mkdtemp()
    pages_path = os.path.join(tmp, "pages.parquet")
    synthesize_pages_from_documents(
        spark, "/root/testdata/sf0.001", "mixed"
    ).write.parquet(pages_path)
    pages = spark.read.parquet(pages_path)

    audit(
        "fused extract over pages table",
        extract_pages(pages),
        ["ReadSchema: struct<url:string,html:binary>", "MapInPandas"],
        "Column pruning reaches the parquet scan: only (url, html) are "
        "read even though the table has 5 columns (warc_ts/text/lang are "
        "never deserialized). No Exchange anywhere — the extraction path "
        "is scan -> Arrow -> Python -> output, zero shuffles. At 100 TB "
        "this is the difference between reading ~60% of the table bytes "
        "and reading all of them.",
    )

    committed = pages.select("url").filter(F.length("url") > 30)
    todo = pages.join(committed, "url", "left_anti")
    audit(
        "idempotent resume anti-join",
        extract_pages(todo),
        ["BroadcastHashJoin LeftAnti", "ReadSchema: struct<url:string>"],
        "The committed-urls side scans ONLY the url column and broadcasts; "
        "the pages side is never shuffled. With a large committed set the "
        "broadcast flips to a shuffled hash join automatically (AQE) — "
        "still keyed on url, co-partitioned with the bucket layout.",
    )

    audit(
        "url prefix predicate pushdown",
        pages.filter(F.col("url").startswith("https://synth.example/mi")),
        ["PushedFilters: [IsNotNull(url), StringStartsWith(url"],
        "Predicates on scan columns reach the parquet reader "
        "(row-group/page skip via min-max stats at scale).",
    )

    audit(
        "salted repartition (the ONE shuffle)",
        salted_repartition(pages, 8, hot=["synth.example"], salt_buckets=4),
        ["hashpartitioning(_bucket", "REPARTITION_BY_NUM"],
        "Placement shuffle keyed on (url-hash bucket, hot-host salt) — "
        "computed in a Project directly over the scan, no extra stage. "
        "This is the only wide dependency in the job; its partition count "
        "and salt width are the two knobs that absorb Zipfian host skew. "
        "Both helper columns are projected away after the Exchange, so "
        "placement provably cannot change output content.",
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    audit(
        "similarity top-k (query closure, one Arrow scan)",
        brute_force_topk(emb, query_ids_below=10, k=5),
        [
            "MapInPandas",
            "PushedFilters: [IsNotNull(vec_id)",
            "WindowGroupLimit",
        ],
        "The tiny (bounded) query set rides the scoring closure; the "
        "corpus is ONE Arrow-batched scan whose vectorized numpy fold "
        "keeps the exact JVM float64 op order (round-6: replaces the "
        "interpreted higher-order-function cross join, which cannot "
        "codegen). vec_id range predicates push into parquet. "
        "WindowGroupLimit runs BEFORE the exchange — each map task keeps "
        "only its local top-k per query, so the shuffle moves "
        "O(queries * k) rows, not the scored corpus.",
    )

    # -- LSH verification joins candidates, not the full inverted index ----
    from pdf_document_extractor_spark.operators.dedup import minhash_lsh_pairs

    docs_small = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    lsh_plan = capture(minhash_lsh_pairs(docs_small))
    assert "[id_b" in lsh_plan and "shingle" in lsh_plan, "candidate join shape"
    print(f"{'LSH verify joins candidate pairs only':45s} OK")
    SECTIONS.append(
        (
            "LSH verify joins candidate pairs only",
            "\n".join(
                ln
                for ln in lsh_plan.splitlines()
                if "keys" in ln or "Join" in ln
            ),
            ["join keys include (id_b, shingle)"],
            "The exact-Jaccard verification of LSH candidates expands "
            "candidate pairs against per-doc shingle sets (join keyed on "
            "(id_b, shingle)) instead of self-joining the full shingle "
            "inverted index and filtering afterwards. The latter is "
            "O(sum_s df(s)^2) — it silently re-introduces the quadratic "
            "cost LSH exists to avoid (this regressed once; the audit "
            "pins the join shape). Only join-key lines shown.",
        )
    )

    # -- bucketed co-located join: shuffle-free enrichment ------------------
    spark.sql("DROP TABLE IF EXISTS pages_b")
    spark.sql("DROP TABLE IF EXISTS extracted_b")
    pages.write.bucketBy(8, "url").sortBy("url").saveAsTable("pages_b")
    extract_pages(pages).select("url", "status", "word_count").write.bucketBy(
        8, "url"
    ).sortBy("url").saveAsTable("extracted_b")
    # at sandbox scale both tables fit the broadcast threshold, which would
    # hide the bucket layout — disable it to show the 10^12-row plan shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("pages_b").join(spark.table("extracted_b"), "url")
        plan = capture(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan and "Exchange hashpartitioning" not in plan, (
        "bucketed join must not shuffle"
    )
    assert "Bucketed: true" in plan
    print(f"{'bucketed co-located join (no shuffle)':45s} OK")
    SECTIONS.append(
        (
            "bucketed co-located join (no shuffle)",
            plan,
            ["SortMergeJoin", "Bucketed: true", "NO Exchange hashpartitioning"],
            "Both tables bucketed 8 ways on url (broadcast disabled here "
            "to show the big-table plan shape): the enrichment join "
            "(pages x extracted) runs with ZERO Exchange operators — each "
            "task reads matching buckets from both sides. At 10^12 docs "
            "this is how extracted output joins back to the source table "
            "(or to a prior run) without moving either table across the "
            "network; the same layout serves the resume anti-join once "
            "the committed set outgrows broadcast range.",
        )
    )

    # -- blocklist filter: dimension joins must broadcast --------------------
    from pdf_document_extractor_spark.operators.cleaning import (
        blocklist_filter,
        redact_pii,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .withColumn(
            "url",
            F.concat(F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
                     F.lit(".com/p")),
        )
    )
    hosts = spark.createDataFrame([("h0.com",)], "host string")
    words = spark.createDataFrame([("the",)], "word string")
    bl_plan = capture(blocklist_filter(docs, hosts, words))
    assert "BroadcastHashJoin" in bl_plan and "SortMergeJoin" not in bl_plan, (
        "blocklist dimension joins must broadcast, never sort-merge"
    )
    print(f"{'blocklist dims broadcast (no SMJ)':45s} OK")
    SECTIONS.append(
        (
            "blocklist dims broadcast (no SMJ)",
            bl_plan,
            ["BroadcastHashJoin", "NO SortMergeJoin"],
            "Host and word blocklists are dimension tables: both joins "
            "broadcast (LeftSemi), so the 100 TB corpus is scanned once "
            "and never shuffled on a blocklist key.",
        )
    )

    # -- M14 content fallback: plain equi-join, no nested loop ---------------
    from pdf_document_extractor_spark.operators.extract import (
        coalesce_content,
    )

    fb = coalesce_content(extract_pages(pages), pages)
    fb_plan = capture(fb)
    assert "BroadcastNestedLoopJoin" not in fb_plan and (
        "CartesianProduct" not in fb_plan
    ), "content fallback must be a hash equi-join on url, never a product"
    print(f"{'content fallback is an equi-join on url':45s} OK")
    SECTIONS.append(
        (
            "content fallback is an equi-join on url",
            fb_plan,
            ["NO BroadcastNestedLoopJoin", "NO CartesianProduct"],
            "coalesce_content joins extracted rows back to the pages "
            "table strictly on the url key (hash or sort-merge as AQE "
            "chooses) — under the north rule's url-hash bucketing both "
            "sides are co-partitioned and the join is shuffle-free; the "
            "coalesce/when/to_json chain stays in codegen.",
        )
    )

    # -- PII redaction: pure codegen, zero exchange --------------------------
    red_plan = capture(redact_pii(docs))
    assert "Exchange" not in red_plan and "codegen id" in red_plan, (
        "redaction must stay inside codegen with no shuffle"
    )
    print(f"{'pii redaction stays in codegen, no shuffle':45s} OK")
    SECTIONS.append(
        (
            "pii redaction stays in codegen, no shuffle",
            red_plan,
            ["codegen id", "NO Exchange"],
            "The regexp_replace chain compiles into one whole-stage-"
            "codegen span over the scan: redaction adds zero shuffles "
            "and zero Python crossings.",
        )
    )

    # -- figure render: one Arrow pass, no shuffle ---------------------------
    from pdf_document_extractor_spark.operators.multimodal import (
        render_figures,
    )
    from pdf_document_extractor_spark.sources.pages import (
        synthesize_pages_from_documents,
    )

    figs_plan = capture(
        render_figures(
            synthesize_pages_from_documents(
                spark, "/root/testdata/sf0.001", "pdf_scanned"
            )
        )
    )
    assert "Exchange" not in figs_plan, (
        "figure render must be a single narrow mapInPandas pass"
    )
    assert "MapInPandas" in figs_plan
    print(f"{'figure render is one narrow Arrow pass':45s} OK")
    SECTIONS.append(
        (
            "figure render is one narrow Arrow pass",
            figs_plan,
            ["MapInPandas", "NO Exchange"],
            "render_figures (M11) reads (url, html) once and emits "
            "figure rows via one Arrow-batched mapInPandas — an asset "
            "side-channel with zero shuffles; at 10^12 docs it scales "
            "with the scan, adding no exchange to the job.",
        )
    )

    md = ["# EXPLAIN — physical-plan audit (scale-critical properties)\n"]
    md.append(
        "Regenerate with `python tools/explain_audit.py` (asserts each "
        "property; fails the run if a plan regresses).\n"
    )
    for title, plan, must, note in SECTIONS:
        md.append(f"## {title}\n")
        md.append(note + "\n")
        md.append("Asserted plan properties: " + ", ".join(f"`{m}`" for m in must) + "\n")
        md.append("```\n" + plan.strip() + "\n```\n")
    (REPO / "EXPLAIN.md").write_text("\n".join(md))
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
