"""Pipeline tests on local Spark (SURVEY.md §5.2 items 3-4): resume
idempotency, crash-resume, salting output-invariance, heavy-doc routing,
lineage reconciliation."""

from __future__ import annotations

import json

import pytest

from pdf_document_extractor_spark.fixtures.gen import (
    HEAVY_BYTES_TEST,
    gen_scale_corpus,
    gen_unit_corpus,
)
from pdf_document_extractor_spark.plans.run import run_extraction_job
from pdf_document_extractor_spark.sources.catalog import SnapshotTable
from pdf_document_extractor_spark.sources.pages import pages_df_from_fixtures


@pytest.fixture()
def corpus_df(spark):
    return pages_df_from_fixtures(spark, gen_scale_corpus(300))


def _contents(df):
    return {
        (r.url, r.page_number): (r.content, r.status) for r in df.collect()
    }


def test_job_end_to_end_and_lineage_reconciles(spark, tmp_path, corpus_df):
    wh = str(tmp_path / "wh")
    res = run_extraction_job(spark, corpus_df, wh, "r1", num_partitions=8)
    assert res.committed and res.docs_in == 300

    extracted = SnapshotTable(wh, "extracted").read(spark)
    lineage = SnapshotTable(wh, "lineage").read(spark)
    per_doc = extracted.select("url", "status").groupBy("url").count()
    assert per_doc.count() == 300  # every input doc has >=1 output row

    lin = {r.partition_id: r for r in lineage.collect()}
    rollup = lin.pop(-1)
    # per-partition counts reconcile with the rollup row
    assert sum(r.doc_count for r in lin.values()) == rollup.doc_count == 300
    assert sum(r.success_count for r in lin.values()) == rollup.success_count
    assert sum(r.hard_fail_count for r in lin.values()) == rollup.hard_fail_count
    # manifest urls == hard-failure urls
    manifest_urls = {
        e["url"]
        for r in lin.values()
        for e in json.loads(r.failure_manifest or "[]")
    }
    hard_urls = {
        r.url for r in extracted.filter("status='hard_failure'").collect()
    }
    assert manifest_urls == hard_urls
    assert rollup.hard_fail_count == len(hard_urls)


def test_resume_is_idempotent(spark, tmp_path, corpus_df):
    wh = str(tmp_path / "wh")
    res1 = run_extraction_job(spark, corpus_df, wh, "r1", num_partitions=8)
    assert res1.committed
    # same run_id again: no-op
    res2 = run_extraction_job(spark, corpus_df, wh, "r1", num_partitions=8)
    assert not res2.committed
    # new run_id over same input: anti-join leaves nothing to do
    res3 = run_extraction_job(spark, corpus_df, wh, "r2", num_partitions=8)
    assert res3.docs_in == 0 and not res3.committed
    extracted = SnapshotTable(wh, "extracted").read(spark)
    assert extracted.groupBy("url").count().count() == 300  # no duplicates


def test_partial_run_resumes_exactly(spark, tmp_path, corpus_df):
    """Crash simulation: first run saw only half the input (as if the job
    died after committing a partial snapshot); the rerun must process
    exactly the remainder, and the union must equal a clean one-shot run."""
    wh = str(tmp_path / "wh")
    from pyspark.sql import functions as F  # noqa: N812

    half = corpus_df.filter(F.crc32(F.col("url")) % 2 == 0)
    run_extraction_job(spark, half, wh, "r1", num_partitions=8)
    res2 = run_extraction_job(spark, corpus_df, wh, "r2", num_partitions=8)
    assert 0 < res2.docs_in < 300

    resumed = _contents(SnapshotTable(wh, "extracted").read(spark))

    wh2 = str(tmp_path / "wh2")
    run_extraction_job(spark, corpus_df, wh2, "r1", num_partitions=8)
    oneshot = _contents(SnapshotTable(wh2, "extracted").read(spark))
    assert resumed == oneshot  # byte-identical content, same statuses


def test_salting_and_heavy_split_are_output_invariant(spark, tmp_path):
    """Plan A (salted, heavy threshold 64 KiB) vs plan B (no salt, no heavy
    split) produce byte-identical extracted content."""
    docs = gen_unit_corpus()
    pages = pages_df_from_fixtures(spark, docs)

    wh_a = str(tmp_path / "a")
    run_extraction_job(
        spark, pages, wh_a, "r1",
        num_partitions=16, heavy_bytes=HEAVY_BYTES_TEST, salt_buckets=8,
    )
    wh_b = str(tmp_path / "b")
    run_extraction_job(
        spark, pages, wh_b, "r1",
        num_partitions=2, heavy_bytes=1 << 40, hot_fraction=1.1,
    )
    a = _contents(SnapshotTable(wh_a, "extracted").read(spark))
    b = _contents(SnapshotTable(wh_b, "extracted").read(spark))
    assert a == b


def test_heavy_docs_actually_route(spark, tmp_path):
    docs = gen_unit_corpus()
    pages = pages_df_from_fixtures(spark, docs)
    from pdf_document_extractor_spark.operators.skew import split_heavy

    light, heavy = split_heavy(pages, HEAVY_BYTES_TEST)
    n_heavy = heavy.count()
    assert n_heavy >= 2  # the oversize fixture class
    assert light.count() + n_heavy == 36


def test_time_travel_reads_past_snapshot(spark, tmp_path, corpus_df):
    from pyspark.sql import functions as F  # noqa: N812

    wh = str(tmp_path / "wh")
    half = corpus_df.filter(F.crc32(F.col("url")) % 2 == 0)
    run_extraction_job(spark, half, wh, "r1", num_partitions=4)
    tbl = SnapshotTable(wh, "extracted")
    v1 = tbl.current_snapshot_id()
    n1 = tbl.read(spark).count()
    run_extraction_job(spark, corpus_df, wh, "r2", num_partitions=4)
    assert tbl.read(spark, as_of=v1).count() == n1
    assert tbl.read(spark).count() > n1


def test_incremental_read_since_snapshot(spark, tmp_path, corpus_df):
    """read_since returns exactly the delta committed after a snapshot id
    (the Iceberg incremental-scan / Kafka consume-from-offset analog)."""
    from pyspark.sql import functions as F  # noqa: N812

    wh = str(tmp_path / "wh")
    half = corpus_df.filter(F.crc32(F.col("url")) % 2 == 0)
    run_extraction_job(spark, half, wh, "r1", num_partitions=4)
    tbl = SnapshotTable(wh, "extracted")
    v1 = tbl.current_snapshot_id()
    assert tbl.read_since(spark, v1) is None  # no delta yet

    run_extraction_job(spark, corpus_df, wh, "r2", num_partitions=4)
    delta = tbl.read_since(spark, v1)
    all_rows = tbl.read(spark).count()
    v1_rows = tbl.read(spark, as_of=v1).count()
    assert delta.count() == all_rows - v1_rows
    # delta contains ONLY r2's urls (the unprocessed half)
    r1_urls = {r.url for r in tbl.read(spark, as_of=v1).select("url").collect()}
    assert all(r.url not in r1_urls for r in delta.select("url").collect())


def test_commit_reclaims_orphan_snapshot_dir(spark, tmp_path, corpus_df):
    """A commit that died mid-write leaves a data dir with no manifest
    entry. The replayed commit must reclaim that path (overwrite), not
    crash-loop on PATH_ALREADY_EXISTS."""
    wh = str(tmp_path / "wh")
    tbl = SnapshotTable(wh, "extracted")
    # simulate the torn first attempt: data written, manifest never flipped
    orphan = tbl.data_dir / "snap-000001-r1"
    corpus_df.limit(5).write.parquet(str(orphan))
    assert tbl.current_snapshot_id() == 0  # invisible

    from pdf_document_extractor_spark.operators.extract import extract_pages

    snap = tbl.commit(extract_pages(corpus_df), "r1")
    assert snap is not None and snap.snapshot_id == 1
    n_docs = tbl.read(spark).select("url").distinct().count()
    assert n_docs == corpus_df.count()  # full data, not the torn 5 rows


def test_salting_rebalances_coarse_buckets(spark):
    """With a coarse bucket layout (bucket(8, url), e.g. an Iceberg table
    bucketed for locality) only 8 partition keys exist, so a 32-way
    repartition leaves >= 24 cores idle. Salting hot hosts multiplies the
    key space and rebalances — placement-only, no output change."""
    from pyspark.sql import functions as F  # noqa: N812

    from pdf_document_extractor_spark.operators.skew import salted_repartition

    docs = spark.range(4000).select(
        F.concat(
            F.lit("https://hot.example/"), F.col("id").cast("string")
        ).alias("url"),
        F.lit(b"<p>x</p>").alias("html"),
    )

    def partition_sizes(df):
        rows = (
            df.withColumn("pid", F.spark_partition_id())
            .groupBy("pid")
            .count()
            .collect()
        )
        return [r["count"] for r in rows]

    unsalted = salted_repartition(docs, 32, hot=[], buckets=8, salt_buckets=16)
    salted = salted_repartition(
        docs, 32, hot=["hot.example"], buckets=8, salt_buckets=16
    )
    n_un = len(partition_sizes(unsalted))
    n_sa = len(partition_sizes(salted))
    assert n_un <= 8  # coarse buckets cap parallelism
    assert n_sa > n_un * 2  # salting restores it
    # placement only: same rows either way
    assert unsalted.count() == salted.count() == 4000


def test_hash_sampling_is_nested_and_deterministic(spark):
    """sample_hash(pct) slices nest (10% subset of 20%) and replay exactly."""
    from pdf_document_extractor_spark.operators.sampling import sample_hash

    docs = spark.range(2000).withColumnRenamed("id", "doc_id")
    s10 = {r.doc_id for r in sample_hash(docs, "doc_id", 10).collect()}
    s20 = {r.doc_id for r in sample_hash(docs, "doc_id", 20).collect()}
    assert s10 <= s20
    assert 100 <= len(s10) <= 300 and 280 <= len(s20) <= 520
    again = {r.doc_id for r in sample_hash(docs, "doc_id", 10).collect()}
    assert again == s10
    # different salt -> a different (deterministic) slice
    other = {r.doc_id for r in sample_hash(docs, "doc_id", 10, salt="x").collect()}
    assert other != s10


def test_chunk_reassembly_roundtrip(spark):
    """Dropping each chunk's leading `overlap` tokens (except chunk 0) and
    concatenating reproduces the original token stream exactly — no token
    lost, none duplicated (the training-corpus integrity property)."""
    import random

    from pyspark.sql import functions as F  # noqa: N812

    from pdf_document_extractor_spark.operators.chunking import (
        chunk_documents,
    )

    rng = random.Random(7)
    rows = []
    for i in range(50):
        n = rng.randint(1, 130)
        rows.append((i, " ".join(f"w{rng.randint(0, 9)}" for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(docs, chunk_size=20, overlap=5).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)):
        toks = r.chunk_text.split()
        if r.chunk_idx == 0:
            by_doc[r.doc_id] = toks
        else:
            # overlap region must MATCH the previous chunk's tail...
            assert by_doc[r.doc_id][-5:] == toks[:5] or len(toks) < 5
            # ...then contribute only the novel tail
            by_doc[r.doc_id].extend(toks[5:])
    for doc_id, text in rows:
        assert by_doc[doc_id] == text.split(), doc_id


def test_stratified_sample_rates_are_independent(spark):
    """Changing one stratum's rate must not reshuffle another stratum's
    sample (the hash keys on the row, not the stratum) — the property
    that makes mixture rates independently tunable across reruns."""
    from pdf_document_extractor_spark.operators.sampling import (
        stratified_sample,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source"
    )
    a = stratified_sample(docs, "doc_id", "source", {"src0": 50, "src1": 50})
    b = stratified_sample(docs, "doc_id", "source", {"src0": 50, "src1": 90})
    src0_a = {r.doc_id for r in a.filter("source = 'src0'").collect()}
    src0_b = {r.doc_id for r in b.filter("source = 'src0'").collect()}
    assert src0_a == src0_b
    # and raising a rate only ADDS rows within that stratum (nested samples)
    src1_a = {r.doc_id for r in a.filter("source = 'src1'").collect()}
    src1_b = {r.doc_id for r in b.filter("source = 'src1'").collect()}
    assert src1_a <= src1_b and len(src1_b) > len(src1_a)


def test_job_threads_output_format_to_extraction(spark, tmp_path):
    """The D4/M4 knob rides the job config end-to-end: a markdown run
    commits '# Page' content for PDFs while html content is untouched."""
    from pdf_document_extractor_spark.core.config import ExtractionConfig

    pages = pages_df_from_fixtures(spark, gen_scale_corpus(30))
    res = run_extraction_job(
        spark,
        pages,
        str(tmp_path / "wh"),
        "md-run",
        config=ExtractionConfig(output_format="markdown"),
    )
    assert res.committed
    rows = SnapshotTable(str(tmp_path / "wh"), "extracted").read(spark)
    pdf_rows = rows.filter("doc_type = 'pdf' AND status = 'success'")
    assert pdf_rows.count() > 0
    assert all(
        r.content.startswith("# Page ") for r in pdf_rows.collect()
    )
    html_rows = rows.filter("doc_type = 'html' AND status = 'success'")
    assert not any(
        r.content.startswith("# Page") for r in html_rows.collect()
    )


def test_asof_join_edges(spark):
    """At-or-before tie, no-predecessor NULL, per-key isolation."""
    from datetime import datetime

    from pdf_document_extractor_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    facts = spark.createDataFrame(
        [
            (1, t("2024-01-01T10:00"), 7),   # exact-ts tie with dim
            (2, t("2024-01-01T11:00"), 7),   # between dims
            (3, t("2024-01-01T09:00"), 7),   # before any dim -> NULL
            (4, t("2024-01-01T12:00"), 8),   # other key, no dim -> NULL
        ],
        "fact_id long, ts timestamp, user_id long",
    )
    dim = spark.createDataFrame(
        [
            (100, t("2024-01-01T10:00"), 7),
            (200, t("2024-01-01T10:30"), 7),
        ],
        "val long, ts timestamp, user_id long",
    )
    out = {
        r.fact_id: r.asof_value
        for r in asof_join(
            facts, dim, key="user_id", ts="ts", value_col="val"
        ).collect()
    }
    assert out == {1: 100, 2: 200, 3: None, 4: None}


def test_range_join_bucket_width_is_placement_only(spark):
    """Bucket width changes the candidate fan-out, never the result —
    including ranges spanning many buckets and boundary exclusivity."""
    from datetime import datetime

    from pdf_document_extractor_spark.operators.asof import range_join

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    facts = spark.createDataFrame(
        [
            (1, t("2024-01-01T10:00"), 7),
            (2, t("2024-01-01T12:59"), 7),
            (3, t("2024-01-01T13:00"), 7),  # end-exclusive: no match
            (4, t("2024-01-01T10:30"), 8),  # wrong key
        ],
        "fact_id long, ts timestamp, user_id long",
    )
    ranges = spark.createDataFrame(
        [(50, t("2024-01-01T10:00"), t("2024-01-01T13:00"), 7)],
        "range_id long, win_start timestamp, win_end timestamp, user_id long",
    )
    expect = {(1, 50), (2, 50)}
    for width in (60, 3600, 86400):
        got = {
            (r.fact_id, r.range_id)
            for r in range_join(
                facts, ranges, key="user_id", ts="ts",
                start="win_start", end="win_end", bucket_seconds=width,
            ).collect()
        }
        assert got == expect, width


def test_asof_join_null_semantics(spark):
    """NULL-ts dim rows never match; a NULL VALUE on the latest dim row
    is returned as NULL, never a stale earlier value (DuckDB ASOF
    parity)."""
    from datetime import datetime

    from pdf_document_extractor_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    facts = spark.createDataFrame(
        [(1, t("2024-01-01T10:00"), 7)],
        "fact_id long, ts timestamp, user_id long",
    )
    poison = spark.createDataFrame(
        [(999, None, 7)], "val long, ts timestamp, user_id long"
    )
    (row,) = asof_join(
        facts, poison, key="user_id", ts="ts", value_col="val"
    ).collect()
    assert row.asof_value is None  # NULL-ts dim is not 'before everything'

    stale = spark.createDataFrame(
        [(5, t("2024-01-01T09:00"), 7), (None, t("2024-01-01T09:30"), 7)],
        "val long, ts timestamp, user_id long",
    )
    (row,) = asof_join(
        facts, stale, key="user_id", ts="ts", value_col="val"
    ).collect()
    assert row.asof_value is None  # latest row's NULL, not the stale 5


def test_range_join_subsecond_boundary(spark):
    """A fractional range end crossing a bucket boundary must still match
    (unix-second truncation used to drop it)."""
    from datetime import datetime

    from pdf_document_extractor_spark.operators.asof import range_join

    facts = spark.createDataFrame(
        [(1, datetime.fromisoformat("2024-01-01T11:00:00.200"), 7)],
        "fact_id long, ts timestamp, user_id long",
    )
    ranges = spark.createDataFrame(
        [
            (
                50,
                datetime.fromisoformat("2024-01-01T10:00:00.400"),
                datetime.fromisoformat("2024-01-01T11:00:00.400"),
                7,
            )
        ],
        "range_id long, win_start timestamp, win_end timestamp, user_id long",
    )
    got = range_join(
        facts, ranges, key="user_id", ts="ts",
        start="win_start", end="win_end", bucket_seconds=3600,
    ).collect()
    assert [(r.fact_id, r.range_id) for r in got] == [(1, 50)]


def test_rollup_rejects_misordered_levels(spark):
    import pytest as _pytest

    from pdf_document_extractor_spark.operators.asof import (
        time_rollup_cascade,
    )

    events = spark.createDataFrame(
        [(1,)], "x long"
    ).selectExpr("timestamp'2024-01-01 10:30:00' as ts", "x as v")
    with _pytest.raises(ValueError, match="finest-to-coarsest"):
        time_rollup_cascade(events, "ts", "v", levels=("minute", "day", "hour"))
    with _pytest.raises(ValueError, match="finest-to-coarsest"):
        time_rollup_cascade(events, "ts", "v", levels=("minute", "fortnight"))


def test_rollup_rejects_nonterminal_week(spark):
    import pytest as _pytest

    from pdf_document_extractor_spark.operators.asof import (
        time_rollup_cascade,
    )

    events = spark.createDataFrame(
        [(1,)], "x long"
    ).selectExpr("timestamp'2024-01-01 10:30:00' as ts", "x as v")
    # week does not nest inside month: ('day','week','month') would
    # attribute a cross-month week's totals to the Monday's month
    with _pytest.raises(ValueError, match="week"):
        time_rollup_cascade(events, "ts", "v", levels=("day", "week", "month"))
    # terminal week is fine
    out = time_rollup_cascade(events, "ts", "v", levels=("day", "week"))
    assert {r.level for r in out.collect()} == {"day", "week"}


def test_asof_helper_column_collision_raises(spark):
    import pytest as _pytest

    from pdf_document_extractor_spark.operators.asof import (
        asof_join,
        range_join,
    )

    facts = spark.createDataFrame(
        [(1, 1)], "fact_id long, _bucket long"
    ).selectExpr("fact_id", "_bucket", "timestamp'2024-01-01' as ts")
    dim = spark.createDataFrame([(1, 2)], "fact_id long, v long").selectExpr(
        "fact_id", "v", "timestamp'2024-01-01' as ts"
    )
    with _pytest.raises(ValueError, match="_bucket"):
        range_join(facts, dim.selectExpr("fact_id", "ts as s", "ts as e"),
                   key="fact_id", ts="ts", start="s", end="e")
    facts2 = facts.withColumnRenamed("_bucket", "_mark")
    with _pytest.raises(ValueError, match="_mark"):
        asof_join(facts2, dim, key="fact_id", ts="ts", value_col="v")


def test_asof_bucketed_parity_on_skewed_key(spark):
    """asof_join_bucketed must be output-identical to asof_join on a
    deliberately skewed key (90% of facts on one key) across bucket
    widths, including NULL-ts facts, NULL dim values, exact-ts ties,
    and facts before any dim (bucket width is placement-only)."""
    import random
    from datetime import datetime, timedelta

    from pdf_document_extractor_spark.operators.asof import (
        asof_join,
        asof_join_bucketed,
    )

    rng = random.Random(7)
    base = datetime(2024, 1, 1)
    facts_rows = []
    for i in range(400):
        key = "hot" if i % 10 else f"cold{i % 7}"
        ts = None if i % 97 == 0 else base + timedelta(seconds=rng.randrange(0, 50_000))
        facts_rows.append((i, key, ts))
    dim_rows = []
    for j in range(60):
        key = "hot" if j % 3 else f"cold{j % 7}"
        ts = base + timedelta(seconds=rng.randrange(0, 50_000))
        val = None if j % 11 == 0 else j
        dim_rows.append((key, ts, val))
    # exact-tie witness: dim at exactly a fact ts
    dim_rows.append(("hot", facts_rows[1][2], 999))
    facts = spark.createDataFrame(facts_rows, "fact_id long, host string, ts timestamp")
    dim = spark.createDataFrame(dim_rows, "host string, ts timestamp, v long")

    want = sorted(
        (r.fact_id, r.asof_value)
        for r in asof_join(facts, dim, key="host", ts="ts", value_col="v").collect()
    )
    for width in (60, 3600, 100_000):
        got = sorted(
            (r.fact_id, r.asof_value)
            for r in asof_join_bucketed(
                facts, dim, key="host", ts="ts", value_col="v",
                bucket_seconds=width,
            ).collect()
        )
        assert got == want, f"bucket width {width} changed results"


def test_content_fallback_chain_m14(spark):
    """M14: extracted content > provided text > metadata JSON terminal
    (reference api_extraction_processor.py:316-344 coalesce chain)."""
    import json

    from pdf_document_extractor_spark.operators.extract import (
        coalesce_content,
        extract_pages,
    )
    from pdf_document_extractor_spark.sources.pages import (
        PAGES_SCHEMA,
        synth_html_payload,
    )

    rows = [
        # extractable html -> 'extracted'
        ("u1", None, synth_html_payload(1, "good body text"), "wet text", "en"),
        # corrupt pdf + provided text -> 'provided_text'
        ("u2", None, b"%PDF-1.4 broken", "salvaged wet text", "en"),
        # corrupt pdf + EMPTY provided text -> terminal metadata json
        ("u3", None, b"%PDF-1.4 broken", "", "en"),
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    out = {
        r["url"]: r
        for r in coalesce_content(extract_pages(pages), pages).collect()
    }
    assert out["u1"]["content_source"] == "extracted"
    assert out["u1"]["content_final"] == "good body text"
    assert out["u2"]["content_source"] == "provided_text"
    assert out["u2"]["content_final"] == "salvaged wet text"
    assert out["u3"]["content_source"] == "metadata_json"
    meta = json.loads(out["u3"]["content_final"])
    assert meta["url"] == "u3" and meta["error_type"]


def test_content_fallback_no_fanout_on_duplicate_urls(spark):
    """coalesce_content's left join against pages must not fan out
    extracted rows when the pages table carries duplicate urls (round-4
    advice: the provided-text projection is deduplicated on url)."""
    from pdf_document_extractor_spark.operators.extract import (
        coalesce_content,
        extract_pages,
    )
    from pdf_document_extractor_spark.sources.pages import (
        PAGES_SCHEMA,
        synth_html_payload,
    )

    rows = [
        ("dup", None, synth_html_payload(1, "body text"), "wet one", "en"),
        ("dup", None, synth_html_payload(1, "body text"), "wet two", "en"),
    ]
    pages = spark.createDataFrame(rows, schema=PAGES_SCHEMA)
    extracted = extract_pages(pages.dropDuplicates(["url"]))
    assert extracted.count() == 1
    out = coalesce_content(extracted, pages).collect()
    assert len(out) == 1, "duplicate pages urls fanned out extracted rows"
