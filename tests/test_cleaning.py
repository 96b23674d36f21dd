"""Corpus-cleaning operators: line dedup / PII redaction / blocklists."""

from __future__ import annotations

from pdf_document_extractor_spark.operators.cleaning import (
    blocklist_filter,
    line_dedup_c4,
    redact_pii,
)


def test_line_dedup_first_occurrence_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "unique one\nshared boilerplate line"),
            (2, "unique two\nshared boilerplate line"),
            (3, "shared boilerplate line"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in line_dedup_c4(docs).collect()}
    assert got[1].text == "unique one\nshared boilerplate line"
    assert got[2].text == "unique two"
    assert (got[2].kept_lines, got[2].dropped_lines) == (1, 1)
    assert 3 not in got  # lost its only line -> document disappears


def test_line_dedup_within_one_doc_and_blanks(spark):
    docs = spark.createDataFrame(
        [(1, "alpha\n\nalpha\n\nbeta")], "doc_id long, text string"
    )
    (row,) = line_dedup_c4(docs).collect()
    # the second 'alpha' drops; BOTH blank lines survive (structure)
    assert row.text == "alpha\n\n\nbeta"
    assert (row.kept_lines, row.dropped_lines) == (4, 1)


def test_redact_pii_patterns(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-y.co.uk and ip 192.168.001.1 ok"),
            (2, "card 4111111111111111 but not 123456789012345 (15)"),
            (3, "no pii at all here"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.redacted for r in redact_pii(docs).collect()}
    assert got[1] == "mail <EMAIL> and ip <IP> ok"
    assert got[2] == "card <NUM> but not 123456789012345 (15)"
    assert got[3] == "no pii at all here"


def test_blocklist_word_is_token_exact(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.com/x", "contains the word"),
            (2, "https://a.com/y", "theword is not split"),
            (3, "https://bad.com/z", "clean text"),
        ],
        "doc_id long, url string, text string",
    )
    hosts = spark.createDataFrame([("bad.com",)], "host string")
    words = spark.createDataFrame([("the",)], "word string")
    got = {r.doc_id: r for r in blocklist_filter(docs, hosts, words).collect()}
    assert got[1].word_blocked and not got[1].host_blocked
    assert not got[2].word_blocked  # 'theword' is NOT 'the'
    assert got[3].host_blocked and not got[3].word_blocked
    assert [got[i].keep for i in (1, 2, 3)] == [False, True, False]
