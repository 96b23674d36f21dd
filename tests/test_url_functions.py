"""URL canonicalization edge cases (the gate oracle covers one shape)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: N812

from pdf_document_extractor_spark.functions.url import (
    canonicalize_url,
    host_of,
    registered_host,
)

CASES = [
    # (input, canonical, registered_host)
    ("https://WWW.Ex.COM:443/p?z=1&a=2#f", "https://www.ex.com/p?a=2&z=1", "ex.com"),
    ("http://ex.com:80/", "http://ex.com/", "ex.com"),
    ("http://ex.com:8080/x", "http://ex.com:8080/x", "ex.com"),  # non-default port kept
    ("https://ex.com", "https://ex.com/", "ex.com"),  # empty path -> /
    ("https://ex.com/a/B?x=1", "https://ex.com/a/B?x=1", "ex.com"),  # path case kept
    ("https://sub.ex.com/p#only-frag", "https://sub.ex.com/p", "sub.ex.com"),
    ("HTTP://EX.COM/q?", "http://ex.com/q", "ex.com"),  # empty query dropped
    # pinned rule 6: unparseable urls pass through unchanged (not ':///')
    ("example.com/x", "example.com/x", ""),
    ("/relative/path?b=2", "/relative/path?b=2", ""),
    ("", "", ""),
]


def test_canonicalize_edge_cases(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    got = df.select(
        "url",
        canonicalize_url(F.col("url")).alias("canon"),
        registered_host(F.col("url")).alias("rhost"),
        host_of(F.col("url")).alias("host"),
    ).collect()
    by_url = {r.url: r for r in got}
    for url, want_canon, want_rhost in CASES:
        assert by_url[url].canon == want_canon, (url, by_url[url].canon)
        assert by_url[url].rhost == want_rhost, (url, by_url[url].rhost)


def test_canonicalize_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c1"))
    twice = once.select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r.c1 == r.c2
