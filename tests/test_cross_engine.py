"""Cross-engine primitive parity: the functions/text.py Spark expressions
and their DuckDB twins must agree value-for-value — these primitives are
what every oracle in __spark_entry__.py is built from, so a drift here
would silently skew every gate query."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F  # noqa: N812

from pdf_document_extractor_spark.functions.text import (
    TOKENS_DUCK,
    h64,
    h64_duck,
    marker_score,
    marker_score_duck,
    stopword_count,
    stopword_count_duck,
    tokens,
)

SAMPLES = [
    "the quick brown fox",
    "der la of zai you is it",
    "",
    "  padded   whitespace\tand tabs  ",
    "punct! mixed-case? 123 digits",
]


def _duck_vals(sql: str) -> list:
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{s}')" for i, s in enumerate(SAMPLES))
                + ") v(i, s)")
    return [r[0] for r in con.execute(
        f"SELECT {sql} FROM t ORDER BY i").fetchall()]


def test_h64_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "i long, s string"
    )
    got = [
        r.h for r in df.select(h64(F.col("s")).alias("h"))
        .orderBy("i").collect()
    ]
    assert got == _duck_vals(h64_duck("s"))


def test_marker_and_stopword_parity(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SAMPLES)], "i long, s string"
    ).select("i", tokens(F.col("s")).alias("toks"))
    toks_duck = TOKENS_DUCK.format(expr="s")
    for lang in ("en", "de", "zh"):
        got = [
            r.m
            for r in df.select(marker_score("toks", lang).alias("m"), "i")
            .orderBy("i")
            .collect()
        ]
        assert got == _duck_vals(marker_score_duck(toks_duck, lang)), lang
    got = [
        r.c
        for r in df.select(stopword_count("toks").alias("c"), "i")
        .orderBy("i")
        .collect()
    ]
    assert got == _duck_vals(stopword_count_duck(toks_duck))
