"""Deterministic sampling / splits / decontamination for training corpora.

No F.rand(): randomness would break replay (same job, same input, same
output — the determinism policy that also removed uuid4/now() from the
extraction path). Sampling keys on the cross-engine md5-prefix hash
(functions/text.h64), so every split is reproducible AND expressible in
the DuckDB oracle.

Decontamination is the standard pretraining hygiene step: drop/flag corpus
documents sharing long n-grams with an evaluation benchmark. Implemented
as a shingle inverted-index semi-join — the benchmark side is tiny and
broadcasts; the corpus side never shuffles its text.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F  # noqa: N812

from ..functions.text import h64

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def sample_hash(df: "DataFrame", key_col: str, pct: int, salt: str = "") -> "DataFrame":
    """Keep rows where h64(salt || key) % 100 < pct. Deterministic,
    replayable, oracle-expressible; at scale it is a scan-level filter
    (no shuffle, combines with predicate pushdown on other columns)."""
    bucket = h64(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % 100
    return df.filter(bucket < pct)


def train_val_split(
    df: "DataFrame", key_col: str, val_pct: int = 10, salt: str = "split"
) -> "DataFrame":
    """Adds a 'split' column: 'val' for the val_pct hash slice, 'train'
    otherwise. Single pass, no shuffle, stable across reruns."""
    bucket = h64(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % 100
    return df.withColumn(
        "split", F.when(bucket < val_pct, "val").otherwise("train")
    )


def stratified_sample(
    df: "DataFrame",
    key_col: str,
    strata_col: str,
    fractions: dict[str, int],
    default_pct: int = 0,
    salt: str = "strat",
) -> "DataFrame":
    """Per-stratum deterministic sampling — the training-MIX builder
    (e.g. keep 100% of curated source A, 25% of crawl source B): keep a
    row iff h64(salt || key) % 100 < fractions[stratum] (``default_pct``
    for unlisted strata). The hash keys on the ROW, not the stratum, so
    changing one stratum's rate never reshuffles another's sample —
    rates are independently tunable across reruns. Scan-level filter,
    no shuffle, oracle-expressible."""
    bucket = h64(F.concat(F.lit(salt), F.col(key_col).cast("string"))) % 100
    pct = F.lit(default_pct)
    for value, p in sorted(fractions.items()):
        pct = F.when(F.col(strata_col) == value, F.lit(p)).otherwise(pct)
    return df.filter(bucket < pct)


def contamination_flags(
    docs: "DataFrame",
    benchmark: "DataFrame",
    n: int = 3,
    min_shared: int = 8,
) -> "DataFrame":
    """(doc_id, shared_shingles, contaminated) per corpus doc.

    A doc is contaminated iff it shares >= min_shared distinct word
    n-grams with ANY text in ``benchmark(text)``. Benchmark shingles are
    deduped and broadcast-joined against the corpus shingle index — the
    corpus is scanned once; no corpus-side self-join."""
    from .dedup import shingles

    doc_sh = shingles(docs, n)
    bench_sh = (
        shingles(
            benchmark.select(
                F.monotonically_increasing_id().alias("doc_id"), "text"
            ),
            n,
        )
        .select("shingle")
        .distinct()
    )
    shared = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_shingles"))
    )
    return (
        docs.select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("shared_shingles", F.lit(0))
            .cast("long")
            .alias("shared_shingles"),
            (F.coalesce("shared_shingles", F.lit(0)) >= min_shared)
            .cast("long")
            .alias("contaminated"),
        )
    )
