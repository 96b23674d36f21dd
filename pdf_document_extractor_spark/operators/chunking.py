"""Token-window document chunking (training-data prep).

Reference parity: ``DoclingConfig.chunk_size`` / ``overlap_size``
(src/models/docling_models.py:41-58; per-type tuning
processing_config_manager.py:88-237) — the reference carries the knobs, we
implement the operator the knobs describe.

Pure Catalyst expressions: tokens -> F.sequence of chunk starts ->
transform + slice + array_join. Stays in whole-stage codegen; one narrow
pass, no shuffle, no Python. PINNED semantics (oracle'd in
__spark_entry__.py):

  stride = chunk_size - overlap   (must be > 0)
  n_chunks = max(1, ceil((n_tokens - chunk_size) / stride) + 1)
  starts   = 0, stride, ..., (n_chunks - 1) * stride
  chunk_i  = tokens[start : start + chunk_size]

Generation STOPS once a chunk reaches the document end — a further start
would yield a chunk strictly contained in its predecessor, duplicating
training text. Every document yields >= 1 chunk; tok_start/tok_end are
0-based token offsets [start, min(start+chunk_size, n)).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import functions as F  # noqa: N812

from ..functions.text import tokens

if TYPE_CHECKING:
    from pyspark.sql import DataFrame


def chunk_documents(
    docs: "DataFrame", chunk_size: int = 20, overlap: int = 5
) -> "DataFrame":
    """(doc_id, text) -> (doc_id, chunk_idx, chunk_text, tok_start, tok_end,
    n_tokens). One row per chunk."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap

    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("n", F.size("toks"))
    # last start: smallest multiple of stride whose chunk reaches the end
    # = ceil((n - chunk_size) / stride) * stride, clamped to >= 0
    last_start = (
        F.greatest(
            F.lit(0),
            F.ceil((F.col("n") - F.lit(chunk_size)) / F.lit(stride)).cast(
                "int"
            ),
        )
        * stride
    )
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    exploded = toked.select(
        "doc_id",
        "toks",
        "n",
        F.posexplode(starts).alias("chunk_idx", "tok_start"),
    )
    chunk_toks = F.slice(
        F.col("toks"), F.col("tok_start") + 1, chunk_size
    )  # slice() is 1-based
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(chunk_toks, " ").alias("chunk_text"),
        F.col("tok_start").cast("long").alias("tok_start"),
        F.least(
            F.col("tok_start") + chunk_size, F.col("n")
        ).cast("long").alias("tok_end"),
        F.col("n").cast("long").alias("n_tokens"),
    )
