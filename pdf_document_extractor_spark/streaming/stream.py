"""Streaming extraction: the reference's Kafka consume loop
(kafka_background_service.py:60-186), re-expressed as Structured Streaming.

readStream(pages) -> the SAME fused mapInPandas extraction operator ->
writeStream with checkpointing. Offset tracking + commit-after-process is
exactly what the checkpoint/WAL gives us (the at-least-once discipline of
the reference's manual ``kafka.commit()``; here end-to-end exactly-once for
the file sink). ``Trigger.AvailableNow`` is the batch-parity mode used in
tests; a production deployment points the same code at
``readStream.format("iceberg")`` or ``format("kafka")``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from ..operators.extract import extract_pages
from ..sources.pages import PAGES_SCHEMA

if TYPE_CHECKING:
    from pyspark.sql import SparkSession
    from pyspark.sql.streaming import StreamingQuery


def stream_extract_parquet_dir(
    spark: "SparkSession",
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> "StreamingQuery":
    """File-source streaming over a pages parquet directory -> parquet sink.

    New files dropped into ``pages_dir`` are picked up incrementally; the
    checkpoint guarantees each input file contributes exactly once to the
    sink (the snapshot-commit analog of the batch plan)."""
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )
    extracted = extract_pages(stream)
    writer = (
        extracted.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
