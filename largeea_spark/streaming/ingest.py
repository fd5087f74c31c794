"""Incremental page ingest via Structured Streaming (SURVEY.md §2.11).

The reference is batch-only; the north rule requires batch-with-
checkpoints. This module adds the natural incremental path on top of
the same stage tables: new page files landing in a directory are
processed exactly-once with ``Trigger.AvailableNow`` (drain-and-stop,
cron-friendly) into the ``triples_surface`` stage, reusing the SAME
extraction/emission logic as the batch plan — one code path, two
drivers.

Checkpoint dir = stream progress (file offsets); StageStore lineage
still applies to downstream batch phases.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.extract import emit_triples, extract_text

PAGE_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_pages(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a landing directory of page parquet files."""
    reader = spark.readStream.schema(PAGE_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(pages_dir)


def ingest_available_now(
    spark: SparkSession, pages_dir: str, out_dir: str, checkpoint_dir: str,
) -> int:
    """Drain all currently-available page files into the surface-triple
    sink exactly once; returns rows written this run. Re-running after
    new files land processes only the new files (offset checkpoint)."""
    pages = stream_pages(spark, pages_dir)
    extracted = extract_text(pages)
    triples = emit_triples(extracted.drop("text").withColumnRenamed("extracted_text", "text"))
    q = (
        triples.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n = spark.read.parquet(out_dir).count()
    return n
