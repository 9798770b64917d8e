"""Structured Streaming rendering of the extraction pipeline.

The reference is batch-only (SURVEY.md §2.10: no streaming operators exist),
but the production shape of "extraction over an ever-growing transcript
table" is an incremental job: new parquet files land under the input path,
each micro-batch runs the SAME Arrow kernel, and Spark's checkpoint gives
exactly-once file-source progress tracking — the streaming twin of
``checkpoint.run_resumable``'s manifest.

Two entry points:

- :func:`stream_extract` — readStream → one ``mapInPandas`` crossing →
  append-mode parquet sink (per-turn results, same schema as the batch job);
- :func:`stream_status_counts` — event-time tumbling-window status metrics
  with a watermark for late data (the lineage analog, windowed by turn ``ts``).

Both accept ``availableNow`` trigger for drain-and-stop semantics (used by
tests and backfills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as sf

from br_doc_ocr_spark.core.extract import OUTPUT_SCHEMA_DDL, extract_batches
from br_doc_ocr_spark.pipeline import TRANSCRIPT_COLUMNS

TRANSCRIPT_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)


def read_transcript_stream(spark: SparkSession, input_path: str,
                           max_files_per_trigger: int | None = None) -> DataFrame:
    reader = (spark.readStream.schema(TRANSCRIPT_SCHEMA_DDL)
              .option("recursiveFileLookup", "true"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_path).select(*TRANSCRIPT_COLUMNS)


def extract_stream(transcripts: DataFrame) -> DataFrame:
    """The same shared kernel, applied per micro-batch. No shuffle needed:
    extraction is a per-row map, so each file split maps straight through
    (salting matters only for the batch job's giant-partition case; a
    micro-batch is already bounded by maxFilesPerTrigger)."""
    return transcripts.mapInPandas(extract_batches, schema=OUTPUT_SCHEMA_DDL)


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Incremental extraction: file-source stream → kernel → parquet append.

    Exactly-once per input file via the streaming checkpoint (file-source
    offsets + sink commit log) — restartable mid-stream.
    """
    results = extract_stream(
        read_transcript_stream(spark, input_path, max_files_per_trigger))
    writer = (results.writeStream.format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def status_counts(results: DataFrame, window: str = "1 hour",
                  watermark: str = "2 hours") -> DataFrame:
    """Event-time windowed status tallies with late-data tolerance —
    the streaming lineage table (counts only; PII-free by schema)."""
    return (results.withWatermark("ts", watermark)
            .groupBy(sf.window("ts", window).alias("w"), "status")
            .agg(sf.count("*").alias("n_turns"),
                 sf.sum("n_fields").alias("total_fields"))
            .select(sf.col("w.start").alias("window_start"),
                    sf.col("w.end").alias("window_end"),
                    "status", "n_turns", "total_fields"))


def stream_status_counts(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = False,
):
    counts = status_counts(extract_stream(read_transcript_stream(spark, input_path)))
    writer = (counts.writeStream.format("parquet")
              .option("path", output_path)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
