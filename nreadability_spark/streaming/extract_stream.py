"""Streaming extraction (SURVEY.md §7.7 made concrete).

The extraction UDF is stateless per row, so the same operator drops
into Structured Streaming unchanged:

    spark.readStream... -> extract_columns(...) -> writeStream

Pieces:
- ``extract_stream``: transcripts stream -> extracted stream. Identical
  column contract to the batch job minus the conversation-offset window
  (cumulative offsets over an unbounded stream require keyed state; see
  note below).
- ``windowed_turn_metrics``: event-time windowed aggregation with a
  watermark — the late-data-tolerant operational metrics stream
  (turns/minute, extraction rate, error rate).
- ``run_stream_to_parquet``: ``foreachBatch`` sink writing each
  micro-batch through the same bucketed-parquet path as the batch job;
  ``foreachBatch`` + deterministic extraction + per-bucket dynamic
  overwrite keeps restarts idempotent (the Iceberg MERGE analogue).

Conversation-cumulative offsets in a stream would use
``applyInPandasWithState`` keyed by conv_id; the batch job remains the
system of record for them (BASELINE.json's north rule is a batch table
at rest), so that stateful variant is intentionally not part of the
contract here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nreadability_spark.operators.extract import extract_columns

STREAM_OUTPUT_COLUMNS = [
    "conv_id",
    "turn_idx",
    "role",
    "tool",
    "ts",
    "title",
    "content_html",
    "content_text",
    "extracted",
    "next_page_url",
    "spans",
    "error",
]


def extract_stream(stream_df: DataFrame, options=None, include_html=True) -> DataFrame:
    """Streaming transcripts -> streaming extraction results (lazy)."""
    out = stream_df.select("conv_id", "turn_idx", "role", "tool", "ts", "text")
    out = out.where(F.col("text").isNotNull() & (F.length("text") > 0))
    out = extract_columns(out, options=options, include_html=include_html)
    return out.drop("text").select(*STREAM_OUTPUT_COLUMNS)


def windowed_turn_metrics(
    stream_df: DataFrame,
    window_duration: str = "1 minute",
    watermark_delay: str = "2 minutes",
    options=None,
) -> DataFrame:
    """Event-time windowed extraction metrics with late-data handling."""
    extracted = extract_stream(stream_df, options=options, include_html=False)
    return (
        extracted.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", window_duration).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum(F.col("extracted").cast("int")).alias("extracted_turns"),
            F.sum(F.length("content_text")).alias("chars"),
            F.count(F.col("error")).alias("errors"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "turns",
            "extracted_turns",
            "chars",
            "errors",
        )
    )


def run_stream_to_parquet(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    run_id: str = "stream",
    n_buckets: int = 8,
    options=None,
    include_html=True,
    trigger_available_now: bool = True,
):
    """Start the streaming extraction into bucketed parquet via
    foreachBatch; returns the StreamingQuery.

    Output partitions are keyed by (batch, bucket): dynamic partition
    overwrite then replaces exactly the partitions a micro-batch owns,
    so a crashed-and-restarted stream (checkpoint + deterministic UDF)
    rewrites its own partitions idempotently and never clobbers earlier
    batches sharing a bucket — the sandbox analogue of foreachBatch +
    Iceberg MERGE.
    """
    from nreadability_spark.sources import lineage

    extracted = extract_stream(stream_df, options=options, include_html=include_html)

    def write_batch(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        bucketed = lineage.with_bucket(batch_df, n_buckets).withColumn(
            "batch", F.lit(int(batch_id))
        )
        (
            bucketed.repartition(F.col(lineage.BUCKET_COL))
            .sortWithinPartitions("conv_id", "turn_idx")
            .write.mode("overwrite")
            .partitionBy("batch", lineage.BUCKET_COL)
            .parquet(str(out_path))
        )

    writer = extracted.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
