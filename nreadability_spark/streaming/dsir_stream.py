"""Streaming DSIR scoring: fit the bucket model offline, score the
ingest online.

The second train-offline/apply-online composition (the first is the
logistic quality filter, ``score_stream.py``): the (b, lw_micro)
importance-weight table is fitted in a batch job over corpus + target
sample (``jobs/fit_models.py`` writes it as the ``dsir_buckets``
parquet model table), then every arriving document is scored in-stream
by the SAME ``operators.textops.dsir_score_frame`` the batch path
uses — one code path, so online == offline by construction (asserted
by the stream-equals-batch test).

Scale shape: stateless across micro-batches — no state store, no
watermark. Within a micro-batch: map-side shingle features, a
broadcast of the B-row model, one hash agg keyed by doc_id (each
document's text arrives as one row, so the batch-local agg is exact).
Output partitions are keyed by micro-batch id with dynamic partition
overwrite, so a crashed-and-restarted stream rewrites exactly its own
partitions — the same idempotence contract as the extraction stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nreadability_spark.operators.textops import DSIR_BUCKETS, dsir_score_frame


def run_dsir_stream_to_parquet(
    stream_df: DataFrame,
    model: DataFrame,
    out_path: str,
    checkpoint_path: str,
    buckets: int = DSIR_BUCKETS,
    trigger_available_now: bool = True,
):
    """Score a streaming (doc_id, text) relation against the fitted
    bucket model into batch-partitioned parquet; returns the
    StreamingQuery. ``model`` is the persisted (b, lw_micro) table
    (read it from ``<fit_models --out>/dsir_buckets``)."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        spark = batch_df.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            dsir_score_frame(batch_df, model, buckets)
            .withColumn("batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .partitionBy("batch")
            .parquet(str(out_path))
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
