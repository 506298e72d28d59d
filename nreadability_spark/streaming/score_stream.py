"""Streaming quality scoring: train offline, score the ingest online.

The deployment composition the quality filter actually runs in: the
logistic-regression weights are FITTED in a batch job over the corpus
at rest (``jobs/fit_models.py`` writes them as a parquet model table),
then every arriving document is scored in-stream with the same
map-side feature + logit expressions the batch apply uses — one code
path (``operators/classifier.featurize`` / ``score_frame``), so the
online score can never drift from the offline one (asserted by the
stream-equals-batch test).

Scale shape: the scoring stream is STATELESS — no state store, no
watermark, no shuffle; each micro-batch is a map-side expression pass
with the F model weights as literals (at 100 TB: a broadcast of F
doubles riding the closure). Throughput is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nreadability_spark.operators.classifier import score_frame


def quality_score_stream(stream: DataFrame, weights: list) -> DataFrame:
    """(doc_id, logit_micro, pred) over a streaming (doc_id, text)
    relation, using batch-fitted weights."""
    return score_frame(stream, weights)


def run_score_stream_to_parquet(
    stream: DataFrame, weights: list, out_dir: str, checkpoint_dir: str
):
    """availableNow scoring run with an exactly-once parquet sink."""
    return (
        quality_score_stream(stream, weights)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
