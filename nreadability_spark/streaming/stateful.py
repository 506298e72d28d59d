"""Stateful streaming: conversation-cumulative offsets over a stream.

The batch job computes ``conv_offset`` (cumulative character offset of
each turn within its conversation) with a window; over an unbounded
stream the running total is keyed state. This module implements it with
``applyInPandasWithState`` keyed by ``conv_id``:

- state per conversation: (next_turn_offset_chars,);
- each micro-batch's rows for a conversation are processed in
  ``turn_idx`` order; the state carries the running character total
  across micro-batches;
- correctness requires per-conversation monotone arrival across
  batches (turns of a conversation do not arrive out of order after a
  batch boundary) — the natural property of an append-only transcript
  CDC feed ordered by turn; within a batch, order is enforced by
  sorting on ``turn_idx``;
- state never expires here (NoTimeout): a production deployment with
  finite conversations would set an idle timeout and drop state for
  closed conversations to bound the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from nreadability_spark.streaming.extract_stream import extract_stream

OFFSET_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("content_len", T.LongType()),
        T.StructField("conv_offset", T.LongType()),
        T.StructField("extracted", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType([T.StructField("cum_chars", T.LongType())])


def _offsets_fn(key, pdf_iter, state):
    import pandas as pd

    (conv_id,) = key
    (cum,) = state.get if state.exists else (0,)
    out = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("turn_idx")
        for _, row in pdf.iterrows():
            n = len(row["content_text"]) if isinstance(row["content_text"], str) else 0
            out.append((conv_id, int(row["turn_idx"]), n, int(cum), bool(row["extracted"])))
            cum += n
    state.update((int(cum),))
    yield pd.DataFrame(
        out, columns=["conv_id", "turn_idx", "content_len", "conv_offset", "extracted"]
    )


def stream_conv_offsets(stream_df: DataFrame, options=None) -> DataFrame:
    """Streaming transcripts -> (conv_id, turn_idx, content_len,
    conv_offset, extracted) with state carried across micro-batches."""
    extracted = extract_stream(stream_df, options=options, include_html=False)
    return (
        extracted.select("conv_id", "turn_idx", "content_text", "extracted")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _offsets_fn,
            outputStructType=OFFSET_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
