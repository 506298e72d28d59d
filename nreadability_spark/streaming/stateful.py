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
- state TTL: by default state never expires (NoTimeout); passing
  ``idle_timeout_ms`` switches to ProcessingTimeTimeout and evicts a
  conversation's state after that idle period, bounding the store for
  finite conversations. A conversation that resumes *after* eviction
  restarts its offsets from 0 — the documented trade-off of a TTL; size
  it above the maximum expected conversation gap.
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


def _make_offsets_fn(idle_timeout_ms):
    def _offsets_fn(key, pdf_iter, state):
        import pandas as pd

        empty = pd.DataFrame(
            columns=["conv_id", "turn_idx", "content_len", "conv_offset", "extracted"]
        )
        if state.hasTimedOut:
            # idle TTL fired: evict this conversation's state
            state.remove()
            yield empty
            return
        (conv_id,) = key
        (cum,) = state.get if state.exists else (0,)
        # Materialize ALL Arrow chunks before sorting: a group larger than
        # maxRecordsPerBatch arrives as several chunks in arbitrary
        # post-shuffle order, so a per-chunk sort would accumulate
        # offsets out of turn_idx order. One concat + one sort is also
        # the vectorized path (no per-row Python).
        chunks = list(pdf_iter)
        if not chunks:
            yield empty
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values("turn_idx", kind="mergesort", ignore_index=True)
        lens = (
            pdf["content_text"]
            .map(lambda s: len(s) if isinstance(s, str) else 0)
            .astype("int64")
        )
        offsets = lens.cumsum().shift(1, fill_value=0) + int(cum)
        state.update((int(cum) + int(lens.sum()),))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(int(idle_timeout_ms))
        yield pd.DataFrame(
            {
                "conv_id": conv_id,
                "turn_idx": pdf["turn_idx"].astype("int32"),
                "content_len": lens,
                "conv_offset": offsets.astype("int64"),
                "extracted": pdf["extracted"].astype(bool),
            }
        )

    return _offsets_fn


# module-level default (importable/picklable, used by tests)
_offsets_fn = _make_offsets_fn(None)


def stream_conv_offsets(stream_df: DataFrame, options=None, idle_timeout_ms=None) -> DataFrame:
    """Streaming transcripts -> (conv_id, turn_idx, content_len,
    conv_offset, extracted) with state carried across micro-batches.

    ``idle_timeout_ms``: optional state TTL. When set, a conversation
    idle that long has its state evicted (bounding the state store); if
    it later resumes, offsets restart from 0."""
    extracted = extract_stream(stream_df, options=options, include_html=False)
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        extracted.select("conv_id", "turn_idx", "content_text", "extracted")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_offsets_fn(idle_timeout_ms),
            outputStructType=OFFSET_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
