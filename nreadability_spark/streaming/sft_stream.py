"""Streaming SFT chat-template spans: running render offsets as state.

The batch operator (``operators/textops.sft_spans``) computes the
rendered example's per-assistant-turn loss-mask offsets with two
windows over the conversation; over an unbounded event stream the
running character offset is keyed state. ``applyInPandasWithState``
keyed by the conversation key (``user_id``):

- state per conversation: (next_start_offset,);
- each micro-batch's rows for a conversation process in
  (ts, event_id) order (one concat + one sort across Arrow chunks,
  same chunk-safety rule as ``stateful._offsets_fn``); EVERY turn
  advances the state, assistant turns also emit their
  [span_start, span_end);
- same monotone-arrival contract and idle-TTL semantics as
  ``stateful.stream_conv_offsets``.

``conv_len`` is deliberately NOT emitted: on an unbounded stream the
example's total length is unknowable until the conversation closes —
stream==batch parity is asserted on the span columns, which are final
at emit time (prefix sums never change retroactively under monotone
arrival).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

from nreadability_spark.operators.textops import SFT_END, SFT_ROLES

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

SFT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.LongType()),
        T.StructField("turn_id", T.LongType()),
        T.StructField("span_start", T.LongType()),
        T.StructField("span_end", T.LongType()),
    ]
)

SFT_STATE_SCHEMA = T.StructType([T.StructField("cum_chars", T.LongType())])

_END_LEN = len(SFT_END)


def _make_sft_fn(idle_timeout_ms):
    def _sft_fn(key, pdf_iter, state):
        import pandas as pd

        cols = ["conv_id", "turn_id", "span_start", "span_end"]
        empty = pd.DataFrame(columns=cols)
        if state.hasTimedOut:
            state.remove()
            yield empty
            return
        (conv_id,) = key
        (cum,) = state.get if state.exists else (0,)
        chunks = list(pdf_iter)
        if not chunks:
            yield empty
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(
            ["ts", "event_id"], kind="mergesort", ignore_index=True
        )
        roles = pdf["event_id"].map(lambda e: SFT_ROLES[int(e) % 3])
        header_len = roles.map(len).astype("int64") + 4  # <| |>
        text_len = (
            pdf["event_type"].fillna("").map(len).astype("int64")
            + 1
            + pdf["props"].fillna("").map(len).astype("int64")
        )
        turn_len = header_len + text_len + _END_LEN
        starts = turn_len.cumsum().shift(1, fill_value=0) + int(cum)
        state.update((int(cum) + int(turn_len.sum()),))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(int(idle_timeout_ms))
        mask = roles == "assistant"
        yield pd.DataFrame(
            {
                "conv_id": int(conv_id),
                "turn_id": pdf["event_id"][mask].astype("int64"),
                "span_start": (starts + header_len)[mask].astype("int64"),
                "span_end": (starts + header_len + text_len)[mask].astype("int64"),
            }
        )

    return _sft_fn


# module-level default (importable/picklable, used by tests)
_sft_fn = _make_sft_fn(None)


def stream_sft_spans(stream_df: DataFrame, idle_timeout_ms=None) -> DataFrame:
    """Streaming events -> per-assistant-turn loss-mask spans with the
    running render offset carried across micro-batches as keyed state.

    ``idle_timeout_ms``: optional state TTL — an idle conversation's
    offset state is evicted after that period (bounding the store); a
    conversation resuming after eviction restarts at offset 0, the
    same documented trade-off as ``stream_conv_offsets``."""
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return (
        stream_df.select("user_id", "event_id", "ts", "event_type", "props")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sft_fn(idle_timeout_ms),
            outputStructType=SFT_OUTPUT_SCHEMA,
            stateStructType=SFT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout_conf,
        )
    )
