"""Structured Streaming tests: the batch extraction operator must work
unchanged over a stream, streaming results must equal the batch results
on the same rows, and the windowed metrics must respect event time.
"""

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture()
def transcript_files(spark, tmp_path):
    """Transcripts split across two parquet files (two micro-batches
    under maxFilesPerTrigger=1)."""
    from nreadability_spark.sources.synth import transcripts_df

    src = str(tmp_path / "stream_src")
    df = transcripts_df(spark, 12)
    df.where("conv_id < 'conv00000006'").coalesce(1).write.parquet(src)
    df.where("conv_id >= 'conv00000006'").coalesce(1).write.mode("append").parquet(src)
    return src, df


def test_stream_extraction_equals_batch(spark, tmp_path, transcript_files):
    from nreadability_spark.plans.extract_job import extract_transcripts
    from nreadability_spark.sources.synth import TRANSCRIPTS_SCHEMA
    from nreadability_spark.streaming import run_stream_to_parquet

    src, batch_df = transcript_files
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    query = run_stream_to_parquet(stream, out, ckpt, include_html=False, n_buckets=4)
    query.awaitTermination(300)

    got = {
        (r["conv_id"], r["turn_idx"]): (r["extracted"], r["content_text"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): (r["extracted"], r["content_text"])
        for r in extract_transcripts(
            spark.read.parquet(src), include_html=False, with_conv_offset=False
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stream_restart_is_idempotent(spark, tmp_path, transcript_files):
    from nreadability_spark.sources.synth import TRANSCRIPTS_SCHEMA
    from nreadability_spark.streaming import run_stream_to_parquet

    src, _ = transcript_files
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")

    def run_once():
        stream = (
            spark.readStream.schema(TRANSCRIPTS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = run_stream_to_parquet(stream, out, ckpt, include_html=False, n_buckets=4)
        q.awaitTermination(300)

    run_once()
    first = sorted(
        (r["conv_id"], r["turn_idx"], r["content_text"])
        for r in spark.read.parquet(out).collect()
    )
    run_once()  # availableNow restart over the same checkpoint: no-op
    second = sorted(
        (r["conv_id"], r["turn_idx"], r["content_text"])
        for r in spark.read.parquet(out).collect()
    )
    assert first == second


def test_windowed_metrics_by_event_time(spark, tmp_path, transcript_files):
    from nreadability_spark.sources.synth import TRANSCRIPTS_SCHEMA
    from nreadability_spark.streaming import windowed_turn_metrics

    src, batch_df = transcript_files
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(src)
    metrics = windowed_turn_metrics(stream, window_duration="1 minute")

    q = (
        metrics.writeStream.format("memory")
        .queryName("turn_metrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from turn_metrics").collect()
    # watermark closes all but the trailing window(s); every emitted
    # window must be consistent and non-overlapping
    assert rows, "expected at least one closed window"
    for r in rows:
        assert r["turns"] >= r["extracted_turns"] >= 0
        assert (r["window_end"] - r["window_start"]).total_seconds() == 60
    starts = [r["window_start"] for r in rows]
    assert len(starts) == len(set(starts))


def test_stateful_conv_offsets_across_batches(spark, tmp_path):
    """conv_offset computed with applyInPandasWithState over a stream
    (conversations split across micro-batches) must equal the batch
    window's conv_offset."""
    from nreadability_spark.plans.extract_job import extract_transcripts
    from nreadability_spark.sources.synth import TRANSCRIPTS_SCHEMA, transcripts_df
    from nreadability_spark.streaming.stateful import stream_conv_offsets

    src = str(tmp_path / "split_src")
    df = transcripts_df(spark, 10)
    # split every conversation across two files at turn_idx 3: state
    # must carry the running total across the batch boundary
    df.where("turn_idx < 3").coalesce(1).write.parquet(src)
    df.where("turn_idx >= 3").coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream_conv_offsets(stream)
        .writeStream.format("memory")
        .queryName("conv_offsets")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["conv_id"], r["turn_idx"]): r["conv_offset"]
        for r in spark.sql("select * from conv_offsets").collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): r["conv_offset"]
        for r in extract_transcripts(spark.read.parquet(src), include_html=False).collect()
    }
    assert got == want and len(got) > 0
