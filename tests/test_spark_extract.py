"""Spark-level tests: the distributed extraction job must agree per-turn
with the single-process core, and resume must be idempotent
(BASELINE.md per-turn invariant + resume rows)."""

import pytest

from nreadability_spark.core import extract
from nreadability_spark.plans.extract_job import extract_transcripts, run_extract_job
from nreadability_spark.sources import lineage
from nreadability_spark.sources.synth import generate_conversation, load_fixture_payloads, transcripts_df

pytestmark = pytest.mark.spark

N_CONVS = 40  # includes conv 0: the long skewed conversation


def test_synth_generator_deterministic(spark):
    a = transcripts_df(spark, 10).collect()
    b = transcripts_df(spark, 10).collect()
    assert sorted(a) == sorted(b)
    # schema contract (BASELINE.json input_hint)
    assert [f.name for f in transcripts_df(spark, 1).schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_spark_output_equals_local_core_per_turn(spark):
    source = transcripts_df(spark, N_CONVS, long_every=37)
    result = extract_transcripts(source, include_html=True)
    spark_rows = {
        (r["conv_id"], r["turn_idx"]): r
        for r in result.collect()
    }

    fixtures = load_fixture_payloads()
    checked = 0
    offsets = {}
    for conv_idx in range(N_CONVS):
        conv_offset = 0
        for row in generate_conversation(conv_idx, fixtures, long_every=37):
            conv_id, turn_idx, _role, text, _tool, _ts = row
            key = (conv_id, turn_idx)
            if text is None or text == "":
                assert key not in spark_rows  # prefiltered
                continue
            local = extract(text)
            got = spark_rows[key]
            assert got["content_text"] == local.content_text, key
            assert got["title"] == local.title, key
            assert got["extracted"] == local.extracted, key
            assert got["error"] is None, key
            assert [(s["start"], s["end"]) for s in got["spans"]] == local.spans, key
            # window invariant: cumulative chars of prior surviving turns
            assert got["conv_offset"] == conv_offset, key
            conv_offset += len(got["content_text"])
            checked += 1
    assert checked > 100


def test_extract_job_write_and_resume_idempotent(spark, tmp_path):
    source = transcripts_df(spark, 20, long_every=0)
    out_full = tmp_path / "full"
    out_resumed = tmp_path / "resumed"

    # single-shot run
    metrics = run_extract_job(spark, source, str(out_full), n_buckets=8, include_html=False)
    assert metrics["rows"] > 0
    assert metrics["buckets_written"] == len(lineage.committed_buckets(out_full))

    # simulated crash: only half the buckets get written+committed
    partial = lineage.with_bucket(source, 8).where("bucket < 4").drop("bucket")
    run_extract_job(spark, partial, str(out_resumed), n_buckets=8, include_html=False)
    committed_before = set(lineage.committed_buckets(out_resumed))
    assert committed_before and len(committed_before) < 8

    # resume: full source, already-committed buckets skipped
    metrics2 = run_extract_job(spark, source, str(out_resumed), n_buckets=8, include_html=False)
    all_buckets = set(lineage.committed_buckets(out_full))
    assert set(lineage.committed_buckets(out_resumed)) == all_buckets
    # resumed run only wrote the buckets missing after the simulated crash
    assert metrics2["buckets_written"] == len(all_buckets - committed_before)

    full = spark.read.parquet(str(out_full)).orderBy("conv_id", "turn_idx").collect()
    resumed = spark.read.parquet(str(out_resumed)).orderBy("conv_id", "turn_idx").collect()
    assert full == resumed


def test_rerun_over_committed_output_is_noop(spark, tmp_path):
    source = transcripts_df(spark, 6, long_every=0)
    out = tmp_path / "out"
    run_extract_job(spark, source, str(out), n_buckets=4, include_html=False)
    before = spark.read.parquet(str(out)).orderBy("conv_id", "turn_idx").collect()
    metrics = run_extract_job(spark, source, str(out), n_buckets=4, include_html=False)
    assert metrics["rows"] == 0 and metrics["buckets_written"] == 0
    after = spark.read.parquet(str(out)).orderBy("conv_id", "turn_idx").collect()
    assert before == after


def test_hostile_rows_set_error_not_fail(spark):
    import pandas as pd

    from nreadability_spark.operators.extract import extract_columns

    pdf = pd.DataFrame(
        {
            "conv_id": ["c1"] * 3,
            "turn_idx": [0, 1, 2],
            "role": ["user"] * 3,
            "tool": [None] * 3,
            "ts": pd.to_datetime(["2026-01-01"] * 3),
            "text": ["<div>" * 30000 + "deep", "<p>fine paragraph here</p>", "\x00\x01garbage"],
        }
    )
    df = spark.createDataFrame(pdf)
    rows = {r["turn_idx"]: r for r in extract_columns(df).collect()}
    assert len(rows) == 3  # no task failure
    assert rows[1]["error"] is None


def test_two_phase_offsets_equal_window_offsets(spark):
    """The skew-proof two-phase offset computation (SURVEY §4.3.2) must
    agree exactly with the plain window, including on the long skewed
    conversation and across block boundaries."""
    source = transcripts_df(spark, 12, long_every=5)  # several long convs
    window_out = {
        (r["conv_id"], r["turn_idx"]): r["conv_offset"]
        for r in extract_transcripts(source, include_html=False).collect()
    }
    two_phase_out = {
        (r["conv_id"], r["turn_idx"]): r["conv_offset"]
        for r in extract_transcripts(
            source, include_html=False, conv_offset_strategy="two_phase"
        ).collect()
    }
    assert window_out == two_phase_out


def test_two_phase_offsets_cross_block_carry(spark):
    """Exercise the block-prefix carry with a block size smaller than
    the conversations (block_size=7 over 600-turn conversations)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nreadability_spark.plans.extract_job import with_conv_offsets_two_phase

    df = transcripts_df(spark, 3, long_every=1).select(
        "conv_id", "turn_idx", F.coalesce("text", F.lit("")).alias("content_text")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = {
        (r["conv_id"], r["turn_idx"]): r["off"]
        for r in df.withColumn(
            "off", F.coalesce(F.sum(F.length("content_text")).over(w), F.lit(0)).cast("long")
        ).collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"]): r["conv_offset"]
        for r in with_conv_offsets_two_phase(df, block_size=7).collect()
    }
    assert got == want
    assert max(t for _, t in got) >= 599  # many blocks per conversation
