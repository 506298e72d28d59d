"""The end-to-end extraction job (SURVEY.md §3.4):

    scan -> null-prefilter -> salted repartition -> Arrow-batched
    extraction UDF -> conversation window (cumulative offsets) ->
    bucketed, sorted, lineage-committed write

Scale design notes (the parts that must survive 1000 executors / 100 TB):

- **pre-filter pushes down**: the null/empty text filter is a native
  ``where`` before the UDF, so it reaches the parquet/Iceberg scan
  (PushedFilters), and column pruning keeps the scan to the 6 input
  columns;
- **payload-length skew, not key skew**: extraction is row-local, so the
  UDF stage is decorrelated from conversation length by repartitioning
  on ``xxhash64(conv_id, turn_idx)`` — a 10k-turn conversation spreads
  over the whole cluster instead of pinning one task;
- **one keyed shuffle**: only the conversation-offset window shuffles by
  ``conv_id``; it runs on a *narrow* projection (key + ordering + one
  length) and rejoins nothing — the wide payload travels once, into the
  bucketed write (which needs conv_id partitioning anyway);
- **AQE on**: runtime coalescing + skew splitting for both shuffles;
- **Arrow batch cap**: large HTML rows x default 10k-row batches would
  be GiB-scale per worker; ``tune_session`` caps records per batch.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from nreadability_spark.operators.extract import extract_columns
from nreadability_spark.sources import lineage

OUTPUT_COLUMNS = [
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
    "conv_offset",
    "error",
]


def tune_session(spark, arrow_batch_rows=512):
    """Session knobs the job depends on; idempotent."""
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark


def with_conv_offsets_two_phase(df, block_size=1024, length_col="content_text"):
    """Conversation-cumulative char offsets via a two-phase salted
    aggregation (SURVEY.md §4.3.2) — the skew-proof alternative to the
    plain window for pathological conversations.

    The plain ``Window.partitionBy(conv_id)`` puts an entire
    conversation in ONE task; a 10^6-turn conversation pins it (AQE can
    split skewed *joins* but not window partitions). Two phases bound
    every partition:

    1. block sums: turns group into ``turn_idx // block_size`` blocks;
       per-(conv, block) char sums are a hash aggregate (map-side
       partial, no skew);
    2. block prefix: an exclusive running sum over a conversation's
       block sums — a window over ``n_turns / block_size`` rows per
       conversation (10^6 turns -> ~1k rows: trivial);
    3. within-block prefix: a window partitioned by (conv, block) —
       at most ``block_size`` rows per partition, by construction.

    ``conv_offset = block_prefix + within_block_prefix``. Exactly
    equals the single-window result (tests assert it).
    """
    # integer div (not double division + cast — exact only below 2^53;
    # turn_idx is int32 today, but the offset arithmetic pattern is
    # uniform with sequence_packing's, which does exceed it)
    blk = F.expr(f"turn_idx div {block_size}")
    out = df.withColumn("_blk", blk).withColumn(
        "_len", F.coalesce(F.length(length_col).cast("long"), F.lit(0))
    )

    blk_sums = out.groupBy("conv_id", "_blk").agg(F.sum("_len").alias("_blk_chars"))
    w_blk = (
        Window.partitionBy("conv_id")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blk_prefix = blk_sums.select(
        "conv_id",
        "_blk",
        F.coalesce(F.sum("_blk_chars").over(w_blk), F.lit(0)).alias("_blk_prefix"),
    )

    w_in = (
        Window.partitionBy("conv_id", "_blk")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        out.join(blk_prefix, ["conv_id", "_blk"])
        .withColumn(
            "conv_offset",
            (
                F.col("_blk_prefix")
                + F.coalesce(F.sum("_len").over(w_in), F.lit(0))
            ).cast("long"),
        )
        .drop("_blk", "_len", "_blk_prefix")
    )
    return out


def extract_transcripts(
    df,
    options=None,
    include_html=True,
    salt_partitions="auto",
    with_conv_offset=True,
    conv_offset_strategy="window",
):
    """Transcripts DataFrame -> extracted DataFrame (lazy; no action).

    ``salt_partitions``: explicit shuffle decorrelating payload skew
    before the UDF stage — long conversations and heavy payloads (150 KB
    pages cost ~50x a chat turn) otherwise pin whole tasks, and AQE
    cannot rebalance *inside* the UDF stage. "auto" = 2x the cluster's
    default parallelism — measured optimum on local[32] (2x beats 1x by
    ~60% via finer skew spreading, and beats 4x-10x, where per-task
    Arrow/runner overhead dominates). Pass None to disable when the
    input is already hash-distributed.
    """
    out = df.select("conv_id", "turn_idx", "role", "tool", "ts", "text")
    # native prefilter (reaches the scan); null/empty rows short-circuit
    # inside the UDF anyway, but skipping them avoids shipping the rows
    out = out.where(F.col("text").isNotNull() & (F.length("text") > 0))

    if salt_partitions == "auto":
        salt_partitions = 2 * df.sparkSession.sparkContext.defaultParallelism
    if salt_partitions:
        out = out.repartition(salt_partitions, F.xxhash64("conv_id", "turn_idx"))

    out = extract_columns(out, options=options, include_html=include_html)
    out = out.drop("text")

    if with_conv_offset and conv_offset_strategy == "two_phase":
        # skew-proof offsets for pathological conversations (§4.3.2)
        out = with_conv_offsets_two_phase(out)
    elif with_conv_offset:
        # cumulative char offset of each turn within its conversation:
        # the only conv_id-keyed shuffle in the job
        w = (
            Window.partitionBy("conv_id")
            .orderBy("turn_idx")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        out = out.withColumn(
            "conv_offset",
            F.coalesce(F.sum(F.length("content_text")).over(w), F.lit(0)).cast("long"),
        )
    else:
        out = out.withColumn("conv_offset", F.lit(0).cast("long"))

    return out.select(*OUTPUT_COLUMNS)


def run_extract_job(
    spark,
    source_df,
    out_path,
    run_id=None,
    n_buckets=32,
    options=None,
    include_html=True,
    salt_partitions="auto",
    resume=True,
    observe=True,
):
    """Full job with lineage commits and optional resume.

    Returns a dict with run metrics (rows, wall seconds, buckets).
    """
    tune_session(spark)
    run_id = run_id or uuid.uuid4().hex

    df = source_df
    skip_buckets = ()
    if resume:
        skip_buckets = tuple(sorted(lineage.committed_buckets(out_path)))
        df = lineage.filter_uncommitted(df, out_path, n_buckets)
        df = df.drop(lineage.BUCKET_COL)

    extracted = extract_transcripts(
        df,
        options=options,
        include_html=include_html,
        salt_partitions=salt_partitions,
    )

    if observe:
        extracted = extracted.observe(
            "extract_metrics",
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.col("extracted").cast("int")).alias("extracted_rows"),
            F.sum(F.length("content_text")).alias("chars"),
            F.count(F.col("error")).alias("errors"),
        )

    t0 = time.monotonic()
    stats = lineage.write_partitioned(
        extracted, out_path, run_id, n_buckets, skip_buckets=skip_buckets
    )
    wall = time.monotonic() - t0

    total_rows = sum(m["rows"] for m in stats.values())
    return {
        "run_id": run_id,
        "buckets_written": len(stats),
        "rows": total_rows,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(total_rows / wall, 1) if wall > 0 else None,
    }
