"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query runs against the `noop` sink, which forces full execution of
the plan (no collect bottleneck on the driver, no output I/O) — the
closest local analogue of "write to the lake".

The extraction throughput measurement (the BASELINE.json headline
metric, turns/sec) runs the full north-rule pipeline — deterministic
synthetic transcripts (reference fixtures embedded) -> Arrow-batched
extraction UDF -> conversation window — and reports turns/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "rel_pricing_summary",
    "rel_revenue_by_nation",
    "rel_brand_revenue",
    "rel_user_event_sequences",
    "rel_order_priority_rollup",
    "text_token_stats",
    "text_quality_scores",
    "text_fingerprints",
    "dedup_exact_groups",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_knn_brute_force",
    "sim_knn_ivf",
    "sim_knn_pq",
    "sim_knn_ivf_pq",
    "sim_knn_ivf_pq_residual",
    "sim_semantic_dedup",
    "text_dsir_select",
    "multimodal_decode_meta",
    "multimodal_image_pixels",
    "multimodal_image_resize",
    "multimodal_frame_pixels",
    "multimodal_audio_meta",
    "rel_event_sessions",
    "rel_asof_join",
    "dedup_embedding_cosine",
    "sim_centroid_fit",
    "text_bottomk_containment",
    "text_sequence_packing",
    "text_unigram_logprob",
    "text_bigram_logprob",
    "text_line_dedup",
    "text_source_mixture",
    "rel_price_quantiles_approx",
    "rel_approx_distinct",
    "rel_small_qty_revenue",
    "rel_range_join_followers",
    "text_span_dedup",
    "text_tfidf_keywords",
    "text_token_cms",
    "text_hashed_embeddings",
    "text_bpe_encode",
    "text_quality_classifier_apply",
    "rel_rolling_revenue",
    "pipeline_clean_corpus",
    "pipeline_training_ready",
    "pipeline_cluster_topics",
    "extract_doc_pages",
    "extract_warc_pages",
    "extract_mixed_media",
    "extract_stitch_conversations",
]

# 2400 conversations (~31k turns) puts the throughput headline in the
# steady-state regime of BENCH/BASELINE.md — at 400 convs fixed job
# overhead dominated and understated turns/sec by ~40%
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "2400"))


def _noop_run(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from nreadability_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="nreadability-bench",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # JVM / codegen warmup outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # headline extraction throughput FIRST, in the fresh session — after
    # dozens of query runs the same JVM measures ~2-3x slower for this
    # (accumulated broadcast/codegen/GC state), which is session bloat,
    # not pipeline cost. Protocol matches bench/scaling_bench.py: warm
    # every Python worker, one untimed steady-state pass, best of 2.
    from nreadability_spark.plans.extract_job import extract_transcripts
    from nreadability_spark.sources.synth import transcripts_df

    src = transcripts_df(spark, n_convs=BENCH_CONVS).cache()
    n_turns = src.count()  # materialize the input outside the timed region
    # warm ALL python workers (a limit() slice would collapse to one
    # partition and warm a single worker; one tiny task per core slot
    # warms every worker's package import + regex compile)
    warm = spark.range(0, cpus * 4, numPartitions=cpus * 4).selectExpr(
        "cast(id as string) conv_id", "0 turn_idx", "'u' role",
        "'<p>warmup text</p>' text", "'t' tool", "current_timestamp() ts")
    _noop_run(extract_transcripts(warm, include_html=False, salt_partitions=None))
    extract_job = extract_transcripts(src, include_html=False)
    _noop_run(extract_job)  # untimed steady-state pass
    extract_sec = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        _noop_run(extract_job)
        extract_sec = min(extract_sec, time.monotonic() - t0)
    src.unpersist()

    # full-registry pack: HEADLINE (stable cross-round comparison order)
    # then every remaining registry query, so BENCH_DETAIL.json carries
    # a number for ALL entries each round. extract_transcripts is
    # excluded here — the throughput headline above already measures it
    # under the stricter fresh-session protocol (its key in `times` is
    # that measurement).
    pack = list(HEADLINE) + sorted(
        n for n in qs if n not in HEADLINE and n != "extract_transcripts"
    )

    times = {}
    steady = {}
    for name in pack:
        # build INSIDE the timed region: for most queries construction
        # is pure plan assembly (ms), but the iterative fits that
        # collect per round (BPE merges, logistic GD) do their cluster
        # work at build time — timing only the final plan would hide
        # the fit (the lazy fits — k-means, PQ — were always timed)
        t0 = time.monotonic()
        _noop_run(qs[name](spark, sf_dir))
        times[name] = round(time.monotonic() - t0, 3)
        # second build+run: Janino codegen and Python-worker warmup
        # paid, shuffle files possibly reused — the steady-state cost a
        # long-running job sees (fit queries legitimately refit)
        t0 = time.monotonic()
        _noop_run(qs[name](spark, sf_dir))
        steady[name] = round(time.monotonic() - t0, 3)
    times["extract_transcripts"] = round(extract_sec, 3)

    total = round(sum(times.values()), 3)
    summary = {
        "metric": "headline query wall time (sum) at sf%s on local[%d]" % (sf, cpus),
        "value": total,
        "unit": "sec",
        "queries": times,
        "steady_state_sum": round(sum(steady.values()), 3),
        "sf": sf,
        "extract_turns": n_turns,
        "extract_turns_per_sec": round(n_turns / extract_sec, 1),
        # protocol B of BENCH/BASELINE.md: fresh session, in-job
        # salting shuffle, warmed workers, best of 2 — the
        # self-contained per-round tracker. The HEADLINE number
        # is protocol A (spark-submit, pre-salted input,
        # steady-state best of 3) in BENCH/BASELINE.md.
        "extract_protocol": "B-fresh-session-in-job-salting",
        "cpus": cpus,
        "detail_file": "bench/BENCH_DETAIL.json",
    }
    # the full two-pass per-query detail goes to a SIDECAR, not stdout:
    # the round-3 stdout line (two 40+-entry maps) overflowed the
    # driver's capture buffer and recorded as `parsed: null` — the
    # final line must stay compact enough to survive a tail capture.
    detail = dict(summary, queries_steady_state=steady)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench", "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    # hard budget on the stdout line (r03's parse failed around ~2KB):
    # if the pack outgrows it, keep only the slowest queries inline and
    # flag the cut — the sidecar always has everything.
    line = json.dumps(summary)
    if len(line) > 1800:
        slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:15])
        summary["queries"] = {k: times[k] for k in times if k in slowest}
        summary["queries_truncated_to_slowest"] = len(slowest)
        line = json.dumps(summary)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
