"""Composed training-data pipeline: the stages a corpus-cleaning job
actually chains, as ONE lazy plan (what a user of the engine runs
end-to-end, not operator-by-operator):

    documents
      -> quality gate   (token count)
      -> exact dedup    (one representative per fp60 class)
      -> near-dup prune (drop the higher doc_id of each verified
                         MinHash-LSH pair when both survived)
      -> surviving corpus

Pruning is the greedy one-pass rule (per PAIR, not transitive
clustering): deterministic, embarrassingly joinable, and what
large-scale dedup pipelines ship first — connected-components
clustering is a separate iterative job.

Scale shape: the quality gate and fingerprint are map-side; the only
added shuffles over the underlying operators are two fp60/doc_id-keyed
joins (hash-distributed, no hot keys). The LSH stage reuses
``dedup.minhash_lsh_pairs`` with all its skew controls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nreadability_spark.functions import hashing
from nreadability_spark.functions import text as tx
from nreadability_spark.operators import dedup
from nreadability_spark.operators.textops import _norm_text, _norm_text_sql, load_documents

MIN_TOKENS = 30  # quality gate


def clean_corpus(
    spark: SparkSession,
    sf_dir: str,
    min_tokens: int = MIN_TOKENS,
    near_dup_strategy: str = "greedy",
) -> DataFrame:
    """``near_dup_strategy``:

    - ``greedy`` (oracle-pinned): drop the higher doc_id of each
      verified pair — one join pass, keeps one doc per PAIR.
    - ``components``: drop every non-minimum member of each transitive
      near-dup cluster (``dedup.duplicate_components``) — stricter
      (chains a~b~c collapse to one survivor even when a,c never
      paired directly); the iterative-job composition."""
    docs = load_documents(spark, sf_dir)
    quality = docs.select(
        "doc_id",
        hashing.h60(_norm_text(F.col("text"))).alias("fp60"),
        tx.token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") >= min_tokens)

    reps = quality.groupBy("fp60").agg(F.min("doc_id").alias("doc_id"))
    rep_rows = quality.join(reps.select("doc_id"), "doc_id")

    if near_dup_strategy == "components":
        comp = dedup.duplicate_components(spark, sf_dir)
        dropped = comp.where(F.col("doc_id") != F.col("component")).select("doc_id")
    else:
        pairs = dedup.minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
        rep_ids_a = rep_rows.select(F.col("doc_id").alias("doc_a"))
        rep_ids_b = rep_rows.select(F.col("doc_id").alias("doc_b"))
        dropped = (
            pairs.join(rep_ids_a, "doc_a")
            .join(rep_ids_b, "doc_b")
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
    return (
        rep_rows.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "fp60", "n_tokens")
        .orderBy("doc_id")
    )


def _clean_corpus_ctes(min_tokens: int = MIN_TOKENS) -> str:
    """The clean-corpus CTE chain ending at ``survivors`` (doc_id,
    fp60, n_tokens) — shared by the clean-corpus oracle and the
    training-ready composition's oracle."""
    lsh = dedup.minhash_lsh_sql()
    return f"""quality AS (
  SELECT doc_id,
         {hashing.h60_sql(_norm_text_sql('text'))} AS fp60,
         CAST({tx.token_count_sql('text')} AS BIGINT) AS n_tokens
  FROM documents
  WHERE {tx.token_count_sql('text')} >= {min_tokens}
),
reps AS (
  SELECT q.doc_id, q.fp60, q.n_tokens
  FROM quality q
  JOIN (SELECT fp60, min(doc_id) AS doc_id FROM quality GROUP BY fp60) r
    ON r.doc_id = q.doc_id
),
lsh_pairs AS (SELECT doc_a, doc_b FROM ({lsh}) t),
dropped AS (
  SELECT DISTINCT p.doc_b AS doc_id
  FROM lsh_pairs p
  JOIN reps a ON a.doc_id = p.doc_a
  JOIN reps b ON b.doc_id = p.doc_b
),
survivors AS (
  SELECT doc_id, fp60, n_tokens
  FROM reps
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
)"""


def clean_corpus_sql(min_tokens: int = MIN_TOKENS) -> str:
    return f"""
WITH {_clean_corpus_ctes(min_tokens)}
SELECT doc_id, fp60, n_tokens FROM survivors
ORDER BY doc_id
"""


# --- training-ready composition ----------------------------------------

def training_ready(
    spark: SparkSession, sf_dir: str, min_tokens: int = MIN_TOKENS
) -> DataFrame:
    """The full corpus-preparation chain a training job reads, end to
    end as one lazy plan:

        clean_corpus (quality + exact dedup + near-dup prune)
          -> drop the evaluation slice itself (doc_id % bench_every)
          -> drop contaminated docs (8-gram overlap with the eval set;
             anti-join on doc_id — AQE picks broadcast at runtime when
             the contaminated set proves small)
          -> deterministic train/val/test assignment from the CONTENT
             fingerprint already in hand (fp60 mod 100 — duplicates
             share splits, stable under re-ingestion)

    Output: (doc_id, n_tokens, split). Every stage reuses the
    already-verified operator builders, so this query is the
    composition test: any drift in a stage breaks this oracle too."""
    from nreadability_spark.operators import textops

    survivors = clean_corpus(spark, sf_dir, min_tokens=min_tokens)
    contaminated = textops.decontaminate(spark, sf_dir).select("doc_id")
    bucket = F.col("fp60") % F.lit(100)
    split = (
        F.when(bucket < textops.SPLIT_TRAIN_PCT, "train")
        .when(bucket < textops.SPLIT_TRAIN_PCT + textops.SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    # no broadcast hint: the contaminated set is one row per
    # contaminated doc — usually tiny, but NOT bounded by a constant (a
    # pathologically leaked benchmark contaminates the whole corpus).
    # The anti-join is keyed on doc_id (hash-distributable); AQE
    # converts it to a runtime broadcast when stats prove it fits.
    return (
        survivors.where(F.col("doc_id") % textops.DECON_BENCH_EVERY != 0)
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", split.alias("split"))
        .orderBy("doc_id")
    )


def training_ready_sql(min_tokens: int = MIN_TOKENS) -> str:
    from nreadability_spark.operators import textops

    n, every = textops.DECON_NGRAM, textops.DECON_BENCH_EVERY
    bucket = "(fp60 % 100)"
    return f"""
WITH {_clean_corpus_ctes(min_tokens)},
sh AS ({tx.hashed_shingles_sql('documents', n)}),
bench AS (SELECT DISTINCT sh60 FROM sh WHERE doc_id % {every} = 0),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b ON s.sh60 = b.sh60
  WHERE s.doc_id % {every} != 0
)
SELECT doc_id, n_tokens,
       CASE WHEN {bucket} < {textops.SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {bucket} < {textops.SPLIT_TRAIN_PCT + textops.SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM survivors
WHERE doc_id % {every} != 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
ORDER BY doc_id
"""


QUERIES = {
    "pipeline_clean_corpus": clean_corpus,
    "pipeline_training_ready": training_ready,
}
ORACLES = {
    "pipeline_clean_corpus": clean_corpus_sql(),
    "pipeline_training_ready": training_ready_sql(),
}
