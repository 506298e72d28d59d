"""Similarity search over the ``embeddings`` table (64-dim float).

Two operators:

- **brute-force cosine top-k** — the correctness baseline: one scan,
  dot product via ``zip_with``+``aggregate`` (JVM-side, codegen'd),
  global top-k via window rank. At 100 TB you shard this with a
  broadcast of the (tiny) query set: cost O(rows x dim), one pass.
- **IVF top-k** — the scale path: vectors are assigned to the nearest
  of C coarse centroids (inverted file); a query probes only the
  ``nprobe`` nearest cells, scanning a fraction ~nprobe/C of the data.
  Here the centroids are a deterministic pinned subset of the vectors
  (stand-in for a sampled k-means fit, which at scale is a separate
  Spark job); the operator mechanics — assignment, cell pruning,
  rescoring — are the real thing.

Determinism/parity notes: all math is double precision; Spark's
``aggregate`` and SQL's left-associative ``+`` chain sum in the same
element order, so the doubles are bit-identical between engines;
ordering ties broken by vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DIM = 64
QUERY_VEC_ID = 0
TOP_K = 20
IVF_CENTROIDS = 8  # vec_id < 8 pinned as coarse centroids
IVF_NPROBE = 2
IVF_TOP_K = 10


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _dot(a, b):
    """Sequential-order double dot product (parity with SQL `+` chain)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _dvec(col):
    return col.cast("array<double>")


def _dot_sql(a: str, b: str) -> str:
    # explicit left-associative chain: bit-identical to F.aggregate
    return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, DIM + 1)) + ")"


def _cosine_sql(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)} / (sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)})))"


def knn_brute_force(spark: SparkSession, sf_dir: str, k: int = TOP_K) -> DataFrame:
    """Top-k cosine neighbors of the pinned query vector (vec_id=0)."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("q"))
    scored = (
        emb.where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("e"), F.col("q")).alias("cos"))
    )
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "vec_id", F.round("cos", 6).alias("cos_sim"))
        .orderBy("rank")
    )


def knn_brute_force_sql(k: int = TOP_K) -> str:
    cos = _cosine_sql("e.emb", "q.emb")
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
q AS (SELECT emb FROM base WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT e.vec_id, {cos} AS cos
  FROM base e, q WHERE e.vec_id != {QUERY_VEC_ID}
),
ranked AS (
  SELECT row_number() OVER (ORDER BY cos DESC, vec_id) AS rank, vec_id, cos FROM scored
)
SELECT rank, vec_id, round(cos, 6) AS cos_sim FROM ranked
WHERE rank <= {k} ORDER BY rank
"""


def knn_ivf(spark: SparkSession, sf_dir: str, k: int = IVF_TOP_K) -> DataFrame:
    """IVF(nprobe) approximate top-k for the pinned query vector.

    Stage 1 (build): every vector -> nearest centroid (broadcast join
    against C centroids, window argmax). Stage 2 (search): query picks
    its ``nprobe`` nearest cells; only those cells are rescored.
    """
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    cents = emb.where(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("c")
    )

    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "cent_id", _cosine(F.col("e"), F.col("c")).alias("ccos")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    assigned = (
        scored.withColumn("r", F.row_number().over(w_assign))
        .where(F.col("r") == 1)
        .select("vec_id", "e", F.col("cent_id").alias("cell"))
    )

    probe_cells = (
        scored.where(F.col("vec_id") == QUERY_VEC_ID)
        .withColumn("r", F.row_number().over(w_assign))
        .where(F.col("r") <= IVF_NPROBE)
        .select(F.col("cent_id").alias("cell"))
    )

    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("e").alias("q"))
    cands = (
        assigned.join(F.broadcast(probe_cells), "cell")
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "cell", _cosine(F.col("e"), F.col("q")).alias("cos"))
    )
    w_rank = Window.orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w_rank))
        .where(F.col("rank") <= k)
        .select("rank", "vec_id", F.col("cell").cast("long").alias("cell"),
                F.round("cos", 6).alias("cos_sim"))
        .orderBy("rank")
    )


def knn_ivf_sql(k: int = IVF_TOP_K) -> str:
    ccos = _cosine_sql("e.emb", "c.emb")
    qcos = _cosine_sql("e.emb", "q.emb")
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cents AS (SELECT vec_id AS cent_id, emb FROM base WHERE vec_id < {IVF_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.cent_id, {ccos} AS ccos
  FROM base e, cents c
),
assigned AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r
    FROM scored
  ) t WHERE r = 1
),
probe AS (
  SELECT cent_id AS cell FROM (
    SELECT cent_id,
           row_number() OVER (ORDER BY ccos DESC, cent_id) AS r
    FROM scored WHERE vec_id = {QUERY_VEC_ID}
  ) t WHERE r <= {IVF_NPROBE}
),
q AS (SELECT emb FROM base WHERE vec_id = {QUERY_VEC_ID}),
cands AS (
  SELECT e.vec_id, a.cell, {qcos} AS cos
  FROM base e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN probe p ON p.cell = a.cell, q
  WHERE e.vec_id != {QUERY_VEC_ID}
),
ranked AS (
  SELECT row_number() OVER (ORDER BY cos DESC, vec_id) AS rank, vec_id,
         CAST(cell AS BIGINT) AS cell, cos
  FROM cands
)
SELECT rank, vec_id, cell, round(cos, 6) AS cos_sim FROM ranked
WHERE rank <= {k} ORDER BY rank
"""


# production near-dup threshold is ~0.95; the synthetic embeddings are
# random (max pairwise cosine ~0.49), so the pinned default sits at the
# corpus's p99.9 to give the correctness oracle non-empty output
COSINE_DUP_THRESHOLD = 0.4


def embedding_near_dups(
    spark: SparkSession, sf_dir: str, threshold: float = COSINE_DUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors are blocked by
    their IVF cell (nearest pinned centroid), and only same-cell pairs
    are exactly scored — the coarse-quantizer blocking that keeps this
    O(n^2 / C) instead of O(n^2) at scale (recall is bounded by cell
    purity; raise C or use multi-assignment for higher recall)."""
    # norm factored out per vector: cos(a,b) = dot(a,b) / (na * nb) with
    # na precomputed once — identical doubles to _cosine (same
    # expressions, just not recomputed per pair), 3x fewer dot products
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    ).withColumn("n", F.sqrt(_dot(F.col("e"), F.col("e"))))
    cents = emb.where(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("c"), F.col("n").alias("cn")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "n", "cent_id",
        (_dot(F.col("e"), F.col("c")) / (F.col("n") * F.col("cn"))).alias("ccos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    assigned = (
        scored.withColumn("r", F.row_number().over(w_assign))
        .where(F.col("r") == 1)
        .select("vec_id", "e", "n", F.col("cent_id").alias("cell"))
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    # the cell self-join has only C distinct keys -> a shuffle join
    # degenerates to C skewed tasks; broadcasting the build side keeps
    # the probe side's full parallelism. At 100 TB the build side is a
    # single CELL's vectors per task (block the pairs by (cell, salt));
    # here the whole table fits the broadcast threshold.
    pairs = (
        a.join(F.broadcast(b), (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.cell").cast("long").alias("cell"),
            F.round(
                _dot(F.col("a.e"), F.col("b.e")) / (F.col("a.n") * F.col("b.n")), 6
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .orderBy("vec_a", "vec_b")
    )
    return pairs


def embedding_near_dups_sql(threshold: float = COSINE_DUP_THRESHOLD) -> str:
    ccos = _cosine_sql("e.emb", "c.emb")
    pcos = _cosine_sql("a.emb", "b.emb")
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
cents AS (SELECT vec_id AS cent_id, emb FROM base WHERE vec_id < {IVF_CENTROIDS}),
scored AS (
  SELECT e.vec_id, c.cent_id, {ccos} AS ccos FROM base e, cents c
),
assigned AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r
    FROM scored
  ) t WHERE r = 1
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(aa.cell AS BIGINT) AS cell,
       round({pcos}, 6) AS cos_sim
FROM base a
JOIN assigned aa ON aa.vec_id = a.vec_id
JOIN assigned ab ON ab.cell = aa.cell
JOIN base b ON b.vec_id = ab.vec_id AND a.vec_id < b.vec_id
WHERE round({pcos}, 6) >= {threshold}
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "sim_knn_brute_force": knn_brute_force,
    "sim_knn_ivf": knn_ivf,
    "dedup_embedding_cosine": embedding_near_dups,
}

ORACLES = {
    "sim_knn_brute_force": knn_brute_force_sql(),
    "sim_knn_ivf": knn_ivf_sql(),
    "dedup_embedding_cosine": embedding_near_dups_sql(),
}
