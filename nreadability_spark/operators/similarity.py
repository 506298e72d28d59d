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

import os

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
    """Sequential-order double dot product (parity with SQL `+` chain).

    Measured note: this higher-order-function form beats a fully
    unrolled ``element_at(a,1)*element_at(b,1) + ...`` chain 3.6x at
    sf0.1 (6.0s vs 21.6s for the near-dup pair join) — the 64-term
    tree blows past codegen method limits and is walked interpreted
    per pair, while the HOF loop stays a tight array traversal."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    # zero guard: an all-zero vector gives 0/0, where Spark yields NaN
    # (sorts FIRST under ORDER BY DESC) but DuckDB yields NULL (sorts
    # last) — greatest(denominator, tiny) makes the cosine an exact 0.0
    # on both engines and is bit-identical for any nonzero vector
    return _dot(a, b) / F.greatest(
        F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)), F.lit(1e-300)
    )


def _dvec(col):
    return col.cast("array<double>")


def _dot_sql(a: str, b: str) -> str:
    # explicit left-associative chain: bit-identical to F.aggregate
    return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, DIM + 1)) + ")"


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"({_dot_sql(a, b)} / "
        f"greatest(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}), 1e-300))"
    )


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


def knn_ivf(
    spark: SparkSession, sf_dir: str, k: int = IVF_TOP_K, centroids: DataFrame | None = None
) -> DataFrame:
    """IVF(nprobe) approximate top-k for the pinned query vector.

    Stage 1 (build): every vector -> nearest centroid (broadcast join
    against C centroids, window argmax). Stage 2 (search): query picks
    its ``nprobe`` nearest cells; only those cells are rescored.

    ``centroids``: a (cent_id, c) table, e.g. ``fit_centroids``'s output
    — the production wiring (fit job -> IVF build). Defaults to the
    pinned stand-in so the oracle stays closed-form.
    """
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    cents = (
        centroids
        if centroids is not None
        else emb.where(F.col("vec_id") < IVF_CENTROIDS).select(
            F.col("vec_id").alias("cent_id"), F.col("e").alias("c")
        )
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


def _knn_ivf_body_sql(k: int = IVF_TOP_K) -> str:
    """The search CTE chain, assuming ``base`` (vec_id, emb) and
    ``cents`` (cent_id, emb) are already defined by the caller."""
    ccos = _cosine_sql("e.emb", "c.emb")
    qcos = _cosine_sql("e.emb", "q.emb")
    return f"""
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


def knn_ivf_sql(k: int = IVF_TOP_K) -> str:
    """Pinned-centroid variant (closed-form cents CTE)."""
    return (
        f"WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),\n"
        f"cents AS (SELECT vec_id AS cent_id, emb FROM base WHERE vec_id < {IVF_CENTROIDS}),\n"
        + _knn_ivf_body_sql(k)
    )


# --- coarse-centroid fit (the "separate Spark job" feeding IVF) --------

KMEANS_ITERS = 2


def pinned_centroids(spark: SparkSession, sf_dir: str, k: int = IVF_CENTROIDS) -> DataFrame:
    """The deterministic stand-in centroids (first k vectors by id) —
    the test fixture; production uses ``fit_centroids``."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    return emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("c")
    )


def _assign_to_centroids(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, e) x (cent_id, c) -> (vec_id, e, cell): nearest centroid
    by cosine, ties to the lowest cent_id. The centroid table is tiny
    (C rows) and explicitly broadcast."""
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "cent_id", _cosine(F.col("e"), F.col("c")).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vec_id", "e", F.col("cent_id").alias("cell"))
    )


def fit_centroids(
    spark: SparkSession, sf_dir: str, k: int = IVF_CENTROIDS, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Lloyd k-means over the embeddings as a Spark job -> (cent_id, c).

    Deterministic by construction so the fit itself is oracle-checkable:
    pinned init (first k vectors), cosine assignment with lowest-id tie
    break, and each iteration's centroids ROUNDED to 6 decimals as part
    of the algorithm (summation-order noise in the distributed mean is
    ~1e-13, far below the rounding grain, so the rounded centroids are
    stable across partitionings and engines). Cells that lose all
    members simply drop out (k shrinks) — identical behaviour in the
    SQL twin.

    Scale shape: per iteration, one broadcast of C centroids, one
    narrow argmax window keyed by vec_id, and one (cell, dim) shuffle
    agg with map-side partials — no collect, no driver math; the
    centroid table itself is the only driver-sized object.
    """
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    cents = pinned_centroids(spark, sf_dir, k)
    for _ in range(iters):
        assigned = _assign_to_centroids(emb, cents)
        means = (
            assigned.select("cell", F.posexplode("e").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("val"))
        )
        cents = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("s"))
            .select(F.col("cell").alias("cent_id"), F.col("s.val").alias("c"))
        )
    # pin the C-row model table: composed searches (IVF, IVF+PQ)
    # reference the centroids from several broadcast exchanges, and an
    # unpinned plan re-runs the whole Lloyd chain once per exchange. In
    # production this is the parquet model table jobs/fit_models.py
    # writes; locally, localCheckpoint is the same materialize-once.
    # eager=False: merely CONSTRUCTING a composed plan (explain, schema,
    # plan-shape tests) must not run the Lloyd jobs — the checkpoint
    # materializes at the query's first action instead.
    return cents.localCheckpoint(eager=False)


def centroid_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: the fitted centroid table in long format
    (cell, dim, centroid), dim 1-based."""
    cents = fit_centroids(spark, sf_dir)
    return (
        cents.select(
            F.col("cent_id").cast("long").alias("cell"),
            F.posexplode("c").alias("pos", "centroid"),
        )
        .select("cell", (F.col("pos") + 1).cast("long").alias("dim"), "centroid")
        .orderBy("cell", "dim")
    )


def _kmeans_iter_sql(prev: str, idx: int) -> str:
    """One unrolled Lloyd iteration as CTE clauses (DuckDB)."""
    ccos = _cosine_sql("e.emb", "c.c")
    return f"""
s{idx} AS (
  SELECT e.vec_id, e.emb, c.cent_id, {ccos} AS ccos FROM base e, {prev} c
),
a{idx} AS (
  SELECT vec_id, emb, cent_id AS cell FROM (
    SELECT vec_id, emb, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r
    FROM s{idx}
  ) t WHERE r = 1
),
m{idx} AS (
  SELECT cell, dim, round(avg(val), 6) AS val FROM (
    SELECT cell, unnest(range(1, {DIM + 1})) AS dim, unnest(emb) AS val FROM a{idx}
  ) x GROUP BY cell, dim
),
c{idx} AS (
  SELECT cell AS cent_id, list(val ORDER BY dim) AS c FROM m{idx} GROUP BY cell
)"""


def _kmeans_cte_chain(k: int = IVF_CENTROIDS, iters: int = KMEANS_ITERS) -> str:
    """``base`` + the unrolled Lloyd CTEs ending at ``c{iters}``
    (cent_id, c) — shared by the fit oracle and the fitted-IVF oracle."""
    parts = [
        f"base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),",
        f"c0 AS (SELECT vec_id AS cent_id, emb AS c FROM base WHERE vec_id < {k})",
    ]
    for i in range(1, iters + 1):
        parts.append("," + _kmeans_iter_sql(f"c{i - 1}", i))
    return "\n".join(parts)


def centroid_fit_sql(k: int = IVF_CENTROIDS, iters: int = KMEANS_ITERS) -> str:
    return f"""WITH {_kmeans_cte_chain(k, iters)}
SELECT CAST(cent_id AS BIGINT) AS cell, CAST(dim AS BIGINT) AS dim, centroid
FROM (
  SELECT cent_id, unnest(range(1, {DIM + 1})) AS dim, unnest(c) AS centroid
  FROM c{iters}
) t ORDER BY cell, dim
"""


def knn_ivf_fitted(spark: SparkSession, sf_dir: str, k: int = IVF_TOP_K) -> DataFrame:
    """The production IVF wiring, composed end-to-end: distributed
    k-means fit -> inverted-file build -> nprobe search — the DEFAULT
    ``sim_knn_ivf`` path (the pinned-centroid variant stays as
    ``sim_knn_ivf_pinned`` for the closed-form fixture). Oracle: the
    unrolled Lloyd CTE chain extended through the same search CTEs —
    exact, because each iteration's centroids are rounded to 6 decimals
    as part of the algorithm (engine-independent doubles)."""
    return knn_ivf(spark, sf_dir, k=k, centroids=fit_centroids(spark, sf_dir))


def knn_ivf_fitted_sql(
    k: int = IVF_TOP_K, c: int = IVF_CENTROIDS, iters: int = KMEANS_ITERS
) -> str:
    return (
        f"WITH {_kmeans_cte_chain(c, iters)},\n"
        f"cents AS (SELECT cent_id, c AS emb FROM c{iters}),\n"
        + _knn_ivf_body_sql(k)
    )


# production near-dup threshold is ~0.95; the synthetic embeddings are
# random (max pairwise cosine ~0.49), so the pinned default sits at the
# corpus's p99.9 to give the correctness oracle non-empty output
COSINE_DUP_THRESHOLD = 0.4


# input-size gate for the broadcast fast path of the pair join: below
# this many bytes of parquet the whole assigned table is broadcast (the
# cell key has only C distinct values, so a plain shuffle join would
# degenerate into C skewed tasks); above it, salted block-pair joins
BROADCAST_PAIR_JOIN_MAX_BYTES = 64 << 20
NEAR_DUP_SALTS = 8  # S sub-blocks per cell on the block-pair path


def _input_bytes(df: DataFrame) -> int:
    """Total size of the scan's input files (local paths; 0 if unknown)."""
    total = 0
    for f in df.inputFiles():
        path = f.removeprefix("file:")
        try:
            total += os.path.getsize(path)
        except OSError:
            return 0  # non-local source: size unknown -> no broadcast
    return total


def _assigned_vectors(spark: SparkSession, sf_dir: str):
    """(vec_id, e, n, cell): every vector with its norm and IVF cell."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    ).withColumn("n", F.sqrt(_dot(F.col("e"), F.col("e"))))
    cents = emb.where(F.col("vec_id") < IVF_CENTROIDS).select(
        F.col("vec_id").alias("cent_id"), F.col("e").alias("c"), F.col("n").alias("cn")
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "n", "cent_id",
        (
            _dot(F.col("e"), F.col("c"))
            / F.greatest(F.col("n") * F.col("cn"), F.lit(1e-300))
        ).alias("ccos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    assigned = (
        scored.withColumn("r", F.row_number().over(w_assign))
        .where(F.col("r") == 1)
        .select("vec_id", "e", "n", F.col("cent_id").alias("cell"))
    )
    return emb, assigned


def _pandas_dot():
    """Arrow-vectorized numpy dot product — the measured-faster kernel
    for the exact pair-verification stage (~2x the higher-order-function
    form at sf0.1: HOFs are interpreted per element, numpy is one C
    loop per batch). NOT the oracle-pinned default: numpy's pairwise
    summation can differ from the sequential left-associative chain in
    the last ulp, which the 6-dp rounding almost always — but not
    provably always — hides."""
    import pandas as pd  # noqa: F401 — signature needs the types
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pdot(ea, eb):
        import numpy as np
        import pandas as _pd

        a = np.stack(ea.values)
        b = np.stack(eb.values)
        return _pd.Series((a * b).sum(axis=1))

    return pdot


def _block_pair_join(df: DataFrame, n_salts: int, order_col: str):
    """Salted sub-block pair join — the 100 TB pair-enumeration path
    shared by the near-dup and SemDeDup operators. Each cell's rows
    split into S salt sub-blocks (salt = xxhash64(vec_id) mod S); side
    A explodes to block-pairs (i=salt, j=salt..S-1), side B to
    (i=0..salt, j=salt), and the join key (cell, i, j) meets every
    unordered pair of sub-blocks exactly once via a SHUFFLE join with
    C*S(S+1)/2 distinct keys. Same-block pairs (i==j) keep only
    ``a.order_col < b.order_col`` to avoid the double match. Per-task
    memory is one sub-block pair; each row ships S+1 times — bounded
    fan-out instead of an unbounded broadcast."""
    salted = df.withColumn(
        "salt", F.pmod(F.xxhash64("vec_id"), F.lit(n_salts)).cast("int")
    )
    side_a = salted.select(
        "*", F.col("salt").alias("bi"),
        F.explode(F.sequence(F.col("salt"), F.lit(n_salts - 1))).alias("bj"),
    ).alias("a")
    side_b = salted.select(
        "*", F.explode(F.sequence(F.lit(0), F.col("salt"))).alias("bi"),
        F.col("salt").alias("bj"),
    ).alias("b")
    return side_a.join(
        side_b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.bi") == F.col("b.bi"))
        & (F.col("a.bj") == F.col("b.bj"))
        & (
            (F.col("a.bi") != F.col("a.bj"))
            | (F.col(f"a.{order_col}") < F.col(f"b.{order_col}"))
        ),
    )


def _pair_cols(threshold, kernel: str = "jvm"):
    def project(joined):
        if kernel == "pandas":
            dot = _pandas_dot()(F.col("a.e"), F.col("b.e"))
        else:
            dot = _dot(F.col("a.e"), F.col("b.e"))
        return joined.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.cell").cast("long").alias("cell"),
            F.round(
                dot / F.greatest(F.col("a.n") * F.col("b.n"), F.lit(1e-300)),
                6,
            ).alias("cos_sim"),
        ).where(F.col("cos_sim") >= threshold)

    return project


def embedding_near_dups(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = COSINE_DUP_THRESHOLD,
    strategy: str = "auto",
    n_salts: int = NEAR_DUP_SALTS,
    kernel: str = "jvm",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: vectors are blocked by
    their IVF cell (nearest pinned centroid), and only same-cell pairs
    are exactly scored — the coarse-quantizer blocking that keeps this
    O(n^2 / C) instead of O(n^2) at scale (recall is bounded by cell
    purity; raise C or use multi-assignment for higher recall).

    Pair-join strategies (identical result set, different plans):

    - ``broadcast``: broadcast the whole assigned table as the build
      side. Right when the input fits the broadcast threshold — the cell
      key has only C distinct values, so a plain shuffle join would
      degenerate into C skewed tasks. Breaks (driver/executor OOM) once
      the table outgrows the broadcast budget.
    - ``block_pairs``: the 100 TB path. Each cell's vectors are split
      into S salt sub-blocks (salt = xxhash64(vec_id) mod S); side A is
      exploded to block-pairs (i=salt, j=salt..S-1), side B to
      (i=0..salt, j=salt), and the join key (cell, i, j) meets every
      unordered pair of sub-blocks exactly once, via a *shuffle* join
      with C*S(S+1)/2 distinct keys. Per-task memory is one sub-block
      pair, each row is shipped S+1 times — bounded fan-out instead of
      an unbounded broadcast. Same-block pairs (i==j) keep only
      vec_id_a < vec_id_b to avoid the double match.
    - ``auto``: broadcast when the scanned parquet is under
      ``BROADCAST_PAIR_JOIN_MAX_BYTES``, else block_pairs.

    ``kernel``: ``jvm`` (default, oracle-pinned — sequential-order HOF
    dot, bit-identical to the SQL twin) or ``pandas`` (Arrow-batched
    numpy dot — measured ~2x faster on the verification stage at sf0.1;
    last-ulp summation-order caveat in ``_pandas_dot``). At 100 TB the
    pandas kernel is the production pick: the verification stage is
    compute-bound and the Arrow transfer is amortized per batch.
    """
    _, assigned = _assigned_vectors(spark, sf_dir)
    if strategy == "auto":
        strategy = (
            "broadcast"
            if 0 < _input_bytes(load_embeddings(spark, sf_dir)) <= BROADCAST_PAIR_JOIN_MAX_BYTES
            else "block_pairs"
        )

    if strategy == "broadcast":
        a, b = assigned.alias("a"), assigned.alias("b")
        joined = a.join(
            F.broadcast(b),
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        return _pair_cols(threshold, kernel)(joined).orderBy("vec_a", "vec_b")

    # block_pairs: salted sub-block pair join (no broadcast of the table)
    joined = _block_pair_join(assigned, n_salts, "vec_id")
    pairs = _pair_cols(threshold, kernel)(joined).select(
        F.least("vec_a", "vec_b").alias("vec_a"),
        F.greatest("vec_a", "vec_b").alias("vec_b"),
        "cell",
        "cos_sim",
    )
    return pairs.orderBy("vec_a", "vec_b")


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




# --- int8 scalar quantization ------------------------------------------

def quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization stats: scale =
    max(|x|)/127, q_i = round(x_i/scale), reconstruction MSE — the
    compression step an embedding store applies before ANN serving
    (4x smaller vectors; IVF assignment runs on dequantized values).
    Map-side only: in-array transforms + one sequential-order aggregate
    per vector (parity with the SQL twin's list ops); no shuffle."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    absmax = F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    scale = absmax / F.lit(127.0)
    # zero guard: an all-zero embedding gives scale 0, and 0/0 semantics
    # differ between engines (Spark NULL vs IEEE NaN) — divide by
    # greatest(scale, tiny) IDENTICALLY in both twins so q = 0 and
    # mse = 0 deterministically for zero vectors
    safe = F.greatest(F.col("scale"), F.lit(1e-300))
    q = F.transform(F.col("e"), lambda x: F.round(x / safe))
    # sequential-order sum of squared reconstruction errors
    sse = F.aggregate(
        F.zip_with(F.col("e"), F.col("q"), lambda x, qq: (x - qq * F.col("scale")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        emb.withColumn("scale", scale)
        .withColumn("q", q)
        .select(
            "vec_id",
            F.round("scale", 9).alias("scale_r"),
            F.round(sse / F.size("e"), 9).alias("mse"),
            F.array_max("q").cast("long").alias("q_max"),
            F.array_min("q").cast("long").alias("q_min"),
        )
        .withColumnRenamed("scale_r", "scale")
        .orderBy("vec_id")
    )


def quantize_int8_sql() -> str:
    return """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
scaled AS (
  SELECT vec_id, e,
         list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale
  FROM base
),
quant AS (
  SELECT vec_id, e, scale,
         list_transform(e, x -> round(x / greatest(scale, 1e-300))) AS q
  FROM scaled
)
SELECT vec_id,
       round(scale, 9) AS scale,
       round(list_sum(list_transform(range(1, len(e) + 1),
             i -> pow(e[i] - q[i] * scale, 2))) / len(e), 9) AS mse,
       CAST(list_max(q) AS BIGINT) AS q_max,
       CAST(list_min(q) AS BIGINT) AS q_min
FROM quant
ORDER BY vec_id
"""


# --- product quantization (the FAISS IVF+PQ scale path) ----------------

PQ_M = 4          # subspaces
PQ_K = 8          # codewords per subspace (pinned init: vec_id < PQ_K)
PQ_ITERS = 2
PQ_SUBDIM = DIM // PQ_M
PQ_MICRO = 1_000_000


def _l2sq(a, b):
    """Squared L2, sequential element order (parity with the SQL `+`
    chain)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _l2sq_sql(a: str, b: str, dims: int = PQ_SUBDIM) -> str:
    return (
        "("
        + " + ".join(f"({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}])" for i in range(1, dims + 1))
        + ")"
    )


def _subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sv): each vector split into PQ_M contiguous
    subvectors — built map-side from one slice transform."""
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.slice(F.col("e"), m * PQ_SUBDIM + 1, PQ_SUBDIM),
    )
    return emb.select("vec_id", F.posexplode(slices).alias("m", "sv"))


def _pq_assign(sub: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest codeword per (vec_id, m) by squared L2, ties to the
    lowest cent_id; the codebook (PQ_M x PQ_K rows) broadcasts."""
    scored = sub.join(F.broadcast(cents), "m").select(
        "vec_id", "m", "sv", "cent_id", _l2sq(F.col("sv"), F.col("c")).alias("d")
    )
    w = Window.partitionBy("vec_id", "m").orderBy("d", "cent_id")
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vec_id", "m", "sv", F.col("cent_id").alias("code"), "d")
    )


def fit_pq_codebook(emb: DataFrame, iters: int = PQ_ITERS) -> DataFrame:
    """Per-subspace Lloyd fit -> (m, cent_id, c). ALL subspaces train
    in one distributed job per iteration (the subspace id is just
    another grouping key) — same determinism contract as
    ``fit_centroids``: pinned init, 6-dp-rounded means, lowest-id tie
    breaks."""
    sub = _subvectors(emb)
    cents = sub.where(F.col("vec_id") < PQ_K).select(
        "m", F.col("vec_id").alias("cent_id"), F.col("sv").alias("c")
    )
    for _ in range(iters):
        assigned = _pq_assign(sub, cents)
        means = (
            assigned.select("m", F.col("code").alias("cell"), F.posexplode("sv").alias("pos", "val"))
            .groupBy("m", "cell", "pos")
            .agg(F.round(F.avg("val"), 6).alias("val"))
        )
        cents = (
            means.groupBy("m", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("s"))
            .select("m", F.col("cell").alias("cent_id"), F.col("s.val").alias("c"))
        )
    # pin the M x K codebook (same rationale as fit_centroids): the PQ
    # searches reference it from both the codes join and the ADC
    # distance-table join — materialize the fit once, lazily
    # (eager=False, see fit_centroids).
    return cents.localCheckpoint(eager=False)


def pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PQ-compressed index: (vec_id, sub, code, err) — each 64-dim
    float vector becomes PQ_M one-byte codes (64x compression at these
    parameters; at 100 TB the codes table replaces the raw embeddings
    for search, err is the per-subspace reconstruction residual).
    Product quantization after Jegou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    cents = fit_pq_codebook(emb)
    final = _pq_assign(_subvectors(emb), cents)
    return (
        final.select(
            "vec_id",
            F.col("m").cast("long").alias("sub"),
            F.col("code").cast("long").alias("code"),
            F.round("d", 6).alias("err"),
        )
        .orderBy("vec_id", "sub")
    )


def knn_pq_adc(spark: SparkSession, sf_dir: str, k: int = IVF_TOP_K) -> DataFrame:
    """Asymmetric-distance top-k: the query is compared to CODEBOOK
    entries once (PQ_M x PQ_K distances, micro fixed-point, broadcast),
    then every vector's approximate distance is a BIGINT sum of PQ_M
    table lookups over the codes table — the search never touches a
    raw embedding, which is the entire point at 100 TB (the scan is
    bytes-per-vector, not floats-per-vector). Fixed-point entries make
    the sum partition-order independent (the unigram-LM trick).

    Honest quality note: the synthetic embeddings are isotropic random
    vectors, whose pairwise distances concentrate — top-10 recall of
    ANY quantizer is low and parameter-noisy there (measured 0.1-0.6
    across M/K sweeps). The pinned property test asserts the robust
    signal instead: ADC's top-10 averages well below the corpus mean
    exact distance. On real (clustered) embeddings PQ recall behaves
    as in Jegou et al."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    cents = fit_pq_codebook(emb)
    codes = _pq_assign(_subvectors(emb), cents).select("vec_id", "m", "code")
    q_sub = _subvectors(emb.where(F.col("vec_id") == QUERY_VEC_ID)).select(
        "m", F.col("sv").alias("qv")
    )
    dtable = q_sub.join(cents, "m").select(
        "m",
        F.col("cent_id").alias("code"),
        F.round(_l2sq(F.col("qv"), F.col("c")) * PQ_MICRO)
        .cast("long")
        .alias("d_micro"),
    )
    adist = (
        codes.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(dtable), ["m", "code"])
        .groupBy("vec_id")
        .agg(F.sum("d_micro").alias("adist_micro"))
    )
    w = Window.orderBy("adist_micro", "vec_id")
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("rank").cast("long").alias("rank"), "vec_id", "adist_micro")
        .orderBy("rank")
    )


def _pq_slices_sql(src: str = "base") -> str:
    slices = ", ".join(
        f"emb[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}]" for m in range(PQ_M)
    )
    return (
        f"SELECT vec_id, CAST(unnest(range({PQ_M})) AS BIGINT) AS m, "
        f"unnest([{slices}]) AS sv FROM {src}"
    )


def _pq_cte_chain(iters: int = PQ_ITERS, include_base: bool = True, src: str = "base") -> str:
    """base + sub + unrolled per-subspace Lloyd CTEs ending at
    ``pc{iters}`` (m, cent_id, c). ``include_base=False`` composes with
    a caller that already defined ``base`` (the IVF+PQ oracle); ``src``
    selects the (vec_id, emb) table the subvectors slice (the residual
    oracle points it at the residual CTE)."""
    d = _l2sq_sql("s.sv", "c.c")
    parts = [
        f"sub AS MATERIALIZED ({_pq_slices_sql(src)})",
        f"pc0 AS (SELECT m, vec_id AS cent_id, sv AS c FROM sub WHERE vec_id < {PQ_K})",
    ]
    if include_base:
        parts.insert(
            0,
            "base AS MATERIALIZED (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)",
        )
    for i in range(1, iters + 1):
        prev = f"pc{i - 1}"
        parts.append(
            f"""pa{i} AS MATERIALIZED (
  SELECT vec_id, m, sv, cent_id AS cell FROM (
    SELECT s.vec_id, s.m, s.sv, c.cent_id,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d}, c.cent_id) AS r
    FROM sub s JOIN {prev} c ON s.m = c.m
  ) t WHERE r = 1
)"""
        )
        parts.append(
            f"""pc{i} AS MATERIALIZED (
  SELECT m, cell AS cent_id, list(val ORDER BY dim) AS c FROM (
    SELECT m, cell, dim, round(avg(val), 6) AS val FROM (
      SELECT m, cell, unnest(range(1, {PQ_SUBDIM + 1})) AS dim, unnest(sv) AS val
      FROM pa{i}
    ) x GROUP BY m, cell, dim
  ) y GROUP BY m, cell
)"""
        )
    return ",\n".join(parts)


def pq_codes_sql(iters: int = PQ_ITERS) -> str:
    d = _l2sq_sql("s.sv", "c.c")
    return f"""WITH {_pq_cte_chain(iters)},
final AS (
  SELECT vec_id, m, cent_id AS code, d FROM (
    SELECT s.vec_id, s.m, c.cent_id, {d} AS d,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d}, c.cent_id) AS r
    FROM sub s JOIN pc{iters} c ON s.m = c.m
  ) t WHERE r = 1
)
SELECT vec_id, CAST(m AS BIGINT) AS sub, CAST(code AS BIGINT) AS code,
       round(d, 6) AS err
FROM final ORDER BY vec_id, sub
"""


def knn_pq_adc_sql(k: int = IVF_TOP_K, iters: int = PQ_ITERS) -> str:
    d = _l2sq_sql("s.sv", "c.c")
    dq = _l2sq_sql("q.sv", "c.c")
    return f"""WITH {_pq_cte_chain(iters)},
codes AS (
  SELECT vec_id, m, cent_id AS code FROM (
    SELECT s.vec_id, s.m, c.cent_id,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d}, c.cent_id) AS r
    FROM sub s JOIN pc{iters} c ON s.m = c.m
  ) t WHERE r = 1
),
dtable AS (
  SELECT q.m, c.cent_id AS code,
         CAST(round({dq} * {PQ_MICRO}) AS BIGINT) AS d_micro
  FROM (SELECT m, sv FROM sub WHERE vec_id = {QUERY_VEC_ID}) q
  JOIN pc{iters} c ON q.m = c.m
),
adist AS (
  SELECT cd.vec_id, sum(dt.d_micro) AS adist_micro
  FROM codes cd JOIN dtable dt ON cd.m = dt.m AND cd.code = dt.code
  WHERE cd.vec_id != {QUERY_VEC_ID}
  GROUP BY cd.vec_id
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id,
       CAST(adist_micro AS BIGINT) AS adist_micro FROM (
  SELECT vec_id, adist_micro,
         row_number() OVER (ORDER BY adist_micro, vec_id) AS rank
  FROM adist
) r WHERE rank <= {k} ORDER BY rank
"""


# --- composed IVF + PQ (the full FAISS-style index layout) -------------

def knn_ivf_pq(
    spark: SparkSession, sf_dir: str, k: int = IVF_TOP_K, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """The full inverted-file + product-quantization search, composed
    end-to-end: distributed coarse k-means fit -> per-cell inverted
    lists STORING PQ codes (the index build joins cell assignment and
    codes once, at build time — at 100 TB this is the materialized
    index table, bytes per vector) -> query probes ``nprobe`` cells and
    ranks candidates by ADC BIGINT sums. The search touches raw floats
    only for the M x K codebook distance table; every per-vector
    operation is a code lookup. This variant trains PQ on RAW vectors
    (kept for the direct A/B); ``knn_ivf_pq_residual`` is the standard
    IVFADC layout (PQ over vec - coarse centroid, per-cell ADC
    tables), with strictly lower reconstruction error — see
    ``test_residual_pq_strictly_improves_reconstruction``."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    coarse = fit_centroids(spark, sf_dir)
    book = fit_pq_codebook(emb)
    # index build: inverted lists of PQ codes
    assigned = _assign_to_centroids(emb, coarse).select("vec_id", "cell")
    codes = _pq_assign(_subvectors(emb), book).select("vec_id", "m", "code")
    index = assigned.join(codes, "vec_id")
    # query side: nprobe nearest cells + ADC table, both broadcast
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    qscored = q.crossJoin(F.broadcast(coarse)).select(
        "cent_id", _cosine(F.col("e"), F.col("c")).alias("ccos")
    )
    wp = Window.orderBy(F.col("ccos").desc(), F.col("cent_id"))
    probe = (
        qscored.withColumn("r", F.row_number().over(wp))
        .where(F.col("r") <= nprobe)
        .select(F.col("cent_id").alias("cell"))
    )
    q_sub = _subvectors(q).select("m", F.col("sv").alias("qv"))
    dtable = q_sub.join(book, "m").select(
        "m",
        F.col("cent_id").alias("code"),
        F.round(_l2sq(F.col("qv"), F.col("c")) * PQ_MICRO)
        .cast("long")
        .alias("d_micro"),
    )
    adist = (
        index.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(probe), "cell")
        .join(F.broadcast(dtable), ["m", "code"])
        .groupBy("vec_id", "cell")
        .agg(F.sum("d_micro").alias("adist_micro"))
    )
    w = Window.orderBy("adist_micro", "vec_id")
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            "adist_micro",
        )
        .orderBy("rank")
    )


def knn_ivf_pq_sql(
    k: int = IVF_TOP_K,
    nprobe: int = IVF_NPROBE,
    c: int = IVF_CENTROIDS,
    kmeans_iters: int = KMEANS_ITERS,
    pq_iters: int = PQ_ITERS,
) -> str:
    ccos = _cosine_sql("e.emb", "c.c")
    d = _l2sq_sql("s.sv", "c.c")
    dq = _l2sq_sql("q.sv", "c.c")
    return f"""WITH {_kmeans_cte_chain(c, kmeans_iters)},
{_pq_cte_chain(pq_iters, include_base=False)},
coarse_scored AS MATERIALIZED (
  SELECT e.vec_id, c.cent_id, {ccos} AS ccos FROM base e, c{kmeans_iters} c
),
assigned AS (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r
    FROM coarse_scored
  ) t WHERE r = 1
),
probe AS (
  SELECT cent_id AS cell FROM (
    SELECT cent_id, row_number() OVER (ORDER BY ccos DESC, cent_id) AS r
    FROM coarse_scored WHERE vec_id = {QUERY_VEC_ID}
  ) t WHERE r <= {nprobe}
),
codes AS MATERIALIZED (
  SELECT vec_id, m, cent_id AS code FROM (
    SELECT s.vec_id, s.m, c.cent_id,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d}, c.cent_id) AS r
    FROM sub s JOIN pc{pq_iters} c ON s.m = c.m
  ) t WHERE r = 1
),
dtable AS (
  SELECT q.m, c.cent_id AS code,
         CAST(round({dq} * {PQ_MICRO}) AS BIGINT) AS d_micro
  FROM (SELECT m, sv FROM sub WHERE vec_id = {QUERY_VEC_ID}) q
  JOIN pc{pq_iters} c ON q.m = c.m
),
adist AS (
  SELECT a.vec_id, a.cell, sum(dt.d_micro) AS adist_micro
  FROM assigned a
  JOIN probe p ON a.cell = p.cell
  JOIN codes cd ON cd.vec_id = a.vec_id
  JOIN dtable dt ON cd.m = dt.m AND cd.code = dt.code
  WHERE a.vec_id != {QUERY_VEC_ID}
  GROUP BY a.vec_id, a.cell
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, CAST(cell AS BIGINT) AS cell,
       CAST(adist_micro AS BIGINT) AS adist_micro FROM (
  SELECT vec_id, cell, adist_micro,
         row_number() OVER (ORDER BY adist_micro, vec_id) AS rank
  FROM adist
) r WHERE rank <= {k} ORDER BY rank
"""


# --- residual IVF+PQ (the standard IVFADC layout) ----------------------

def _residual_vectors(emb: DataFrame, coarse: DataFrame) -> DataFrame:
    """(vec_id, cell, e): each vector replaced by its RESIDUAL vs the
    coarse centroid of its cell (vec - c_cell) — the IVFADC encoding of
    Jegou et al. 2011 §III: residuals have strictly less energy than
    raw vectors (the cell mean is removed), so the same PQ budget
    quantizes them with lower reconstruction error and the ADC
    estimates tighten."""
    assigned = _assign_to_centroids(emb, coarse)
    return assigned.join(
        F.broadcast(coarse), assigned.cell == coarse.cent_id
    ).select(
        "vec_id", "cell", F.zip_with("e", "c", lambda x, y: x - y).alias("e")
    )


def knn_ivf_pq_residual(
    spark: SparkSession, sf_dir: str, k: int = IVF_TOP_K, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVFADC with RESIDUAL encoding — the exact FAISS ``IVFx,PQy``
    layout that ``knn_ivf_pq`` simplifies away: the PQ codebook is
    fitted on residuals (vec - coarse centroid), the inverted lists
    store residual codes, and the query builds a SEPARATE ADC distance
    table per probed cell from its own residual (q - c_cell) — so the
    table is nprobe x M x K entries, still a broadcast-sized model.
    Everything else keeps the composed plan's scale shape: the search
    touches raw floats only for the distance tables; per-vector work is
    code lookups and a BIGINT sum."""
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    coarse = fit_centroids(spark, sf_dir)
    res = _residual_vectors(emb, coarse)
    book = fit_pq_codebook(res.select("vec_id", "e"))
    # index build: inverted lists of residual PQ codes
    codes = _pq_assign(_subvectors(res.select("vec_id", "e")), book).select(
        "vec_id", "m", "code"
    )
    index = res.select("vec_id", "cell").join(codes, "vec_id")
    # query side: nprobe nearest cells, then one ADC table PER CELL
    # from the query's residual against that cell's centroid
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID)
    qscored = q.crossJoin(F.broadcast(coarse)).select(
        "cent_id", "c", _cosine(F.col("e"), F.col("c")).alias("ccos")
    )
    wp = Window.orderBy(F.col("ccos").desc(), F.col("cent_id"))
    probe = (
        qscored.withColumn("r", F.row_number().over(wp))
        .where(F.col("r") <= nprobe)
        .select(F.col("cent_id").alias("cell"), "c")
    )
    q_res = probe.crossJoin(F.broadcast(q.select(F.col("e").alias("qe")))).select(
        "cell", F.zip_with("qe", "c", lambda x, y: x - y).alias("e")
    )
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(PQ_M - 1)),
        lambda m: F.slice(F.col("e"), m * PQ_SUBDIM + 1, PQ_SUBDIM),
    )
    q_sub = q_res.select("cell", F.posexplode(slices).alias("m", "qv"))
    dtable = q_sub.join(F.broadcast(book), "m").select(
        "cell",
        "m",
        F.col("cent_id").alias("code"),
        F.round(_l2sq(F.col("qv"), F.col("c")) * PQ_MICRO)
        .cast("long")
        .alias("d_micro"),
    )
    adist = (
        index.where(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(dtable), ["cell", "m", "code"])
        .groupBy("vec_id", "cell")
        .agg(F.sum("d_micro").alias("adist_micro"))
    )
    w = Window.orderBy("adist_micro", "vec_id")
    return (
        adist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("rank").cast("long").alias("rank"),
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            "adist_micro",
        )
        .orderBy("rank")
    )


def knn_ivf_pq_residual_sql(
    k: int = IVF_TOP_K,
    nprobe: int = IVF_NPROBE,
    c: int = IVF_CENTROIDS,
    kmeans_iters: int = KMEANS_ITERS,
    pq_iters: int = PQ_ITERS,
) -> str:
    ccos = _cosine_sql("e.emb", "c.c")
    d = _l2sq_sql("s.sv", "c.c")
    dq = _l2sq_sql("q.sv", "c.c")
    res_expr = f"list_transform(range(1, {DIM + 1}), i -> e.emb[i] - c.c[i])"
    qres_expr = f"list_transform(range(1, {DIM + 1}), i -> q.emb[i] - c.c[i])"
    qslices = ", ".join(
        f"emb[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}]" for m in range(PQ_M)
    )
    return f"""WITH {_kmeans_cte_chain(c, kmeans_iters)},
coarse_scored AS MATERIALIZED (
  SELECT e.vec_id, c.cent_id, {ccos} AS ccos FROM base e, c{kmeans_iters} c
),
assigned AS MATERIALIZED (
  SELECT vec_id, cent_id AS cell FROM (
    SELECT vec_id, cent_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r
    FROM coarse_scored
  ) t WHERE r = 1
),
res AS MATERIALIZED (
  SELECT e.vec_id, a.cell, {res_expr} AS emb
  FROM base e
  JOIN assigned a ON a.vec_id = e.vec_id
  JOIN c{kmeans_iters} c ON c.cent_id = a.cell
),
{_pq_cte_chain(pq_iters, include_base=False, src="res")},
codes AS MATERIALIZED (
  SELECT vec_id, m, cent_id AS code FROM (
    SELECT s.vec_id, s.m, c.cent_id,
           row_number() OVER (PARTITION BY s.vec_id, s.m
                              ORDER BY {d}, c.cent_id) AS r
    FROM sub s JOIN pc{pq_iters} c ON s.m = c.m
  ) t WHERE r = 1
),
probe AS (
  SELECT cent_id AS cell FROM (
    SELECT cent_id, row_number() OVER (ORDER BY ccos DESC, cent_id) AS r
    FROM coarse_scored WHERE vec_id = {QUERY_VEC_ID}
  ) t WHERE r <= {nprobe}
),
qres AS (
  SELECT p.cell, {qres_expr} AS emb
  FROM probe p
  JOIN c{kmeans_iters} c ON c.cent_id = p.cell,
  (SELECT emb FROM base WHERE vec_id = {QUERY_VEC_ID}) q
),
qsub AS (
  SELECT cell, CAST(unnest(range({PQ_M})) AS BIGINT) AS m,
         unnest([{qslices}]) AS sv
  FROM qres
),
dtable AS (
  SELECT q.cell, q.m, c.cent_id AS code,
         CAST(round({dq} * {PQ_MICRO}) AS BIGINT) AS d_micro
  FROM qsub q JOIN pc{pq_iters} c ON q.m = c.m
),
adist AS (
  SELECT a.vec_id, a.cell, sum(dt.d_micro) AS adist_micro
  FROM assigned a
  JOIN codes cd ON cd.vec_id = a.vec_id
  JOIN dtable dt ON dt.cell = a.cell AND dt.m = cd.m AND dt.code = cd.code
  WHERE a.vec_id != {QUERY_VEC_ID}
  GROUP BY a.vec_id, a.cell
)
SELECT CAST(rank AS BIGINT) AS rank, vec_id, CAST(cell AS BIGINT) AS cell,
       CAST(adist_micro AS BIGINT) AS adist_micro FROM (
  SELECT vec_id, cell, adist_micro,
         row_number() OVER (ORDER BY adist_micro, vec_id) AS rank
  FROM adist
) r WHERE rank <= {k} ORDER BY rank
"""


# --- SemDeDup: semantic deduplication over embedding clusters ----------

# Data-calibrated: the synth corpus's planted near-duplicate pairs sit
# above 0.4 cosine while the same-cell background tops out ~0.41 at the
# 99.9th percentile (measured at sf0.01). Real encoders (the paper uses
# OpenCLIP / OPT embeddings) concentrate much higher — there eps is
# 0.95+; the knob, not the value, is the operator.
SEMDEDUP_EPS = COSINE_DUP_THRESHOLD


def semantic_dedup(
    spark: SparkSession,
    sf_dir: str,
    eps: float = SEMDEDUP_EPS,
    strategy: str = "auto",
    n_salts: int = NEAR_DUP_SALTS,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster
    the embedding space, then inside each cluster drop every vector
    that is eps-cosine-close to a vector ranked BEFORE it. Rank order
    follows the paper: ascending cosine-to-centroid (the most atypical
    member of each semantic group survives), ties by vec_id. The rule
    is the paper's released implementation — "dominated by any
    earlier-ranked eps-neighbor", not transitive closure — so it is
    non-recursive and exactly SQL-expressible.

    Returns one row per vector: (vec_id, cell, ccos, kept).

    Scale shape (100 TB):
    - the cluster fit is the existing distributed Lloyd job
      (``fit_centroids``; in production the parquet model table from
      jobs/fit_models.py) — the paper scales K with N so cluster
      size stays roughly constant, which bounds BOTH the per-cell rank
      window and the intra-cell pair volume (O(N^2/K) total);
    - pair enumeration reuses the near-dup strategies: size-gated
      broadcast self-join at small scale, salted block-pair SHUFFLE
      join (``block_pairs``, similarity.py near-dups) when the
      assigned table outgrows the broadcast budget — per-task memory
      is one sub-block pair, never a cell;
    - the dominated set is a distinct (vec_id) anti-join back — one
      narrow shuffle keyed by vec_id.
    """
    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _dvec(F.col("embedding")).alias("e")
    )
    cents = fit_centroids(spark, sf_dir)
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id", "e", "cent_id", _cosine(F.col("e"), F.col("c")).alias("ccos")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cent_id")
    )
    assigned = (
        scored.withColumn("r", F.row_number().over(w_assign))
        .where(F.col("r") == 1)
        # round BEFORE ranking: the rank order must be reproducible
        # across engines, and 1e-16 summation noise would reorder
        # near-equal centroid cosines
        .select(
            "vec_id", "e", F.col("cent_id").alias("cell"),
            F.round("ccos", 6).alias("ccos"),
        )
    )
    w_rank = Window.partitionBy("cell").orderBy(F.col("ccos").asc(), F.col("vec_id"))
    # norm precomputed once: the pair stage then pays ONE dot per pair
    # instead of three (same trick as the near-dup kernel)
    ranked = assigned.withColumn("rnk", F.row_number().over(w_rank)).withColumn(
        "nn", F.sqrt(_dot(F.col("e"), F.col("e")))
    )

    def _pair_cos(a_side, b_side):
        return F.round(
            _dot(F.col(f"{a_side}.e"), F.col(f"{b_side}.e"))
            / F.greatest(
                F.col(f"{a_side}.nn") * F.col(f"{b_side}.nn"), F.lit(1e-300)
            ),
            6,
        )

    if strategy == "auto":
        strategy = (
            "broadcast"
            if 0 < _input_bytes(load_embeddings(spark, sf_dir)) <= BROADCAST_PAIR_JOIN_MAX_BYTES
            else "block_pairs"
        )
    if strategy == "broadcast":
        a, b = ranked.alias("a"), ranked.alias("b")
        joined = a.join(
            F.broadcast(b),
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.rnk") < F.col("b.rnk")),
        )
        dominated = (
            joined.where(_pair_cos("a", "b") >= F.lit(eps))
            .select(F.col("b.vec_id").alias("vec_id"))
            .distinct()
        )
    else:
        # shared salted block-pair shuffle join (``_block_pair_join``);
        # every unordered same-cell pair meets exactly once, then the
        # LATER-ranked member is the dominated one
        joined = _block_pair_join(ranked, n_salts, "rnk")
        dominated = (
            joined.where(_pair_cos("a", "b") >= F.lit(eps))
            .select(
                F.when(F.col("a.rnk") < F.col("b.rnk"), F.col("b.vec_id"))
                .otherwise(F.col("a.vec_id"))
                .alias("vec_id")
            )
            .distinct()
        )

    return (
        ranked.join(
            dominated.withColumn("_dom", F.lit(True)), "vec_id", "left"
        )
        .select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.col("cell").cast("long").alias("cell"),
            "ccos",
            F.col("_dom").isNull().alias("kept"),
        )
        .orderBy("vec_id")
    )


def semantic_dedup_sql(
    eps: float = SEMDEDUP_EPS,
    k: int = IVF_CENTROIDS,
    iters: int = KMEANS_ITERS,
) -> str:
    ccos = _cosine_sql("e.emb", "c.c")
    pdot = _dot_sql("i.emb", "j.emb")
    return f"""
WITH {_kmeans_cte_chain(k, iters)},
sd_scored AS (
  SELECT e.vec_id, e.emb, c.cent_id, {ccos} AS ccos FROM base e, c{iters} c
),
sd_assigned AS (
  SELECT vec_id, emb, cent_id AS cell, round(ccos, 6) AS ccos FROM (
    SELECT vec_id, emb, cent_id, ccos,
           row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS r
    FROM sd_scored
  ) t WHERE r = 1
),
sd_ranked AS MATERIALIZED (
  SELECT *, row_number() OVER (PARTITION BY cell ORDER BY ccos ASC, vec_id) AS rnk,
         sqrt({_dot_sql('emb', 'emb')}) AS nn
  FROM sd_assigned
),
sd_dominated AS (
  SELECT DISTINCT j.vec_id
  FROM sd_ranked i JOIN sd_ranked j
    ON j.cell = i.cell AND i.rnk < j.rnk
   AND round({pdot} / greatest(i.nn * j.nn, 1e-300), 6) >= {eps}
)
SELECT r.vec_id, CAST(r.cell AS BIGINT) AS cell, r.ccos,
       (d.vec_id IS NULL) AS kept
FROM sd_ranked r LEFT JOIN sd_dominated d ON d.vec_id = r.vec_id
ORDER BY r.vec_id
"""


QUERIES = {
    "sim_knn_brute_force": knn_brute_force,
    "sim_knn_ivf": knn_ivf_fitted,
    "sim_knn_ivf_pinned": knn_ivf,
    "sim_centroid_fit": centroid_fit,
    "sim_quantize_int8": quantize_int8,
    "sim_pq_codes": pq_codes,
    "sim_knn_pq": knn_pq_adc,
    "sim_knn_ivf_pq": knn_ivf_pq,
    "sim_knn_ivf_pq_residual": knn_ivf_pq_residual,
    "sim_semantic_dedup": semantic_dedup,
    "dedup_embedding_cosine": embedding_near_dups,
}

ORACLES = {
    "sim_knn_brute_force": knn_brute_force_sql(),
    "sim_knn_ivf": knn_ivf_fitted_sql(),
    "sim_knn_ivf_pinned": knn_ivf_sql(),
    "sim_centroid_fit": centroid_fit_sql(),
    "sim_quantize_int8": quantize_int8_sql(),
    "sim_pq_codes": pq_codes_sql(),
    "sim_knn_pq": knn_pq_adc_sql(),
    "sim_knn_ivf_pq": knn_ivf_pq_sql(),
    "sim_knn_ivf_pq_residual": knn_ivf_pq_residual_sql(),
    "sim_semantic_dedup": semantic_dedup_sql(),
    "dedup_embedding_cosine": embedding_near_dups_sql(),
}
