"""Similarity search over the `embeddings` table (vec_id, embedding:
array<float> (64-dim), label).

Baseline: brute-force cosine top-k — correct, O(Q x N), the yardstick.
Scale path: IVF coarse quantization (assign to nearest centroid, probe a
subset of inverted lists) — turns the candidate set from N into N/K per
probe; on a cluster the lists are co-partitioned by centroid so a probe
touches a bounded slice. All vector math is built-in higher-order
functions (zip_with + aggregate) on doubles — JVM-side, no UDFs.

Float discipline: dot products are sequential left-to-right folds in both
engines; outputs are rounded (4dp) and ranked by (rounded sim, id) so
cross-engine ordering is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

N_QUERIES = 10       # vec_id < 10 act as the query set
TOP_K = 5
IVF_K = 8            # first IVF_K vectors double as coarse centroids
IVF_NPROBE = 2


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold dot-product over double-cast elements."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(_norm(F.col("embedding")), 4).alias("l2_norm"),
    )


def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-K neighbors for the query set. The query side is tiny ->
    broadcast; the candidate scan parallelizes over input splits; the only
    shuffle is the per-query top-k window over Q x N scored rows. At
    cluster scale Q x N is the thing to kill — see the IVF variant."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(e.select(F.col("vec_id").alias("neighbor_id"),
                            F.col("embedding").alias("nv")))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantizer: nearest of IVF_K centroids (the first IVF_K
    vectors serve as a deterministic codebook) per vector. Centroids are
    broadcast; assignment is a map-only argmax — the partitioning key for
    co-located inverted lists at scale."""
    e = load_table(spark, sf_dir, "embeddings")
    cent = e.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    scored = F.broadcast(cent).crossJoin(
        e.select("vec_id", F.col("embedding").alias("v"))
    ).select(
        "vec_id",
        "centroid_id",
        F.round(cosine(F.col("v"), F.col("cv")), 4).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select("vec_id", "centroid_id", F.col("sim").alias("centroid_sim"))
    )


def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF: probe the IVF_NPROBE nearest centroid lists per query,
    brute-force only within those lists. Rows-only check (the oracle twin
    would re-state the whole pipeline); recall vs the brute-force baseline
    is asserted in tests/test_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings")
    assign = ivf_assignments(spark, sf_dir)
    cent = e.where(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
    )
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    qprobe = (
        F.broadcast(q)
        .crossJoin(cent)
        .select(
            "query_id", "qv", "centroid_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 4).alias("csim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    probes = (
        qprobe.withColumn("rnk", F.row_number().over(wq))
        .where(F.col("rnk") <= IVF_NPROBE)
        .select("query_id", "qv", "centroid_id")
    )
    lists = assign.join(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")),
        assign.vec_id == F.col("neighbor_id"),
    ).select("centroid_id", "neighbor_id", "nv")
    scored = (
        probes.join(lists, "centroid_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("nv")), 4).alias("sim"),
        )
        .distinct()  # a neighbor can appear via multiple probed lists
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (sim >= 0.9) within a bounded
    id range — the semantic-dedup primitive. Bounded here to keep the
    oracle cross join honest; the scale path blocks by IVF centroid first."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    a = e.select(F.col("vec_id").alias("id1"), F.col("embedding").alias("v1"))
    b = e.select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
    return (
        a.crossJoin(b)
        .where(F.col("id1") < F.col("id2"))
        .select(
            "id1", "id2",
            F.round(cosine(F.col("v1"), F.col("v2")), 4).alias("sim"),
        )
        .where(F.col("sim") >= 0.9)
    )


def label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean-vector cohesion: average pairwise-free proxy
    (each vector's cosine to its label centroid), exact arithmetic via
    element-wise mean then dot. Demonstrates vector aggregation
    (posexplode -> per-dimension mean -> re-assemble)."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", "vec_id", F.posexplode("embedding").alias("pos", "x")
    )
    cent = dims.groupBy("label", "pos").agg(
        (F.round(F.sum(F.col("x").cast("double")), 6) / F.count("*")).alias("cx")
    )
    cvec = cent.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "cx"))
        ).alias("pairs")
    ).select(
        "label", F.expr("transform(pairs, p -> p.cx)").alias("cv")
    )
    joined = e.join(cvec, "label").select(
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding"), F.col("cv")), 4).alias("centroid_sim"),
    )
    return joined


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embedding_norms": embedding_norms,
    "knn_cosine_bruteforce": knn_cosine_bruteforce,
    "ivf_assignments": ivf_assignments,
    "knn_cosine_ivf": knn_cosine_ivf,  # rows-only; recall asserted in pytest
    "embedding_neardup_pairs": embedding_neardup_pairs,
    # rows-only: the per-dimension mean -> reassemble -> cosine chain has no
    # tractably-identical SQL twin; shape checked by the driver, cohesion
    # property (own-label centroid closest on average) in pytest.
    "label_centroid_sim": label_centroid_sim,
}

# Engine-neutral cosine for the oracle: identical sequential fold via
# list_reduce over the zipped products would be ideal; DuckDB 1.0 lacks
# list_reduce, so use list_dot_product / sqrt — both accumulate
# left-to-right over DOUBLE after an explicit element cast.
_COS = (
    "(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
)

_COS_QN = _COS.format(a="q.embedding", b="n.embedding")
_COS_VC = _COS.format(a="v.embedding", b="c.embedding")
_COS_12 = _COS.format(a="a.embedding", b="b.embedding")

ORACLES: dict[str, str] = {
    "embedding_norms": """
        SELECT vec_id, label,
               CAST(len(embedding) AS INTEGER) AS dim,
               round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                           CAST(embedding AS DOUBLE[]))), 4) AS l2_norm
        FROM embeddings
    """,
    "knn_cosine_bruteforce": f"""
        WITH scored AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   round({_COS_QN}, 4) AS sim
            FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
            WHERE q.vec_id < {N_QUERIES}
        ),
        ranked AS (
            SELECT query_id, neighbor_id, sim,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
                   ) AS INTEGER) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, sim, rank FROM ranked WHERE rank <= {TOP_K}
    """,
    "ivf_assignments": f"""
        WITH scored AS (
            SELECT v.vec_id, c.vec_id AS centroid_id,
                   round({_COS_VC}, 4) AS sim
            FROM embeddings v JOIN embeddings c ON c.vec_id < {IVF_K}
        ),
        ranked AS (
            SELECT vec_id, centroid_id, sim,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY sim DESC, centroid_id ASC
                   ) AS rnk
            FROM scored
        )
        SELECT vec_id, centroid_id, sim AS centroid_sim FROM ranked WHERE rnk = 1
    """,
    "embedding_neardup_pairs": f"""
        SELECT a.vec_id AS id1, b.vec_id AS id2,
               round({_COS_12}, 4) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 300 AND b.vec_id < 300
          AND round({_COS_12}, 4) >= 0.9
    """,
}
