"""Embedding-space example mining — contrastive-training support ops
over the `embeddings` table:

  - `embedding_hard_negatives`: for each query vector, the HARD_K most
    cosine-similar vectors with a DIFFERENT label — the classic
    hard-negative set for contrastive/metric learning (high similarity,
    wrong class).
  - `embedding_knn_purity`: for each query vector, how many of its
    TOP_K nearest neighbors (any label) share its label — the kNN
    label-consistency audit run before trusting labels or embeddings
    for mining at all.

Both reuse similarity.py's certified arithmetic: the sequential-fold
cosine (`_cosine_pre`, bit-equal to DuckDB's list_dot_product order)
and the broadcast-queries / scan-candidates / per-query-top-k shape of
`knn_cosine_bruteforce` (driver-certified r3+r4). At cluster scale the
Q x N score frame is the thing to kill — the IVF/quantized/PQ variants
in similarity.py/quantize.py/pq.py are the scale path; these operators
certify the mining SEMANTICS on the exact path.

Reference scope: the reference engine (mrjob chi-square pipeline) has
no embedding surface; this module is part of the training-data-pipeline
extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.operators.similarity import (
    N_QUERIES,
    TOP_K,
    _cosine_pre,
    _norm,
)
from dic_a1_spark.sources.readers import load_table

# Hard negatives kept per query.
HARD_K = 5


def _scored_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, query_label, neighbor_id, neighbor_label, sim) for the
    broadcast query set against the full corpus scan."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("embedding").alias("qv"),
        _norm(F.col("embedding")).alias("qn"),
    )
    return (
        F.broadcast(q)
        .crossJoin(
            e.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("neighbor_label"),
                F.col("embedding").alias("nv"),
                _norm(F.col("embedding")).alias("nn"),
            )
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.round(
                _cosine_pre(F.col("qv"), F.col("nv"), F.col("qn"), F.col("nn")),
                4,
            ).alias("sim"),
        )
    )


def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-HARD_K different-label neighbors per query, most similar
    first. The label filter lands BEFORE the rank window, so the top-k
    state never holds same-label rows."""
    scored = _scored_pairs(spark, sf_dir).where(
        F.col("query_label") != F.col("neighbor_label")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= HARD_K)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            "sim",
            "rank",
        )
    )


def embedding_knn_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label purity of each query's TOP_K neighborhood: n_same of the
    exact top-K (any label) sharing the query's label, purity = n_same/K
    (one exact-integer division)."""
    scored = _scored_pairs(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    topk = scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= TOP_K
    )
    return (
        topk.groupBy("query_id", "query_label")
        .agg(
            F.sum(
                (F.col("neighbor_label") == F.col("query_label")).cast("long")
            ).alias("n_same_label")
        )
        .select(
            "query_id",
            "query_label",
            "n_same_label",
            F.round(
                F.col("n_same_label").cast("double") / float(TOP_K), 4
            ).alias("purity"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embedding_hard_negatives": embedding_hard_negatives,
    "embedding_knn_purity": embedding_knn_purity,
}

_COS_QN = (
    "(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(n.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),"
    " CAST(q.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(n.embedding AS DOUBLE[]),"
    " CAST(n.embedding AS DOUBLE[])))))"
)

_SCORED_CTE = f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               n.vec_id AS neighbor_id, n.label AS neighbor_label,
               round({_COS_QN}, 4) AS sim
        FROM embeddings q JOIN embeddings n ON q.vec_id <> n.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
"""

ORACLES: dict[str, str] = {
    "embedding_hard_negatives": _SCORED_CTE
    + f"""
    , ranked AS (
        SELECT query_id, query_label, neighbor_id, neighbor_label, sim,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
               ) AS INTEGER) AS rank
        FROM scored WHERE query_label <> neighbor_label
    )
    SELECT * FROM ranked WHERE rank <= {HARD_K}
    """,
    "embedding_knn_purity": _SCORED_CTE
    + f"""
    , ranked AS (
        SELECT *,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC
               ) AS rank
        FROM scored
    ),
    topk AS (SELECT * FROM ranked WHERE rank <= {TOP_K})
    SELECT query_id, query_label,
           CAST(sum(CASE WHEN neighbor_label = query_label
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
           round(CAST(sum(CASE WHEN neighbor_label = query_label
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / {float(TOP_K)!r}, 4) AS purity
    FROM topk GROUP BY query_id, query_label
    """,
}
