"""Retrieval-augmented context packing — the composition stage after
BM25 retrieval (bm25.py): for each query, take the top-K scored
documents and pack them IN RANK ORDER into a fixed context-token
budget, reporting which candidates fit and how full the window is.
This is the RAG context-assembly shape (and the eval harness for
choosing K and the budget); it composes two already-certified subtrees
— the bm25 scorer and the curation packing arithmetic (running-sum
window, the doc_pack_bins shape).

Packing rule (deterministic, SQL-restatable): candidates are ordered by
(score desc, doc_id asc); candidate r fits iff the running token sum
through r is <= RAG_BUDGET — a PREFIX cut, not best-fit (rank order is
the relevance order; skipping a long high-rank doc to fit a short
low-rank one would reorder relevance). All integer arithmetic except
the bit-equal BM25 scores it inherits.

Scale shape at 100 TB: per query the candidate set is K rows (the
retrieval top-K bounds it); the packing window runs over K-row
per-query partitions — |queries| × K rows total, never
corpus-proportional. The corpus-sized work is the one BM25 scoring
pass shared across the batch.

Reference scope: no retrieval surface in the reference engine; part of
the training-data-pipeline extension (similarity/retrieval family).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.operators.bm25 import (
    BM25_BATCH,
    _scored_batch,
    _hits_cte,
    _scored_sql,
    _tstats_cte,
    _STATS_CTE,
)
from dic_a1_spark.sources.readers import load_table

# Candidates retrieved per query and the context-window token budget.
RAG_TOP_K = 10
RAG_BUDGET = 400


def _packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, rank, doc_id, dl, cum_tokens, fits): the per-query
    prefix-packed candidate table."""
    docs = load_table(spark, sf_dir, "documents")
    allq = _scored_batch(docs, BM25_BATCH)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    cum = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        allq.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= RAG_TOP_K)
        .withColumn("cum_tokens", F.sum("dl").over(cum).cast("bigint"))
        .withColumn("fits", F.col("cum_tokens") <= RAG_BUDGET)
        .select("query_id", "rank", "doc_id", "dl", "cum_tokens", "fits")
    )


def rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed candidate table itself."""
    return _packed(spark, sf_dir)


def rag_pack_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_candidates, n_packed, tokens_packed, budget_util_r):
    per-query window utilization — the K/budget tuning panel."""
    p = _packed(spark, sf_dir)
    agg = p.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_candidates"),
        F.sum(F.col("fits").cast("bigint")).cast("bigint").alias("n_packed"),
        F.sum(
            F.when(F.col("fits"), F.col("dl")).otherwise(F.lit(0))
        ).cast("bigint").alias("tokens_packed"),
    )
    return agg.select(
        "query_id",
        "n_candidates",
        "n_packed",
        "tokens_packed",
        F.round(
            F.col("tokens_packed").cast("double") / F.lit(float(RAG_BUDGET)),
            6,
        ).alias("budget_util_r"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "rag_context_pack": rag_context_pack,
    "rag_pack_summary": rag_pack_summary,
}


def _packed_sql() -> str:
    """The packed table as a SQL body — composes bm25.py's CTE builders
    (single source of truth for the scorer)."""
    parts = []
    selects = []
    for qid, terms in BM25_BATCH:
        h = f"hits_{qid}"
        t = f"tstats_{qid}"
        parts.append(_hits_cte(terms, h))
        parts.append(_tstats_cte(t, h))
        selects.append(
            f"SELECT '{qid}' AS query_id, doc_id, dl, score FROM"
            f" ({_scored_sql(h, t)})"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
        WITH {_STATS_CTE}, {", ".join(parts)},
        allq AS ({union}),
        ranked AS (
            SELECT query_id, doc_id, dl, score,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM allq
        ),
        packed AS (
            SELECT query_id, rank, doc_id, dl,
                   CAST(sum(dl) OVER (
                       PARTITION BY query_id ORDER BY rank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS cum_tokens
            FROM ranked WHERE rank <= {RAG_TOP_K}
        )
        SELECT query_id, rank, doc_id, dl, cum_tokens,
               cum_tokens <= {RAG_BUDGET} AS fits
        FROM packed
    """


ORACLES: dict[str, str] = {
    "rag_context_pack": _packed_sql(),
    "rag_pack_summary": f"""
        WITH packed AS ({_packed_sql()})
        SELECT query_id,
               CAST(count(*) AS BIGINT) AS n_candidates,
               CAST(sum(CASE WHEN fits THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_packed,
               CAST(sum(CASE WHEN fits THEN dl ELSE 0 END) AS BIGINT)
                   AS tokens_packed,
               round(CAST(sum(CASE WHEN fits THEN dl ELSE 0 END) AS DOUBLE)
                     / {float(RAG_BUDGET)!r}, 6) AS budget_util_r
        FROM packed GROUP BY query_id
    """,
}
