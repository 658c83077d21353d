"""Inverted-index construction — the index-export stage behind the
repo's retrieval family (bm25.py scores online; a production system
also SHIPS the index): per term, the document-frequency and a bounded,
deterministically-ordered posting list, plus an index-health census.

Posting lists are emitted as NUMERIC-SORTED space-joined strings (the
repo's scalar-output rule — the driver's canonicalizer cannot hash
array cells), capped at INDEX_MAX_POSTINGS entries with an explicit
`truncated` flag: a silent cap would read as full coverage (the
no-silent-caps rule).

Scale shape at 100 TB:
  1. One corpus-sized explode of the per-doc DISTINCT token array
     (array_distinct BEFORE explode shrinks the shuffle — the chisq.py
     doc-frequency trick), one partial-agg shuffle keyed by term.
  2. The cap is applied BEFORE the collect: one term-keyed window
     computes row_number (doc_id asc) and the exact per-term count in
     the same exchange, rows past INDEX_MAX_POSTINGS are dropped, and
     only then does collect_list run — the aggregation buffer holds at
     most K entries per term, never df(term). A viral term still
     streams its df rows through one window task (spillable sorter,
     constant-memory rank/count), but no df-sized array is ever
     materialized (the r7 collect-then-slice shape is gone).
  3. The census is a second dimension-keyed agg over the same frame.

Reference scope: the reference's (word, category) document-frequency
table (src/wordCountJob.py:75-79) IS a coarse inverted index keyed by
category; this operator keys by document and ships the posting lists.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Posting-list cap (entries per term). 50 keeps both flag branches
# populated on the driver corpus: viral terms (df ~400) truncate, the
# rare 'dup' term (df ~25) ships whole — Q11 non-vacuity.
INDEX_MAX_POSTINGS = 50


def _term_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id) with per-doc distinct — df semantics."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(
            F.array_distinct(tokens_nonempty(F.col("text")))
        ).alias("term"),
    )


def index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, n_shipped, truncated, postings): the exported index —
    postings = first INDEX_MAX_POSTINGS doc_ids ascending, space-joined.

    The cap lives INSIDE the aggregation path: rank + exact df come
    from one term-keyed window (one exchange), rows past the cap are
    filtered before collect_list, and the follow-up groupBy reuses the
    window's hash partitioning (no second exchange). df stays exact —
    it is counted over the full partition before the filter — so the
    `truncated` flag is unchanged from the r7 form."""
    from pyspark.sql import Window

    td = _term_docs(spark, sf_dir)
    w = Window.partitionBy("term")
    capped = td.select(
        "term",
        "doc_id",
        F.row_number().over(w.orderBy("doc_id")).alias("rn"),
        F.count("*").over(w).cast("bigint").alias("df_full"),
    ).where(F.col("rn") <= INDEX_MAX_POSTINGS)
    agg = capped.groupBy("term").agg(
        F.max("df_full").cast("bigint").alias("df"),
        F.sort_array(F.collect_list("doc_id")).alias("head"),
    )
    return agg.select(
        "term",
        "df",
        F.size("head").cast("bigint").alias("n_shipped"),
        (F.col("df") > INDEX_MAX_POSTINGS).alias("truncated"),
        F.expr(
            "array_join(transform(head, x -> CAST(x AS STRING)), ' ')"
        ).alias("postings"),
    )


def index_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row index census: (n_terms, n_postings_total, n_truncated,
    max_df, avg_df_r) — the panel that sizes the shipped index."""
    td = _term_docs(spark, sf_dir)
    per_term = td.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df")
    )
    return per_term.agg(
        F.count("*").cast("bigint").alias("n_terms"),
        F.sum("df").cast("bigint").alias("n_postings_total"),
        F.sum((F.col("df") > INDEX_MAX_POSTINGS).cast("bigint"))
        .cast("bigint")
        .alias("n_truncated"),
        F.max("df").cast("bigint").alias("max_df"),
        (
            F.sum("df").cast("double") / F.count("*").cast("double")
        ).alias("avg_df_r"),
    ).select(
        "n_terms",
        "n_postings_total",
        "n_truncated",
        "max_df",
        F.round("avg_df_r", 4).alias("avg_df_r"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "index_postings": index_postings,
    "index_health": index_health,
}

_TOKS = duckdb_tokens_sql()

_TD_CTE = f"""
    td AS (
        SELECT doc_id, unnest(list_distinct({_TOKS})) AS term
        FROM documents
    )
"""

ORACLES: dict[str, str] = {
    "index_postings": f"""
        WITH {_TD_CTE},
        agg AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df,
                   list_sort(list(doc_id))[1:{INDEX_MAX_POSTINGS}] AS head
            FROM td GROUP BY term
        )
        SELECT term, df,
               CAST(len(head) AS BIGINT) AS n_shipped,
               df > {INDEX_MAX_POSTINGS} AS truncated,
               array_to_string(head, ' ') AS postings
        FROM agg
    """,
    "index_health": f"""
        WITH {_TD_CTE},
        per_term AS (
            SELECT term, CAST(count(*) AS BIGINT) AS df
            FROM td GROUP BY term
        )
        SELECT CAST(count(*) AS BIGINT) AS n_terms,
               CAST(sum(df) AS BIGINT) AS n_postings_total,
               CAST(sum(CASE WHEN df > {INDEX_MAX_POSTINGS} THEN 1 ELSE 0
                        END) AS BIGINT) AS n_truncated,
               CAST(max(df) AS BIGINT) AS max_df,
               round(CAST(sum(df) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
                   AS avg_df_r
        FROM per_term
    """,
}
