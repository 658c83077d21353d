"""Inverted-index compression sizing — the capacity-planning stage
between building an index (postings.py) and shipping it: production
indexes store each term's posting list as DELTA GAPS under a
variable-length group code, and the engineering question before any
shipping decision is "how many bits per posting, and which terms
dominate". The code modeled here is the 4-bit-group variant (3 payload
bits + 1 continuation bit per group — the nibble-packed cousin of the
classic 7+1 byte varint; identical arithmetic with GROUP_PAYLOAD_BITS
= 7): groups(gap) = ceil(bitlen(gap)/3), code_bits = 4 * groups. The
4-bit form is deliberate — on the small driver corpora every delta
gap fits 7 payload bits, so a byte-varint account would have its
multi-group branch vacuous (the Q11 lesson); 3-bit payloads keep both
branches live at every SF while exercising the same staircase. All
arithmetic is exact BIGINT — bitlen via the repo's integer bin()
staircase (the colloc/bm25 idf trick) — so oracle parity is by
construction; the only doubles are single rounded divisions.

Gap convention (documented, both engines): the first posting's gap is
doc_id + 1 (a lag of -1 before the first element), so every gap is
>= 1 and the code never needs a zero-length special case.

Scale shape at 100 TB:
  1. One corpus-sized explode of per-doc DISTINCT tokens (shared shape
     with postings.py) and ONE term-keyed window exchange: lag() is
     constant-memory streaming within the sorted partition.
  2. The per-term aggregate carries constant state (sums/counts) — no
     posting list is ever materialized, so a viral term costs a
     streamed pass, not a df-sized buffer (the postings.py in-agg-cap
     lesson applied from the start).
  3. The summary is a 1-row rollup.

Reference scope: the reference's (word, category) document-frequency
table (src/wordCountJob.py:75-79) is the coarse ancestor of this
index; compression sizing is part of the training-data-pipeline
extension (retrieval family, the sizing companion of postings.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.operators.postings import _term_docs

# payload bits per 4-bit code group (3 payload + 1 continuation).
_GROUP_PAYLOAD_BITS = 3
_GROUP_BITS = 4


def _gapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, gap, code_bits): delta gaps of each term's sorted posting
    list with their group-code sizes — the streamed per-posting frame."""
    td = _term_docs(spark, sf_dir)
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        td.select(
            "term",
            (
                F.col("doc_id")
                - F.coalesce(
                    F.lag("doc_id").over(w), F.lit(-1).cast("bigint")
                )
            ).cast("bigint").alias("gap"),
        )
        .select(
            "term",
            "gap",
            F.expr(
                f"CAST({_GROUP_BITS} * ((length(bin(gap))"
                f" + {_GROUP_PAYLOAD_BITS - 1}) div {_GROUP_PAYLOAD_BITS})"
                f" AS BIGINT)"
            ).alias("code_bits"),
        )
    )


def index_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, code_bits, raw_bits, max_gap, bits_per_posting_r,
    ratio_r): per-term compressed-size account — raw_bits is the
    uncompressed int64 cost (64 * df)."""
    g = _gapped(spark, sf_dir)
    agg = g.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("code_bits").cast("bigint").alias("code_bits"),
        F.max("gap").cast("bigint").alias("max_gap"),
    )
    return agg.select(
        "term",
        "df",
        "code_bits",
        (F.col("df") * F.lit(64)).cast("bigint").alias("raw_bits"),
        "max_gap",
        F.round(
            F.col("code_bits").cast("double") / F.col("df").cast("double"),
            6,
        ).alias("bits_per_posting_r"),
        F.round(
            F.col("code_bits").cast("double")
            / (F.col("df") * F.lit(64)).cast("double"),
            6,
        ).alias("ratio_r"),
    )


def index_compression_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row sizing panel: (n_terms, n_postings, code_bits, raw_bits,
    one_group_gaps, bits_per_posting_r, ratio_r) — the number an index
    capacity plan reads (one_group_gaps counts gaps that fit a single
    4-bit group: the dense-posting share the code exists for)."""
    g = _gapped(spark, sf_dir)
    agg = g.agg(
        F.countDistinct("term").cast("bigint").alias("n_terms"),
        F.count("*").cast("bigint").alias("n_postings"),
        F.sum("code_bits").cast("bigint").alias("code_bits"),
        F.sum((F.col("code_bits") == _GROUP_BITS).cast("bigint"))
        .cast("bigint")
        .alias("one_group_gaps"),
    )
    return agg.select(
        "n_terms",
        "n_postings",
        "code_bits",
        (F.col("n_postings") * F.lit(64)).cast("bigint").alias("raw_bits"),
        "one_group_gaps",
        F.round(
            F.col("code_bits").cast("double")
            / F.col("n_postings").cast("double"),
            6,
        ).alias("bits_per_posting_r"),
        F.round(
            F.col("code_bits").cast("double")
            / (F.col("n_postings") * F.lit(64)).cast("double"),
            6,
        ).alias("ratio_r"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "index_compression": index_compression,
    "index_compression_summary": index_compression_summary,
}

_TOKS = duckdb_tokens_sql()

_GAPPED_CTE = f"""
    td AS (
        SELECT doc_id, unnest(list_distinct({_TOKS})) AS term
        FROM documents
    ),
    gapped AS (
        SELECT term,
               CAST(doc_id - coalesce(lag(doc_id) OVER (
                   PARTITION BY term ORDER BY doc_id), -1) AS BIGINT) AS gap
        FROM td
    ),
    sized AS (
        SELECT term, gap,
               CAST({_GROUP_BITS} * ((length(bin(gap))
                    + {_GROUP_PAYLOAD_BITS - 1}) // {_GROUP_PAYLOAD_BITS})
                    AS BIGINT) AS code_bits
        FROM gapped
    )
"""

ORACLES: dict[str, str] = {
    "index_compression": f"""
        WITH {_GAPPED_CTE}
        SELECT term,
               CAST(count(*) AS BIGINT) AS df,
               CAST(sum(code_bits) AS BIGINT) AS code_bits,
               CAST(count(*) * 64 AS BIGINT) AS raw_bits,
               CAST(max(gap) AS BIGINT) AS max_gap,
               round(CAST(sum(code_bits) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS bits_per_posting_r,
               round(CAST(sum(code_bits) AS DOUBLE)
                     / CAST(count(*) * 64 AS DOUBLE), 6) AS ratio_r
        FROM sized GROUP BY term
    """,
    "index_compression_summary": f"""
        WITH {_GAPPED_CTE}
        SELECT CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
               CAST(count(*) AS BIGINT) AS n_postings,
               CAST(sum(code_bits) AS BIGINT) AS code_bits,
               CAST(count(*) * 64 AS BIGINT) AS raw_bits,
               CAST(sum(CASE WHEN code_bits = 4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS one_group_gaps,
               round(CAST(sum(code_bits) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS bits_per_posting_r,
               round(CAST(sum(code_bits) AS DOUBLE)
                     / CAST(count(*) * 64 AS DOUBLE), 6) AS ratio_r
        FROM sized
    """,
}
