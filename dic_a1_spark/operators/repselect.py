"""Quality-aware duplicate-cluster representative selection — the
"keep the best copy" stage of a curation pipeline (RefinedWeb/FineWeb
keep one document per near-dup cluster, and picking the HIGHEST-QUALITY
member instead of an arbitrary survivor measurably improves the kept
corpus): per order-insensitive duplicate group (dedup.py's tokenset
hash — one construction shared with sampling/corpusops so identities
never drift), the representative is the member with the best
qlinear.py quality score, ties to the lowest doc_id.

Composes two certified subtrees — the tokenset content identity and the
map-only linear quality classifier — and everything is exact BIGINT
arithmetic (score_fp is qlinear's fixed-point score), so oracle parity
is by construction.

Scale shape at 100 TB:
  1. Scoring is qlinear's zero-shuffle map projection.
  2. ONE shuffle keyed by the content hash: the selection window
     (score_fp desc, doc_id asc) and the per-group count share the same
     partitioning — no second exchange, no join back to the corpus.
  3. The gain panel is a 1-row aggregate over group-level rows.

Reference scope: no dedup surface in the reference engine; part of the
training-data-pipeline extension (dedup/curation family — the selection
policy layer above the dedup ladder's group assignment).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import (
    duckdb_tokens_sql,
    duckdb_tokenset_md5_sql,
)
from dic_a1_spark.operators.dedup import tokenset_hash
from dic_a1_spark.operators.qlinear import _SCORED_CTE, _scored
from dic_a1_spark.sources.readers import load_table


def _members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tokenset_hash, doc_id, score_fp): every corpus doc with its
    content identity and quality score — one map-only projection."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokenset_hash(F.col("text")).alias("tokenset_hash")
    )
    scored = _scored(spark, sf_dir).select("doc_id", "score_fp")
    # doc_id-keyed join of two corpus projections; at scale both sides
    # come off the same scan, and Catalyst collapses this into one
    # projection when the inputs share the parquet scan.
    return d.join(scored, "doc_id")


def repselect_best_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tokenset_hash, keep_doc_id, n_docs, best_score_fp, minid_doc_id):
    the quality-aware survivor per duplicate group next to the naive
    min-id survivor — the audit row a selection policy review reads."""
    m = _members(spark, sf_dir)
    w = Window.partitionBy("tokenset_hash")
    ranked = m.select(
        "tokenset_hash",
        "doc_id",
        "score_fp",
        F.row_number()
        .over(w.orderBy(F.desc("score_fp"), F.asc("doc_id")))
        .alias("rn"),
        F.count("*").over(w).cast("bigint").alias("n_docs"),
        F.min("doc_id").over(w).cast("bigint").alias("minid_doc_id"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "tokenset_hash",
        F.col("doc_id").alias("keep_doc_id"),
        "n_docs",
        F.col("score_fp").alias("best_score_fp"),
        "minid_doc_id",
    )


def repselect_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row policy panel: (n_groups, n_multi_groups, docs_removed,
    best_total_fp, minid_total_fp, gain_fp) — how much fixed-point
    quality best-of-cluster selection gains over the naive min-id
    survivor across the whole corpus. All exact integers."""
    m = _members(spark, sf_dir)
    w = Window.partitionBy("tokenset_hash")
    ranked = m.select(
        "tokenset_hash",
        "doc_id",
        "score_fp",
        F.row_number()
        .over(w.orderBy(F.desc("score_fp"), F.asc("doc_id")))
        .alias("rn"),
        F.row_number().over(w.orderBy(F.asc("doc_id"))).alias("rn_id"),
        F.count("*").over(w).cast("bigint").alias("n_docs"),
    )
    per_group = ranked.groupBy("tokenset_hash").agg(
        F.max("n_docs").alias("n_docs"),
        F.sum(F.when(F.col("rn") == 1, F.col("score_fp"))).cast("bigint")
        .alias("best_fp"),
        F.sum(F.when(F.col("rn_id") == 1, F.col("score_fp"))).cast("bigint")
        .alias("minid_fp"),
    )
    return per_group.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum((F.col("n_docs") >= 2).cast("bigint")).cast("bigint").alias(
            "n_multi_groups"
        ),
        F.sum(F.col("n_docs") - 1).cast("bigint").alias("docs_removed"),
        F.sum("best_fp").cast("bigint").alias("best_total_fp"),
        F.sum("minid_fp").cast("bigint").alias("minid_total_fp"),
        (F.sum("best_fp") - F.sum("minid_fp")).cast("bigint").alias("gain_fp"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "repselect_best_of_group": repselect_best_of_group,
    "repselect_gain": repselect_gain,
}

_TOKS = duckdb_tokens_sql()
_TSMD5 = duckdb_tokenset_md5_sql()

_MEMBERS_CTE = f"""
    members AS (
        SELECT d.doc_id,
               {_TSMD5}
                   AS tokenset_hash,
               s.score_fp
        FROM documents d JOIN scored s USING (doc_id)
    ),
    ranked AS (
        SELECT tokenset_hash, doc_id, score_fp,
               row_number() OVER (
                   PARTITION BY tokenset_hash
                   ORDER BY score_fp DESC, doc_id ASC) AS rn,
               row_number() OVER (
                   PARTITION BY tokenset_hash ORDER BY doc_id ASC) AS rn_id,
               CAST(count(*) OVER (PARTITION BY tokenset_hash) AS BIGINT)
                   AS n_docs,
               CAST(min(doc_id) OVER (PARTITION BY tokenset_hash) AS BIGINT)
                   AS minid_doc_id
        FROM members
    )
"""

ORACLES: dict[str, str] = {
    "repselect_best_of_group": f"""
        WITH {_SCORED_CTE}, {_MEMBERS_CTE}
        SELECT tokenset_hash, doc_id AS keep_doc_id, n_docs,
               score_fp AS best_score_fp, minid_doc_id
        FROM ranked WHERE rn = 1
    """,
    "repselect_gain": f"""
        WITH {_SCORED_CTE}, {_MEMBERS_CTE},
        per_group AS (
            SELECT tokenset_hash,
                   max(n_docs) AS n_docs,
                   CAST(sum(CASE WHEN rn = 1 THEN score_fp END) AS BIGINT)
                       AS best_fp,
                   CAST(sum(CASE WHEN rn_id = 1 THEN score_fp END) AS BIGINT)
                       AS minid_fp
            FROM ranked GROUP BY tokenset_hash
        )
        SELECT CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_multi_groups,
               CAST(sum(n_docs - 1) AS BIGINT) AS docs_removed,
               CAST(sum(best_fp) AS BIGINT) AS best_total_fp,
               CAST(sum(minid_fp) AS BIGINT) AS minid_total_fp,
               CAST(sum(best_fp) - sum(minid_fp) AS BIGINT) AS gain_fp
        FROM per_group
    """,
}
