"""Keyword-taxonomy document classification — the dimension-labeling
stage of a training-data pipeline: a curated keyword→topic map (the
dimension) classifies every document (the corpus) so downstream mixing
can balance topics, not just sources. The dimension is embedded as a
literal map and the WHOLE labeling — per-topic term frequency, argmax
with deterministic tie-break, zero-hit fallback — happens inside one
map-only projection: zero corpus shuffles (measured: the earlier
explode + broadcast-join + window form ran at 28.8K docs/s amplified;
this form removes the doc_id window shuffle entirely). At real
taxonomy sizes the literal map becomes a broadcast map column — same
plan shape.

Rules (deterministic, SQL-restatable):
  - A document's score for topic T = total term frequency of T's
    keywords in the document (token multiset, not distinct).
  - Dominant topic = argmax score, ties by topic name ASC; documents
    hitting no keyword are 'unclassified'.

Everything is integer counts plus one exact share division — oracle
parity by construction.

Scale shape at 100 TB:
  1. The taxonomy is a literal dimension (here ~24 keywords; real
     taxonomies are thousands — broadcast-sized by definition).
  2. Labeling is MAP-ONLY (see above); the score table for the
     coverage census is an explode of the same projection — still no
     join.
  3. Profiles are dimension-keyed partial aggs over the labeled corpus
     (one shuffle each, map-side combine).

Reference scope: the classification-by-side-file pattern mirrors the
reference's stopword side-file distribution (src/wordCountJob.py:41-48,
SURVEY.md S3) — same broadcast-dimension mechanics, inverted from
filtering to labeling.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# The engine's deterministic taxonomy over the corpus vocabulary —
# a literal constant so the Spark plan and the SQL oracle share one
# source of truth (the config.STOPWORDS pattern).
TOPIC_KEYWORDS: tuple[tuple[str, str], ...] = (
    ("execution", "agg"),
    ("execution", "filter"),
    ("execution", "hash"),
    ("execution", "join"),
    ("execution", "merge"),
    ("execution", "scan"),
    ("execution", "sort"),
    ("planning", "group"),
    ("planning", "order"),
    ("planning", "part"),
    ("planning", "query"),
    ("planning", "spark"),
    ("similarity", "dup"),
    ("similarity", "key"),
    ("similarity", "vector"),
    ("storage", "column"),
    ("storage", "line"),
    ("storage", "row"),
    ("storage", "table"),
    ("streaming", "batch"),
    ("streaming", "fast"),
    ("streaming", "slow"),
    ("streaming", "stream"),
    ("streaming", "window"),
)
UNCLASSIFIED = "unclassified"


_TOPICS: tuple[str, ...] = tuple(sorted({t for t, _ in TOPIC_KEYWORDS}))

# Literal SQL fragments shared by every query: keyword -> topic map and
# the topic list (SQL-text lambdas throughout — the PySpark 4.1
# multi-lambda cross-wiring pitfall, SCALING.md).
_KW_MAP_SQL = "map(" + ", ".join(
    f"'{k}', '{t}'" for t, k in TOPIC_KEYWORDS
) + ")"
_TOPICS_SQL = "array(" + ", ".join(f"'{t}'" for t in _TOPICS) + ")"


def _with_topic_arr(d: DataFrame) -> DataFrame:
    """Append `arr`: per-document array of (topic, hits) structs — ONE
    map-only projection (per-topic term frequency via the literal
    keyword map; |topics| passes over the token array, zero shuffles)."""
    return d.select(
        "doc_id",
        "source",
        tokens_nonempty(F.col("text")).alias("toks"),
    ).select(
        "doc_id",
        "source",
        F.expr(
            f"transform({_TOPICS_SQL}, t -> struct(t AS topic,"
            f" CAST(size(filter(toks, w -> {_KW_MAP_SQL}[w] = t))"
            f" AS BIGINT) AS hits))"
        ).alias("arr"),
    )


def _labeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, topic, hits, n_topics): dominant-topic labels,
    MAP-ONLY — argmax hits with topic-ASC tie-break computed inside the
    projection (min topic among max-hit topics), no window, no join,
    zero corpus shuffles. Zero-hit docs label 'unclassified'."""
    d = load_table(spark, sf_dir, "documents")
    return (
        _with_topic_arr(d)
        .select(
            "doc_id",
            "source",
            "arr",
            F.expr("array_max(transform(arr, x -> x.hits))").alias("h_max"),
        )
        .select(
            "doc_id",
            "source",
            F.when(
                F.col("h_max") > 0,
                F.expr(
                    "array_min(transform(filter(arr,"
                    " x -> x.hits = array_max(transform(arr,"
                    " y -> y.hits))), z -> z.topic))"
                ),
            )
            .otherwise(F.lit(UNCLASSIFIED))
            .alias("topic"),
            F.when(F.col("h_max") > 0, F.col("h_max"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("hits"),
            F.expr(
                "CAST(size(filter(arr, x -> x.hits > 0)) AS BIGINT)"
            ).alias("n_topics"),
        )
    )


def _doc_topic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, topic, hits): the exploded positive-hit score table —
    derived from the same map-only projection (no broadcast join
    needed: the literal keyword map IS the dimension)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        _with_topic_arr(d)
        .select(
            "doc_id",
            F.explode(F.expr("filter(arr, x -> x.hits > 0)")).alias("s"),
        )
        .select(
            "doc_id",
            F.col("s.topic").alias("topic"),
            F.col("s.hits").alias("hits"),
        )
    )


def taxonomy_doc_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, topic, hits, n_topics): the dominant topic per document
    (argmax hits, ties by topic ASC); zero-hit documents appear as
    'unclassified' with 0 hits. Map-only — see `_labeled`."""
    return _labeled(spark, sf_dir).select(
        "doc_id", "topic", "hits", "n_topics"
    )


def taxonomy_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, topic, n_docs, share_r): dominant-topic distribution per
    source — the mixing panel's topic-balance input."""
    cen = (
        _labeled(spark, sf_dir)
        .groupBy("source", "topic")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    tot = cen.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("src_docs")
    )
    return cen.join(tot, "source").select(
        "source",
        "topic",
        "n_docs",
        F.round(
            F.col("n_docs").cast("double") / F.col("src_docs").cast("double"),
            6,
        ).alias("share_r"),
    )


def taxonomy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(topic, n_docs_dominant, n_docs_any, tf_total): per-topic
    coverage census — dominant-label counts vs any-hit document counts
    vs raw keyword term frequency."""
    scores = _doc_topic_scores(spark, sf_dir)
    any_hit = scores.groupBy("topic").agg(
        F.count("*").cast("bigint").alias("n_docs_any"),
        F.sum("hits").cast("bigint").alias("tf_total"),
    )
    dom = (
        _labeled(spark, sf_dir)
        .groupBy("topic")
        .agg(F.count("*").cast("bigint").alias("n_docs_dominant"))
    )
    return (
        any_hit.join(dom, "topic", "full")
        .select(
            "topic",
            F.coalesce("n_docs_dominant", F.lit(0).cast("bigint")).alias(
                "n_docs_dominant"
            ),
            F.coalesce("n_docs_any", F.lit(0).cast("bigint")).alias(
                "n_docs_any"
            ),
            F.coalesce("tf_total", F.lit(0).cast("bigint")).alias("tf_total"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "taxonomy_doc_topics": taxonomy_doc_topics,
    "taxonomy_source_profile": taxonomy_source_profile,
    "taxonomy_coverage": taxonomy_coverage,
}

_TOKS = duckdb_tokens_sql()

_TAX_VALUES = ", ".join(f"('{t}', '{k}')" for t, k in TOPIC_KEYWORDS)

_SCORES_CTE = f"""
    tax(topic, keyword) AS (VALUES {_TAX_VALUES}),
    tokw AS (
        SELECT doc_id, unnest({_TOKS}) AS word FROM documents
    ),
    scores AS (
        SELECT t.doc_id, x.topic, CAST(count(*) AS BIGINT) AS hits
        FROM tokw t JOIN tax x ON t.word = x.keyword
        GROUP BY t.doc_id, x.topic
    )
"""

_DOC_TOPICS_SQL = f"""
    WITH {_SCORES_CTE},
    best AS (
        SELECT doc_id, topic, hits,
               CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT)
                   AS n_topics,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY hits DESC, topic ASC
               ) AS rn
        FROM scores
    )
    SELECT d.doc_id,
           COALESCE(b.topic, '{UNCLASSIFIED}') AS topic,
           COALESCE(b.hits, 0) AS hits,
           COALESCE(b.n_topics, 0) AS n_topics
    FROM documents d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
"""

ORACLES: dict[str, str] = {
    "taxonomy_doc_topics": _DOC_TOPICS_SQL,
    "taxonomy_source_profile": f"""
        WITH labeled AS ({_DOC_TOPICS_SQL}),
        cen AS (
            SELECT d.source, l.topic, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents d JOIN labeled l USING (doc_id)
            GROUP BY d.source, l.topic
        ),
        tot AS (
            SELECT source, CAST(sum(n_docs) AS BIGINT) AS src_docs
            FROM cen GROUP BY source
        )
        SELECT c.source, c.topic, c.n_docs,
               round(CAST(c.n_docs AS DOUBLE)
                     / CAST(t.src_docs AS DOUBLE), 6) AS share_r
        FROM cen c JOIN tot t USING (source)
    """,
    "taxonomy_coverage": f"""
        WITH {_SCORES_CTE},
        any_hit AS (
            SELECT topic, CAST(count(*) AS BIGINT) AS n_docs_any,
                   CAST(sum(hits) AS BIGINT) AS tf_total
            FROM scores GROUP BY topic
        ),
        dom AS (
            SELECT topic, CAST(count(*) AS BIGINT) AS n_docs_dominant
            FROM ({_DOC_TOPICS_SQL}) GROUP BY topic
        )
        SELECT COALESCE(a.topic, d.topic) AS topic,
               COALESCE(d.n_docs_dominant, 0) AS n_docs_dominant,
               COALESCE(a.n_docs_any, 0) AS n_docs_any,
               COALESCE(a.tf_total, 0) AS tf_total
        FROM any_hit a FULL JOIN dom d ON a.topic = d.topic
    """,
}
