"""Keyword-taxonomy document classification — the broadcast-dimension
labeling stage of a training-data pipeline: a curated keyword→topic map
(the dimension) classifies every document (the corpus) so downstream
mixing can balance topics, not just sources. This is the map-side-join
classification shape: the taxonomy is tiny and BROADCAST; the corpus is
scanned once, map-only.

Rules (deterministic, SQL-restatable):
  - A document's score for topic T = total term frequency of T's
    keywords in the document (token multiset, not distinct).
  - Dominant topic = argmax score, ties by topic name ASC; documents
    hitting no keyword are 'unclassified'.

Everything is integer counts plus one exact share division — oracle
parity by construction.

Scale shape at 100 TB:
  1. The taxonomy is a literal VALUES dimension (here ~27 rows; real
     taxonomies are thousands — still broadcast-sized by definition).
  2. Doc scoring is MAP-ONLY: per-topic tf is a fold over the token
     array against the broadcast keyword map — implemented as explode +
     broadcast-join + per-doc agg, whose shuffle is keyed by doc_id and
     collapses map-side to <= |topics| rows per doc.
  3. Profiles are dimension-keyed partial aggs over the labeled corpus.

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


def _taxonomy_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        list(TOPIC_KEYWORDS), ["topic", "keyword"]
    )


def _doc_topic_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, topic, hits): per-document topic term frequencies —
    explode + broadcast keyword join + doc-keyed partial agg."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens_nonempty(F.col("text"))).alias("word")
    )
    return (
        tok.join(
            F.broadcast(_taxonomy_df(spark)),
            tok.word == F.col("keyword"),
        )
        .groupBy("doc_id", "topic")
        .agg(F.count("*").cast("bigint").alias("hits"))
    )


def taxonomy_doc_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, topic, hits, n_topics): the dominant topic per document
    (argmax hits, ties by topic ASC); zero-hit documents appear as
    'unclassified' with 0 hits."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    scores = _doc_topic_scores(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("hits"), F.asc("topic")
    )
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_topics",
            F.count("*").over(Window.partitionBy("doc_id")).cast("bigint"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    return d.join(best, "doc_id", "left").select(
        "doc_id",
        F.coalesce("topic", F.lit(UNCLASSIFIED)).alias("topic"),
        F.coalesce("hits", F.lit(0).cast("bigint")).alias("hits"),
        F.coalesce("n_topics", F.lit(0).cast("bigint")).alias("n_topics"),
    )


def taxonomy_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, topic, n_docs, share_r): dominant-topic distribution per
    source — the mixing panel's topic-balance input."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    labeled = taxonomy_doc_topics(spark, sf_dir).select("doc_id", "topic")
    cen = (
        d.join(labeled, "doc_id")
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
        taxonomy_doc_topics(spark, sf_dir)
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
