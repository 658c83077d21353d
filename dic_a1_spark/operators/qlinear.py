"""Linear quality-classifier inference — the model-based filtering
stage of a training-data pipeline (the CCNet / fastText-classifier
pattern: a tiny linear model over token features scores every document;
the corpus is kept/binned by score). The MODEL here is a fixture — a
literal integer weight table standing in for trained parameters — but
the inference plan is the production one: broadcast the weight vector,
score map-only, aggregate the label census.

Scoring (all exact integer arithmetic — weights are INTEGERS, the
standard quantized-inference trick, so cross-engine parity is by
construction):

  raw(d)   = sum_{t in d} w(t) * tf(d, t) + BIAS     (BIGINT)
  label(d) = raw(d) >= 0
  score_fp = (raw(d) * 100) div n_tokens(d)          (fixed-point
             per-token score, floor division — the repo's
             floor-before-cast rule, no doubles anywhere)

Scale shape at 100 TB:
  1. The weight table is model-sized (vocabulary of the classifier,
     1e5-ish in production) — a literal map expression here; at real
     model sizes the same fold runs against a broadcast map column
     (the taxonomy.py join form is the alternative shape).
  2. Scoring is ONE map-only fold over the token array — no explode,
     no join, ZERO corpus shuffles; unmatched tokens fold as weight 0
     — exactly fastText's sparse dot product.
  3. The censuses are dimension-keyed partial aggs over the scored
     map output.

Reference scope: the reference engine has no classifier surface; part
of the training-data-pipeline extension (quality family, the trained
counterpart of textstats.py's heuristic quality scores).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# The fixture model: integer token weights (a trained classifier would
# ship the same table; integers are the quantized-inference form).
# Content-ish terms positive, filler negative — chosen so both labels
# and several score bands are populated at sf0.01 (Q11 non-vacuity).
QLIN_WEIGHTS: tuple[tuple[str, int], ...] = (
    ("agg", 2),
    ("batch", 1),
    ("big", -1),
    ("column", 2),
    ("customer", 1),
    ("data", -1),
    ("dup", 3),
    ("fast", -2),
    ("filter", 2),
    ("group", 1),
    ("hash", 2),
    ("join", 2),
    ("key", 1),
    ("line", -1),
    ("merge", 2),
    ("order", 1),
    ("part", -1),
    ("query", 1),
    ("row", -1),
    ("scan", 1),
    ("slow", -2),
    ("small", -1),
    ("sort", 1),
    ("spark", 1),
    ("stream", 1),
    ("table", 1),
    ("the", -2),
    ("value", -1),
    ("vector", 2),
    ("window", 1),
)
QLIN_BIAS = -40
# Fixed-point histogram bucket width (score_fp units).
QLIN_BUCKET_W = 20


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, n_tokens, raw, label, score_fp): the sparse dot
    product as ONE map-only fold over the token array against the
    literal weight map — no explode, no join, no shuffle (fastText
    inference is a pure map; the broadcast-dimension JOIN form of
    classification is taxonomy.py's demonstration). Unmatched tokens
    fold as weight 0 via element_at coalesce."""
    d = load_table(spark, sf_dir, "documents")
    map_lit = ", ".join(
        f"'{w}', CAST({v} AS BIGINT)" for w, v in QLIN_WEIGHTS
    )
    return (
        d.select(
            "doc_id",
            "source",
            tokens_nonempty(F.col("text")).alias("toks"),
        )
        .select(
            "doc_id",
            "source",
            F.size("toks").cast("bigint").alias("n_tokens"),
            # Outer coalesce: a NULL text tokenizes to a NULL array and
            # the fold returns NULL, while the oracle's LEFT JOIN +
            # COALESCE(dot, 0) scores the doc at the bias (r9 NULL-corpus
            # sweep). An absent document body carries zero evidence —
            # raw = bias, label = bias >= 0 — in both engines.
            (
                F.coalesce(
                    F.expr(
                        f"aggregate(toks, CAST(0 AS BIGINT),"
                        f" (acc, w) -> acc + coalesce(map({map_lit})[w],"
                        f" CAST(0 AS BIGINT)))"
                    ),
                    F.lit(0).cast("bigint"),
                )
                + F.lit(QLIN_BIAS).cast("bigint")
            ).alias("raw"),
        )
        .withColumn("label", F.col("raw") >= 0)
        .withColumn(
            "score_fp",
            F.when(
                F.col("n_tokens") > 0,
                F.expr("raw * 100 div n_tokens"),
            ).otherwise(F.lit(0).cast("bigint")),
        )
    )


def qlin_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, raw, label, score_fp): per-document classifier
    output."""
    return _scored(spark, sf_dir).select(
        "doc_id", "n_tokens", "raw", "label", "score_fp"
    )


def qlin_label_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_pos, pos_share_r): keep-rate per source —
    the panel a curation run reads before applying the filter."""
    s = _scored(spark, sf_dir)
    agg = s.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("label").cast("bigint")).cast("bigint").alias("n_pos"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_pos",
        F.round(
            F.col("n_pos").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("pos_share_r"),
    )


def qlin_score_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, n_docs, n_pos): fixed-point score histogram — integer
    division buckets (Spark `div` and DuckDB `//` both TRUNCATE toward
    zero on negative BIGINTs — verified identical, so negative scores
    bucket the same way in both engines)."""
    s = _scored(spark, sf_dir)
    return (
        s.withColumn(
            "bucket",
            F.expr(f"score_fp div {QLIN_BUCKET_W}").cast("bigint"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.col("label").cast("bigint")).cast("bigint").alias(
                "n_pos"
            ),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "qlin_doc_scores": qlin_doc_scores,
    "qlin_label_census": qlin_label_census,
    "qlin_score_histogram": qlin_score_histogram,
}

_TOKS = duckdb_tokens_sql()

_W_VALUES = ", ".join(f"('{w}', {v})" for w, v in QLIN_WEIGHTS)

_SCORED_CTE = f"""
    wt(word, w) AS (VALUES {_W_VALUES}),
    base AS (
        SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ),
    dots AS (
        SELECT t.doc_id, CAST(sum(wt.w) AS BIGINT) AS dot
        FROM (SELECT doc_id, unnest(toks) AS word FROM base) t
        JOIN wt ON t.word = wt.word
        GROUP BY t.doc_id
    ),
    scored AS (
        SELECT b.doc_id, b.source,
               CAST(len(b.toks) AS BIGINT) AS n_tokens,
               CAST(COALESCE(d.dot, 0) + ({QLIN_BIAS}) AS BIGINT) AS raw,
               (COALESCE(d.dot, 0) + ({QLIN_BIAS})) >= 0 AS label,
               CAST(CASE WHEN len(b.toks) > 0
                    THEN (COALESCE(d.dot, 0) + ({QLIN_BIAS})) * 100
                         // len(b.toks)
                    ELSE 0 END AS BIGINT) AS score_fp
        FROM base b LEFT JOIN dots d USING (doc_id)
    )
"""

ORACLES: dict[str, str] = {
    "qlin_doc_scores": f"""
        WITH {_SCORED_CTE}
        SELECT doc_id, n_tokens, raw, label, score_fp FROM scored
    """,
    "qlin_label_census": f"""
        WITH {_SCORED_CTE}
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos,
               round(CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 6) AS pos_share_r
        FROM scored GROUP BY source
    """,
    "qlin_score_histogram": f"""
        WITH {_SCORED_CTE}
        SELECT CAST(score_fp // {QLIN_BUCKET_W} AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos
        FROM scored GROUP BY 1
    """,
}
