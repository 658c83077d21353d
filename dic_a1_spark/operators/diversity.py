"""Lexical-diversity audits per source — the corpus-health panel a
training-data pipeline reads before mixing: a source whose n-gram
diversity collapses is templated/boilerplate (upweight dedup), one
whose diversity is too high is noise (OCR garbage, encoding damage).

Metrics (all from exact integer sufficient statistics — the ONLY
doubles are single divisions of BIGINTs, bit-equal across engines by
construction; no ln()/entropy, whose libm behavior forks engines —
Simpson diversity is the standard log-free alternative):

  - distinct-n ratios (Li et al. 2016, "A Diversity-Promoting
    Objective"): distinct n-grams / total n-grams, n = 1,2,3.
  - Simpson diversity 1 - sum(c_w^2)/C^2 and its inverse C^2/sum(c_w^2)
    (the "effective vocabulary size" — how many equally-common words
    would produce the same repeat probability).
  - cross-document bigram repetition: share of a source's distinct
    bigrams seen in >= 2 of its documents — templated sources light up
    here even when per-document diversity looks healthy.

Scale shape at 100 TB: every query is ONE corpus-sized map (token/
n-gram extraction inside a projection) feeding ONE partial-agg shuffle
keyed by (source[, gram]); map-side combine collapses the corpus before
the exchange, and every post-agg frame is vocabulary- or
dimension-sized. No joins against corpus-proportional frames, no
windows over the corpus.

Overflow envelope: sum(c_w^2) <= C^2 needs C < ~3e9 per graded slice
before HUGEINT; a 100 TB run shards the census by source (counts merge
by addition) — the corpusops surprisal sharding note applies verbatim.

Reference scope: the reference engine has no diversity surface; this
module is part of the training-data-pipeline extension mandated by the
build brief (text-analysis family).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table


def _grams_expr(n: int) -> str:
    """SQL expression over `toks` emitting the space-joined n-gram
    array (n >= 2); guarded upstream by size(toks) >= n."""
    joins = ", ' ', ".join(f"toks[i + {k} - 1]" for k in range(n))
    return (
        f"transform(sequence(1, size(toks) - {n - 1}),"
        f" i -> concat({joins}))"
    )


def _doc_toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", "source", tokens_nonempty(F.col("text")).alias("toks")
    )


def diversity_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, total_1, distinct_1, ratio_1, ..., ratio_3):
    distinct-n over unigrams/bigrams/trigrams per source.

    Degenerate sources stay VISIBLE (the ADVICE finding): the per-n
    aggregates are LEFT-joined onto the docs census, so a source whose
    every document is shorter than n tokens reports total_n =
    distinct_n = 0 with a null ratio_n instead of vanishing from the
    panel — exactly the sources a health panel exists to flag."""
    toks = _doc_toks(spark, sf_dir)
    per_n = []
    for n in (1, 2, 3):
        gexpr = "toks" if n == 1 else _grams_expr(n)
        grams = toks.where(F.size("toks") >= n).select(
            "source", F.explode(F.expr(gexpr)).alias("gram")
        )
        per_n.append(
            grams.groupBy("source").agg(
                F.count("*").cast("bigint").alias(f"total_{n}"),
                F.countDistinct("gram").cast("bigint").alias(f"distinct_{n}"),
            )
        )
    docs = toks.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    out = docs
    for f in per_n:
        out = out.join(f, "source", "left")
    for n in (1, 2, 3):
        out = out.withColumn(
            f"total_{n}", F.coalesce(F.col(f"total_{n}"), F.lit(0).cast("bigint"))
        ).withColumn(
            f"distinct_{n}",
            F.coalesce(F.col(f"distinct_{n}"), F.lit(0).cast("bigint")),
        ).withColumn(
            f"ratio_{n}",
            F.when(
                F.col(f"total_{n}") > 0,
                F.round(
                    F.col(f"distinct_{n}").cast("double")
                    / F.col(f"total_{n}").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(None).cast("double")),
        )
    return out


def diversity_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, c_tokens, vocab, sum_sq, simpson_r, eff_vocab_r):
    Simpson diversity from the per-source word census."""
    toks = _doc_toks(spark, sf_dir)
    census = (
        toks.select("source", F.explode("toks").alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    agg = census.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("c_tokens"),
        F.count("*").cast("bigint").alias("vocab"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_sq"),
    )
    c2 = F.col("c_tokens").cast("double") * F.col("c_tokens").cast("double")
    return agg.select(
        "source",
        "c_tokens",
        "vocab",
        "sum_sq",
        F.round(
            F.lit(1.0) - F.col("sum_sq").cast("double") / c2, 6
        ).alias("simpson_r"),
        F.round(c2 / F.col("sum_sq").cast("double"), 4).alias("eff_vocab_r"),
    )


def diversity_cross_doc_bigrams(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """(source, distinct_bigrams, repeated_bigrams, repeat_ratio_r):
    a bigram is `repeated` when it occurs in >= 2 DISTINCT documents of
    the source (per-doc distinct first — the doc-frequency shape)."""
    toks = _doc_toks(spark, sf_dir)
    grams = toks.where(F.size("toks") >= 2).select(
        "doc_id",
        "source",
        F.explode(F.expr(f"array_distinct({_grams_expr(2)})")).alias("gram"),
    )
    df_tbl = grams.groupBy("source", "gram").agg(
        F.count("*").cast("bigint").alias("df")
    )
    agg = df_tbl.groupBy("source").agg(
        F.count("*").cast("bigint").alias("distinct_bigrams"),
        F.sum((F.col("df") >= 2).cast("bigint"))
        .cast("bigint")
        .alias("repeated_bigrams"),
    )
    return agg.select(
        "source",
        "distinct_bigrams",
        "repeated_bigrams",
        F.round(
            F.col("repeated_bigrams").cast("double")
            / F.col("distinct_bigrams").cast("double"),
            6,
        ).alias("repeat_ratio_r"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "diversity_distinct_ngrams": diversity_distinct_ngrams,
    "diversity_simpson": diversity_simpson,
    "diversity_cross_doc_bigrams": diversity_cross_doc_bigrams,
}

_TOKS = duckdb_tokens_sql()


def _grams_sql(n: int) -> str:
    """DuckDB n-gram list over column `toks` (n >= 2)."""
    joins = " || ' ' || ".join(f"toks[i + {k}]" for k in range(n))
    return (
        f"list_transform(range(1, len(toks) - {n - 2}), i -> {joins})"
    )


def _ngram_block(n: int) -> str:
    gexpr = "toks" if n == 1 else _grams_sql(n)
    return f"""
    g{n} AS (
        SELECT source, unnest({gexpr}) AS gram
        FROM tok WHERE len(toks) >= {n}
    ),
    a{n} AS (
        SELECT source, CAST(count(*) AS BIGINT) AS total_{n},
               CAST(count(DISTINCT gram) AS BIGINT) AS distinct_{n}
        FROM g{n} GROUP BY source
    )"""


ORACLES: dict[str, str] = {
    "diversity_distinct_ngrams": f"""
        WITH tok AS (
            SELECT doc_id, source, {_TOKS} AS toks FROM documents
        ),
        docs AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM tok GROUP BY source
        ),
        {",".join(_ngram_block(n) for n in (1, 2, 3))}
        SELECT d.source, d.n_docs,
               COALESCE(a1.total_1, 0) AS total_1,
               COALESCE(a1.distinct_1, 0) AS distinct_1,
               COALESCE(a2.total_2, 0) AS total_2,
               COALESCE(a2.distinct_2, 0) AS distinct_2,
               COALESCE(a3.total_3, 0) AS total_3,
               COALESCE(a3.distinct_3, 0) AS distinct_3,
               CASE WHEN COALESCE(a1.total_1, 0) > 0
                    THEN round(CAST(a1.distinct_1 AS DOUBLE)
                               / CAST(a1.total_1 AS DOUBLE), 6)
                    END AS ratio_1,
               CASE WHEN COALESCE(a2.total_2, 0) > 0
                    THEN round(CAST(a2.distinct_2 AS DOUBLE)
                               / CAST(a2.total_2 AS DOUBLE), 6)
                    END AS ratio_2,
               CASE WHEN COALESCE(a3.total_3, 0) > 0
                    THEN round(CAST(a3.distinct_3 AS DOUBLE)
                               / CAST(a3.total_3 AS DOUBLE), 6)
                    END AS ratio_3
        FROM docs d
        LEFT JOIN a1 USING (source) LEFT JOIN a2 USING (source)
        LEFT JOIN a3 USING (source)
    """,
    "diversity_simpson": f"""
        WITH census AS (
            SELECT source, word, CAST(count(*) AS BIGINT) AS c
            FROM (SELECT source, unnest({_TOKS}) AS word FROM documents)
            GROUP BY source, word
        ),
        agg AS (
            SELECT source,
                   CAST(sum(c) AS BIGINT) AS c_tokens,
                   CAST(count(*) AS BIGINT) AS vocab,
                   CAST(sum(c * c) AS BIGINT) AS sum_sq
            FROM census GROUP BY source
        )
        SELECT source, c_tokens, vocab, sum_sq,
               round(1.0 - CAST(sum_sq AS DOUBLE)
                     / (CAST(c_tokens AS DOUBLE) * CAST(c_tokens AS DOUBLE)),
                     6) AS simpson_r,
               round((CAST(c_tokens AS DOUBLE) * CAST(c_tokens AS DOUBLE))
                     / CAST(sum_sq AS DOUBLE), 4) AS eff_vocab_r
        FROM agg
    """,
    "diversity_cross_doc_bigrams": f"""
        WITH tok AS (
            SELECT doc_id, source, {_TOKS} AS toks FROM documents
        ),
        grams AS (
            SELECT doc_id, source,
                   unnest(list_distinct({_grams_sql(2)})) AS gram
            FROM tok WHERE len(toks) >= 2
        ),
        dfq AS (
            SELECT source, gram, CAST(count(*) AS BIGINT) AS df
            FROM grams GROUP BY source, gram
        ),
        agg AS (
            SELECT source,
                   CAST(count(*) AS BIGINT) AS distinct_bigrams,
                   CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS repeated_bigrams
            FROM dfq GROUP BY source
        )
        SELECT source, distinct_bigrams, repeated_bigrams,
               round(CAST(repeated_bigrams AS DOUBLE)
                     / CAST(distinct_bigrams AS DOUBLE), 6)
                   AS repeat_ratio_r
        FROM agg
    """,
}
