"""Heaps-law vocabulary growth audit over the `documents` table — how
fast the distinct-token vocabulary grows as the corpus is ingested in
doc_id order (Heaps 1978: V(n) ~ K * n^beta). Tokenizer and
vocabulary-budget planning reads this curve: a corpus whose tail deciles
still mint many new words needs a bigger (or byte-level) vocabulary;
one that flattens early is template-heavy.

The naive form scans the corpus once per prefix point. This operator is
ONE pass: each word's FIRST document (min doc_id over its occurrences)
decides which ingestion decile mints it, so the whole curve falls out of

  word census (min doc_id)  ->  decile binning  ->  10-row rollup
  ->  running sum over the 10-row frame.

Deciles are doc_id-VALUE bins (bin = floor(doc_id * 10 / (max_id + 1))):
an ingestion-order audit wants prefix points, and the id space is the
ingestion order here; rank-exact prefixes would need the lm.py
closed-form rank machinery for no auditing gain (documented trade).

Scale shape: one exchange for the word census (vocabulary-bounded
output, map-side combined), one 1-row max broadcast, a 10-row rollup,
and a window over the 10-row frame. Nothing corpus-proportional past
the census.

Reference scope: the reference engine (mrjob WordCount/ChiSquared) has
no vocabulary-growth surface; part of the training-data-pipeline
extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

GROWTH_BINS = 10


def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bin, n_docs, n_tokens, n_new_words, vocab_cumulative): per
    ingestion decile, the corpus mass it adds and the words it mints;
    vocab_cumulative is the running vocabulary size — the Heaps curve."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(tokens_nonempty(F.col("text"))).alias("word")
    )
    mx = d.agg((F.max("doc_id") + 1).alias("m"))
    b = GROWTH_BINS
    firsts = (
        tok.groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
        .crossJoin(F.broadcast(mx))
        .select(F.expr(f"CAST(first_doc * {b} div m AS INT)").alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n_new_words"))
    )
    mass = (
        tok.crossJoin(F.broadcast(mx))
        .select(
            "doc_id", F.expr(f"CAST(doc_id * {b} div m AS INT)").alias("bin")
        )
        .groupBy("bin")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_tokens"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    return (
        mass.join(firsts, "bin", "left")
        .select(
            "bin",
            "n_docs",
            "n_tokens",
            F.coalesce("n_new_words", F.lit(0)).alias("n_new_words"),
        )
        .select(
            "bin",
            "n_docs",
            "n_tokens",
            "n_new_words",
            F.sum("n_new_words").over(w).alias("vocab_cumulative"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "vocab_growth_curve": vocab_growth_curve,
}

_TOKS = duckdb_tokens_sql()

ORACLES: dict[str, str] = {
    "vocab_growth_curve": f"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKS}) AS word FROM documents
        ),
        mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
        firsts AS (
            SELECT CAST(min(doc_id) * {GROWTH_BINS} // (SELECT m FROM mx)
                        AS INTEGER) AS bin,
                   word
            FROM tok GROUP BY word
        ),
        minted AS (
            SELECT bin, CAST(count(*) AS BIGINT) AS n_new_words
            FROM firsts GROUP BY bin
        ),
        mass AS (
            SELECT CAST(doc_id * {GROWTH_BINS} // (SELECT m FROM mx)
                        AS INTEGER) AS bin,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(count(*) AS BIGINT) AS n_tokens
            FROM tok GROUP BY 1
        )
        SELECT m.bin, m.n_docs, m.n_tokens,
               coalesce(f.n_new_words, 0) AS n_new_words,
               CAST(sum(coalesce(f.n_new_words, 0)) OVER (
                   ORDER BY m.bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS vocab_cumulative
        FROM mass m LEFT JOIN minted f USING (bin)
    """,
}
