"""End-to-end Amazon-reviews chi-square pipeline — the reference's actual
workload (reviews JSON in, 23-line golden text out), Spark-native.

This is the production shape of what operators/chisq.py exposes over the
driver's `documents` table: same math, but fed from line-delimited reviews
JSON with the reference's exact tolerance and default semantics, a
file-backed stopword list (broadcast anti-join), the counters side-channel
as an in-DAG aggregate, and the reference's raw-text output format.

Reference trace (SURVEY.md §3): the whole two-job mrjob flow
(wordCountJob.py + wordCountWrapper.py + chiSquaredJob.py + main.sh
plumbing) collapses into ONE lazy DAG plus two driver-side collects of
dimension-sized aggregates (counters: |categories| rows; output: |categories|
+ 1 lines).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import CHI2_TOP_K
from dic_a1_spark.functions.text import (
    chi2_expr,
    explode_tokens,
    remove_stopwords,
    zero_margin_filter,
)
from dic_a1_spark.operators.chisq import format_golden_lines, remove_stopwords_df
from dic_a1_spark.sources.readers import read_reviews_json, read_stopwords
from dic_a1_spark.sources.sinks import format_counters_line


def reviews_to_docs(spark: SparkSession, reviews_path: str) -> DataFrame:
    """Reviews JSON -> (doc_id, category, text) with reference semantics:
    malformed lines silently skipped, category default 'Unknown', text
    default '' (reference src/wordCountJob.py:62-72)."""
    return read_reviews_json(spark, reviews_path).select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("category"),
        F.col("reviewText").alias("text"),
    )


def reviews_chisq(
    spark: SparkSession,
    reviews_path: str,
    stopwords_path: str | None = None,
    k: int = CHI2_TOP_K,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (topk, vocab, counters) DataFrames for the reviews corpus.

    Counters (total + per-category review counts) are exact in-DAG
    aggregates — the Spark replacement for the reference's Hadoop counter
    side channel (src/wordCountWrapper.py:32-50), which is retry-safe where
    Spark accumulators would not be."""
    docs = reviews_to_docs(spark, reviews_path)

    tok = explode_tokens(docs, text_col="text")
    if stopwords_path is not None:
        tok = remove_stopwords_df(tok, read_stopwords(spark, stopwords_path))
    else:
        tok = remove_stopwords(tok)

    wc = tok.groupBy("word", "category").agg(F.count("*").alias("n"))
    cat = docs.groupBy("category").agg(F.count("*").alias("cat_n"))
    # Global total derived from category totals — one fewer corpus scan
    # (see operators.chisq.chi2_scores).
    total = cat.agg(F.sum("cat_n").alias("n_total"))

    word_win = Window.partitionBy("word")
    scored = (
        wc.withColumn("word_n", F.sum("n").over(word_win))
        .join(F.broadcast(cat), "category")
        .crossJoin(F.broadcast(total))
    )
    a = F.col("n").cast("double")
    b = (F.col("word_n") - F.col("n")).cast("double")
    c = (F.col("cat_n") - F.col("n")).cast("double")
    d = (F.col("n_total") - F.col("word_n") - F.col("cat_n") + F.col("n")).cast(
        "double"
    )
    n = F.col("n_total").cast("double")
    chi = scored.where(zero_margin_filter(a, b, c, d)).select(
        "category", "word", chi2_expr(a, b, c, d, n).alias("chi2")
    )
    rank_win = Window.partitionBy("category").orderBy(F.desc("chi2"), F.asc("word"))
    topk = chi.withColumn("rank", F.row_number().over(rank_win)).where(
        F.col("rank") <= k
    )
    vocab = topk.select("word").distinct().orderBy("word")
    return topk, vocab, cat.join(F.broadcast(total)).select(
        "category", "cat_n", "n_total"
    )


def run_pipeline(
    spark: SparkSession,
    reviews_path: str,
    output_dir: str,
    stopwords_path: str | None = None,
    k: int = CHI2_TOP_K,
) -> list[str]:
    """Full job: compute, write golden-format output + counters.txt, and
    return the output lines. Mirrors main.sh's artifact layout: a result
    text file (22 category lines + union vocabulary line, reference
    src/chiSquaredJob.py:110-127) and the counters side file
    (src/wordCountWrapper.py:49-50)."""
    topk, vocab, counters = reviews_chisq(spark, reviews_path, stopwords_path, k)

    topk_rows = topk.collect()
    vocab_words = [r["word"] for r in vocab.collect()]
    lines = format_golden_lines(topk_rows, vocab_words)

    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "chisq_output.txt"), "w") as fh:
        fh.write("\n".join(lines) + "\n")

    crows = counters.collect()
    total = crows[0]["n_total"] if crows else 0
    per_cat = {r["category"]: r["cat_n"] for r in crows}
    with open(os.path.join(output_dir, "counters.txt"), "w") as fh:
        fh.write(format_counters_line(total, per_cat) + "\n")
    return lines
