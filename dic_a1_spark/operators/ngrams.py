"""N-gram text analysis: BPE-style token accounting and bigram mining.

The reference tokenizes by whitespace only (src/wordCountJob.py:75); a
training-data pipeline also needs subword-aware token *counting* (cost
estimation for LLM ingestion) and n-gram statistics (phrase mining,
n-gram-overlap dedup support). Both stay pure Column expressions — no
Python in the hot path.

Scale notes:
  - bpe token counting is a map-only pass (regexp count per row); the
    scan reads only (doc_id, text).
  - bigram top-k builds bigrams per document with `transform` over an
    index sequence (no explode until after per-doc distinct), aggregates
    doc frequency, and takes the global top-k via orderBy+limit, which
    Spark executes as TakeOrderedAndProject (per-partition heaps + a
    k-row driver merge, never a global sort).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.functions.text import tokenize
from dic_a1_spark.sources.readers import load_table

# GPT-2-style pre-tokenizer shape, constrained to constructs whose
# semantics agree between Java regex (Spark) and RE2 (DuckDB): runs of
# letters, runs of digits, or runs of other non-space symbols, each with
# an optional leading space. Alternation is leftmost-first in both.
# ONE class divergence needs patching: Java's \s is [ \t\n\x0B\f\r] while
# RE2's \s is [\t\n\f\r ] — NO vertical tab — so without the explicit
# \x0B the oracle emits a symbol token for every VT the Spark side skips
# (found by the r11 unicode hostile corpus, doc "l1\x85l2\x0bl3...").
_BPE_JAVA = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+"
_BPE_RE2 = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s\x0B]+"

TOPK_BIGRAMS = 25


def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BPE-ish token count next to the whitespace count —
    the two numbers an ingestion-cost estimator needs."""
    d = load_table(spark, sf_dir, "documents")
    ws_toks = F.filter(tokenize(F.col("text")), lambda w: w != "")
    bpe_n = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_JAVA), F.lit(0)))
    return d.select(
        "doc_id",
        bpe_n.alias("n_bpe_tokens"),
        F.size(ws_toks).alias("n_ws_tokens"),
        F.round(
            F.length("text").cast("double")
            / F.greatest(bpe_n, F.lit(1)).cast("double"),
            4,
        ).alias("chars_per_bpe_token"),
    )


def text_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigrams by document frequency (each bigram counted once per
    doc), deterministically ordered by (df desc, bigram asc).

    Bigrams are built with zip_with over two slices of a PROJECTED token
    column. The earlier transform(sequence(...), i -> toks[i]...) form
    inlined the whole tokenize expression into the lambda body, so Spark
    re-evaluated tokenization per element — O(T^2) regexp work per doc,
    measured 20x slower at 250K docs (41.7s vs 2.1s)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        F.filter(tokenize(F.col("text")), lambda w: w != "").alias("toks")
    )
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        t.select(F.explode(F.array_distinct(bigrams)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("bigram"))
        .limit(TOPK_BIGRAMS)
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_bpe_token_count": text_bpe_token_count,
    "text_bigram_topk": text_bigram_topk,
}


def _oracles() -> dict[str, str]:
    from dic_a1_spark.config import duckdb_tokens_sql

    toks = duckdb_tokens_sql()
    bpe = _BPE_RE2
    return {
        "text_bpe_token_count": f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{bpe}')) AS n_bpe_tokens,
                   len({toks}) AS n_ws_tokens,
                   round(CAST(length(text) AS DOUBLE)
                         / CAST(greatest(len(regexp_extract_all(text, '{bpe}')), 1)
                                AS DOUBLE), 4) AS chars_per_bpe_token
            FROM documents
        """,
        "text_bigram_topk": f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
            b AS (
                SELECT doc_id,
                       list_distinct(list_transform(range(1, len(toks)),
                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigrams
                FROM t WHERE len(toks) >= 2
            )
            SELECT bigram, count(*) AS df
            FROM (SELECT doc_id, unnest(bigrams) AS bigram FROM b)
            GROUP BY bigram
            ORDER BY df DESC, bigram ASC
            LIMIT {TOPK_BIGRAMS}
        """,
    }


ORACLES: dict[str, str] = _oracles()
