"""Apply the learned BPE vocabulary back to the corpus — the
token-budget planning stage of a tokenizer-training pipeline: once
bpe.py has induced the merge table, the pipeline needs to know how many
SUBWORD tokens each source contributes (mixture weights and context
budgets are set in tokens, not words) and how well the vocabulary
compresses the corpus (chars per piece — the number tokenizer authors
tune vocabulary size against).

Composition: the per-word segmentation after BPE_ROUNDS merges
(bpe._rounds — the certified merge loop) joins the per-(source, word)
corpus census; everything downstream is exact BIGINT sums, with single
rounded divisions as the only doubles (bit-equal by construction).

Words the census excludes (containing the ``<``/``>`` sentinels, which
the tokenizer preserves — SURVEY.md P3) carry NO segmentation row and
are reported per source as `unseg_tokens` instead of silently dropped
(the diversity panel's left-join lesson).

Scale shape at 100 TB:
  1. One corpus-sized partial-agg shuffle keyed by (source, word) — the
     census; map-side combine collapses the corpus before the exchange.
  2. The segmentation map is vocabulary-sized; the join is keyed by
     word (one vocab-bounded shuffle of the census — NEVER a broadcast:
     the vocabulary is corpus-derived and grows with the corpus, the
     r4 pinned-broadcast lesson).
  3. Per-source rollups are dimension-sized.

Reference scope: the reference engine counts whitespace words only
(src/wordCountJob.py:75); subword accounting is part of the
training-data-pipeline extension (text-analysis family).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.operators.bpe import (
    BPE_ROUNDS,
    _round_ctes,
    _rounds,
    _WORDS_CTE,
)
from dic_a1_spark.sources.readers import load_table


def _seg_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, n_pieces, n_chars): the vocabulary segmentation table
    after BPE_ROUNDS merges."""
    seqs, _ = _rounds(spark, sf_dir)
    return seqs.select(
        "word",
        F.size(
            F.expr("split(substring(seq, 2, length(seq) - 2), '><')")
        ).cast("bigint").alias("n_pieces"),
        F.length("word").cast("bigint").alias("n_chars"),
    )


def _source_word_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, word, c): per-source token census — the one
    corpus-sized shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            "source", F.explode(tokens_nonempty(F.col("text"))).alias("word")
        )
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def bpe_corpus_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, word_tokens, word_types, subword_tokens, unseg_tokens,
    pieces_per_word_r): the per-source token budget under the induced
    vocabulary. subword_tokens is what a context-length planner needs;
    unseg_tokens counts sentinel-bearing words the vocabulary cannot
    segment (kept visible, never dropped)."""
    cen = _source_word_census(spark, sf_dir)
    seg = _seg_map(spark, sf_dir).select("word", "n_pieces")
    j = cen.join(seg, "word", "left")
    agg = j.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("word_tokens"),
        F.count("*").cast("bigint").alias("word_types"),
        F.sum(
            F.when(
                F.col("n_pieces").isNotNull(), F.col("c") * F.col("n_pieces")
            ).otherwise(F.lit(0))
        ).cast("bigint").alias("subword_tokens"),
        F.sum(
            F.when(F.col("n_pieces").isNull(), F.col("c")).otherwise(F.lit(0))
        ).cast("bigint").alias("unseg_tokens"),
    )
    seg_tokens = F.col("word_tokens") - F.col("unseg_tokens")
    return agg.select(
        "source",
        "word_tokens",
        "word_types",
        "subword_tokens",
        "unseg_tokens",
        F.when(
            seg_tokens > 0,
            F.round(
                F.col("subword_tokens").cast("double")
                / seg_tokens.cast("double"),
                6,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("pieces_per_word_r"),
    )


def bpe_corpus_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row vocabulary-fit panel: (seg_word_tokens, subword_tokens,
    seg_chars, chars_per_piece_r, pieces_per_word_r) over the
    SEGMENTABLE corpus slice — chars_per_piece is the compression
    number a tokenizer author tunes vocabulary size against."""
    cen = _source_word_census(spark, sf_dir)
    seg = _seg_map(spark, sf_dir)
    j = cen.join(seg, "word")  # inner: the segmentable slice by definition
    agg = j.agg(
        F.sum("c").cast("bigint").alias("seg_word_tokens"),
        F.sum(F.col("c") * F.col("n_pieces")).cast("bigint").alias(
            "subword_tokens"
        ),
        F.sum(F.col("c") * F.col("n_chars")).cast("bigint").alias("seg_chars"),
    )
    return agg.select(
        "seg_word_tokens",
        "subword_tokens",
        "seg_chars",
        F.round(
            F.col("seg_chars").cast("double")
            / F.col("subword_tokens").cast("double"),
            6,
        ).alias("chars_per_piece_r"),
        F.round(
            F.col("subword_tokens").cast("double")
            / F.col("seg_word_tokens").cast("double"),
            6,
        ).alias("pieces_per_word_r"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bpe_corpus_token_counts": bpe_corpus_token_counts,
    "bpe_corpus_compression": bpe_corpus_compression,
}

_TOKS = duckdb_tokens_sql()

_SEGMAP_CTE = f"""
    segmap AS (
        SELECT word,
               CAST(len(string_split(substr(seq, 2, length(seq) - 2),
                                     '><')) AS BIGINT) AS n_pieces,
               CAST(length(word) AS BIGINT) AS n_chars
        FROM seqs_{BPE_ROUNDS}
    ),
    swcen AS (
        SELECT source, word, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT source, unnest({_TOKS}) AS word FROM documents)
        GROUP BY source, word
    )
"""

ORACLES: dict[str, str] = {
    "bpe_corpus_token_counts": f"""
        WITH {_WORDS_CTE}, {_round_ctes(BPE_ROUNDS)}, {_SEGMAP_CTE}
        SELECT source,
               CAST(sum(c) AS BIGINT) AS word_tokens,
               CAST(count(*) AS BIGINT) AS word_types,
               CAST(sum(CASE WHEN s.n_pieces IS NOT NULL
                             THEN c * s.n_pieces ELSE 0 END) AS BIGINT)
                   AS subword_tokens,
               CAST(sum(CASE WHEN s.n_pieces IS NULL THEN c ELSE 0 END)
                    AS BIGINT) AS unseg_tokens,
               CASE WHEN sum(c) - sum(CASE WHEN s.n_pieces IS NULL
                                           THEN c ELSE 0 END) > 0
                    THEN round(
                        CAST(sum(CASE WHEN s.n_pieces IS NOT NULL
                                      THEN c * s.n_pieces ELSE 0 END)
                             AS DOUBLE)
                        / CAST(sum(c) - sum(CASE WHEN s.n_pieces IS NULL
                                                 THEN c ELSE 0 END)
                               AS DOUBLE), 6)
                    END AS pieces_per_word_r
        FROM swcen LEFT JOIN segmap s USING (word)
        GROUP BY source
    """,
    "bpe_corpus_compression": f"""
        WITH {_WORDS_CTE}, {_round_ctes(BPE_ROUNDS)}, {_SEGMAP_CTE}
        SELECT CAST(sum(c) AS BIGINT) AS seg_word_tokens,
               CAST(sum(c * s.n_pieces) AS BIGINT) AS subword_tokens,
               CAST(sum(c * s.n_chars) AS BIGINT) AS seg_chars,
               round(CAST(sum(c * s.n_chars) AS DOUBLE)
                     / CAST(sum(c * s.n_pieces) AS DOUBLE), 6)
                   AS chars_per_piece_r,
               round(CAST(sum(c * s.n_pieces) AS DOUBLE)
                     / CAST(sum(c) AS DOUBLE), 6) AS pieces_per_word_r
        FROM swcen JOIN segmap s USING (word)
    """,
}
