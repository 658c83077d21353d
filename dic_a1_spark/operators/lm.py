"""Corpus language-model statistics over the `documents` table — the
perplexity-shaped quality signals a CCNet-style pipeline buckets and
filters on (Wenzek et al. 2020 split Common Crawl into head/middle/tail
by document perplexity under a reference LM; the engine-native analog
scores documents under the corpus's OWN n-gram statistics, exactly as
corpusops.text_unigram_surprisal does for unigrams).

Three operators:

  * `text_bigram_surprisal` — per-document average bigram surprisal in
    integer bits, the order-2 twin of text_unigram_surprisal: bits(g) =
    bit_length(NB div c(g)) with NB the corpus bigram total. Exact
    bigints until the final rounded average (same integer-division
    exactness argument, corpusops.py).
  * `ppl_decile_census` — documents ranked by unigram avg_bits and cut
    into NTILE(10) deciles, reported as one row per decile (n_docs,
    avg-bits range, token mass). The head/middle/tail report
    generalized to deciles.
  * `lm_crossentropy_by_source` — per-source mean bits: which sources
    are boilerplate (low) vs rare-token soup (high) under the corpus
    unigram model.

Scale shape — the decile census WITHOUT a corpus-wide single-partition
sort: NTILE over (avg_bits, doc_id) is recomputed in closed form from
  rank = (#docs with smaller avg_bits) + (#equal-valued docs with
          smaller doc_id) + 1
where the first term is a running sum over the VALUE census (avg_bits
is rounded to 4 decimals, so the census is value-space-bounded — a few
thousand rows regardless of corpus size; the only unpartitioned window
in the plan runs over it, never over documents) and the second is a
row_number inside each avg_bits partition. The closed form
  q = N div 10, r = N mod 10
  decile(rank) = (rank + q) div (q + 1)                 if rank <= r*(q+1)
                 r + (rank - r*(q+1) + q - 1) div q      otherwise
reproduces SQL NTILE's first-r-buckets-one-larger split exactly; the
DuckDB oracle uses the genuine NTILE window function, so a hash match
certifies the closed form. (Corpora under 10 documents make q = 0 and
are rejected by the same guard both engines: no decile row is emitted.)

Reference scope: the reference engine (mrjob WordCount/ChiSquared) has
no LM-statistics surface; this module is part of the training-data-
pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.operators.corpusops import (
    ORACLES as _CORPUS_ORACLES,
    surprisal_over,
    text_unigram_surprisal,
)
from dic_a1_spark.sources.readers import load_table

PPL_BUCKETS = 10


def text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, total_bits, avg_bits): average corpus-bigram
    surprisal per document — the order-2 perplexity proxy. Documents
    with fewer than 2 tokens have no bigram and no row."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", tokens_nonempty(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 2)
    tok = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(toks)),"
                " i -> concat(toks[i-2], ' ', toks[i-1]))"
            )
        ).alias("gram"),
    )
    # The shared integer bit-length surprisal pipeline (corpusops.py) —
    # one definition for the unigram operator and this order-2 twin.
    return surprisal_over(tok, "n_bigrams")


def ppl_decile_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(decile, n_docs, min_avg_bits, max_avg_bits, n_tokens): the corpus
    cut into NTILE(10) perplexity deciles over (unigram avg_bits,
    doc_id) — decile 1 is the most-predictable (boilerplate-leaning)
    tenth, decile 10 the rare-token tail. See the module docstring for
    the closed-form NTILE that avoids a corpus-wide global sort."""
    uni = text_unigram_surprisal(spark, sf_dir)
    vc = uni.groupBy("avg_bits").agg(F.count("*").alias("n_v"))
    # The ONLY unpartitioned window: runs over the value census
    # (value-space-bounded — avg_bits has 4 decimals), not documents.
    w_val = Window.orderBy("avg_bits").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # Both the below-me running sum AND the grand total N come out of
    # the ONE window pass over the value census (same ordering → a
    # single Window operator): no third scan of the per-doc frame, no
    # totals crossJoin.
    w_all = Window.orderBy("avg_bits").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        "avg_bits",
        F.coalesce(F.sum("n_v").over(w_val), F.lit(0)).alias("lt"),
        F.sum("n_v").over(w_all).alias("n"),
    )
    w_in = Window.partitionBy("avg_bits").orderBy("doc_id")
    ranked = uni.join(cum, "avg_bits").select(
        "doc_id",
        "n_tokens",
        "avg_bits",
        (F.col("lt") + F.row_number().over(w_in)).alias("rank"),
        "n",
    )
    decile = F.expr(
        f"""CASE WHEN n div {PPL_BUCKETS} = 0 THEN NULL
            WHEN rank <= (n % {PPL_BUCKETS}) * (n div {PPL_BUCKETS} + 1)
            THEN (rank + n div {PPL_BUCKETS}) div (n div {PPL_BUCKETS} + 1)
            ELSE n % {PPL_BUCKETS}
                 + (rank - (n % {PPL_BUCKETS}) * (n div {PPL_BUCKETS} + 1)
                    + n div {PPL_BUCKETS} - 1) div (n div {PPL_BUCKETS})
            END"""
    ).cast("int")
    return (
        ranked.select(decile.alias("decile"), "n_tokens", "avg_bits")
        .where(F.col("decile").isNotNull())
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("avg_bits").alias("min_avg_bits"),
            F.max("avg_bits").alias("max_avg_bits"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


def lm_crossentropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_tokens, total_bits, avg_bits): mean unigram
    surprisal per source — the per-domain cross-entropy row of a corpus
    datacard. A rollup of the certified per-doc frame; one extra
    exchange on source."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    uni = text_unigram_surprisal(spark, sf_dir)
    return (
        uni.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("total_bits").alias("total_bits"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "total_bits",
            F.round(
                F.col("total_bits").cast("double")
                / F.col("n_tokens").cast("double"),
                4,
            ).alias("avg_bits"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_bigram_surprisal": text_bigram_surprisal,
    "ppl_decile_census": ppl_decile_census,
    "lm_crossentropy_by_source": lm_crossentropy_by_source,
}

# The certified unigram per-doc frame, reused as a subquery (single
# source of truth — the evalops composition pattern).
_UNI_SQL = _CORPUS_ORACLES["text_unigram_surprisal"]


def _bigram_oracle() -> str:
    toks = duckdb_tokens_sql()
    return f"""
        WITH toks AS (
            SELECT doc_id, {toks} AS a FROM documents
        ),
        tok AS (
            SELECT doc_id,
                   unnest(list_transform(range(2, len(a) + 1),
                          i -> a[i-1] || ' ' || a[i])) AS gram
            FROM toks WHERE len(a) >= 2
        ),
        counts AS (SELECT gram, count(*) AS c FROM tok GROUP BY gram),
        tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM counts),
        bits AS (
            SELECT gram,
                   CAST(length(bin(
                       (SELECT n_total FROM tot) // c
                   )) AS BIGINT) AS bits
            FROM counts
        )
        SELECT t.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(b.bits) AS BIGINT) AS total_bits,
               round(CAST(sum(b.bits) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
                   AS avg_bits
        FROM tok t JOIN bits b USING (gram)
        GROUP BY t.doc_id
    """


def _decile_oracle() -> str:
    """The genuine NTILE window function — a hash match against the
    Spark closed form certifies the rank arithmetic."""
    return f"""
        WITH uni AS ({_UNI_SQL}),
        ranked AS (
            SELECT doc_id, n_tokens, avg_bits,
                   ntile({PPL_BUCKETS})
                       OVER (ORDER BY avg_bits, doc_id) AS decile
            FROM uni
        )
        SELECT CAST(decile AS INTEGER) AS decile,
               CAST(count(*) AS BIGINT) AS n_docs,
               min(avg_bits) AS min_avg_bits,
               max(avg_bits) AS max_avg_bits,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM ranked
        WHERE (SELECT count(*) FROM uni) >= {PPL_BUCKETS}
        GROUP BY decile
    """


def _by_source_oracle() -> str:
    return f"""
        WITH uni AS ({_UNI_SQL})
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(u.n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(u.total_bits) AS BIGINT) AS total_bits,
               round(CAST(sum(u.total_bits) AS DOUBLE)
                     / CAST(sum(u.n_tokens) AS DOUBLE), 4) AS avg_bits
        FROM uni u JOIN documents d USING (doc_id)
        GROUP BY d.source
    """


ORACLES: dict[str, str] = {
    "text_bigram_surprisal": _bigram_oracle(),
    "ppl_decile_census": _decile_oracle(),
    "lm_crossentropy_by_source": _by_source_oracle(),
}
