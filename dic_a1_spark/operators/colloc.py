"""Windowed PMI collocations over the `documents` table — the classic
corpus-linguistics collocation extraction (Church & Hanks 1990,
"Word Association Norms, Mutual Information, and Lexicography"): word
pairs co-occurring within a ±COLLOC_W token window far more often than
their unigram frequencies predict. A training-data pipeline runs this to
mine multiword expressions for tokenizer vocabularies and to audit
template artifacts (a synthetic corpus's generator leaks here first —
templated word pairs light up with high PMI).

PMI is reported in the repo's integer staircase form (the DSIR/lexical
trick): with c_xy the pair count, c_x/c_y unigram counts, Nw total
tokens and Np total window pairs,

  pmi_bits = bits((c_xy*Nw*Nw) div (c_x*c_y*Np))
           - bits((c_x*c_y*Np) div (c_xy*Nw*Nw)),   bits(v) = len(bin(v))

an exact BIGINT ~ floor(log2) staircase of the true PMI ratio — every
sum/product/division is integer, so cross-engine parity is by
construction (no ln() doubles whose aggregation order could differ).
Overflow bound: c_xy*Nw*Nw < 2^63 ⇒ Nw < ~2e6 per graded slice; a
100 TB run shards the censuses (counts merge by addition) exactly like
the corpusops surprisal note.

Scale shape:
  1. Pair generation is MAP-ONLY: nested transform over the token array
     emits each in-window (i < j <= i+W) pair in one projection —
     output is <= W rows per token, never a self-join of an exploded
     position table (which would shuffle the corpus on doc_id).
  2. Pair census and unigram census are one hash aggregation each
     (vocabulary-bounded results; map-side combine does the heavy
     lifting — a viral pair costs one census row).
  3. PMI scoring joins the pair census against the unigram census
     twice on vocabulary-sized frames — NO broadcast hint (vocabulary
     grows unboundedly; AQE decides — the lexical.py rule); totals are
     1-row broadcasts.
  4. Top-K is TakeOrdered.

Reference scope: the reference engine (mrjob WordCount/ChiSquared) has
no collocation surface, but chisq.py solves the adjacent problem
(category-discriminative unigrams); PMI is its word-pair counterpart.
Part of the training-data-pipeline extension mandated by the build
brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Co-occurrence window: pairs (i, j) with i < j <= i + COLLOC_W.
COLLOC_W = 3
# Pairs below this count are noise — dropped before PMI scoring.
COLLOC_MIN_COUNT = 5
# Report size.
COLLOC_TOP_K = 25


def _pair_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2): one row per in-window position pair, with the
    unordered pair canonicalized (w1 <= w2). Map-only — see module
    docstring."""
    w = COLLOC_W
    toks = docs.select(
        "doc_id", tokens_nonempty(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 2)
    # No descend-guard needed: i ranges over 1..n-1, so the inner
    # sequence's start i+1 never exceeds its end least(i+W, n).
    pairs = F.expr(
        f"flatten(transform(sequence(1, size(toks) - 1),"
        f" i -> transform(sequence(i + 1, least(i + {w},"
        f" CAST(size(toks) AS INT))),"
        f" j -> struct(least(toks[i-1], toks[j-1]) AS w1,"
        f" greatest(toks[i-1], toks[j-1]) AS w2))))"
    )
    return (
        toks.select("doc_id", pairs.alias("ps"))
        .select("doc_id", F.explode_outer("ps").alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def colloc_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, n_pairs, n_docs): the windowed co-occurrence census over
    unordered word pairs, COLLOC_MIN_COUNT floor. n_docs uses the
    min!=max-free exact count (pairs are vocabulary-bounded after the
    census, so a distinct agg over census-surviving keys is cheap)."""
    pr = _pair_rows(load_table(spark, sf_dir, "documents"))
    return (
        pr.groupBy("w1", "w2")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_pairs") >= COLLOC_MIN_COUNT)
    )


def colloc_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-COLLOC_TOP_K pairs: (w1, w2, n_pairs, pmi_bits, lift_fp).
    lift_fp is the association ratio itself in fixed point
    ((c_xy*Nw*Nw*100) div (c_x*c_y*Np) — 2 decimal digits of lift,
    exact BIGINT; tightens the coarse bits staircase for ranking;
    overflow bound c_xy*Nw^2*100 < 2^63, the module-docstring shard
    rule). Ordered by (lift_fp, n_pairs, pair) — a total order."""
    d = load_table(spark, sf_dir, "documents")
    pr = _pair_rows(d)
    pair_cen = (
        pr.groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pairs"))
        .where(F.col("n_pairs") >= COLLOC_MIN_COUNT)
    )
    tok = d.select(
        "doc_id", F.explode(tokens_nonempty(F.col("text"))).alias("word")
    )
    uni = tok.groupBy("word").agg(F.count("*").alias("c"))
    totals = uni.agg(F.sum("c").alias("nw")).crossJoin(
        pr.agg(F.count("*").alias("np"))
    )
    scored = (
        pair_cen.join(uni.withColumnRenamed("word", "w1"), "w1")
        .withColumnRenamed("c", "c1")
        .join(uni.withColumnRenamed("word", "w2"), "w2")
        .withColumnRenamed("c", "c2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pairs",
            (
                F.length(F.bin(F.expr("n_pairs * nw * nw div (c1 * c2 * np)")))
                - F.length(F.bin(F.expr("c1 * c2 * np div (n_pairs * nw * nw)")))
            )
            .cast("long")
            .alias("pmi_bits"),
            F.expr("n_pairs * nw * nw * 100L div (c1 * c2 * np)").alias(
                "lift_fp"
            ),
        )
    )
    return scored.orderBy(
        F.desc("lift_fp"), F.desc("n_pairs"), F.asc("w1"), F.asc("w2")
    ).limit(COLLOC_TOP_K)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "colloc_pair_census": colloc_pair_census,
    "colloc_pmi_topk": colloc_pmi_topk,
}


def _pairs_cte() -> str:
    toks = duckdb_tokens_sql()
    w = COLLOC_W
    # Window pairs via a W-offset equi-join on (doc_id, position), NOT a
    # correlated lateral unnest over a position table that carries the
    # whole token array per row: DuckDB materializes the lateral's input,
    # so the array-carrying form costs O(doc_tokens^2) MEMORY per
    # document — the r11 giant-doc corpus (a 40K-token document) drove it
    # past 60 GB. The offset join keeps one (doc_id, i, w) row per
    # position and probes a composite equi-key, linear in W x tokens.
    return f"""
        WITH toks AS (
            SELECT doc_id, a
            FROM (SELECT doc_id, {toks} AS a FROM documents)
            WHERE len(a) >= 2
        ),
        pos AS MATERIALIZED (
            SELECT doc_id, CAST(generate_subscripts(a, 1) AS BIGINT) AS i,
                   unnest(a) AS w
            FROM toks
        ),
        pr AS (
            SELECT p1.doc_id,
                   least(p1.w, p2.w) AS w1,
                   greatest(p1.w, p2.w) AS w2
            FROM pos p1
            JOIN (SELECT unnest(range(1, {w} + 1)) AS d) offs ON true
            JOIN pos p2
              ON p2.doc_id = p1.doc_id AND p2.i = p1.i + offs.d
        )
    """


def _census_oracle() -> str:
    return (
        _pairs_cte()
        + f"""
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM pr GROUP BY w1, w2
        HAVING count(*) >= {COLLOC_MIN_COUNT}
    """
    )


def _topk_oracle() -> str:
    toks = duckdb_tokens_sql()
    return (
        _pairs_cte()
        + f""",
        cen AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs
            FROM pr GROUP BY w1, w2 HAVING count(*) >= {COLLOC_MIN_COUNT}
        ),
        tokw AS (
            SELECT unnest({toks}) AS word FROM documents
        ),
        uni AS (SELECT word, CAST(count(*) AS BIGINT) AS c
                FROM tokw GROUP BY word),
        tot AS (
            SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS nw,
                   (SELECT CAST(count(*) AS BIGINT) FROM pr) AS np
        )
        SELECT c.w1, c.w2, c.n_pairs,
               CAST(length(bin(c.n_pairs * t.nw * t.nw
                               // (u1.c * u2.c * t.np)))
                    - length(bin(u1.c * u2.c * t.np
                                 // (c.n_pairs * t.nw * t.nw)))
                    AS BIGINT) AS pmi_bits,
               CAST(c.n_pairs * t.nw * t.nw * 100
                    // (u1.c * u2.c * t.np) AS BIGINT) AS lift_fp
        FROM cen c
        JOIN uni u1 ON u1.word = c.w1
        JOIN uni u2 ON u2.word = c.w2
        CROSS JOIN tot t
        ORDER BY lift_fp DESC, n_pairs DESC, w1 ASC, w2 ASC
        LIMIT {COLLOC_TOP_K}
    """
    )


ORACLES: dict[str, str] = {
    "colloc_pair_census": _census_oracle(),
    "colloc_pmi_topk": _topk_oracle(),
}
