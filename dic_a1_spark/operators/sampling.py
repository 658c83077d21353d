"""Deterministic sampling and leakage-safe split assignment — the
reproducibility layer of a training-data pipeline.

Random sampling (`rand()`, reservoir draws) is the wrong device at
100 TB: retries, speculative tasks, and repartitioning all re-roll the
dice, so two runs of "the same" pipeline train on different data. Every
operator here is a pure function of stable row identity (md5 over
doc_id / group key), the same rule `curation.doc_split_assign` follows:
append new documents and no existing decision moves.

Leakage-safe splits extend that rule to NEAR-DUPLICATE GROUPS: a naive
per-document hash split can place two copies of the same document in
train and test (benchmark leakage). Here every member of a duplicate
group inherits the split of the group REPRESENTATIVE, so a group can
never straddle a boundary. The group key is the order-insensitive
tokenset hash shared with `dedup.dedup_tokenset_groups` (driver-
certified r4) — at sf0.01 the naive split leaks 5 of 21 multi-member
groups, so both branches of the audit are populated (Q11-vacuity rule).

Scale shape:
  - Group census + member join are ONE shuffle each, both keyed on the
    tokenset hash — the join is co-partitioned with the census, and a
    hot group collapses to one census row before joining (no skew
    amplification). The split itself is then a pure map.
  - Per-group top-K sampling is a rank window keyed by `source`;
    Spark's WindowGroupLimit pushes the `rank <= K` filter into the
    shuffle (per-partition partial top-K before the exchange), so the
    shuffle carries at most K rows per (source, map partition), not the
    corpus.
  - Bernoulli sharding is map-only + one partial-agg census.

Reference scope: the reference engine (mrjob chi-square pipeline,
src/wordCountJob.py) has no sampling/split surface; this module is part
of the training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import (
    duckdb_tokens_sql,
    duckdb_tokenset_md5_sql,
)
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.operators.curation import hash_split_col, hash_split_sql
from dic_a1_spark.operators.dedup import tokenset_hash
from dic_a1_spark.sources.readers import load_table

# Per-source deterministic sample size.
SAMPLE_K = 5
# Bernoulli keep threshold on the first 8 md5 hex chars: "40000000" /
# 2^32 = 25% nominal rate.
BERNOULLI_BELOW = "40000000"
# Output shards for the write-path plan.
N_SHARDS = 16


def _split_of(col):
    """The shared hash-split rule — curation.hash_split_col itself, not
    a re-derivation (reviewer-flagged drift hazard)."""
    return hash_split_col(col)


def _grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, group_rep): every document with its tokenset-group
    representative (min doc_id), keyed by dedup.tokenset_hash — the
    SAME construction as dedup_tokenset_groups, imported not re-derived.
    Census + co-partitioned join, one shuffle key."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select("doc_id", tokenset_hash(F.col("text")).alias("k"))
    reps = keyed.groupBy("k").agg(F.min("doc_id").alias("group_rep"))
    return keyed.join(reps, "k").select("doc_id", "group_rep")


def split_leakage_safe_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document split table: the naive per-doc hash split next to the
    leakage-safe group-representative split. `moved` marks documents the
    safe rule relocated — the train/test-leaking copies."""
    g = _grouped(spark, sf_dir)
    return g.select(
        "doc_id",
        "group_rep",
        _split_of(F.col("doc_id")).alias("split_naive"),
        _split_of(F.col("group_rep")).alias("split_safe"),
        (
            _split_of(F.col("doc_id")) != _split_of(F.col("group_rep"))
        ).alias("moved"),
    )


def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row certification: duplicate groups straddling a split under
    the naive rule (leaky_naive > 0 at sf0.01) and under the safe rule
    (structurally 0 — asserted by measurement, not by construction)."""
    a = split_leakage_safe_assign(spark, sf_dir)
    per_group = a.groupBy("group_rep").agg(
        F.count("*").alias("n"),
        F.countDistinct("split_naive").alias("ns_naive"),
        F.countDistinct("split_safe").alias("ns_safe"),
    )
    return per_group.agg(
        F.count("*").alias("total_groups"),
        F.sum((F.col("n") > 1).cast("long")).alias("multi_groups"),
        F.sum(((F.col("n") > 1) & (F.col("ns_naive") > 1)).cast("long")).alias(
            "leaky_naive"
        ),
        F.sum(((F.col("n") > 1) & (F.col("ns_safe") > 1)).cast("long")).alias(
            "leaky_safe"
        ),
    )


def sample_per_group_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic K-per-source sample: rank documents inside each
    source by md5(doc_id) — a stable uniform order — and keep the first
    SAMPLE_K. The `rank <= K` predicate sits directly on the rank window
    so WindowGroupLimit turns it into per-partition partial top-K."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id",
            "source",
            "lang",
            F.row_number().over(w).alias("sample_rank"),
        )
        .where(F.col("sample_rank") <= SAMPLE_K)
    )


def sample_bernoulli_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language census of a deterministic 25% Bernoulli shard
    (md5-prefix threshold): population, sampled count, achieved rate.
    The shard itself is map-only; this is its audit."""
    d = load_table(spark, sf_dir, "documents")
    hit = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < F.lit(
        BERNOULLI_BELOW
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(hit.cast("long")).alias("n_sampled"),
            F.round(
                F.sum(hit.cast("long")).cast("double")
                / F.count("*").cast("double"),
                4,
            ).alias("rate"),
        )
    )


def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-path shard plan: every document maps to one of N_SHARDS
    output shards by hash (`bigint(first 10 md5 hex chars) mod S`, the
    lsh.py md5-affine device — exact in both engines), and the plan row
    per shard reports docs, tokens, chars, and the load factor vs a
    perfectly uniform spread. This is the repartition-by-key the writer
    executes plus the imbalance audit that decides whether S needs
    raising; the shard map is stable under retries and appends (hash,
    not round-robin).

    Scale shape: one partial-agg shuffle keyed by shard (S groups); the
    load-factor window runs over the S-row plan frame."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_nonempty(F.col("text"))
    shard = F.expr(
        "cast(conv(substr(md5(cast(doc_id as string)), 1, 10), 16, 10)"
        f" as bigint) % {N_SHARDS}"
    ).cast("int")
    per_shard = (
        d.select(
            shard.alias("shard_id"),
            F.size(toks).cast("bigint").alias("n"),
            F.col("n_chars"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
    w_all = Window.partitionBy()
    return per_shard.select(
        "shard_id",
        "n_docs",
        "total_tokens",
        "total_chars",
        F.round(
            F.col("n_docs").cast("double")
            * float(N_SHARDS)
            / F.sum("n_docs").over(w_all).cast("double"),
            4,
        ).alias("load_factor"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "split_leakage_safe_assign": split_leakage_safe_assign,
    "split_leakage_audit": split_leakage_audit,
    "sample_per_group_hash": sample_per_group_hash,
    "sample_bernoulli_stats": sample_bernoulli_stats,
    "corpus_shard_plan": corpus_shard_plan,
}

_TOKS = duckdb_tokens_sql()
_TSMD5 = duckdb_tokenset_md5_sql()

# The oracle split CASE comes from the same single source as the
# Column rule (curation.hash_split_sql).

_GROUPED_CTE = f"""
    WITH keyed AS (
        SELECT doc_id,
               {_TSMD5} AS k
        FROM documents
    ),
    reps AS (SELECT k, min(doc_id) AS group_rep FROM keyed GROUP BY k),
    grouped AS (
        SELECT keyed.doc_id, reps.group_rep FROM keyed JOIN reps USING (k)
    ),
    assigned AS (
        SELECT doc_id, group_rep,
               {hash_split_sql("doc_id")} AS split_naive,
               {hash_split_sql("group_rep")} AS split_safe
        FROM grouped
    )
"""

ORACLES: dict[str, str] = {
    "split_leakage_safe_assign": _GROUPED_CTE
    + """
    SELECT doc_id, group_rep, split_naive, split_safe,
           (split_naive <> split_safe) AS moved
    FROM assigned
    """,
    "split_leakage_audit": _GROUPED_CTE
    + """
    , per_group AS (
        SELECT group_rep, count(*) AS n,
               count(DISTINCT split_naive) AS ns_naive,
               count(DISTINCT split_safe) AS ns_safe
        FROM assigned GROUP BY group_rep
    )
    SELECT CAST(count(*) AS BIGINT) AS total_groups,
           CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS multi_groups,
           CAST(sum(CASE WHEN n > 1 AND ns_naive > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS leaky_naive,
           CAST(sum(CASE WHEN n > 1 AND ns_safe > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS leaky_safe
    FROM per_group
    """,
    "sample_per_group_hash": f"""
    SELECT doc_id, source, lang, CAST(sample_rank AS INTEGER) AS sample_rank
    FROM (
        SELECT doc_id, source, lang,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS sample_rank
        FROM documents
    ) WHERE sample_rank <= {SAMPLE_K}
    """,
    "corpus_shard_plan": f"""
    WITH per_shard AS (
        SELECT CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10))
                         AS BIGINT) % {N_SHARDS} AS INTEGER) AS shard_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len({_TOKS})) AS BIGINT) AS total_tokens,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    )
    SELECT shard_id, n_docs, total_tokens, total_chars,
           round(CAST(n_docs AS DOUBLE) * {float(N_SHARDS)!r}
                 / CAST(sum(n_docs) OVER () AS DOUBLE), 4) AS load_factor
    FROM per_shard
    """,
    "sample_bernoulli_stats": f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                              < '{BERNOULLI_BELOW}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sampled,
           round(
               CAST(sum(CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                                  < '{BERNOULLI_BELOW}' THEN 1 ELSE 0 END)
                    AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS rate
    FROM documents GROUP BY lang
    """,
}
