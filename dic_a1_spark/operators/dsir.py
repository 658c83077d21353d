"""DSIR-style data selection over the `documents` table — importance
weighting of a raw corpus toward a target domain via hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling", public arXiv 2302.03169). The target sample is
the `source = DSIR_TARGET_SOURCE` slice; every other document is the raw
pool being scored.

Method, re-expressed in exact integer arithmetic:

  * features: unigrams + token bigrams, hashed into DSIR_BUCKETS
    buckets (pmod(xxhash64(feature), B) — the paper's hashed n-gram
    generative model).
  * bucket distributions: add-one smoothed counts t1_b = t_b + 1 under
    the target, c1_b = c_b + 1 under the raw pool, with normalizers
    T1 = T + B and C1 = C + B.
  * per-bucket weight, fixed-point: w(b) = (t1_b * C1 * SCALE) div
    (c1_b * T1) - SCALE — i.e. SCALE * (ratio - 1), the first-order
    expansion of SCALE * ln(ratio). The paper's log-likelihood ratio
    and this linearization agree to O((r-1)^2) and induce the same
    ranking in the r-near-1 regime; crucially the linear form is an
    EXACT BIGINT in both engines, so per-document sums are
    aggregation-order-proof (the lexical.py integer-idf argument —
    summing ln-ratio doubles would make the value hash depend on
    partial-aggregation order).
  * per-document importance score: sum of w(bucket) over the document's
    feature OCCURRENCES (the bag model), length-normalized for ranking.

Overflow bound: the weight divide runs in TWO Horner levels of
sqrt(SCALE) each (weight_sql — exact identity, same result), so the
largest intermediate is t1_b * C1 * 1000 and the envelope is
T1 * C1 < 9.2e15 per graded slice (sf0.1: ~1.6e10; the factor-50
amplified bench: ~4e13 — both far inside); a 100 TB run shards the
estimator (per-shard bucket census, merged by plain addition before the
weight division), same as the surprisal bound note in corpusops.py.

Scale shape:
  1. Feature extraction is map-only (one concat of the token array with
     its bigram transform, one explode).
  2. The bucket census is ONE exchange whose key space is the CONSTANT
     B = DSIR_BUCKETS — map-side combine collapses each partition to
     <= B rows before the shuffle.
  3. The weight table is <= B rows: broadcast is pinned (justified —
     constant-bounded, the decontam_bloom bits-frame rule), so scoring
     is a map-side join + one exchange on doc_id.
  4. Selection is a global top-K (TakeOrdered — K rows per partition
     flow to the driver-side heap, never the corpus).

Oracle posture: the DuckDB twins recompute xxhash64 with the generated
XXH64 SQL over DISTINCT feature strings (substr.py pattern; the feature
vocabulary is square-root-small relative to occurrence rows) and run the
identical integer arithmetic — every query carries the full value-hash
gate.

Reference scope: the reference engine (mrjob WordCount/ChiSquared) has
no data-selection surface; this module is part of the
training-data-pipeline extension mandated by the build brief. The
chi-squared job solves the same shaped problem (category-discriminative
token statistics) with a per-category count model; DSIR is its
importance-sampling counterpart over hashed feature space.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# The target-domain sample: one of the corpus's 20 sources.
DSIR_TARGET_SOURCE = "src0"
# Hashed feature buckets (the paper uses 10^4; 4096 keeps the weight
# table broadcast-trivial while leaving buckets multiply-occupied at
# driver-corpus scale).
DSIR_BUCKETS = 4096
# Fixed-point scale for the ratio weights, applied in TWO Horner levels
# of sqrt(SCALE) each (see weight_sql) so the largest intermediate is
# t1*C1*1000, not t1*C1*10^6 — the overflow envelope is T1*C1*1000 <
# 2^63, i.e. T1*C1 < 9.2e15 per graded slice (the factor-50 amplified
# bench sits at ~4e13, 230x inside it).
DSIR_SCALE = 1_000_000
_SCALE_L = 1_000  # per-level factor; DSIR_SCALE == _SCALE_L ** 2
assert _SCALE_L * _SCALE_L == DSIR_SCALE
# Selection size of the resampled subset.
DSIR_SELECT_K = 100


def weight_sql(div: str, t1: str = "(t + 1)", c1: str = "(c + 1)") -> str:
    """THE fixed-point weight formula — single source of truth for the
    Spark expression (div='div'), the DuckDB oracles (div='//'), and
    via weight_py the streaming scorer's default weight.

    Mathematically identical to (t1*c1_tot*SCALE) div (c1*t1_tot) -
    SCALE by the exact Horner identity
        a*L^2 div b == (a*L div b)*L + ((a*L mod b)*L div b),
    but the largest intermediate is a*L = t1*c1_tot*1000 instead of
    a*L^2 (Spark's non-ANSI BIGINT multiply wraps silently on overflow,
    so the envelope is load-bearing, not cosmetic)."""
    a = f"({t1} * c1_tot)"
    b = f"({c1} * t1_tot)"
    return (
        f"(({a} * {_SCALE_L} {div} {b}) * {_SCALE_L}"
        f" + ({a} * {_SCALE_L} % {b}) * {_SCALE_L} {div} {b}"
        f" - {DSIR_SCALE})"
    )


def weight_py(t1: int, c1: int, t1_tot: int, c1_tot: int) -> int:
    """Python twin of weight_sql (exact on ints of any size)."""
    return t1 * c1_tot * DSIR_SCALE // (c1 * t1_tot) - DSIR_SCALE


def feats_array_expr():
    """The unigram+bigram feature array over a `toks` column — the single
    source of truth for the feature definition (the batch census explodes
    it; the streaming scorer folds over it in place).

    IF-guard: Spark's sequence(2, 1) DESCENDS for single-token docs,
    which would fabricate a null bigram; DuckDB's range(2, 2) is empty.
    """
    return F.expr(
        "concat(toks, IF(size(toks) >= 2,"
        " transform(sequence(2, size(toks)),"
        " i -> concat(toks[i-2], ' ', toks[i-1])), array()))"
    )


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, is_target, b): one row per unigram+bigram occurrence,
    hashed to its bucket. Map-only."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        (F.col("source") == DSIR_TARGET_SOURCE).alias("is_target"),
        tokens_nonempty(F.col("text")).alias("toks"),
    ).where(F.size("toks") >= 1)
    feats = feats_array_expr()
    return (
        toks.select("doc_id", "is_target", feats.alias("fs"))
        .select("doc_id", "is_target", F.explode_outer("fs").alias("feat"))
        .select(
            "doc_id",
            "is_target",
            F.pmod(F.xxhash64("feat"), F.lit(DSIR_BUCKETS)).alias("b"),
        )
    )


def _bucket_weights(feats: DataFrame) -> DataFrame:
    """(b, w): the fixed-point importance weight per OBSERVED bucket.
    Unobserved buckets never join any document, so they need no row.
    <= DSIR_BUCKETS rows by construction."""
    census = feats.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("c"),
    )
    tot = census.agg(
        (F.sum("t") + DSIR_BUCKETS).alias("t1_tot"),
        (F.sum("c") + DSIR_BUCKETS).alias("c1_tot"),
    )
    return census.crossJoin(F.broadcast(tot)).select(
        "b", F.expr(weight_sql("div")).alias("w")
    )


def _doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _features(spark, sf_dir)
    wts = _bucket_weights(feats)
    return (
        feats.join(F.broadcast(wts), "b")
        .groupBy("doc_id", "is_target")
        .agg(F.count("*").alias("n_feats"), F.sum("w").alias("score_fp"))
    )


def dsir_logratio_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document importance score: (doc_id, is_target, n_feats,
    score_fp, avg_fp). score_fp is the exact fixed-point sum of
    SCALE*(ratio-1) bucket weights over the document's feature
    occurrences; avg_fp length-normalizes it (the ranking statistic).
    Target docs are scored too (they audit the estimator: their mean
    must exceed the raw pool's)."""
    return _doc_scores(spark, sf_dir).select(
        "doc_id",
        F.col("is_target").cast("int").alias("is_target"),
        "n_feats",
        "score_fp",
        F.round(
            F.col("score_fp").cast("double") / F.col("n_feats").cast("double"),
            4,
        ).alias("avg_fp"),
    )


def dsir_selected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampled subset: top DSIR_SELECT_K raw-pool documents by
    length-normalized importance (deterministic tiebreak on doc_id —
    the paper adds Gumbel noise for a soft sample; the deterministic
    top-K is its temperature-zero limit)."""
    scored = _doc_scores(spark, sf_dir).where(~F.col("is_target"))
    avg = F.round(
        F.col("score_fp").cast("double") / F.col("n_feats").cast("double"), 4
    )
    # Top-K FIRST (TakeOrdered — K rows per partition to a driver heap),
    # THEN the rank window over the K survivors only: the unpartitioned
    # row_number window never sees more than DSIR_SELECT_K rows.
    topk = (
        scored.select("doc_id", "n_feats", "score_fp", avg.alias("avg_fp"))
        .orderBy(F.desc("avg_fp"), F.asc("doc_id"))
        .limit(DSIR_SELECT_K)
    )
    return topk.select(
        F.row_number()
        .over(Window.orderBy(F.desc("avg_fp"), F.asc("doc_id")))
        .alias("rank"),
        "doc_id",
        "n_feats",
        "score_fp",
        "avg_fp",
    )


def dsir_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row estimator census: observed buckets, target / raw feature
    totals, the fixed-point first-order KL proxy sum_b t1_b * w(b) (how
    separated the two distributions are — near 0 means DSIR has nothing
    to select on), and the weight extremes."""
    feats = _features(spark, sf_dir)
    census = feats.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("c"),
    )
    tot = census.agg(
        (F.sum("t") + DSIR_BUCKETS).alias("t1_tot"),
        (F.sum("c") + DSIR_BUCKETS).alias("c1_tot"),
        F.sum("t").alias("n_target_feats"),
        F.sum("c").alias("n_raw_feats"),
        F.count("*").alias("n_buckets"),
    )
    w = F.expr(weight_sql("div"))
    return (
        census.crossJoin(F.broadcast(tot))
        .select(
            "n_buckets",
            "n_target_feats",
            "n_raw_feats",
            ((F.col("t") + 1) * w).alias("klterm"),
            w.alias("w"),
        )
        .groupBy("n_buckets", "n_target_feats", "n_raw_feats")
        .agg(
            F.sum("klterm").alias("kl_fp"),
            F.min("w").alias("min_w_fp"),
            F.max("w").alias("max_w_fp"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dsir_logratio_weights": dsir_logratio_weights,
    "dsir_selected": dsir_selected,
    "dsir_bucket_stats": dsir_bucket_stats,
}


def _feats_cte() -> str:
    """Shared oracle prefix: (doc_id, is_target, b) per feature
    occurrence, the generated XXH64 computed once per DISTINCT feature
    string."""
    from dic_a1_spark.functions.xxh64_sql import xxh64_str_sql

    toks = duckdb_tokens_sql()
    bkt = DSIR_BUCKETS
    return f"""
        WITH toks AS (
            SELECT doc_id, source = '{DSIR_TARGET_SOURCE}' AS is_target,
                   {toks} AS a
            FROM documents
        ),
        fo AS MATERIALIZED (
            SELECT doc_id, is_target,
                   unnest(list_concat(a,
                       list_transform(range(2, len(a) + 1),
                                      i -> a[i-1] || ' ' || a[i]))) AS feat
            FROM toks WHERE len(a) >= 1
        ),
        dfh AS MATERIALIZED (
            SELECT feat,
                   CAST((({xxh64_str_sql('feat')}) % {bkt} + {bkt}) % {bkt}
                        AS BIGINT) AS b
            FROM (SELECT DISTINCT feat FROM fo)
        ),
        feats AS MATERIALIZED (
            SELECT f.doc_id, f.is_target, d.b
            FROM fo f JOIN dfh d USING (feat)
        )
    """


def _census_cte() -> str:
    b = DSIR_BUCKETS
    return f""",
        census AS (
            SELECT b,
                   CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END)
                        AS BIGINT) AS t,
                   CAST(sum(CASE WHEN is_target THEN 0 ELSE 1 END)
                        AS BIGINT) AS c
            FROM feats GROUP BY b
        ),
        tot AS (
            SELECT CAST(sum(t) + {b} AS BIGINT) AS t1_tot,
                   CAST(sum(c) + {b} AS BIGINT) AS c1_tot,
                   CAST(sum(t) AS BIGINT) AS n_target_feats,
                   CAST(sum(c) AS BIGINT) AS n_raw_feats,
                   CAST(count(*) AS BIGINT) AS n_buckets
            FROM census
        ),
        wts AS (
            SELECT b,
                   CAST({weight_sql('//')} AS BIGINT) AS w,
                   t
            FROM census, tot
        )"""


def _scores_cte() -> str:
    return """,
        scores AS (
            SELECT f.doc_id, f.is_target,
                   CAST(count(*) AS BIGINT) AS n_feats,
                   CAST(sum(w.w) AS BIGINT) AS score_fp
            FROM feats f JOIN wts w USING (b)
            GROUP BY f.doc_id, f.is_target
        )"""


def _weights_oracle() -> str:
    return (
        _feats_cte()
        + _census_cte()
        + _scores_cte()
        + """
        SELECT doc_id, CAST(is_target AS INTEGER) AS is_target, n_feats,
               score_fp,
               round(CAST(score_fp AS DOUBLE) / CAST(n_feats AS DOUBLE), 4)
                   AS avg_fp
        FROM scores
    """
    )


def _selected_oracle() -> str:
    return (
        _feats_cte()
        + _census_cte()
        + _scores_cte()
        + f""",
        ranked AS (
            SELECT doc_id, n_feats, score_fp,
                   round(CAST(score_fp AS DOUBLE)
                         / CAST(n_feats AS DOUBLE), 4) AS avg_fp
            FROM scores WHERE NOT is_target
        )
        SELECT CAST(row_number() OVER (ORDER BY avg_fp DESC, doc_id ASC)
                    AS INTEGER) AS rank,
               doc_id, n_feats, score_fp, avg_fp
        FROM ranked
        ORDER BY avg_fp DESC, doc_id ASC
        LIMIT {DSIR_SELECT_K}
    """
    )


def _stats_oracle() -> str:
    return (
        _feats_cte()
        + _census_cte()
        + """
        -- GROUP BY mirrors the Spark groupBy exactly: on an EMPTY
        -- census the join is empty and BOTH engines emit 0 rows (a
        -- bare scalar aggregate would fabricate a 1-row NULL panel
        -- DuckDB-side only — the r10 empty-corpus probe fork).
        SELECT CAST(t2.n_buckets AS BIGINT) AS n_buckets,
               CAST(t2.n_target_feats AS BIGINT) AS n_target_feats,
               CAST(t2.n_raw_feats AS BIGINT) AS n_raw_feats,
               CAST(sum((w.t + 1) * w.w) AS BIGINT) AS kl_fp,
               CAST(min(w.w) AS BIGINT) AS min_w_fp,
               CAST(max(w.w) AS BIGINT) AS max_w_fp
        FROM wts w, tot t2
        GROUP BY t2.n_buckets, t2.n_target_feats, t2.n_raw_feats
    """
    )


ORACLES: dict[str, str] = {
    "dsir_logratio_weights": _weights_oracle(),
    "dsir_selected": _selected_oracle(),
    "dsir_bucket_stats": _stats_oracle(),
}
