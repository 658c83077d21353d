"""Mixture planning — deciding HOW MUCH of each domain/language a
training run consumes. The pipeline's dedup/scrub stages decide what is
admissible; these operators turn the admissible corpus census into an
integer token-allocation plan:

  - `domain_mix_allocation`: largest-remainder apportionment of a fixed
    token budget across sources, proportional to observed token counts.
    Pure BIGINT arithmetic end-to-end (quota = (budget*c) div C, leftover
    seats by remainder rank), so the plan is exactly reproducible and the
    allocations sum to the budget by construction.
  - `lang_temperature_mix`: UniMax/mC4-style temperature sampling —
    w_l = c_l^(1/T) flattens the language distribution (T>1 upsamples
    tails); reports sampling probability and effective epochs per
    language.
  - `mix_epoch_plan`: the temperature plan over sources with an epoch
    cap (a domain is never repeated more than MAX_EPOCHS times, the
    standard guard against memorizing small high-weight domains).

Scale shape: each operator is one partial-agg census (shuffle keyed by
source/lang, combiner collapses before the exchange) over a
corpus-sized scan, followed by arithmetic on a DOMAIN-sized frame
(thousands of rows at worst). The census-total joins are 1-row or
domain-sized crossJoins — broadcast by construction, never
corpus-proportional. Window totals over the domain frame stay on a
single post-agg partition.

Float parity note: the temperature path is double arithmetic; Spark and
DuckDB expressions are written with IDENTICAL association
(sqrt -> ratio -> multiply -> divide, in that order) so results are
bit-equal, per the repo's oracle-parity rules. The weight uses sqrt —
IEEE correctly-rounded in both engines — never pow, whose libm
implementations disagree by an ulp on ~0.08% of inputs (measured).
The one order-sensitive reduction, w_total = sum(w), is pinned by
folding a SORTED collected array in both engines (`_w_total`) so
neither Spark's partial-agg merge order nor DuckDB's scan order can
reassociate the double sum.

Reference scope: the reference engine (mrjob chi-square pipeline) has no
mixture surface; this module is part of the training-data-pipeline
extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Token budget being apportioned (plan-level constant; real runs pass
# their own). Small enough that budget * per-domain token counts stay
# far inside BIGINT at any census this repo sees.
TOKEN_BUDGET = 1_000_000
# Sampling temperature: w = c^(1/T). T=2 is a mild flatten (sqrt).
# PINNED at 2.0: the weight is computed with sqrt(), which is IEEE
# correctly-rounded and therefore bit-equal across engines — pow(x, y)
# is NOT (measured: Spark's Math.pow and DuckDB's C pow disagree by an
# ulp on ~0.08% of integer inputs at y=0.5). A different T needs a
# certificate-style oracle, not a value-hash one.
MIX_TEMPERATURE = 2.0


# Epoch ceiling for the capped plan.
MAX_EPOCHS = 4.0
# Curriculum head: quality-score buckets and the token budget the head
# must fit. 10K tokens vs the sf0.01 corpus' ~27K keeps all three bucket
# kinds (full / partial / excluded) populated — Q11-vacuity rule.
HEAD_BUCKETS = 100
HEAD_TOKEN_BUDGET = 10_000


def _temp_weight(c_tokens) -> "F.Column":
    """w = c^(1/T) with T pinned to 2 → sqrt (see MIX_TEMPERATURE)."""
    assert MIX_TEMPERATURE == 2.0
    return F.sqrt(c_tokens.cast("double"))


def _w_total(weighted: DataFrame) -> DataFrame:
    """1-row (w_total) frame with a PINNED summation order: the weights
    are collected into a sorted array and folded sequentially, so Spark's
    partial-agg merge order can never reassociate the double sum. The
    oracle mirrors with list_reduce(list_sort(list(w))) — Spark's fold
    seeds with 0.0 and 0.0 + x == x bit-exact for the positive weights,
    so both folds are the identical left-to-right sum. The domain frame
    is dimension-sized (languages/sources), so the collect is bounded."""
    return weighted.agg(
        F.aggregate(
            F.array_sort(F.collect_list("w")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("w_total")
    )


def _source_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, c_tokens): one partial-agg shuffle keyed by source."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("source", F.size(tokens_nonempty(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").cast("bigint").alias("c_tokens"))
    )


def domain_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of TOKEN_BUDGET across
    sources. All-BIGINT: quota = (budget*c) div C; the leftover
    budget - sum(quota) seats go to the largest remainders
    (budget*c - quota*C), ties broken by source name. sum(alloc_tokens)
    == TOKEN_BUDGET exactly."""
    c = _source_census(spark, sf_dir)
    tot = c.agg(F.sum("c_tokens").cast("bigint").alias("c_total"))
    q = (
        c.crossJoin(F.broadcast(tot))
        .withColumn(
            "quota",
            F.expr(f"CAST({TOKEN_BUDGET} AS BIGINT) * c_tokens div c_total"),
        )
        .withColumn(
            "remainder",
            F.expr(
                f"CAST({TOKEN_BUDGET} AS BIGINT) * c_tokens - quota * c_total"
            ),
        )
    )
    w_all = Window.partitionBy()
    ranked = q.withColumn(
        "leftover", F.lit(TOKEN_BUDGET) - F.sum("quota").over(w_all)
    ).withColumn(
        "rnk",
        F.row_number().over(
            # asc_nulls_last: Spark's bare asc puts a NULL source FIRST
            # where DuckDB's ASC default puts it LAST — a tie at the
            # leftover boundary then hands the extra token to different
            # sources (r9 NULL-corpus sweep). NULLS LAST in both.
            Window.partitionBy().orderBy(
                F.desc("remainder"), F.asc_nulls_last("source")
            )
        ),
    )
    return ranked.select(
        "source",
        "c_tokens",
        "quota",
        "remainder",
        (
            F.col("quota")
            + (F.col("rnk") <= F.col("leftover")).cast("bigint")
        ).alias("alloc_tokens"),
    )


def lang_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling table: w = c^(1/T),
    p = w / sum(w), effective epochs = budget * p / c. Association is
    fixed (see module docstring) for bit parity with the oracle."""
    d = load_table(spark, sf_dir, "documents")
    c = (
        d.select("lang", F.size(tokens_nonempty(F.col("text"))).alias("n"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("c_tokens"),
        )
    )
    weighted = c.withColumn("w", _temp_weight(F.col("c_tokens")))
    tot = _w_total(weighted)
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "c_tokens",
            # try_divide: a zero-token lang (or an all-empty corpus) makes
            # the denominator 0 — ANSI `/` THROWS where DuckDB yields NULL
            # (r9 degenerate-corpus sweep). Bit-identical when nonzero.
            F.round(F.try_divide(F.col("w"), F.col("w_total")), 6).alias(
                "p_sample"
            ),
            F.round(
                F.try_divide(
                    F.lit(float(TOKEN_BUDGET))
                    * F.try_divide(F.col("w"), F.col("w_total")),
                    F.col("c_tokens").cast("double"),
                ),
                4,
            ).alias("eff_epochs"),
        )
    )


def mix_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped temperature plan over sources: epochs = least(MAX_EPOCHS,
    budget * (w/sum(w)) / c); planned_tokens = floor(epochs * c) as
    BIGINT (floor BEFORE the cast — the repo's float-parity rule)."""
    c = _source_census(spark, sf_dir)
    weighted = c.withColumn("w", _temp_weight(F.col("c_tokens")))
    tot = _w_total(weighted)
    # try_divide as in lang_temperature_mix: zero-token source -> NULL
    # epochs (least() then ignores the NULL in BOTH engines, capping at
    # MAX_EPOCHS; planned_tokens floors to 0 with c_tokens = 0).
    epochs_raw = F.try_divide(
        F.lit(float(TOKEN_BUDGET))
        * F.try_divide(F.col("w"), F.col("w_total")),
        F.col("c_tokens").cast("double"),
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "c_tokens",
            F.round(F.try_divide(F.col("w"), F.col("w_total")), 6).alias(
                "p_target"
            ),
            F.round(
                F.least(F.lit(MAX_EPOCHS), epochs_raw), 4
            ).alias("epochs"),
            F.floor(
                F.least(F.lit(MAX_EPOCHS), epochs_raw)
                * F.col("c_tokens").cast("double")
            )
            .cast("bigint")
            .alias("planned_tokens"),
        )
    )


def _head_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, n_tokens, bucket): the curriculum score is the
    distinct-token ratio (one exact-integer division, bit-parity safe),
    bucketed into HEAD_BUCKETS quality bands. Pure map over the scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = tokens_nonempty(F.col("text"))
    n = F.size(toks)
    score = (
        F.when(
            n > 0,
            F.size(F.array_distinct(toks)).cast("double") / n.cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    return d.select(
        "doc_id",
        score.alias("score"),
        n.cast("bigint").alias("n_tokens"),
    ).withColumn(
        "bucket",
        F.least(
            F.lit(HEAD_BUCKETS - 1),
            F.floor(F.col("score") * float(HEAD_BUCKETS)),
        ).cast("int"),
    )


def _head_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-level plan: token totals, tokens above, and the bucket's
    fate under the budget. At most HEAD_BUCKETS rows — the window runs
    over a constant-size frame, never the corpus."""
    census = _head_bucketed(spark, sf_dir).groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tok_sum"),
    )
    w = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        census.withColumn(
            "cum_above", F.coalesce(F.sum("tok_sum").over(w), F.lit(0))
        )
        .withColumn(
            "kind",
            F.when(
                F.col("cum_above") + F.col("tok_sum") <= HEAD_TOKEN_BUDGET,
                F.lit("full"),
            )
            .when(F.col("cum_above") < HEAD_TOKEN_BUDGET, F.lit("partial"))
            .otherwise(F.lit("excluded")),
        )
    )


def token_budget_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucket plan itself — certifies the budget arithmetic that
    token_budget_head executes doc-by-doc."""
    return _head_census(spark, sf_dir).select(
        "bucket",
        "n_docs",
        F.col("tok_sum").cast("bigint").alias("tok_sum"),
        F.col("cum_above").cast("bigint").alias("cum_above"),
        "kind",
    )


def token_budget_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ordered token-budget head (curriculum selection): keep the
    highest-scoring documents until HEAD_TOKEN_BUDGET tokens are spent.

    Two-phase so no global sort touches the corpus: buckets strictly
    above the cutoff are kept wholesale (a broadcast join against the
    <=HEAD_BUCKETS-row plan); ONLY the single partial bucket is ranked
    (score desc, doc_id asc) and cut at the remaining budget, so the
    sort touches ~1/HEAD_BUCKETS of the corpus. At extreme skew (one
    bucket holding most tokens) the same construction recurses on a
    finer bucket grid — noted, not needed here."""
    bucketed = _head_bucketed(spark, sf_dir)
    plan = _head_census(spark, sf_dir).select(
        "bucket", "cum_above", "kind"
    )
    joined = bucketed.join(F.broadcast(plan), "bucket")
    full = joined.where(F.col("kind") == "full")
    w_in = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    partial = (
        joined.where(F.col("kind") == "partial")
        .withColumn("cum_in", F.sum("n_tokens").over(w_in))
        .where(
            F.col("cum_above") + F.col("cum_in") <= HEAD_TOKEN_BUDGET
        )
        .drop("cum_in")
    )
    return full.unionByName(partial).select(
        "doc_id",
        "bucket",
        F.round("score", 6).alias("score"),
        "n_tokens",
        F.col("kind").alias("keep_kind"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "domain_mix_allocation": domain_mix_allocation,
    "lang_temperature_mix": lang_temperature_mix,
    "mix_epoch_plan": mix_epoch_plan,
    "token_budget_census": token_budget_census,
    "token_budget_head": token_budget_head,
}

_TOKS = duckdb_tokens_sql()

_SRC_CENSUS = f"""
    WITH census AS (
        SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS c_tokens
        FROM documents GROUP BY source
    )
"""

_HEAD_CTE = f"""
    WITH scored AS (
        SELECT doc_id,
               CASE WHEN len({_TOKS}) > 0
                    THEN CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                         / CAST(len({_TOKS}) AS DOUBLE)
                    ELSE 0.0 END AS score,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    ),
    bucketed AS (
        SELECT *,
               CAST(least({HEAD_BUCKETS - 1},
                          floor(score * {float(HEAD_BUCKETS)!r})) AS INTEGER)
                   AS bucket
        FROM scored
    ),
    census AS (
        SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS tok_sum
        FROM bucketed GROUP BY bucket
    ),
    plan AS (
        SELECT *,
               CAST(COALESCE(sum(tok_sum) OVER (
                   ORDER BY bucket DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum_above,
               CASE WHEN COALESCE(sum(tok_sum) OVER (
                        ORDER BY bucket DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) + tok_sum <= {HEAD_TOKEN_BUDGET} THEN 'full'
                    WHEN COALESCE(sum(tok_sum) OVER (
                        ORDER BY bucket DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), 0) < {HEAD_TOKEN_BUDGET} THEN 'partial'
                    ELSE 'excluded' END AS kind
        FROM census
    )
"""

ORACLES: dict[str, str] = {
    "domain_mix_allocation": _SRC_CENSUS
    + f"""
    , tot AS (SELECT CAST(sum(c_tokens) AS BIGINT) AS c_total FROM census),
    q AS (
        SELECT source, c_tokens,
               CAST({TOKEN_BUDGET} AS BIGINT) * c_tokens // c_total AS quota,
               CAST({TOKEN_BUDGET} AS BIGINT) * c_tokens
                   - (CAST({TOKEN_BUDGET} AS BIGINT) * c_tokens // c_total)
                     * c_total AS remainder
        FROM census CROSS JOIN tot
    ),
    ranked AS (
        SELECT *,
               CAST({TOKEN_BUDGET} AS BIGINT) - sum(quota) OVER () AS leftover,
               row_number() OVER (ORDER BY remainder DESC, source ASC) AS rnk
        FROM q
    )
    SELECT source, c_tokens, quota, remainder,
           quota + CAST(CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT)
               AS alloc_tokens
    FROM ranked
    """,
    "lang_temperature_mix": f"""
    WITH census AS (
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len({_TOKS})) AS BIGINT) AS c_tokens
        FROM documents GROUP BY lang
    ),
    weighted AS (
        SELECT *, sqrt(CAST(c_tokens AS DOUBLE)) AS w
        FROM census
    ),
    tot AS (SELECT list_reduce(list_sort(list(w)), (a, b) -> a + b)
                AS w_total FROM weighted)
    SELECT lang, n_docs, c_tokens,
           round(w / w_total, 6) AS p_sample,
           round(CAST({TOKEN_BUDGET} AS DOUBLE) * (w / w_total)
                 / CAST(c_tokens AS DOUBLE), 4) AS eff_epochs
    FROM weighted CROSS JOIN tot
    """,
    "token_budget_census": _HEAD_CTE
    + """
    SELECT bucket, n_docs, tok_sum, cum_above, kind FROM plan
    """,
    "token_budget_head": _HEAD_CTE
    + f"""
    , joined AS (
        SELECT b.doc_id, b.bucket, b.score, b.n_tokens,
               p.cum_above, p.kind
        FROM bucketed b JOIN plan p USING (bucket)
    ),
    partial AS (
        SELECT *,
               sum(n_tokens) OVER (
                   PARTITION BY bucket
                   ORDER BY score DESC, doc_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_in
        FROM joined WHERE kind = 'partial'
    )
    SELECT doc_id, bucket, round(score, 6) AS score, n_tokens,
           kind AS keep_kind
    FROM joined WHERE kind = 'full'
    UNION ALL
    SELECT doc_id, bucket, round(score, 6) AS score, n_tokens,
           kind AS keep_kind
    FROM partial WHERE cum_above + cum_in <= {HEAD_TOKEN_BUDGET}
    """,
    "mix_epoch_plan": _SRC_CENSUS
    + f"""
    , weighted AS (
        SELECT *, sqrt(CAST(c_tokens AS DOUBLE)) AS w
        FROM census
    ),
    tot AS (SELECT list_reduce(list_sort(list(w)), (a, b) -> a + b)
                AS w_total FROM weighted)
    SELECT source, c_tokens,
           round(w / w_total, 6) AS p_target,
           round(least({MAX_EPOCHS!r},
                       CAST({TOKEN_BUDGET} AS DOUBLE) * (w / w_total)
                       / CAST(c_tokens AS DOUBLE)), 4) AS epochs,
           CAST(floor(least({MAX_EPOCHS!r},
                            CAST({TOKEN_BUDGET} AS DOUBLE) * (w / w_total)
                            / CAST(c_tokens AS DOUBLE))
                      * CAST(c_tokens AS DOUBLE)) AS BIGINT)
               AS planned_tokens
    FROM weighted CROSS JOIN tot
    """,
}
