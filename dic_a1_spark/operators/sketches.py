"""Mergeable sketch aggregates: HyperLogLog sketches and frequent items.

At 100 TB, exact COUNT(DISTINCT) across arbitrary group-by rollups means
repeated full shuffles of the key; sketches make the aggregate state tiny
and MERGEABLE — compute per-partition/per-group sketches once, union them
for any coarser grouping without touching the raw data again. That union
step (`hll_union_agg`) is exactly what a tiered rollup pipeline (hourly →
daily → monthly) stores and re-aggregates.

The sketch values are engine-specific, but their GUARANTEES are not —
so each query emits a hash-checkable certificate instead of raw
estimates (the events_approx_stats pattern): HLL estimates become
boolean error-band verdicts against exact counts computed in the same
query, and freqItems' superset guarantee is certified by returning the
exact heavy hitters found among the candidates (= all of them, iff the
guarantee holds). DuckDB recomputes the exact side and TRUE bands.
Tighter accuracy bounds stay in tests/test_sketches.py.

Spark primitives: `hll_sketch_agg` / `hll_union` / `hll_sketch_estimate`
(Apache DataSketches HLL under the hood, JVM-side, codegen-friendly) and
`DataFrame.stat.freqItems` (Karp-Papadimitriou-Shenker one-pass heavy
hitters).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table


def events_hll_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HLL sketches, PLUS the overall
    distinct-user count obtained by MERGING the per-type sketches — the
    rollup-without-rescan property a tiered pipeline relies on. The
    default sketch (lgConfigK=12, rsd≈1.6%) is held to a 5% (≈3 sigma)
    band against exact counts computed alongside; the emitted verdicts
    are engine-neutral, so the driver hash-gates the sketch guarantee."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count("*").alias("n_events"),
    )
    exact_all = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    rolled = (
        per_type.agg(
            F.lit("ALL").alias("event_type"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
            # coalesce: on an EMPTY events table sum() is NULL while the
            # oracle's count(*) is 0 (r10 empty-corpus probe fork)
            F.coalesce(F.sum("n_events"), F.lit(0).cast("bigint")).alias(
                "n_events"
            ),
        )
        .crossJoin(F.broadcast(exact_all))
    )
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
        "n_events",
        "exact_users",
    )
    return typed.unionByName(rolled.select("event_type", "approx_users", "n_events", "exact_users")).select(
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.col("exact_users").cast("double") * 0.05
        ).alias("users_in_band"),
    )


def text_token_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass approximate heavy hitters over document tokens (support
    1%) — the vocabulary-hot-word scan a corpus pipeline runs before
    building stopword/contamination lists. Token frequencies are Zipfian,
    so the heavy set and its share are scale-stable (the events user_id
    column is near-uniform: no user stays above any fixed support as the
    corpus grows, which would make the check vacuous at larger sf).

    freqItems guarantees a SUPERSET of the true heavy hitters; the
    engine-specific false positives are filtered back out with the exact
    per-token counts, so the emitted rows are exactly the true heavy
    hitters — iff the superset guarantee held. DuckDB recomputes the
    exact heavy hitters directly; a hash match certifies the guarantee."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    hits = (
        toks.stat.freqItems(["tok"], support=0.01)
        .select(F.explode("tok_freqItems").alias("tok"))
    )
    total = toks.agg(F.count("*").alias("n_total"))
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .where(F.col("n_occurrences") > F.lit(0.01) * F.col("n_total"))
    )
    return (
        exact.join(F.broadcast(hits), "tok", "left_semi")
        .select("tok", "n_occurrences")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_hll_user_counts": events_hll_user_counts,   # boolean error-band oracle
    "text_token_freq_items": text_token_freq_items,     # superset-certificate oracle
}

ORACLES: dict[str, str] = {
    # Engine-neutral certificates: DuckDB recomputes the exact side; the
    # sketch side collapses to TRUE bands / the superset guarantee.
    "events_hll_user_counts": """
        SELECT event_type, n_events, exact_users, TRUE AS users_in_band
        FROM (
            SELECT event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS exact_users
            FROM events GROUP BY event_type
            UNION ALL
            SELECT 'ALL', count(*), count(DISTINCT user_id) FROM events
        )
    """,
    "text_token_freq_items": """
        WITH toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        )
        SELECT tok, count(*) AS n_occurrences
        FROM toks
        GROUP BY tok
        HAVING count(*) > 0.01 * (SELECT count(*) FROM toks)
    """,
}
