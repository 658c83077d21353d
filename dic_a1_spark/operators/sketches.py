"""Mergeable sketch aggregates: HyperLogLog sketches and frequent items.

At 100 TB, exact COUNT(DISTINCT) across arbitrary group-by rollups means
repeated full shuffles of the key; sketches make the aggregate state tiny
and MERGEABLE — compute per-partition/per-group sketches once, union them
for any coarser grouping without touching the raw data again. That union
step (`hll_union_agg`) is exactly what a tiered rollup pipeline (hourly →
daily → monthly) stores and re-aggregates.

These are approximate by construction, so they carry no DuckDB value
oracle (rows-only driver check); the accuracy bound vs the exact answer
is asserted in tests/test_sketches.py instead.

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
    distinct-user count obtained by merging the per-type sketches — one
    pass over the data, demonstrating the rollup-without-rescan property
    (the exact equivalent would need a second shuffle of raw user_ids)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count("*").alias("n_events"),
    )
    rolled = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users"),
        F.sum("n_events").alias("n_events"),
    )
    return per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("approx_users"),
        "n_events",
    ).unionByName(rolled)


def events_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass approximate heavy hitters over user_id (support 1%):
    returns candidate users whose event share may exceed the threshold —
    a superset of the true heavy hitters (asserted in tests)."""
    ev = load_table(spark, sf_dir, "events")
    hits = ev.select("user_id").stat.freqItems(["user_id"], support=0.01)
    return hits.select(
        F.explode("user_id_freqItems").alias("user_id")
    ).orderBy("user_id")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_hll_user_counts": events_hll_user_counts,   # rows-only (approx)
    "events_freq_items": events_freq_items,             # rows-only (approx)
}

ORACLES: dict[str, str] = {}
