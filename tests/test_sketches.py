"""Accuracy bounds for the sketch aggregates (no SQL oracle — approximate
results get property assertions against the exact answers instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dic_a1_spark.operators import ngrams, sketches
from dic_a1_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


def test_hll_estimates_within_5pct_of_exact(spark):
    got = {
        r["event_type"]: r["approx_users"]
        for r in sketches.events_hll_user_counts(spark, SF_CORRECT).collect()
    }
    ev = load_table(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= 0.05 * exact[k], (k, est, exact[k])


def test_hll_rollup_merges_per_type_sketches(spark):
    df = sketches.events_hll_user_counts(spark, SF_CORRECT)
    rows = {r["event_type"]: r["n_events"] for r in df.collect()}
    assert rows["ALL"] == sum(v for k, v in rows.items() if k != "ALL")


def test_freq_items_superset_of_true_heavy_hitters(spark):
    ev = load_table(spark, SF_CORRECT, "events")
    total = ev.count()
    true_heavy = {
        r["user_id"]
        for r in ev.groupBy("user_id")
        .count()
        .where(F.col("count") > 0.01 * total)
        .collect()
    }
    got = {r["user_id"] for r in sketches.events_freq_items(spark, SF_CORRECT).collect()}
    assert true_heavy <= got


def test_bpe_token_count_matches_oracle(spark):
    compare(
        spark,
        ngrams.ORACLES["text_bpe_token_count"],
        ngrams.QUERIES["text_bpe_token_count"],
        SF_CORRECT,
        "text_bpe_token_count",
    )


def test_bigram_topk_matches_oracle(spark):
    compare(
        spark,
        ngrams.ORACLES["text_bigram_topk"],
        ngrams.QUERIES["text_bigram_topk"],
        SF_CORRECT,
        "text_bigram_topk",
    )


def test_bigram_topk_uses_take_ordered(spark):
    from dic_a1_spark.plans.explain import formatted_plan

    plan = formatted_plan(ngrams.text_bigram_topk(spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
