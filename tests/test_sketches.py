"""Certificate + accuracy checks for the sketch aggregates. The queries
now emit engine-neutral certificates (boolean error bands / the exact
heavy hitters surviving the superset filter), so they ARE oracle-matched;
these tests run the oracle compare plus the certificate semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from dic_a1_spark.operators import ngrams, sketches
from dic_a1_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


def test_hll_certificate_matches_oracle(spark):
    compare(
        spark,
        sketches.ORACLES["events_hll_user_counts"],
        sketches.QUERIES["events_hll_user_counts"],
        SF_CORRECT,
        "events_hll_user_counts",
    )


def test_hll_all_bands_true_and_rollup_merges(spark):
    rows = sketches.events_hll_user_counts(spark, SF_CORRECT).collect()
    assert all(r["users_in_band"] for r in rows), rows
    n = {r["event_type"]: r["n_events"] for r in rows}
    assert n["ALL"] == sum(v for k, v in n.items() if k != "ALL")


def test_freq_items_certificate_matches_oracle(spark):
    compare(
        spark,
        sketches.ORACLES["text_token_freq_items"],
        sketches.QUERIES["text_token_freq_items"],
        SF_CORRECT,
        "text_token_freq_items",
    )


def test_freq_items_returns_exactly_true_heavy_hitters(spark):
    toks = (
        load_table(spark, SF_CORRECT, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
    )
    total = toks.count()
    true_heavy = {
        r["tok"]
        for r in toks.groupBy("tok").count().where(F.col("count") > 0.01 * total).collect()
    }
    got = {
        r["tok"] for r in sketches.text_token_freq_items(spark, SF_CORRECT).collect()
    }
    assert got == true_heavy and len(got) > 0


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
