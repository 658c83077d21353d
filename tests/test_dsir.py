"""Oracle + semantics checks for DSIR importance weighting
(operators/dsir.py)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import dsir
from dic_a1_spark.plans.explain import count_exchanges, has_broadcast_join
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(dsir.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, dsir.ORACLES[name], dsir.QUERIES[name], SF_CORRECT, name)


def test_selected_consistent_with_weights(spark):
    """The selection must be exactly the top-K raw-pool rows of the
    weights query under (avg_fp desc, doc_id asc)."""
    weights = {
        r["doc_id"]: r
        for r in dsir.dsir_logratio_weights(spark, SF_CORRECT).collect()
    }
    raw = sorted(
        (r for r in weights.values() if r["is_target"] == 0),
        key=lambda r: (-r["avg_fp"], r["doc_id"]),
    )
    expected = [r["doc_id"] for r in raw[: dsir.DSIR_SELECT_K]]
    got = sorted(
        dsir.dsir_selected(spark, SF_CORRECT).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["doc_id"] for r in got] == expected
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    for r in got:
        w = weights[r["doc_id"]]
        assert (r["n_feats"], r["score_fp"]) == (w["n_feats"], w["score_fp"])


def test_target_scores_above_raw_pool_mean(spark):
    """Self-consistency of the estimator: target documents' features were
    counted into the target distribution, so their mean importance must
    exceed the raw pool's mean (if it doesn't, the weight sign or the
    target/raw split is flipped)."""
    rows = dsir.dsir_logratio_weights(spark, SF_CORRECT).collect()
    t = [r["avg_fp"] for r in rows if r["is_target"] == 1]
    c = [r["avg_fp"] for r in rows if r["is_target"] == 0]
    assert t and c
    assert sum(t) / len(t) > sum(c) / len(c)


def test_bucket_stats_bounds(spark):
    """Bucket census sanity: observed buckets <= DSIR_BUCKETS, feature
    totals split the corpus, and the weight extremes bracket 0 (some
    buckets lean target, some lean raw — non-vacuity of the signal)."""
    row = dsir.dsir_bucket_stats(spark, SF_CORRECT).collect()[0]
    assert 0 < row["n_buckets"] <= dsir.DSIR_BUCKETS
    assert row["n_target_feats"] > 0 and row["n_raw_feats"] > 0
    assert row["min_w_fp"] < 0 < row["max_w_fp"]


def test_weights_plan_shape(spark):
    """Scale pins: the bucket-weight table joins by broadcast (constant
    <= DSIR_BUCKETS rows), and the whole scoring pass needs only the
    bucket-census exchange, the doc_id aggregation exchange, plus the
    two constant-bounded broadcast exchanges (1-row totals, <= B-row
    weight table) — nothing corpus-proportional beyond the two hash
    exchanges."""
    df = dsir.dsir_logratio_weights(spark, SF_CORRECT)
    assert has_broadcast_join(df)
    assert count_exchanges(df) <= 4
