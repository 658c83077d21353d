from __future__ import annotations

import pytest

from dic_a1_spark.operators import events
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(events.ORACLES))
def test_events_oracle(spark, name):
    compare(spark, events.ORACLES[name], events.QUERIES[name], SF_CORRECT, name)


def test_approx_stats_within_bounds(spark):
    """approx_count_distinct (HLL++, rsd=2%) and percentile_approx
    (accuracy=10000) must land near the exact answers."""
    from pyspark.sql import functions as F

    from dic_a1_spark.sources.readers import load_table

    approx = {
        r["event_type"]: r
        for r in events.events_approx_raw(spark, SF_CORRECT).collect()
    }
    e = load_table(spark, SF_CORRECT, "events")
    exact = {
        r["event_type"]: r
        for r in e.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("median"),
        )
        .collect()
    }
    for etype, ex in exact.items():
        ap = approx[etype]
        assert abs(ap["approx_users"] - ex["users"]) <= max(3, 0.1 * ex["users"])
        spread = abs(ex["median"]) + 1.0
        assert abs(ap["approx_median_value"] - ex["median"]) <= 0.1 * spread


def test_funnel_depth_distribution_nondegenerate(spark):
    """The 24h step deadline must produce users at every funnel depth —
    without it every user completes all steps and the depth CASE is
    untested (the vacuity trap)."""
    import collections

    rows = events.events_funnel_depth(spark, SF_CORRECT).collect()
    depths = collections.Counter(r["funnel_depth"] for r in rows)
    assert set(depths) >= {1, 2, 3}
    # every user with any event appears exactly once
    assert sum(depths.values()) == len({r["user_id"] for r in rows})


def test_funnel_steps_are_ordered(spark):
    rows = events.events_funnel_depth(spark, SF_CORRECT).collect()
    for r in rows:
        ts = [r["view_ts"], r["click_ts"], r["purchase_ts"]]
        present = [t for t in ts if t is not None]
        # strictly increasing and prefix-shaped (no purchase without click)
        assert present == sorted(present)
        assert ts[: len(present)] == present


def test_retention_cohorts_invariants(spark):
    from dic_a1_spark.operators.events import events_retention_cohorts

    rows = events_retention_cohorts(spark, SF_CORRECT).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert 0 <= r["n_users"] <= r["cohort_size"]
        assert r["day_offset"] >= 0
        by_cohort.setdefault(r["cohort_day"], {})[r["day_offset"]] = r
    for cells in by_cohort.values():
        # offset 0 is the cohort itself: full retention by definition
        assert cells[0]["n_users"] == cells[0]["cohort_size"]
        assert cells[0]["retention"] == 1.0


def test_dau_stickiness_bounds(spark):
    from dic_a1_spark.operators.events import events_dau_stickiness

    rows = events_dau_stickiness(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0 < r["dau"] <= r["wau"]
        assert 0.0 < r["stickiness"] <= 1.0
    # non-vacuous: the trailing window actually exceeds a single day
    assert any(r["wau"] > r["dau"] for r in rows)


def test_hourly_anomaly_zscores_match_python(spark):
    """Recompute each type's hourly z-scores driver-side from the same
    sufficient statistics and require the rounded values and flags to
    match exactly."""
    import math

    rows = events.events_hourly_anomaly(spark, SF_CORRECT).collect()
    assert rows and any(r["anomaly"] for r in rows)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        cnt = len(rs)
        s = sum(r["n_events"] for r in rs)
        ss = sum(r["n_events"] ** 2 for r in rs)
        mean = s / cnt
        var = (ss - s * s / cnt) / (cnt - 1) if cnt > 1 else 0.0
        for r in rs:
            z = (r["n_events"] - mean) / math.sqrt(var) if cnt > 1 and var > 0 else 0.0
            assert abs(r["z_r"] - round(z, 4)) < 1e-9
            assert r["anomaly"] == (abs(z) > events.ANOMALY_Z)
