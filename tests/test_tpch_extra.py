"""Oracle + physical-plan checks for the Q4/Q13/Q14/Q19/Q22-shaped queries."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import tpch_extra
from dic_a1_spark.plans.explain import formatted_plan
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(tpch_extra.QUERIES))
def test_matches_oracle(spark, name):
    compare(spark, tpch_extra.ORACLES[name], tpch_extra.QUERIES[name], SF_CORRECT, name)


def test_q4_exists_is_semi_join(spark):
    plan = formatted_plan(tpch_extra.q4_late_shipment_priority(spark, SF_CORRECT))
    assert "LeftSemi" in plan
    # The quarter filter must reach the orders parquet scan.
    assert "PushedFilters" in plan


def test_q13_zero_order_customers_present(spark):
    rows = {
        r["n_orders"]: r["n_customers"]
        for r in tpch_extra.q13_order_count_distribution(spark, SF_CORRECT).collect()
    }
    assert 0 in rows and rows[0] > 0  # outer join kept orderless customers


def test_q19_envelopes_push_into_both_scans(spark):
    plan = formatted_plan(tpch_extra.q19_bracketed_revenue(spark, SF_CORRECT))
    assert plan.count("PushedFilters: [") >= 2
    assert "Brand#" in plan  # brand envelope reached the part scan


def test_q22_not_exists_is_anti_join(spark):
    plan = formatted_plan(tpch_extra.q22_idle_rich_customers(spark, SF_CORRECT))
    assert "LeftAnti" in plan
