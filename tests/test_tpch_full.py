"""Oracle + plan checks for the third TPC-H tranche (Q2/Q7/.../Q21 shapes)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import tpch_full
from dic_a1_spark.plans.explain import formatted_plan
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(tpch_full.QUERIES))
def test_matches_oracle(spark, name):
    compare(spark, tpch_full.ORACLES[name], tpch_full.QUERIES[name], SF_CORRECT, name)


def test_q2_window_not_self_join(spark):
    # The correlated MIN decorrelates to a window, not a second scan of the
    # partsupp surrogate: exactly one distinct over lineitem in the plan.
    plan = formatted_plan(tpch_full.q2a_min_balance_supplier(spark, SF_CORRECT))
    assert "Window" in plan
    assert plan.count("lineitem.parquet") == 1


def test_q7_nation_envelope_pushed(spark):
    # The nation-pair envelope must reach both (broadcast) nation dims so
    # the fact join carries only two nations' rows at scale.
    plan = formatted_plan(tpch_full.q7_volume_shipping(spark, SF_CORRECT))
    assert plan.count("NATION_1") >= 2


def test_q18_single_lineitem_scan(spark):
    # The HAVING subquery reuses the outer aggregate: one scan, one
    # shuffle of lineitem, top-k via per-partition heaps.
    plan = formatted_plan(tpch_full.q18_large_volume_customers(spark, SF_CORRECT))
    assert plan.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in plan


def test_q21_single_pass_no_self_join(spark):
    # EXISTS / NOT-EXISTS collapse to window counts: lineitem scanned once.
    plan = formatted_plan(tpch_full.q21a_sole_late_supplier(spark, SF_CORRECT))
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan


def test_q15_single_lineitem_scan(spark):
    df = tpch_full.q15_top_supplier(spark, SF_CORRECT)
    rows = df.collect()
    assert len(rows) >= 1
    plan = formatted_plan(df)
    # The scalar max is a window over the aggregated view, not a second
    # aggregation branch: lineitem is scanned once.
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan
