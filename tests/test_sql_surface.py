"""SQL passthrough: the identical ANSI text must produce identical results
on Spark (spark.sql) and DuckDB, and Catalyst must decorrelate subqueries
to joins (no per-row execution)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators.sql_surface import QUERIES, SQL_TEXTS
from dic_a1_spark.plans.explain import formatted_plan
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(SQL_TEXTS))
def test_same_text_same_result(spark, name):
    compare(spark, SQL_TEXTS[name], QUERIES[name], SF_CORRECT, name)


def test_exists_decorrelates_to_semi_join(spark):
    plan = formatted_plan(QUERIES["sql_exists_heavy_orders"](spark, SF_CORRECT))
    assert "LeftSemi" in plan


def test_not_exists_decorrelates_to_anti_join(spark):
    plan = formatted_plan(QUERIES["sql_not_exists_customers"](spark, SF_CORRECT))
    assert "LeftAnti" in plan


def test_topk_uses_take_ordered(spark):
    plan = formatted_plan(QUERIES["sql_top_returned_customers"](spark, SF_CORRECT))
    assert "TakeOrderedAndProject" in plan
