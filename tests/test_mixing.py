"""Oracle + semantics checks for mixture planning."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import mixing
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(mixing.ORACLES))
def test_mixing_oracle(spark, name):
    compare(spark, mixing.ORACLES[name], mixing.QUERIES[name], SF_CORRECT, name)


def test_largest_remainder_sums_exactly_to_budget(spark):
    rows = mixing.domain_mix_allocation(spark, SF_CORRECT).collect()
    assert sum(r["alloc_tokens"] for r in rows) == mixing.TOKEN_BUDGET
    # every allocation is quota or quota+1 (Hamilton's method)
    assert all(r["alloc_tokens"] - r["quota"] in (0, 1) for r in rows)
    # quota stays within one seat of the exact proportional share
    c_total = sum(r["c_tokens"] for r in rows)
    for r in rows:
        exact = mixing.TOKEN_BUDGET * r["c_tokens"] / c_total
        assert r["quota"] <= exact < r["quota"] + 1


def test_temperature_flattens_distribution(spark):
    """T=2 upsamples tail languages: p_sample must sit strictly between
    the proportional share and uniform for every language (and sum~1)."""
    rows = mixing.lang_temperature_mix(spark, SF_CORRECT).collect()
    c_total = sum(r["c_tokens"] for r in rows)
    uniform = 1.0 / len(rows)
    assert abs(sum(r["p_sample"] for r in rows) - 1.0) < 1e-4
    for r in rows:
        prop = r["c_tokens"] / c_total
        lo, hi = sorted((prop, uniform))
        assert lo - 1e-9 <= r["p_sample"] <= hi + 1e-9


def test_epoch_plan_cap_and_token_arithmetic(spark):
    rows = mixing.mix_epoch_plan(spark, SF_CORRECT).collect()
    for r in rows:
        assert 0 < r["epochs"] <= mixing.MAX_EPOCHS
        assert 0 <= r["planned_tokens"] <= mixing.MAX_EPOCHS * r["c_tokens"]
    # the plan never exceeds the budget (capping only removes tokens)
    assert sum(r["planned_tokens"] for r in rows) <= mixing.TOKEN_BUDGET
