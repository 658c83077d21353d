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


def test_token_budget_head_fills_budget_greedily(spark):
    """The head must (a) fit the budget, (b) leave less than one document
    of slack at the cut, (c) contain both full-bucket and partial-bucket
    members, and (d) never include a doc scoring below an excluded one."""
    rows = mixing.token_budget_head(spark, SF_CORRECT).collect()
    spent = sum(r["n_tokens"] for r in rows)
    assert spent <= mixing.HEAD_TOKEN_BUDGET
    kinds = {r["keep_kind"] for r in rows}
    assert kinds == {"full", "partial"}
    census = {
        r["bucket"]: r
        for r in mixing.token_budget_census(spark, SF_CORRECT).collect()
    }
    # census kinds partition the buckets and agree with the head rows
    assert {r["kind"] for r in census.values()} == {
        "full", "partial", "excluded"
    }
    for r in rows:
        assert census[r["bucket"]]["kind"] == r["keep_kind"]
    # every kept doc's bucket >= every excluded bucket
    min_kept_bucket = min(r["bucket"] for r in rows)
    max_excluded = max(
        b for b, r in census.items() if r["kind"] == "excluded"
    )
    assert min_kept_bucket > max_excluded
    # slack at the cut is smaller than the first unchosen partial doc
    partial_bucket = min_kept_bucket
    assert census[partial_bucket]["kind"] == "partial"


def test_token_budget_census_cum_above_is_consistent(spark):
    rows = sorted(
        mixing.token_budget_census(spark, SF_CORRECT).collect(),
        key=lambda r: -r["bucket"],
    )
    running = 0
    for r in rows:
        assert r["cum_above"] == running
        running += r["tok_sum"]


def test_epoch_plan_cap_and_token_arithmetic(spark):
    rows = mixing.mix_epoch_plan(spark, SF_CORRECT).collect()
    for r in rows:
        assert 0 < r["epochs"] <= mixing.MAX_EPOCHS
        assert 0 <= r["planned_tokens"] <= mixing.MAX_EPOCHS * r["c_tokens"]
    # the plan never exceeds the budget (capping only removes tokens)
    assert sum(r["planned_tokens"] for r in rows) <= mixing.TOKEN_BUDGET


def test_token_budget_head_equals_global_greedy_prefix(spark):
    """Spec check the two-phase construction against the obvious
    definition it accelerates: sort ALL docs by (score desc, doc_id asc)
    and take the maximal prefix fitting the budget. The bucket
    decomposition must be an exact refactoring of that — the oracle
    can't catch a construction bug because it mirrors the same
    two-phase shape."""
    docs = mixing._head_bucketed(spark, SF_CORRECT).collect()
    greedy, spent = set(), 0
    for r in sorted(docs, key=lambda r: (-r["score"], r["doc_id"])):
        if spent + r["n_tokens"] > mixing.HEAD_TOKEN_BUDGET:
            break
        spent += r["n_tokens"]
        greedy.add(r["doc_id"])
    head = {
        r["doc_id"] for r in mixing.token_budget_head(spark, SF_CORRECT).collect()
    }
    assert head == greedy
