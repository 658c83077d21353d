"""Oracle + semantics checks for the quality-evaluation operators."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import evalops
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(evalops.ORACLES))
def test_evalops_oracle(spark, name):
    compare(spark, evalops.ORACLES[name], evalops.QUERIES[name], SF_CORRECT, name)


def test_lsh_recall_is_a_true_subset_ratio(spark):
    """The banded finder verifies every candidate exactly, so its pairs
    are a subset of the true pair set: missed >= 0 and recall <= 1."""
    r = evalops.lsh_recall_report(spark, SF_CORRECT).collect()[0]
    assert r["n_true_pairs"] > 0  # non-vacuous at sf0.01
    assert 0 <= r["missed"] <= r["n_true_pairs"]
    assert 0.0 < r["recall"] <= 1.0
    assert r["n_lsh_pairs"] + r["missed"] == r["n_true_pairs"]


def test_quantized_recall_rows_and_bounds(spark):
    from dic_a1_spark.operators.similarity import N_QUERIES

    rows = evalops.quantized_knn_recall_report(spark, SF_CORRECT).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0.0 <= r["recall_at_k"] <= 1.0
    # int8 retrieval is supposed to be GOOD: average recall well above chance
    assert sum(r["recall_at_k"] for r in rows) / len(rows) >= 0.8


def test_group_histogram_accounts_for_every_document(spark):
    from dic_a1_spark.sources.readers import load_table

    rows = evalops.dedup_group_size_histogram(spark, SF_CORRECT).collect()
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert sum(r["n_docs_total"] for r in rows) == n_docs
    assert any(r["group_size"] > 1 for r in rows)  # real duplicates exist


def test_dedup_ladder_report_oracle(spark):
    from tests.oracle_utils import compare

    compare(
        spark,
        evalops.ORACLES["dedup_ladder_report"],
        evalops.QUERIES["dedup_ladder_report"],
        SF_CORRECT,
        "dedup_ladder_report",
    )


def test_dedup_ladder_monotone_sanity(spark):
    """Tokenset identity is a refinement of exact identity: its dedup
    ratio can never be below exact's; every level covers all docs."""
    rows = {
        r["method"]: r
        for r in evalops.QUERIES["dedup_ladder_report"](
            spark, SF_CORRECT
        ).collect()
    }
    assert set(rows) == {"exact", "tokenset", "minhash_md5", "simhash_md5"}
    n = {r["n_docs"] for r in rows.values()}
    assert len(n) == 1  # same corpus under every identity
    assert rows["tokenset"]["dedup_ratio"] >= rows["exact"]["dedup_ratio"]
    for r in rows.values():
        assert r["n_groups"] >= r["n_singletons"]
        assert r["max_group_size"] >= 1
