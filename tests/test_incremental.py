"""Oracle + semantics checks for incremental (batch-vs-corpus) dedup."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import incremental
from dic_a1_spark.plans.explain import formatted_plan
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(incremental.ORACLES))
def test_incremental_oracle(spark, name):
    compare(
        spark, incremental.ORACLES[name], incremental.QUERIES[name], SF_CORRECT, name
    )


def test_stats_nonvacuous_and_consistent(spark):
    r = incremental.dedup_incremental_stats(spark, SF_CORRECT).collect()[0]
    # tokenset identity gives real cross-split duplicates at sf0.01
    # (raw-md5 identity would be vacuous here — see module docstring)
    assert r["n_dup_corpus"] > 0
    assert r["n_incoming"] == r["n_dup_corpus"] + r["n_dup_within"] + r["n_admitted"]
    kept = incremental.dedup_incremental_keep(spark, SF_CORRECT)
    assert kept.count() == r["n_admitted"]


def test_survivors_are_increment_rows_with_unique_hashes(spark):
    kept = incremental.dedup_incremental_keep(spark, SF_CORRECT)
    rows = kept.collect()
    assert all(
        r["doc_id"] % incremental.INC_MOD == incremental.INC_REM for r in rows
    )
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))


def test_corpus_branch_joins_broadcast(spark):
    """Both joins must be broadcast (increment-sized build sides): a
    shuffle exchange feeding a sort-merge join here means corpus rows are
    being repartitioned — the anti-pattern this operator exists to avoid."""
    plan = formatted_plan(incremental.dedup_incremental_keep(spark, SF_CORRECT))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_incremental_minhash_survivors_cross_split(spark):
    from dic_a1_spark.operators.dedup import JACCARD_THRESHOLD

    rows = incremental.dedup_incremental_minhash(spark, SF_CORRECT).collect()
    assert rows  # near-dups across the split exist at sf0.01
    for r in rows:
        assert r["doc_id"] % incremental.INC_MOD == incremental.INC_REM
        assert r["dup_doc_id"] % incremental.INC_MOD != incremental.INC_REM
        assert r["jaccard"] >= JACCARD_THRESHOLD


def test_incremental_minhash_pairs_subset_of_full_lsh(spark):
    """Every (increment, corpus) pair found here must also be found by
    the full-corpus md5-LSH pair query (same family, same threshold) —
    the incremental screen is a restriction, never a new pair source."""
    from dic_a1_spark.operators.lsh import dedup_minhash_md5_pairs

    full = {
        tuple(sorted((r["doc1"], r["doc2"])))
        for r in dedup_minhash_md5_pairs(spark, SF_CORRECT).collect()
    }
    inc = {
        tuple(sorted((r["doc_id"], r["dup_doc_id"])))
        for r in incremental.dedup_incremental_minhash(spark, SF_CORRECT).collect()
    }
    assert inc <= full
