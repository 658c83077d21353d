"""Oracle + semantics checks for deterministic sampling / leakage-safe
splits."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import sampling
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(sampling.ORACLES))
def test_sampling_oracle(spark, name):
    compare(
        spark, sampling.ORACLES[name], sampling.QUERIES[name], SF_CORRECT, name
    )


def test_leakage_audit_nonvacuous(spark):
    """The naive split must actually leak at sf0.01 (else the safe rule
    is tested vacuously) and the safe rule must never leak."""
    r = sampling.split_leakage_audit(spark, SF_CORRECT).collect()[0]
    assert r["multi_groups"] > 0
    assert 0 < r["leaky_naive"] <= r["multi_groups"]
    assert r["leaky_safe"] == 0


def test_safe_assign_is_group_constant_and_rep_fixed(spark):
    """Every member of a group carries the representative's split, and a
    group representative is never moved by the safe rule."""
    rows = sampling.split_leakage_safe_assign(spark, SF_CORRECT).collect()
    by_rep: dict[int, set[str]] = {}
    for r in rows:
        by_rep.setdefault(r["group_rep"], set()).add(r["split_safe"])
    assert all(len(s) == 1 for s in by_rep.values())
    reps = {r["doc_id"]: r for r in rows if r["doc_id"] == r["group_rep"]}
    assert all(not r["moved"] for r in reps.values())
    assert any(r["moved"] for r in rows)  # the leaky copies relocated


def test_per_group_sample_exact_k_and_stable(spark):
    rows = sampling.sample_per_group_hash(spark, SF_CORRECT).collect()
    by_src: dict[str, list[int]] = {}
    for r in rows:
        assert 1 <= r["sample_rank"] <= sampling.SAMPLE_K
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # sf0.01 has 25 docs per source: every source yields exactly K
    assert all(len(v) == sampling.SAMPLE_K for v in by_src.values())
    # determinism: a second run returns the identical sample
    again = sampling.sample_per_group_hash(spark, SF_CORRECT).collect()
    assert sorted((r["doc_id"], r["sample_rank"]) for r in rows) == sorted(
        (r["doc_id"], r["sample_rank"]) for r in again
    )


def test_bernoulli_rate_near_nominal(spark):
    rows = sampling.sample_bernoulli_stats(spark, SF_CORRECT).collect()
    n = sum(r["n_docs"] for r in rows)
    k = sum(r["n_sampled"] for r in rows)
    assert 0 < k < n
    # md5 is uniform: the corpus-level rate sits near 25%
    assert 0.15 < k / n < 0.35


def test_shard_plan_covers_corpus_uniformly(spark):
    from dic_a1_spark.sources.readers import load_table

    rows = sampling.corpus_shard_plan(spark, SF_CORRECT).collect()
    assert len(rows) == sampling.N_SHARDS
    n_docs = load_table(spark, SF_CORRECT, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # md5 is uniform: no shard should be pathologically hot or empty
    for r in rows:
        assert 0.5 < r["load_factor"] < 2.0
