"""Oracle + semantics checks for embedding-space example mining."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import mining
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(mining.ORACLES))
def test_mining_oracle(spark, name):
    compare(spark, mining.ORACLES[name], mining.QUERIES[name], SF_CORRECT, name)


def test_hard_negatives_are_cross_label_topk(spark):
    rows = mining.embedding_hard_negatives(spark, SF_CORRECT).collect()
    from dic_a1_spark.operators.similarity import N_QUERIES

    assert len(rows) == N_QUERIES * mining.HARD_K
    by_q: dict[int, list] = {}
    for r in rows:
        assert r["query_label"] != r["neighbor_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for members in by_q.values():
        members.sort(key=lambda r: r["rank"])
        sims = [r["sim"] for r in members]
        assert sims == sorted(sims, reverse=True)


def test_hard_negative_sim_dominates_unchosen_cross_label(spark):
    """Rank-1 hard negative must be at least as similar as EVERY other
    cross-label candidate (spot-check via the scored-pairs subtree)."""
    scored = mining._scored_pairs(spark, SF_CORRECT).where(
        "query_label <> neighbor_label"
    ).collect()
    best: dict[int, float] = {}
    for r in scored:
        q = r["query_id"]
        if q not in best or r["sim"] > best[q]:
            best[q] = r["sim"]
    top = {
        r["query_id"]: r["sim"]
        for r in mining.embedding_hard_negatives(spark, SF_CORRECT).collect()
        if r["rank"] == 1
    }
    assert top == best


def test_purity_agrees_with_bruteforce_topk(spark):
    from dic_a1_spark.operators.similarity import knn_cosine_bruteforce

    topk = knn_cosine_bruteforce(spark, SF_CORRECT).collect()
    labels = {
        r["vec_id"]: r["label"]
        for r in spark.read.parquet(SF_CORRECT + "/embeddings.parquet")
        .select("vec_id", "label")
        .collect()
    }
    expect: dict[int, int] = {}
    for r in topk:
        expect.setdefault(r["query_id"], 0)
        if labels[r["neighbor_id"]] == labels[r["query_id"]]:
            expect[r["query_id"]] += 1
    got = {
        r["query_id"]: r["n_same_label"]
        for r in mining.embedding_knn_purity(spark, SF_CORRECT).collect()
    }
    assert got == expect
